package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Cdc, Dedup, Funnel, Similarity, TextAnalysis}

/** Round-6 additions (q102–q125): streaming under the gate (CDC
  * apply, stream-static enrichment, append-mode watermarked windows,
  * native session_window), text/vector modeling (bigram LM, PMI
  * collocations, per-dimension SQ8), CDC (snapshot diff), behavioral
  * analytics (funnel, retention, gap fill, EMA), robust + classical
  * statistics (OLS + Theil-Sen trends, z-score + MAD outliers,
  * Pearson correlation, chi-square, PSI drift), fuzzy entity
  * resolution (FastSS ED1 + components + survivor), and relational
  * surface completion (pivot, INTERSECT/EXCEPT, CUBE).
  */
object ScaleOps2 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  // DuckDB token expression mirroring TextAnalysis.tokens on this
  // (ASCII) corpus — same as LlmOps.sqlToks.
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  val all: Seq[Q] = Seq(

    // ---- q102: STREAMING CDC apply — three change windows arrive as
    // ordered micro-batches (one file per batch, ascending mtimes) and
    // fold onto the snapshot through Cdc.upsertMerge in foreachBatch:
    // the Delta-streaming-upsert production shape without a table
    // format. Batch-2 deletes exercise delete-then-revive (batch 3
    // re-inserts every one at this data density); batch-3 deletes are
    // the OBSERVABLE delete path — those users must be absent from the
    // final snapshot. The oracle replays the three merges SEQUENTIALLY
    // (merge is not commutative: a later batch's upsert must beat an
    // earlier one), so a wrong fold order, a lost batch, or a
    // resurrected deleted row all diverge.
    Q(
      "q102_streaming_merge",
      (s, d) => streamingMerge(s, d),
      Some("""WITH s0 AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events WHERE ts < TIMESTAMP '2024-01-11' GROUP BY user_id),
             |c1 AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             |    false AS del
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-11' AND ts < TIMESTAMP '2024-01-16'
             |  GROUP BY user_id),
             |c2 AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             |    user_id % 9 = 0 AS del
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-16' AND ts < TIMESTAMP '2024-01-21'
             |  GROUP BY user_id),
             |c3 AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             |    user_id % 5 = 3 AS del
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-21' GROUP BY user_id),
             |s1 AS (SELECT user_id, n_events, total_value FROM s0
             |    WHERE user_id NOT IN (SELECT user_id FROM c1)
             |  UNION ALL SELECT user_id, n_events, total_value FROM c1 WHERE NOT del),
             |s2 AS (SELECT user_id, n_events, total_value FROM s1
             |    WHERE user_id NOT IN (SELECT user_id FROM c2)
             |  UNION ALL SELECT user_id, n_events, total_value FROM c2 WHERE NOT del),
             |s3 AS (SELECT user_id, n_events, total_value FROM s2
             |    WHERE user_id NOT IN (SELECT user_id FROM c3)
             |  UNION ALL SELECT user_id, n_events, total_value FROM c3 WHERE NOT del)
             |SELECT user_id, n_events, total_value FROM s3
             |ORDER BY user_id""".stripMargin)),

    // ---- q103: interpolated bigram-LM scoring. The oracle replays
    // the FULL model derivation (unigram counts + total, top-64k
    // unigram vocab with (count DESC, token) ties, top-64k bigram
    // table with (count DESC, w1, w2) ties) and every pair's
    // ln(0.75·P(w2|w1) + 0.25·P(w2)); libm ln() is not bit-portable,
    // so emitted means are admitted within 1e-9 with a poison row
    // otherwise (the q61 pattern), and membership is checked both ways
    // over DISTINCT ids.
    Q(
      "q103_bigram_logprob",
      (s, d) => {
        import s.implicits._
        TextAnalysis.bigramLogProb(Tables.documents(s, d), $"text", $"doc_id")
          .orderBy($"doc_id")
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q103_bigram_logprob/*.parquet')),
              |tl AS (SELECT doc_id, coalesce($sqlToks, []) AS t FROM documents),
              |cnt AS (SELECT token, count(*) AS c
              |  FROM (SELECT unnest(t) AS token FROM tl) GROUP BY token),
              |tot AS (SELECT sum(c) AS total FROM cnt),
              |voc AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 65536),
              |pr AS (SELECT doc_id, unnest(range(1, len(t))) AS pos, t FROM tl),
              |pairs AS (SELECT doc_id, pos, t[pos] AS w1, t[pos + 1] AS w2 FROM pr),
              |bcnt AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY w1, w2),
              |bvoc AS (SELECT w1, w2, cb FROM bcnt ORDER BY cb DESC, w1, w2 LIMIT 65536),
              |sc AS (SELECT p.doc_id, count(*) AS n,
              |    sum(ln(0.75 * (CASE WHEN bv.cb IS NOT NULL AND v1.c IS NOT NULL
              |          THEN CAST(bv.cb AS DOUBLE) / CAST(v1.c AS DOUBLE) ELSE 0.0 END)
              |      + 0.25 * (CAST(coalesce(v2.c, 1) AS DOUBLE) / (SELECT total FROM tot)))) AS lp
              |  FROM pairs p
              |  LEFT JOIN bvoc bv ON p.w1 = bv.w1 AND p.w2 = bv.w2
              |  LEFT JOIN voc v1 ON p.w1 = v1.token
              |  LEFT JOIN voc v2 ON p.w2 = v2.token
              |  GROUP BY p.doc_id),
              |expect AS (SELECT d.doc_id,
              |    CAST(coalesce(sc.n, 0) AS BIGINT) AS n,
              |    CASE WHEN coalesce(sc.n, 0) > 0 THEN sc.lp / sc.n END AS mean_lp
              |  FROM documents d LEFT JOIN sc USING (doc_id)),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
              |    AND (SELECT count(DISTINCT doc_id) FROM emitted)
              |      = (SELECT count(*) FROM emitted)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x USING (doc_id)
              |      WHERE e.n_pairs <> x.n
              |         OR (e.logprob IS NULL) <> (x.mean_lp IS NULL)
              |         OR abs(coalesce(e.logprob, 0) - coalesce(x.mean_lp, 0)) > 1e-9)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e
              |      WHERE e.doc_id NOT IN (SELECT doc_id FROM expect))
              |    AND NOT EXISTS (SELECT 1 FROM expect x
              |      WHERE x.doc_id NOT IN (SELECT doc_id FROM emitted))
              |  ) AS ok)
              |SELECT doc_id, n_pairs, logprob FROM emitted
              |WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)
              |ORDER BY doc_id""".stripMargin)),

    // ---- q104: per-dimension SQ8 scalar quantization. min/max are
    // EXACT and order-free, and the code arithmetic is the identical
    // double expression in both engines, so the oracle is a fully
    // independent exact recomputation — it never reads the emitted
    // ranges, it re-trains them itself.
    Q(
      "q104_sq8_quantize",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        val (lo, hi) = Similarity.sq8Train(e, $"embedding")
        e.select($"vec_id",
          posexplode(Similarity.sq8Codes($"embedding", lo, hi)).as(Seq("idx", "code")))
          .orderBy($"vec_id", $"idx")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |el AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS INT) AS i,
             |    unnest(v) AS x FROM e),
             |rng AS (SELECT i, min(x) AS lo, max(x) AS hi FROM el GROUP BY i)
             |SELECT vec_id, CAST(el.i - 1 AS INT) AS idx,
             |  CASE WHEN hi = lo THEN 0
             |       ELSE CAST(floor((x - lo) * 255.0 / (hi - lo) + 0.5) AS INT) END AS code
             |FROM el JOIN rng USING (i)
             |ORDER BY vec_id, idx""".stripMargin)),

    // ---- q105: ordered funnel over the event log — earliest
    // view → click → purchase traversal per user, each step strictly
    // after the previous, all inside a 7-day window anchored at the
    // first view. Exact µs-timestamp arithmetic in both engines, so
    // the oracle hash-matches bit-for-bit.
    Q(
      "q105_funnel",
      (s, d) => {
        import s.implicits._
        Funnel.earliest(Tables.events(s, d), $"user_id", $"ts", $"event_type",
          Seq("view", "click", "purchase"), windowSeconds = 7L * 86400L)
          .orderBy($"user")
      },
      Some("""WITH v AS (SELECT user_id AS u, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' AND ts IS NOT NULL
             |    AND user_id IS NOT NULL GROUP BY user_id),
             |vd AS (SELECT u, t1, t1 + INTERVAL 7 DAY AS deadline FROM v),
             |c AS (SELECT e.user_id AS u, min(e.ts) AS t2 FROM events e
             |  JOIN vd ON e.user_id = vd.u
             |  WHERE e.event_type = 'click' AND e.ts > vd.t1 AND e.ts <= vd.deadline
             |  GROUP BY e.user_id),
             |p AS (SELECT e.user_id AS u, min(e.ts) AS t3 FROM events e
             |  JOIN vd ON e.user_id = vd.u JOIN c ON e.user_id = c.u
             |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 AND e.ts <= vd.deadline
             |  GROUP BY e.user_id)
             |SELECT vd.u AS user, vd.t1, c.t2, p.t3,
             |  1 + (CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END)
             |    + (CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END) AS stage,
             |  p.t3 IS NOT NULL AS converted
             |FROM vd LEFT JOIN c ON vd.u = c.u LEFT JOIN p ON vd.u = p.u
             |ORDER BY user""".stripMargin)),

    // ---- q106: cohort retention triangle over the event log —
    // first-active week cohorts × week offsets. Period ids are
    // provably-exact integer arithmetic (see Funnel.retention); the
    // oracle replays the same floor(double division) — NOT DuckDB's
    // '//', which truncates toward zero and would diverge on
    // negative-epoch timestamps.
    Q(
      "q106_retention_cohorts",
      (s, d) => {
        import s.implicits._
        graft.operators.Funnel.retention(
          Tables.events(s, d), $"user_id", $"ts", periodSeconds = 7L * 86400L)
          .orderBy($"cohort_period", $"period_offset")
      },
      Some("""WITH a AS (SELECT DISTINCT user_id,
             |    -- floor(double division), not '//': DuckDB's integer
             |    -- '//' TRUNCATES toward zero, diverging from Spark's
             |    -- floor for pre-1970 (negative-epoch) timestamps
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 604800000000.0) AS BIGINT) AS wk
             |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
             |c AS (SELECT user_id, min(wk) AS cohort FROM a GROUP BY user_id)
             |SELECT c.cohort AS cohort_period, a.wk - c.cohort AS period_offset,
             |  count(DISTINCT a.user_id) AS n_users
             |FROM a JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort_period, period_offset""".stripMargin)),

    // ---- q107: stream-STATIC enrichment join — the most common
    // production streaming pattern (fact stream × broadcast dimension)
    // was spec-only until now: events arrive in ≥2 time-partitioned
    // micro-batches, join the static customer⋈nation dimension, and
    // aggregate per nation in complete mode. The oracle is the plain
    // batch join — streamed delivery must not change a single count.
    Q(
      "q107_stream_static_join",
      (s, d) => streamStaticEnrich(s, d),
      Some("""SELECT n.n_name AS nation, count(*) AS n_events,
             |  CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM events e
             |JOIN customer c ON e.user_id = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    // ---- q108: SNAPSHOT DIFF — recover the change feed between two
    // per-user state snapshots (the inverse of q86's merge). The
    // snapshots carry key-disjoint filters (mod-11 vs mod-13) so every
    // change class appears: inserts (keys only in the new snapshot),
    // deletes (only in the old), updates (both, state moved). ONE
    // co-partitioned full-outer join; exact decimal-summed doubles
    // hash-match.
    Q(
      "q108_snapshot_diff",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        def state(df: DataFrame) = df.groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
        val olds = state(ev.filter($"ts" < lit("2024-01-16").cast("timestamp")))
          .filter($"user_id" % 11 =!= 0)
        val news = state(ev).filter($"user_id" % 13 =!= 0)
        Cdc.snapshotDiff(olds, news, $"user_id", $"user_id",
          Seq("n_events", "total_value"))
          .orderBy($"key")
      },
      Some("""WITH olds AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events WHERE ts < TIMESTAMP '2024-01-16' AND user_id % 11 <> 0
             |  GROUP BY user_id),
             |news AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events WHERE user_id % 13 <> 0 GROUP BY user_id)
             |SELECT coalesce(o.user_id, n.user_id) AS key,
             |  CASE WHEN o.user_id IS NULL THEN 'insert'
             |       WHEN n.user_id IS NULL THEN 'delete'
             |       WHEN o.n_events IS NOT DISTINCT FROM n.n_events
             |        AND o.total_value IS NOT DISTINCT FROM n.total_value THEN 'unchanged'
             |       ELSE 'update' END AS change_type,
             |  o.n_events AS old_n_events, o.total_value AS old_total_value,
             |  n.n_events AS new_n_events, n.total_value AS new_total_value
             |FROM olds o FULL OUTER JOIN news n ON o.user_id = n.user_id
             |ORDER BY key""".stripMargin)),

    // ---- q109: EXACT fuzzy self-join at edit distance ≤ 1 over
    // customer names (FastSS deletion-neighborhood blocking +
    // verification — entity resolution's near-identical-key detector).
    // The oracle is the O(n²) brute-force levenshtein join the
    // blocking replaces: hash-equality proves the blocking complete
    // (no lost pair) AND sound (no unverified pair), the same
    // unblocked-oracle discipline as q25.
    Q(
      "q109_fuzzy_ed1_join",
      (s, d) => {
        import s.implicits._
        graft.operators.FuzzyJoin.ed1Pairs(
          Tables.customer(s, d), $"c_custkey", $"c_name")
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer)
             |SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.s, b.s) AS dist
             |FROM c a JOIN c b ON a.id < b.id
             |WHERE levenshtein(a.s, b.s) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q110: time-series GAP FILL — purchase events resampled to
    // one row per (user, day) with last-observation-carried-forward
    // interpolation (purchases are sparse here: ~0.4/user/day, so the
    // fill path genuinely exercises). Exact integer period ids + exact
    // decimal day-sums; LOCF is deterministic, so the oracle
    // hash-matches bit-for-bit.
    Q(
      "q110_gap_fill",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.gapFill(
          Tables.events(s, d).filter($"event_type" === "purchase"),
          $"user_id", $"ts", $"value",
          periodSeconds = 86400L, fillMode = "locf")
          .orderBy($"key", $"period")
      },
      Some("""WITH o AS (SELECT user_id AS k, CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vsum
             |  FROM events
             |  WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
             |    AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1 FROM o GROUP BY k),
             |g AS (SELECT k, unnest(generate_series(p0, p1)) AS period FROM sp),
             |j AS (SELECT g.k, g.period, o.vsum
             |  FROM g LEFT JOIN o ON g.k = o.k AND g.period = o.period)
             |SELECT k AS key, period,
             |  last_value(vsum IGNORE NULLS) OVER (PARTITION BY k ORDER BY period
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
             |  vsum IS NULL AS filled
             |FROM j ORDER BY key, period""".stripMargin)),

    // ---- q111: relational PIVOT — long event rows → one wide row per
    // user with per-type counts. The value list is EXPLICIT (the
    // 100 TB discipline: no silent distinct-discovery scan before the
    // real aggregation; unknown types surface by their absence, not by
    // an unbounded schema). Pivot-count yields null for absent
    // (user, type) combos — coalesced to 0 to match the mart shape the
    // oracle's FILTER counts produce naturally.
    Q(
      "q111_pivot_event_counts",
      (s, d) => {
        import s.implicits._
        val types = Seq("view", "click", "purchase", "signup", "error")
        Tables.events(s, d)
          .groupBy($"user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .select($"user_id" +:
            types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
             |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
             |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
             |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             |  count(*) FILTER (WHERE event_type = 'error') AS n_error
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- q112: per-key LINEAR TREND (grouped OLS slope/intercept of
    // daily value sums). Sufficient statistics are exact
    // decimal/integer sums; only the closed form runs in pinned-order
    // doubles — libm-free but cast-rounding-sensitive, so the oracle
    // replays the identical formula and admits rows within 1e-9 with a
    // poison row otherwise (the q57/q61 pattern).
    Q(
      "q112_linear_trend",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.linearTrend(
          Tables.events(s, d), $"user_id", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q112_linear_trend/*.parquet')),
             |o AS (SELECT user_id AS k, CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
             |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             |    AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |st AS (SELECT k, count(*) AS n, min(period) AS p0, sum(period) AS sp,
             |    sum(period * period) AS spp, CAST(sum(y) AS DOUBLE) AS syd,
             |    CAST(sum(y * CAST(period AS DECIMAL(10,0))) AS DOUBLE) AS spyd
             |  FROM o GROUP BY k),
             |ex AS (SELECT k, n,
             |    CAST(sp - n * p0 AS DOUBLE) AS sx,
             |    CAST(spp - 2 * p0 * sp + n * p0 * p0 AS DOUBLE) AS sxx,
             |    syd, spyd - CAST(p0 AS DOUBLE) * syd AS sxy
             |  FROM st),
             |expect AS (SELECT k, n,
             |    CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
             |      THEN (CAST(n AS DOUBLE) * sxy - sx * syd)
             |         / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS slope,
             |    CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
             |      THEN (syd - ((CAST(n AS DOUBLE) * sxy - sx * syd)
             |           / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
             |         / CAST(n AS DOUBLE) END AS intercept
             |  FROM ex),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT key) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.key = x.k
             |      WHERE e.n_periods <> x.n
             |         OR (e.slope IS NULL) <> (x.slope IS NULL)
             |         OR abs(coalesce(e.slope, 0) - coalesce(x.slope, 0)) > 1e-9
             |         OR (e.intercept IS NULL) <> (x.intercept IS NULL)
             |         OR abs(coalesce(e.intercept, 0) - coalesce(x.intercept, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.key NOT IN (SELECT k FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x
             |      WHERE x.k NOT IN (SELECT key FROM emitted))
             |  ) AS ok)
             |SELECT key, n_periods, slope, intercept FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY key""".stripMargin)),

    // ---- q113: PMI collocations (phrase mining). Counts and
    // marginals are exact; ln() is not bit-portable, so the oracle
    // recomputes every emitted score within 1e-9 AND checks true-top-K
    // membership (no non-emitted pair may beat the worst emitted one)
    // — the q57 ranking pattern.
    Q(
      "q113_pmi_collocations",
      (s, d) => {
        import s.implicits._
        TextAnalysis.pmiCollocations(Tables.documents(s, d), $"text",
          minCount = 5L, topK = 50)
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q113_pmi_collocations/*.parquet')),
              |tl AS (SELECT coalesce($sqlToks, []) AS t FROM documents),
              |pr AS (SELECT unnest(range(1, len(t))) AS pos, t FROM tl),
              |pairs AS (SELECT t[pos] AS w1, t[pos + 1] AS w2 FROM pr),
              |pc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
              |nn AS (SELECT CAST(sum(c12) AS DOUBLE) AS n FROM pc),
              |m1 AS (SELECT w1, sum(c12) AS c1 FROM pc GROUP BY w1),
              |m2 AS (SELECT w2, sum(c12) AS c2 FROM pc GROUP BY w2),
              |sc AS (SELECT pc.w1, pc.w2, c12,
              |    ln(CAST(c12 AS DOUBLE) * (SELECT n FROM nn)
              |      / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) AS pmi
              |  FROM pc JOIN m1 USING (w1) JOIN m2 USING (w2)
              |  WHERE c12 >= 5),
              |k AS (SELECT least(50, (SELECT count(*) FROM sc)) AS k),
              |worst AS (SELECT min(pmi) AS w FROM emitted),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = (SELECT k FROM k)
              |    AND (SELECT count(DISTINCT (w1, w2)) FROM emitted)
              |      = (SELECT count(*) FROM emitted)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN sc
              |      ON e.w1 = sc.w1 AND e.w2 = sc.w2
              |      WHERE e.n_pair <> sc.c12
              |         OR abs(e.pmi - sc.pmi) > 1e-9)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e
              |      WHERE NOT EXISTS (SELECT 1 FROM sc
              |        WHERE sc.w1 = e.w1 AND sc.w2 = e.w2))
              |    AND NOT EXISTS (SELECT 1 FROM sc
              |      WHERE sc.pmi > (SELECT w FROM worst) + 1e-9
              |        AND NOT EXISTS (SELECT 1 FROM emitted e
              |          WHERE e.w1 = sc.w1 AND e.w2 = sc.w2))
              |  ) AS ok)
              |SELECT w1, w2, n_pair, pmi FROM emitted
              |WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT 'POISON', 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)
              |ORDER BY pmi DESC, w1, w2""".stripMargin)),

    // ---- q114: grouped z-score outliers. Statistics are exact
    // decimals, but the decimal→double cast of the scale-12 Σv² is
    // DOUBLE-ROUNDED differently in Spark vs DuckDB (observed: one-ulp
    // z differences at the gate), so the oracle compares z within 1e-9
    // and checks threshold membership with a ±1e-9 margin: every
    // emitted row must clear 3−ε, every row clearing 3+ε must be
    // emitted, poison row otherwise.
    Q(
      "q114_zscore_outliers",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.zscoreOutliers(
          Tables.events(s, d), $"event_type", $"event_id", $"value", threshold = 3.0)
          .orderBy($"group", $"id")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q114_zscore_outliers/*.parquet')),
             |b AS (SELECT event_type AS grp, event_id AS id, value AS v
             |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
             |    AND NOT isnan(value)),
             |st AS (SELECT grp, count(*) AS n,
             |    CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             |    CAST(sum(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS svv
             |  FROM b GROUP BY grp),
             |-- variance guarded BEFORE sqrt: a constant-valued group's
             |-- variance can round to a tiny NEGATIVE double, where
             |-- Spark's sqrt yields NaN (filtered by sigma > 0) but
             |-- DuckDB's sqrt THROWS and would kill the whole oracle
             |va AS (SELECT grp, n, sv / CAST(n AS DOUBLE) AS mu,
             |    svv / CAST(n AS DOUBLE)
             |      - (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE)) AS var
             |  FROM st),
             |mu AS (SELECT grp, n, mu,
             |    CASE WHEN var > 0 THEN sqrt(var) END AS sigma FROM va),
             |sc AS (SELECT b.grp, b.id, b.v, (b.v - mu) / sigma AS z
             |  FROM b JOIN mu USING (grp) WHERE n > 1 AND sigma > 0),
             |flag AS (SELECT (
             |    (SELECT count(DISTINCT id) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    -- every emitted row: value exact, z within 1e-9, and
             |    -- genuinely near-or-past the threshold
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE NOT EXISTS (SELECT 1 FROM sc
             |        WHERE sc.id = e.id AND sc.grp = e."group" AND sc.v = e.value
             |          AND abs(sc.z - e.z) <= 1e-9 AND abs(sc.z) > 3.0 - 1e-9))
             |    -- every clear outlier is emitted
             |    AND NOT EXISTS (SELECT 1 FROM sc
             |      WHERE abs(sc.z) > 3.0 + 1e-9
             |        AND NOT EXISTS (SELECT 1 FROM emitted e WHERE e.id = sc.id))
             |  ) AS ok)
             |SELECT "group", id, value, z FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY "group", id""".stripMargin)),

    // ---- q115: END-TO-END fuzzy ENTITY RESOLUTION — the composition
    // the fuzzy join exists for: ED≤1 name pairs (q109's FastSS
    // blocking) → connected components (pointer jumping) → one
    // best-account survivor per entity cluster. A sparse key subset
    // (mod 7) keeps the graph fragmented (the full customer table
    // chains into ONE component through single-digit edits — a
    // realistic hazard this fixture deliberately sidesteps: 63
    // components + singletons at the gate). Oracle re-derives pairs
    // brute-force, closure by recursive CTE, survivor by window — all
    // independent of the Spark path.
    Q(
      "q115_fuzzy_entity_resolution",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d).filter($"c_custkey" % 7 === 0)
        val pairs = graft.operators.FuzzyJoin.ed1Pairs(cust, $"c_custkey", $"c_name")
          .select($"id_a", $"id_b")
        val resolved = Dedup.keepBestPerCluster(
          cust, pairs, $"c_custkey", $"c_acctbal".cast("double"))
        val out = resolved.select($"c_custkey", $"cluster_id", $"n_members")
          .orderBy($"c_custkey").localCheckpoint(true)
        resolved.unpersist()
        out
      },
      Some("""WITH RECURSIVE c AS (SELECT c_custkey, c_name, c_acctbal
             |  FROM customer WHERE c_custkey % 7 = 0),
             |e0 AS (SELECT a.c_custkey AS src, b.c_custkey AS dst FROM c a JOIN c b
             |  ON a.c_custkey <> b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1),
             |reach(id, r) AS (
             |  SELECT src, src FROM e0
             |  UNION
             |  SELECT e.src, r.r FROM e0 e JOIN reach r ON e.dst = r.id),
             |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
             |alls AS (SELECT cu.c_custkey, coalesce(l.cluster_id, cu.c_custkey) AS cluster_id,
             |    cu.c_acctbal
             |  FROM c cu LEFT JOIN lab l ON cu.c_custkey = l.id),
             |ranked AS (SELECT *,
             |    row_number() OVER (PARTITION BY cluster_id
             |      ORDER BY c_acctbal DESC, c_custkey) AS rn,
             |    count(*) OVER (PARTITION BY cluster_id) AS n_members
             |  FROM alls)
             |SELECT c_custkey, cluster_id, n_members FROM ranked
             |WHERE rn = 1 ORDER BY c_custkey""".stripMargin)),

    // ---- q116: APPEND-mode watermarked windowed aggregation — the
    // late-data-finalization semantics q19's complete mode cannot
    // show: a window row is emitted ONCE, only after the event-time
    // watermark passes its end, and the final-hour windows stay open
    // (never emitted) when the stream ends. The watermark trajectory
    // is deterministic (time-partitioned files, ascending mtimes, one
    // file per batch), so the emitted set is exactly "windows closed
    // below the final watermark = max(ts) − 1h" — which the oracle
    // computes from the batch table.
    Q(
      "q116_append_window_agg",
      (s, d) => appendWindowAgg(s, d),
      Some("""WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
             |agg AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
             |    event_type, count(*) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events GROUP BY 1, 2)
             |SELECT window_start, event_type, n, total_value FROM agg
             |WHERE window_start + INTERVAL 5 MINUTE <= (SELECT w FROM wm)
             |ORDER BY window_start, event_type""".stripMargin))
  )

  /** q116: the live append-mode run. Two time-partitioned files (the
    * q107 staging) drive ≥2 micro-batches; the watermark advances at
    * each batch boundary from the batch's max event time, and
    * append-mode state emits a (window, type) row exactly once when
    * the watermark passes the window end. AvailableNow runs a final
    * no-data batch, so every window below the FINAL watermark
    * (global max ts − 1h) flushes; the last hour's windows stay open
    * and are deliberately absent from the result.
    */
  private def appendWindowAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q116_append")
    try {
      val ev = Tables.events(s, d).select($"user_id", $"ts", $"value", $"event_type")
        .filter($"ts".isNotNull)
      val inDir = stageTimeSplit(scratch, ev)
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q116_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      try {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
          .withWatermark("ts", "1 hour")
          .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
          .writeStream.outputMode("append")
          .format("memory").queryName(name)
          .option("checkpointLocation", scratch.resolve("_ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        try require(q.awaitTermination(600000),
          "q116 stream did not terminate within 600s — refusing a partial result")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 2,
          s"q116 ran $dataBatches data micro-batch(es); the watermark-advance " +
            "path needs at least 2")
        s.table(name)
          .orderBy($"window_start", $"event_type").localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q117/q118 live below as plain catalog entries. */
  val setOpQueries: Seq[Q] = Seq(

    // ---- q117: INTERSECT / EXCEPT set semantics — the two relational
    // set ops q13's UNION doesn't cover, tagged into one result:
    // customers ordering in BOTH halves of the date range vs ONLY the
    // first. Set ops dedup by definition; both engines implement the
    // same SQL semantics, exact hash-match.
    Q(
      "q117_except_intersect",
      (s, d) => {
        import s.implicits._
        val cut = lit("1998-01-01").cast("timestamp")
        val o = Tables.orders(s, d)
        val a = o.filter($"o_orderdate" < cut).select($"o_custkey")
        val b = o.filter($"o_orderdate" >= cut).select($"o_custkey")
        a.intersect(b).select($"o_custkey", lit("both").as("cohort"))
          .unionByName(
            a.except(b).select($"o_custkey", lit("only_first").as("cohort")))
          .orderBy($"o_custkey")
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate < TIMESTAMP '1998-01-01'),
             |b AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1998-01-01')
             |SELECT o_custkey, 'both' AS cohort
             |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
             |UNION ALL
             |SELECT o_custkey, 'only_first' AS cohort
             |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
             |ORDER BY o_custkey""".stripMargin)),

    // ---- q118: CUBE aggregation — all 2ⁿ grouping combinations in
    // one pass (q40 covers the hierarchical ROLLUP subset). Explicit
    // per-column `grouping()` markers instead of a composite
    // grouping_id: bit-order conventions differ across engines, two
    // int columns don't.
    Q(
      "q118_cube_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .cube($"l_returnflag", $"l_linestatus")
          .agg(
            grouping($"l_returnflag").cast("int").as("g_flag"),
            grouping($"l_linestatus").cast("int").as("g_status"),
            count(lit(1)).as("n"),
            sum(dec($"l_quantity")).cast("double").as("sum_qty"))
          .orderBy($"g_flag", $"g_status", $"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
             |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
             |  count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)),

    // ---- q119: per-user EMA over daily purchase sums. The fold order
    // is pinned (period-ascending, first observation seeds) and α is
    // dyadic, but the decimal→double cast of daily sums double-rounds
    // engine-specifically — tolerance oracle, 1e-9, poison row.
    // DuckDB's list_reduce seeds from the first element exactly like
    // the Spark aggregate-over-tail formulation.
    Q(
      "q119_ema",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.ema(
          Tables.events(s, d).filter($"event_type" === "purchase"),
          $"user_id", $"ts", $"value", periodSeconds = 86400L, alpha = 0.25)
          .orderBy($"key")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q119_ema/*.parquet')),
             |o AS (SELECT user_id AS k, CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vd
             |  FROM events
             |  WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
             |    AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |se AS (SELECT k, count(*) AS n, max(period) AS lastp,
             |    list(vd ORDER BY period) AS l
             |  FROM o GROUP BY k),
             |expect AS (SELECT k, n, lastp,
             |    list_reduce(l, (acc, x) -> acc * 0.75 + x * 0.25) AS ema
             |  FROM se),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT key) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.key = x.k
             |      WHERE e.n_periods <> x.n OR e.last_period <> x.lastp
             |         OR abs(e.ema - x.ema) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.key NOT IN (SELECT k FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x
             |      WHERE x.k NOT IN (SELECT key FROM emitted))
             |  ) AS ok)
             |SELECT key, n_periods, last_period, ema FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY key""".stripMargin)),

    // ---- q120: grouped Pearson correlation (quantity vs extended
    // price per return flag) from exact decimal sufficient statistics;
    // pinned-double closed form, tolerance oracle (q112's shape).
    Q(
      "q120_grouped_corr",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.groupedCorr(
          Tables.lineitem(s, d), $"l_returnflag", $"l_quantity", $"l_extendedprice")
          .orderBy($"group")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q120_grouped_corr/*.parquet')),
             |-- DECIMAL(19,6), not (18,6): DuckDB multiplies (18,6)
             |-- operands in int64 unscaled space and overflows; one
             |-- extra digit forces int128 storage. The VALUES are
             |-- identical to Spark's (18,6) sums — only storage widens.
             |b AS (SELECT l_returnflag AS grp,
             |    CAST(l_quantity AS DECIMAL(19,6)) AS x,
             |    CAST(l_extendedprice AS DECIMAL(19,6)) AS y
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
             |    AND l_extendedprice IS NOT NULL),
             |st AS (SELECT grp, count(*) AS n,
             |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             |    CAST(sum(x * y) AS DOUBLE) AS sxy,
             |    CAST(sum(x * x) AS DOUBLE) AS sxx,
             |    CAST(sum(y * y) AS DOUBLE) AS syy
             |  FROM b GROUP BY grp),
             |expect AS (SELECT grp, n,
             |    CASE WHEN n > 1
             |        AND CAST(n AS DOUBLE) * sxx - sx * sx > 0
             |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0
             |      THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
             |         / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
             |          * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) END AS corr
             |  FROM st),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT "group") FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e."group" = x.grp
             |      WHERE e.n <> x.n
             |         OR (e.corr IS NULL) <> (x.corr IS NULL)
             |         OR abs(coalesce(e.corr, 0) - coalesce(x.corr, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e."group" NOT IN (SELECT grp FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x
             |      WHERE x.grp NOT IN (SELECT "group" FROM emitted))
             |  ) AS ok)
             |SELECT "group", n, corr FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY "group"""".stripMargin)),

    // ---- q121: MAD robust outliers (Iglewicz-Hoaglin modified
    // z-score) — the robust complement to q114: the yardstick is the
    // median absolute deviation, which the outliers cannot inflate.
    // Interpolated medians are not cross-engine bit-stable, so the
    // oracle is the ±1e-9 membership-band pattern of q114.
    Q(
      "q121_mad_outliers",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.madOutliers(
          Tables.events(s, d), $"event_type", $"event_id", $"value", threshold = 3.5)
          .orderBy($"group", $"id")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q121_mad_outliers/*.parquet')),
             |b AS (SELECT event_type AS grp, event_id AS id, value AS v
             |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
             |    AND NOT isnan(value)),
             |med AS (SELECT grp, quantile_cont(v, 0.5) AS med FROM b GROUP BY grp),
             |dev AS (SELECT b.grp, b.id, b.v, med, abs(b.v - med) AS ad
             |  FROM b JOIN med USING (grp)),
             |mads AS (SELECT grp, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY grp),
             |sc AS (SELECT dev.grp, dev.id, dev.v,
             |    0.6745 * (dev.v - dev.med) / mads.mad AS rz
             |  FROM dev JOIN mads USING (grp) WHERE mads.mad > 0),
             |flag AS (SELECT (
             |    (SELECT count(DISTINCT id) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE NOT EXISTS (SELECT 1 FROM sc
             |        WHERE sc.id = e.id AND sc.grp = e."group" AND sc.v = e.value
             |          AND abs(sc.rz - e.rz) <= 1e-9 AND abs(sc.rz) > 3.5 - 1e-9))
             |    AND NOT EXISTS (SELECT 1 FROM sc
             |      WHERE abs(sc.rz) > 3.5 + 1e-9
             |        AND NOT EXISTS (SELECT 1 FROM emitted e WHERE e.id = sc.id))
             |  ) AS ok)
             |SELECT "group", id, value, rz FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY "group", id""".stripMargin)),

    // ---- q122: Spark's NATIVE session_window aggregation — the
    // built-in API twin of q36's hand-rolled sessionizer (and q100's
    // stateful stream). Sessions merge while consecutive events are
    // strictly inside the gap ([start, last+gap) windows overlap);
    // the oracle derives identical sessions from first principles
    // with lag + cumulative break counts, so the built-in's merge
    // rule, boundary semantics (ts − prev ≥ gap starts a new
    // session), and emitted end = last + gap are all independently
    // checked.
    Q(
      "q122_session_window_native",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d).filter($"ts".isNotNull)
          .groupBy(session_window($"ts", "10 minutes").as("w"), $"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select($"user_id", $"w.start".as("session_start"),
            $"w.end".as("session_end"), $"n_events", $"total_value")
          .orderBy($"user_id", $"session_start")
      },
      Some("""WITH e AS (SELECT user_id, ts, value FROM events WHERE ts IS NOT NULL),
             |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM e),
             |f AS (SELECT *, CASE WHEN prev IS NULL
             |      OR ts - prev >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
             |  FROM l),
             |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS sid FROM f)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 10 MINUTE AS session_end,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // ---- q123: THEIL-SEN robust slope per user — the robust-trend
    // complement to q112's OLS (same input series, so the two are
    // directly comparable), exactly as q121's MAD complements q114's
    // z-score. Pairwise-slope expansion is per-key and span-bounded;
    // the median is the interpolated percentile, so the oracle
    // replays pairs + quantile_cont within 1e-9 (poison row
    // otherwise).
    Q(
      "q123_theil_sen_slope",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.theilSenSlope(
          Tables.events(s, d), $"user_id", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q123_theil_sen_slope/*.parquet')),
             |o AS (SELECT user_id AS k, CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
             |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             |    AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, count(*) AS n FROM o GROUP BY k),
             |pr AS (SELECT a.k, (b.y - a.y) / CAST(b.period - a.period AS DOUBLE) AS slope
             |  FROM o a JOIN o b ON a.k = b.k AND a.period < b.period),
             |md AS (SELECT k, quantile_cont(slope, 0.5) AS ts_slope FROM pr GROUP BY k),
             |expect AS (SELECT sp.k, sp.n, md.ts_slope FROM sp LEFT JOIN md USING (k)),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT key) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.key = x.k
             |      WHERE e.n_periods <> x.n
             |         OR (e.ts_slope IS NULL) <> (x.ts_slope IS NULL)
             |         OR abs(coalesce(e.ts_slope, 0) - coalesce(x.ts_slope, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.key NOT IN (SELECT k FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x
             |      WHERE x.k NOT IN (SELECT key FROM emitted))
             |  ) AS ok)
             |SELECT key, n_periods, ts_slope FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY key""".stripMargin)),

    // ---- q124: chi-square independence test — is event type
    // distributed independently of the user cohort? Counts/totals are
    // exact integers; only the final Σ o²/(rₐ·c_b) fold and the n·(q−1)
    // step are doubles, so the oracle replays Pearson's computational
    // form and admits chi2 within 1e-9 (poison row otherwise); every
    // other field must match exactly.
    Q(
      "q124_chi_square",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.chiSquare(
          Tables.events(s, d).select(($"user_id" % 4).as("cohort"), $"event_type"),
          $"cohort", $"event_type")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q124_chi_square/*.parquet')),
             |b AS (SELECT CAST(user_id % 4 AS VARCHAR) AS a, event_type AS bb
             |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
             |cells AS (SELECT a, bb, count(*) AS o FROM b GROUP BY a, bb),
             |rt AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
             |ct AS (SELECT bb, sum(o) AS cb FROM cells GROUP BY bb),
             |st AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT cells.a) AS n_a,
             |    count(DISTINCT cells.bb) AS n_b,
             |    sum(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
             |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))) AS q
             |  FROM cells JOIN rt USING (a) JOIN ct USING (bb)),
             |expect AS (SELECT n, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof,
             |    CAST(n AS DOUBLE) * (q - 1.0) AS chi2 FROM st),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 1
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON true
             |      WHERE e.n <> x.n OR e.n_a <> x.n_a OR e.n_b <> x.n_b
             |         OR e.dof <> x.dof OR abs(e.chi2 - x.chi2) > 1e-9)
             |  ) AS ok)
             |SELECT n, n_a, n_b, dof, chi2 FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q125: population-stability-index drift per event type,
    // first half of the date range as reference vs second half as
    // current — the monitoring companion to q124. Counts exact; p's
    // and ln() double — per-term tolerance oracle, 1e-9, poison row.
    Q(
      "q125_psi_drift",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.psi(
          Tables.events(s, d).filter($"ts".isNotNull),
          $"event_type", $"ts" >= lit("2024-01-16").cast("timestamp"))
          .orderBy($"category")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q125_psi_drift/*.parquet')),
             |b AS (SELECT event_type AS cat,
             |    ts >= TIMESTAMP '2024-01-16' AS cur
             |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
             |cells AS (SELECT cat,
             |    CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             |    CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
             |  FROM b GROUP BY cat),
             |tot AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
             |    CAST(sum(n_cur) AS DOUBLE) AS tc FROM cells),
             |expect AS (SELECT cat, n_ref, n_cur,
             |    (CAST(n_cur AS DOUBLE) / (SELECT tc FROM tot)
             |      - CAST(n_ref AS DOUBLE) / (SELECT tr FROM tot))
             |      * ln((CAST(n_cur AS DOUBLE) / (SELECT tc FROM tot))
             |        / (CAST(n_ref AS DOUBLE) / (SELECT tr FROM tot))) AS term
             |  FROM cells WHERE n_ref > 0 AND n_cur > 0),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT category) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.category = x.cat
             |      WHERE e.n_ref <> x.n_ref OR e.n_cur <> x.n_cur
             |         OR abs(e.psi_term - x.term) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.category NOT IN (SELECT cat FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x
             |      WHERE x.cat NOT IN (SELECT category FROM emitted))
             |  ) AS ok)
             |SELECT category, n_ref, n_cur, psi_term FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY category""".stripMargin))
  )

  /** Stage each frame as ONE parquet file in a fresh `input` dir with
    * ascending modification times — the deterministic multi-micro-
    * batch input shape q102/q107/q116 share: under
    * `maxFilesPerTrigger=1` each file becomes its own batch and mtime
    * order IS delivery order.
    */
  private[queries] def stageOrderedFiles(
      scratch: java.nio.file.Path,
      parts: Seq[(DataFrame, String)]): java.nio.file.Path = {
    val inDir = scratch.resolve("input")
    java.nio.file.Files.createDirectories(inDir)
    val t0 = System.currentTimeMillis() - 60000L
    parts.zipWithIndex.foreach { case ((df, name), i) =>
      val tmp = scratch.resolve(s"tmp_$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
      val src = try part.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      finally part.close()
      val dst = inDir.resolve(s"$name.parquet")
      java.nio.file.Files.move(src, dst)
      java.nio.file.Files.setLastModifiedTime(
        dst, java.nio.file.attribute.FileTime.fromMillis(t0 + i * 5000L)): Unit
    }
    inDir
  }

  /** Midpoint-split `df` on its `ts` column into two ordered batch
    * files (early, late) via [[stageOrderedFiles]].
    */
  private def stageTimeSplit(
      scratch: java.nio.file.Path, df: DataFrame): java.nio.file.Path = {
    val bounds = df.agg(min(col("ts")), max(col("ts"))).head()
    val cut = new java.sql.Timestamp(
      (bounds.getTimestamp(0).getTime + bounds.getTimestamp(1).getTime) / 2)
    stageOrderedFiles(scratch, Seq(
      (df.filter(col("ts") <= cut), "00_early"),
      (df.filter(col("ts") > cut), "01_late")))
  }

  /** q107: the live stream-static enrichment. Events stage as two
    * time-partitioned files (ascending mtimes, `maxFilesPerTrigger=1`
    * → ≥2 micro-batches, enforced); each batch joins the static
    * customer⋈nation dimension — Catalyst broadcasts the dim into
    * every micro-batch plan, the canonical "fact stream enriched by a
    * slowly-changing dimension read once" shape — and a complete-mode
    * streaming aggregation folds counts/sums across batches.
    */
  private def streamStaticEnrich(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q107_enrich")
    try {
      val ev = Tables.events(s, d).select($"user_id", $"ts", $"value")
        .filter($"ts".isNotNull)
      val inDir = stageTimeSplit(scratch, ev)
      val dim = Tables.customer(s, d)
        .join(Tables.nation(s, d),
          $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name")
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q107_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
        .join(broadcast(dim), $"user_id" === $"c_custkey")
        .groupBy($"n_name".as("nation"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec($"value")).cast("double").as("total_value"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q107 stream did not terminate within 600s — refusing a partial result")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 2,
          s"q107 ran $dataBatches data micro-batch(es); the cross-batch " +
            "aggregation path needs at least 2")
        s.table(name).orderBy($"nation").localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q102: the live CDC-apply loop. Three change windows stage as
    * parquet files with ascending modification times; a file stream
    * with `maxFilesPerTrigger=1` delivers each as its own micro-batch
    * in order, and foreachBatch folds it onto the running snapshot via
    * [[Cdc.upsertMerge]]. `localCheckpoint(eager)` after every merge
    * truncates the lineage (otherwise batch N's plan nests N merges);
    * at production scale the snapshot would be a stored table
    * rewritten per batch — the merge geometry (one anti-join, change
    * side broadcast) is identical.
    */
  private def streamingMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q102_merge")
    try {
      val ev = Tables.events(s, d)
      def state(df: DataFrame) = df.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(dec($"value")).cast("double").as("total_value"))
      def cut(day: Int) = lit(f"2024-01-$day%02d").cast("timestamp")
      val snap0 = state(ev.filter($"ts" < cut(11)))
      val windows = Seq(
        (state(ev.filter($"ts" >= cut(11) && $"ts" < cut(16)))
          .withColumn("del", lit(false)), "00_w1"),
        (state(ev.filter($"ts" >= cut(16) && $"ts" < cut(21)))
          .withColumn("del", $"user_id" % 9 === 0), "01_w2"),
        // last-window deletes are the OBSERVABLE delete path at this
        // data density (every user is active in every window, so a
        // batch-2 delete is always revived by batch 3's upsert)
        (state(ev.filter($"ts" >= cut(21)))
          .withColumn("del", $"user_id" % 5 === 3), "02_w3"))
      val inDir = stageOrderedFiles(scratch, windows)
      val schema = s.read.parquet(inDir.toString).schema
      val input = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      val outs = Seq("user_id" -> col("user_id"), "n_events" -> col("n_events"),
        "total_value" -> col("total_value"))
      // the fold state mutates on the STREAM EXECUTION thread (one
      // batch at a time) and is read back on this thread after
      // termination — atomics make that cross-thread hand-off safe by
      // construction instead of leaning on awaitTermination's
      // internal synchronization
      val snap = new java.util.concurrent.atomic.AtomicReference(
        snap0.localCheckpoint(true))
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = input.writeStream
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            snap.set(Cdc.upsertMerge(
              snap.get(), batch, col("user_id"), col("user_id"), col("del"), outs, outs)
              .localCheckpoint(true))
            batches.incrementAndGet(): Unit
          }
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(600000),
        "q102 stream did not terminate within 600s — refusing a partial result")
      finally q.stop()
      require(batches.get() >= 3,
        s"q102 applied ${batches.get()} change batch(es); the sequential-fold " +
          "path needs all 3 windows as separate micro-batches")
      snap.get().orderBy($"user_id")
    } finally Scratch.deleteRecursively(scratch)
  }
}

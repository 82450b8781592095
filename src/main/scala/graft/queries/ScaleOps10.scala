package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-10 queries: Greenwood survival bands, the Cox score test,
  * Benjamini–Hochberg FDR control, classical seasonal decomposition,
  * corpus-slice KL divergence, trimmed/winsorized means,
  * deterministic negative sampling, gap-constrained sequence pairs,
  * and embedding-truncation recall.
  */
object ScaleOps10 {

  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** User-lifetime subjects for the round-10 survival queries:
    * duration = whole HOURS between a user's first and last event
    * (an hour grain gives the time axis real resolution), churned =
    * the last event predates the observation edge by > 1 day. (The
    * q170 3-day censor never fires on this fixture — every user's
    * last event lands within 2.5 days of the global max — so q170's
    * curve is all-censored; this build has real deaths at both
    * scales.)
    */
  private def survivalSubjects(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .filter($"user_id".isNotNull && $"ts".isNotNull)
    val per = ev.groupBy($"user_id").agg(
      min(unix_micros($"ts")).as("first_us"),
      max(unix_micros($"ts")).as("last_us"),
      count(lit(1)).as("n_ev"))
    val obs = per.agg(max($"last_us").as("obs_us"))
    per.crossJoin(broadcast(obs)).select(
      floor(($"last_us" - $"first_us").cast("double") / lit(3600000000.0))
        .cast("long").as("dur"),
      ($"last_us" <= $"obs_us" - lit(86400000000L)).as("churned"),
      $"n_ev")
  }

  private val sqlSubjects =
    """per AS (SELECT user_id, min(epoch_us(ts)) AS first_us,
      |    max(epoch_us(ts)) AS last_us, count(*) AS n_ev
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
      |obs AS (SELECT max(last_us) AS obs_us FROM per),
      |subj AS (SELECT
      |    CAST(floor(CAST(last_us - first_us AS DOUBLE) / 3600000000.0) AS BIGINT) AS dur,
      |    last_us <= obs_us - 86400000000 AS churned, n_ev
      |  FROM per CROSS JOIN obs)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- q333: KAPLAN–MEIER WITH GREENWOOD BANDS — q170's curve plus
    // the Greenwood variance and the clipped linear z-interval
    // ([[graft.operators.Survival.kaplanMeierGreenwood]]). Counts are
    // exact; survival/variance/bands route through exp∘Σ∘ln once, so
    // the oracle replays counts exactly and the float columns to 1e-9
    // (the q170 certificate pattern).
    Q(
      "q333_km_greenwood",
      (s, d) => {
        import s.implicits._
        graft.operators.Survival.kaplanMeierGreenwood(
          survivalSubjects(s, d), $"dur", $"churned")
          .orderBy($"t")
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q333_km_greenwood/*.parquet')),
              |$sqlSubjects,
              |byt AS (SELECT dur AS t,
              |    sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_death,
              |    sum(CASE WHEN churned THEN 0 ELSE 1 END) AS n_censored
              |  FROM subj GROUP BY 1),
              |curve AS (SELECT t, n_death, n_censored,
              |    (SELECT count(*) FROM subj)
              |      - coalesce(sum(n_death + n_censored) OVER (ORDER BY t
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
              |  FROM byt),
              |surv AS (SELECT t, n_risk, n_death, n_censored,
              |    CASE WHEN max(CASE WHEN n_death > 0 AND n_death = n_risk THEN 1 ELSE 0 END)
              |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
              |      THEN 0.0
              |      ELSE exp(sum(CASE WHEN n_death > 0
              |          THEN ln(1.0 - CAST(n_death AS DOUBLE) / CAST(n_risk AS DOUBLE))
              |          ELSE 0.0 END)
              |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |    END AS survival,
              |    sum(CASE WHEN n_death > 0 AND n_death < n_risk
              |        THEN CAST(n_death AS DOUBLE)
              |          / (CAST(n_risk AS DOUBLE) * CAST(n_risk - n_death AS DOUBLE))
              |        ELSE 0.0 END)
              |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gsum
              |  FROM curve),
              |bands AS (SELECT t, n_risk, n_death, n_censored, survival,
              |    survival * survival * gsum AS greenwood_var,
              |    greatest(0.0, survival - 1.96 * sqrt(survival * survival * gsum)) AS ci_lo,
              |    least(1.0, survival + 1.96 * sqrt(survival * survival * gsum)) AS ci_hi
              |  FROM surv),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM bands)
              |    AND (SELECT count(DISTINCT t) FROM emitted) = (SELECT count(*) FROM emitted)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN bands x USING (t)
              |      WHERE e.n_risk <> x.n_risk OR e.n_death <> x.n_death
              |         OR e.n_censored <> x.n_censored
              |         OR abs(e.survival - x.survival) > 1e-9
              |         OR abs(e.greenwood_var - x.greenwood_var) > 1e-9
              |         OR abs(e.ci_lo - x.ci_lo) > 1e-9
              |         OR abs(e.ci_hi - x.ci_hi) > 1e-9)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e WHERE e.t NOT IN (SELECT t FROM bands))
              |    AND NOT EXISTS (SELECT 1 FROM bands x WHERE x.t NOT IN (SELECT t FROM emitted))
              |  ) AS ok)
              |SELECT t, n_risk, n_death, n_censored, survival, greenwood_var, ci_lo, ci_hi
              |FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
              |  CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE),
              |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)
              |ORDER BY t""".stripMargin)),

    // ---- q334: COX SCORE TEST at β = 0 — does per-user activity
    // volume (event count, an exact integer covariate) shift the
    // churn hazard? ([[graft.operators.Survival.coxScoreTest]]).
    // Every term is one correctly-rounded double chain from exact
    // integer moments and both cumulations are window sums in pinned
    // t-order — hash-exact, the q254 nelson-aalen discipline.
    Q(
      "q334_cox_score",
      (s, d) => {
        import s.implicits._
        graft.operators.Survival.coxScoreTest(
          survivalSubjects(s, d), $"dur", $"churned", $"n_ev")
      },
      Some(s"""WITH $sqlSubjects,
              |byt AS (SELECT dur AS t, count(*) AS leave,
              |    sum(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
              |    sum(CASE WHEN churned THEN n_ev ELSE 0 END) AS sxd,
              |    sum(n_ev) AS sx, sum(n_ev * n_ev) AS sxx
              |  FROM subj GROUP BY 1),
              |tot AS (SELECT sum(leave) AS n_total, sum(d) AS ev_total,
              |    sum(sx) AS sx_total, sum(sxx) AS sxx_total FROM byt),
              |risk AS (SELECT t, d, sxd,
              |    n_total - coalesce(sum(leave) OVER w, 0) AS n_t,
              |    sx_total - coalesce(sum(sx) OVER w, 0) AS sx_t,
              |    sxx_total - coalesce(sum(sxx) OVER w, 0) AS sxx_t,
              |    n_total, ev_total
              |  FROM byt CROSS JOIN tot
              |  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              |folded AS (SELECT n_total, ev_total,
              |    sum(CASE WHEN d > 0 THEN CAST(sxd AS DOUBLE)
              |        - CAST(d AS DOUBLE) * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE))
              |      ELSE 0.0 END) OVER wc AS u_cum,
              |    sum(CASE WHEN d > 0 THEN CAST(d AS DOUBLE)
              |        * (CAST(sxx_t AS DOUBLE) / CAST(n_t AS DOUBLE)
              |          - (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE))
              |            * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)))
              |      ELSE 0.0 END) OVER wc AS i_cum,
              |    row_number() OVER (ORDER BY t DESC) AS rn
              |  FROM risk
              |  WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT CAST(n_total AS BIGINT) AS n,
              |  CAST(ev_total AS BIGINT) AS n_events, u_cum AS u_score,
              |  i_cum AS information,
              |  CASE WHEN i_cum > 0.0 THEN u_cum / sqrt(i_cum) END AS z
              |FROM folded WHERE rn = 1""".stripMargin)),

    // ---- q335: BENJAMINI–HOCHBERG FDR CONTROL — 50-bucket × event-
    // type hypothesis grid with PORTABLE synthetic p-values (md5
    // bucket / 2³², the [[graft.operators.Sampling]] idiom — uniform
    // nulls) and a planted signal (purchase p's shrink 10⁶×); BH at
    // α = 1/10 must reject the planted block and almost none of the
    // nulls ([[graft.operators.Experiment.benjaminiHochberg]]). The
    // p column is float but identical in both engines — hash-exact.
    Q(
      "q335_bh_fdr",
      (s, d) => {
        import s.implicits._
        val tests = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"event_type".isNotNull)
          .select(concat($"event_type", lit(":"),
            pmod($"user_id", lit(50L)).cast("string")).as("test_id"))
          .distinct()
          .select($"test_id",
            (conv(substring(md5($"test_id".cast("binary")), 1, 8), 16, 10)
              .cast("long").cast("double") / lit(4294967296.0) /
              when($"test_id".startsWith("purchase"), lit(1000000.0))
                .otherwise(lit(1.0))).as("p"))
        graft.operators.Experiment.benjaminiHochberg(
          tests, $"test_id", $"p", alphaNum = 1L, alphaDen = 10L)
          .orderBy($"rank")
      },
      Some("""WITH tests AS (SELECT DISTINCT
             |    event_type || ':' || CAST(user_id % 50 AS VARCHAR) AS test_id
             |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
             |ps AS (SELECT test_id,
             |    CAST(('0x' || substring(md5(test_id), 1, 8)) AS BIGINT)::DOUBLE
             |      / 4294967296.0
             |      / (CASE WHEN test_id LIKE 'purchase%' THEN 1000000.0 ELSE 1.0 END) AS p
             |  FROM tests),
             |ranked AS (SELECT test_id, p,
             |    CAST(row_number() OVER (ORDER BY p ASC, test_id ASC) AS BIGINT) AS rank,
             |    (SELECT count(*) FROM ps) AS m
             |  FROM ps),
             |flagged AS (SELECT *,
             |    p * CAST(m AS DOUBLE) * 10.0 <= CAST(rank AS DOUBLE) * 1.0 AS flag
             |  FROM ranked),
             |k AS (SELECT max(CASE WHEN flag THEN rank END) AS kmax FROM flagged)
             |SELECT test_id, p, rank,
             |  (kmax IS NOT NULL AND rank <= kmax) AS rejected
             |FROM flagged CROSS JOIN k
             |ORDER BY rank""".stripMargin)),

    // ---- q336: CLASSICAL SEASONAL DECOMPOSITION — per event type,
    // daily event counts split into a 7-day centered-MA trend, a
    // zero-sum weekday index, and the residual
    // ([[graft.operators.TimeSeries.seasonalDecompose]]). The
    // detrended value rides as the exact integer numerator m·y − S,
    // so every float is one pinned division chain — hash-exact.
    Q(
      "q336_seasonal_decompose",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.seasonalDecompose(
          Tables.events(s, d)
            .filter($"event_type".isNotNull && $"ts".isNotNull),
          $"event_type", $"ts", lit(1.0), seasonLen = 7)
          .orderBy($"key", $"period")
      },
      Some("""WITH obs AS (SELECT event_type AS k,
             |    epoch_us(ts) // 86400000000 AS p, count(*) AS y
             |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |spans AS (SELECT k, min(p) AS p0, max(p) AS p1 FROM obs GROUP BY 1),
             |grid AS (SELECT k, unnest(range(p0, p1 + 1)) AS p FROM spans),
             |dense AS MATERIALIZED (SELECT g.k, g.p, coalesce(o.y, 0) AS y
             |  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.p = o.p),
             |trended AS MATERIALIZED (SELECT k, p, y,
             |    sum(y) OVER w AS s, count(*) OVER w = 7 AS it_full,
             |    7 * y - sum(y) OVER w AS dnum, p % 7 AS phase
             |  FROM dense
             |  WINDOW w AS (PARTITION BY k ORDER BY p ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |phases AS (SELECT k, phase,
             |    CAST(sum(dnum) AS DOUBLE) / (7.0 * CAST(count(*) AS DOUBLE)) AS sraw
             |  FROM trended WHERE it_full GROUP BY 1, 2),
             |season AS (SELECT k, phase,
             |    sraw - sum(sraw) OVER wp / count(*) OVER wp AS seasonal
             |  FROM phases
             |  WINDOW wp AS (PARTITION BY k ORDER BY phase
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
             |joined AS (SELECT t.k AS key, t.p AS period, t.phase, t.y,
             |    CAST(t.s AS DOUBLE) / 7.0 AS trend, se.seasonal,
             |    CAST(t.y AS DOUBLE) - CAST(t.s AS DOUBLE) / 7.0 - se.seasonal AS residual
             |  FROM trended t JOIN season se ON t.k = se.k AND t.phase = se.phase
             |  WHERE t.it_full)
             |SELECT * FROM joined ORDER BY key, period""".stripMargin)),

    // ---- q337: UNIGRAM KL DIVERGENCE between the English slice and
    // the rest of the corpus — the distribution-shift audit of a data
    // mix ([[graft.operators.TextAnalysis.unigramKlDivergence]]).
    // Counts are exact; each term is one ln, so the oracle replays
    // counts exactly and the KL columns to 1e-9 (certificate).
    Q(
      "q337_unigram_kl",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.unigramKlDivergence(
          Tables.documents(s, d), $"text",
          coalesce($"lang" === "en", lit(false)))
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q337_unigram_kl/*.parquet')),
              |toks AS (SELECT coalesce(lang = 'en', false) AS ina,
              |    unnest($sqlToks) AS tok FROM documents),
              |counts AS (SELECT tok,
              |    sum(CASE WHEN ina THEN 1 ELSE 0 END) AS ca,
              |    sum(CASE WHEN ina THEN 0 ELSE 1 END) AS cb
              |  FROM toks GROUP BY 1),
              |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v FROM counts),
              |folded AS (SELECT na, nb, v,
              |    sum((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
              |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
              |          / (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)))) OVER wc AS kl_ab,
              |    sum((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
              |      * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
              |          / (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)))) OVER wc AS kl_ba,
              |    row_number() OVER (ORDER BY tok DESC) AS rn
              |  FROM counts CROSS JOIN tot
              |  WINDOW wc AS (ORDER BY tok ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              |x AS (SELECT na AS n_a, nb AS n_b, v AS vocab, kl_ab, kl_ba
              |  FROM folded WHERE rn = 1),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = 1
              |    AND NOT EXISTS (SELECT 1 FROM emitted e, x
              |      WHERE e.n_a <> x.n_a OR e.n_b <> x.n_b OR e.vocab <> x.vocab
              |         OR abs(e.kl_ab - x.kl_ab) > 1e-9
              |         OR abs(e.kl_ba - x.kl_ba) > 1e-9)
              |  ) AS ok)
              |SELECT * FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
              |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q338: TRIMMED + WINSORIZED MEAN of customer balances per
    // nation, 1/8 off each tail
    // ([[graft.operators.RankStats.trimmedMean]]): exact decimal sums
    // + closed-form winsorized arithmetic, one pinned division each —
    // hash-exact.
    Q(
      "q338_trimmed_mean",
      (s, d) => {
        import s.implicits._
        graft.operators.RankStats.trimmedMean(
          Tables.customer(s, d)
            .select($"c_nationkey",
              round($"c_acctbal" * 100).cast("long").as("cents")),
          $"c_nationkey", $"cents", trimNum = 1L, trimDen = 8L)
          .orderBy($"group")
      },
      Some("""WITH vals AS (SELECT c_nationkey AS g,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
             |ranked AS (SELECT g, v,
             |    row_number() OVER (PARTITION BY g ORDER BY v ASC) AS rank
             |  FROM vals),
             |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(*) // 8 AS BIGINT) AS cut
             |  FROM vals GROUP BY 1),
             |agg AS (SELECT r.g, s.n, s.cut,
             |    sum(CASE WHEN r.rank > s.cut AND r.rank <= s.n - s.cut THEN r.v ELSE 0 END) AS tsum,
             |    min(CASE WHEN r.rank >= s.cut + 1 THEN r.v END) AS vlo,
             |    max(CASE WHEN r.rank <= s.n - s.cut THEN r.v END) AS vhi
             |  FROM ranked r JOIN st s ON r.g = s.g
             |  GROUP BY 1, 2, 3)
             |SELECT g AS "group", n, cut,
             |  CAST(tsum AS DOUBLE) / CAST(n - cut * 2 AS DOUBLE) AS trimmed_mean,
             |  CAST(tsum + cut * (vlo + vhi) AS DOUBLE)
             |    / CAST(n AS DOUBLE) AS winsorized_mean
             |FROM agg ORDER BY "group"""".stripMargin)),

    // ---- q339: DETERMINISTIC NEGATIVE SAMPLING — 5 content-addressed
    // negatives per customer (custkey < 200) from the top-100-parts
    // candidate pool, positives anti-joined out
    // ([[graft.operators.Sampling.negativeSample]]). The md5 rank is
    // the portable sampling idiom — hash-exact.
    Q(
      "q339_negative_sampling",
      (s, d) => {
        import s.implicits._
        val inter = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .filter($"o_custkey" < 200)
          .select($"o_custkey".as("u"), $"l_partkey".as("i"))
        val pool = Tables.lineitem(s, d)
          .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"l_partkey".asc).limit(100)
        graft.operators.Sampling.negativeSample(
          inter, $"u", $"i",
          pool, $"l_partkey", $"l_partkey".cast("string"), k = 5)
          .orderBy($"user", $"neg_rank")
      },
      Some("""WITH inter AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_custkey < 200),
             |pool AS (SELECT l_partkey AS pi, CAST(l_partkey AS VARCHAR) AS pk
             |  FROM (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1
             |        ORDER BY cnt DESC, l_partkey ASC LIMIT 100)),
             |cand AS (SELECT us.u, pool.pi,
             |    CAST(('0x' || substring(md5(CAST(us.u AS VARCHAR) || ':' || pool.pk), 1, 8))
             |      AS BIGINT) AS score
             |  FROM (SELECT DISTINCT u FROM inter) us CROSS JOIN pool
             |  WHERE NOT EXISTS (SELECT 1 FROM inter x WHERE x.u = us.u AND x.i = pool.pi)),
             |ranked AS (SELECT u, pi,
             |    CAST(row_number() OVER (PARTITION BY u ORDER BY score ASC, pi ASC) AS BIGINT)
             |      AS neg_rank
             |  FROM cand)
             |SELECT u AS "user", pi AS item, neg_rank FROM ranked
             |WHERE neg_rank <= 5 ORDER BY "user", neg_rank""".stripMargin)),

    // ---- q340: GAP-CONSTRAINED SEQUENTIAL PAIRS — "a then b within
    // the next 3 actions" support over per-user event streams
    // ([[graft.operators.Sequences.gapPairs]]); skip-gram mining
    // where q-bigrams count only adjacency. Exact integers —
    // hash-exact.
    Q(
      "q340_gap_pairs",
      (s, d) => {
        import s.implicits._
        graft.operators.Sequences.gapPairs(
          Tables.events(s, d)
            .filter($"user_id".isNotNull && $"event_type".isNotNull),
          $"user_id", Seq($"ts", $"event_id"), $"event_type", maxGap = 3)
          .orderBy($"first_event", $"later_event", $"gap")
      },
      Some("""WITH base AS (SELECT user_id, event_type, ts, event_id FROM events
             |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
             |leads AS (SELECT user_id, event_type AS first_event,
             |    lead(event_type, 1) OVER w AS l1,
             |    lead(event_type, 2) OVER w AS l2,
             |    lead(event_type, 3) OVER w AS l3
             |  FROM base
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |pairs AS (
             |  SELECT user_id, first_event, l1 AS later_event, CAST(1 AS BIGINT) AS gap
             |    FROM leads WHERE l1 IS NOT NULL
             |  UNION ALL
             |  SELECT user_id, first_event, l2, CAST(2 AS BIGINT) FROM leads WHERE l2 IS NOT NULL
             |  UNION ALL
             |  SELECT user_id, first_event, l3, CAST(3 AS BIGINT) FROM leads WHERE l3 IS NOT NULL)
             |SELECT first_event, later_event, gap,
             |  count(*) AS occurrences,
             |  count(DISTINCT user_id) AS n_entities
             |FROM pairs GROUP BY 1, 2, 3
             |ORDER BY first_event, later_event, gap""".stripMargin)),

    // ---- q341: EMBEDDING-TRUNCATION RECALL@10 — how much of the
    // exact 64-dim top-10 survives at the 32-dim prefix (the
    // Matryoshka audit;
    // [[graft.operators.Similarity.truncationRecall]]). Memberships
    // are exact in both engines (the q29 cosine contract), so the
    // overlap counts and the one pinned division hash exactly.
    Q(
      "q341_truncation_recall",
      (s, d) => {
        import s.implicits._
        val corpus = Tables.embeddings(s, d)
        val queries = corpus.filter($"vec_id" < 20)
        graft.operators.Similarity.truncationRecall(
          corpus, queries, $"embedding", $"vec_id", $"embedding", $"vec_id",
          k = 10, dims = 32)
          .orderBy($"query_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
             |full_topk AS (SELECT query_id, corpus_id FROM (
             |    SELECT query_id, e.vec_id AS corpus_id,
             |      row_number() OVER (PARTITION BY query_id ORDER BY
             |        list_dot_product(qv, v)
             |          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) DESC,
             |        e.vec_id ASC) AS rank
             |    FROM e CROSS JOIN q WHERE e.vec_id <> query_id)
             |  WHERE rank <= 10),
             |trunc_topk AS (SELECT query_id, corpus_id FROM (
             |    SELECT query_id, e.vec_id AS corpus_id,
             |      row_number() OVER (PARTITION BY query_id ORDER BY
             |        list_dot_product(qv[1:32], v[1:32])
             |          / (sqrt(list_dot_product(qv[1:32], qv[1:32]))
             |            * sqrt(list_dot_product(v[1:32], v[1:32]))) DESC,
             |        e.vec_id ASC) AS rank
             |    FROM e CROSS JOIN q WHERE e.vec_id <> query_id)
             |  WHERE rank <= 10)
             |SELECT f.query_id, count(*) AS n_full,
             |  CAST(sum(CASE WHEN t.corpus_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_common,
             |  CAST(sum(CASE WHEN t.corpus_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS recall
             |FROM full_topk f LEFT JOIN trunc_topk t
             |  ON f.query_id = t.query_id AND f.corpus_id = t.corpus_id
             |GROUP BY 1 ORDER BY 1""".stripMargin)))

  /** Generated DuckDB replay of the B-resample Poisson-weight build:
    * per resample b, the uniform u_b = md5(id:b) bucket and the
    * inverse-CDF weight as a CASE chain over [[graft.operators
    * .Resample.poissonCdf]] — the identical double literals via
    * string casts, so both engines compare identical bits.
    */
  private def sqlBootstrap(b: Int, loIdx: Int, hiIdx: Int): String = {
    val cdf = graft.operators.Resample.poissonCdf
    def wExpr(bi: Int): String = {
      val u = s"CAST(('0x' || substring(md5(id || ':$bi'), 1, 8)) AS BIGINT)::DOUBLE / 4294967296.0"
      val cases = cdf.zipWithIndex.map { case (t, k) =>
        s"WHEN $u < CAST('$t' AS DOUBLE) THEN $k"
      }.mkString(" ")
      s"CASE $cases ELSE 8 END AS w$bi"
    }
    val wCols = (0 until b).map(wExpr).mkString(",\n    ")
    val aggCols = (0 until b).map(bi =>
      s"sum(w$bi * v) AS ws$bi, sum(w$bi) AS wn$bi").mkString(",\n    ")
    val meanItems = (0 until b).map(bi =>
      s"CASE WHEN wn$bi > 0 THEN CAST(ws$bi AS DOUBLE) / CAST(wn$bi AS DOUBLE) END")
      .mkString(", ")
    s"""w AS (SELECT g, v,
       |    $wCols
       |  FROM vals),
       |agg AS (SELECT g, count(*) AS n, sum(v) AS s0,
       |    $aggCols
       |  FROM w GROUP BY 1),
       |ms AS (SELECT g, n, s0,
       |    list_sort(list_filter([$meanItems], x -> x IS NOT NULL)) AS m
       |  FROM agg),
       |fin AS (SELECT g, n, s0, m, len(m) AS nb,
       |    list_reduce(m, (a, x) -> a + x) / CAST(len(m) AS DOUBLE) AS mm
       |  FROM ms)
       |SELECT g AS "group", CAST(n AS BIGINT) AS n,
       |  CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
       |  CASE WHEN nb > 1 THEN sqrt(
       |    list_reduce(list_transform(m, x -> (x - mm) * (x - mm)),
       |      (a, x) -> a + x) / CAST(nb - 1 AS DOUBLE)) END AS boot_se,
       |  m[least($loIdx, nb)] AS boot_lo,
       |  m[least($hiIdx, nb)] AS boot_hi
       |FROM fin ORDER BY "group"""".stripMargin
  }

  val all2: Seq[Q] = Seq(

    // ---- q342: QUANTILE NORMALIZATION — customer balances forced to
    // a common distribution across market segments
    // ([[graft.operators.RankStats.quantileNormalize]]): rank within
    // segment, remap to the cross-segment rank mean. Exact sums, one
    // pinned division per rank — hash-exact.
    Q(
      "q342_quantile_normalize",
      (s, d) => {
        import s.implicits._
        graft.operators.RankStats.quantileNormalize(
          Tables.customer(s, d)
            .select($"c_mktsegment", $"c_custkey",
              round($"c_acctbal" * 100).cast("long").as("cents")),
          $"c_mktsegment", $"c_custkey", $"cents")
          .orderBy($"group", $"rank")
      },
      Some("""WITH vals AS (SELECT c_mktsegment AS g, c_custkey AS id,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
             |ranked AS (SELECT g, id, v,
             |    CAST(row_number() OVER (PARTITION BY g ORDER BY v ASC, id ASC)
             |      AS BIGINT) AS rank
             |  FROM vals),
             |perrank AS (SELECT rank AS nr,
             |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS normalized
             |  FROM ranked GROUP BY 1)
             |SELECT g AS "group", id, v AS value, rank, normalized
             |FROM ranked JOIN perrank ON rank = nr
             |ORDER BY "group", rank""".stripMargin)),

    // ---- q343: POISSON BOOTSTRAP CI — per-nation mean balance with
    // 32 deterministic md5-weighted resamples
    // ([[graft.operators.Resample.poissonBootstrapCI]]): the
    // RNG-free uncertainty estimate; resample means sort inside one
    // row, every float chain pinned — hash-exact (the oracle
    // replays the fold with list_reduce, same left-to-right order).
    Q(
      "q343_poisson_bootstrap",
      (s, d) => {
        import s.implicits._
        graft.operators.Resample.poissonBootstrapCI(
          Tables.customer(s, d)
            .select($"c_nationkey", $"c_custkey".cast("string").as("id"),
              round($"c_acctbal" * 100).cast("long").as("cents")),
          $"c_nationkey", $"id", $"cents", b = 32)
          .orderBy($"group")
      },
      Some(s"""WITH vals AS (SELECT c_nationkey AS g,
              |    CAST(c_custkey AS VARCHAR) AS id,
              |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
              |${sqlBootstrap(b = 32, loIdx = 1, hiIdx = 32)}""".stripMargin)),

    // ---- q344: SPRT LAUNCH MONITOR — Wald's sequential test of
    // H1: purchase rate = 1/5 vs H0: = 1/10 over the daily event
    // stream ([[graft.operators.Experiment.sprtMonitor]]); the
    // peeking-safe alternative to repeated z-tests. Counts exact;
    // the four ln constants are libm, so the oracle replays counts
    // exactly, LLR to 1e-9, and decisions from its own LLR with a
    // 1e-6 boundary band (certificate).
    Q(
      "q344_sprt_monitor",
      (s, d) => {
        import s.implicits._
        graft.operators.Experiment.sprtMonitor(
          Tables.events(s, d).filter($"ts".isNotNull),
          $"ts", coalesce($"event_type" === "purchase", lit(false)),
          p0Num = 1, p0Den = 10, p1Num = 1, p1Den = 5)
          .orderBy($"period")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q344_sprt_monitor/*.parquet')),
             |cells AS (SELECT epoch_us(ts) // 86400000000 AS period,
             |    count(*) AS n,
             |    sum(CASE WHEN coalesce(event_type = 'purchase', false)
             |      THEN 1 ELSE 0 END) AS conv
             |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |folded AS (SELECT period, n, conv,
             |    sum(CAST(conv AS DOUBLE) * ln(2.0)
             |      + CAST(n - conv AS DOUBLE) * ln(8.0 / 9.0))
             |      OVER (ORDER BY period ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS llr
             |  FROM cells),
             |mine AS (SELECT period, n, conv, llr,
             |    CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
             |         WHEN llr <= ln(1.0 / 19.0) THEN 'accept_h0'
             |         ELSE 'continue' END AS dec,
             |    least(abs(llr - ln(19.0)), abs(llr - ln(1.0 / 19.0))) AS margin
             |  FROM folded),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM mine)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN mine x USING (period)
             |      WHERE e.n <> x.n OR e.conversions <> x.conv
             |         OR abs(e.llr_cum - x.llr) > 1e-9
             |         OR (e.decision <> x.dec AND x.margin > 1e-6))
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.period NOT IN (SELECT period FROM mine))
             |  ) AS ok)
             |SELECT period, n, conversions, llr_cum, decision FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), 'gate-failed'
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY period""".stripMargin)),

    // ---- q345: STREAMING CUSUM DRIFT ALERTS — Page's change
    // detector live per event type ([[graft.streaming.Cusum]], the
    // watermark-buffer template's sixth instance). Batch membership
    // scrambled exactly like q306 (hash-chosen trailing bands one
    // batch late, inside the 2-day delay) + the far-future flush
    // sentinel; buffers must drain to scalar state rows. The oracle
    // is fully declarative: the R − min-prefix closed form of
    // max(0, S + x), alerting on crossings of h from below. All
    // int64 cents — hash-exact.
    Q(
      "q345_streaming_cusum",
      (s, d) => streamingCusum(s, d),
      Some("""WITH base AS MATERIALIZED (SELECT event_type AS k,
             |    epoch_us(ts) AS us, event_id AS id,
             |    CAST(round(value * 100) AS BIGINT) - 5500 AS dlt
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |    AND value IS NOT NULL AND event_id IS NOT NULL),
             |r AS (SELECT k, us, id, sum(dlt) OVER w AS rr
             |  FROM base
             |  WINDOW w AS (PARTITION BY k ORDER BY us, id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |r2 AS (SELECT k, us, id, rr, least(0, min(rr) OVER w) AS m
             |  FROM r
             |  WINDOW w AS (PARTITION BY k ORDER BY us, id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |s AS (SELECT k, us, id, rr - m AS cu,
             |    lag(rr - m, 1, 0) OVER (PARTITION BY k ORDER BY us, id) AS sp
             |  FROM r2)
             |SELECT k AS key, us AS alert_us, id AS event_id,
             |  CAST(cu AS BIGINT) AS cusum_cents
             |FROM s WHERE sp < 50000 AND cu >= 50000
             |ORDER BY key, alert_us, event_id""".stripMargin)))

  val all3: Seq[Q] = Seq(

    // ---- q346: BOILERPLATE-PREFIX GROUPS — documents sharing the
    // same normalized 64-char PREFIX (the template/header detector:
    // full-content dedup misses documents whose bodies diverge after
    // a copied boilerplate opening — license headers, scraped nav
    // bars, form letters). Same normalization as
    // [[graft.operators.TextAnalysis.fingerprint]], truncated before
    // hashing. One aggregation + one join back — hash-exact.
    Q(
      "q346_boilerplate_prefixes",
      (s, d) => {
        import s.implicits._
        val fp = Tables.documents(s, d)
          .select($"doc_id", $"lang",
            md5(substring(
              regexp_replace(trim(lower($"text")), "\\s+", " "), 1, 64))
              .as("pfp"))
        val multi = fp.groupBy($"pfp").agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"lang").as("n_langs"))
          .filter($"n_docs" >= 2)
        fp.join(multi, Seq("pfp"))
          .select($"pfp", $"doc_id", $"lang", $"n_docs", $"n_langs")
          .orderBy($"pfp", $"doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id, lang,
             |    md5(substring(
             |      regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 64))
             |      AS pfp
             |  FROM documents),
             |multi AS (SELECT pfp, count(*) AS n_docs,
             |    count(DISTINCT lang) AS n_langs
             |  FROM fp GROUP BY 1 HAVING count(*) >= 2)
             |SELECT fp.pfp, doc_id, lang, n_docs, n_langs
             |FROM fp JOIN multi USING (pfp)
             |ORDER BY pfp, doc_id""".stripMargin)),

    // ---- q347: SEASONAL ANOMALY DETECTION — the productionized
    // composite of q336: decompose per-type daily counts, then flag
    // days whose residual exceeds 1.75 robust sigmas (MAD·1.4826 —
    // the Hampel identifier, threshold tuned to this corpus's tame
    // synthetic seasonality) of the key's own residual distribution.
    // Per-key medians come from rank windows (calendar-bounded);
    // every float chain is pinned — hash-exact.
    Q(
      "q347_seasonal_anomalies",
      (s, d) => {
        import s.implicits._
        val dec = graft.operators.TimeSeries.seasonalDecompose(
          Tables.events(s, d)
            .filter($"event_type".isNotNull && $"ts".isNotNull),
          $"event_type", $"ts", lit(1.0), seasonLen = 7)
          .localCheckpoint(true) // residual medians + output read this
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy($"key").orderBy($"residual".asc, $"period".asc)
        val ranked = dec
          .withColumn("rn", row_number().over(wRank).cast("long"))
          .withColumn("nk", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"key")))
        // median = mean of the two middle ranks (equal for odd n);
        // Column `/` is TRUE division — floor back to integer ranks
        val med = ranked.filter(
          $"rn" === floor(($"nk" + 1L) / 2L).cast("long") ||
            $"rn" === floor($"nk" / 2L).cast("long") + 1L)
          .groupBy($"key").agg(avg($"residual").as("med"))
          .select($"key".as("mk"), $"med")
        val absdev = dec.join(med, $"key" === $"mk")
          .withColumn("ad", abs($"residual" - $"med"))
        val wRank2 = org.apache.spark.sql.expressions.Window
          .partitionBy($"key").orderBy($"ad".asc, $"period".asc)
        val mad = absdev
          .withColumn("rn", row_number().over(wRank2).cast("long"))
          .withColumn("nk", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"key")))
          .filter($"rn" === floor(($"nk" + 1L) / 2L).cast("long") ||
            $"rn" === floor($"nk" / 2L).cast("long") + 1L)
          .groupBy($"key").agg(avg($"ad").as("mad"))
          .select($"key".as("dk"), $"mad")
        dec.join(med, $"key" === $"mk").join(mad, $"key" === $"dk")
          .filter($"mad" > 0.0 &&
            abs($"residual" - $"med") > lit(1.75) * lit(1.4826) * $"mad")
          .select($"key", $"period", $"y", $"residual", $"med", $"mad")
          .orderBy($"key", $"period")
      },
      Some("""WITH obs AS (SELECT event_type AS k,
             |    epoch_us(ts) // 86400000000 AS p, count(*) AS y
             |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |spans AS (SELECT k, min(p) AS p0, max(p) AS p1 FROM obs GROUP BY 1),
             |grid AS (SELECT k, unnest(range(p0, p1 + 1)) AS p FROM spans),
             |dense AS MATERIALIZED (SELECT g.k, g.p, coalesce(o.y, 0) AS y
             |  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.p = o.p),
             |trended AS MATERIALIZED (SELECT k, p, y,
             |    sum(y) OVER w AS s, count(*) OVER w = 7 AS it_full,
             |    7 * y - sum(y) OVER w AS dnum, p % 7 AS phase
             |  FROM dense
             |  WINDOW w AS (PARTITION BY k ORDER BY p ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |phases AS (SELECT k, phase,
             |    CAST(sum(dnum) AS DOUBLE) / (7.0 * CAST(count(*) AS DOUBLE)) AS sraw
             |  FROM trended WHERE it_full GROUP BY 1, 2),
             |season AS (SELECT k, phase,
             |    sraw - sum(sraw) OVER wp / count(*) OVER wp AS seasonal
             |  FROM phases
             |  WINDOW wp AS (PARTITION BY k ORDER BY phase
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
             |dec AS MATERIALIZED (SELECT t.k AS key, t.p AS period, t.y,
             |    CAST(t.y AS DOUBLE) - CAST(t.s AS DOUBLE) / 7.0 - se.seasonal AS residual
             |  FROM trended t JOIN season se ON t.k = se.k AND t.phase = se.phase
             |  WHERE t.it_full),
             |r1 AS (SELECT key, period, residual,
             |    CAST(row_number() OVER (PARTITION BY key ORDER BY residual ASC, period ASC)
             |      AS BIGINT) AS rn,
             |    count(*) OVER (PARTITION BY key) AS nk
             |  FROM dec),
             |med AS (SELECT key, avg(residual) AS med FROM r1
             |  WHERE rn = (nk + 1) // 2 OR rn = nk // 2 + 1 GROUP BY 1),
             |r2 AS (SELECT d.key, d.period, abs(d.residual - m.med) AS ad
             |  FROM dec d JOIN med m USING (key)),
             |r3 AS (SELECT key, period, ad,
             |    CAST(row_number() OVER (PARTITION BY key ORDER BY ad ASC, period ASC)
             |      AS BIGINT) AS rn,
             |    count(*) OVER (PARTITION BY key) AS nk
             |  FROM r2),
             |mad AS (SELECT key, avg(ad) AS mad FROM r3
             |  WHERE rn = (nk + 1) // 2 OR rn = nk // 2 + 1 GROUP BY 1)
             |SELECT d.key, d.period, d.y, d.residual, m.med, x.mad
             |FROM dec d JOIN med m USING (key) JOIN mad x USING (key)
             |WHERE x.mad > 0.0 AND abs(d.residual - m.med) > 1.75 * 1.4826 * x.mad
             |ORDER BY d.key, d.period""".stripMargin)))

  val all4: Seq[Q] = Seq(

    // ---- q348: COCHRAN–ARMITAGE TREND TEST — does the purchase rate
    // trend across time-of-day quartiles (dose = hour div 6)?
    // ([[graft.operators.Experiment.cochranArmitage]]). One pass to
    // five integer sufficient statistics; exact decimal audit digests
    // ride out as strings; z is one pinned chain — hash-exact.
    Q(
      "q348_cochran_armitage",
      (s, d) => {
        import s.implicits._
        graft.operators.Experiment.cochranArmitage(
          Tables.events(s, d)
            .filter($"ts".isNotNull && $"event_type".isNotNull)
            .select((hour($"ts") / 6).cast("long").as("dose"),
              ($"event_type" === "purchase").as("c")),
          $"dose", $"c")
      },
      Some("""WITH base AS (SELECT CAST(hour(ts) // 6 AS BIGINT) AS s,
             |    event_type = 'purchase' AS c
             |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
             |agg AS (SELECT count(*) AS n,
             |    sum(CASE WHEN c THEN 1 ELSE 0 END) AS r,
             |    count(DISTINCT s) AS k,
             |    sum(s) AS sn,
             |    sum(CASE WHEN c THEN s ELSE 0 END) AS sr,
             |    sum(s * s) AS ssn
             |  FROM base)
             |SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS successes,
             |  CAST(k AS BIGINT) AS k_doses,
             |  CAST(n * sr - r * sn AS VARCHAR) AS t_num,
             |  CAST(n * ssn - sn * sn AS VARCHAR) AS v_num,
             |  CASE WHEN r * (n - r) > 0 AND n * ssn - sn * sn > 0 THEN
             |    CAST(n * sr - r * sn AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
             |      / sqrt(CAST(r * (n - r) AS DOUBLE)
             |        * CAST(n * ssn - sn * sn AS DOUBLE))
             |  END AS z
             |FROM agg""".stripMargin)),

    // ---- q349: INTRACLASS CORRELATION ICC(1,1) — are line
    // QUANTITIES within one order more alike than across orders?
    // ([[graft.operators.Experiment.intraclassCorrelation]]; quantity
    // is the integer measurement whose square-sum stays inside 2^53
    // at every replica scale — cents do not, and the operator's guard
    // raises on them by design). Exact per-group moments; the k-row
    // fold is a pinned window in group order — hash-exact. Groups are
    // the DETERMINISTIC mod-16 order sample: the operator's pinned
    // k-row fold bounds the group axis at 10⁶ by design (its guard
    // message prescribes subsampling groups), and the raw order axis
    // crosses that at the 10× replica (1.5M orders) — the sf1 sweep
    // caught the raise. A key-mod sample is scale-stable, replayable,
    // and statistically a simple random sample of groups.
    Q(
      "q349_intraclass_corr",
      (s, d) => {
        import s.implicits._
        graft.operators.Experiment.intraclassCorrelation(
          Tables.lineitem(s, d)
            .filter($"l_orderkey".isNotNull && $"l_quantity".isNotNull &&
              $"l_orderkey" % 16 === 0)
            .select($"l_orderkey", $"l_quantity".cast("long").as("qty")),
          $"l_orderkey", $"qty")
      },
      // certificate: DuckDB's windowed double SUM is segment-tree
      // associated (NOT left-to-right) — at 14.7k fold terms the
      // reassociation drifts ~1e-8 absolute on 1e6-magnitude sums, so
      // the oracle recomputes independently and compares the float
      // columns at 1e-9 RELATIVE (counts exact, poison row on fail)
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q349_intraclass_corr/*.parquet')),
             |per AS (SELECT l_orderkey AS g, count(*) AS ng,
             |    sum(CAST(l_quantity AS BIGINT)) AS sx,
             |    sum(CAST(l_quantity AS BIGINT)
             |      * CAST(l_quantity AS BIGINT)) AS sxx
             |  FROM lineitem
             |  WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
             |    AND l_orderkey % 16 = 0
             |  GROUP BY 1),
             |tot AS (SELECT count(*) AS k, sum(ng) AS nn, sum(sx) AS gx,
             |    sum(sxx) AS gxx, sum(ng * ng) AS sn2 FROM per),
             |bs AS (SELECT sum(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |    / CAST(ng AS DOUBLE)) AS bsum FROM per),
             |calc AS (SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
             |    bsum - CAST(gx AS DOUBLE) * CAST(gx AS DOUBLE)
             |      / CAST(nn AS DOUBLE) AS ssb,
             |    CAST(gxx AS DOUBLE) - bsum AS ssw,
             |    CAST(k AS DOUBLE) AS kd, CAST(nn AS DOUBLE) AS nd,
             |    (CAST(nn AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(nn AS DOUBLE))
             |      / (CAST(k AS DOUBLE) - 1.0) AS n0
             |  FROM tot CROSS JOIN bs),
             |mine AS (SELECT k, n, ssb, ssw,
             |    ssb / (kd - 1.0) AS msb, ssw / (nd - kd) AS msw, n0,
             |    (ssb / (kd - 1.0) - ssw / (nd - kd))
             |      / (ssb / (kd - 1.0) + (n0 - 1.0) * (ssw / (nd - kd))) AS icc
             |  FROM calc),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 1
             |    AND NOT EXISTS (SELECT 1 FROM emitted e, mine x
             |      WHERE e.k <> x.k OR e.n <> x.n
             |         OR abs(e.ssb - x.ssb) > 1e-9 * greatest(1.0, abs(x.ssb))
             |         OR abs(e.ssw - x.ssw) > 1e-9 * greatest(1.0, abs(x.ssw))
             |         OR abs(e.msb - x.msb) > 1e-9 * greatest(1.0, abs(x.msb))
             |         OR abs(e.msw - x.msw) > 1e-9 * greatest(1.0, abs(x.msw))
             |         OR abs(e.n0 - x.n0) > 1e-9 * greatest(1.0, abs(x.n0))
             |         OR abs(e.icc - x.icc) > 1e-9 * greatest(1.0, abs(x.icc)))
             |  ) AS ok)
             |SELECT k, n, ssb, ssw, msb, msw, n0, icc FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q350: SCHUSTER PERIODOGRAM — spectral power of each event
    // type's daily count series at candidate cycle lengths
    // {2,3,5,7,10,14} ([[graft.operators.TimeSeries.periodogram]]);
    // the seasonality detector feeding q336's season length. n is
    // exact; C/S/power route through cos/sin (libm), so the oracle
    // replays counts exactly and floats to 1e-9 (certificate).
    Q(
      "q350_periodogram",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.periodogram(
          Tables.events(s, d)
            .filter($"event_type".isNotNull && $"ts".isNotNull),
          $"event_type", $"ts", lit(1.0), periods = Seq(2, 3, 5, 7, 10, 14))
          .orderBy($"key", $"period")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q350_periodogram/*.parquet')),
             |obs AS (SELECT event_type AS k, epoch_us(ts) // 86400000000 AS t,
             |    count(*) AS y
             |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |spans AS (SELECT k, min(t) AS p0, max(t) AS p1 FROM obs GROUP BY 1),
             |grid AS (SELECT k, unnest(range(p0, p1 + 1)) AS t FROM spans),
             |dense AS MATERIALIZED (SELECT g.k, g.t,
             |    CAST(coalesce(o.y, 0) AS DOUBLE) AS y
             |  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.t = o.t),
             |fan AS (SELECT k, t, y, unnest([2, 3, 5, 7, 10, 14]) AS p FROM dense),
             |folded AS (SELECT k, p,
             |    sum(y * cos(2.0 * pi() * CAST(t % p AS DOUBLE) / CAST(p AS DOUBLE)))
             |      OVER w AS cc,
             |    sum(y * sin(2.0 * pi() * CAST(t % p AS DOUBLE) / CAST(p AS DOUBLE)))
             |      OVER w AS ss,
             |    count(*) OVER (PARTITION BY k, p) AS n,
             |    row_number() OVER (PARTITION BY k, p ORDER BY t DESC) AS rn
             |  FROM fan
             |  WINDOW w AS (PARTITION BY k, p ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |mine AS (SELECT k AS key, CAST(p AS BIGINT) AS period,
             |    CAST(n AS BIGINT) AS n, cc, ss,
             |    (cc * cc + ss * ss) / CAST(n AS DOUBLE) AS power
             |  FROM folded WHERE rn = 1),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM mine)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      JOIN mine x ON e.key = x.key AND e.period = x.period
             |      WHERE e.n <> x.n OR abs(e.c_sum - x.cc) > 1e-9
             |         OR abs(e.s_sum - x.ss) > 1e-9
             |         OR abs(e.power - x.power) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e WHERE NOT EXISTS
             |      (SELECT 1 FROM mine x WHERE x.key = e.key AND x.period = e.period))
             |  ) AS ok)
             |SELECT key, period, n, c_sum, s_sum, power FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'gate-failed', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY key, period""".stripMargin)))

  val all5: Seq[Q] = Seq(

    // ---- q351: RESTRICTED MEAN SURVIVAL TIME — expected active
    // hours within the first 700 (the horizon that actually covers
    // this fixture's churn cluster at 632–695 h — a 240 h horizon
    // integrates a flat S ≡ 1) under the q333 lifetime model
    // ([[graft.operators.Survival.restrictedMeanSurvival]]); the
    // hazard-ratio-free effect summary. Counts exact; the integral
    // rides the exp∘Σ∘ln curve — certificate at 1e-9.
    Q(
      "q351_rmst",
      (s, d) => {
        import s.implicits._
        graft.operators.Survival.restrictedMeanSurvival(
          survivalSubjects(s, d), $"dur", $"churned", tau = 700L)
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q351_rmst/*.parquet')),
              |$sqlSubjects,
              |byt AS (SELECT dur AS t,
              |    sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_death,
              |    sum(CASE WHEN churned THEN 0 ELSE 1 END) AS n_censored
              |  FROM subj GROUP BY 1),
              |curve AS (SELECT t, n_death, n_censored,
              |    (SELECT count(*) FROM subj)
              |      - coalesce(sum(n_death + n_censored) OVER (ORDER BY t
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
              |  FROM byt),
              |surv AS (SELECT t, n_death,
              |    CASE WHEN max(CASE WHEN n_death > 0 AND n_death = n_risk THEN 1 ELSE 0 END)
              |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
              |      THEN 0.0
              |      ELSE exp(sum(CASE WHEN n_death > 0
              |          THEN ln(1.0 - CAST(n_death AS DOUBLE) / CAST(n_risk AS DOUBLE))
              |          ELSE 0.0 END)
              |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |    END AS survival
              |  FROM curve),
              |lagged AS (SELECT t, n_death, survival,
              |    coalesce(lag(t) OVER (ORDER BY t), 0) AS prev_t,
              |    coalesce(lag(survival) OVER (ORDER BY t), 1.0) AS prev_s
              |  FROM surv),
              |seg AS (SELECT * FROM lagged WHERE prev_t < 700),
              |lastrow AS (SELECT t, survival FROM seg ORDER BY t DESC LIMIT 1),
              |mine AS (SELECT CAST(700 AS BIGINT) AS tau,
              |    (SELECT count(*) FROM subj) AS n,
              |    (SELECT coalesce(sum(n_death), 0) FROM surv WHERE t <= 700)
              |      AS n_events_le_tau,
              |    (SELECT sum(prev_s * CAST(least(t, 700) - prev_t AS DOUBLE)) FROM seg)
              |      + (SELECT CASE WHEN t < 700
              |          THEN survival * CAST(700 - t AS DOUBLE) ELSE 0.0 END
              |         FROM lastrow) AS rmst),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = 1
              |    AND NOT EXISTS (SELECT 1 FROM emitted e, mine x
              |      WHERE e.tau <> x.tau OR e.n <> x.n
              |         OR e.n_events_le_tau <> x.n_events_le_tau
              |         OR abs(e.rmst - x.rmst) > 1e-9)
              |  ) AS ok)
              |SELECT CAST(tau AS BIGINT) AS tau, CAST(n AS BIGINT) AS n,
              |  CAST(n_events_le_tau AS BIGINT) AS n_events_le_tau, rmst
              |FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
              |  CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q352: CROSS-CORRELATION FUNCTION — do daily views lead
    // daily purchases, and by how many days?
    // ([[graft.operators.TimeSeries.crossCorrelation]]). Six exact
    // integer sufficient statistics per lag; every r is a pinned
    // chain — hash-exact.
    Q(
      "q352_cross_correlation",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.crossCorrelation(
          Tables.events(s, d)
            .filter($"event_type".isNotNull && $"ts".isNotNull),
          $"event_type", $"ts", lit(1.0),
          keyX = "view", keyY = "purchase", maxLag = 7)
          .orderBy($"lag")
      },
      Some("""WITH obs AS (SELECT event_type AS k,
             |    epoch_us(ts) // 86400000000 AS t, count(*) AS y
             |  FROM events WHERE event_type IN ('view', 'purchase')
             |    AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |spans AS (SELECT k, min(t) AS p0, max(t) AS p1 FROM obs GROUP BY 1),
             |grid AS (SELECT k, unnest(range(p0, p1 + 1)) AS t FROM spans),
             |dense AS MATERIALIZED (SELECT g.k, g.t,
             |    CAST(coalesce(o.y, 0) AS BIGINT) AS y
             |  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.t = o.t),
             |zipped AS MATERIALIZED (SELECT a.t, a.y AS x, b.y AS yv
             |  FROM dense a JOIN dense b ON a.t = b.t
             |  WHERE a.k = 'view' AND b.k = 'purchase'),
             |lags AS (SELECT unnest(range(-7, 8)) AS lag),
             |shifted AS (SELECT l.lag, z.t, z.x,
             |    (SELECT yv FROM zipped z2 WHERE z2.t = z.t + l.lag) AS yl
             |  FROM zipped z CROSS JOIN lags l),
             |st AS (SELECT lag,
             |    count(*) FILTER (WHERE yl IS NOT NULL) AS n,
             |    sum(x) FILTER (WHERE yl IS NOT NULL) AS sx,
             |    sum(yl) AS sy,
             |    sum(x * yl) AS sxy,
             |    sum(x * x) FILTER (WHERE yl IS NOT NULL) AS sxx,
             |    sum(yl * yl) AS syy
             |  FROM shifted GROUP BY 1)
             |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 1
             |      AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
             |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
             |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             |  END AS r
             |FROM st ORDER BY lag""".stripMargin)),

    // ---- q353: BARTLETT'S VARIANCE-HOMOGENEITY TEST — are customer
    // balance variances equal across nations?
    // ([[graft.operators.Experiment.bartlettTest]], the ln-based
    // sibling of Brown–Forsythe). Counts exact; the pooled variance
    // and T carry ln and a 25-term fold, so the oracle recomputes
    // independently and gates at 1e-9 relative (certificate).
    Q(
      "q353_bartlett",
      (s, d) => {
        import s.implicits._
        graft.operators.Experiment.bartlettTest(
          Tables.customer(s, d)
            .select($"c_nationkey",
              round($"c_acctbal" * 100).cast("long").as("cents")),
          $"c_nationkey", $"cents")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q353_bartlett/*.parquet')),
             |per AS (SELECT c_nationkey AS g, count(*) AS ng,
             |    sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sx,
             |    sum(CAST(round(c_acctbal * 100) AS BIGINT)
             |      * CAST(round(c_acctbal * 100) AS BIGINT)) AS sxx
             |  FROM customer GROUP BY 1),
             |vars AS (SELECT g, ng,
             |    (CAST(ng AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      / (CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1.0)) AS v
             |  FROM per),
             |tot AS (SELECT count(*) AS k, sum(ng) AS nn,
             |    sum((ng - 1) * v) AS ssw,
             |    sum((ng - 1) * ln(v)) AS lnsum,
             |    sum(1.0 / (CAST(ng AS DOUBLE) - 1.0)) AS inv
             |  FROM vars),
             |mine AS (SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
             |    ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)) AS pooled_var,
             |    ((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
             |        * ln(ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))) - lnsum)
             |      / (1.0 + (inv - 1.0 / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
             |        / (3.0 * (CAST(k AS DOUBLE) - 1.0))) AS t_stat
             |  FROM tot),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 1
             |    AND NOT EXISTS (SELECT 1 FROM emitted e, mine x
             |      WHERE e.k <> x.k OR e.n <> x.n
             |         OR abs(e.pooled_var - x.pooled_var)
             |           > 1e-9 * greatest(1.0, abs(x.pooled_var))
             |         OR abs(e.t_stat - x.t_stat)
             |           > 1e-9 * greatest(1.0, abs(x.t_stat)))
             |  ) AS ok)
             |SELECT k, n, pooled_var, t_stat FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)))

  val all6: Seq[Q] = Seq(

    // ---- q354: TUKEY HSD PAIRWISE CONTRASTS — which nation pairs
    // differ in mean customer balance (whole dollars — the grain
    // whose square-sums stay inside 2^53 at replica scales), after
    // the ANOVA ([[graft.operators.Experiment.tukeyHsd]]). The k²
    // expansion self-joins the 25-row GROUP table, never rows. MSW
    // rides the guarded pinned fold, so the oracle recomputes
    // independently and gates floats at 1e-9 relative (certificate);
    // counts exact.
    Q(
      "q354_tukey_hsd",
      (s, d) => {
        import s.implicits._
        graft.operators.Experiment.tukeyHsd(
          Tables.customer(s, d)
            .select($"c_nationkey",
              round($"c_acctbal").cast("long").as("dollars")),
          $"c_nationkey", $"dollars")
          .orderBy($"group_a", $"group_b")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q354_tukey_hsd/*.parquet')),
             |per AS (SELECT CAST(c_nationkey AS VARCHAR) AS g, count(*) AS ng,
             |    sum(CAST(round(c_acctbal) AS BIGINT)) AS sx,
             |    sum(CAST(round(c_acctbal) AS BIGINT)
             |      * CAST(round(c_acctbal) AS BIGINT)) AS sxx
             |  FROM customer GROUP BY 1),
             |tot AS (SELECT count(*) AS k, sum(ng) AS nn FROM per),
             |mswt AS (SELECT sum((CAST(ng AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      / CAST(ng AS DOUBLE)) AS ssw FROM per),
             |msw AS (SELECT ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)) AS msw
             |  FROM mswt CROSS JOIN tot),
             |mine AS (SELECT a.g AS group_a, b.g AS group_b,
             |    CAST(a.ng AS BIGINT) AS n_a, CAST(b.ng AS BIGINT) AS n_b,
             |    CAST(a.sx AS DOUBLE) / CAST(a.ng AS DOUBLE) AS mean_a,
             |    CAST(b.sx AS DOUBLE) / CAST(b.ng AS DOUBLE) AS mean_b,
             |    CAST(a.sx AS DOUBLE) / CAST(a.ng AS DOUBLE)
             |      - CAST(b.sx AS DOUBLE) / CAST(b.ng AS DOUBLE) AS diff,
             |    abs(CAST(a.sx AS DOUBLE) / CAST(a.ng AS DOUBLE)
             |      - CAST(b.sx AS DOUBLE) / CAST(b.ng AS DOUBLE))
             |      / sqrt(msw / 2.0 * (1.0 / CAST(a.ng AS DOUBLE)
             |        + 1.0 / CAST(b.ng AS DOUBLE))) AS q_stat
             |  FROM per a JOIN per b ON a.g < b.g CROSS JOIN msw),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM mine)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      JOIN mine x ON e.group_a = x.group_a AND e.group_b = x.group_b
             |      WHERE e.n_a <> x.n_a OR e.n_b <> x.n_b
             |         OR abs(e.mean_a - x.mean_a) > 1e-9 * greatest(1.0, abs(x.mean_a))
             |         OR abs(e.mean_b - x.mean_b) > 1e-9 * greatest(1.0, abs(x.mean_b))
             |         OR abs(e.diff - x.diff) > 1e-9 * greatest(1.0, abs(x.diff))
             |         OR abs(e.q_stat - x.q_stat) > 1e-9 * greatest(1.0, abs(x.q_stat)))
             |    AND NOT EXISTS (SELECT 1 FROM emitted e WHERE NOT EXISTS
             |      (SELECT 1 FROM mine x WHERE x.group_a = e.group_a
             |        AND x.group_b = e.group_b))
             |  ) AS ok)
             |SELECT group_a, group_b, n_a, n_b, mean_a, mean_b, diff, q_stat
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'gate-failed', '', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY group_a, group_b""".stripMargin)))

  val all7: Seq[Q] = Seq(

    // ---- q355: HOLM–BONFERRONI FWER CONTROL — the step-down
    // family-wise sibling of q335, on the same portable synthetic
    // p-grid ([[graft.operators.Experiment.holmBonferroni]]): the
    // planted purchase block must clear the harsher correction, and
    // the step-down STOPS at the first null that fails. Hash-exact.
    Q(
      "q355_holm_bonferroni",
      (s, d) => {
        import s.implicits._
        val tests = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"event_type".isNotNull)
          .select(concat($"event_type", lit(":"),
            pmod($"user_id", lit(50L)).cast("string")).as("test_id"))
          .distinct()
          .select($"test_id",
            (conv(substring(md5($"test_id".cast("binary")), 1, 8), 16, 10)
              .cast("long").cast("double") / lit(4294967296.0) /
              when($"test_id".startsWith("purchase"), lit(1000000.0))
                .otherwise(lit(1.0))).as("p"))
        graft.operators.Experiment.holmBonferroni(
          tests, $"test_id", $"p", alphaNum = 1L, alphaDen = 10L)
          .orderBy($"rank")
      },
      Some("""WITH tests AS (SELECT DISTINCT
             |    event_type || ':' || CAST(user_id % 50 AS VARCHAR) AS test_id
             |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
             |ps AS (SELECT test_id,
             |    CAST(('0x' || substring(md5(test_id), 1, 8)) AS BIGINT)::DOUBLE
             |      / 4294967296.0
             |      / (CASE WHEN test_id LIKE 'purchase%' THEN 1000000.0 ELSE 1.0 END) AS p
             |  FROM tests),
             |ranked AS (SELECT test_id, p,
             |    CAST(row_number() OVER (ORDER BY p ASC, test_id ASC) AS BIGINT) AS rank,
             |    (SELECT count(*) FROM ps) AS m
             |  FROM ps),
             |flagged AS (SELECT *,
             |    p * CAST(m - rank + 1 AS DOUBLE) * 10.0 <= 1.0 AS flag
             |  FROM ranked),
             |ff AS (SELECT min(CASE WHEN NOT flag THEN rank END) AS ff FROM flagged)
             |SELECT test_id, p, rank,
             |  (ff IS NULL OR rank < ff) AS rejected
             |FROM flagged CROSS JOIN ff
             |ORDER BY rank""".stripMargin)),

    // ---- q356: MANTEL–HAENSZEL STRATIFIED ODDS RATIO + CMH χ² — is
    // the BUILDING segment associated with above-median balances,
    // adjusted for nation? ([[graft.operators.Experiment
    // .mantelHaenszel]]). Cells are exact integers; the stratum folds
    // carry per-stratum divisions, so the oracle recomputes with
    // plain aggregates and gates at 1e-9 relative (certificate).
    Q(
      "q356_mantel_haenszel",
      (s, d) => {
        import s.implicits._
        graft.operators.Experiment.mantelHaenszel(
          Tables.customer(s, d)
            .select($"c_nationkey",
              ($"c_mktsegment" === "BUILDING").as("e"),
              ($"c_acctbal" > 5000.0).as("o")),
          $"c_nationkey", $"e", $"o")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q356_mantel_haenszel/*.parquet')),
             |cells AS (SELECT c_nationkey AS s,
             |    sum(CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal > 5000.0
             |      THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN c_mktsegment = 'BUILDING' AND NOT c_acctbal > 5000.0
             |      THEN 1 ELSE 0 END) AS b,
             |    sum(CASE WHEN c_mktsegment <> 'BUILDING' AND c_acctbal > 5000.0
             |      THEN 1 ELSE 0 END) AS c,
             |    sum(CASE WHEN c_mktsegment <> 'BUILDING' AND NOT c_acctbal > 5000.0
             |      THEN 1 ELSE 0 END) AS d
             |  FROM customer GROUP BY 1),
             |terms AS (SELECT a, b, c, d,
             |    CAST(a + b + c + d AS DOUBLE) AS n FROM cells),
             |tot AS (SELECT count(*) AS k, sum(a + b + c + d) AS nn, sum(a) AS sa,
             |    sum(CASE WHEN n > 0 THEN a * d / n ELSE 0 END) AS ad,
             |    sum(CASE WHEN n > 0 THEN b * c / n ELSE 0 END) AS bc,
             |    sum(CASE WHEN n > 0 THEN (a + b) * (a + c) / n ELSE 0 END) AS ea,
             |    sum(CASE WHEN n > 1 THEN (a + b) * (c + d) * (a + c) * (b + d)
             |      / (n * n * (n - 1.0)) ELSE 0 END) AS va
             |  FROM terms),
             |mine AS (SELECT CAST(k AS BIGINT) AS k_strata, CAST(nn AS BIGINT) AS n,
             |    CAST(sa AS BIGINT) AS sum_a,
             |    CASE WHEN bc > 0 THEN ad / bc END AS or_mh,
             |    CASE WHEN va > 0 THEN (CAST(sa AS DOUBLE) - ea)
             |      * (CAST(sa AS DOUBLE) - ea) / va END AS chi2_cmh
             |  FROM tot),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 1
             |    AND NOT EXISTS (SELECT 1 FROM emitted e, mine x
             |      WHERE e.k_strata <> x.k_strata OR e.n <> x.n
             |         OR e.sum_a <> x.sum_a
             |         OR abs(e.or_mh - x.or_mh) > 1e-9 * greatest(1.0, abs(x.or_mh))
             |         OR abs(e.chi2_cmh - x.chi2_cmh)
             |           > 1e-9 * greatest(1.0, abs(x.chi2_cmh)))
             |  ) AS ok)
             |SELECT k_strata, n, sum_a, or_mh, chi2_cmh FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)))

  /** q345 drive: the q306 out-of-order scaffold (three scrambled
    * slices with hash-chosen one-batch-late bands + flush sentinel,
    * `maxFilesPerTrigger = 1`) through [[graft.streaming.Cusum]] at
    * allowance 55.00, threshold 500.00; requires ≥ 4 data
    * micro-batches and scalar-only state (buffers drained) at end of
    * stream.
    */
  private def streamingCusum(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q345_cusum_ooo")
    try {
      val ev = Tables.events(s, d)
        .filter($"event_type".isNotNull && $"ts".isNotNull &&
          $"value".isNotNull && $"event_id".isNotNull)
        .select($"event_type".as("key"), $"ts", $"event_id",
          round($"value" * 100).cast("long").as("value_cents"))
      val nKeys = ev.select($"key").distinct().count()
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val b1 = lit("2024-01-10").cast("timestamp")
      val b2 = lit("2024-01-20").cast("timestamp")
      val lateMark = pmod(graft.operators.KmvSketch.hash60($"event_id"), lit(2L)) === 0
      val late1 = $"ts" >= b1 && $"ts" < c1 && lateMark
      val late2 = $"ts" >= b2 && $"ts" < c2 && lateMark
      val sentinel = s.range(1).select(
        lit("__flush__").as("key"),
        lit("2099-01-01").cast("timestamp").as("ts"),
        lit(-1L).as("event_id"),
        lit(0L).as("value_cents"))
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1 && !late1), "00_a"),
        (ev.filter(($"ts" >= c1 && $"ts" < c2 && !late2) || late1), "01_b"),
        (ev.filter($"ts" >= c2 || late2), "02_c"),
        (sentinel, "03_flush")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q345_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.Cusum.detectEventTime(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.streaming.Cusum.CuEv],
        allowance = 5500L, threshold = 50000L, delay = "2 days")
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q345 stream did not terminate within 600s — refusing a partial alert set")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 4,
          s"q345 ran $dataBatches data micro-batch(es); the out-of-order point " +
            "needs all 3 scrambled slices + the flush sentinel as separate batches")
        val stateRows = q.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        require(stateRows.contains(nKeys + 1L),
          s"q345 expected one scalar state row per key (${nKeys + 1}), got $stateRows")
        s.table(name)
          .filter($"key" =!= "__flush__")
          .select($"key", $"alert_us", $"event_id", $"cusum_cents")
          .orderBy($"key", $"alert_us", $"event_id")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Importance, KmvSketch, Similarity, Sketches, Skyline, TextAnalysis}

/** Round-6 continuation (q126–q131): KMV set-operation sketches (the
  * intersection estimates HLL cannot produce), rolling time-range
  * window aggregates, the all-corpus KNN graph, DSIR importance
  * weighting (Xie et al. 2023), the 2-d Pareto-frontier skyline, and
  * the multi-dimension star-schema flagship join.
  */
object ScaleOps3 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  // DuckDB token expression mirroring TextAnalysis.tokens on this
  // (ASCII) corpus — same as LlmOps.sqlToks / ScaleOps2.sqlToks.
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  private val KmvK = 32

  val all: Seq[Q] = Seq(

    // ---- q126: KMV k-minimum-values sketches — mergeable
    // distinct-count states WITH set algebra: the per-(type, period)
    // states estimate period cardinalities, the period states merge
    // into the union sketch WITHOUT touching raw data again, and the
    // k-min-union overlap estimates Jaccard / intersection size — the
    // set operation q70's HLL states fundamentally cannot answer.
    // Everything derives from the portable 60-bit md5 hash, so the
    // oracle replays sketches, estimates, and overlaps EXACTLY (the
    // q77 deterministic-replay-of-a-probabilistic-structure pattern);
    // the merged union sketch equals the sketch of the raw union by
    // associativity (spec-proved), which is what the oracle recomputes.
    Q(
      "q126_kmv_distinct_sketch",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"event_type".isNotNull)
          .withColumn("period",
            when($"ts" < lit("2024-01-16").cast("timestamp"), 0).otherwise(1))
        // states materialize once (KB per group); the three consumers
        // below must not re-scan raw events per branch
        val sk = KmvSketch.sketch(ev, Seq("event_type", "period"), $"user_id", KmvK)
          .localCheckpoint()
        val un = KmvSketch.mergeStates(sk, Seq("event_type"), $"kmv", KmvK)
          .withColumnRenamed("kmv", "kmvu")
        val s0 = sk.filter($"period" === 0).select($"event_type", $"kmv".as("kmv0"))
        val s1 = sk.filter($"period" === 1).select($"event_type", $"kmv".as("kmv1"))
        s0.join(s1, "event_type").join(un, "event_type")
          .select(
            $"event_type",
            size($"kmv0").as("state0"), size($"kmv1").as("state1"),
            KmvSketch.estimate($"kmv0", KmvK).as("est_p0"),
            KmvSketch.estimate($"kmv1", KmvK).as("est_p1"),
            KmvSketch.estimate($"kmvu", KmvK).as("est_union"),
            KmvSketch.jaccardEstimate($"kmv0", $"kmv1", KmvK).as("jaccard_est"))
          .withColumn("est_intersection", $"jaccard_est" * $"est_union")
          .orderBy($"event_type")
      },
      Some {
        val h60 = KmvSketch.hash60Sql("user_id")
        def est(hs: String) = KmvSketch.estimateSql(hs, KmvK)
        s"""WITH h AS (SELECT DISTINCT event_type,
           |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS period,
           |    $h60 AS h
           |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
           |r AS (SELECT event_type, period, h,
           |    row_number() OVER (PARTITION BY event_type, period ORDER BY h) AS rn FROM h),
           |sk AS (SELECT event_type, period, list(h ORDER BY h) AS hs
           |  FROM r WHERE rn <= $KmvK GROUP BY 1, 2),
           |hu AS (SELECT DISTINCT event_type, h FROM h),
           |ru AS (SELECT event_type, h,
           |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hu),
           |sku AS (SELECT event_type, list(h ORDER BY h) AS hs
           |  FROM ru WHERE rn <= $KmvK GROUP BY 1),
           |j AS (SELECT a.event_type, a.hs AS h0, b.hs AS h1, u.hs AS hsu
           |  FROM (SELECT * FROM sk WHERE period = 0) a
           |  JOIN (SELECT * FROM sk WHERE period = 1) b USING (event_type)
           |  JOIN sku u USING (event_type)),
           |m AS (SELECT event_type, h0, h1, hsu,
           |    list_sort(list_distinct(list_concat(h0, h1)))[1:$KmvK] AS s FROM j),
           |f AS (SELECT event_type,
           |    CAST(len(h0) AS INT) AS state0, CAST(len(h1) AS INT) AS state1,
           |    ${est("h0")} AS est_p0, ${est("h1")} AS est_p1, ${est("hsu")} AS est_union,
           |    CAST(len(list_filter(s, x -> list_contains(h0, x) AND list_contains(h1, x))) AS DOUBLE)
           |      / CAST(len(s) AS DOUBLE) AS jaccard_est
           |  FROM m)
           |SELECT *, jaccard_est * est_union AS est_intersection
           |FROM f ORDER BY event_type""".stripMargin
      }),

    // ---- q127: ROLLING time-range window aggregation — each user's
    // trailing-7-day purchase value/count at day grain, the
    // `rangeBetween` frame q78's fixed sliding windows don't cover
    // (frames follow each row's own offset, and GAPS in activity
    // genuinely shrink the frame — a rows-frame would be wrong).
    // Scale shape: events collapse map-side to (user, day) partials
    // BEFORE any window (the q106 geometry), so the per-user window
    // sorts day rows bounded by the span, never raw events. Decimal
    // sums exact; day ids are the proven floor(double-division) µs
    // arithmetic.
    Q(
      "q127_rolling_range_window",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull)
          .groupBy(
            $"user_id",
            floor(unix_micros($"ts").cast("double") / 86400000000.0).cast("long").as("day_id"))
          .agg(
            sum($"value".cast("decimal(18,6)")).as("dv"),
            count(lit(1)).as("n_events"))
        val w = Window.partitionBy("user_id").orderBy("day_id").rangeBetween(-6, 0)
        daily.select(
          $"user_id", $"day_id",
          $"dv".cast("double").as("day_value"),
          sum($"dv").over(w).cast("double").as("roll7_value"),
          sum($"n_events").over(w).as("roll7_events"),
          count(lit(1)).over(w).cast("int").as("n_active_days7"))
          .orderBy($"user_id", $"day_id")
      },
      Some("""WITH daily AS (SELECT user_id,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS day_id,
             |    sum(CAST(value AS DECIMAL(18,6))) AS dv, count(*) AS n_events
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2)
             |SELECT user_id, day_id,
             |  CAST(dv AS DOUBLE) AS day_value,
             |  CAST(sum(dv) OVER w AS DOUBLE) AS roll7_value,
             |  CAST(sum(n_events) OVER w AS BIGINT) AS roll7_events,
             |  CAST(count(*) OVER w AS INT) AS n_active_days7
             |FROM daily
             |WINDOW w AS (PARTITION BY user_id ORDER BY day_id
             |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, day_id""".stripMargin)),

    // ---- q128: all-corpus KNN GRAPH — every vector's approximate
    // 5 nearest neighbors via the multi-table hyperplane LSH self-join
    // (Similarity.knnGraph): the adjacency structure semantic
    // clustering and graph dedup start from. Soundness+recall oracle
    // (the q30/q38 pattern): every emitted edge must carry the TRUE
    // cosine (DuckDB recomputes bit-for-bit), ranks recompute from the
    // emitted set, no source over-emits past k, and the emitted edges
    // must recall ≥ 0.8 of the exact all-pairs 5-NN graph.
    Q(
      "q128_knn_graph",
      (s, d) => {
        import s.implicits._
        Similarity.knnGraph(
          Tables.embeddings(s, d), $"embedding", $"vec_id", k = 5, bits = 4, tables = 32)
          .select(
            $"query_id".as("src_id"), $"rank", $"corpus_id".as("dst_id"), $"cosine")
          .orderBy($"src_id", $"rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |scored AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             |    list_dot_product(a.v, b.v)
             |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
             |  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
             |exact_topk AS (SELECT src_id, dst_id FROM (
             |    SELECT src_id, dst_id,
             |      row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, dst_id) AS rank
             |    FROM scored) WHERE rank <= 5),
             |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q128_knn_graph/*.parquet')),
             |joined AS (SELECT m.src_id, m.dst_id, s.cosine
             |  FROM emitted m JOIN scored s ON m.src_id = s.src_id AND m.dst_id = s.dst_id
             |    AND abs(m.cosine - s.cosine) < 1e-9),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted m
             |       JOIN exact_topk t ON m.src_id = t.src_id AND m.dst_id = t.dst_id)
             |      >= 0.8 * (SELECT count(*) FROM exact_topk)
             |    AND (SELECT coalesce(max(c), 0) FROM
             |           (SELECT count(*) AS c FROM emitted GROUP BY src_id)) <= 5
             |  ) AS ok)
             |SELECT src_id,
             |  CAST(row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, dst_id) AS INT) AS rank,
             |  dst_id, cosine
             |FROM joined
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS INT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY src_id, rank""".stripMargin)),

    // ---- q129: DSIR importance weighting (Xie et al., NeurIPS 2023)
    // — every document scored by ln p̂_tgt/p̂_raw of its hashed
    // unigram+bigram features, target = the English slice: the
    // importance-resampling data selector. Counts and buckets are
    // exact (portable md5); only ln() is engine-local, so the oracle
    // recomputes every weight from scratch and admits rows within
    // 1e-9 (the q57/q61 tolerance-with-poison pattern), with n_feats
    // and membership exact both ways.
    Q(
      "q129_dsir_importance",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select($"doc_id", $"lang",
            coalesce(TextAnalysis.tokens($"text"), array()).as("toks"))
        Importance.dsirLogWeights(
          docs, docs.filter($"lang" === "en"), $"doc_id", $"toks", buckets = 256)
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
              |feats AS (SELECT doc_id, lang,
              |    list_concat(toks, CASE WHEN len(toks) >= 2
              |      THEN list_transform(generate_series(1, len(toks) - 1),
              |             i -> toks[i] || '_' || toks[i + 1])
              |      ELSE [] END) AS fs
              |  FROM t),
              |bx AS (SELECT doc_id, lang,
              |    CAST(('0x' || substring(md5(unnest(fs)), 1, 8)) AS BIGINT) % 256 AS b
              |  FROM feats),
              |tcnt AS (SELECT b, count(*) AS c FROM bx WHERE lang = 'en' GROUP BY b),
              |rcnt AS (SELECT b, count(*) AS c FROM bx GROUP BY b),
              |tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tcnt) AS tt,
              |               (SELECT coalesce(sum(c), 0) FROM rcnt) AS rt),
              |ratio AS (SELECT r.b AS b,
              |    ln((coalesce(t.c, 0) + 1.0) / (tot.tt + 256.0))
              |      - ln((r.c + 1.0) / (tot.rt + 256.0)) AS lr
              |  FROM rcnt r LEFT JOIN tcnt t USING (b) CROSS JOIN tot),
              |sc AS (SELECT bx.doc_id, count(*) AS n_feats, sum(ratio.lr) AS lw
              |  FROM bx JOIN ratio USING (b) GROUP BY bx.doc_id),
              |expected AS (SELECT t.doc_id,
              |    coalesce(sc.n_feats, 0) AS n_feats, coalesce(sc.lw, 0.0) AS lw
              |  FROM t LEFT JOIN sc USING (doc_id)),
              |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q129_dsir_importance/*.parquet')),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expected)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e
              |      WHERE e.doc_id NOT IN (SELECT doc_id FROM expected))
              |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expected x USING (doc_id)
              |      WHERE e.n_feats <> x.n_feats OR abs(e.log_weight - x.lw) > 1e-9)
              |  ) AS ok)
              |SELECT doc_id, n_feats, log_weight FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
              |  WHERE NOT (SELECT ok FROM flag)
              |ORDER BY doc_id""".stripMargin)),

    // ---- q130: 2-d PARETO FRONTIER (skyline) — the documents no
    // other doc beats on both (distinct-token diversity ↑, byte cost
    // ↓): curation's "cheapest doc at every achievable quality level".
    // Integer dimensions end to end, so the brute-force NOT EXISTS
    // oracle hash-matches exactly; the two-phase bucket plan (q48/q73
    // geometry) is what makes the same answer computable at corpus
    // scale — the oracle's O(n²) formulation is precisely what the
    // operator avoids.
    Q(
      "q130_pareto_frontier",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d).select(
          $"doc_id",
          size(array_distinct(coalesce(TextAnalysis.tokens($"text"), array())))
            .cast("long").as("x"),
          coalesce(length($"text"), lit(0)).cast("long").as("y"))
        Skyline.paretoFrontier2d(base, $"doc_id", $"x", $"y", buckets = 16)
          .select($"id".as("doc_id"), $"x".as("n_distinct_tokens"), $"y".as("n_chars"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |    CAST(len(list_distinct($sqlToks)) AS BIGINT) AS x,
              |    CAST(coalesce(length(text), 0) AS BIGINT) AS y
              |  FROM documents)
              |SELECT doc_id, x AS n_distinct_tokens, y AS n_chars FROM t a
              |WHERE NOT EXISTS (SELECT 1 FROM t b
              |  WHERE (b.x > a.x AND b.y <= a.y) OR (b.x >= a.x AND b.y < a.y))
              |ORDER BY doc_id""".stripMargin)),

    // ---- q131: STAR-SCHEMA flagship join (the TPC-H Q5 shape) — six
    // tables, the canonical BI plan: lineitem ⋈ orders ⋈ customer ⋈
    // supplier ⋈ nation ⋈ region with a local-supplier condition
    // (c_nationkey = s_nationkey), a region filter that prunes through
    // two dimension hops, and a one-year date slice. The dimensions
    // broadcast (AQE; region/nation/supplier are KB-scale at any SF),
    // so the only shuffles are the two fact-side equi-joins — the plan
    // Catalyst's join reordering + broadcast thresholds exist for.
    Q(
      "q131_star_schema_revenue",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        val c = Tables.customer(s, d)
        val su = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d).filter($"r_name" === "ASIA")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(su, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(n, $"s_nationkey" === $"n_nationkey")
          .join(r, $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
              .cast("decimal(18,4)").cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin),
      bench = true),

    // ---- q132: STREAMING LEFT-OUTER interval join under the gate —
    // the outer-emission semantics q92's inner join can't show: an
    // error event with no click within ±1 hour emits a NULL-click row
    // ONCE, when the watermark proves no in-interval click can still
    // arrive. Errors too close to end-of-stream (ts + 1h ≥ final
    // watermark) are withheld forever — exactly the live-stream
    // contract — so the oracle re-derives the final watermark (min of
    // both inputs' max ts − 2h) and demands the same withheld set.
    Q(
      "q132_streaming_outer_interval_join",
      (s, d) => streamingOuterIntervalJoin(s, d, "leftOuter", "q132_ssoj"),
      Some("""WITH err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             |clk AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |-- Spark's event-time watermark is millisecond-floored:
             |-- W = min over inputs of floor(max ts in ms) - 2h
             |wm AS (SELECT least(
             |    (SELECT CAST(floor(CAST(max(epoch_us(ts)) AS DOUBLE) / 1000.0) AS BIGINT) FROM err),
             |    (SELECT CAST(floor(CAST(max(epoch_us(ts)) AS DOUBLE) / 1000.0) AS BIGINT) FROM clk)
             |  ) - 7200000 AS w_ms),
             |pairs AS (SELECT a.event_id AS error_event_id, b.event_id AS click_event_id
             |  FROM err a JOIN clk b ON a.user_id = b.user_id
             |   AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 3600000000
             |                          AND epoch_us(a.ts) + 3600000000),
             |unmatched AS (SELECT a.event_id AS error_event_id,
             |    CAST(NULL AS BIGINT) AS click_event_id
             |  FROM err a
             |  WHERE a.event_id NOT IN (SELECT error_event_id FROM pairs)
             |    -- outer row emits only once evictable: the row's last
             |    -- possible match time has passed the final watermark
             |    AND CAST(floor(CAST(epoch_us(a.ts) AS DOUBLE) / 1000.0) AS BIGINT) + 3600000
             |      < (SELECT w_ms FROM wm))
             |SELECT * FROM pairs
             |UNION ALL
             |SELECT * FROM unmatched
             |ORDER BY error_event_id, click_event_id""".stripMargin)),

    // ---- q133: reciprocal-rank FUSION over multi-query retrieval
    // (RAG-fusion shape): four query vectors each retrieve exact
    // top-50 neighbors, and RRF (Cormack et al. 2009) folds the four
    // rankings into one consensus top-20. Everything is EXACT across
    // engines — cosines are bit-equal (q29 precedent), so ranks are
    // bit-equal, and RRF scores fold exact divisions in pinned
    // ascending-rank order — a HASH-MATCH oracle on a ranking
    // ensemble.
    Q(
      "q133_rrf_fusion",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val ranked = Similarity.bruteForceTopK(
          emb, emb.filter($"vec_id" < 4),
          $"embedding", $"vec_id", $"embedding", $"vec_id", k = 50)
        graft.operators.Fusion.rrf(ranked, $"query_id", $"corpus_id", $"rank", kRrf = 60)
          .orderBy($"rrf_score".desc, $"item_id").limit(20)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
             |scored AS (SELECT query_id, e.vec_id AS corpus_id,
             |    list_dot_product(qv, v)
             |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
             |  FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
             |ranked AS (SELECT query_id, corpus_id, rank FROM (
             |    SELECT query_id, corpus_id,
             |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
             |    FROM scored) WHERE rank <= 50),
             |fused AS (SELECT corpus_id AS item_id, count(*) AS n_lists,
             |    list_sort(list(rank)) AS rs
             |  FROM ranked GROUP BY corpus_id),
             |sc AS (SELECT item_id, n_lists,
             |    list_reduce(list_transform(rs, r -> 1.0 / (60.0 + CAST(r AS DOUBLE))),
             |      (a, b) -> a + b) AS rrf_score
             |  FROM fused)
             |SELECT item_id, n_lists, rrf_score FROM sc
             |ORDER BY rrf_score DESC, item_id LIMIT 20""".stripMargin)),

    // ---- q134: deterministic POISSON-free bootstrap — per event
    // type, 32 half-sample replicates selected by a portable md5 coin
    // (hash(event_id, replicate) < 2^31), each replicate's mean from
    // exact decimal sums, and the 5th/28th order statistics of the 32
    // means as a [~10%, ~90%] confidence band. RNG-free and
    // append-stable like every sampler here (q47/q53/q60), and the
    // replicate blow-up feeds partial aggregation DIRECTLY — the
    // shuffle carries (type × replicate) partials, never the ×32
    // expanded rows.
    Q(
      "q134_bootstrap_ci",
      (s, d) => {
        import s.implicits._
        val reps = 32
        val ev = Tables.events(s, d)
          .filter($"event_id".isNotNull && $"value".isNotNull)
          .select($"event_id", $"event_type", $"value".cast("decimal(18,6)").as("v"))
          .select($"event_id", $"event_type", $"v",
            explode(sequence(lit(0), lit(reps - 1))).as("rep"))
          .filter(
            conv(substring(md5(concat_ws("_", $"event_id", $"rep")), 1, 8), 16, 10)
              .cast("long") < 2147483648L)
        val means = ev.groupBy($"event_type", $"rep")
          .agg((sum($"v").cast("double") / count(lit(1)).cast("double")).as("m"))
        means.groupBy($"event_type")
          .agg(sort_array(collect_list($"m")).as("ms"), count(lit(1)).as("n_reps"))
          .filter($"n_reps" === reps)
          .select(
            $"event_type", $"n_reps",
            element_at($"ms", 5).as("ci_lo"),
            element_at($"ms", 28).as("ci_hi"))
          .orderBy($"event_type")
      },
      Some("""WITH ex AS (SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS v, r.rep
             |  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS rep) r
             |  WHERE event_id IS NOT NULL AND value IS NOT NULL
             |    AND CAST(('0x' || substring(md5(event_id || '_' || rep), 1, 8)) AS BIGINT) < 2147483648),
             |means AS (SELECT event_type, rep,
             |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
             |  FROM ex GROUP BY 1, 2),
             |agg AS (SELECT event_type, list_sort(list(m)) AS ms, count(*) AS n_reps
             |  FROM means GROUP BY 1)
             |SELECT event_type, n_reps, ms[5] AS ci_lo, ms[28] AS ci_hi
             |FROM agg WHERE n_reps = 32
             |ORDER BY event_type""".stripMargin)),

    // ---- q135: mergeable equi-width HISTOGRAM states → quantiles —
    // the quantile member of the sketch family (q70 HLL distincts,
    // q77 CMS frequencies, q126 KMV set algebra). States are plain
    // (group, bin, n) rows — map-side bin arithmetic + one
    // partial-aggregable count — and the query exercises the MERGE
    // path: weekly states sum into per-type states by (type, bin)
    // before quantile extraction, the incremental-rollup economics of
    // q70. Bin ids, cumulative ranks, and ceil(q·N) thresholds are
    // all exactly replayable, so a deterministic oracle hash-matches
    // an "approximate" quantile structure (q77 precedent); estimates
    // are within one 10-unit bin of truth by construction.
    Q(
      "q135_histogram_quantiles",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
          .withColumn("week",
            floor(unix_micros($"ts").cast("double") / 604800000000.0).cast("long"))
        val weekly = Sketches.histogramBins(
          ev, Seq("event_type", "week"), $"value", lo = 0.0, hi = 640.0, bins = 64)
        // state merge: week grain folds away with one algebraic sum
        val merged = weekly.groupBy($"event_type", $"bin").agg(sum($"n").as("n"))
        Sketches.histogramQuantiles(
          merged, Seq("event_type"), Seq(0.5, 0.9, 0.99), lo = 0.0, hi = 640.0, bins = 64)
          .orderBy($"event_type")
      },
      Some("""WITH b AS (SELECT event_type,
             |    LEAST(63, GREATEST(0, CAST(floor((value - 0.0) / 10.0) AS BIGINT))) AS bin,
             |    count(*) AS n
             |  FROM events
             |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |c AS (SELECT event_type, bin, n,
             |    sum(n) OVER (PARTITION BY event_type ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(n) OVER (PARTITION BY event_type) AS ntot
             |  FROM b)
             |SELECT event_type, CAST(ntot AS BIGINT) AS n_total,
             |  min(CASE WHEN cum >= ceil(0.5 * ntot) THEN 0.0 + CAST(bin AS DOUBLE) * 10.0 END) AS p50,
             |  min(CASE WHEN cum >= ceil(0.9 * ntot) THEN 0.0 + CAST(bin AS DOUBLE) * 10.0 END) AS p90,
             |  min(CASE WHEN cum >= ceil(0.99 * ntot) THEN 0.0 + CAST(bin AS DOUBLE) * 10.0 END) AS p99
             |FROM c GROUP BY event_type, ntot
             |ORDER BY event_type""".stripMargin)),

    // ---- q136: INCREMENTAL KMV maintenance under the gate — q126's
    // distinct sketch kept live by a real micro-batch stream (the q80
    // CMS pattern): each batch builds per-type states inside the plan,
    // the driver folds them through the SAME linear distinct-merge the
    // aggregator uses, and the final estimates must equal the batch
    // build bit-for-bit (k-min union is exactly associative). Driver
    // state: ≤ k longs per type, regardless of stream length.
    Q(
      "q136_streaming_kmv",
      (s, d) => streamingKmv(s, d),
      Some {
        val h60 = KmvSketch.hash60Sql("user_id")
        s"""WITH h AS (SELECT DISTINCT event_type, $h60 AS h
           |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
           |r AS (SELECT event_type, h,
           |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
           |sk AS (SELECT event_type, list(h ORDER BY h) AS hs
           |  FROM r WHERE rn <= 32 GROUP BY 1)
           |SELECT event_type, CAST(len(hs) AS INT) AS state_size,
           |  ${KmvSketch.estimateSql("hs", 32)} AS est_users
           |FROM sk ORDER BY event_type""".stripMargin
      }),

    // ---- q137: Johnson–Lindenstrauss random projection 64 → 16 —
    // data-independent embedding compression (Achlioptas ±1 matrix):
    // no training pass, one map-side matvec through the codegen
    // kernel, zero shuffle. The matrix derives from portable md5
    // coins, dots accumulate left-to-right in both engines, and
    // sqrt(16) is exact — a HASH-MATCH oracle on the whole projected
    // corpus, re-deriving the matrix AND every component from scratch.
    Q(
      "q137_random_projection",
      (s, d) => {
        import s.implicits._
        Similarity.randomProject(
          Tables.embeddings(s, d), $"embedding", $"vec_id",
          inDim = 64, outDim = 16, seed = 7)
          .orderBy($"vec_id", $"dim_idx")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |m AS (SELECT k,
             |    list(CASE WHEN CAST(('0x' || substring(md5('jl_7_' || k || '_' || j), 1, 8)) AS BIGINT) % 2 = 0
             |         THEN 1.0 ELSE -1.0 END ORDER BY j) AS r
             |  FROM (SELECT unnest(generate_series(0, 15)) AS k),
             |       (SELECT unnest(generate_series(0, 63)) AS j)
             |  GROUP BY k),
             |p AS (SELECT vec_id, k AS dim_idx,
             |    list_dot_product(v, r) / sqrt(16.0) AS value
             |  FROM e CROSS JOIN m WHERE len(v) = 64)
             |SELECT vec_id, CAST(dim_idx AS INT) AS dim_idx, value
             |FROM p ORDER BY vec_id, dim_idx""".stripMargin)),

    // ---- q138: MARKOV transition matrix over each user's event
    // sequence — behavioral next-event statistics (the matrix q105's
    // funnel walks one path of). One lead() window per user (bounded
    // by that user's activity, the q87 geometry), exact pair counts,
    // and row-normalized probabilities as one deterministic double
    // division — exact oracle.
    Q(
      "q138_markov_transitions",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy("user_id").orderBy($"ts", $"event_id")
        val pairs = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull && $"event_type".isNotNull)
          .select($"user_id", $"ts", $"event_id", $"event_type".as("from_type"))
          .withColumn("to_type", lead($"from_type", 1).over(w))
          .filter($"to_type".isNotNull)
        val counts = pairs.groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
        val tot = Window.partitionBy("from_type")
        counts.select(
          $"from_type", $"to_type", $"n",
          ($"n".cast("double") / sum($"n").over(tot).cast("double")).as("p"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH seq AS (SELECT user_id, event_type AS from_type,
             |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
             |c AS (SELECT from_type, to_type, count(*) AS n FROM seq
             |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
             |FROM c ORDER BY from_type, to_type""".stripMargin)),

    // ---- q139: PCA with a CERTIFICATE oracle — top-4 eigenpairs of
    // the embedding covariance from ONE partial-aggregable co-moment
    // pass (the corpus never shuffles; the 64×64 eigenproblem solves
    // on the driver, q93/q96 bounded-step precedent). Float covariance
    // sums are partition-ordered and so not bit-portable — instead of
    // replaying them, DuckDB recomputes covariance ITSELF (covar_samp)
    // and verifies the emitted pairs' certificate: orthonormality to
    // 1e-9, eigen-residual ‖Cv − λv‖∞ ≤ 1e-6, λ descending and
    // ≥ −1e-9, λ₁ ≥ max Cᵢᵢ. Any wrong component, wrong value, or
    // mis-sort fails a check → poison row. Maximality (top k, not any
    // k) is spec-pinned against a local replay.
    Q(
      "q139_pca_certificate",
      (s, d) => {
        import s.implicits._
        graft.operators.Pca.fitRows(
          Tables.embeddings(s, d), $"embedding", dim = 64, topK = 4)
          .orderBy($"part", $"k", $"j")
      },
      Some("""WITH em AS (SELECT * FROM read_parquet('{{OUT}}/q139_pca_certificate/*.parquet')),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE len(embedding) = 64),
             |x AS (SELECT vec_id, j, v[CAST(j + 1 AS INT)] AS x
             |  FROM e, (SELECT unnest(generate_series(0, 63)) AS j)),
             |cv AS MATERIALIZED (SELECT a.j AS i, b.j AS jj, covar_samp(a.x, b.x) AS c
             |  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
             |vecs AS MATERIALIZED (SELECT k, j, value FROM em WHERE part = 'eigvec'),
             |vals AS MATERIALIZED (SELECT k, value AS lam FROM em WHERE part = 'eigval'),
             |resid AS (SELECT v.k, cv.i, sum(cv.c * v.value) AS cv_i
             |  FROM cv JOIN vecs v ON cv.jj = v.j GROUP BY v.k, cv.i),
             |rchk AS (SELECT r.k, max(abs(r.cv_i - vals.lam * vi.value)) AS rmax
             |  FROM resid r JOIN vals USING (k)
             |  JOIN vecs vi ON vi.k = r.k AND vi.j = r.i GROUP BY r.k),
             |dots AS (SELECT a.k AS k1, b.k AS k2, sum(a.value * b.value) AS dot
             |  FROM vecs a JOIN vecs b USING (j) GROUP BY 1, 2),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM vals) = 4
             |    AND (SELECT count(*) FROM vecs) = 4 * 64
             |    AND (SELECT count(*) FROM em) = 4 + 4 * 64
             |    AND NOT EXISTS (SELECT 1 FROM dots
             |      WHERE (k1 = k2 AND abs(dot - 1.0) > 1e-9)
             |         OR (k1 <> k2 AND abs(dot) > 1e-9))
             |    AND NOT EXISTS (SELECT 1 FROM rchk WHERE rmax > 1e-6 OR isnan(rmax))
             |    AND NOT EXISTS (SELECT 1 FROM vals a JOIN vals b ON a.k + 1 = b.k
             |      WHERE a.lam < b.lam - 1e-12)
             |    AND (SELECT min(lam) FROM vals) > -1e-9
             |    AND (SELECT lam FROM vals WHERE k = 0)
             |      >= (SELECT max(c) FROM cv WHERE i = jj) - 1e-6
             |  ) AS ok)
             |SELECT part, k, j, value FROM em WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'poison', CAST(-1 AS INT), CAST(-1 AS INT), CAST(-999 AS DOUBLE)
             |  WHERE NOT (SELECT ok FROM flag)
             |ORDER BY part, k, j""".stripMargin)),

    // ---- q140: TF-IDF top-terms KEYWORD EXTRACTION — each doc's 3
    // most characteristic terms by tf · (ln((1+N)/(1+df)) + 1), the
    // sklearn-smoothed idf (always positive, so ubiquitous terms
    // dampen but never flip sign). The per-doc ranking window is
    // bounded by that doc's distinct terms (doc-sized, the q21 class);
    // the df join shuffles vocab-sized term tables, not the corpus.
    // ln() is engine-local → the q57 tolerance-oracle shape: every
    // emitted score recomputed within 1e-9, per-doc emission counts
    // exact (min(3, distinct terms)), no outside term beats the
    // doc's worst emitted + 1e-9, and ranks re-derive from the
    // recomputed scores.
    Q(
      "q140_tfidf_top_terms",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select($"doc_id", coalesce(TextAnalysis.tokens($"text"), array()).as("toks"))
        val tf = docs.select($"doc_id", explode($"toks").as("term"))
          .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n"))
        val scored = tf.join(dfT, "term").crossJoin(broadcast(nDocs))
          .withColumn("score",
            $"tf" * (log(($"n" + lit(1.0)) / ($"df" + lit(1.0))) + lit(1.0)))
        val w = Window.partitionBy("doc_id").orderBy($"score".desc, $"term")
        scored.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 3)
          .select($"doc_id", $"rank", $"term", $"tf", $"score")
          .orderBy($"doc_id", $"rank")
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($sqlToks) AS term FROM documents),
              |tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
              |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              |n AS (SELECT count(*) AS n FROM documents),
              |sc AS MATERIALIZED (SELECT tf.doc_id, tf.term, tf.tf,
              |    tf.tf * (ln((n.n + 1.0) / (dfx.df + 1.0)) + 1.0) AS score
              |  FROM tf JOIN dfx USING (term) CROSS JOIN n),
              |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q140_tfidf_top_terms/*.parquet')),
              |joined AS MATERIALIZED (SELECT e.doc_id, e.rank, e.term, e.tf, sc.score
              |  FROM emitted e JOIN sc ON e.doc_id = sc.doc_id AND e.term = sc.term
              |    AND e.tf = sc.tf AND abs(e.score - sc.score) <= 1e-9),
              |percount AS (SELECT doc_id, count(*) AS c FROM emitted GROUP BY 1),
              |expectcount AS (SELECT doc_id, least(3, count(*)) AS c FROM sc GROUP BY 1),
              |worst AS (SELECT doc_id, min(score) AS w FROM joined GROUP BY 1),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM joined)
              |    AND NOT EXISTS (SELECT 1 FROM expectcount x LEFT JOIN percount p USING (doc_id)
              |      WHERE coalesce(p.c, 0) <> x.c)
              |    AND NOT EXISTS (SELECT 1 FROM sc JOIN worst USING (doc_id)
              |      WHERE sc.score > worst.w + 1e-9
              |        AND NOT EXISTS (SELECT 1 FROM joined j
              |          WHERE j.doc_id = sc.doc_id AND j.term = sc.term))
              |    AND NOT EXISTS (SELECT 1 FROM (
              |        SELECT doc_id, rank,
              |          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rr
              |        FROM joined) WHERE rank <> rr)
              |  ) AS ok)
              |SELECT doc_id, rank, term, tf, score FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS INT), 'poison', CAST(-1 AS BIGINT),
              |  CAST(-999 AS DOUBLE)
              |  WHERE NOT (SELECT ok FROM flag)
              |ORDER BY doc_id, rank""".stripMargin)),

    // ---- q141: two-sample KOLMOGOROV–SMIRNOV drift test — the
    // CONTINUOUS companion to q124 (χ²) and q125 (PSI): does the
    // purchase-value distribution shift between the two halves of the
    // month? D = sup|F_ref − F_cur| computed exactly at every distinct
    // value through the two-phase bucket geometry (per-bucket prefix
    // offsets + bucket-bounded cumulative windows — no global-order
    // single-reducer window). Counts are exact integers and the CDF
    // fractions exact divisions, so D, the α=0.05 critical value, and
    // the drift verdict all HASH-MATCH — a deterministic replay of a
    // statistical test.
    Q(
      "q141_ks_drift_test",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"value".isNotNull && $"ts".isNotNull)
        graft.operators.KsTest.ksTwoSample(
          ev, $"value", $"ts" < lit("2024-01-16").cast("timestamp"), buckets = 256)
      },
      Some("""WITH base AS (SELECT value AS v, (ts < TIMESTAMP '2024-01-16') AS r
             |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
             |pv AS (SELECT v,
             |    sum(CASE WHEN r THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS c2
             |  FROM base GROUP BY v),
             |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM pv),
             |cum AS (SELECT
             |    CAST(sum(c1) OVER w AS DOUBLE) AS cc1,
             |    CAST(sum(c2) OVER w AS DOUBLE) AS cc2
             |  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |dd AS (SELECT max(abs(cc1 / tot.n1 - cc2 / tot.n2)) AS d_stat FROM cum, tot)
             |SELECT tot.n1 AS n_ref, tot.n2 AS n_cur, dd.d_stat,
             |  1.358 * sqrt(CAST(tot.n1 + tot.n2 AS DOUBLE)
             |    / (CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE))) AS crit_05,
             |  dd.d_stat > 1.358 * sqrt(CAST(tot.n1 + tot.n2 AS DOUBLE)
             |    / (CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE))) AS drift
             |FROM dd, tot""".stripMargin)),

    // ---- q142: PCA PROJECTION — the fit→APPLY loop closed: q139's
    // model projects every embedding onto its top-4 components,
    // `coord = dot(v, e_k) − dot(µ, e_k)` (the centering constant
    // folds to one driver scalar per component, so apply is ONE
    // matvec kernel call per row — zero shuffle). The emitted output
    // carries the model (mean + eigvectors) alongside the
    // coordinates, and the oracle re-derives EVERY coordinate from
    // the emitted model with the bit-equal list_dot_product fold —
    // exact equality, no tolerance — plus an orthonormality
    // certificate-lite on the shipped eigvectors (the full
    // eigen-certificate is q139's job).
    Q(
      "q142_pca_projection",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val model = graft.operators.Pca.fit(emb, $"embedding", dim = 64, topK = 4)
        val coords = graft.operators.Pca.project(emb, $"embedding", $"vec_id", model)
          .select(lit("coord").as("part"), $"vec_id".as("a"),
            $"comp".cast("long").as("b"), $"coord".as("value"))
        val modelRows =
          model.mean.zipWithIndex.map { case (m, j) => ("mean", -1L, j.toLong, m) } ++
            (for (k <- 0 until 4; j <- 0 until 64)
              yield ("evec", k.toLong, j.toLong, model.eigvecs(k)(j)))
        modelRows.toSeq.toDF("part", "a", "b", "value")
          .unionByName(coords)
          .orderBy($"part", $"a", $"b")
      },
      Some("""WITH em AS (SELECT * FROM read_parquet('{{OUT}}/q142_pca_projection/*.parquet')),
             |mn AS MATERIALIZED (SELECT b AS j, value FROM em WHERE part = 'mean'),
             |ev AS MATERIALIZED (SELECT a AS k, b AS j, value FROM em WHERE part = 'evec'),
             |meanl AS (SELECT list(value ORDER BY j) AS m FROM mn),
             |evl AS MATERIALIZED (SELECT k, list(value ORDER BY j) AS e FROM ev GROUP BY k),
             |cc AS (SELECT k, list_dot_product((SELECT m FROM meanl), e) AS c FROM evl),
             |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE len(embedding) = 64),
             |expected AS MATERIALIZED (SELECT emb.vec_id, evl.k AS comp,
             |    list_dot_product(v, e) - cc.c AS coord
             |  FROM emb CROSS JOIN evl JOIN cc USING (k)),
             |coords AS MATERIALIZED (SELECT a AS vec_id, b AS comp, value
             |  FROM em WHERE part = 'coord'),
             |dots AS (SELECT x.k AS k1, y.k AS k2, sum(x.value * y.value) AS dot
             |  FROM ev x JOIN ev y USING (j) GROUP BY 1, 2),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM mn) = 64
             |    AND (SELECT count(*) FROM ev) = 256
             |    AND (SELECT count(*) FROM coords) = 4 * (SELECT count(*) FROM emb)
             |    AND NOT EXISTS (SELECT 1 FROM dots
             |      WHERE (k1 = k2 AND abs(dot - 1.0) > 1e-9)
             |         OR (k1 <> k2 AND abs(dot) > 1e-9))
             |    AND NOT EXISTS (SELECT 1 FROM coords c2
             |      JOIN expected x ON c2.vec_id = x.vec_id AND c2.comp = x.comp
             |      WHERE c2.value <> x.coord)
             |    AND NOT EXISTS (SELECT 1 FROM expected x WHERE NOT EXISTS (
             |      SELECT 1 FROM coords c3
             |      WHERE c3.vec_id = x.vec_id AND c3.comp = x.comp))
             |  ) AS ok)
             |SELECT part, a, b, value FROM em WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'poison', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |  WHERE NOT (SELECT ok FROM flag)
             |ORDER BY part, a, b""".stripMargin)),

    // ---- q143: interval-overlap DURATION aggregation — how many
    // seconds of each user's sessions fell inside the daily 18:00–22:00
    // "peak" windows (attribution/co-presence analytics: not "did they
    // overlap" — q84 — but "for HOW LONG"). Sessions come from the
    // real sessionizer (cross-operator composition, q36's exact
    // boundary semantics), the 30 peak windows broadcast (for two
    // LARGE interval tables the q84 bin join provides the pairing),
    // and intersection lengths are exact integer µs —
    // `least(ends) − greatest(starts)`, strictly-positive overlaps
    // only, so the oracle replays everything bit-for-bit.
    Q(
      "q143_session_overlap",
      (s, d) => {
        import s.implicits._
        val sessions = graft.streaming.Sessionize.batch(
          Tables.events(s, d).filter($"user_id".isNotNull), gapMinutes = 30)
          .select($"user_id",
            unix_micros($"session_start").as("ss"),
            unix_micros($"session_end").as("se"))
        // 30 daily peak windows, Jan 2024 18:00–22:00 UTC
        val baseUs = 1704132000000000L // 2024-01-01T18:00:00Z
        val windows = s.range(30).select(
          (lit(baseUs) + $"id" * lit(86400000000L)).as("ws"),
          (lit(baseUs) + $"id" * lit(86400000000L) + lit(14400000000L)).as("we"))
        sessions.join(broadcast(windows), $"ss" < $"we" && $"ws" < $"se")
          .select($"user_id",
            (least($"se", $"we") - greatest($"ss", $"ws")).as("ov"))
          .filter($"ov" > 0)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_pairs"), sum($"ov").as("overlap_us"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, value FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |b AS (SELECT user_id, epoch_us(ts) AS t, value,
             |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
             |          OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
             |sn AS (SELECT user_id, t,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY t, value
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM b),
             |sess AS (SELECT user_id, min(t) AS ss, max(t) AS se
             |  FROM sn GROUP BY user_id, sid),
             |win AS (SELECT 1704132000000000 + d * 86400000000 AS ws,
             |    1704132000000000 + d * 86400000000 + 14400000000 AS we
             |  FROM (SELECT unnest(generate_series(0, 29)) AS d)),
             |ov AS (SELECT user_id, least(se, we) - greatest(ss, ws) AS ov
             |  FROM sess JOIN win ON ss < we AND ws < se
             |  WHERE least(se, we) - greatest(ss, ws) > 0)
             |SELECT user_id, count(*) AS n_pairs, CAST(sum(ov) AS BIGINT) AS overlap_us
             |FROM ov GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- q144: greedy k-CENTER coreset (Gonzalez 1985; Sener &
    // Savarese 2018) — the 8 maximally diverse embeddings: seed at
    // the min id, then repeatedly the point farthest (squared L2)
    // from everything chosen. The diversity-selection primitive of
    // active learning and data pruning, and a 2-approximation to the
    // optimal k-center cover. Every distance uses the exact
    // dot-product decomposition (vv − 2·dot + cc, the
    // NearestCentroidsL2 convention) through the matvec kernel, min
    // is order-free, and ties break to the smallest id — so DuckDB
    // replays the ENTIRE greedy trajectory bit-for-bit through k − 1
    // unrolled MATERIALIZED CTE steps (the q89 unrolled-loop
    // precedent).
    Q(
      "q144_kcenter_coreset",
      (s, d) => {
        import s.implicits._
        graft.operators.Coreset.kCenterGreedy(
          Tables.embeddings(s, d), $"embedding", $"vec_id", k = 8)
          .orderBy($"rank")
      },
      Some {
        val steps = new StringBuilder
        for (r <- 2 to 8) {
          val prev = r - 1
          steps.append(
            s"""pick$r AS MATERIALIZED (SELECT vec_id, d2 FROM (
               |    SELECT x.vec_id, min(x.vv - 2.0 * list_dot_product(x.v, c.v) + c.vv) AS d2
               |    FROM e x CROSS JOIN (SELECT e2.v, e2.vv FROM e e2 JOIN ch$prev USING (vec_id)) c
               |    WHERE x.vec_id NOT IN (SELECT vec_id FROM ch$prev)
               |    GROUP BY x.vec_id)
               |  ORDER BY d2 DESC, vec_id LIMIT 1),
               |ch$r AS MATERIALIZED (SELECT vec_id FROM ch$prev
               |  UNION ALL SELECT vec_id FROM pick$r),
               |""".stripMargin)
        }
        val unions = (2 to 8).map(r =>
          s"UNION ALL SELECT CAST($r AS INT), vec_id, d2 FROM pick$r").mkString("\n")
        s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |    list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS vv
           |  FROM embeddings WHERE vec_id IS NOT NULL AND len(embedding) > 0),
           |ch1 AS MATERIALIZED (SELECT min(vec_id) AS vec_id FROM e),
           |$steps
           |final AS (
           |  SELECT CAST(1 AS INT) AS rank, vec_id, CAST(NULL AS DOUBLE) AS d2 FROM ch1
           |  $unions)
           |SELECT rank, vec_id, d2 AS dist2 FROM final ORDER BY rank""".stripMargin
      }),

    // ---- q145: CUSUM changepoint detection (Page 1954) — WHEN did
    // each event type's daily volume shift? q124/q125/q141 detect
    // THAT distributions drifted; CUSUM localizes the change: the day
    // maximizing |Σ_{d'≤d} (daily_total − overall mean)|. Daily
    // totals partial-aggregate map-side (decimal-exact, the corpus
    // never reaches a window); the cumulative runs per type over its
    // DAY series (span-bounded, q106 geometry) in pinned day order,
    // so the running double sum — and therefore the argmax day and
    // peak statistic — replay bit-for-bit.
    Q(
      "q145_cusum_changepoint",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .filter($"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
          .groupBy($"event_type",
            floor(unix_micros($"ts").cast("double") / 86400000000.0).cast("long").as("day_id"))
          .agg(sum($"value".cast("decimal(18,6)")).as("dv"))
        val stats = daily.groupBy($"event_type")
          .agg(sum($"dv").as("tot"), count(lit(1)).as("nd"))
        val wCum = Window.partitionBy("event_type").orderBy("day_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wPick = Window.partitionBy("event_type")
          .orderBy($"abs_cusum".desc, $"day_id")
        // cusum = prefix − k·target with the PREFIX in exact decimal:
        // a windowed DOUBLE sum would be engine-order-dependent (DuckDB
        // runs moving aggregates through a pairwise segment tree where
        // Spark accumulates sequentially); decimal prefixes are exact
        // under any order, and the algebraic re-base keeps the double
        // arithmetic to one pinned expression per row
        daily.join(stats, "event_type")
          .withColumn("prefix", sum($"dv").over(wCum))
          .withColumn("k", count(lit(1)).over(wCum))
          .withColumn("cusum",
            $"prefix".cast("double") -
              $"k".cast("double") * ($"tot".cast("double") / $"nd".cast("double")))
          .withColumn("abs_cusum", abs($"cusum"))
          .withColumn("rn", row_number().over(wPick))
          .filter($"rn" === 1)
          .select($"event_type", $"nd".as("n_days"),
            $"day_id".as("cp_day"), $"abs_cusum".as("max_abs_cusum"))
          .orderBy($"event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS day_id,
             |    sum(CAST(value AS DECIMAL(18,6))) AS dv
             |  FROM events
             |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |st AS (SELECT event_type, sum(dv) AS tot, count(*) AS nd
             |  FROM daily GROUP BY 1),
             |cs AS (SELECT d.event_type, d.day_id, st.nd,
             |    CAST(sum(d.dv) OVER w AS DOUBLE)
             |      - CAST(count(*) OVER w AS DOUBLE)
             |        * (CAST(st.tot AS DOUBLE) / CAST(st.nd AS DOUBLE)) AS cusum
             |  FROM daily d JOIN st USING (event_type)
             |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |pk AS (SELECT event_type, nd, day_id, abs(cusum) AS abs_cusum,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY abs(cusum) DESC, day_id) AS rn
             |  FROM cs)
             |SELECT event_type, CAST(nd AS BIGINT) AS n_days, day_id AS cp_day,
             |  abs_cusum AS max_abs_cusum
             |FROM pk WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // ---- q146: SLIDING-window distinct counts from mergeable KMV
    // states — trailing-7-day active users per day WITHOUT rescanning
    // raw history: one daily state build (the q126 sketch), then each
    // day merges its ≤ 7 KB-sized states (k-min of the union —
    // associativity makes the merged sketch ≡ sketching the raw
    // window). The day-grain state table is bounded by the calendar,
    // not the corpus; this is precisely why mergeable sketch states
    // exist (q70's economics, now in a sliding frame). Early days
    // have partial windows AND unsaturated sketches, so both
    // estimator branches gate. Exact md5 replay end to end.
    Q(
      "q146_sliding_distinct",
      (s, d) => {
        import s.implicits._
        val k = 64
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull)
          .withColumn("day_id",
            floor(unix_micros($"ts").cast("double") / 86400000000.0).cast("long"))
        val daily = KmvSketch.sketch(ev, Seq("day_id"), $"user_id", k).localCheckpoint()
        val days = daily.select($"day_id".as("d"))
        days.join(daily, $"day_id".between($"d" - 6, $"d"))
          .groupBy($"d")
          .agg(count(lit(1)).as("n_days_window"),
            flatten(collect_list($"kmv")).as("hs"))
          .select($"d".as("day_id"), $"n_days_window",
            slice(array_sort(array_distinct($"hs")), 1, k).as("kmv"))
          .select($"day_id", $"n_days_window",
            size($"kmv").as("state_size"),
            KmvSketch.estimate($"kmv", k).as("est_users_7d"))
          .orderBy($"day_id")
      },
      Some {
        val h60 = KmvSketch.hash60Sql("user_id")
        s"""WITH ev AS (SELECT DISTINCT
           |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS day_id,
           |    $h60 AS h
           |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
           |days AS (SELECT DISTINCT day_id FROM ev),
           |dw AS (SELECT DISTINCT d.day_id, e.h
           |  FROM days d JOIN ev e ON e.day_id BETWEEN d.day_id - 6 AND d.day_id),
           |r AS (SELECT day_id, h,
           |    row_number() OVER (PARTITION BY day_id ORDER BY h) AS rn FROM dw),
           |sk AS (SELECT day_id, list(h ORDER BY h) AS hs
           |  FROM r WHERE rn <= 64 GROUP BY 1),
           |nw AS (SELECT d.day_id, count(*) AS n_days_window
           |  FROM days d JOIN days e ON e.day_id BETWEEN d.day_id - 6 AND d.day_id
           |  GROUP BY 1)
           |SELECT sk.day_id, nw.n_days_window,
           |  CAST(len(hs) AS INT) AS state_size,
           |  ${KmvSketch.estimateSql("hs", 64)} AS est_users_7d
           |FROM sk JOIN nw USING (day_id) ORDER BY day_id""".stripMargin
      }),

    // ---- q147: stream-stream FULL-OUTER interval join — completes
    // the streaming join matrix (inner q92, left q132): BOTH sides'
    // unmatched rows surface with a null other side once the final
    // watermark passes their last possible match time (the interval
    // is symmetric, so the eviction boundary is `own ts + 1h` on
    // each side). Same deterministic watermark re-derivation as q132,
    // now with the withheld set computed for both streams.
    Q(
      "q147_streaming_full_outer_interval_join",
      (s, d) => streamingOuterIntervalJoin(s, d, "fullOuter", "q147_ssfoj"),
      Some("""WITH err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             |clk AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |wm AS (SELECT least(
             |    (SELECT CAST(floor(CAST(max(epoch_us(ts)) AS DOUBLE) / 1000.0) AS BIGINT) FROM err),
             |    (SELECT CAST(floor(CAST(max(epoch_us(ts)) AS DOUBLE) / 1000.0) AS BIGINT) FROM clk)
             |  ) - 7200000 AS w_ms),
             |pairs AS (SELECT a.event_id AS error_event_id, b.event_id AS click_event_id
             |  FROM err a JOIN clk b ON a.user_id = b.user_id
             |   AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 3600000000
             |                          AND epoch_us(a.ts) + 3600000000),
             |unmatched_l AS (SELECT a.event_id AS error_event_id,
             |    CAST(NULL AS BIGINT) AS click_event_id
             |  FROM err a
             |  WHERE a.event_id NOT IN (SELECT error_event_id FROM pairs)
             |    AND CAST(floor(CAST(epoch_us(a.ts) AS DOUBLE) / 1000.0) AS BIGINT) + 3600000
             |      < (SELECT w_ms FROM wm)),
             |unmatched_r AS (SELECT CAST(NULL AS BIGINT) AS error_event_id,
             |    b.event_id AS click_event_id
             |  FROM clk b
             |  WHERE b.event_id NOT IN (SELECT click_event_id FROM pairs)
             |    AND CAST(floor(CAST(epoch_us(b.ts) AS DOUBLE) / 1000.0) AS BIGINT) + 3600000
             |      < (SELECT w_ms FROM wm))
             |SELECT * FROM pairs
             |UNION ALL SELECT * FROM unmatched_l
             |UNION ALL SELECT * FROM unmatched_r
             |ORDER BY error_event_id, click_event_id""".stripMargin)),

    // ---- q148: STREAMING incremental PCA under the gate — q139's
    // model maintained from a live stream: each micro-batch runs ONE
    // bounded co-moment pass and the driver element-wise-adds the
    // sufficient-statistic arrays (they are exactly mergeable — this
    // is why the co-moment formulation, not a covariance-per-batch,
    // is the state); the eigensolve happens once at the end on the
    // merged sums. The q139 CERTIFICATE oracle applies verbatim — it
    // recomputes covariance from raw data itself and verifies the
    // emitted eigenpairs, indifferent to HOW the sums were
    // accumulated (batch, streamed, any partitioning).
    Q(
      "q148_streaming_pca",
      (s, d) => streamingPca(s, d),
      Some("""WITH em AS (SELECT * FROM read_parquet('{{OUT}}/q148_streaming_pca/*.parquet')),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE len(embedding) = 64),
             |x AS (SELECT vec_id, j, v[CAST(j + 1 AS INT)] AS x
             |  FROM e, (SELECT unnest(generate_series(0, 63)) AS j)),
             |cv AS MATERIALIZED (SELECT a.j AS i, b.j AS jj, covar_samp(a.x, b.x) AS c
             |  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
             |vecs AS MATERIALIZED (SELECT k, j, value FROM em WHERE part = 'eigvec'),
             |vals AS MATERIALIZED (SELECT k, value AS lam FROM em WHERE part = 'eigval'),
             |resid AS (SELECT v.k, cv.i, sum(cv.c * v.value) AS cv_i
             |  FROM cv JOIN vecs v ON cv.jj = v.j GROUP BY v.k, cv.i),
             |rchk AS (SELECT r.k, max(abs(r.cv_i - vals.lam * vi.value)) AS rmax
             |  FROM resid r JOIN vals USING (k)
             |  JOIN vecs vi ON vi.k = r.k AND vi.j = r.i GROUP BY r.k),
             |dots AS (SELECT a.k AS k1, b.k AS k2, sum(a.value * b.value) AS dot
             |  FROM vecs a JOIN vecs b USING (j) GROUP BY 1, 2),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM vals) = 4
             |    AND (SELECT count(*) FROM vecs) = 4 * 64
             |    AND (SELECT count(*) FROM em) = 4 + 4 * 64
             |    AND NOT EXISTS (SELECT 1 FROM dots
             |      WHERE (k1 = k2 AND abs(dot - 1.0) > 1e-9)
             |         OR (k1 <> k2 AND abs(dot) > 1e-9))
             |    AND NOT EXISTS (SELECT 1 FROM rchk WHERE rmax > 1e-6 OR isnan(rmax))
             |    AND NOT EXISTS (SELECT 1 FROM vals a JOIN vals b ON a.k + 1 = b.k
             |      WHERE a.lam < b.lam - 1e-12)
             |    AND (SELECT min(lam) FROM vals) > -1e-9
             |    AND (SELECT lam FROM vals WHERE k = 0)
             |      >= (SELECT max(c) FROM cv WHERE i = jj) - 1e-6
             |  ) AS ok)
             |SELECT part, k, j, value FROM em WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'poison', CAST(-1 AS INT), CAST(-1 AS INT), CAST(-999 AS DOUBLE)
             |  WHERE NOT (SELECT ok FROM flag)
             |ORDER BY part, k, j""".stripMargin)))

  val timeSeriesQueries: Seq[Q] = Seq(

    // ---- q149: TIME-WEIGHTED average (TWAP) over irregular samples —
    // each user's value integrated over its holding intervals
    // [tᵢ, tᵢ₊₁) and normalized by the span: the correct mean when
    // sampling is uneven (telemetry/finance; an unweighted mean
    // overweights bursts). Products are DECIMAL × exact-µs-long →
    // exact decimal numerators under any partitioning; only the final
    // num/span division is a double, and scale-6 decimal→double casts
    // double-round differently per engine (the q112/q114 hazard) — so
    // the oracle recomputes every TWAP and admits rows within 1e-9
    // (exact n/span), poison otherwise.
    Q(
      "q149_twap",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy("user_id").orderBy($"ts", $"event_id")
        val spans = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull && $"value".isNotNull)
          .select($"user_id", $"ts", $"event_id", $"value")
          .withColumn("t_next", lead($"ts", 1).over(w))
          .withColumn("wt",
            $"value".cast("decimal(18,6)") *
              (unix_micros($"t_next") - unix_micros($"ts")))
        spans.groupBy($"user_id")
          .agg(
            count(lit(1)).as("n_events"),
            (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("span_us"),
            sum($"wt").as("num"))
          .filter($"span_us" > 0)
          .select($"user_id", $"n_events", $"span_us",
            ($"num".cast("double") / $"span_us".cast("double")).as("twap"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
             |sp AS (SELECT user_id, v,
             |    lead(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      - epoch_us(ts) AS dt,
             |    epoch_us(ts) AS t
             |  FROM e),
             |g AS (SELECT user_id, count(*) AS n_events,
             |    max(t) - min(t) AS span_us, sum(v * dt) AS num
             |  FROM sp GROUP BY user_id),
             |expected AS (SELECT user_id, n_events, span_us,
             |    CAST(num AS DOUBLE) / CAST(span_us AS DOUBLE) AS twap
             |  FROM g WHERE span_us > 0),
             |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q149_twap/*.parquet')),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expected)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e2
             |      WHERE e2.user_id NOT IN (SELECT user_id FROM expected))
             |    AND NOT EXISTS (SELECT 1 FROM emitted e2 JOIN expected x USING (user_id)
             |      WHERE e2.n_events <> x.n_events OR e2.span_us <> x.span_us
             |         OR abs(e2.twap - x.twap) > 1e-9)
             |  ) AS ok)
             |SELECT user_id, n_events, span_us, twap FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE)
             |  WHERE NOT (SELECT ok FROM flag)
             |ORDER BY user_id""".stripMargin)),

    // ---- q150: OHLC resampling — per (type, day) open/high/low/
    // close/volume bars, the canonical irregular-series downsample.
    // Open/close are argmin/argmax by the unique (ts, event_id) order
    // through partial-aggregable struct-min/max (the q54 keep-best
    // shape — no per-bar window, no sort); high/low/volume are plain
    // extrema/counts. Zero float arithmetic → exact hash oracle.
    Q(
      "q150_ohlc_bars",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .filter($"event_type".isNotNull && $"ts".isNotNull && $"value".isNotNull)
          .groupBy($"event_type",
            floor(unix_micros($"ts").cast("double") / 86400000000.0).cast("long").as("day_id"))
          .agg(
            min(struct($"ts", $"event_id", $"value")).getField("value").as("open"),
            max($"value").as("high"),
            min($"value").as("low"),
            max(struct($"ts", $"event_id", $"value")).getField("value").as("close"),
            count(lit(1)).as("volume"))
          .orderBy($"event_type", $"day_id")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS day_id,
             |    ts, event_id, value,
             |    row_number() OVER (PARTITION BY event_type,
             |      CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT)
             |      ORDER BY ts, event_id) AS rf,
             |    row_number() OVER (PARTITION BY event_type,
             |      CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT)
             |      ORDER BY ts DESC, event_id DESC) AS rl
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL)
             |SELECT event_type, day_id,
             |  max(CASE WHEN rf = 1 THEN value END) AS open,
             |  max(value) AS high, min(value) AS low,
             |  max(CASE WHEN rl = 1 THEN value END) AS close,
             |  count(*) AS volume
             |FROM e GROUP BY 1, 2 ORDER BY event_type, day_id""".stripMargin)),

    // ---- q151: WELCH's unequal-variance t-test — did each type's
    // mean purchase value change between the month's halves? The
    // classical two-sample inference the drift suite still lacked
    // (χ²/PSI are categorical, KS is distribution-shape, bootstrap is
    // nonparametric). Sufficient statistics are exact decimal
    // (n, Σv, Σv²) per (type, period) — one partial-aggregable pass —
    // and the t statistic + Welch–Satterthwaite dof compute in
    // pinned-order doubles; scale-12 decimal→double casts double-round
    // differently per engine, so the oracle recomputes everything and
    // admits rows within 1e-9 (q112's exact pattern), poison row
    // otherwise.
    Q(
      "q151_welch_ttest",
      (s, d) => {
        import s.implicits._
        val halves = Tables.events(s, d)
          .filter($"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
          .withColumn("period",
            when($"ts" < lit("2024-01-16").cast("timestamp"), 0).otherwise(1))
          .withColumn("v", $"value".cast("decimal(19,6)"))
          .groupBy($"event_type", $"period")
          .agg(count(lit(1)).as("n"), sum($"v").as("s1"), sum($"v" * $"v").as("s2"))
        val a = halves.filter($"period" === 0)
          .select($"event_type", $"n".as("n1"), $"s1".as("a1"), $"s2".as("a2"))
        val b = halves.filter($"period" === 1)
          .select($"event_type", $"n".as("n2"), $"s1".as("b1"), $"s2".as("b2"))
        def m(s: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
          s.cast("double") / n.cast("double")
        def varOf(s2: org.apache.spark.sql.Column, s1: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          (s2.cast("double") - s1.cast("double") * s1.cast("double") / n.cast("double")) /
            (n.cast("double") - lit(1.0))
        a.join(b, "event_type")
          .withColumn("m1", m($"a1", $"n1")).withColumn("m2", m($"b1", $"n2"))
          .withColumn("v1", varOf($"a2", $"a1", $"n1"))
          .withColumn("v2", varOf($"b2", $"b1", $"n2"))
          .withColumn("se2", $"v1" / $"n1".cast("double") + $"v2" / $"n2".cast("double"))
          .select(
            $"event_type", $"n1", $"n2",
            ($"m1" - $"m2").as("mean_diff"),
            (($"m1" - $"m2") / sqrt($"se2")).as("t_stat"),
            ($"se2" * $"se2" /
              ($"v1" / $"n1".cast("double") * ($"v1" / $"n1".cast("double")) /
                ($"n1".cast("double") - lit(1.0)) +
               $"v2" / $"n2".cast("double") * ($"v2" / $"n2".cast("double")) /
                ($"n2".cast("double") - lit(1.0)))).as("dof"))
          .orderBy($"event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS period,
             |    CAST(value AS DECIMAL(19,6)) AS v
             |  FROM events
             |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL),
             |g AS (SELECT event_type, period, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2
             |  FROM e GROUP BY 1, 2),
             |j AS (SELECT a.event_type,
             |    a.n AS n1, b.n AS n2,
             |    CAST(a.s1 AS DOUBLE) / a.n AS m1, CAST(b.s1 AS DOUBLE) / b.n AS m2,
             |    (CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n)
             |      / (a.n - 1.0) AS v1,
             |    (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)
             |      / (b.n - 1.0) AS v2
             |  FROM (SELECT * FROM g WHERE period = 0) a
             |  JOIN (SELECT * FROM g WHERE period = 1) b USING (event_type)),
             |x AS (SELECT event_type, n1, n2, m1 - m2 AS mean_diff,
             |    (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS t_stat,
             |    (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             |      / (v1 / n1 * (v1 / n1) / (n1 - 1.0) + v2 / n2 * (v2 / n2) / (n2 - 1.0)) AS dof
             |  FROM j),
             |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q151_welch_ttest/*.parquet')),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM x)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e2
             |      WHERE e2.event_type NOT IN (SELECT event_type FROM x))
             |    AND NOT EXISTS (SELECT 1 FROM emitted e2 JOIN x USING (event_type)
             |      WHERE e2.n1 <> x.n1 OR e2.n2 <> x.n2
             |         OR abs(e2.mean_diff - x.mean_diff) > 1e-9
             |         OR abs(e2.t_stat - x.t_stat) > 1e-9
             |         OR abs(e2.dof - x.dof) > 1e-9)
             |  ) AS ok)
             |SELECT event_type, n1, n2, mean_diff, t_stat, dof FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'poison', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |  WHERE NOT (SELECT ok FROM flag)
             |ORDER BY event_type""".stripMargin)),

    // ---- q152: BFS hop distances — the graph family's reachability
    // member (q89 PageRank ranks, q34 components cluster, BFS
    // measures): every node's minimum distance from supplier 0 over
    // the undirected supplier—part graph (suppliers at 2k, parts at
    // 2k+1 — the standard bipartite node encoding). Level-synchronous
    // frontier expansion, min-hop exact by construction, capped at 6
    // hops. The oracle replays it with a recursive CTE (UNION-dedup'd
    // (node, hop) rows, hop-capped so path multiplicity cannot blow
    // up) + a min(hop) collapse — exact integers end to end.
    Q(
      "q152_bfs_hops",
      (s, d) => {
        import s.implicits._
        val edges = Tables.lineitem(s, d)
          .select(($"l_suppkey" * 2).as("sa"), ($"l_partkey" * 2 + 1).as("pb"))
          .distinct()
        graft.operators.Graph.bfsHops(edges, $"sa", $"pb", source = 0L, maxHops = 6)
          .select(
            when($"node" % 2 === 0, "s").otherwise("p").as("node_kind"),
            expr("node div 2").as("key"),
            $"hop".cast("int").as("hop"))
          .orderBy($"node_kind", $"key")
      },
      Some("""WITH RECURSIVE ed AS MATERIALIZED (
             |  SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b FROM lineitem
             |  UNION SELECT DISTINCT l_partkey * 2 + 1, l_suppkey * 2 FROM lineitem),
             |bfs AS (
             |  SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
             |  UNION
             |  SELECT ed.b AS node, bfs.hop + 1 AS hop
             |  FROM bfs JOIN ed ON bfs.node = ed.a WHERE bfs.hop < 6),
             |mh AS (SELECT node, min(hop) AS hop FROM bfs GROUP BY node)
             |SELECT CASE WHEN node % 2 = 0 THEN 's' ELSE 'p' END AS node_kind,
             |  node // 2 AS key, CAST(hop AS INT) AS hop
             |FROM mh ORDER BY node_kind, key""".stripMargin)),

    // ---- q153: UPDATE-mode streaming aggregation — the output-mode
    // triple completed (q19 complete, q116 append): each micro-batch
    // emits ONLY the groups it changed, carrying their new cumulative
    // values. Three explicit-boundary time slices arrive as ordered
    // batches (the q102 staging), so the full update history is
    // deterministic: for each slice, the types present in it emit
    // their running count/sum — exactly what the oracle unions
    // together. Exact decimal sums → double.
    Q(
      "q153_update_mode_agg",
      (s, d) => updateModeAgg(s, d),
      Some("""WITH b1 AS (SELECT event_type, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events WHERE ts < TIMESTAMP '2024-01-11' GROUP BY 1),
             |b2 AS (SELECT event_type, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events WHERE ts < TIMESTAMP '2024-01-21'
             |    AND event_type IN (SELECT DISTINCT event_type FROM events
             |      WHERE ts >= TIMESTAMP '2024-01-11' AND ts < TIMESTAMP '2024-01-21')
             |  GROUP BY 1),
             |b3 AS (SELECT event_type, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events
             |  WHERE event_type IN (SELECT DISTINCT event_type FROM events
             |      WHERE ts >= TIMESTAMP '2024-01-21')
             |  GROUP BY 1)
             |SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3
             |ORDER BY event_type, n_events""".stripMargin)))

  val evalQueries: Seq[Q] = Seq(

    // ---- q155: KWIC snippet extraction (keyword-in-context) — for
    // every document containing the query term, the ±3-token window
    // around its FIRST occurrence: the retrieval-display/concordance
    // primitive next to q57's ranking and q140's keywords. Pure
    // map-side array arithmetic (position + slice + join), exact
    // strings — hash oracle.
    Q(
      "q155_kwic_snippets",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select($"doc_id", coalesce(TextAnalysis.tokens($"text"), array()).as("toks"))
          .withColumn("p", array_position($"toks", "data"))
          .filter($"p" > 0)
        toks.select(
          $"doc_id",
          $"p".cast("long").as("pos"),
          concat_ws(" ",
            slice($"toks", greatest(lit(1), $"p" - 3).cast("int"),
              ($"p" - greatest(lit(1), $"p" - 3) + 3 + 1).cast("int"))).as("snippet"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
              |m AS (SELECT doc_id, toks, list_position(toks, 'data') AS p FROM t
              |  WHERE list_position(toks, 'data') IS NOT NULL
              |    AND list_position(toks, 'data') > 0)
              |SELECT doc_id, CAST(p AS BIGINT) AS pos,
              |  array_to_string(toks[greatest(1, p - 3):least(len(toks), p + 3)], ' ') AS snippet
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- q156: in-engine CLASSIFIER EVALUATION — leave-one-out 5-NN
    // majority-vote prediction of each embedding's label (exact
    // brute-force neighbors: cosines are bit-equal, so neighbor sets
    // and votes replay exactly; ties → smallest label), then the full
    // per-class confusion summary: support, predicted count, true
    // positives, precision, recall, F1 — all exact integer counts and
    // exact divisions. The evaluation half of the ML pipeline (q96
    // trains, q139 fits, this MEASURES) with a hash-match oracle.
    Q(
      "q156_knn_eval",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val labels = emb.select($"vec_id", $"label")
        val neighbors = Similarity.bruteForceTopK(
          emb, emb, $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5)
        val votes = neighbors
          .join(labels.withColumnRenamed("vec_id", "corpus_id"), "corpus_id")
          .groupBy($"query_id", $"label").agg(count(lit(1)).as("n"))
        val wv = Window.partitionBy("query_id").orderBy($"n".desc, $"label")
        val pred = votes.withColumn("rn", row_number().over(wv)).filter($"rn" === 1)
          .select($"query_id".as("vec_id"), $"label".as("pred"))
        val joined = pred.join(labels, "vec_id")
        val perTrue = joined.groupBy($"label")
          .agg(count(lit(1)).as("support"),
            sum(when($"pred" === $"label", 1L).otherwise(0L)).as("tp"))
        val perPred = joined.groupBy($"pred")
          .agg(count(lit(1)).as("predicted"))
        perTrue.join(perPred, $"label" === $"pred", "left")
          .select($"label",
            $"support", coalesce($"predicted", lit(0L)).as("predicted"), $"tp",
            ($"tp".cast("double") / coalesce($"predicted", lit(0L)).cast("double"))
              .as("precision"),
            ($"tp".cast("double") / $"support".cast("double")).as("recall"))
          .withColumn("f1",
            when($"tp" === 0, lit(0.0)).otherwise(
              lit(2.0) * $"precision" * $"recall" / ($"precision" + $"recall")))
          .orderBy($"label")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
             |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS corpus_id, b.label,
             |    list_dot_product(a.v, b.v)
             |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
             |  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
             |nn AS (SELECT query_id, label FROM (
             |    SELECT query_id, label,
             |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
             |    FROM scored) WHERE rank <= 5),
             |votes AS (SELECT query_id, label, count(*) AS n FROM nn GROUP BY 1, 2),
             |pred AS (SELECT query_id AS vec_id, label AS pred FROM (
             |    SELECT query_id, label,
             |      row_number() OVER (PARTITION BY query_id ORDER BY n DESC, label) AS rn
             |    FROM votes) WHERE rn = 1),
             |j AS (SELECT p.vec_id, p.pred, e.label FROM pred p JOIN e USING (vec_id)),
             |pt AS (SELECT label, count(*) AS support,
             |    sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS tp
             |  FROM j GROUP BY 1),
             |pp AS (SELECT pred, count(*) AS predicted FROM j GROUP BY 1),
             |x AS (SELECT pt.label, CAST(pt.support AS BIGINT) AS support,
             |    CAST(coalesce(pp.predicted, 0) AS BIGINT) AS predicted,
             |    CAST(pt.tp AS BIGINT) AS tp,
             |    CAST(pt.tp AS DOUBLE) / CAST(coalesce(pp.predicted, 0) AS DOUBLE) AS precision,
             |    CAST(pt.tp AS DOUBLE) / CAST(pt.support AS DOUBLE) AS recall
             |  FROM pt LEFT JOIN pp ON pt.label = pp.pred)
             |SELECT label, support, predicted, tp, precision, recall,
             |  CASE WHEN tp = 0 THEN 0.0
             |       ELSE 2.0 * precision * recall / (precision + recall) END AS f1
             |FROM x ORDER BY label""".stripMargin)),

    // ---- q157: PEAK CONCURRENCY — the sweep-line maximum of
    // simultaneously-open sessions (capacity planning's first
    // question). Sessions from the real sessionizer become ±1 deltas
    // (+1 at start, −1 at end + 1µs: closed intervals), deltas net
    // per distinct timestamp (tie order becomes irrelevant), and the
    // running sum uses the two-phase geometry a THIRD way (q141's CDF,
    // q145's CUSUM, now interval concurrency): calendar-day buckets,
    // driver prefix offsets, day-bounded cumulative windows — no
    // global-order single-reducer window over the delta stream. Exact
    // integers end to end; argmax time ties to the earliest.
    Q(
      "q157_peak_concurrency",
      (s, d) => {
        import s.implicits._
        val sessions = graft.streaming.Sessionize.batch(
          Tables.events(s, d).filter($"user_id".isNotNull), gapMinutes = 30)
        val deltas = sessions
          .select(unix_micros($"session_start").as("t"), lit(1L).as("dl"))
          .unionByName(sessions
            .select((unix_micros($"session_end") + 1).as("t"), lit(-1L).as("dl")))
          .groupBy($"t").agg(sum($"dl").as("delta"))
          .withColumn("day", floor($"t".cast("double") / 86400000000.0).cast("long"))
        // Per-day prefix offsets as a TINY (day, off) frame: one row per
        // calendar day, so a single-partition prefix window over it is
        // calendar-bounded (≤ a few thousand rows for multi-year data),
        // then BROADCAST-joined back to the delta stream. This replaces
        // an earlier per-day literal `when`-chain that grew one nested
        // `If` per distinct day — Catalyst analysis would degrade at
        // multi-year scale long before the data did.
        val perDay = deltas.groupBy($"day").agg(sum($"delta").as("dsum"))
        val wOff = Window.partitionBy(lit(0)).orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offDf = perDay.coalesce(1)
          .withColumn("off", coalesce(sum($"dsum").over(wOff), lit(0L)))
          .select($"day", $"off")
        val wCum = Window.partitionBy("day").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val conc = deltas
          .join(broadcast(offDf), "day")
          .withColumn("c", sum($"delta").over(wCum) + $"off")
        // argmax via partial-aggregable struct-max (ties → earliest t),
        // not a global-order window over the delta stream
        conc.agg(max(struct($"c", (-$"t").as("negt"))).as("b"))
          .select($"b.c".as("max_concurrency"), (-$"b.negt").as("at_time_us"))
          .crossJoin(sessions.agg(count(lit(1)).as("n_sessions")))
      },
      Some("""WITH e AS (SELECT user_id, ts, value FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |b AS (SELECT user_id, epoch_us(ts) AS t, value,
             |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
             |          OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
             |sn AS (SELECT user_id, t,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY t, value
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM b),
             |sess AS (SELECT user_id, min(t) AS ss, max(t) AS se
             |  FROM sn GROUP BY user_id, sid),
             |dl AS (SELECT ss AS t, 1 AS delta FROM sess
             |  UNION ALL SELECT se + 1, -1 FROM sess),
             |net AS (SELECT t, sum(delta) AS delta FROM dl GROUP BY t),
             |cum AS (SELECT t, sum(delta) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM net),
             |pk AS (SELECT c, t, row_number() OVER (ORDER BY c DESC, t) AS rn FROM cum)
             |SELECT CAST(c AS BIGINT) AS max_concurrency, t AS at_time_us,
             |  (SELECT count(*) FROM sess) AS n_sessions
             |FROM pk WHERE rn = 1""".stripMargin)))

  val monitorQueries: Seq[Q] = Seq(

    // ---- q158: STREAMING DRIFT MONITOR — live data-quality watch:
    // each micro-batch contributes one bounded histogram-state pass
    // (the q135 states; driver keeps ≤ bins longs per slice), and at
    // end-of-stream PSI runs between the FIRST batch's value
    // distribution (the reference) and the LAST batch's (current) —
    // the q125 drift metric maintained incrementally instead of by
    // rescanning history. Bin counts replay exactly (explicit slice
    // boundaries, exact bin arithmetic); only ln() is engine-local, so
    // the oracle recomputes every per-bin PSI term and admits rows
    // within 1e-9 (poison otherwise). Bins where either side is empty
    // carry a NULL psi_term (the zero-mass case PSI cannot score —
    // q125's loudness relaxed to explicit nulls here because sparse
    // histogram tails are EXPECTED, not data corruption).
    Q(
      "q158_streaming_drift_monitor",
      (s, d) => streamingDriftMonitor(s, d),
      Some("""WITH ref AS (SELECT LEAST(63, GREATEST(0,
             |      CAST(floor((value - 0.0) / 10.0) AS BIGINT))) AS bin, count(*) AS n
             |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
             |    AND ts < TIMESTAMP '2024-01-11' GROUP BY 1),
             |cur AS (SELECT LEAST(63, GREATEST(0,
             |      CAST(floor((value - 0.0) / 10.0) AS BIGINT))) AS bin, count(*) AS n
             |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
             |    AND ts >= TIMESTAMP '2024-01-21' GROUP BY 1),
             |tot AS (SELECT (SELECT sum(n) FROM ref) AS tr, (SELECT sum(n) FROM cur) AS tc),
             |bins AS (SELECT b.bin,
             |    coalesce(r.n, 0) AS n_ref, coalesce(c.n, 0) AS n_cur
             |  FROM (SELECT DISTINCT bin FROM (SELECT bin FROM ref UNION ALL SELECT bin FROM cur)) b
             |  LEFT JOIN ref r USING (bin) LEFT JOIN cur c USING (bin)),
             |x AS (SELECT bin, n_ref, n_cur,
             |    CASE WHEN n_ref > 0 AND n_cur > 0 THEN
             |      (CAST(n_cur AS DOUBLE) / tot.tc - CAST(n_ref AS DOUBLE) / tot.tr)
             |        * ln((CAST(n_cur AS DOUBLE) / tot.tc) / (CAST(n_ref AS DOUBLE) / tot.tr))
             |    END AS psi_term
             |  FROM bins CROSS JOIN tot),
             |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q158_streaming_drift_monitor/*.parquet')),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM x)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.bin NOT IN (SELECT bin FROM x))
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN x USING (bin)
             |      WHERE e.n_ref <> x.n_ref OR e.n_cur <> x.n_cur
             |         OR (e.psi_term IS NULL) <> (x.psi_term IS NULL)
             |         OR (e.psi_term IS NOT NULL AND abs(e.psi_term - x.psi_term) > 1e-9))
             |  ) AS ok)
             |SELECT bin, n_ref, n_cur, psi_term FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE)
             |  WHERE NOT (SELECT ok FROM flag)
             |ORDER BY bin""".stripMargin)),

    // ---- q159: GOLDEN-RECORD survivorship (Cdc.goldenRecord) — the
    // master-data merge after entity resolution: per user, each
    // attribute independently from the NEWEST observation where it is
    // non-null. `last_purchase_value` is null on every non-purchase
    // event, so the null-skipping path genuinely bites (a later click
    // never erases an earlier purchase amount); one partial-aggregable
    // struct-max per field, no per-key window. Exact oracle via
    // arg-max window replay.
    Q(
      "q159_golden_record",
      (s, d) => {
        import s.implicits._
        graft.operators.Cdc.goldenRecord(
          Tables.events(s, d).filter($"user_id".isNotNull && $"ts".isNotNull),
          key = $"user_id",
          version = unix_micros($"ts"),
          tieBreak = $"event_id",
          fields = Seq(
            "last_event_type" -> $"event_type",
            "last_purchase_value" ->
              when($"event_type" === "purchase", $"value"),
            "last_error_us" ->
              when($"event_type" === "error", unix_micros($"ts"))))
          .orderBy($"key")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS v, event_id AS t,
             |    event_type,
             |    CASE WHEN event_type = 'purchase' THEN value END AS pv,
             |    CASE WHEN event_type = 'error' THEN epoch_us(ts) END AS ev
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |n AS (SELECT user_id, count(*) AS n_obs FROM e GROUP BY 1),
             |a AS (SELECT user_id, event_type FROM (
             |    SELECT user_id, event_type,
             |      row_number() OVER (PARTITION BY user_id ORDER BY v DESC, t DESC) AS rn
             |    FROM e WHERE event_type IS NOT NULL) WHERE rn = 1),
             |b AS (SELECT user_id, pv FROM (
             |    SELECT user_id, pv,
             |      row_number() OVER (PARTITION BY user_id ORDER BY v DESC, t DESC) AS rn
             |    FROM e WHERE pv IS NOT NULL) WHERE rn = 1),
             |c AS (SELECT user_id, ev FROM (
             |    SELECT user_id, ev,
             |      row_number() OVER (PARTITION BY user_id ORDER BY v DESC, t DESC) AS rn
             |    FROM e WHERE ev IS NOT NULL) WHERE rn = 1)
             |SELECT n.user_id AS key, n.n_obs,
             |  a.event_type AS last_event_type,
             |  b.pv AS last_purchase_value,
             |  c.ev AS last_error_us
             |FROM n LEFT JOIN a USING (user_id) LEFT JOIN b USING (user_id)
             |  LEFT JOIN c USING (user_id)
             |ORDER BY key""".stripMargin)))

  /** q158: the live run — three explicit-boundary slices (q153's
    * staging), per-batch histogram states collected into a driver
    * map keyed by batch id (≤ 64 longs each), PSI computed once at
    * end-of-stream between batch 0 and batch 2.
    */
  private def streamingDriftMonitor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q158_drift")
    try {
      val ev = Tables.events(s, d)
        .select($"ts", $"value").filter($"ts".isNotNull && $"value".isNotNull)
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1), "00_a"),
        (ev.filter($"ts" >= c1 && $"ts" < c2), "01_b"),
        (ev.filter($"ts" >= c2), "02_c")))
      val schema = s.read.parquet(inDir.toString).schema
      val hists = scala.collection.mutable.Map.empty[Long, Array[Long]]
      val lock = new Object
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            // bounded: <= 64 fixed histogram bins per batch
            val rows = Sketches.histogramBins(
              batch, Seq.empty, col("value"), lo = 0.0, hi = 640.0, bins = 64)
              .collect()
            lock.synchronized {
              val h = hists.getOrElseUpdate(id, new Array[Long](64))
              rows.foreach(r => h(r.getLong(0).toInt) += r.getLong(1))
            }
        }
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(600000),
        "q158 stream did not terminate within 600s — refusing a partial monitor")
      finally q.stop()
      val (ref, cur) = lock.synchronized {
        require(hists.size >= 3,
          s"q158 saw ${hists.size} data micro-batch(es); the drift monitor " +
            "needs the reference and current slices as separate batches")
        (hists(hists.keys.min), hists(hists.keys.max))
      }
      val tr = ref.sum.toDouble
      val tc = cur.sum.toDouble
      val rows = (0 until 64).flatMap { b =>
        val (nr, nc) = (ref(b), cur(b))
        if (nr == 0 && nc == 0) None
        else Some((b.toLong, nr, nc,
          if (nr > 0 && nc > 0) Some((nc / tc - nr / tr) * math.log((nc / tc) / (nr / tr)))
          else None))
      }
      rows.toDF("bin", "n_ref", "n_cur", "psi_term").orderBy($"bin")
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q153: the live update-mode run — three explicit-boundary slices
    * staged with ascending mtimes (`maxFilesPerTrigger=1` → 3 data
    * batches, enforced), an unwatermarked groupBy aggregation in
    * UPDATE output mode, memory sink accumulating every per-batch
    * emission: the final table IS the update history.
    */
  private def updateModeAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q153_upd")
    try {
      val ev = Tables.events(s, d)
        .select($"event_type", $"ts", $"value").filter($"ts".isNotNull)
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1), "00_a"),
        (ev.filter($"ts" >= c1 && $"ts" < c2), "01_b"),
        (ev.filter($"ts" >= c2), "02_c")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q153_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,6)")).cast("double").as("total_value"))
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q153 stream did not terminate within 600s — refusing a partial history")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 3,
          s"q153 ran $dataBatches data micro-batch(es); the update-history " +
            "shape needs all 3 slices as separate batches")
        s.table(name)
          .select($"event_type", $"n_events", $"total_value")
          .orderBy($"event_type", $"n_events")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q148: the live incremental-PCA run — 4-file embedding stream,
    * `maxFilesPerTrigger=1` (≥ 2 micro-batches enforced), per-batch
    * co-moment passes merged element-wise under a lock (one
    * 2 145-double array of driver state), eigensolve once at the end.
    */
  private def streamingPca(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = 64
    val topK = 4
    val scratch = Scratch.tempDir("q148_spca")
    try {
      val inDir = scratch.resolve("input").toString
      Tables.embeddings(s, d).select($"vec_id", $"embedding")
        .repartition(4).write.parquet(inDir)
      val schema = s.read.parquet(inDir).schema
      val len = 1 + dim + dim * (dim + 1) / 2
      val merged = new Array[Double](len)
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      val lock = new Object
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val sums = graft.operators.Pca.sumsOf(batch, col("embedding"), dim)
            lock.synchronized {
              var i = 0
              while (i < len) { merged(i) += sums(i); i += 1 }
            }
            nBatches.incrementAndGet(): Unit
        }
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(600000),
        "q148 stream did not terminate within 600s — refusing a partial model")
      finally q.stop()
      require(nBatches.get() >= 2,
        s"q148 ran ${nBatches.get()} micro-batch(es); the incremental-merge " +
          "path needs at least 2")
      val model = lock.synchronized(
        graft.operators.Pca.modelFromSums(merged.clone(), dim, topK))
      val rows =
        model.eigvals.zipWithIndex.map { case (l, k) => ("eigval", k, -1, l) } ++
          (for (k <- 0 until topK; j <- 0 until dim)
            yield ("eigvec", k, j, model.eigvecs(k)(j)))
      rows.toSeq.toDF("part", "k", "j", "value").orderBy($"part", $"k", $"j")
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q136: the live incremental-KMV run. 4-file event projection,
    * `maxFilesPerTrigger=1` forcing ≥ 2 micro-batches (enforced), each
    * batch's bounded states merged driver-side under a lock — the
    * constant-memory streaming-distinct maintenance loop.
    */
  private def streamingKmv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 32
    val scratch = Scratch.tempDir("q136_kmv")
    try {
      val inDir = scratch.resolve("input").toString
      Tables.events(s, d)
        .filter($"user_id".isNotNull && $"event_type".isNotNull)
        .select($"user_id", $"event_type")
        .repartition(4).write.parquet(inDir)
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_type", StringType)))
      val merged = scala.collection.mutable.Map.empty[String, Seq[Long]]
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      val lock = new Object
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            // bounded: k-sized KMV sketch rows per event type
            val rows = KmvSketch.sketch(batch, Seq("event_type"), col("user_id"), k).collect()
            lock.synchronized {
              rows.foreach { r =>
                val t = r.getString(0)
                merged(t) = KmvSketch.mergeSorted(
                  merged.getOrElse(t, Seq.empty), r.getSeq[Long](1), k)
              }
            }
            nBatches.incrementAndGet(): Unit
        }
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(600000),
        "q136 stream did not terminate within 600s — refusing a partial sketch")
      finally q.stop()
      require(nBatches.get() >= 2,
        s"q136 ran ${nBatches.get()} micro-batch(es); the incremental-merge " +
          "path needs at least 2")
      lock.synchronized(merged.toSeq).toDF("event_type", "kmv")
        .select($"event_type", size($"kmv").as("state_size"),
          KmvSketch.estimate($"kmv", k).as("est_users"))
        .orderBy($"event_type")
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q132 (leftOuter) / q147 (fullOuter): the live outer-join runs —
    * q92's staging (two file streams, `maxFilesPerTrigger=1` forcing
    * ≥2 micro-batches each, 2-hour watermarks over a ±1-hour
    * interval) with outer semantics: an unmatched row surfaces as a
    * null-other-side row when the final watermark passes its last
    * possible match time (a.ts + 1h for errors; b.ts + 1h for clicks
    * — the interval is symmetric). AvailableNow runs a trailing
    * no-data batch (noDataMicroBatches default), so end-of-stream
    * outer emission is deterministic — and everything within one
    * watermark of the stream tail stays withheld, exactly what the
    * oracles re-derive.
    */
  private def streamingOuterIntervalJoin(
      s: SparkSession, d: String, joinType: String, tag: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val scratch = Scratch.tempDir(tag)
    try {
      def stage(tpe: String, dir: String): Unit =
        Tables.events(s, d).filter($"event_type" === tpe)
          .select($"event_id", $"user_id", $"ts")
          .repartition(2).write.parquet(dir)
      val errDir = scratch.resolve("err").toString
      val clkDir = scratch.resolve("clk").toString
      stage("error", errDir)
      stage("click", clkDir)
      val schema = s.read.parquet(errDir).schema
      val a = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(errDir).withWatermark("ts", "2 hours").alias("a")
      val b = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(clkDir).withWatermark("ts", "2 hours").alias("b")
      val joined = a.join(b,
        expr("""a.user_id = b.user_id AND
                b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR"""),
        joinType)
        .select(col("a.event_id").as("error_event_id"),
          col("b.event_id").as("click_event_id"))
      val name = tag + "_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = joined.writeStream.outputMode("append")
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          s"$tag stream did not terminate within 600s — refusing a partial result")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 2,
          s"$tag ran $dataBatches data micro-batch(es); the incremental " +
            "stream-stream state path needs at least 2")
        s.table(name)
          .select($"error_event_id", $"click_event_id")
          .orderBy($"error_event_id", $"click_event_id")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }
}

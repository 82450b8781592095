package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Graph, NaiveBayes, Profiling, Sequences}

/** Round-7 additions (q174+): k-core peeling, personalized PageRank,
  * multinomial Naive Bayes training, functional-dependency profiling,
  * sequential bigram mining, and seasonality-adjusted anomaly
  * detection — operator families the catalog did not yet cover.
  */
object ScaleOps5 {

  /** Unrolled k-core peeling oracle over the supplier→part bipartite
    * graph (the q173 edge construction): each round drops nodes whose
    * degree in the surviving subgraph is < k, then restricts edges to
    * surviving endpoints — exact integers, both engines run the same
    * FIXED number of rounds, so convergence-before-the-bound is
    * irrelevant to parity.
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val header =
      """WITH ed AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
        |    CAST(l_partkey AS BIGINT) + 1000000 AS p FROM lineitem
        |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
        |e0 AS MATERIALIZED (SELECT s AS a, p AS b FROM ed UNION ALL SELECT p, s FROM ed)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT a FROM (
         |  SELECT a, count(*) AS c FROM e${r - 1} GROUP BY a) WHERE c >= $k),
         |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN k$r x ON e.a = x.a JOIN k$r y ON e.b = y.a)""".stripMargin
    }
    (Seq(header) ++ steps).mkString(",\n") +
      s"\nSELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM e$rounds GROUP BY a ORDER BY node"
  }

  /** q175's oracle: the q89 unrolled-PageRank replay with the teleport
    * (and dangling redistribution) concentrated on the seed set, plus
    * the same 1e-9 soundness gate over the emitted result.
    */
  private def pprOracle(sources: Seq[Long], d: Double, iters: Int): String = {
    val s = sources.mkString("(", ", ", ")")
    val m = sources.size
    val header =
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
         |    CAST(l_partkey AS BIGINT) + 1000000 AS dst FROM lineitem),
         |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |od AS MATERIALIZED (SELECT src, count(*) AS od FROM e GROUP BY src),
         |r0 AS MATERIALIZED (SELECT node,
         |  CASE WHEN node IN $s THEN 1.0 / $m ELSE 0.0 END AS rank FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""dang$i AS MATERIALIZED (SELECT coalesce(sum(rank), 0) AS dang FROM r${i - 1}
         |  WHERE node NOT IN (SELECT src FROM od)),
         |r$i AS MATERIALIZED (SELECT nodes.node,
         |  $d * coalesce(c.s, 0)
         |    + CASE WHEN nodes.node IN $s
         |        THEN ((1.0 - $d) + $d * (SELECT dang FROM dang$i)) / $m
         |        ELSE 0.0 END AS rank
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rank / od.od) AS s
         |    FROM r${i - 1} p JOIN od ON od.src = p.node JOIN e ON e.src = p.node
         |    GROUP BY e.dst) c USING (node))""".stripMargin
    }
    val gate =
      s"""emitted AS (SELECT node, rank FROM read_parquet('{{OUT}}/q175_personalized_pagerank/*.parquet')),
         |flag AS (SELECT (
         |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM r$iters)
         |    AND (SELECT count(DISTINCT node) FROM emitted) = (SELECT count(*) FROM emitted)
         |    AND NOT EXISTS (SELECT 1 FROM emitted x LEFT JOIN r$iters r USING (node)
         |      WHERE r.node IS NULL OR abs(x.rank - r.rank) > 1e-9)
         |  ) AS ok)
         |SELECT node, rank FROM emitted WHERE (SELECT ok FROM flag)
         |UNION ALL
         |SELECT CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
         |  WHERE NOT (SELECT ok FROM flag)
         |ORDER BY node""".stripMargin
    (Seq(header) ++ steps ++ Seq(gate)).mkString(",\n")
  }

  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  val all: Seq[Q] = Seq(

    // ---- q174: k-CORE DECOMPOSITION — the densest-subgraph peel
    // (community cores, spam-farm detection, graph sparsification).
    // k=30 actually peels at the oracle scale (2100 nodes → a few
    // hundred survivors over 6 rounds); fixed rounds in BOTH engines
    // make the replay exact whether or not the peel has converged.
    Q(
      "q174_kcore",
      (s, d) => {
        import s.implicits._
        Graph.kCore(
          Tables.lineitem(s, d).select(
            $"l_suppkey".cast("long").as("src"),
            ($"l_partkey".cast("long") + 1000000L).as("dst")),
          $"src", $"dst", k = 30, rounds = 6)
          .orderBy($"node")
      },
      Some(kCoreOracle(k = 30, rounds = 6))),

    // ---- q175: PERSONALIZED PAGERANK — relevance to a seed set
    // (recommendation candidates, local community scoring). Teleport
    // and dangling mass go to the seeds, unreachable nodes score an
    // exact 0; the oracle unrolls the recurrence and gates at 1e-9
    // (float reductions are partition-ordered — the q89 contract).
    Q(
      "q175_personalized_pagerank",
      (s, d) => {
        import s.implicits._
        Graph.personalizedPageRank(
          Tables.lineitem(s, d).select(
            $"l_suppkey".cast("long").as("src"),
            ($"l_partkey".cast("long") + 1000000L).as("dst")),
          $"src", $"dst", sources = Seq(1L, 2L, 3L), d = 0.85, iters = 10)
          .orderBy($"node")
      },
      Some(pprOracle(Seq(1L, 2L, 3L), 0.85, 10))),

    // ---- q176: MULTINOMIAL NAIVE BAYES TRAINING — language-ID /
    // topic-routing model as pure count algebra. Every probability is
    // one correctly-rounded division of exact integers, so the model
    // table hash-matches with NO tolerance; vocab is min-count pruned
    // (no per-class top-k window), smoothing uses the unpruned V.
    Q(
      "q176_naive_bayes_train",
      (s, d) => {
        import s.implicits._
        NaiveBayes.trainMultinomial(
          Tables.documents(s, d), $"text", $"lang", minCount = 5)
          .withColumnRenamed("class", "lang")
          .orderBy($"lang", $"token")
      },
      Some(s"""WITH base AS MATERIALIZED (SELECT lang AS class, $sqlToks AS toks
              |  FROM documents),
              |tok AS MATERIALIZED (SELECT class, unnest(toks) AS token FROM base),
              |tc AS MATERIALIZED (SELECT class, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
              |vs AS (SELECT count(DISTINCT token) AS v FROM tc),
              |ct AS MATERIALIZED (SELECT class, sum(cnt) AS class_tokens FROM tc GROUP BY 1),
              |dc AS MATERIALIZED (SELECT class, count(*) AS n_docs_class FROM base GROUP BY 1),
              |nd AS (SELECT sum(n_docs_class) AS nd FROM dc)
              |SELECT tc.class AS lang, tc.token, CAST(tc.cnt AS BIGINT) AS cnt,
              |  CAST(tc.cnt + 1 AS DOUBLE) / CAST(ct.class_tokens + (SELECT v FROM vs) AS DOUBLE)
              |    AS p_smoothed,
              |  CAST(dc.n_docs_class AS BIGINT) AS n_docs_class,
              |  CAST(dc.n_docs_class AS DOUBLE) / CAST((SELECT nd FROM nd) AS DOUBLE) AS prior
              |FROM tc JOIN ct USING (class) JOIN dc USING (class)
              |WHERE tc.cnt >= 5
              |ORDER BY lang, token""".stripMargin)),

    // ---- q180: FUNCTIONAL-DEPENDENCY AUDIT — the Metanome-style
    // profiling primitive: for three candidate dependencies, how many
    // determinant values violate (map to >1 distinct dependent) and
    // the worst fan-out. One exact-distinct aggregation per FD, no
    // self-join pair expansion. n_nationkey→n_regionkey must HOLD;
    // the other two are genuinely violated in the data.
    Q(
      "q180_functional_dependencies",
      (s, d) => {
        import s.implicits._
        Profiling.functionalDependency(
            Tables.nation(s, d), "nation_to_region", $"n_nationkey", $"n_regionkey")
          .unionByName(Profiling.functionalDependency(
            Tables.orders(s, d), "cust_to_status", $"o_custkey", $"o_orderstatus"))
          .unionByName(Profiling.functionalDependency(
            Tables.lineitem(s, d), "order_to_supp", $"l_orderkey", $"l_suppkey"))
          .orderBy($"fd")
      },
      Some("""WITH f1 AS (SELECT 'nation_to_region' AS fd,
             |    CAST(count(*) AS BIGINT) AS n_lhs,
             |    CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             |    CAST(max(d) AS BIGINT) AS max_rhs_per_lhs
             |  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS d
             |    FROM nation WHERE n_nationkey IS NOT NULL GROUP BY 1)),
             |f2 AS (SELECT 'cust_to_status',
             |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(max(d) AS BIGINT)
             |  FROM (SELECT o_custkey, count(DISTINCT o_orderstatus) AS d
             |    FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1)),
             |f3 AS (SELECT 'order_to_supp',
             |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(max(d) AS BIGINT)
             |  FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS d
             |    FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1))
             |SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
             |ORDER BY fd""".stripMargin)),

    // ---- q182: SEQUENTIAL BIGRAM MINING — "what do users do next":
    // consecutive event-type pairs per user in (ts, event_id) order
    // (a deterministic total order — ties on ts are broken by the
    // unique event id), support = distinct users. The window
    // partitions by user (no global order); the pair table is bounded
    // by (#event types)² so no top-k is needed. Exact integers.
    Q(
      "q182_event_bigrams",
      (s, d) => {
        import s.implicits._
        Sequences.eventBigrams(
          Tables.events(s, d)
            .filter($"user_id".isNotNull && $"event_type".isNotNull &&
              $"ts".isNotNull),
          $"user_id", Seq($"ts", $"event_id"), $"event_type")
          .orderBy($"first_event", $"next_event")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
             |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL),
             |p AS (SELECT user_id, event_type AS first_event,
             |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS next_event
             |  FROM e)
             |SELECT first_event, next_event,
             |  CAST(count(*) AS BIGINT) AS occurrences,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_entities
             |FROM p WHERE next_event IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q183: SEASONALITY-ADJUSTED VOLUME ANOMALIES — daily counts
    // per event type vs a LEAVE-ONE-OUT same-weekday baseline (a spike
    // must not inflate its own baseline). Epoch-day integers and mod-7
    // weekdays keep both engines calendar-library-free; the baseline
    // is one exact-integer division and the flags are pure integer
    // comparisons, so the output hash-matches with no tolerance.
    Q(
      "q183_seasonal_anomaly",
      (s, d) => {
        import s.implicits._
        Profiling.seasonalAnomaly(
          Tables.events(s, d), $"event_type", $"ts")
          .orderBy($"group", $"day")
      },
      Some("""WITH daily AS MATERIALIZED (SELECT event_type AS "group",
             |    CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |d2 AS MATERIALIZED (SELECT *, day % 7 AS dow FROM daily),
             |ds AS MATERIALIZED (SELECT "group", dow,
             |    CAST(sum(n) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
             |  FROM d2 GROUP BY 1, 2)
             |SELECT d2."group", d2.day, d2.dow, d2.n,
             |  CASE WHEN ds.c - 1 > 0
             |    THEN CAST(ds.s - d2.n AS DOUBLE) / CAST(ds.c - 1 AS DOUBLE) END AS baseline,
             |  (ds.c - 1 > 0 AND 2 * (ds.c - 1) * d2.n > 3 * (ds.s - d2.n)) AS is_high,
             |  (ds.c - 1 > 0 AND 2 * (ds.c - 1) * d2.n < (ds.s - d2.n)) AS is_low
             |FROM d2 JOIN ds USING ("group", dow)
             |ORDER BY d2."group", d2.day""".stripMargin)),

    // ---- q177: EXACT DISTRIBUTED QUANTILES — the selection problem
    // (exact p50/p90/p99 without a global sort): iterative bin-count
    // refinement, bin-id-predicate recursion (count and filter share
    // the identical expression, so edge rounding cannot desync rank),
    // bounded per-value finish. Selection returns an EXISTING value →
    // bit-exact hash match; k = ceil(q·N) computed in DOUBLE on both
    // sides (a decimal q·N would ceil differently — the q167 literal
    // lesson applied to ranks).
    Q(
      "q177_exact_quantiles",
      (s, d) => {
        import s.implicits._
        graft.operators.ExactQuantile.selectQuantiles(
          Tables.events(s, d), $"value", qs = Seq(0.5, 0.9, 0.99))
          .orderBy($"q")
      },
      Some("""WITH v AS MATERIALIZED (SELECT value AS v FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value)),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
             |r AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
             |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES ('0.5'), ('0.9'), ('0.99')) t(q)),
             |ks AS (SELECT q, greatest(1, CAST(ceil(q * (SELECT n FROM n)) AS BIGINT)) AS k FROM qs)
             |SELECT ks.q, ks.k, r.v AS value FROM ks JOIN r ON r.rn = ks.k
             |ORDER BY ks.q""".stripMargin)),

    // ---- q178: OUT-OF-FOLD TARGET ENCODING — leakage-free
    // categorical encoding for training: each (event_type, fold)
    // cell's conversion rate comes from the OTHER folds' counts.
    // Folds are the portable md5 hash of user_id; all arithmetic is
    // exact-integer + one division → hash match, no tolerance.
    Q(
      "q178_target_encoding_oof",
      (s, d) => {
        import s.implicits._
        graft.operators.Encoding.targetEncodeOof(
          Tables.events(s, d).filter($"user_id".isNotNull),
          $"event_type", $"user_id",
          coalesce($"value" > 50.0, lit(false)), folds = 4)
          .orderBy($"category", $"fold")
      },
      Some(s"""WITH cell AS MATERIALIZED (SELECT event_type AS category,
              |    ${graft.operators.KmvSketch.hash60Sql("user_id")} % 4 AS fold,
              |    CAST(count(*) AS BIGINT) AS n_fold,
              |    CAST(sum(CASE WHEN coalesce(value > 50.0, false) THEN 1 ELSE 0 END) AS BIGINT)
              |      AS pos_fold
              |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
              |  GROUP BY 1, 2),
              |tot AS MATERIALIZED (SELECT category,
              |    CAST(sum(n_fold) AS BIGINT) AS n_total,
              |    CAST(sum(pos_fold) AS BIGINT) AS pos_total
              |  FROM cell GROUP BY 1)
              |SELECT c.category, c.fold, c.n_fold, c.pos_fold,
              |  t.n_total - c.n_fold AS n_oof,
              |  t.pos_total - c.pos_fold AS pos_oof,
              |  CASE WHEN t.n_total - c.n_fold > 0
              |    THEN CAST(t.pos_total - c.pos_fold AS DOUBLE)
              |      / CAST(t.n_total - c.n_fold AS DOUBLE) END AS encoding
              |FROM cell c JOIN tot t USING (category)
              |ORDER BY c.category, c.fold""".stripMargin)),

    // ---- q179: DETERMINISTIC NEGATIVE SAMPLING — contrastive-pair
    // negatives as a broadcast join against per-cell canonical
    // representatives (no per-row random corpus access, no resampling
    // loop); md5-hash cells make every pair exactly replayable.
    Q(
      "q179_negative_sampling",
      (s, d) => {
        import s.implicits._
        graft.operators.Contrastive.negativeSample(
          Tables.documents(s, d), $"doc_id", k = 3, buckets = 64)
          .orderBy($"doc_id", $"draw")
      },
      Some(s"""WITH base AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS doc_id,
              |    ${graft.operators.KmvSketch.hash60Sql("doc_id")} AS h,
              |    ${graft.operators.KmvSketch.hash60Sql("doc_id")} % 64 AS cell
              |  FROM documents),
              |rk AS MATERIALIZED (SELECT cell, doc_id,
              |    row_number() OVER (PARTITION BY cell ORDER BY h, doc_id) AS rn
              |  FROM base),
              |reps AS MATERIALIZED (SELECT r1.cell, r1.doc_id AS rep1, r2.doc_id AS rep2
              |  FROM (SELECT cell, doc_id FROM rk WHERE rn = 1) r1
              |  LEFT JOIN (SELECT cell, doc_id FROM rk WHERE rn = 2) r2 USING (cell)),
              |draws AS (SELECT b.doc_id, d.draw,
              |    ${graft.operators.KmvSketch.hash60Sql(
                     "(CAST(b.doc_id AS VARCHAR) || '#' || CAST(d.draw AS VARCHAR))")} % 64
              |      AS tcell
              |  FROM base b CROSS JOIN (VALUES (1), (2), (3)) d(draw))
              |SELECT doc_id, draw, neg_id FROM (
              |  SELECT dr.doc_id, dr.draw,
              |    CASE WHEN r.rep1 <> dr.doc_id THEN r.rep1 ELSE r.rep2 END AS neg_id
              |  FROM draws dr LEFT JOIN reps r ON r.cell = dr.tcell)
              |WHERE neg_id IS NOT NULL
              |ORDER BY doc_id, draw""".stripMargin)),

    // ---- q184: INVERTED-INDEX POSTING STATS — index construction
    // measured by its verifiable aggregate: per term df/cf/max-tf and
    // the argmax document (partial-aggregable struct-max, no window).
    // Exact integers; minDf is a map-side vocab floor, not a top-k.
    Q(
      "q184_posting_stats",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.postingStats(
          Tables.documents(s, d), $"text", $"doc_id", minDf = 5)
          .orderBy($"term")
      },
      Some(s"""WITH tok AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS doc_id,
              |    unnest($sqlToks) AS term FROM documents),
              |tf AS MATERIALIZED (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              |  FROM tok GROUP BY 1, 2)
              |SELECT term, CAST(count(*) AS BIGINT) AS df,
              |  CAST(sum(tf) AS BIGINT) AS cf,
              |  CAST(max(tf) AS BIGINT) AS max_tf,
              |  CAST((SELECT t2.doc_id FROM tf t2 WHERE t2.term = tf.term
              |    ORDER BY t2.tf DESC, t2.doc_id LIMIT 1) AS BIGINT) AS top_doc_id
              |FROM tf GROUP BY term HAVING count(*) >= 5
              |ORDER BY term""".stripMargin)),

    // ---- q185: HOLT LINEAR TREND — double exponential smoothing
    // (level + trend) per user over daily purchase sums, the
    // capacity-forecasting recurrence folded inside ONE aggregate HOF
    // per key (q119's EMA geometry with a 2-element accumulator).
    // Dyadic α/β; the oracle replays the identical op order via
    // list_reduce over [vd, 0.0] pairs and gates at 1e-9 (the daily
    // decimal→double cast is the engine-specific ulp — q119).
    Q(
      "q185_holt_trend",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.holtLinear(
          Tables.events(s, d).filter($"event_type" === "purchase"),
          $"user_id", $"ts", $"value", periodSeconds = 86400L,
          alpha = 0.25, beta = 0.125)
          .orderBy($"key")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q185_holt_trend/*.parquet')),
             |o AS (SELECT user_id AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vd
             |  FROM events
             |  WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
             |    AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |se AS (SELECT k, count(*) AS n, max(period) AS lastp,
             |    list([vd, CAST('0' AS DOUBLE)] ORDER BY period) AS l
             |  FROM o GROUP BY k),
             |ex AS (SELECT k, n, lastp,
             |    list_reduce(l, (acc, x) ->
             |      [CAST('0.25' AS DOUBLE) * x[1] + CAST('0.75' AS DOUBLE) * (acc[1] + acc[2]),
             |       CAST('0.125' AS DOUBLE) * ((CAST('0.25' AS DOUBLE) * x[1]
             |           + CAST('0.75' AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
             |         + CAST('0.875' AS DOUBLE) * acc[2]]) AS st
             |  FROM se),
             |expect AS (SELECT k, n, lastp, st[1] AS level, st[2] AS trend,
             |    st[1] + st[2] AS fc FROM ex),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT key) FROM emitted) = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.key = x.k
             |      WHERE e.n_periods <> x.n OR e.last_period <> x.lastp
             |         OR abs(e.level - x.level) > 1e-9 OR abs(e.trend - x.trend) > 1e-9
             |         OR abs(e.forecast_next - x.fc) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.key NOT IN (SELECT k FROM expect))
             |  ) AS ok)
             |SELECT key, n_periods, last_period, level, trend, forecast_next
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY key""".stripMargin)),

    // ---- q186: EQUAL-FREQUENCY BINNING — feature-engineering quartile
    // cuts from the EXACT q177 cutpoints (selection, not interpolation),
    // bin = count of cutpoints strictly below the value (ties land low,
    // deterministically). Everything exact → hash match.
    Q(
      "q186_equal_frequency_bins",
      (s, d) => {
        import s.implicits._
        graft.operators.ExactQuantile.equalFrequencyBins(
          Tables.events(s, d), $"value", nBins = 4)
          .orderBy($"bin")
      },
      Some("""WITH v AS MATERIALIZED (SELECT value AS v FROM events
             |  WHERE value IS NOT NULL AND NOT isnan(value)),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
             |r AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
             |cuts AS MATERIALIZED (SELECT i, (SELECT v FROM r WHERE rn =
             |    greatest(1, CAST(ceil((CAST(i AS DOUBLE) / 4) * (SELECT n FROM n)) AS BIGINT)))
             |    AS c
             |  FROM (VALUES (1), (2), (3)) t(i)),
             |b AS (SELECT v,
             |    CAST((v > (SELECT c FROM cuts WHERE i = 1)) AS INT)
             |    + CAST((v > (SELECT c FROM cuts WHERE i = 2)) AS INT)
             |    + CAST((v > (SELECT c FROM cuts WHERE i = 3)) AS INT) AS bin
             |  FROM v)
             |SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |  min(v) AS min_v, max(v) AS max_v
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // ---- q187: GROUPED TOP-K — top 3 most-ordered parts per supplier
    // through the bounded-heap aggregator (map-side partial top-k, ≤ k
    // rows per (partition, group) cross the shuffle) instead of the
    // full-sort row_number window. Counts are exact; score is the
    // count as a double (exact below 2^53); ties break to the lower
    // part id — the oracle's row_number replays both.
    Q(
      "q187_grouped_topk",
      (s, d) => {
        import s.implicits._
        val counts = Tables.lineitem(s, d)
          .groupBy($"l_suppkey", $"l_partkey")
          .agg(count(lit(1)).as("n"))
        graft.operators.Ranking.topNPerGroup(
          counts, $"l_suppkey", $"l_partkey", $"n", k = 3)
          .orderBy($"group", $"rank")
      },
      Some("""WITH c AS MATERIALIZED (SELECT l_suppkey AS grp, l_partkey AS id,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem GROUP BY 1, 2),
             |rk AS (SELECT grp, id, n,
             |    row_number() OVER (PARTITION BY grp ORDER BY n DESC, id) AS rank
             |  FROM c)
             |SELECT grp AS "group", CAST(rank AS INT) AS rank,
             |  CAST(id AS BIGINT) AS id, CAST(n AS DOUBLE) AS score
             |FROM rk WHERE rank <= 3 ORDER BY "group", rank""".stripMargin)),

    // ---- q188: RELIABILITY DIAGRAM (calibration audit) — bucket a
    // pseudo-probability (value/1000 — inside [0,1) with headroom over every observed scale factor),
    // compare mean predicted probability to the observed purchase
    // rate per bucket. Counts and rates are exact; mean_prob pays one
    // decimal→double cast per bin → 1e-9 gate (q114/q119 pattern).
    Q(
      "q188_reliability_bins",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.reliabilityBins(
          Tables.events(s, d)
            .filter($"value".isNotNull && !isnan($"value") && $"event_type".isNotNull),
          $"value" / 1000.0, $"event_type" === "purchase", bins = 10)
          .orderBy($"bin")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q188_reliability_bins/*.parquet')),
             |b AS (SELECT least(9, CAST(floor((value / 1000.0) * 10) AS BIGINT)) AS bin,
             |    CAST(value / 1000.0 AS DECIMAL(27,12)) AS p,
             |    (event_type = 'purchase') AS y
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
             |    AND event_type IS NOT NULL),
             |expect AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS positives,
             |    CAST(sum(p) AS DOUBLE) / count(*) AS mean_prob,
             |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rate
             |  FROM b GROUP BY bin),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x USING (bin)
             |      WHERE e.n <> x.n OR e.positives <> x.positives
             |         OR abs(e.mean_prob - x.mean_prob) > 1e-9
             |         OR abs(e.rate - x.rate) > 1e-9
             |         OR abs(e.calibration_gap - (x.mean_prob - x.rate)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.bin NOT IN (SELECT bin FROM expect))
             |  ) AS ok)
             |SELECT bin, n, positives, mean_prob, rate, calibration_gap
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY bin""".stripMargin)),

    // ---- q189: INCREMENTAL AGGREGATE MAINTENANCE — the materialized-
    // view pattern: merge a pre-cutoff per-user snapshot aggregate
    // with the post-cutoff delta aggregate, never rescanning history.
    // Sums stay DECIMAL through the merge (addition is associative),
    // so the oracle — a FULL RECOMPUTE over all events — hash-matches
    // the incremental path bit-for-bit: equality of the two plans IS
    // the correctness statement.
    Q(
      "q189_incremental_agg",
      (s, d) => {
        import s.implicits._
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast("decimal(18,6)")).as("sv"))
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull && $"value".isNotNull)
        val cutoff = to_timestamp(lit("2024-01-15 00:00:00"))
        val merged = graft.operators.Incremental.mergeAdditive(
          agg(ev.filter($"ts" < cutoff)),
          agg(ev.filter($"ts" >= cutoff)),
          keys = Seq("user_id"), addCols = Seq("n_events", "sv"))
        merged.select($"user_id", $"n_events".cast("long").as("n_events"),
          $"sv".cast("double").as("total_value"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM events
             |WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- q190: NEAR-DUP CLUSTER SIZE DISTRIBUTION — the curation
    // diagnostic behind "how much of my corpus is duplicate mass":
    // the q34 connected components rolled up to a size histogram,
    // isolated documents counted as size-1 components. The oracle
    // re-derives the clustering from the exact unblocked Jaccard pair
    // set via recursive closure (the q34 contract) and histograms it
    // independently. Exact integers.
    Q(
      "q190_cluster_size_histogram",
      (s, d) => {
        import s.implicits._
        val sh = graft.operators.Dedup.hashedShingleSets(
          Tables.documents(s, d), $"text", $"doc_id", n = 3)
        val pairs = graft.operators.Dedup.ngramJaccardPairsFromHashed(sh, threshold = 0.3)
        val cl = graft.operators.Dedup.clusters(pairs)
        try {
          val sizes = cl.groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
          val hist = sizes.groupBy($"sz".as("cluster_size"))
            .agg(count(lit(1)).as("n_components"))
          val nDocs = Tables.documents(s, d).count()
          val nClustered = cl.count()
          val singletons = nDocs - nClustered
          val withSingles =
            if (singletons > 0)
              hist.unionByName(s.range(1).select(
                lit(1L).as("cluster_size"), lit(singletons).as("n_components")))
            else hist
          withSingles
            .groupBy($"cluster_size")
            .agg(sum($"n_components").as("n_components"))
            .select($"cluster_size", $"n_components",
              ($"cluster_size" * $"n_components").as("docs_in_size"))
            .orderBy($"cluster_size")
            .localCheckpoint(true)
        } finally { cl.unpersist(); () }
      },
      Some(s"""WITH RECURSIVE ${LlmOps.sqlExactJaccardCteFrom("documents")},
              |edges AS (SELECT id_a AS src, id_b AS dst FROM exact
              |  UNION SELECT id_b, id_a FROM exact),
              |reach(doc_id, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id),
              |cl AS (SELECT doc_id, min(r) AS cid FROM reach GROUP BY doc_id),
              |sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz FROM cl GROUP BY cid),
              |hist AS (SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_components
              |  FROM sizes GROUP BY sz),
              |singles AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
              |    (SELECT count(*) FROM documents) - (SELECT count(*) FROM cl)
              |      AS n_components
              |  WHERE (SELECT count(*) FROM documents) > (SELECT count(*) FROM cl)),
              |merged AS (SELECT cluster_size, CAST(sum(n_components) AS BIGINT)
              |    AS n_components
              |  FROM (SELECT * FROM hist UNION ALL SELECT * FROM singles)
              |  GROUP BY cluster_size)
              |SELECT cluster_size, n_components,
              |  cluster_size * n_components AS docs_in_size
              |FROM merged ORDER BY cluster_size""".stripMargin)),

    // ---- q191: STREAMING CEP PATTERN DETECTION — "view → click →
    // purchase within 7 days" per user through flatMapGroupsWithState
    // with a TWO-SCALAR state (stage, t0): the match-recognize
    // primitive aggregation cannot express (order-dependent, event-
    // consuming). Three time-ordered slices arrive as separate
    // micro-batches (the q153 staging contract), so detections
    // spanning batches exercise real cross-batch state. The oracle
    // replays the identical state machine as a RECURSIVE SQL
    // transition relation — a fully independent sequential re-
    // execution, exact integers.
    Q(
      "q191_streaming_pattern_match",
      (s, d) => streamingPatternDetect(s, d),
      Some(cepOracleSql)))

  /** The q191 state-machine replay — shared verbatim by
    * q203_cep_unordered ([[ScaleOps6]]): the event MULTISET is
    * identical there (only batch membership is scrambled), so the
    * sequential re-execution is the oracle for both.
    */
  // a DEF, not a val: the Q list above captures it during object
  // initialization, which runs top-to-bottom — a val declared below
  // the list would still be null at capture time
  private[queries] def cepOracleSql: String =
    ("""WITH RECURSIVE ev AS MATERIALIZED (SELECT user_id, epoch_us(ts) AS t,
             |    event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
             |sm(user_id, rn, stage, t0, es, ee) AS (
             |  SELECT DISTINCT user_id, CAST(0 AS BIGINT), 0, CAST(0 AS BIGINT),
             |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM ev
             |  UNION ALL
             |  SELECT s.user_id, e.rn,
             |    CASE WHEN x.eff = 0 AND e.event_type = 'view' THEN 1
             |         WHEN x.eff = 1 AND e.event_type = 'click' THEN 2
             |         WHEN x.eff = 2 AND e.event_type = 'purchase' THEN 0
             |         ELSE x.eff END,
             |    CASE WHEN x.eff = 0 AND e.event_type = 'view' THEN e.t ELSE s.t0 END,
             |    CASE WHEN x.eff = 2 AND e.event_type = 'purchase' THEN s.t0 END,
             |    CASE WHEN x.eff = 2 AND e.event_type = 'purchase' THEN e.t END
             |  FROM sm s
             |  JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1,
             |  LATERAL (SELECT CASE WHEN s.stage > 0 AND e.t - s.t0 > 604800000000
             |    THEN 0 ELSE s.stage END AS eff) x)
             |SELECT user_id, es AS start_us, ee AS end_us
             |FROM sm WHERE es IS NOT NULL
             |ORDER BY user_id, start_us, end_us""").stripMargin

  val streamQueries2: Seq[Q] = Seq(

    // ---- q192: STREAMING TOP-K LEADERBOARD — live "k best per group"
    // maintenance: the bounded-heap [[graft.operators.TopKByScore]]
    // aggregator runs INSIDE a streaming complete-mode aggregation, so
    // the state store holds one ≤ k-entry heap per group (not the
    // event history) and every micro-batch merges its partial heaps
    // into it — the streaming twin of q187. Three ordered slices; the
    // final complete emission is the whole-stream top-k, which the
    // oracle replays as a batch row_number ranking. Exact values,
    // deterministic (value desc, event_id asc) ties.
    Q(
      "q192_streaming_topk",
      (s, d) => streamingTopK(s, d),
      Some("""WITH e AS (SELECT event_type, value, event_id FROM events
             |  WHERE event_type IS NOT NULL AND value IS NOT NULL
             |    AND NOT isnan(value) AND event_id IS NOT NULL),
             |rk AS (SELECT event_type, value, event_id,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY value DESC, event_id) AS rank
             |  FROM e)
             |SELECT event_type, CAST(rank AS INT) AS rank,
             |  CAST(event_id AS BIGINT) AS event_id, value
             |FROM rk WHERE rank <= 5
             |ORDER BY event_type, rank""".stripMargin)),

    // ---- q193: DATASET DIGEST — order/partitioning-invariant content
    // fingerprint (reproducibility + migration parity audits): exact
    // decimal sum of per-row portable hashes over the canonical
    // rendering. Any changed row moves it; any re-ordering doesn't.
    Q(
      "q193_dataset_digest",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.datasetDigest(
          Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
      },
      Some(s"""WITH h AS (SELECT ${graft.operators.KmvSketch.hash60Sql(
                 "(coalesce(CAST(o_orderkey AS VARCHAR), '\\N') || '|' || " +
                 "coalesce(CAST(o_custkey AS VARCHAR), '\\N') || '|' || " +
                 "coalesce(CAST(o_orderstatus AS VARCHAR), '\\N') || '|' || " +
                 "coalesce(CAST(o_totalprice AS VARCHAR), '\\N'))")} AS h
              |  FROM orders)
              |SELECT CAST(count(*) AS BIGINT) AS n_rows,
              |  CAST(CAST(sum(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS digest,
              |  CAST(min(h) AS BIGINT) AS min_hash, CAST(max(h) AS BIGINT) AS max_hash
              |FROM h""".stripMargin)),

    // ---- q194: COLUMN PROFILE — the data-catalog summary: per
    // column null count, exact distinct, min/max as strings. Exact
    // integers + deterministic string renderings.
    Q(
      "q194_column_profile",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.columnProfile(
          Tables.lineitem(s, d),
          Seq("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"))
          .orderBy($"column")
      },
      Some("""WITH c1 AS (SELECT 'l_orderkey' AS "column",
             |    CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
             |    CAST(min(l_orderkey) AS VARCHAR) AS min_value,
             |    CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM lineitem),
             |c2 AS (SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT l_returnflag) AS BIGINT),
             |    CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
             |  FROM lineitem),
             |c3 AS (SELECT 'l_quantity', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT l_quantity) AS BIGINT),
             |    CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
             |  FROM lineitem),
             |c4 AS (SELECT 'l_shipdate', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT l_shipdate) AS BIGINT),
             |    CAST(strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS VARCHAR),
             |    CAST(strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS VARCHAR)
             |  FROM lineitem)
             |SELECT * FROM c1 UNION ALL SELECT * FROM c2
             |UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
             |ORDER BY "column"""".stripMargin)))

  val streamQueries3: Seq[Q] = Seq(

    // ---- q195: STREAMING DATASET DIGEST — q193's order-invariant
    // content fingerprint maintained LIVE: the digest is an algebraic
    // aggregate (count + decimal hash-sum + min/max hash), so a
    // complete-mode streaming aggregation carries four scalars of
    // state total and every micro-batch folds in map-side — continuous
    // integrity monitoring of an ingest pipeline. The final emission
    // must equal the batch digest of everything ingested, which is
    // exactly what the oracle computes.
    Q(
      "q195_streaming_digest",
      (s, d) => streamingDigest(s, d),
      Some(s"""WITH h AS (SELECT ${graft.operators.KmvSketch.hash60Sql(
                 "(coalesce(CAST(o_orderkey AS VARCHAR), '\\N') || '|' || " +
                 "coalesce(CAST(o_custkey AS VARCHAR), '\\N') || '|' || " +
                 "coalesce(CAST(o_orderstatus AS VARCHAR), '\\N') || '|' || " +
                 "coalesce(CAST(o_totalprice AS VARCHAR), '\\N'))")} AS h
              |  FROM orders)
              |SELECT CAST(count(*) AS BIGINT) AS n_rows,
              |  CAST(CAST(sum(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS digest,
              |  CAST(min(h) AS BIGINT) AS min_hash, CAST(max(h) AS BIGINT) AS max_hash
              |FROM h""".stripMargin)))

  /** q195's drive: the orders table in three ordered micro-batch
    * slices through the digest aggregation in complete mode; the last
    * emission is the whole-stream digest.
    */
  private def streamingDigest(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q195_digest")
    try {
      val o = Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      // slice by key thirds — any partition works; the digest is
      // order-invariant BY CONSTRUCTION and this proves it live
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (o.filter($"o_orderkey" % 3 === 0), "00_a"),
        (o.filter($"o_orderkey" % 3 === 1), "01_b"),
        (o.filter($"o_orderkey" % 3 === 2), "02_c")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q195_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.operators.Profiling.datasetDigest(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q195 stream did not terminate within 600s — refusing a partial digest")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 3,
          s"q195 ran $dataBatches data micro-batch(es); live maintenance needs " +
            "all 3 slices as separate batches")
        s.table(name)
          .select($"n_rows", $"digest", $"min_hash", $"max_hash")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q192's drive: complete-mode streaming aggregation with the typed
    * bounded top-k heap as the aggregate function; the memory sink's
    * final complete emission is the whole-stream answer.
    */
  private def streamingTopK(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q192_topk")
    try {
      val ev = Tables.events(s, d)
        .filter($"event_type".isNotNull && $"value".isNotNull &&
          !isnan($"value") && $"event_id".isNotNull)
        .select($"event_type", $"value", $"event_id", $"ts")
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts".isNull || $"ts" < c1), "00_a"),
        (ev.filter($"ts" >= c1 && $"ts" < c2), "01_b"),
        (ev.filter($"ts" >= c2), "02_c")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q192_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.operators.Ranking.topKStreamable(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString),
        groupCol = "event_type", scoreCol = "value", idCol = "event_id", k = 5)
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q192 stream did not terminate within 600s — refusing a partial leaderboard")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 3,
          s"q192 ran $dataBatches data micro-batch(es); heap maintenance needs " +
            "all 3 slices as separate batches")
        // complete mode: the memory sink holds the LAST emission only
        graft.operators.Ranking.explodeTopK(s.table(name), "event_id", "value")
          .select($"event_type", $"rank", $"event_id", $"value")
          .orderBy($"event_type", $"rank")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q191's drive: three explicit time slices as ordered micro-batches
    * (cross-batch in-flight state is the point) through the
    * OUT-OF-ORDER-TOLERANT event-time operator — events only need to
    * respect the watermark delay, not batch order; a fourth sentinel
    * slice (non-step type, far-future timestamp) pushes the watermark
    * past every real event so the final no-data micro-batch seals and
    * drains all state before `AvailableNow` terminates. Memory sink,
    * ≥ 3 data batches enforced.
    */
  private def streamingPatternDetect(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q191_cep")
    try {
      val ev = Tables.events(s, d)
        .filter($"user_id".isNotNull && $"ts".isNotNull && $"event_type".isNotNull)
        .select($"user_id", $"ts", $"event_type", $"event_id")
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      // sentinel: user −1 never matches (type outside the step set and
      // filtered before state); ts beyond max(ts) + window + delay so
      // even the last in-flight partial match is evicted at the flush
      val sentinel = s.range(1).select(
        lit(-1L).as("user_id"),
        lit("2099-01-01").cast("timestamp").as("ts"),
        lit("flush").as("event_type"),
        lit(-1L).as("event_id"))
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1), "00_a"),
        (ev.filter($"ts" >= c1 && $"ts" < c2), "01_b"),
        (ev.filter($"ts" >= c2), "02_c"),
        (sentinel, "03_flush")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q191_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.PatternMatch.detectEventTime(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.streaming.PatternMatch.Ev],
        steps = Seq("view", "click", "purchase"),
        windowUs = 7L * 86400L * 1000000L,
        delay = "1 second")
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q191 stream did not terminate within 600s — refusing a partial match set")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 4,
          s"q191 ran $dataBatches data micro-batch(es); cross-batch state needs " +
            "all 3 slices + the flush sentinel as separate batches")
        // the flush worked: every buffer sealed, every state removed
        val drained = q.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        require(drained.contains(0L),
          s"q191 CEP state not drained at end of stream: $drained rows")
        s.table(name)
          .select($"user_id", $"start_us", $"end_us")
          .orderBy($"user_id", $"start_us", $"end_us")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{ModelEval, Scd2, WeightedQuantile}

/** Round-8 continuation (q197+): pivot/crosstab, SCD2 dimension
  * builds, gains/lift model evaluation, grouping sets, exact weighted
  * quantiles, and 2-D histograms — classic warehouse / evaluation
  * families the catalog did not yet cover. (q196, the multi-file
  * streaming fleet, lives with the other MRF gold queries in
  * [[MrfGold]].)
  */
object ScaleOps6 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  val all: Seq[Q] = Seq(

    // ---- q197: PIVOT / CROSSTAB — the revenue matrix (nation ×
    // order priority). The value list is EXPLICIT, so the plan is one
    // wide map-side-combined aggregation with no extra distinct scan
    // (Spark's pivot without values runs a collect first — the
    // anti-pattern this entry demonstrates avoiding); at 100 TB the
    // pivot width is schema-bounded (5 columns), never data-bounded.
    Q(
      "q197_pivot_crosstab",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
          .join(Tables.nation(s, d), $"n_nationkey" === $"c_nationkey")
          .groupBy($"n_name")
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(sum(dec($"o_totalprice")).cast("decimal(18,4)").cast("double"))
          .toDF("n_name", "p1_urgent", "p2_high", "p3_medium",
            "p4_not_specified", "p5_low")
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
             |  CAST(CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS p1_urgent,
             |  CAST(CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS p2_high,
             |  CAST(CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS p3_medium,
             |  CAST(CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS p4_not_specified,
             |  CAST(CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS p5_low
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ---- q198: SCD TYPE-2 BUILD — each customer's order-priority
    // history collapsed into versioned validity intervals
    // ([[graft.operators.Scd2]]). The oracle replays the identical
    // lag-filter-lead window program.
    Q(
      "q198_scd2_priority_versions",
      (s, d) => {
        import s.implicits._
        Scd2.fromChangeLog(
          Tables.orders(s, d),
          key = $"o_custkey", ts = $"o_orderdate", tiebreak = $"o_orderkey",
          attrs = Seq("prio" -> $"o_orderpriority"))
          .orderBy($"k", $"version")
      },
      Some("""WITH obs AS (
             |  SELECT o_custkey AS k, o_orderdate AS valid_from,
             |    o_orderkey AS tb, o_orderpriority AS prio
             |  FROM orders),
             |ch AS (SELECT *,
             |    lag(prio) OVER (PARTITION BY k ORDER BY valid_from, tb) AS prev
             |  FROM obs),
             |surv AS MATERIALIZED (
             |  SELECT k, valid_from, tb, prio FROM ch
             |  WHERE prev IS NULL OR prio <> prev)
             |SELECT k, valid_from,
             |  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, tb) AS valid_to,
             |  CAST(row_number() OVER (PARTITION BY k ORDER BY valid_from, tb) AS INTEGER) AS version,
             |  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, tb) IS NULL AS is_current,
             |  prio
             |FROM surv ORDER BY k, version""".stripMargin)),

    // ---- q199: GAINS / LIFT TABLE — rank customers by a
    // deterministic hash score, label = placed an urgent order, 8
    // rank buckets via distributed exact-quantile cuts (NO global
    // ntile window — see [[graft.operators.ModelEval]]). The oracle
    // re-derives the cuts from rank positions and replays the
    // bucketing rule; lift/capture are single divisions of exact
    // integer products.
    Q(
      "q199_model_gains",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("uk")).distinct()
        val scored = Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"uk", "left")
          .select(
            pmod(graft.operators.KmvSketch.hash60($"c_custkey"), lit(1L << 48))
              .cast("double").as("s"),
            $"uk".isNotNull.cast("long").as("y"))
        ModelEval.gainsTable(scored, $"s", $"y", buckets = 8)
          .orderBy($"bucket")
      },
      Some(s"""WITH base AS MATERIALIZED (
             |  SELECT CAST(${graft.operators.KmvSketch.hash60Sql("c_custkey")} % 281474976710656 AS DOUBLE) AS s,
             |    CASE WHEN u.uk IS NOT NULL THEN 1 ELSE 0 END AS y
             |  FROM customer
             |  LEFT JOIN (SELECT DISTINCT o_custkey AS uk FROM orders
             |             WHERE o_orderpriority = '1-URGENT') u
             |    ON c_custkey = u.uk),
             |nn AS (SELECT count(*) AS n FROM base),
             |ranked AS MATERIALIZED (
             |  SELECT s, y, row_number() OVER (ORDER BY s) AS r FROM base),
             |cuts AS MATERIALIZED (
             |  SELECT r.s AS cut
             |  FROM ranked r, nn, (SELECT unnest(generate_series(1, 7)) AS i) g
             |  WHERE r.r = CAST(ceil(g.i * nn.n / 8.0) AS BIGINT)),
             |bkt AS (
             |  SELECT r.r, r.y, 8 - count(c.cut) AS bucket
             |  FROM ranked r LEFT JOIN cuts c ON c.cut < r.s
             |  GROUP BY r.r, r.y),
             |agg AS (SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
             |  FROM bkt GROUP BY 1),
             |cum AS (SELECT bucket, n, pos,
             |    CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n,
             |    CAST(sum(pos) OVER (ORDER BY bucket) AS BIGINT) AS cum_pos,
             |    CAST(sum(n) OVER () AS BIGINT) AS total_n,
             |    CAST(sum(pos) OVER () AS BIGINT) AS total_pos
             |  FROM agg)
             |SELECT CAST(bucket AS INTEGER) AS bucket, n, pos, cum_n, cum_pos,
             |  CAST(cum_pos * total_n AS DOUBLE) / (cum_n * total_pos) AS cum_lift,
             |  CAST(cum_pos AS DOUBLE) / total_pos AS cum_capture
             |FROM cum ORDER BY bucket""".stripMargin)),

    // ---- q200: GROUPING SETS — the mixed-granularity aggregate
    // (nation×status, nation, status, grand total) in ONE pass with
    // explicit grouping flags; group columns are coalesced to 'ALL'
    // so null-ordering differences between engines can't bite.
    Q(
      "q200_grouping_sets",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
          .join(Tables.nation(s, d), $"n_nationkey" === $"c_nationkey")
          .groupingSets(
            Seq(Seq($"n_name", $"o_orderstatus"), Seq($"n_name"),
              Seq($"o_orderstatus"), Seq()),
            $"n_name", $"o_orderstatus")
          .agg(
            grouping($"n_name").as("g_nation"),
            grouping($"o_orderstatus").as("g_status"),
            sum(dec($"o_totalprice")).cast("decimal(18,4)").cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .select(
            coalesce($"n_name", lit("ALL")).as("nation"),
            coalesce($"o_orderstatus", lit("ALL")).as("status"),
            $"g_nation", $"g_status", $"revenue", $"n_orders")
          .orderBy($"g_nation", $"g_status", $"nation", $"status")
      },
      Some("""SELECT coalesce(n_name, 'ALL') AS nation,
             |  coalesce(o_orderstatus, 'ALL') AS status,
             |  CAST(GROUPING(n_name) AS TINYINT) AS g_nation,
             |  CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
             |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             |  count(*) AS n_orders
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), (o_orderstatus), ())
             |ORDER BY g_nation, g_status, nation, status""".stripMargin)),

    // ---- q201: EXACT WEIGHTED MEDIAN per group — volume-weighted
    // median price per return flag ([[graft.operators
    // .WeightedQuantile]]): rational crossing test in decimal, value
    // selection, hash-exact.
    Q(
      "q201_weighted_median",
      (s, d) => {
        import s.implicits._
        WeightedQuantile.weightedQuantile(
          Tables.lineitem(s, d),
          group = $"l_returnflag", value = $"l_extendedprice",
          weight = $"l_quantity", num = 1, den = 2)
          .toDF("l_returnflag", "wmedian_price")
          .orderBy($"l_returnflag")
      },
      Some("""WITH pv AS (
             |  SELECT l_returnflag AS g, l_extendedprice AS v,
             |    sum(CAST(l_quantity AS DECIMAL(27,6))) AS w
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
             |    AND NOT isnan(l_extendedprice) AND l_quantity IS NOT NULL
             |  GROUP BY 1, 2),
             |c AS (SELECT g, v,
             |    CAST(sum(w) OVER (PARTITION BY g ORDER BY v) AS DECIMAL(30,6)) AS cw,
             |    CAST(sum(w) OVER (PARTITION BY g) AS DECIMAL(30,6)) AS tw
             |  FROM pv)
             |SELECT g AS l_returnflag, min(v) AS wmedian_price
             |FROM c
             |WHERE cw * CAST(2 AS DECIMAL(3,0)) >= tw * CAST(1 AS DECIMAL(3,0)) AND tw > 0
             |GROUP BY g ORDER BY g""".stripMargin)),

    // ---- q202: 2-D HISTOGRAM — the (quantity bin × price bin)
    // density grid with per-cell revenue: fixed literal bin widths so
    // the rule is pure floor arithmetic (the q106 floor-replay
    // discipline), one aggregation, grid-bounded output.
    Q(
      "q202_histogram_2d",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy(
            floor($"l_quantity" / 5.0).cast("long").as("q_bin"),
            floor($"l_extendedprice" / 10000.0).cast("long").as("p_bin"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec($"l_extendedprice")).cast("decimal(18,4)").cast("double").as("sum_price"))
          .orderBy($"q_bin", $"p_bin")
      },
      Some("""SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS q_bin,
             |  CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS p_bin,
             |  count(*) AS n,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
             |FROM lineitem
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q203: OUT-OF-ORDER STREAMING CEP — q191's pattern query
    // through [[graft.streaming.PatternMatch.detectEventTime]] with
    // batch membership deliberately SCRAMBLED: a deterministic
    // hash-chosen half of each slice's trailing one-day band arrives
    // one micro-batch LATE (inside the 2-day watermark delay). The
    // event multiset is unchanged, so the q191 sequential replay is
    // the oracle verbatim — any detection that depends on arrival
    // order (buffering, sealing, eviction, the late-row horizon)
    // diverges here.
    Q(
      "q203_cep_unordered",
      (s, d) => streamingPatternDetectUnordered(s, d),
      Some(ScaleOps5.cepOracleSql)),

    // ---- q204: WEIGHT-OF-EVIDENCE / INFORMATION VALUE — the credit-
    // scoring feature screen: per totalprice bin, WoE =
    // ln(smoothed pos share / smoothed neg share) (Laplace 0.5 on the
    // bin counts only) and its IV term (unsmoothed share gap × WoE).
    // Counts are exact integers; the two ln-based doubles are gated
    // by the read-back oracle at 1e-9 (cross-engine ln is the one
    // non-portable step — the q57/q70 soundness pattern).
    Q(
      "q204_woe_iv",
      (s, d) => {
        import s.implicits._
        val wAll = org.apache.spark.sql.expressions.Window
          .orderBy($"bin")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val smoothed =
          (($"pos".cast("double") + 0.5) / $"tp") /
            (($"neg".cast("double") + 0.5) / $"tn")
        Tables.orders(s, d)
          .select(
            floor($"o_totalprice" / 50000.0).cast("long").as("bin"),
            ($"o_orderpriority" === "1-URGENT").cast("long").as("y"))
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"), sum($"y").as("pos"))
          .withColumn("neg", $"n" - $"pos")
          // totals via a window over the ≤ dozens-row bin AGGREGATE
          .withColumn("tp", sum($"pos").over(wAll))
          .withColumn("tn", sum($"neg").over(wAll))
          .select(
            $"bin", $"n", $"pos", $"neg",
            log(smoothed).as("woe"),
            ((($"pos".cast("double") / $"tp") - ($"neg".cast("double") / $"tn")) *
              log(smoothed)).as("iv_term"))
          .orderBy($"bin")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q204_woe_iv/*.parquet')),
             |b AS (SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
             |  FROM orders),
             |agg AS (SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
             |    count(*) - CAST(sum(y) AS BIGINT) AS neg
             |  FROM b GROUP BY 1),
             |t AS (SELECT CAST(sum(pos) AS BIGINT) AS tp, CAST(sum(neg) AS BIGINT) AS tn FROM agg),
             |x AS (SELECT a.bin, a.n, a.pos, a.neg,
             |    ln(((CAST(a.pos AS DOUBLE) + 0.5) / t.tp) / ((CAST(a.neg AS DOUBLE) + 0.5) / t.tn)) AS woe,
             |    ((CAST(a.pos AS DOUBLE) / t.tp) - (CAST(a.neg AS DOUBLE) / t.tn)) *
             |      ln(((CAST(a.pos AS DOUBLE) + 0.5) / t.tp) / ((CAST(a.neg AS DOUBLE) + 0.5) / t.tn)) AS iv_term
             |  FROM agg a, t),
             |j AS (SELECT e.bin, e.n, e.pos, e.neg, e.woe, e.iv_term,
             |    x.n AS xn, x.pos AS xpos, x.neg AS xneg, x.woe AS xwoe, x.iv_term AS xiv
             |  FROM emitted e JOIN x USING (bin)),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM x)
             |    AND (SELECT count(*) FROM j) = (SELECT count(*) FROM x)
             |    AND NOT EXISTS (SELECT 1 FROM j
             |      WHERE n <> xn OR pos <> xpos OR neg <> xneg
             |        OR abs(woe - xwoe) > 1e-9 OR abs(iv_term - xiv) > 1e-9)
             |  ) AS ok)
             |SELECT bin, n, pos, neg, woe, iv_term FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-999 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), 0.0, 0.0
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q205: INCREMENTAL SCD2 MAINTENANCE — the dimension built
    // from pre-1999 orders, then the 1999+ orders merged as a delta
    // through [[graft.operators.Scd2.applyDelta]] (untouched keys
    // anti-join through; only touched keys re-version). The oracle is
    // the FULL REBUILD replay (q198's program over all orders) — the
    // incremental path must be indistinguishable from it.
    Q(
      "q205_scd2_incremental",
      (s, d) => {
        import s.implicits._
        val cut = lit("1999-01-01").cast("timestamp")
        val dim = Scd2.fromChangeLog(
          Tables.orders(s, d).filter($"o_orderdate" < cut),
          key = $"o_custkey", ts = $"o_orderdate", tiebreak = $"o_orderkey",
          attrs = Seq("prio" -> $"o_orderpriority"))
        Scd2.applyDelta(
          dim,
          Tables.orders(s, d).filter($"o_orderdate" >= cut),
          key = $"o_custkey", ts = $"o_orderdate", tiebreak = $"o_orderkey",
          attrs = Seq("prio" -> $"o_orderpriority"))
          .orderBy($"k", $"version")
      },
      Some("""WITH obs AS (
             |  SELECT o_custkey AS k, o_orderdate AS valid_from,
             |    o_orderkey AS tb, o_orderpriority AS prio
             |  FROM orders),
             |ch AS (SELECT *,
             |    lag(prio) OVER (PARTITION BY k ORDER BY valid_from, tb) AS prev
             |  FROM obs),
             |surv AS MATERIALIZED (
             |  SELECT k, valid_from, tb, prio FROM ch
             |  WHERE prev IS NULL OR prio <> prev)
             |SELECT k, valid_from,
             |  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, tb) AS valid_to,
             |  CAST(row_number() OVER (PARTITION BY k ORDER BY valid_from, tb) AS INTEGER) AS version,
             |  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, tb) IS NULL AS is_current,
             |  prio
             |FROM surv ORDER BY k, version""".stripMargin)),

    // ---- q206: TTL THROTTLE / DEBOUNCE — keep each user's first
    // event, suppress until 2 days since the LAST KEPT event
    // ([[graft.operators.Throttle]]): kept-ness chains through the
    // key's whole history (not expressible with lag/windows — the
    // q191 sequential-dependence class), so the plan is a repartition
    // + sortWithinPartitions + O(1)-state forward scan, and the
    // oracle is a recursive-CTE replay of the same machine.
    Q(
      "q206_event_throttle",
      (s, d) => {
        import s.implicits._
        graft.operators.Throttle.keepFirstPerTtl(
          Tables.events(s, d),
          key = $"user_id", ts = $"ts", tiebreak = $"event_id",
          ttlUs = 2L * 86400L * 1000000L)
          .orderBy($"k", $"ts", $"tb")
      },
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id AS k, ts, epoch_us(ts) AS t, event_id AS tb,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |st(k, rn, last_kept, kept) AS (
             |  SELECT k, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), false
             |  FROM (SELECT DISTINCT k FROM ev)
             |  UNION ALL
             |  SELECT s.k, e.rn,
             |    CASE WHEN s.last_kept IS NULL OR e.t - s.last_kept >= 172800000000
             |         THEN e.t ELSE s.last_kept END,
             |    (s.last_kept IS NULL OR e.t - s.last_kept >= 172800000000)
             |  FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1)
             |SELECT e.k, e.ts, e.tb
             |FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn
             |WHERE s.kept
             |ORDER BY e.k, e.ts, e.tb""".stripMargin)),

    // ---- q207: CHI-SQUARE CONTINGENCY CELLS — nation × market
    // segment association audit: observed counts (exact), expected
    // under independence (ONE double division of an exact integer
    // product), and the per-cell chi-square contribution (identical
    // IEEE op sequence on both engines → hash-exact without
    // tolerance; only a cross-cell SUM would be order-non-portable,
    // so the total is deliberately left to the reader).
    Q(
      "q207_chi2_cells",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
        val cells = Tables.customer(s, d)
          .join(Tables.nation(s, d), $"n_nationkey" === $"c_nationkey")
          .groupBy($"n_name", $"c_mktsegment")
          .agg(count(lit(1)).as("o"))
        val e = (sum($"o").over(w.partitionBy($"n_name")) *
          sum($"o").over(w.partitionBy($"c_mktsegment"))).cast("double") /
          sum($"o").over(w.partitionBy())
        cells
          .withColumn("expected", e)
          .select($"n_name", $"c_mktsegment", $"o", $"expected",
            ((($"o".cast("double") - $"expected") * ($"o".cast("double") - $"expected")) /
              $"expected").as("contrib"))
          .orderBy($"n_name", $"c_mktsegment")
      },
      Some("""WITH cells AS MATERIALIZED (
             |  SELECT n_name, c_mktsegment, count(*) AS o
             |  FROM customer JOIN nation ON n_nationkey = c_nationkey
             |  GROUP BY 1, 2),
             |x AS (SELECT n_name, c_mktsegment, o,
             |    CAST(sum(o) OVER (PARTITION BY n_name) *
             |         sum(o) OVER (PARTITION BY c_mktsegment) AS DOUBLE) /
             |      sum(o) OVER () AS expected
             |  FROM cells)
             |SELECT n_name, c_mktsegment, o, expected,
             |  ((CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected)) / expected AS contrib
             |FROM x ORDER BY n_name, c_mktsegment""".stripMargin)),

    // ---- q209: WINSORIZED / TRIMMED STATISTICS — robust price
    // statistics with the cut points as DISTRIBUTED EXACT SELECTIONS
    // ([[graft.operators.ExactQuantile]]) at the DYADIC fractions
    // 1/16 and 15/16 (q·n is then exact in double, so ceil(q·n)
    // agrees bit-for-bit with the oracle's integer arithmetic — a
    // 0.05 literal would NOT: 0.05·60000 rounds to 3000.0000000000005
    // and ceils one rank too far). Clamp/trim sums run in decimal;
    // the two means are single double divisions.
    Q(
      "q209_winsorized_stats",
      (s, d) => {
        import s.implicits._
        val base = Tables.lineitem(s, d)
          .select($"l_extendedprice".as("p"))
          .filter($"p".isNotNull && !isnan($"p"))
        // bounded: one row per requested quantile (2)
        val cuts = graft.operators.ExactQuantile.selectQuantiles(
          base, $"p", Seq(1.0 / 16, 15.0 / 16))
          .orderBy($"q").select("value").collect().map(_.getDouble(0))
        val (lo, hi) = (cuts(0), cuts(1))
        val clamped = when($"p" < lo, lo).when($"p" > hi, hi).otherwise($"p")
        base.agg(
          count(lit(1)).as("n"),
          sum(when($"p" < lo, 1L).otherwise(0L)).as("n_low"),
          sum(when($"p" > hi, 1L).otherwise(0L)).as("n_high"),
          (sum(dec(clamped)).cast("decimal(18,4)").cast("double") /
            count(lit(1))).as("winsorized_mean"),
          (sum(when($"p" >= lo && $"p" <= hi, dec($"p"))).cast("decimal(18,4)")
            .cast("double") /
            sum(when($"p" >= lo && $"p" <= hi, 1L).otherwise(0L)))
            .as("trimmed_mean"))
          .select(lit(lo).as("lo_cut"), lit(hi).as("hi_cut"),
            $"n", $"n_low", $"n_high", $"winsorized_mean", $"trimmed_mean")
      },
      Some("""WITH v AS MATERIALIZED (SELECT l_extendedprice AS p FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)),
             |nn AS (SELECT count(*) AS n FROM v),
             |rk AS MATERIALIZED (SELECT p, row_number() OVER (ORDER BY p) AS r FROM v),
             |c AS (SELECT
             |    (SELECT p FROM rk, nn WHERE r = CAST(ceil(nn.n / 16.0) AS BIGINT)) AS lo,
             |    (SELECT p FROM rk, nn WHERE r = CAST(ceil(0.9375 * nn.n) AS BIGINT)) AS hi)
             |SELECT c.lo AS lo_cut, c.hi AS hi_cut,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN p < c.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             |  CAST(sum(CASE WHEN p > c.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             |  CAST(CAST(sum(CAST(CASE WHEN p < c.lo THEN c.lo
             |                          WHEN p > c.hi THEN c.hi
             |                          ELSE p END AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
             |    / count(*) AS winsorized_mean,
             |  CAST(CAST(sum(CASE WHEN p >= c.lo AND p <= c.hi
             |                     THEN CAST(p AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
             |    / sum(CASE WHEN p >= c.lo AND p <= c.hi THEN 1 ELSE 0 END) AS trimmed_mean
             |FROM v, c GROUP BY c.lo, c.hi""".stripMargin)),

    // ---- q210: MEDIAN / MAD OUTLIER AUDIT — the robust-z screen:
    // exact median by distributed selection, exact MAD as the median
    // of the DERIVED |p − median| column (a second selection pass —
    // composability the sketch estimators don't have), then the
    // count beyond 3·MAD. Both cut values are existing data values;
    // the comparison doubles are identical on both engines.
    Q(
      "q210_mad_outliers",
      (s, d) => {
        import s.implicits._
        val base = Tables.lineitem(s, d)
          .select($"l_extendedprice".as("p"))
          .filter($"p".isNotNull && !isnan($"p"))
        // bounded: selectQuantiles emits one row per requested quantile
        val med = graft.operators.ExactQuantile.selectQuantiles(
          base, $"p", Seq(0.5)).select("value").collect()(0).getDouble(0)
        val mad = graft.operators.ExactQuantile.selectQuantiles(
          base.select(abs($"p" - med).as("dev")), $"dev", Seq(0.5))
          .select("value").collect()(0).getDouble(0)
        base.agg(
          count(lit(1)).as("n"),
          sum(when(abs($"p" - med) > lit(3.0) * mad, 1L).otherwise(0L))
            .as("n_outliers"))
          .select(lit(med).as("median"), lit(mad).as("mad"),
            $"n", $"n_outliers")
      },
      Some("""WITH v AS MATERIALIZED (SELECT l_extendedprice AS p FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)),
             |nn AS (SELECT count(*) AS n FROM v),
             |m AS (SELECT p AS med FROM (
             |    SELECT p, row_number() OVER (ORDER BY p) AS r FROM v), nn
             |  WHERE r = CAST(ceil(nn.n / 2.0) AS BIGINT)),
             |dv AS MATERIALIZED (SELECT abs(p - m.med) AS dev FROM v, m),
             |md AS (SELECT dev AS mad FROM (
             |    SELECT dev, row_number() OVER (ORDER BY dev) AS r FROM dv), nn
             |  WHERE r = CAST(ceil(nn.n / 2.0) AS BIGINT))
             |SELECT m.med AS median, md.mad AS mad,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN abs(p - m.med) > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers
             |FROM v, m, md GROUP BY m.med, md.mad""".stripMargin)),

    // ---- q211: REFERENTIAL-INTEGRITY AUDIT — the data-quality
    // counterpart of q180's functional dependencies: for every FK
    // relationship in the star schema, the orphan count (child rows
    // whose key resolves to no parent) and the childless-parent
    // count, via anti-joins only — no row ever leaves the engine, the
    // output is one row per relationship at any scale.
    Q(
      "q211_ri_audit",
      (s, d) => {
        import s.implicits._
        def audit(rel: String, child: org.apache.spark.sql.DataFrame, ck: String,
                  parent: org.apache.spark.sql.DataFrame, pk: String) = {
          val orphans = child.select(col(ck).as("k"))
            .join(parent.select(col(pk).as("k")), Seq("k"), "left_anti").count()
          val childless = parent.select(col(pk).as("k")).distinct()
            .join(child.select(col(ck).as("k")), Seq("k"), "left_anti").count()
          (rel, child.count(), orphans, childless)
        }
        val rows = Seq(
          audit("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey"),
          audit("orders.o_custkey->customer", Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey"),
          audit("lineitem.l_partkey->part", Tables.lineitem(s, d), "l_partkey",
            Tables.part(s, d), "p_partkey"),
          audit("customer.c_nationkey->nation", Tables.customer(s, d), "c_nationkey",
            Tables.nation(s, d), "n_nationkey"))
        rows.toDF("relationship", "n_child", "n_orphans", "n_childless_parents")
          .orderBy($"relationship")
      },
      Some("""SELECT * FROM (
             |  SELECT 'lineitem.l_orderkey->orders' AS relationship,
             |    (SELECT count(*) FROM lineitem) AS n_child,
             |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
             |    (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders) o
             |      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
             |        WHERE l.l_orderkey = o.o_orderkey)) AS n_childless_parents
             |  UNION ALL
             |  SELECT 'orders.o_custkey->customer',
             |    (SELECT count(*) FROM orders),
             |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
             |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
             |    (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer) c
             |      WHERE NOT EXISTS (SELECT 1 FROM orders o
             |        WHERE o.o_custkey = c.c_custkey))
             |  UNION ALL
             |  SELECT 'lineitem.l_partkey->part',
             |    (SELECT count(*) FROM lineitem),
             |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
             |    (SELECT count(*) FROM (SELECT DISTINCT p_partkey FROM part) p
             |      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
             |        WHERE l.l_partkey = p.p_partkey))
             |  UNION ALL
             |  SELECT 'customer.c_nationkey->nation',
             |    (SELECT count(*) FROM customer),
             |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
             |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
             |    (SELECT count(*) FROM (SELECT DISTINCT n_nationkey FROM nation) n
             |      WHERE NOT EXISTS (SELECT 1 FROM customer c
             |        WHERE c.c_nationkey = n.n_nationkey))
             |) ORDER BY relationship""".stripMargin)),

    // ---- q212: STREAMING TTL THROTTLE — q206's machine as a live
    // stateful operator: ONE scalar of state per key (last kept
    // time), three time-ordered slices as separate micro-batches so
    // suppression chains across batch boundaries. Oracle = the q206
    // recursive replay verbatim (same multiset, same machine).
    Q(
      "q212_streaming_throttle",
      (s, d) => streamingThrottle(s, d),
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id AS k, ts, epoch_us(ts) AS t, event_id AS tb,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |st(k, rn, last_kept, kept) AS (
             |  SELECT k, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), false
             |  FROM (SELECT DISTINCT k FROM ev)
             |  UNION ALL
             |  SELECT s.k, e.rn,
             |    CASE WHEN s.last_kept IS NULL OR e.t - s.last_kept >= 172800000000
             |         THEN e.t ELSE s.last_kept END,
             |    (s.last_kept IS NULL OR e.t - s.last_kept >= 172800000000)
             |  FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1)
             |SELECT e.k, e.ts, e.tb
             |FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn
             |WHERE s.kept
             |ORDER BY e.k, e.ts, e.tb""".stripMargin)),

    // ---- q213: INCREMENTAL NEAR-DUP (LSH INDEX MAINTENANCE) — an
    // ingest batch (every 10th doc) deduped against the standing
    // corpus: the batch bands, semi-join-prunes to touched index
    // buckets, and only pairs involving a new doc are candidates —
    // corpus cost is its (persistable) band index, never a re-pair.
    // Same soundness oracle class as q26: ≥ 90% recall against the
    // UNBLOCKED exact pairs restricted to new-doc involvement, every
    // emitted pair's exact Jaccard re-verified.
    Q(
      "q213_incremental_lsh",
      (s, d) => {
        import s.implicits._
        val hashed = LlmOps.sharedShingleSets(s, d)
        val isNew = pmod($"doc_id", lit(10L)) === 0
        graft.operators.Dedup.minhashLshPairsIncremental(
          hashed.filter(!isNew), hashed.filter(isNew), threshold = 0.3)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH ${LlmOps.sqlExactJaccardCteFrom("documents")},
             |newexact AS MATERIALIZED (SELECT * FROM exact
             |  WHERE id_a % 10 = 0 OR id_b % 10 = 0),
             |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q213_incremental_lsh/*.parquet')),
             |flag AS (SELECT
             |  ((SELECT count(*) FROM emitted) >= 0.9 * (SELECT count(*) FROM newexact)) AS ok)
             |SELECT e.id_a, e.id_b, x.jaccard
             |FROM emitted e JOIN newexact x ON e.id_a = x.id_a AND e.id_b = x.id_b
             |  AND abs(e.jaccard - x.jaccard) < 1e-9
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b,
             |  CAST(-999 AS DOUBLE) AS jaccard
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q214: MRF SCHEMA-DRIFT DETECTION — the guardrail before
    // trusting an explicit schema: the staged document carries a
    // vendor extension field on every third item, the declared
    // contract also lists the `location` provider variant that this
    // document never uses, and the detector must surface BOTH (the
    // unexpected field with its exact element count, the absent
    // contract field with zero) from one pass over the per-element
    // stream. Oracle recomputes every count from part/supplier.
    Q(
      "q214_mrf_schema_drift",
      (s, d) => {
        import s.implicits._
        val parts = s.read.parquet(s"$d/part.parquet")
          .filter($"p_partkey" <= 40)
          .select($"p_partkey", $"p_name")
          // bounded: <= 40 literal-keyed dim rows for the MRF fixture doc
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
        val groups = s.read.parquet(s"$d/supplier.parquet")
          .filter($"s_suppkey" <= 10)
          .select($"s_suppkey")
          // bounded: <= 10 literal-keyed dim rows
          .collect().map(_.getLong(0)).toSeq.sorted
        val dir = Scratch.tempDir("q214_drift")
        try {
          val file = dir.resolve("mrf_drift.json")
          java.nio.file.Files.writeString(file,
            MrfGold.buildJson(parts, groups, extensionOn = p => p % 3 == 0))
          val perElement = s.read.format("payer-mrf")
            .option("perElement", "true").load(file.toString)
            .localCheckpoint(true) // staged file dies in the finally
          graft.operators.SchemaDrift.fieldDrift(perElement, Map(
            "in_network" -> Seq(
              "negotiation_arrangement", "name", "billing_code_type",
              "billing_code_type_version", "billing_code", "description",
              "negotiated_rates", "bundled_codes"),
            "provider_references" -> Seq(
              "provider_group_id", "provider_groups", "location"),
            "" -> Seq(
              "reporting_entity_name", "reporting_entity_type",
              "last_updated_on", "version")))
            .orderBy($"header_key", $"field")
        } finally Scratch.deleteRecursively(dir)
      },
      Some("""WITH np AS (SELECT count(*) AS n FROM part WHERE p_partkey <= 40),
             |n3 AS (SELECT count(*) AS n FROM part
             |  WHERE p_partkey <= 40 AND p_partkey % 3 = 0),
             |ng AS (SELECT count(*) AS n FROM supplier WHERE s_suppkey <= 10)
             |SELECT * FROM (
             |  SELECT '' AS header_key, 'last_updated_on' AS field,
             |    CAST(1 AS BIGINT) AS n_elements, true AS is_expected
             |  UNION ALL SELECT '', 'reporting_entity_name', 1, true
             |  UNION ALL SELECT '', 'reporting_entity_type', 1, true
             |  UNION ALL SELECT '', 'version', 1, true
             |  UNION ALL SELECT 'in_network', 'billing_code', (SELECT n FROM np) + 2, true
             |  UNION ALL SELECT 'in_network', 'billing_code_type', (SELECT n FROM np) + 2, true
             |  UNION ALL SELECT 'in_network', 'billing_code_type_version', (SELECT n FROM np) + 2, true
             |  UNION ALL SELECT 'in_network', 'bundled_codes', 2, true
             |  UNION ALL SELECT 'in_network', 'description', (SELECT n FROM np), true
             |  UNION ALL SELECT 'in_network', 'name', (SELECT n FROM np) + 2, true
             |  UNION ALL SELECT 'in_network', 'negotiated_rates', (SELECT n FROM np), true
             |  UNION ALL SELECT 'in_network', 'negotiation_arrangement', (SELECT n FROM np) + 2, true
             |  UNION ALL SELECT 'in_network', 'x_custom_ext', (SELECT n FROM n3), false
             |  UNION ALL SELECT 'provider_references', 'location', 0, true
             |  UNION ALL SELECT 'provider_references', 'provider_group_id', (SELECT n FROM ng), true
             |  UNION ALL SELECT 'provider_references', 'provider_groups', (SELECT n FROM ng), true
             |) ORDER BY header_key, field""".stripMargin)),

    // ---- q215: EXPECTATION-SUITE AUDIT — seven declarative
    // data-quality rules over lineitem evaluated in ONE scan (one
    // wide aggregation, one row per rule out; a NULL predicate
    // counts as a violation — unknown is not a pass). The
    // discount-range rule is deliberately violated by real data so
    // the audit proves it COUNTS rather than rubber-stamps.
    Q(
      "q215_expectations_audit",
      (s, d) => {
        import s.implicits._
        graft.operators.Expectations.audit(Tables.lineitem(s, d), Seq(
          "orderkey_not_null" -> $"l_orderkey".isNotNull,
          "quantity_in_1_50" -> $"l_quantity".between(1.0, 50.0),
          "discount_below_08" -> ($"l_discount" < 0.08),
          "price_positive" -> ($"l_extendedprice" > 0.0),
          "returnflag_domain" -> $"l_returnflag".isin("A", "N", "R"),
          "shipdate_in_range" ->
            $"l_shipdate".between(lit("1995-01-01").cast("timestamp"),
              lit("2002-12-31").cast("timestamp")),
          "tax_nonnegative" -> ($"l_tax" >= 0.0)))
          .orderBy($"rule")
      },
      Some("""SELECT rule, n_rows, n_violations,
             |  CAST(n_violations AS DOUBLE) / n_rows AS violation_rate
             |FROM (
             |  SELECT 'orderkey_not_null' AS rule, count(*) AS n_rows,
             |    CAST(sum(CASE WHEN coalesce(l_orderkey IS NOT NULL, false)
             |      THEN 0 ELSE 1 END) AS BIGINT) AS n_violations FROM lineitem
             |  UNION ALL
             |  SELECT 'quantity_in_1_50', count(*),
             |    CAST(sum(CASE WHEN coalesce(l_quantity BETWEEN 1.0 AND 50.0, false)
             |      THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'discount_below_08', count(*),
             |    CAST(sum(CASE WHEN coalesce(l_discount < 0.08, false)
             |      THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'price_positive', count(*),
             |    CAST(sum(CASE WHEN coalesce(l_extendedprice > 0.0, false)
             |      THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'returnflag_domain', count(*),
             |    CAST(sum(CASE WHEN coalesce(l_returnflag IN ('A', 'N', 'R'), false)
             |      THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'shipdate_in_range', count(*),
             |    CAST(sum(CASE WHEN coalesce(l_shipdate BETWEEN TIMESTAMP '1995-01-01'
             |        AND TIMESTAMP '2002-12-31', false)
             |      THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'tax_nonnegative', count(*),
             |    CAST(sum(CASE WHEN coalesce(l_tax >= 0.0, false)
             |      THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             |) ORDER BY rule""".stripMargin)),

    // ---- q216: ORDINAL SEQUENCE AUDIT — the CDC/ingest
    // completeness check on a per-parent ordinal (lineitem's
    // l_linenumber within its order): per order, duplicate and gap
    // counts from min/max/count/countDistinct arithmetic only (no
    // sort, no window), rolled up to one always-nonempty summary row
    // so a perfectly healthy corpus still emits a positive audit.
    Q(
      "q216_sequence_audit",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(
            count(lit(1)).as("n"),
            countDistinct($"l_linenumber").as("n_distinct"),
            min($"l_linenumber").as("seq_min"),
            max($"l_linenumber").as("seq_max"))
          .agg(
            count(lit(1)).as("n_parents"),
            sum(($"n" - $"n_distinct")).as("total_dups"),
            sum($"seq_max" - $"seq_min" + 1 - $"n_distinct").as("total_gaps"),
            sum(when($"n" =!= $"n_distinct", 1L).otherwise(0L)).as("parents_with_dups"),
            sum(when($"seq_max" - $"seq_min" + 1 =!= $"n_distinct", 1L)
              .otherwise(0L)).as("parents_with_gaps"),
            sum(when($"seq_min" =!= 1, 1L).otherwise(0L)).as("parents_not_at_one"))
      },
      Some("""WITH per AS (SELECT l_orderkey, count(*) AS n,
             |    count(DISTINCT l_linenumber) AS nd,
             |    min(l_linenumber) AS mn, max(l_linenumber) AS mx
             |  FROM lineitem GROUP BY 1)
             |SELECT count(*) AS n_parents,
             |  CAST(sum(n - nd) AS BIGINT) AS total_dups,
             |  CAST(sum(mx - mn + 1 - nd) AS BIGINT) AS total_gaps,
             |  CAST(sum(CASE WHEN n <> nd THEN 1 ELSE 0 END) AS BIGINT) AS parents_with_dups,
             |  CAST(sum(CASE WHEN mx - mn + 1 <> nd THEN 1 ELSE 0 END) AS BIGINT) AS parents_with_gaps,
             |  CAST(sum(CASE WHEN mn <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS parents_not_at_one
             |FROM per""".stripMargin)),

    // ---- q217: INTERVAL-UNION COVERAGE (gaps-and-islands) — each
    // event opens a 30-minute activity interval; per user, the UNION
    // length and island count of overlapping intervals (billable
    // uptime, device-activity coverage): islands form where an
    // interval starts STRICTLY after the running max end of all
    // earlier intervals (touching merges), pure integer-µs
    // arithmetic, two stacked windows over one key exchange + one
    // sort (the Scd2 plan shape) then two cheap aggregations.
    Q(
      "q217_interval_coverage",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"start_us", $"event_id")
        val wPrev = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val durUs = 30L * 60L * 1000000L
        Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull)
          .select($"user_id", $"event_id",
            (unix_micros($"ts")).as("start_us"),
            (unix_micros($"ts") + durUs).as("end_us"))
          .withColumn("prev_max_end", max($"end_us").over(wPrev))
          .withColumn("new_island",
            ($"prev_max_end".isNull || $"start_us" > $"prev_max_end").cast("long"))
          .withColumn("island", sum($"new_island").over(w))
          .groupBy($"user_id", $"island")
          .agg(min($"start_us").as("i_start"), max($"end_us").as("i_end"))
          .groupBy($"user_id")
          .agg(
            count(lit(1)).as("n_islands"),
            sum($"i_end" - $"i_start").as("covered_us"))
          .orderBy($"user_id")
      },
      Some("""WITH iv AS (SELECT user_id, event_id,
             |    epoch_us(ts) AS start_us,
             |    epoch_us(ts) + 1800000000 AS end_us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |m AS (SELECT user_id, event_id, start_us, end_us,
             |    max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
             |  FROM iv),
             |isl AS (SELECT user_id, start_us, end_us,
             |    sum(CASE WHEN prev_max_end IS NULL OR start_us > prev_max_end
             |        THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY start_us, event_id) AS island
             |  FROM m),
             |per AS (SELECT user_id, island,
             |    min(start_us) AS i_start, max(end_us) AS i_end
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_islands,
             |  CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
             |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- q218: POINT-IN-TIME JOIN against the SCD2 dimension — the
    // reason SCD2 exists: every lineitem attributed to the priority
    // VERSION in force at its ship date (not the current one), via
    // the sort-merge as-of join over version starts (versions tile,
    // so newest-at-or-before ≡ validity containment). Probes before
    // the customer's first version land in an explicit UNMATCHED
    // bucket — and the synthetic data DOES ship some lineitems before
    // their order date, so that bucket is real, counted identically
    // by both engines, not assumed empty.
    Q(
      "q218_point_in_time_join",
      (s, d) => {
        import s.implicits._
        val dim = Scd2.fromChangeLog(
          Tables.orders(s, d),
          key = $"o_custkey", ts = $"o_orderdate", tiebreak = $"o_orderkey",
          attrs = Seq("prio" -> $"o_orderpriority"))
        // two changes on the same day leave two versions at one
        // valid_from; the regime "in force at" that instant is the
        // LAST of them — collapse deterministically on BOTH sides
        // (DuckDB's ASOF tie pick is unspecified)
        val wDay = org.apache.spark.sql.expressions.Window
          .partitionBy($"k", $"valid_from").orderBy($"version".desc)
        val dimLast = dim
          .withColumn("__rn", row_number().over(wDay))
          .filter($"__rn" === 1).drop("__rn")
        val probe = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".as("pk"), $"l_shipdate".as("sd"))
        graft.operators.TemporalJoins.asofJoin(
          probe, dimLast,
          probeKey = $"pk", probeTime = $"sd",
          refKey = $"k", refTime = $"valid_from",
          probeOut = Seq("pk" -> $"pk", "sd" -> $"sd"),
          refOut = Seq("prio" -> $"prio"),
          refOrder = $"version")
          .groupBy(coalesce($"prio", lit("UNMATCHED")).as("prio_at_ship"))
          .agg(count(lit(1)).as("n_lineitems"))
          .orderBy($"prio_at_ship")
      },
      Some("""WITH obs AS (
             |  SELECT o_custkey AS k, o_orderdate AS valid_from,
             |    o_orderkey AS tb, o_orderpriority AS prio
             |  FROM orders),
             |ch AS (SELECT *,
             |    lag(prio) OVER (PARTITION BY k ORDER BY valid_from, tb) AS prev
             |  FROM obs),
             |surv0 AS MATERIALIZED (
             |  SELECT k, valid_from, tb, prio FROM ch
             |  WHERE prev IS NULL OR prio <> prev),
             |surv AS MATERIALIZED (
             |  SELECT k, valid_from, prio FROM surv0
             |  QUALIFY row_number() OVER (PARTITION BY k, valid_from
             |    ORDER BY tb DESC) = 1),
             |li AS (SELECT o_custkey AS k, l_shipdate AS sd
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |pit AS (SELECT li.k, li.sd, s.prio
             |  FROM li ASOF LEFT JOIN surv s
             |    ON li.k = s.k AND li.sd >= s.valid_from)
             |SELECT coalesce(prio, 'UNMATCHED') AS prio_at_ship,
             |  count(*) AS n_lineitems
             |FROM pit GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q219: PRIVACY AUDIT (k-anonymity / l-diversity) — before a
    // dataset ships, the re-identification surface: for each
    // k ∈ {2, 5, 10}, how many quasi-identifier groups (nation ×
    // market segment) fall below k members and how many rows sit in
    // them; for each l ∈ {2, 3}, how many QI groups (nation) carry
    // fewer than l distinct sensitive values (segment). One
    // aggregation per audit over the QI group table — group counts,
    // never row explosion.
    Q(
      "q219_privacy_audit",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val qiGroups = cust.groupBy($"c_nationkey", $"c_mktsegment")
          .agg(count(lit(1)).as("n"))
        val divGroups = cust.groupBy($"c_nationkey")
          .agg(countDistinct($"c_mktsegment").as("ndv"))
        // thresholds fan out as a broadcast literal — every audit row
        // comes from ONE aggregation pass, no driver loop
        val kAudit = qiGroups
          .crossJoin(broadcast(Seq(2L, 5L, 10L).toDF("threshold")))
          .groupBy($"threshold")
          .agg(
            sum(when($"n" < $"threshold", 1L).otherwise(0L)).as("n_violating_groups"),
            sum(when($"n" < $"threshold", $"n").otherwise(0L)).as("n_rows_at_risk"))
          .select(lit("k_anonymity").as("metric"), $"threshold",
            $"n_violating_groups", $"n_rows_at_risk")
        val lAudit = divGroups
          .crossJoin(broadcast(Seq(2L, 3L).toDF("threshold")))
          .groupBy($"threshold")
          .agg(sum(when($"ndv" < $"threshold", 1L).otherwise(0L)).as("n_violating_groups"))
          .select(lit("l_diversity").as("metric"), $"threshold",
            $"n_violating_groups", lit(0L).as("n_rows_at_risk"))
        kAudit.unionByName(lAudit).orderBy($"metric", $"threshold")
      },
      Some("""WITH qi AS MATERIALIZED (
             |  SELECT c_nationkey, c_mktsegment, count(*) AS n
             |  FROM customer GROUP BY 1, 2),
             |dv AS MATERIALIZED (
             |  SELECT c_nationkey, count(DISTINCT c_mktsegment) AS ndv
             |  FROM customer GROUP BY 1)
             |SELECT * FROM (
             |  SELECT 'k_anonymity' AS metric, CAST(2 AS BIGINT) AS threshold,
             |    CAST((SELECT count(*) FROM qi WHERE n < 2) AS BIGINT) AS n_violating_groups,
             |    CAST(coalesce((SELECT sum(n) FROM qi WHERE n < 2), 0) AS BIGINT) AS n_rows_at_risk
             |  UNION ALL
             |  SELECT 'k_anonymity', 5,
             |    CAST((SELECT count(*) FROM qi WHERE n < 5) AS BIGINT),
             |    CAST(coalesce((SELECT sum(n) FROM qi WHERE n < 5), 0) AS BIGINT)
             |  UNION ALL
             |  SELECT 'k_anonymity', 10,
             |    CAST((SELECT count(*) FROM qi WHERE n < 10) AS BIGINT),
             |    CAST(coalesce((SELECT sum(n) FROM qi WHERE n < 10), 0) AS BIGINT)
             |  UNION ALL
             |  SELECT 'l_diversity', 2,
             |    CAST((SELECT count(*) FROM dv WHERE ndv < 2) AS BIGINT), CAST(0 AS BIGINT)
             |  UNION ALL
             |  SELECT 'l_diversity', 3,
             |    CAST((SELECT count(*) FROM dv WHERE ndv < 3) AS BIGINT), CAST(0 AS BIGINT)
             |) ORDER BY metric, threshold""".stripMargin)),

    // ---- q220: FRONTIER CONNECTED COMPONENTS — q34's clusters by
    // the DELTA-ITERATION algorithm ([[graft.operators.Graph
    // .connectedComponentsFrontier]]): per round only edges incident
    // to changed labels do work, the frontier empties at convergence
    // — the mostly-converged / incrementally-grown-graph regime,
    // complementing pointer jumping's O(log n) full-work rounds.
    // Same oracle as q34: the independent recursive reachability
    // closure (algorithm-agnostic ground truth).
    Q(
      "q220_frontier_components",
      (s, d) => {
        import s.implicits._
        val pairs = graft.operators.Dedup.ngramJaccardPairsFromHashed(
          LlmOps.sharedShingleSets(s, d), threshold = 0.3)
        graft.operators.Graph.connectedComponentsFrontier(
          pairs, $"id_a", $"id_b")
          .select($"node".as("doc_id"), $"component".as("cluster_id"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE ${LlmOps.sqlExactJaccardCteFrom("documents")},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM exact
             |  UNION SELECT id_b, id_a FROM exact),
             |reach(doc_id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id)
             |SELECT doc_id, min(r) AS cluster_id FROM reach
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- q221: INCREMENTAL COMPONENT MAINTENANCE — yesterday's
    // converged cluster labels warm-start the frontier loop after a
    // hash-chosen fifth of the near-dup edges "arrive" as the delta:
    // only delta endpoints seed the frontier, merges re-label in
    // rounds proportional to the smaller side, untouched regions
    // never produce a task. The oracle is the algorithm-agnostic
    // full recursive closure — the incremental path must be
    // indistinguishable from recomputing the world.
    Q(
      "q221_incremental_components",
      (s, d) => {
        import s.implicits._
        val pairs = graft.operators.Dedup.ngramJaccardPairsFromHashed(
          LlmOps.sharedShingleSets(s, d), threshold = 0.3)
          .select($"id_a", $"id_b")
          .localCheckpoint(true) // split + union below reuse it thrice
        val isDelta =
          pmod(graft.operators.KmvSketch.hash60(concat_ws("#", $"id_a", $"id_b")),
            lit(5L)) === 0
        val oldLabels = graft.operators.Graph.connectedComponentsFrontier(
          pairs.filter(!isDelta), $"id_a", $"id_b")
        graft.operators.Graph.connectedComponentsIncremental(
          oldLabels, pairs, pairs.filter(isDelta), $"id_a", $"id_b")
          .select($"node".as("doc_id"), $"component".as("cluster_id"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE ${LlmOps.sqlExactJaccardCteFrom("documents")},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM exact
             |  UNION SELECT id_b, id_a FROM exact),
             |reach(doc_id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id)
             |SELECT doc_id, min(r) AS cluster_id FROM reach
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- q222: TOKEN-BUCKET RATE LIMITING — q206's machine with a
    // BURST budget: 3 tokens per user, one refilling every 2 days,
    // each admitted event spends one (the real notification-budget /
    // API-rate-limiter semantics — a quiet user can burst 3, then
    // settles to 1-per-2-days). Integer microtoken arithmetic end to
    // end, so the recursive replay is exact.
    Q(
      "q222_token_bucket",
      (s, d) => {
        import s.implicits._
        graft.operators.Throttle.tokenBucket(
          Tables.events(s, d),
          key = $"user_id", ts = $"ts", tiebreak = $"event_id",
          ttlUs = 2L * 86400L * 1000000L, burst = 3)
          .orderBy($"k", $"ts", $"tb")
      },
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id AS k, ts, epoch_us(ts) AS t, event_id AS tb,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |st(k, rn, bucket, last_t, kept) AS (
             |  SELECT k, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
             |    CAST(NULL AS BIGINT), false
             |  FROM (SELECT DISTINCT k FROM ev)
             |  UNION ALL
             |  SELECT s.k, e.rn,
             |    CASE WHEN x.b1 >= 172800000000 THEN x.b1 - 172800000000 ELSE x.b1 END,
             |    e.t,
             |    x.b1 >= 172800000000
             |  FROM st s
             |  JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1,
             |  LATERAL (SELECT CASE WHEN s.last_t IS NULL THEN 518400000000
             |    ELSE least(518400000000, s.bucket + e.t - s.last_t) END AS b1) x)
             |SELECT e.k, e.ts, e.tb
             |FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn
             |WHERE s.kept
             |ORDER BY e.k, e.ts, e.tb""".stripMargin)),

    // ---- q223: OUT-OF-ORDER STREAMING THROTTLE — q212's admission
    // stream with batch membership scrambled exactly like q203 (a
    // hash-chosen half of each slice's trailing day arrives one
    // micro-batch late, inside the 2-day watermark delay), through
    // the watermark-buffered event-time throttle. Oracle = the q206
    // recursive replay verbatim (multiset unchanged). The flush
    // sentinel stays PENDING by design (the watermark never passes
    // it), so exactly one state row survives — asserted, the rest
    // drained.
    Q(
      "q223_streaming_throttle_unordered",
      (s, d) => streamingThrottleUnordered(s, d),
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id AS k, ts, epoch_us(ts) AS t, event_id AS tb,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |st(k, rn, last_kept, kept) AS (
             |  SELECT k, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), false
             |  FROM (SELECT DISTINCT k FROM ev)
             |  UNION ALL
             |  SELECT s.k, e.rn,
             |    CASE WHEN s.last_kept IS NULL OR e.t - s.last_kept >= 172800000000
             |         THEN e.t ELSE s.last_kept END,
             |    (s.last_kept IS NULL OR e.t - s.last_kept >= 172800000000)
             |  FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1)
             |SELECT e.k, e.ts, e.tb
             |FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn
             |WHERE s.kept
             |ORDER BY e.k, e.ts, e.tb""".stripMargin)),

    // ---- q208: STREAMING SCD2 MAINTENANCE — the q205 incremental
    // merge under a real micro-batch stream: three time-ordered order
    // slices arrive as separate batches; foreachBatch folds each into
    // the persisted dimension (first batch full build, then
    // applyDelta), exactly the production "dimension kept current by
    // the ingest stream" loop. The oracle is the full-rebuild replay.
    Q(
      "q208_scd2_streaming",
      (s, d) => streamingScd2(s, d),
      Some("""WITH obs AS (
             |  SELECT o_custkey AS k, o_orderdate AS valid_from,
             |    o_orderkey AS tb, o_orderpriority AS prio
             |  FROM orders),
             |ch AS (SELECT *,
             |    lag(prio) OVER (PARTITION BY k ORDER BY valid_from, tb) AS prev
             |  FROM obs),
             |surv AS MATERIALIZED (
             |  SELECT k, valid_from, tb, prio FROM ch
             |  WHERE prev IS NULL OR prio <> prev)
             |SELECT k, valid_from,
             |  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, tb) AS valid_to,
             |  CAST(row_number() OVER (PARTITION BY k ORDER BY valid_from, tb) AS INTEGER) AS version,
             |  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, tb) IS NULL AS is_current,
             |  prio
             |FROM surv ORDER BY k, version""".stripMargin))
  )

  /** q212's drive: the q191 staging shape — three time-ordered event
    * slices through one readStream, memory sink, ≥ 3 data batches
    * enforced — feeding [[graft.operators.Throttle
    * .streamingKeepFirstPerTtl]].
    */
  private def streamingThrottle(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q212_throttle")
    try {
      val ev = Tables.events(s, d)
        .filter($"user_id".isNotNull && $"ts".isNotNull)
        .select($"user_id".as("k"), $"ts", $"event_id".as("tb"))
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1), "00_a"),
        (ev.filter($"ts" >= c1 && $"ts" < c2), "01_b"),
        (ev.filter($"ts" >= c2), "02_c")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q212_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.operators.Throttle.streamingKeepFirstPerTtl(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.operators.Throttle.ThrottleEv],
        ttlUs = 2L * 86400L * 1000000L)
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q212 stream did not terminate within 600s — refusing a partial result")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 3,
          s"q212 ran $dataBatches data micro-batch(es); cross-batch suppression " +
            "needs all 3 slices as separate batches")
        s.table(name)
          .select($"k", $"ts", $"tb")
          .orderBy($"k", $"ts", $"tb")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q223's drive: the q203 scrambled staging (hash-chosen trailing
    * bands one batch late + far-future sentinel) feeding
    * [[graft.operators.Throttle.streamingKeepFirstPerTtlEventTime]];
    * exactly ONE state row (the pending sentinel) may survive.
    */
  private def streamingThrottleUnordered(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q223_throttle_ooo")
    try {
      val ev = Tables.events(s, d)
        .filter($"user_id".isNotNull && $"ts".isNotNull)
        .select($"user_id".as("k"), $"ts", $"event_id".as("tb"))
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val b1 = lit("2024-01-10").cast("timestamp")
      val b2 = lit("2024-01-20").cast("timestamp")
      val lateMark = pmod(graft.operators.KmvSketch.hash60($"tb"), lit(2L)) === 0
      val late1 = $"ts" >= b1 && $"ts" < c1 && lateMark
      val late2 = $"ts" >= b2 && $"ts" < c2 && lateMark
      val sentinel = s.range(1).select(
        lit(-1L).as("k"),
        lit("2099-01-01").cast("timestamp").as("ts"),
        lit(-1L).as("tb"))
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1 && !late1), "00_a"),
        (ev.filter(($"ts" >= c1 && $"ts" < c2 && !late2) || late1), "01_b"),
        (ev.filter($"ts" >= c2 || late2), "02_c"),
        (sentinel, "03_flush")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q223_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.operators.Throttle.streamingKeepFirstPerTtlEventTime(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.operators.Throttle.ThrottleEv],
        ttlUs = 2L * 86400L * 1000000L,
        delay = "2 days")
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q223 stream did not terminate within 600s — refusing a partial result")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 4,
          s"q223 ran $dataBatches data micro-batch(es); the out-of-order point " +
            "needs all 3 scrambled slices + the flush sentinel as separate batches")
        val stateRows = q.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        require(stateRows.contains(1L),
          s"q223 expected exactly the pending-sentinel state row, got $stateRows")
        s.table(name)
          .select($"k", $"ts", $"tb")
          .orderBy($"k", $"ts", $"tb")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q208's drive: orders sliced at 1997/1999 into three ordered
    * micro-batches; foreachBatch maintains the dimension in
    * alternating parquet generations (full build on the first batch,
    * [[graft.operators.Scd2.applyDelta]] after), ≥ 3 data batches
    * enforced; the final generation is the answer.
    */
  private def streamingScd2(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q208_scd2s")
    try {
      val o = Tables.orders(s, d)
        .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"o_orderpriority")
      val c1 = lit("1997-01-01").cast("timestamp")
      val c2 = lit("1999-01-01").cast("timestamp")
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (o.filter($"o_orderdate" < c1), "00_a"),
        (o.filter($"o_orderdate" >= c1 && $"o_orderdate" < c2), "01_b"),
        (o.filter($"o_orderdate" >= c2), "02_c")))
      val schema = s.read.parquet(inDir.toString).schema
      val gen = new java.util.concurrent.atomic.AtomicInteger(-1)
      def dimPath(g: Int) = scratch.resolve(s"dim_$g").toString
      val attrs = Seq("prio" -> col("o_orderpriority"))
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val prev = gen.get()
          val next =
            if (prev < 0)
              Scd2.fromChangeLog(batch, col("o_custkey"), col("o_orderdate"),
                col("o_orderkey"), attrs)
            else
              Scd2.applyDelta(s.read.parquet(dimPath(prev)), batch,
                col("o_custkey"), col("o_orderdate"), col("o_orderkey"), attrs)
          next.write.mode("overwrite").parquet(dimPath(prev + 1))
          gen.set(prev + 1)
        }
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(600000),
        "q208 stream did not terminate within 600s — refusing a partial dimension")
      finally q.stop()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches >= 3,
        s"q208 ran $dataBatches data micro-batch(es); the maintenance loop needs " +
          "all 3 slices as separate batches")
      require(gen.get() == dataBatches - 1, s"q208 foreachBatch generations out of step")
      s.read.parquet(dimPath(gen.get()))
        .orderBy($"k", $"version")
        .localCheckpoint(true)
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q203's drive: the q191 slices with a deterministic half of each
    * slice's trailing one-day band REASSIGNED to the next micro-batch
    * (hash-chosen by event_id — replayable), plus the far-future
    * flush sentinel. Watermark delay 2 days covers the 1-day
    * displacement, so nothing is late-dropped; ≥ 4 data batches and a
    * fully drained state store are asserted like q191.
    */
  private def streamingPatternDetectUnordered(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q203_cep_ooo")
    try {
      val ev = Tables.events(s, d)
        .filter($"user_id".isNotNull && $"ts".isNotNull && $"event_type".isNotNull)
        .select($"user_id", $"ts", $"event_type", $"event_id")
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val b1 = lit("2024-01-10").cast("timestamp")
      val b2 = lit("2024-01-20").cast("timestamp")
      val lateMark = pmod(graft.operators.KmvSketch.hash60($"event_id"), lit(2L)) === 0
      val late1 = $"ts" >= b1 && $"ts" < c1 && lateMark
      val late2 = $"ts" >= b2 && $"ts" < c2 && lateMark
      val sentinel = s.range(1).select(
        lit(-1L).as("user_id"),
        lit("2099-01-01").cast("timestamp").as("ts"),
        lit("flush").as("event_type"),
        lit(-1L).as("event_id"))
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1 && !late1), "00_a"),
        (ev.filter(($"ts" >= c1 && $"ts" < c2 && !late2) || late1), "01_b"),
        (ev.filter($"ts" >= c2 || late2), "02_c"),
        (sentinel, "03_flush")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q203_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.PatternMatch.detectEventTime(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.streaming.PatternMatch.Ev],
        steps = Seq("view", "click", "purchase"),
        windowUs = 7L * 86400L * 1000000L,
        delay = "2 days")
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q203 stream did not terminate within 600s — refusing a partial match set")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 4,
          s"q203 ran $dataBatches data micro-batch(es); the out-of-order point " +
            "needs all 3 scrambled slices + the flush sentinel as separate batches")
        val drained = q.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        require(drained.contains(0L),
          s"q203 CEP state not drained at end of stream: $drained rows")
        s.table(name)
          .select($"user_id", $"start_us", $"end_us")
          .orderBy($"user_id", $"start_us", $"end_us")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }
}

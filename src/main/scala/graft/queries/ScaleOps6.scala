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
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Relational operator coverage for SURVEY.md §2 (§2.3 filters/projections,
  * §2.4 joins J1–J4, §2.5 aggregation A1, §2.6 limit, §2.7 scalar
  * functions), re-expressed over the TPC-H-ish testdata.
  *
  * Scale notes (100 TB mindset):
  *  - dimension joins (`nation`, `region`) are explicitly `broadcast()` —
  *    no shuffle of the fact side for those;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key only
  *    after filters are pushed to the parquet scan;
  *  - aggregates are hash aggregates with map-side partials (Catalyst
  *    default for these shapes);
  *  - results are deterministically ordered so the oracle compare and
  *    any golden file are stable.
  *
  * Double-typed money sums are summed as DECIMAL(18,4): exact and
  * order-independent, so Spark and DuckDB agree bit-for-bit regardless
  * of partitioning (a raw double sum differs in the last ulp between
  * engines depending on add order).
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  val all: Seq[Q] = Seq(
    // ---- A1 aggregation (TPC-H Q1 shape): scan → pushed filter →
    // partial+final hash agg → small sort. No join, one shuffle.
    Q(
      "q01_agg_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(dec($"l_quantity")).cast("double").as("sum_qty"),
            sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
              .cast("decimal(18,4)").cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // ---- P1/P2 projection + equality filter (the reference's stream
    // demultiplexer `WHERE header_key='in_network'`, §2.3 P2). Both the
    // predicate and the 3-column projection must reach the parquet scan.
    Q(
      "q02_filter_project",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- J2/J3/J4 equi-join chain (gold shoppable-price query shape,
    // §3.3): fact ⋈ fact shuffles on the key; customer side is filtered
    // before the join so the shuffle moves only matching rows.
    Q(
      "q03_join_revenue_by_customer",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .groupBy($"c_custkey", $"c_name")
          .agg(
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
              .cast("decimal(18,4)").cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY c_custkey, c_name
             |ORDER BY c_custkey""".stripMargin),
      bench = true),

    // ---- Broadcast dimension join: nation/region are tiny at any scale
    // factor — broadcast them so the supplier side never shuffles for
    // the join (only for the final agg).
    Q(
      "q04_broadcast_dim_join",
      (s, d) => {
        import s.implicits._
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        sup
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(
            count(lit(1)).as("n_suppliers"),
            sum(dec($"s_acctbal")).cast("double").as("total_acctbal"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_suppliers,
             |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    // ---- J1 cross join (reference: 1-row header × exploded groups,
    // `01_payer_mrf_demo.py:157-158`). The single-row side is an
    // aggregate — Catalyst broadcasts it, so this is a map-side op.
    Q(
      "q05_cross_join_header",
      (s, d) => {
        import s.implicits._
        val header = Tables.orders(s, d)
          .agg(max($"o_orderdate").as("latest_order"))
        Tables.region(s, d)
          .crossJoin(header)
          .select($"r_regionkey", $"r_name", $"latest_order")
          .orderBy($"r_regionkey")
      },
      Some("""SELECT r_regionkey, r_name, latest_order
             |FROM region
             |CROSS JOIN (SELECT max(o_orderdate) AS latest_order FROM orders)
             |ORDER BY r_regionkey""".stripMargin)),

    // ---- A1 plain count (test-style assertion, §2.5).
    Q(
      "q06_count_filtered",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_returnflag" === "R")
          .agg(count(lit(1)).as("n_returned"))
      },
      Some("SELECT count(*) AS n_returned FROM lineitem WHERE l_returnflag = 'R'")),

    // ---- F3 substring + P4 null-safe filter (README preview query).
    Q(
      "q07_substring_preview",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .filter($"p_name".isNotNull)
          .select(
            $"p_partkey",
            substring($"p_name", 1, 10).as("name_prefix"),
            $"p_retailprice")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, substring(p_name, 1, 10) AS name_prefix, p_retailprice
             |FROM part WHERE p_name IS NOT NULL
             |ORDER BY p_partkey""".stripMargin)),

    // ---- Top-k: ordered limit. Spark executes this as TakeOrderedAndProject
    // (per-partition heap + driver merge) — no full sort at scale.
    Q(
      "q08_topk_orders",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC
             |LIMIT 10""".stripMargin))
  )
}

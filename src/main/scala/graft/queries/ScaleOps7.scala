package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.RankStats

/** Round-8 continuation (q225+): exact rank statistics (ROC-AUC,
  * Mann-Whitney), bounded-round weighted shortest paths, seasonal
  * exponential smoothing, integer allocation, clamped running
  * balances, and zone-map skipping audits.
  */
object ScaleOps7 {

  val all: Seq[Q] = Seq(

    // ---- q225: EXACT ROC-AUC per market segment — does account
    // balance predict placing an urgent order? Ties-corrected rank
    // formula over [[graft.operators.RankStats]]'s bucketed midrank
    // machinery (no per-group global sort — the window runs within
    // (group, bucket) partitions only). All arithmetic exact until
    // ONE pinned-order double division, so the oracle hash-matches.
    Q(
      "q225_roc_auc",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("uk")).distinct()
        val scored = Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"uk", "left")
          .select($"c_mktsegment".as("seg"), $"c_acctbal".as("sc"),
            $"uk".isNotNull.cast("long").as("y"))
        RankStats.rocAuc(scored, $"seg", $"sc", $"y")
          .select($"k".as("segment"), $"n_pos", $"n_neg", $"auc")
          .orderBy($"segment")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT c_mktsegment AS k, c_acctbal AS v,
             |    CASE WHEN u.uk IS NOT NULL THEN 1 ELSE 0 END AS y
             |  FROM customer
             |  LEFT JOIN (SELECT DISTINCT o_custkey AS uk FROM orders
             |             WHERE o_orderpriority = '1-URGENT') u
             |    ON c_custkey = u.uk),
             |cells AS (SELECT k, v, count(*) AS c, sum(y) AS p
             |  FROM base GROUP BY k, v),
             |w AS (SELECT k, c, p,
             |    coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             |  FROM cells),
             |st AS (SELECT k, sum(c) AS n, sum(p) AS n1,
             |    sum(p * (2*cb + c + 1)) AS r1x2
             |  FROM w GROUP BY k)
             |SELECT k AS segment, CAST(n1 AS BIGINT) AS n_pos,
             |  CAST(n - n1 AS BIGINT) AS n_neg,
             |  CASE WHEN n1 > 0 AND n - n1 > 0 THEN
             |    (CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
             |    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE))
             |  END AS auc
             |FROM st ORDER BY segment""".stripMargin)),

    // ---- q226: MANN-WHITNEY U per event type — are weekend event
    // values shifted vs weekdays? The nonparametric complement to
    // q151's Welch t, over the same midrank machinery as q225 plus
    // the tie-corrected variance. Weekend = epoch-day mod 7 ∈ {2,3}
    // (Sat/Sun; day 0 = Thu 1970-01-01) — the q183 calendar-free
    // discipline. Exact integers to the final pinned-double z.
    Q(
      "q226_mann_whitney",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"event_type".isNotNull && $"ts".isNotNull &&
            $"value".isNotNull && !isnan($"value"))
          .select($"event_type".as("et"), $"value".as("v"),
            (floor(unix_micros($"ts") / lit(86400000000L)).cast("long") % 7)
              .isin(2, 3).cast("long").as("y"))
        RankStats.mannWhitney(ev, $"et", $"v", $"y")
          .select($"k".as("event_type"), $"n1", $"n0", $"u1", $"z")
          .orderBy($"event_type")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT event_type AS k, value AS v,
             |    CASE WHEN CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) % 7 IN (2, 3)
             |      THEN 1 ELSE 0 END AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |    AND value IS NOT NULL AND NOT isnan(value)),
             |cells AS (SELECT k, v, count(*) AS c, sum(y) AS p
             |  FROM base GROUP BY k, v),
             |w AS (SELECT k, c, p,
             |    coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             |  FROM cells),
             |st AS (SELECT k, sum(c) AS n, sum(p) AS n1,
             |    sum(p * (2*cb + c + 1)) AS r1x2,
             |    sum(c*c*c - c) AS ties
             |  FROM w GROUP BY k),
             |fin AS (SELECT k, n, n1, n - n1 AS n0,
             |    (CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
             |      / 2.0 AS u1,
             |    CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0 *
             |      ((CAST(n AS DOUBLE) + 1.0)
             |       - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |      AS var_u
             |  FROM st)
             |SELECT k AS event_type, CAST(n1 AS BIGINT) AS n1,
             |  CAST(n0 AS BIGINT) AS n0,
             |  CASE WHEN n1 > 0 AND n0 > 0 THEN u1 END AS u1,
             |  CASE WHEN n1 > 0 AND n0 > 0 AND var_u > 0 THEN
             |    (u1 - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 2.0) / sqrt(var_u)
             |  END AS z
             |FROM fin ORDER BY event_type""".stripMargin)),

    // ---- q227: BOUNDED-ROUND WEIGHTED SSSP — minimum path cost from
    // supplier 0 over the q152 supplier—part graph, edges weighted by
    // the minimum shipped quantity, within ≤ 4 edges. Frontier
    // Bellman-Ford ([[graft.operators.Graph.ssspBoundedRounds]]);
    // exact long costs. The oracle unrolls the same four synchronous
    // relaxation rounds as chained min-collapse CTEs (a recursive CTE
    // would enumerate PATHS and explode; per-round min collapse is
    // the algorithm itself, so the replay is by construction).
    Q(
      "q227_sssp_bounded",
      (s, d) => {
        import s.implicits._
        val e = Tables.lineitem(s, d).select(
          ($"l_suppkey" * 2).as("sa"), ($"l_partkey" * 2 + 1).as("pb"),
          $"l_quantity".cast("long").as("w"))
        graft.operators.Graph.ssspBoundedRounds(
          e, $"sa", $"pb", $"w", source = 0L, rounds = 4)
          .select(
            when($"node" % 2 === 0, "s").otherwise("p").as("node_kind"),
            expr("node div 2").as("key"), $"dist")
          .orderBy($"node_kind", $"key")
      },
      Some("""WITH ed0 AS MATERIALIZED (
             |  SELECT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b,
             |    min(CAST(l_quantity AS BIGINT)) AS w
             |  FROM lineitem GROUP BY 1, 2),
             |ed AS MATERIALIZED (
             |  SELECT a, b, min(w) AS w FROM (
             |    SELECT a, b, w FROM ed0
             |    UNION ALL SELECT b AS a, a AS b, w FROM ed0)
             |  GROUP BY a, b),
             |d0 AS MATERIALIZED (
             |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
             |d1 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
             |  SELECT node, dist FROM d0
             |  UNION ALL SELECT ed.b AS node, d0.dist + ed.w AS dist
             |  FROM d0 JOIN ed ON d0.node = ed.a) GROUP BY node),
             |d2 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
             |  SELECT node, dist FROM d1
             |  UNION ALL SELECT ed.b AS node, d1.dist + ed.w AS dist
             |  FROM d1 JOIN ed ON d1.node = ed.a) GROUP BY node),
             |d3 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
             |  SELECT node, dist FROM d2
             |  UNION ALL SELECT ed.b AS node, d2.dist + ed.w AS dist
             |  FROM d2 JOIN ed ON d2.node = ed.a) GROUP BY node),
             |d4 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
             |  SELECT node, dist FROM d3
             |  UNION ALL SELECT ed.b AS node, d3.dist + ed.w AS dist
             |  FROM d3 JOIN ed ON d3.node = ed.a) GROUP BY node)
             |SELECT CASE WHEN node % 2 = 0 THEN 's' ELSE 'p' END AS node_kind,
             |  node // 2 AS key, dist
             |FROM d4 ORDER BY node_kind, key""".stripMargin)),

    // ---- q228: HOLT-WINTERS additive seasonal smoothing — per
    // event type's DAILY value series with a weekly (m=7) seasonal
    // register, over the zero-filled dense grid (season position is
    // calendar-true). q185's fold geometry with a 9-element rotating
    // accumulator; the oracle replays the identical op order via
    // list_reduce (seed = the first 9-element element, the q185
    // trick) and gates at 1e-9 (the daily decimal→double cast ulp).
    Q(
      "q228_holt_winters",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.holtWinters(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L,
          m = 7, alpha = 0.25, beta = 0.125, gamma = 0.25)
          .orderBy($"key")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q228_holt_winters/*.parquet')),
             |o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vd
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1 FROM o GROUP BY k),
             |grid AS (SELECT k, unnest(generate_series(p0, p1)) AS period FROM sp),
             |gv AS (SELECT g.k, g.period, coalesce(o.vd, CAST('0' AS DOUBLE)) AS vd
             |  FROM grid g LEFT JOIN o ON g.k = o.k AND g.period = o.period),
             |se AS (SELECT k, count(*) AS n, max(period) AS lastp,
             |    list([vd, CAST('0' AS DOUBLE), CAST('0' AS DOUBLE), CAST('0' AS DOUBLE),
             |          CAST('0' AS DOUBLE), CAST('0' AS DOUBLE), CAST('0' AS DOUBLE),
             |          CAST('0' AS DOUBLE), CAST('0' AS DOUBLE)] ORDER BY period) AS l
             |  FROM gv GROUP BY k),
             |ex AS (SELECT k, n, lastp,
             |    list_reduce(l, (acc, x) ->
             |      [CAST('0.25' AS DOUBLE) * (x[1] - acc[3])
             |         + CAST('0.75' AS DOUBLE) * (acc[1] + acc[2]),
             |       CAST('0.125' AS DOUBLE) * ((CAST('0.25' AS DOUBLE) * (x[1] - acc[3])
             |           + CAST('0.75' AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
             |         + CAST('0.875' AS DOUBLE) * acc[2]]
             |      || acc[4:9]
             |      || [CAST('0.25' AS DOUBLE) * (x[1] - (CAST('0.25' AS DOUBLE) * (x[1] - acc[3])
             |            + CAST('0.75' AS DOUBLE) * (acc[1] + acc[2])))
             |          + CAST('0.75' AS DOUBLE) * acc[3]]) AS st
             |  FROM se),
             |expect AS (SELECT k, n, lastp, st[1] AS level, st[2] AS trend,
             |    st[3] AS sn, st[1] + st[2] + st[3] AS fc FROM ex),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT key) FROM emitted) = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.key = x.k
             |      WHERE e.n_periods <> x.n OR e.last_period <> x.lastp
             |         OR abs(e.level - x.level) > 1e-9 OR abs(e.trend - x.trend) > 1e-9
             |         OR abs(e.season_next - x.sn) > 1e-9
             |         OR abs(e.forecast_next - x.fc) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.key NOT IN (SELECT k FROM expect))
             |  ) AS ok)
             |SELECT key, n_periods, last_period, level, trend, season_next, forecast_next
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'poison', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q229: LARGEST-REMAINDER ALLOCATION — 1000 budget units per
    // region split across its nations proportional to order revenue
    // (exact integer cents). Hamilton apportionment
    // ([[graft.operators.Allocation]]): Σ alloc = 1000 in every
    // region by construction, all int64 arithmetic — hash-exact.
    Q(
      "q229_largest_remainder",
      (s, d) => {
        import s.implicits._
        val rev = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(Tables.nation(s, d), $"n_nationkey" === $"c_nationkey")
          .join(Tables.region(s, d), $"r_regionkey" === $"n_regionkey")
          .select($"r_name", $"n_name",
            ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
        graft.operators.Allocation.largestRemainder(
          rev, $"r_name", $"n_name", $"cents", total = 1000L)
          .select($"group".as("region"), $"item".as("nation"), $"alloc")
          .orderBy($"region", $"nation")
      },
      Some("""WITH rev AS MATERIALIZED (
             |  SELECT r_name AS g, n_name AS i,
             |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS w
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey
             |  GROUP BY 1, 2),
             |tot AS (SELECT g, sum(w) AS gw FROM rev GROUP BY g),
             |based AS MATERIALIZED (
             |  SELECT rev.g, i, (1000 * w) // gw AS base, (1000 * w) % gw AS rem
             |  FROM rev JOIN tot ON rev.g = tot.g),
             |lo AS (SELECT g, 1000 - sum(base) AS r FROM based GROUP BY g),
             |rk AS (SELECT based.g, based.i, based.base, lo.r,
             |    row_number() OVER (PARTITION BY based.g
             |      ORDER BY based.rem DESC, based.i ASC) AS rn
             |  FROM based JOIN lo ON based.g = lo.g)
             |SELECT g AS region, i AS nation,
             |  CAST(base + CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT) AS alloc
             |FROM rk ORDER BY region, nation""".stripMargin)),

    // ---- q230: CLAMPED RUNNING BALANCE — per customer, orders fold
    // as signed cent deltas (even orderkey deposits, odd withdraws)
    // clamped at zero ([[graft.operators.Ledger]]): the non-linear
    // inventory recurrence no window aggregate can express. Exact
    // int64; the oracle is the q222-style recursive integer replay.
    Q(
      "q230_clamped_balance",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_custkey", $"o_orderdate", $"o_orderkey",
          (when($"o_orderkey" % 2 === 0, 1L).otherwise(-1L) *
            ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")).as("d"))
        graft.operators.Ledger.clampedRunningSum(
          o, $"o_custkey", $"o_orderdate", $"o_orderkey", $"d")
          .orderBy($"key")
      },
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT o_custkey AS k, o_orderkey AS tb,
             |    (CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END) *
             |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS d,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
             |    AND o_orderkey IS NOT NULL),
             |st(k, rn, bal, clamps) AS (
             |  SELECT k, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
             |  FROM (SELECT DISTINCT k FROM ev)
             |  UNION ALL
             |  SELECT s.k, e.rn,
             |    CASE WHEN s.bal + e.d < 0 THEN 0 ELSE s.bal + e.d END,
             |    s.clamps + CASE WHEN s.bal + e.d < 0 THEN 1 ELSE 0 END
             |  FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1),
             |fin AS (SELECT k, max(rn) AS mx FROM st GROUP BY k)
             |SELECT s.k AS key, s.rn AS n_events, s.bal AS final_balance,
             |  s.clamps AS clamp_count
             |FROM st s JOIN fin f ON s.k = f.k AND s.rn = f.mx
             |ORDER BY key""".stripMargin)),

    // ---- q231: ZONE-MAP SKIPPING AUDIT — the same lineitem rows
    // under two file layouts (64 hash-placed files vs 32-day
    // shipdate-range files), each layout's per-file min/max zone maps
    // scored against a one-month shipdate predicate
    // ([[graft.operators.ZoneMap]]). The number that justifies
    // clustering at 100 TB: hash placement skips ~nothing, range
    // placement skips ~everything. All exact integers.
    Q(
      "q231_zonemap_audit",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          // the parquet column is TIMESTAMP_NTZ; the session is
          // pinned UTC so the cast is the identity instant
          $"l_orderkey", unix_micros($"l_shipdate".cast("timestamp")).as("sd"))
        val lo = unix_micros(lit("1995-06-01").cast("timestamp"))
        val hi = unix_micros(lit("1995-06-30").cast("timestamp"))
        val hashStats = graft.operators.ZoneMap.fileStats(
          li, graft.operators.KmvSketch.hash60($"l_orderkey") % 64, $"sd")
        val clusStats = graft.operators.ZoneMap.fileStats(
          li, floor($"sd" / lit(32L * 86400000000L)).cast("long"), $"sd")
        def tag(t: String, df: org.apache.spark.sql.DataFrame) =
          df.select(lit(t).as("layout"), $"n_files", $"n_rows",
            $"files_skipped", $"rows_skipped", $"rows_scanned")
        tag("hash64", graft.operators.ZoneMap.skippingSummary(hashStats, lo, hi))
          .unionByName(
            tag("date32", graft.operators.ZoneMap.skippingSummary(clusStats, lo, hi)))
          .orderBy($"layout")
      },
      Some(s"""WITH li AS MATERIALIZED (
             |  SELECT ${graft.operators.KmvSketch.hash60Sql("l_orderkey")} % 64 AS fh,
             |    CAST(floor(epoch_us(l_shipdate) / 2764800000000) AS BIGINT) AS fc,
             |    epoch_us(l_shipdate) AS sd
             |  FROM lineitem),
             |b AS (SELECT epoch_us(TIMESTAMP '1995-06-01') AS lo,
             |    epoch_us(TIMESTAMP '1995-06-30') AS hi),
             |hs AS (SELECT fh, min(sd) AS zmin, max(sd) AS zmax, count(*) AS rows_
             |  FROM li GROUP BY fh),
             |cs AS (SELECT fc, min(sd) AS zmin, max(sd) AS zmax, count(*) AS rows_
             |  FROM li GROUP BY fc),
             |su AS (
             |  SELECT 'hash64' AS layout, count(*) AS n_files,
             |    CAST(sum(rows_) AS BIGINT) AS n_rows,
             |    CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
             |    CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN rows_ ELSE 0 END) AS BIGINT) AS rows_skipped,
             |    CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN 0 ELSE rows_ END) AS BIGINT) AS rows_scanned
             |  FROM hs, b
             |  UNION ALL
             |  SELECT 'date32', count(*),
             |    CAST(sum(rows_) AS BIGINT),
             |    CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN rows_ ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN zmax < lo OR zmin > hi THEN 0 ELSE rows_ END) AS BIGINT)
             |  FROM cs, b)
             |SELECT layout, n_files, n_rows, files_skipped, rows_skipped, rows_scanned
             |FROM su ORDER BY layout""".stripMargin)),

    // ---- q232: AUTOCORRELATION FUNCTION — each event type's daily
    // value series (zero-filled dense grid, so lags are calendar-
    // true) at lags 1/2/3/7 ([[graft.operators.TimeSeries
    // .autocorrelation]]): the persistence/weekly-rhythm diagnostic.
    // Exact decimal sufficient statistics, lead windows over the
    // bounded per-key grid, one pinned-double closed form — the
    // oracle replays the identical structure and hash-matches.
    Q(
      "q232_acf",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.autocorrelation(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L,
          lags = Seq(1, 2, 3, 7))
          .orderBy($"key", $"lag")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1 FROM o GROUP BY k),
             |grid AS (SELECT k, unnest(generate_series(p0, p1)) AS period FROM sp),
             |gv AS (SELECT g.k, g.period,
             |    CAST(CAST(coalesce(o.x, CAST(0 AS DECIMAL(18,6))) AS DECIMAL(19,6))
             |      * 1000000 AS DECIMAL(19,0)) AS x
             |  FROM grid g LEFT JOIN o ON g.k = o.k AND g.period = o.period),
             |ld AS MATERIALIZED (SELECT k, x,
             |    lead(x, 1) OVER (PARTITION BY k ORDER BY period) AS y1,
             |    lead(x, 2) OVER (PARTITION BY k ORDER BY period) AS y2,
             |    lead(x, 3) OVER (PARTITION BY k ORDER BY period) AS y3,
             |    lead(x, 7) OVER (PARTITION BY k ORDER BY period) AS y7
             |  FROM gv),
             |st AS (SELECT k, count(*) AS n,
             |    sum(x) AS s,
             |    sum(x * x) AS q,
             |    count(y1) AS nk1, sum(x * y1) AS p1,
             |    sum(CASE WHEN y1 IS NOT NULL THEN x END) AS h1, sum(y1) AS t1,
             |    count(y2) AS nk2, sum(x * y2) AS p2,
             |    sum(CASE WHEN y2 IS NOT NULL THEN x END) AS h2, sum(y2) AS t2,
             |    count(y3) AS nk3, sum(x * y3) AS p3,
             |    sum(CASE WHEN y3 IS NOT NULL THEN x END) AS h3, sum(y3) AS t3,
             |    count(y7) AS nk7, sum(x * y7) AS p7,
             |    sum(CASE WHEN y7 IS NOT NULL THEN x END) AS h7, sum(y7) AS t7
             |  FROM ld GROUP BY k),
             |fin AS MATERIALIZED (SELECT *,
             |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS xb,
             |    CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS den
             |  FROM st),
             |longf AS (
             |  SELECT k, CAST(1 AS INTEGER) AS lag, nk1 AS n_pairs,
             |    CASE WHEN den > 0 AND nk1 > 0 THEN
             |      (CAST(p1 AS DOUBLE) - xb * CAST(coalesce(h1, 0) AS DOUBLE)
             |       - xb * CAST(coalesce(t1, 0) AS DOUBLE)
             |       + CAST(nk1 AS DOUBLE) * xb * xb) / den END AS acf FROM fin
             |  UNION ALL
             |  SELECT k, CAST(2 AS INTEGER), nk2,
             |    CASE WHEN den > 0 AND nk2 > 0 THEN
             |      (CAST(p2 AS DOUBLE) - xb * CAST(coalesce(h2, 0) AS DOUBLE)
             |       - xb * CAST(coalesce(t2, 0) AS DOUBLE)
             |       + CAST(nk2 AS DOUBLE) * xb * xb) / den END FROM fin
             |  UNION ALL
             |  SELECT k, CAST(3 AS INTEGER), nk3,
             |    CASE WHEN den > 0 AND nk3 > 0 THEN
             |      (CAST(p3 AS DOUBLE) - xb * CAST(coalesce(h3, 0) AS DOUBLE)
             |       - xb * CAST(coalesce(t3, 0) AS DOUBLE)
             |       + CAST(nk3 AS DOUBLE) * xb * xb) / den END FROM fin
             |  UNION ALL
             |  SELECT k, CAST(7 AS INTEGER), nk7,
             |    CASE WHEN den > 0 AND nk7 > 0 THEN
             |      (CAST(p7 AS DOUBLE) - xb * CAST(coalesce(h7, 0) AS DOUBLE)
             |       - xb * CAST(coalesce(t7, 0) AS DOUBLE)
             |       + CAST(nk7 AS DOUBLE) * xb * xb) / den END FROM fin)
             |SELECT k AS key, lag, n_pairs, acf FROM longf ORDER BY key, lag""".stripMargin)),

    // ---- q233: MANN-KENDALL trend test — is each event type's daily
    // volume monotonically drifting? The significance complement to
    // q148's Theil-Sen slope, same per-key O(span²) pair geometry
    // ([[graft.operators.TimeSeries.mannKendall]]). S and the tie
    // correction are exact integers; z is one pinned-double form.
    Q(
      "q233_mann_kendall",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.mannKendall(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, count(*) AS n FROM o GROUP BY k),
             |ss AS (SELECT a.k,
             |    sum(CAST(sign(CAST(b.y AS DECIMAL(19,6)) - CAST(a.y AS DECIMAL(19,6))) AS BIGINT)) AS s_stat
             |  FROM o a JOIN o b ON a.k = b.k AND a.period < b.period
             |  GROUP BY a.k),
             |ti AS (SELECT k, sum(t * (t - 1) * (2 * t + 5)) AS ties FROM (
             |    SELECT k, y, count(*) AS t FROM o GROUP BY k, y) GROUP BY k),
             |fin AS (SELECT sp.k, sp.n,
             |    coalesce(ss.s_stat, 0) AS s_stat,
             |    CAST(sp.n * (sp.n - 1) * (2 * sp.n + 5) - ti.ties AS DOUBLE) / 18.0 AS var_s
             |  FROM sp LEFT JOIN ss ON sp.k = ss.k JOIN ti ON sp.k = ti.k)
             |SELECT k AS key, n AS n_periods, CAST(s_stat AS BIGINT) AS s_stat,
             |  CASE WHEN n >= 2 AND var_s > 0 THEN
             |    CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
             |         WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
             |         ELSE 0.0 END
             |  END AS z
             |FROM fin ORDER BY key""".stripMargin)),

    // ---- q234: WALD-WOLFOWITZ RUNS TEST — does each event type's
    // daily volume oscillate randomly around its mean, or clump into
    // momentum runs? The at-or-above indicator is the division-free
    // n·x ≥ Σx decimal comparison (exact in both engines); run count
    // is one lag window over the zero-filled grid; z is pinned
    // doubles ([[graft.operators.TimeSeries.runsTest]]).
    Q(
      "q234_runs_test",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.runsTest(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1 FROM o GROUP BY k),
             |grid AS (SELECT k, unnest(generate_series(p0, p1)) AS period FROM sp),
             |gv AS (SELECT g.k, g.period, coalesce(o.x, CAST(0 AS DECIMAL(18,6))) AS x
             |  FROM grid g LEFT JOIN o ON g.k = o.k AND g.period = o.period),
             |su AS (SELECT k AS sk, count(*) AS n, sum(CAST(x AS DECIMAL(19,6))) AS s
             |  FROM gv GROUP BY k),
             |sg AS MATERIALIZED (SELECT k, period,
             |    CASE WHEN CAST(x AS DECIMAL(19,6)) * CAST(n AS DECIMAL(12,0)) >= s
             |      THEN 1 ELSE 0 END AS above, n
             |  FROM gv JOIN su ON k = sk),
             |fl AS (SELECT k, n, above,
             |    CASE WHEN lag(above, 1) OVER (PARTITION BY k ORDER BY period) IS NULL THEN 0
             |         WHEN lag(above, 1) OVER (PARTITION BY k ORDER BY period) <> above THEN 1
             |         ELSE 0 END AS flip
             |  FROM sg),
             |st AS (SELECT k, max(n) AS n, CAST(sum(above) AS BIGINT) AS n1,
             |    CAST(sum(flip) + 1 AS BIGINT) AS runs
             |  FROM fl GROUP BY k),
             |fin AS MATERIALIZED (SELECT k, n, n1, runs,
             |    2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) AS two
             |  FROM st)
             |SELECT k AS key, n AS n_periods, n1 AS n_above, runs,
             |  CASE WHEN n1 > 0 AND n - n1 > 0 AND n >= 2
             |         AND two * (two - CAST(n AS DOUBLE))
             |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0
             |    THEN (CAST(runs AS DOUBLE) - (two / CAST(n AS DOUBLE) + 1.0))
             |      / sqrt(two * (two - CAST(n AS DOUBLE))
             |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |  END AS z
             |FROM fin ORDER BY key""".stripMargin)),

    // ---- q235: POSITION-BASED MULTI-TOUCH ATTRIBUTION — every
    // pre-purchase touch shares in the next purchase, U-shaped
    // 40/20/40 in EXACT integer millicredits (largest-remainder
    // among the middles), so the per-channel rollup is an integer
    // sum and the oracle hash-matches
    // ([[graft.operators.Attribution.positionCredit]]; q157's
    // first/last-touch sibling is q157_touch_attribution's family).
    Q(
      "q235_position_attribution",
      (s, d) => {
        import s.implicits._
        graft.operators.Attribution.positionCredit(
          Tables.events(s, d),
          $"user_id", $"ts", $"event_id", $"event_type",
          $"event_type" === "purchase")
          .orderBy($"channel")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT user_id AS u, ts, event_id AS eid, event_type AS et,
             |    event_type = 'purchase' AS c
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_id IS NOT NULL AND event_type IS NOT NULL),
             |tc AS (
             |  SELECT u, ts, eid, et, c,
             |    first_value(CASE WHEN c THEN eid END IGNORE NULLS) OVER (
             |      PARTITION BY u ORDER BY ts, eid
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_id
             |  FROM base),
             |j AS (
             |  SELECT u, conv_id, et,
             |    row_number() OVER (PARTITION BY u, conv_id ORDER BY ts, eid) AS pos,
             |    count(*) OVER (PARTITION BY u, conv_id) AS m
             |  FROM tc WHERE NOT c AND conv_id IS NOT NULL),
             |cr AS (SELECT et, u, conv_id,
             |    CASE WHEN m = 1 THEN 1000
             |         WHEN m = 2 THEN 500
             |         WHEN pos = 1 THEN 400
             |         WHEN pos = m THEN 400
             |         ELSE 200 // (m - 2)
             |           + CASE WHEN pos - 1 <= 200 % (m - 2) THEN 1 ELSE 0 END
             |    END AS credit
             |  FROM j)
             |SELECT et AS channel, count(*) AS n_touches,
             |  count(DISTINCT (u, conv_id)) AS n_conversions,
             |  CAST(sum(credit) AS BIGINT) AS credit_milli
             |FROM cr GROUP BY et ORDER BY channel""".stripMargin)),

    // ---- q236: JARO-WINKLER RECORD-LINKAGE SCORING — a deterministic
    // probe set of parts (partkey ≡ 0 mod 97, the "today's new
    // entities" slice) scored against every same-first-word blocking
    // candidate with the codegen'd `graft_jaro_winkler` kernel
    // ([[graft.functions.JaroWinkler]] — byte-level, pinned to
    // DuckDB's jaro_winkler_similarity semantics). ALL candidate
    // scores are emitted (selection thresholds belong to the caller),
    // so the oracle needs no membership band — just the 1e-9 gate on
    // the score itself (float op order inside the two engines' kernels
    // is the only divergence).
    Q(
      "q236_jaro_winkler",
      (s, d) => {
        import s.implicits._
        val parts = Tables.part(s, d)
          .select($"p_partkey", $"p_name",
            split($"p_name", " ").getItem(0).as("blk"))
          .localCheckpoint(true)
        val probes = parts.filter($"p_partkey" % 97 === 0)
          .select($"p_partkey".as("probe_key"), $"p_name".as("probe_name"),
            $"blk".as("pblk"))
        probes.join(parts, $"pblk" === $"blk" && $"probe_key" =!= $"p_partkey")
          .select($"probe_key", $"p_partkey".as("cand_key"),
            graft.functions.GraftFunctions.jaroWinkler(
              s, $"probe_name", $"p_name").as("jw"))
          .orderBy($"probe_key", $"cand_key")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q236_jaro_winkler/*.parquet')),
             |b AS MATERIALIZED (SELECT p_partkey, p_name,
             |    split_part(p_name, ' ', 1) AS blk FROM part),
             |expect AS MATERIALIZED (
             |  SELECT a.p_partkey AS probe_key, c.p_partkey AS cand_key,
             |    jaro_winkler_similarity(a.p_name, c.p_name) AS jw
             |  FROM b a JOIN b c ON a.blk = c.blk AND a.p_partkey <> c.p_partkey
             |  WHERE a.p_partkey % 97 = 0),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x
             |      ON e.probe_key = x.probe_key AND e.cand_key = x.cand_key
             |      WHERE abs(e.jw - x.jw) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE NOT EXISTS (SELECT 1 FROM expect x
             |        WHERE x.probe_key = e.probe_key AND x.cand_key = e.cand_key))
             |  ) AS ok)
             |SELECT probe_key, cand_key, jw FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY probe_key, cand_key""".stripMargin)),

    // ---- q237: EXACT INTERPOLATED QUANTILES (quantile_cont / type-7)
    // — p25/p50/p75/p90 of extended price via TWO bin-id-predicate
    // rank selections per quantile + one pinned lerp
    // ([[graft.operators.ExactQuantile.selectQuantilesInterpolated]]).
    // The oracle re-derives the same two order statistics by rank and
    // replays the identical h/frac/lerp float ops — hash-exact (the
    // selected order statistics are data values, bit-equal by
    // construction; DuckDB's own quantile_cont implements exactly
    // these semantics).
    Q(
      "q237_quantile_cont",
      (s, d) => {
        import s.implicits._
        graft.operators.ExactQuantile.selectQuantilesInterpolated(
          Tables.lineitem(s, d), $"l_extendedprice", Seq(0.25, 0.5, 0.75, 0.9))
          .orderBy($"q")
      },
      Some("""WITH v AS MATERIALIZED (SELECT l_extendedprice AS v FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)),
             |nn AS (SELECT count(*) AS n FROM v),
             |r AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
             |qq AS (SELECT unnest([CAST('0.25' AS DOUBLE), CAST('0.5' AS DOUBLE),
             |    CAST('0.75' AS DOUBLE), CAST('0.9' AS DOUBLE)]) AS q),
             |hs AS (SELECT q, CAST(n - 1 AS DOUBLE) * q AS h, n FROM qq, nn),
             |sel AS (SELECT q, h, CAST(floor(h) AS BIGINT) + 1 AS klo,
             |    least(CAST(floor(h) AS BIGINT) + 2, n) AS khi FROM hs)
             |SELECT s.q, lo.v + (s.h - floor(s.h)) * (hi.v - lo.v) AS value
             |FROM sel s JOIN r lo ON lo.rn = s.klo JOIN r hi ON hi.rn = s.khi
             |ORDER BY q""".stripMargin)),

    // ---- q238: ONE-SCAN CORRELATION MATRIX — all six Pearson pairs
    // over (quantity, extendedprice, discount, tax) from a single
    // partial-aggregable pass of 15 exact decimal statistics
    // ([[graft.operators.Profiling.correlationMatrix]]; q120 is the
    // one-pair grouped sibling). Tolerance oracle — the q120 shape.
    Q(
      "q238_corr_matrix",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.correlationMatrix(
          Tables.lineitem(s, d),
          Seq("qty" -> $"l_quantity", "price" -> $"l_extendedprice",
            "disc" -> $"l_discount", "tax" -> $"l_tax"))
          .orderBy($"col_a", $"col_b")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q238_corr_matrix/*.parquet')),
             |b AS MATERIALIZED (SELECT
             |    CAST(l_quantity AS DECIMAL(19,6)) AS qty,
             |    CAST(l_extendedprice AS DECIMAL(19,6)) AS price,
             |    CAST(l_discount AS DECIMAL(19,6)) AS disc,
             |    CAST(l_tax AS DECIMAL(19,6)) AS tax
             |  FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
             |st AS (SELECT count(*) AS n,
             |    CAST(sum(qty) AS DOUBLE) AS s_qty, CAST(sum(price) AS DOUBLE) AS s_price,
             |    CAST(sum(disc) AS DOUBLE) AS s_disc, CAST(sum(tax) AS DOUBLE) AS s_tax,
             |    CAST(sum(qty * qty) AS DOUBLE) AS p_qq, CAST(sum(price * price) AS DOUBLE) AS p_pp,
             |    CAST(sum(disc * disc) AS DOUBLE) AS p_dd, CAST(sum(tax * tax) AS DOUBLE) AS p_tt,
             |    CAST(sum(qty * price) AS DOUBLE) AS p_qp, CAST(sum(qty * disc) AS DOUBLE) AS p_qd,
             |    CAST(sum(qty * tax) AS DOUBLE) AS p_qt, CAST(sum(price * disc) AS DOUBLE) AS p_pd,
             |    CAST(sum(price * tax) AS DOUBLE) AS p_pt, CAST(sum(disc * tax) AS DOUBLE) AS p_dt
             |  FROM b),
             |expect AS (
             |  SELECT 'qty' AS a, 'price' AS bb, n, p_qp AS pab, p_qq AS paa, p_pp AS pbb, s_qty AS sa, s_price AS sb FROM st
             |  UNION ALL SELECT 'qty', 'disc', n, p_qd, p_qq, p_dd, s_qty, s_disc FROM st
             |  UNION ALL SELECT 'qty', 'tax', n, p_qt, p_qq, p_tt, s_qty, s_tax FROM st
             |  UNION ALL SELECT 'price', 'disc', n, p_pd, p_pp, p_dd, s_price, s_disc FROM st
             |  UNION ALL SELECT 'price', 'tax', n, p_pt, p_pp, p_tt, s_price, s_tax FROM st
             |  UNION ALL SELECT 'disc', 'tax', n, p_dt, p_dd, p_tt, s_disc, s_tax FROM st),
             |ex2 AS (SELECT a, bb, n,
             |    CASE WHEN n > 1 AND CAST(n AS DOUBLE) * paa - sa * sa > 0
             |           AND CAST(n AS DOUBLE) * pbb - sb * sb > 0
             |      THEN (CAST(n AS DOUBLE) * pab - sa * sb)
             |        / (sqrt(CAST(n AS DOUBLE) * paa - sa * sa)
             |         * sqrt(CAST(n AS DOUBLE) * pbb - sb * sb)) END AS corr
             |  FROM expect),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 6
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN ex2 x
             |      ON e.col_a = x.a AND e.col_b = x.bb
             |      WHERE e.n <> x.n
             |         OR (e.corr IS NULL) <> (x.corr IS NULL)
             |         OR abs(coalesce(e.corr, 0) - coalesce(x.corr, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE NOT EXISTS (SELECT 1 FROM ex2 x
             |        WHERE x.a = e.col_a AND x.bb = e.col_b))
             |  ) AS ok)
             |SELECT col_a, col_b, n, corr FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY col_a, col_b""".stripMargin)),

    // ---- q239: NEGATIVE-CONDITION FUNNEL — each user's earliest
    // view→purchase within 7 days with NO error strictly between
    // (the `A (¬C)* B` exclusion pattern plain funnels can't say).
    // One window pass with two O(1) carry-forward states
    // ([[graft.operators.Funnel.negativeFunnel]]); exact (ts, id)
    // order everywhere — hash-exact oracle via the same windows.
    Q(
      "q239_negative_funnel",
      (s, d) => {
        import s.implicits._
        graft.operators.Funnel.negativeFunnel(
          Tables.events(s, d),
          $"user_id", $"ts", $"event_id", $"event_type",
          stepA = "view", stepB = "purchase", blocker = "error",
          windowUs = 7L * 86400L * 1000000L)
          .orderBy($"user")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT user_id AS u, ts, event_id AS eid, event_type AS et
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
             |    AND event_type IN ('view', 'purchase', 'error')),
             |st AS (SELECT u, ts, eid, et,
             |    last_value(CASE WHEN et = 'view' THEN {'ts': ts, 'eid': eid} END
             |      IGNORE NULLS) OVER (PARTITION BY u ORDER BY ts, eid
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS la,
             |    last_value(CASE WHEN et = 'error' THEN {'ts': ts, 'eid': eid} END
             |      IGNORE NULLS) OVER (PARTITION BY u ORDER BY ts, eid
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
             |  FROM base),
             |cand AS (SELECT u, ts, eid, la, lc FROM st
             |  WHERE et = 'purchase' AND la IS NOT NULL
             |    AND epoch_us(ts) - epoch_us(la.ts) <= 604800000000
             |    AND (lc IS NULL OR NOT (lc > la))),
             |rk AS (SELECT u, la.ts AS a_ts, la.eid AS a_id, ts AS b_ts, eid AS b_id,
             |    row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS rn FROM cand)
             |SELECT u AS "user", a_ts, a_id, b_ts, b_id,
             |  epoch_us(b_ts) - epoch_us(a_ts) AS gap_us
             |FROM rk WHERE rn = 1 ORDER BY "user"""".stripMargin)),

    // ---- q240: ISOTONIC CALIBRATION — monotone regression of the
    // urgent-order rate onto 16 account-balance bins via the MINIMAX
    // closed form (max_{j≤i} min_{k≥i} mean(j..k)) on the bounded
    // cell frame — fully declarative PAVA, no sequential stack
    // ([[graft.operators.ModelEval.isotonicBins]]). Every candidate
    // mean is one double division of exact integers and min/max picks
    // among identical doubles — hash-exact.
    Q(
      "q240_isotonic_bins",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("uk")).distinct()
        val scored = Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"uk", "left")
          .select($"c_acctbal".as("sc"), $"uk".isNotNull.cast("long").as("y"))
        graft.operators.ModelEval.isotonicBins(scored, $"sc", $"y", bins = 16)
          .orderBy($"bin")
      },
      Some("""WITH u AS (SELECT DISTINCT o_custkey AS uk FROM orders
             |  WHERE o_orderpriority = '1-URGENT'),
             |b AS MATERIALIZED (SELECT c_acctbal AS s,
             |    CASE WHEN u.uk IS NOT NULL THEN 1 ELSE 0 END AS y
             |  FROM customer LEFT JOIN u ON c_custkey = u.uk
             |  WHERE c_acctbal IS NOT NULL AND NOT isnan(c_acctbal)),
             |sp AS (SELECT min(s) AS lo, max(s) AS hi FROM b),
             |cells AS MATERIALIZED (SELECT CASE WHEN hi / 16 - lo / 16 = 0 THEN 0
             |    ELSE least(CAST(floor(s / (hi / 16 - lo / 16)
             |      - lo / (hi / 16 - lo / 16)) AS INTEGER), 15)
             |    END AS bin,
             |    count(*) AS n, sum(y) AS pos
             |  FROM b, sp GROUP BY 1),
             |segs AS MATERIALIZED (
             |  SELECT j.bin AS jb, k.bin AS kb,
             |    CAST(sum(c.pos) AS DOUBLE) / CAST(sum(c.n) AS DOUBLE) AS avg
             |  FROM cells j JOIN cells k ON j.bin <= k.bin
             |  JOIN cells c ON c.bin >= j.bin AND c.bin <= k.bin
             |  GROUP BY 1, 2),
             |inner1 AS (SELECT i.bin AS ib, s.jb, min(s.avg) AS m
             |  FROM cells i JOIN segs s ON s.kb >= i.bin GROUP BY 1, 2),
             |iso AS (SELECT ib, max(m) AS rate_iso FROM inner1
             |  WHERE jb <= ib GROUP BY ib)
             |SELECT c.bin, c.n, CAST(c.pos AS BIGINT) AS pos,
             |  CAST(c.pos AS DOUBLE) / CAST(c.n AS DOUBLE) AS rate_raw, i.rate_iso
             |FROM cells c JOIN iso i ON c.bin = i.ib ORDER BY bin""".stripMargin)),

    // ---- q241: FIFO LOT MATCHING — per part, odd-orderkey lineitems
    // sell against even-orderkey buy lots oldest-first (ship-date
    // order); realized COGS at each lot's integer unit cost. The
    // sequential lot queue is replaced by the order-independent
    // cumulative form ([[graft.operators.Fifo]]): one per-key
    // cumulative window + one aggregate, exact int64 throughout —
    // hash-exact oracle. Oversold parts surface as unmatched_sold.
    Q(
      "q241_fifo_matching",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_partkey",
          $"l_shipdate".cast("timestamp").as("sd"),
          ($"l_orderkey" * 8 + $"l_linenumber").as("tb"),
          $"l_quantity".cast("long").as("qv"),
          ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long").as("cents"),
          $"l_orderkey".as("ok"))
        val buys = li.filter($"ok" % 2 === 0)
          .withColumn("uc", expr("cents div qv"))
        val sells = li.filter($"ok" % 2 === 1)
        graft.operators.Fifo.matchLots(
          buys, sells,
          buyKey = $"l_partkey", buyTs = $"sd", buyTiebreak = $"tb",
          buyQty = $"qv", buyUnitCost = $"uc",
          sellKey = $"l_partkey", sellQty = $"qv")
          // money is decimal(38,0) in the operator (int64 products
          // overflow); carried as VARCHAR digests for the oracle
          // compare like the other decimal(38,0) queries
          .withColumn("cogs", $"cogs".cast("string"))
          .withColumn("remaining_cost", $"remaining_cost".cast("string"))
          .orderBy($"key")
      },
      Some("""WITH b AS MATERIALIZED (SELECT l_partkey AS k, l_shipdate AS ts,
             |    l_orderkey * 8 + l_linenumber AS tb,
             |    CAST(l_quantity AS BIGINT) AS q,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      // CAST(l_quantity AS BIGINT) AS c
             |  FROM lineitem WHERE l_orderkey % 2 = 0),
             |s AS MATERIALIZED (SELECT l_partkey AS k,
             |    sum(CAST(l_quantity AS BIGINT)) AS sold
             |  FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1),
             |lots AS (SELECT b.k, q, c,
             |    coalesce(sum(q) OVER (PARTITION BY b.k ORDER BY ts, tb
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumBefore,
             |    coalesce(s.sold, 0) AS soldT
             |  FROM b LEFT JOIN s ON b.k = s.k),
             |m AS (SELECT k, q, c, soldT,
             |    greatest(0, least(q, soldT - cumBefore)) AS matched FROM lots),
             |pk AS (SELECT k, sum(q) AS bought_qty, max(soldT) AS sold_qty,
             |    sum(matched) AS matched_qty, sum(matched * c) AS cogs,
             |    sum(q - matched) AS remaining_qty,
             |    sum((q - matched) * c) AS remaining_cost
             |  FROM m GROUP BY k),
             |so AS (SELECT s.k, CAST(0 AS BIGINT) AS bought_qty, s.sold AS sold_qty,
             |    CAST(0 AS BIGINT) AS matched_qty, CAST(0 AS BIGINT) AS cogs,
             |    CAST(0 AS BIGINT) AS remaining_qty, CAST(0 AS BIGINT) AS remaining_cost
             |  FROM s LEFT JOIN (SELECT DISTINCT k FROM b) bb ON s.k = bb.k
             |  WHERE bb.k IS NULL),
             |al AS (SELECT * FROM pk UNION ALL SELECT * FROM so)
             |SELECT k AS key, CAST(bought_qty AS BIGINT) AS bought_qty,
             |  CAST(sold_qty AS BIGINT) AS sold_qty,
             |  CAST(matched_qty AS BIGINT) AS matched_qty,
             |  CAST(CAST(cogs AS DECIMAL(38,0)) AS VARCHAR) AS cogs,
             |  CAST(remaining_qty AS BIGINT) AS remaining_qty,
             |  CAST(CAST(remaining_cost AS DECIMAL(38,0)) AS VARCHAR)
             |    AS remaining_cost,
             |  CAST(greatest(0, sold_qty - bought_qty) AS BIGINT) AS unmatched_sold
             |FROM al ORDER BY key""".stripMargin)),

    // ---- q242: TIME-DECAY TOUCH MASS — q235's journeys weighted by
    // recency with a one-day half-life in EXACT dyadic integers
    // (2^(40−age) units of 2⁻⁴⁰ — no float decay sums;
    // [[graft.operators.Attribution.decayedTouchMass]]). Channel
    // share is one double division of exact integers — hash-exact.
    Q(
      "q242_decay_attribution",
      (s, d) => {
        import s.implicits._
        graft.operators.Attribution.decayedTouchMass(
          Tables.events(s, d),
          $"user_id", $"ts", $"event_id", $"event_type",
          $"event_type" === "purchase", maxAgeDays = 40)
          .orderBy($"channel")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT user_id AS u, ts, event_id AS eid, event_type AS et,
             |    event_type = 'purchase' AS c
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_id IS NOT NULL AND event_type IS NOT NULL),
             |tc AS (
             |  SELECT u, ts, eid, et, c,
             |    first_value(CASE WHEN c THEN {'ts': ts, 'eid': eid} END
             |      IGNORE NULLS) OVER (
             |      PARTITION BY u ORDER BY ts, eid
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc
             |  FROM base),
             |j AS (SELECT et,
             |    CAST(1 AS BIGINT) << CAST(40 - least(
             |      CAST(floor((epoch_us(nc.ts) - epoch_us(ts)) / 86400000000) AS BIGINT),
             |      40) AS INTEGER) AS mass
             |  FROM tc WHERE NOT c AND nc IS NOT NULL),
             |pc AS (SELECT et AS channel, count(*) AS n_touches,
             |    CAST(sum(mass) AS BIGINT) AS mass
             |  FROM j GROUP BY et)
             |SELECT channel, n_touches, mass,
             |  CAST(mass AS DOUBLE) / CAST(sum(mass) OVER () AS DOUBLE) AS share
             |FROM pc ORDER BY channel""".stripMargin)),

    // ---- q243: STREAMING NEGATIVE FUNNEL — `view (¬error)* purchase`
    // within 7 days as a LIVE operator, the watermark-buffer
    // template's fourth instance ([[graft.streaming.NegativeFunnel]]),
    // with CONSUMPTION semantics (each view credits at most one
    // purchase — the unbounded-stream contract; q239 is the
    // earliest-only batch sibling). Batch membership is scrambled
    // exactly like q203/q223 (hash-chosen trailing bands one batch
    // late, inside the 2-day delay) + the far-future flush sentinel;
    // the state store must drain to ZERO rows. Oracle = recursive
    // replay of the same fold (multiset unchanged by the scramble).
    Q(
      "q243_streaming_negative_funnel",
      (s, d) => streamingNegativeFunnel(s, d),
      Some("""WITH RECURSIVE ev AS MATERIALIZED (
             |  SELECT user_id AS k, epoch_us(ts) AS t, event_id AS id, event_type AS et,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events
             |  WHERE event_type IN ('view', 'purchase', 'error')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL),
             |st(k, rn, aT, cAfter, emit_a, emit_b) AS (
             |  SELECT k, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), false,
             |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
             |  FROM (SELECT DISTINCT k FROM ev)
             |  UNION ALL
             |  SELECT s.k, e.rn,
             |    CASE WHEN e.et = 'view' THEN e.t
             |         WHEN x.valid THEN CAST(NULL AS BIGINT)
             |         ELSE s.aT END,
             |    CASE WHEN e.et = 'view' THEN false
             |         WHEN x.valid THEN false
             |         WHEN e.et = 'error' AND s.aT IS NOT NULL THEN true
             |         ELSE s.cAfter END,
             |    CASE WHEN x.valid THEN s.aT END,
             |    CASE WHEN x.valid THEN e.t END
             |  FROM st s JOIN ev e ON e.k = s.k AND e.rn = s.rn + 1,
             |  LATERAL (SELECT (e.et = 'purchase' AND s.aT IS NOT NULL
             |    AND NOT s.cAfter AND e.t - s.aT <= 604800000000) AS valid) x)
             |SELECT k AS user_id, emit_a AS a_us, emit_b AS b_us
             |FROM st WHERE emit_a IS NOT NULL
             |ORDER BY user_id, a_us, b_us""".stripMargin))
  )

  /** q244 lives in [[all2]] (this file's Seq literal hit the JVM
    * method-size comfort zone).
    */
  val all2: Seq[Q] = Seq(

    // ---- q244: EXACT-COUNT STRATIFIED SAMPLE — exactly 250 docs,
    // proportional per language via largest-remainder seats, quotas
    // filled in content-hash order with the bucketed crossing-cell
    // selection (no per-stratum global sort — q48's lesson;
    // [[graft.operators.Sampling.exactStratifiedTake]]). The oracle
    // is the equivalent per-stratum row_number ≤ k_s over the same
    // (hash-as-double, id) order — hash-exact, and Σ rows = 250 by
    // construction at every scale.
    Q(
      "q244_exact_stratified_take",
      (s, d) => {
        import s.implicits._
        graft.operators.Sampling.exactStratifiedTake(
          Tables.documents(s, d),
          stratum = $"lang", hashOn = $"text", id = $"doc_id", total = 250L)
          .orderBy($"stratum", $"id")
      },
      Some(s"""WITH b AS MATERIALIZED (
             |  SELECT lang AS g,
             |    CAST(${graft.operators.KmvSketch.hash60Sql("text")} AS DOUBLE) AS h,
             |    doc_id AS rid
             |  FROM documents
             |  WHERE lang IS NOT NULL AND text IS NOT NULL AND doc_id IS NOT NULL),
             |cnt AS MATERIALIZED (SELECT g, count(*) AS n FROM b GROUP BY g),
             |tot AS (SELECT sum(n) AS nn FROM cnt),
             |based AS MATERIALIZED (
             |  SELECT g, (250 * n) // nn AS base, (250 * n) % nn AS rem
             |  FROM cnt, tot),
             |lo AS (SELECT 250 - sum(base) AS r FROM based),
             |rk AS (SELECT g, base,
             |    row_number() OVER (ORDER BY rem DESC, g ASC) AS rn FROM based),
             |al AS (SELECT g, base + CASE WHEN rn <= (SELECT r FROM lo)
             |    THEN 1 ELSE 0 END AS k FROM rk),
             |sel AS (SELECT b.g, rid,
             |    row_number() OVER (PARTITION BY b.g ORDER BY h, rid) AS rr, k
             |  FROM b JOIN al ON b.g = al.g)
             |SELECT g AS stratum, rid AS id FROM sel WHERE rr <= k
             |ORDER BY stratum, id""".stripMargin)),

    // ---- q245: Z-ORDER LAYOUT AUDIT — the same orders under three
    // 64-file layouts (hash-placed, date-sorted, Morton-interleaved
    // customer×day via the codegen'd `graft_zorder`), each scored by
    // TWO-column zone maps against a conjunctive predicate (top
    // customer quartile AND one date octile) —
    // [[graft.operators.ZoneMap.fileStats2]]. The measurement behind
    // the Z-order pitch: date-sort skips on the date clause only;
    // Morton skips on BOTH. All exact integer arithmetic (scaling is
    // integer div; the oracle replays the interleave with the q81
    // range-sum trick) — hash-exact.
    Q(
      "q245_zorder_layout_audit",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select($"o_orderkey", $"o_custkey",
          floor(unix_micros($"o_orderdate".cast("timestamp")) / lit(86400000000L))
            .cast("long").as("day"))
          .localCheckpoint(true) // bounds pass + three layout passes
        val b = o.agg(min($"o_custkey"), max($"o_custkey"),
          min($"day"), max($"day")).collect()(0)
        val (cLo, cHi, dLo, dHi) =
          (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
        val cSpan = cHi - cLo + 1
        val dSpan = dHi - dLo + 1
        val base = o.select($"o_orderkey", $"o_custkey", $"day",
          expr(s"(o_custkey - $cLo) * 4096 div $cSpan").as("c12"),
          expr(s"(day - $dLo) * 4096 div $dSpan").as("d12"))
        val zkey = graft.functions.GraftFunctions.zorderKey(
          s, 12, Seq($"c12", $"d12"))
        val layouts = Seq(
          "hash64" -> pmod(graft.operators.KmvSketch.hash60($"o_orderkey"), lit(64L)),
          "datesort64" -> expr(s"(day - $dLo) * 64 div $dSpan"),
          "zorder64" -> shiftright(zkey, 18))
        val (pcLo, pcHi) = (cLo + cSpan * 3 / 4, cHi)
        val (pdLo, pdHi) = (dLo + dSpan * 3 / 8, dLo + dSpan * 4 / 8 - 1)
        layouts.map { case (tag, f) =>
          graft.operators.ZoneMap.skippingSummary2(
            graft.operators.ZoneMap.fileStats2(base, f, $"o_custkey", $"day"),
            lit(pcLo), lit(pcHi), lit(pdLo), lit(pdHi))
            .select(lit(tag).as("layout"), $"n_files", $"n_rows",
              $"files_skipped", $"rows_skipped", $"rows_scanned")
        }.reduce(_ unionByName _).orderBy($"layout")
      },
      Some(s"""WITH o AS MATERIALIZED (SELECT o_orderkey, o_custkey,
             |    CAST(floor(epoch_us(o_orderdate) / 86400000000) AS BIGINT) AS day
             |  FROM orders),
             |bb AS MATERIALIZED (SELECT min(o_custkey) AS clo, max(o_custkey) AS chi,
             |    min(day) AS dlo, max(day) AS dhi FROM o),
             |z AS (SELECT o_orderkey, o_custkey, day,
             |    (o_custkey - clo) * 4096 // (chi - clo + 1) AS c12,
             |    (day - dlo) * 4096 // (dhi - dlo + 1) AS d12,
             |    dlo, dhi
             |  FROM o, bb),
             |fl AS MATERIALIZED (SELECT o_custkey, day,
             |    ${graft.operators.KmvSketch.hash60Sql("o_orderkey")} % 64 AS fh,
             |    (day - dlo) * 64 // (dhi - dlo + 1) AS fd,
             |    CAST((SELECT sum(((c12 >> i) & 1) << (2 * i))
             |               + sum(((d12 >> i) & 1) << (2 * i + 1))
             |          FROM range(0, 12) t(i)) AS BIGINT) >> 18 AS fz
             |  FROM z),
             |pr AS (SELECT clo + (chi - clo + 1) * 3 // 4 AS pclo, chi AS pchi,
             |    dlo + (dhi - dlo + 1) * 3 // 8 AS pdlo,
             |    dlo + (dhi - dlo + 1) * 4 // 8 - 1 AS pdhi
             |  FROM bb),
             |hs AS (SELECT fh, min(o_custkey) AS c1, max(o_custkey) AS c2,
             |    min(day) AS d1, max(day) AS d2, count(*) AS rows_ FROM fl GROUP BY fh),
             |ds AS (SELECT fd, min(o_custkey) AS c1, max(o_custkey) AS c2,
             |    min(day) AS d1, max(day) AS d2, count(*) AS rows_ FROM fl GROUP BY fd),
             |zs AS (SELECT fz, min(o_custkey) AS c1, max(o_custkey) AS c2,
             |    min(day) AS d1, max(day) AS d2, count(*) AS rows_ FROM fl GROUP BY fz),
             |su AS (
             |  SELECT 'hash64' AS layout, count(*) AS n_files,
             |    CAST(sum(rows_) AS BIGINT) AS n_rows,
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN rows_ ELSE 0 END) AS BIGINT) AS rows_skipped,
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN 0 ELSE rows_ END) AS BIGINT) AS rows_scanned
             |  FROM hs, pr
             |  UNION ALL
             |  SELECT 'datesort64', count(*), CAST(sum(rows_) AS BIGINT),
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN rows_ ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN 0 ELSE rows_ END) AS BIGINT)
             |  FROM ds, pr
             |  UNION ALL
             |  SELECT 'zorder64', count(*), CAST(sum(rows_) AS BIGINT),
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN rows_ ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN c2 < pclo OR c1 > pchi OR d2 < pdlo OR d1 > pdhi
             |      THEN 0 ELSE rows_ END) AS BIGINT)
             |  FROM zs, pr)
             |SELECT layout, n_files, n_rows, files_skipped, rows_skipped, rows_scanned
             |FROM su ORDER BY layout""".stripMargin)),

    // ---- q246: BITEMPORAL RESTATEMENT — the same report (lineitem
    // priority attribution at ship date, ships ≤ 1996-10-31) under
    // TWO knowledge horizons: as-known-on 1996-11-01 vs final.
    // Observations record LATE (transaction time = order date +
    // orderkey mod 90 days — deterministic), so the dimension known
    // at tx1 misses versions whose VALID time already falls inside
    // the report period, and the report RESTATES once knowledge
    // completes: the off-diagonal (prio_then ≠ prio_final) counts are
    // the restatement surface, and knowledge growth guarantees no
    // matched probe ever becomes UNMATCHED (visible in the output —
    // X→UNMATCHED cells are absent). Two q198 dimension builds + two
    // q218 point-in-time joins, joined on the genuinely-unique
    // (customer, ship-day) probe cell — the synthetic lineitem REUSES
    // (orderkey, linenumber) pairs, so a row-identity join would
    // cross-pair duplicates (caught building this query). All exact;
    // hash-exact oracle via two ASOF joins.
    Q(
      "q246_bitemporal_restatement",
      (s, d) => {
        import s.implicits._
        val txUs = unix_micros($"o_orderdate".cast("timestamp")) +
          ($"o_orderkey" % 90) * 86400000000L
        val tx1 = unix_micros(lit("1996-11-01").cast("timestamp"))
        val obsAll = Tables.orders(s, d)
          .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"o_orderpriority",
            txUs.as("tx_us"))
          .localCheckpoint(true) // feeds both knowledge states
        def dimLast(obs: org.apache.spark.sql.DataFrame) = {
          val dim = graft.operators.Scd2.fromChangeLog(
            obs, key = $"o_custkey", ts = $"o_orderdate",
            tiebreak = $"o_orderkey",
            attrs = Seq("prio" -> $"o_orderpriority"))
          val wDay = org.apache.spark.sql.expressions.Window
            .partitionBy($"k", $"valid_from").orderBy($"version".desc)
          dim.withColumn("__rn", row_number().over(wDay))
            .filter($"__rn" === 1).drop("__rn")
        }
        // the attribution is a pure function of (customer, ship date),
        // and the synthetic lineitem reuses (orderkey, linenumber)
        // pairs — so probes collapse to DISTINCT (customer, day) cells
        // with multiplicities, and the two knowledge states join on
        // that genuinely-unique key
        val probe = Tables.lineitem(s, d)
          .filter($"l_shipdate".cast("timestamp") <= lit("1996-10-31").cast("timestamp"))
          .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_custkey".as("pk"), $"l_shipdate".cast("timestamp").as("sd"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // probed by both knowledge states
        def attributed(obs: org.apache.spark.sql.DataFrame, outName: String) =
          graft.operators.TemporalJoins.asofJoin(
            probe, dimLast(obs),
            probeKey = $"pk", probeTime = $"sd",
            refKey = $"k", refTime = $"valid_from",
            probeOut = Seq("pk" -> $"pk", "sd" -> $"sd", "n" -> $"n"),
            refOut = Seq(outName -> $"prio"),
            refOrder = $"version")
            .select($"pk", $"sd", $"n",
              coalesce(col(outName), lit("UNMATCHED")).as(outName))
        attributed(obsAll.filter($"tx_us" <= tx1), "prio_then")
          .join(attributed(obsAll, "prio_final").drop("n"), Seq("pk", "sd"))
          .groupBy($"prio_then", $"prio_final")
          .agg(sum($"n").as("n_lineitems"))
          .orderBy($"prio_then", $"prio_final")
      },
      Some("""WITH obs AS MATERIALIZED (
             |  SELECT o_custkey AS k, o_orderdate AS valid_from,
             |    o_orderkey AS tb, o_orderpriority AS prio,
             |    epoch_us(o_orderdate) + (o_orderkey % 90) * 86400000000 AS tx_us
             |  FROM orders),
             |surv_of AS MATERIALIZED (
             |  SELECT 1 AS horizon, k, valid_from, tb, prio FROM (
             |    SELECT *, lag(prio) OVER (PARTITION BY k ORDER BY valid_from, tb) AS prev
             |    FROM obs WHERE tx_us <= epoch_us(TIMESTAMP '1996-11-01'))
             |  WHERE prev IS NULL OR prio <> prev
             |  UNION ALL
             |  SELECT 2, k, valid_from, tb, prio FROM (
             |    SELECT *, lag(prio) OVER (PARTITION BY k ORDER BY valid_from, tb) AS prev
             |    FROM obs)
             |  WHERE prev IS NULL OR prio <> prev),
             |surv AS MATERIALIZED (
             |  SELECT horizon, k, valid_from, prio FROM surv_of
             |  QUALIFY row_number() OVER (PARTITION BY horizon, k, valid_from
             |    ORDER BY tb DESC) = 1),
             |li AS MATERIALIZED (
             |  SELECT o_custkey AS k, l_shipdate AS sd, count(*) AS n
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_shipdate <= TIMESTAMP '1996-10-31'
             |  GROUP BY 1, 2),
             |p1 AS (SELECT li.k, li.sd, li.n,
             |    coalesce(s.prio, 'UNMATCHED') AS prio_then
             |  FROM li ASOF LEFT JOIN (SELECT * FROM surv WHERE horizon = 1) s
             |    ON li.k = s.k AND li.sd >= s.valid_from),
             |p2 AS (SELECT li.k, li.sd, coalesce(s.prio, 'UNMATCHED') AS prio_final
             |  FROM li ASOF LEFT JOIN (SELECT * FROM surv WHERE horizon = 2) s
             |    ON li.k = s.k AND li.sd >= s.valid_from)
             |SELECT prio_then, prio_final, CAST(sum(n) AS BIGINT) AS n_lineitems
             |FROM p1 JOIN p2 USING (k, sd)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q247: GROUPED INTERPOLATED QUANTILES — quantile_cont per
    // return flag over the (discretized) quantity axis, q237's
    // grouped sibling ([[graft.operators.WeightedQuantile
    // .interpolatedQuantiles]]): rational h/frac arithmetic, two
    // integer-rank crossings over each group's distinct-value
    // cumulative, one pinned lerp — hash-exact.
    Q(
      "q247_grouped_quantile_cont",
      (s, d) => {
        import s.implicits._
        graft.operators.WeightedQuantile.interpolatedQuantiles(
          Tables.lineitem(s, d), $"l_returnflag", $"l_quantity",
          qs = Seq((1, 4), (1, 2), (3, 4), (9, 10)))
          .orderBy($"group", $"q_den", $"q_num")
      },
      Some("""WITH b AS MATERIALIZED (SELECT l_returnflag AS g, l_quantity AS v
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
             |    AND NOT isnan(l_quantity)),
             |pv AS (SELECT g, v, count(*) AS c FROM b GROUP BY g, v),
             |dv AS MATERIALIZED (SELECT g, v,
             |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
             |    sum(c) OVER (PARTITION BY g) AS n FROM pv),
             |qs AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4), (9, 10)) t(num, den)),
             |gn AS (SELECT DISTINCT g, n FROM dv),
             |ks AS MATERIALIZED (SELECT g, n, num, den,
             |    (n - 1) * num // den + 1 AS klo,
             |    least((n - 1) * num // den + 2, n) AS khi,
             |    CAST((n - 1) * num % den AS DOUBLE) / den AS frac
             |  FROM gn, qs),
             |lo AS (SELECT dv.g, num, den, min(v) AS xlo
             |  FROM dv JOIN ks ON dv.g = ks.g AND dv.cum >= ks.klo
             |  GROUP BY 1, 2, 3),
             |hi AS (SELECT dv.g, num, den, min(v) AS xhi
             |  FROM dv JOIN ks ON dv.g = ks.g AND dv.cum >= ks.khi
             |  GROUP BY 1, 2, 3)
             |SELECT ks.g AS "group", ks.num AS q_num, ks.den AS q_den,
             |  CAST(ks.n AS BIGINT) AS n,
             |  xlo + ks.frac * (xhi - xlo) AS value
             |FROM ks
             |JOIN lo ON ks.g = lo.g AND ks.num = lo.num AND ks.den = lo.den
             |JOIN hi ON ks.g = hi.g AND ks.num = hi.num AND ks.den = hi.den
             |ORDER BY "group", q_den, q_num""".stripMargin)),

    // ---- q248: ADDITIVE SEASONAL INDEX (STL-lite) — each event
    // type's weekday factor after removing a centered 7-day
    // moving-average trend over the dense grid
    // ([[graft.operators.TimeSeries.seasonalIndex]]; q183 is the
    // anomaly sibling, q228 the forecasting one). Detrended values
    // stay ×7 in exact decimal (no 1/7 rational), so the per-weekday
    // mean is one pinned double division — hash-exact.
    Q(
      "q248_seasonal_index",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.seasonalIndex(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L,
          halfWindow = 3)
          .orderBy($"key", $"weekday")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1 FROM o GROUP BY k),
             |grid AS (SELECT k, unnest(generate_series(p0, p1)) AS period FROM sp),
             |gv AS (SELECT g.k, g.period, coalesce(o.x, CAST(0 AS DECIMAL(18,6))) AS x
             |  FROM grid g LEFT JOIN o ON g.k = o.k AND g.period = o.period),
             |ma AS (SELECT k, period, x,
             |    sum(CAST(x AS DECIMAL(19,6))) OVER (PARTITION BY k ORDER BY period
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s,
             |    count(*) OVER (PARTITION BY k ORDER BY period
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt
             |  FROM gv),
             |det AS (SELECT k, period % 7 AS weekday,
             |    CAST(x AS DECIMAL(19,6)) * 7 - s AS d
             |  FROM ma WHERE cnt = 7)
             |SELECT k AS key, weekday, count(*) AS n_days,
             |  CAST(sum(d) AS DOUBLE) / (7.0 * CAST(count(*) AS DOUBLE)) AS seasonal
             |FROM det GROUP BY 1, 2 ORDER BY key, weekday""".stripMargin)),

    // ---- q249: COHORT LTV CURVE — users cohorted by first purchase
    // 30-day period, cumulative purchase value per cohort-age,
    // per-user LTV ([[graft.operators.Funnel.cohortLtv]] — the q106
    // retention triangle's revenue sibling). Exact decimal sums; the
    // only window is the age cumsum over the bounded (cohort, age)
    // aggregate — hash-exact.
    Q(
      "q249_cohort_ltv",
      (s, d) => {
        import s.implicits._
        graft.operators.Funnel.cohortLtv(
          Tables.events(s, d).filter($"event_type" === "purchase"),
          $"user_id", $"ts", $"value", periodSeconds = 30L * 86400L)
          .orderBy($"cohort", $"age")
      },
      Some("""WITH b AS MATERIALIZED (SELECT user_id AS u,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 2592000000000.0) AS BIGINT) AS per,
             |    coalesce(CAST(value AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))) AS v
             |  FROM events
             |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL),
             |co AS MATERIALIZED (SELECT u, min(per) AS cohort FROM b GROUP BY u),
             |sz AS (SELECT cohort, count(*) AS users FROM co GROUP BY cohort),
             |rv AS (SELECT co.cohort, b.per - co.cohort AS age,
             |    sum(CAST(v AS DECIMAL(19,6))) AS rev
             |  FROM b JOIN co ON b.u = co.u GROUP BY 1, 2),
             |cm AS (SELECT cohort, age,
             |    sum(rev) OVER (PARTITION BY cohort ORDER BY age) AS cum FROM rv)
             |SELECT cm.cohort AS cohort, age, users,
             |  CAST(cum AS DOUBLE) AS cum_revenue,
             |  CAST(cum AS DOUBLE) / CAST(users AS DOUBLE) AS ltv
             |FROM cm JOIN sz ON cm.cohort = sz.cohort
             |ORDER BY cm.cohort, age""".stripMargin)),

    // ---- q250: CONVERSION-LAG QUANTILES — the time-to-convert
    // distribution of q239's clean view→purchase journeys
    // (hour-floored so the distinct-value axis stays bounded),
    // through q247's grouped quantile_cont machinery. Composition of
    // two session operators; hash-exact end to end.
    Q(
      "q250_conversion_lag_quantiles",
      (s, d) => {
        import s.implicits._
        val gaps = graft.operators.Funnel.negativeFunnel(
          Tables.events(s, d),
          $"user_id", $"ts", $"event_id", $"event_type",
          stepA = "view", stepB = "purchase", blocker = "error",
          windowUs = 7L * 86400L * 1000000L)
          .select(lit("view_to_purchase").as("seg"),
            floor($"gap_us" / lit(3600000000L)).cast("long").as("gap_h"))
        graft.operators.WeightedQuantile.interpolatedQuantiles(
          gaps, $"seg", $"gap_h", qs = Seq((1, 4), (1, 2), (3, 4), (9, 10)))
          .orderBy($"q_den", $"q_num")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT user_id AS u, ts, event_id AS eid, event_type AS et
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
             |    AND event_type IN ('view', 'purchase', 'error')),
             |st AS (SELECT u, ts, eid, et,
             |    last_value(CASE WHEN et = 'view' THEN {'ts': ts, 'eid': eid} END
             |      IGNORE NULLS) OVER (PARTITION BY u ORDER BY ts, eid
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS la,
             |    last_value(CASE WHEN et = 'error' THEN {'ts': ts, 'eid': eid} END
             |      IGNORE NULLS) OVER (PARTITION BY u ORDER BY ts, eid
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
             |  FROM base),
             |cand AS (SELECT u, ts, eid, la, lc FROM st
             |  WHERE et = 'purchase' AND la IS NOT NULL
             |    AND epoch_us(ts) - epoch_us(la.ts) <= 604800000000
             |    AND (lc IS NULL OR NOT (lc > la))),
             |rk AS (SELECT u, epoch_us(ts) - epoch_us(la.ts) AS gap_us,
             |    row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS rn FROM cand),
             |gaps AS MATERIALIZED (SELECT
             |    CAST(floor(gap_us / 3600000000) AS BIGINT) AS v
             |  FROM rk WHERE rn = 1),
             |pv AS (SELECT v, count(*) AS c FROM gaps GROUP BY v),
             |dv AS MATERIALIZED (SELECT v,
             |    sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM pv),
             |qs AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4), (9, 10)) t(num, den)),
             |ks AS MATERIALIZED (SELECT n, num, den,
             |    (n - 1) * num // den + 1 AS klo,
             |    least((n - 1) * num // den + 2, n) AS khi,
             |    CAST((n - 1) * num % den AS DOUBLE) / den AS frac
             |  FROM (SELECT DISTINCT n FROM dv), qs),
             |lo AS (SELECT num, den, min(v) AS xlo
             |  FROM dv JOIN ks ON dv.cum >= ks.klo GROUP BY 1, 2),
             |hi AS (SELECT num, den, min(v) AS xhi
             |  FROM dv JOIN ks ON dv.cum >= ks.khi GROUP BY 1, 2)
             |SELECT 'view_to_purchase' AS "group", ks.num AS q_num,
             |  ks.den AS q_den, CAST(ks.n AS BIGINT) AS n,
             |  CAST(xlo AS DOUBLE) + ks.frac * (CAST(xhi AS DOUBLE) - CAST(xlo AS DOUBLE)) AS value
             |FROM ks
             |JOIN lo ON ks.num = lo.num AND ks.den = lo.den
             |JOIN hi ON ks.num = hi.num AND ks.den = hi.den
             |ORDER BY q_den, q_num""".stripMargin)),

    // ---- q251: Qn ROBUST SCALE — Rousseeuw-Croux's 50%-breakdown,
    // location-free scale of each event type's daily series: the
    // C(h,2)-th smallest pairwise |difference|, h = ⌊n/2⌋+1
    // ([[graft.operators.TimeSeries.qnScale]]; MAD's q210 sibling
    // without the median dependency). Theil-Sen pair geometry, exact
    // decimal diffs, integer-rank selection — hash-exact.
    Q(
      "q251_qn_scale",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.qnScale(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS MATERIALIZED (SELECT k, count(*) AS n,
             |    (count(*) // 2 + 1) * (count(*) // 2) // 2 AS rank_
             |  FROM o GROUP BY k),
             |df AS (SELECT a.k, abs(CAST(b.y AS DECIMAL(19,6)) - CAST(a.y AS DECIMAL(19,6))) AS dv
             |  FROM o a JOIN o b ON a.k = b.k AND a.period < b.period),
             |pd AS (SELECT k, dv, count(*) AS c FROM df GROUP BY k, dv),
             |cm AS MATERIALIZED (SELECT k, dv,
             |    sum(c) OVER (PARTITION BY k ORDER BY dv) AS cum FROM pd),
             |sel AS (SELECT cm.k, min(dv) AS qn
             |  FROM cm JOIN sp ON cm.k = sp.k AND cm.cum >= sp.rank_
             |  WHERE sp.rank_ > 0 GROUP BY cm.k)
             |SELECT sp.k AS key, sp.n AS n_periods, CAST(sel.qn AS DOUBLE) AS qn_raw
             |FROM sp LEFT JOIN sel ON sp.k = sel.k
             |ORDER BY key""".stripMargin)),

    // ---- q252: KENDALL τ-b — does each event type's daily VOLUME
    // move with its daily VALUE? The rank member of the correlation
    // family (q120/q238 Pearson measure linearity; τ-b survives any
    // monotone transform), concordance counted over the bounded
    // per-key period pairs ([[graft.operators.TimeSeries
    // .kendallTauDaily]]). Exact integer P/Q/ties; pinned-double
    // closed form — hash-exact.
    Q(
      "q252_kendall_tau",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.kendallTauDaily(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    count(*) AS x,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, count(*) AS n, count(*) * (count(*) - 1) // 2 AS n0
             |  FROM o GROUP BY k),
             |pr AS (SELECT a.k,
             |    CAST(sign(CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS cx,
             |    CAST(sign(CAST(b.y AS DECIMAL(19,6)) - CAST(a.y AS DECIMAL(19,6))) AS BIGINT) AS cy
             |  FROM o a JOIN o b ON a.k = b.k AND a.period < b.period),
             |st AS (SELECT k,
             |    sum(CASE WHEN cx * cy > 0 THEN 1 ELSE 0 END) AS conc,
             |    sum(CASE WHEN cx * cy < 0 THEN 1 ELSE 0 END) AS disc,
             |    sum(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS tx,
             |    sum(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS ty
             |  FROM pr GROUP BY k)
             |SELECT sp.k AS key, sp.n AS n_periods,
             |  CAST(coalesce(st.conc, 0) AS BIGINT) AS concordant,
             |  CAST(coalesce(st.disc, 0) AS BIGINT) AS discordant,
             |  CASE WHEN CAST(sp.n0 - coalesce(st.tx, 0) AS DOUBLE) > 0
             |         AND CAST(sp.n0 - coalesce(st.ty, 0) AS DOUBLE) > 0
             |    THEN CAST(coalesce(st.conc, 0) - coalesce(st.disc, 0) AS DOUBLE)
             |      / sqrt(CAST(sp.n0 - coalesce(st.tx, 0) AS DOUBLE)
             |           * CAST(sp.n0 - coalesce(st.ty, 0) AS DOUBLE))
             |  END AS tau_b
             |FROM sp LEFT JOIN st ON sp.k = st.k
             |ORDER BY key""".stripMargin)),

    // ---- q253: BINARY-SEGMENTATION CHANGEPOINTS — up to three
    // splits per event type's daily series (q124 CUSUM's
    // multi-changepoint extension,
    // [[graft.operators.TimeSeries.binarySegmentation]]): the split
    // criterion |n'·c'(t) − p·T'| is EXACT integer arithmetic over
    // ×10⁶ micro-unit prefix sums with a deterministic tie rule, so
    // the argmax — and therefore the whole segmentation — is
    // hash-exact. Fully declarative: per-key windows + tiny joins,
    // no driver recursion.
    Q(
      "q253_binary_segmentation",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.binarySegmentation(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key", $"level", $"seg_start")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1 FROM o GROUP BY k),
             |grid AS (SELECT k, unnest(generate_series(p0, p1)) AS period FROM sp),
             |gv AS (SELECT g.k, g.period,
             |    CAST(CAST(coalesce(o.x, CAST(0 AS DECIMAL(18,6))) AS DECIMAL(19,6))
             |      * 1000000 AS DECIMAL(19,0)) AS x
             |  FROM grid g LEFT JOIN o ON g.k = o.k AND g.period = o.period),
             |pre AS MATERIALIZED (SELECT k,
             |    row_number() OVER (PARTITION BY k ORDER BY period) AS t,
             |    sum(x) OVER (PARTITION BY k ORDER BY period) AS c
             |  FROM gv),
             |ag AS (SELECT k, max(t) AS n, max(c) AS total FROM pre GROUP BY k),
             |p1 AS MATERIALIZED (SELECT pre.k, t, c, n, total
             |  FROM pre JOIN ag ON pre.k = ag.k),
             |ev1 AS (SELECT k, t, n,
             |    abs(CAST(n AS DECIMAL(12,0)) * CAST(c AS DECIMAL(25,0))
             |      - CAST(t AS DECIMAL(12,0)) * CAST(total AS DECIMAL(25,0))) AS ev
             |  FROM p1 WHERE t BETWEEN 1 AND n - 1),
             |b1 AS MATERIALIZED (SELECT k, t AS s1, n, ev FROM ev1
             |  QUALIFY row_number() OVER (PARTITION BY k ORDER BY ev DESC, t ASC) = 1),
             |cs AS MATERIALIZED (SELECT p1.k, b1.s1, b1.n AS bn, b1.ev AS ev1v,
             |    p1.c AS cAtS, p1.total
             |  FROM p1 JOIN b1 ON p1.k = b1.k AND p1.t = b1.s1),
             |l2l AS (SELECT p1.k, t,
             |    CAST(1 AS BIGINT) AS seg_start, cs.s1 AS seg_len,
             |    abs(CAST(cs.s1 AS DECIMAL(12,0)) * CAST(c AS DECIMAL(25,0))
             |      - CAST(t AS DECIMAL(12,0)) * CAST(cs.cAtS AS DECIMAL(25,0))) AS ev
             |  FROM p1 JOIN cs ON p1.k = cs.k WHERE t BETWEEN 1 AND cs.s1 - 1),
             |l2r AS (SELECT p1.k, t,
             |    cs.s1 + 1 AS seg_start, p1.n - cs.s1 AS seg_len,
             |    abs(CAST(p1.n - cs.s1 AS DECIMAL(12,0)) * CAST(c - cs.cAtS AS DECIMAL(25,0))
             |      - CAST(t - cs.s1 AS DECIMAL(12,0)) * CAST(p1.total - cs.cAtS AS DECIMAL(25,0))) AS ev
             |  FROM p1 JOIN cs ON p1.k = cs.k
             |  WHERE t - cs.s1 BETWEEN 1 AND (p1.n - cs.s1) - 1),
             |pick2 AS (SELECT k, seg_start, seg_len, t, ev FROM (
             |    SELECT * FROM l2l UNION ALL SELECT * FROM l2r)
             |  QUALIFY row_number() OVER (PARTITION BY k, seg_start
             |    ORDER BY ev DESC, t ASC) = 1)
             |SELECT k AS key, CAST(1 AS INTEGER) AS level,
             |  CAST(1 AS BIGINT) AS seg_start, CAST(n AS BIGINT) AS seg_len,
             |  CAST(s1 AS BIGINT) AS split_pos, CAST(ev AS DOUBLE) AS evidence
             |FROM b1
             |UNION ALL
             |SELECT k, CAST(2 AS INTEGER), CAST(seg_start AS BIGINT),
             |  CAST(seg_len AS BIGINT), CAST(t AS BIGINT), CAST(ev AS DOUBLE)
             |FROM pick2
             |ORDER BY key, level, seg_start""".stripMargin)),

    // ---- q254: NELSON-AALEN cumulative hazard — q170's additive
    // sibling over the same right-censored user lifetimes
    // ([[graft.operators.Survival.nelsonAalen]]). No libm: each term
    // is one division of exact integers and the cumulative is a
    // WINDOW running sum (additions pinned to t-order in both
    // engines) — so unlike KM's exp∘Σ∘ln tolerance gate, this curve
    // hash-matches exactly.
    Q(
      "q254_nelson_aalen",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull)
        val per = ev.groupBy($"user_id").agg(
          min(unix_micros($"ts")).as("first_us"),
          max(unix_micros($"ts")).as("last_us"))
        val obs = per.agg(max($"last_us").as("obs_us"))
        val subjects = per.crossJoin(broadcast(obs)).select(
          floor(($"last_us" - $"first_us").cast("double") / lit(86400000000.0))
            .cast("long").as("dur"),
          ($"last_us" <= $"obs_us" - lit(3L * 86400000000L)).as("churned"))
        graft.operators.Survival.nelsonAalen(subjects, $"dur", $"churned")
          .orderBy($"t")
      },
      Some("""WITH per AS (SELECT user_id, min(epoch_us(ts)) AS first_us,
             |    max(epoch_us(ts)) AS last_us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
             |obs AS (SELECT max(last_us) AS obs_us FROM per),
             |subj AS MATERIALIZED (SELECT
             |    CAST(floor(CAST(last_us - first_us AS DOUBLE) / 86400000000.0) AS BIGINT) AS dur,
             |    last_us <= obs_us - 3 * 86400000000 AS churned
             |  FROM per CROSS JOIN obs),
             |byt AS (SELECT dur AS t,
             |    sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_death,
             |    sum(CASE WHEN churned THEN 0 ELSE 1 END) AS n_censored
             |  FROM subj GROUP BY 1),
             |curve AS MATERIALIZED (SELECT t, n_death, n_censored,
             |    (SELECT count(*) FROM subj)
             |      - coalesce(sum(n_death + n_censored) OVER (ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
             |  FROM byt)
             |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(n_death AS BIGINT) AS n_death,
             |  CAST(n_censored AS BIGINT) AS n_censored,
             |  sum(CASE WHEN n_death > 0
             |      THEN CAST(n_death AS DOUBLE) / CAST(n_risk AS DOUBLE)
             |      ELSE 0.0 END)
             |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hazard,
             |  sum(CASE WHEN n_death > 0
             |      THEN CAST(n_death AS DOUBLE)
             |        / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))
             |      ELSE 0.0 END)
             |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hazard_var
             |FROM curve ORDER BY t""".stripMargin))
  )

  /** q243's drive: the q203 scrambled staging (hash-chosen trailing
    * one-day bands one micro-batch late + far-future flush sentinel)
    * feeding [[graft.streaming.NegativeFunnel.detectEventTime]];
    * all state must drain (armed views evicted once the watermark
    * outruns their window).
    */
  private def streamingNegativeFunnel(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q243_nf_ooo")
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
      val name = "q243_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.NegativeFunnel.detectEventTime(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.streaming.PatternMatch.Ev],
        stepA = "view", stepB = "purchase", blocker = "error",
        windowUs = 7L * 86400L * 1000000L,
        delay = "2 days")
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q243 stream did not terminate within 600s — refusing a partial match set")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 4,
          s"q243 ran $dataBatches data micro-batch(es); the out-of-order point " +
            "needs all 3 scrambled slices + the flush sentinel as separate batches")
        val drained = q.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        require(drained.contains(0L),
          s"q243 negative-funnel state not drained at end of stream: $drained rows")
        s.table(name)
          .select($"user_id", $"a_us", $"b_us")
          .orderBy($"user_id", $"a_us", $"b_us")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }
}

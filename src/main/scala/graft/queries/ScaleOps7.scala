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
             |FROM fin ORDER BY event_type""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._

/** Round-9 continuation (q255+): censoring-aware survival comparison
  * (log-rank), experimentation estimators (CUPED variance reduction,
  * difference-in-differences), and further scale-shaped analytics.
  */
object ScaleOps8 {

  val all: Seq[Q] = Seq(

    // ---- q255: LOG-RANK TEST — do purchasers and non-purchasers
    // churn at different rates? q254's subjects (per-user activity
    // spans from events, churn = inactive 3+ days before the
    // observation end) split by ever-purchased, compared with the
    // standard censoring-aware two-group test
    // ([[graft.operators.Survival.logRank]]). Counts reduce to one
    // row per distinct duration; E/V accumulate as WINDOW running
    // sums in pinned t-order (cross-engine bit-stable, the
    // Nelson-Aalen precedent) — hash-exact, no tolerance.
    Q(
      "q255_logrank",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull)
        val per = ev.groupBy($"user_id").agg(
          min(unix_micros($"ts")).as("first_us"),
          max(unix_micros($"ts")).as("last_us"),
          max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("g"))
        val obs = per.agg(max($"last_us").as("obs_us"))
        val subjects = per.crossJoin(broadcast(obs)).select(
          floor(($"last_us" - $"first_us").cast("double") / lit(86400000000.0))
            .cast("long").as("dur"),
          ($"last_us" <= $"obs_us" - lit(3L * 86400000000L)).as("churned"),
          $"g")
        graft.operators.Survival.logRank(subjects, $"dur", $"churned", $"g")
      },
      Some("""WITH per AS (SELECT user_id, min(epoch_us(ts)) AS first_us,
             |    max(epoch_us(ts)) AS last_us,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS g
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
             |obs AS (SELECT max(last_us) AS obs_us FROM per),
             |subj AS MATERIALIZED (SELECT
             |    CAST(floor(CAST(last_us - first_us AS DOUBLE) / 86400000000.0)
             |      AS BIGINT) AS t,
             |    last_us <= obs_us - 3 * 86400000000 AS ev, g
             |  FROM per CROSS JOIN obs),
             |byt AS MATERIALIZED (SELECT t,
             |    sum(CASE WHEN ev AND g = 1 THEN 1 ELSE 0 END) AS d1,
             |    sum(CASE WHEN ev AND g = 0 THEN 1 ELSE 0 END) AS d0,
             |    sum(CASE WHEN NOT ev AND g = 1 THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN NOT ev AND g = 0 THEN 1 ELSE 0 END) AS c0
             |  FROM subj GROUP BY 1),
             |tot AS (SELECT sum(d1 + c1) AS tot1, sum(d0 + c0) AS tot0 FROM byt),
             |risk AS MATERIALIZED (SELECT t, d1, d0, tot1, tot0,
             |    tot1 - coalesce(sum(d1 + c1) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
             |    tot0 - coalesce(sum(d0 + c0) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
             |  FROM byt CROSS JOIN tot),
             |curve AS MATERIALIZED (SELECT tot1, tot0, t,
             |    sum(d1) OVER w AS o1c,
             |    sum(CASE WHEN d1 + d0 > 0
             |      THEN CAST(d1 + d0 AS DOUBLE) * CAST(n1 AS DOUBLE)
             |        / CAST(n1 + n0 AS DOUBLE)
             |      ELSE 0.0 END) OVER w AS e1c,
             |    sum(CASE WHEN d1 + d0 > 0 AND n1 + n0 > 1
             |      THEN CAST(d1 + d0 AS DOUBLE) * CAST(n1 AS DOUBLE)
             |        * CAST(n0 AS DOUBLE)
             |        * (CAST(n1 + n0 AS DOUBLE) - CAST(d1 + d0 AS DOUBLE))
             |        / (CAST(n1 + n0 AS DOUBLE) * CAST(n1 + n0 AS DOUBLE)
             |          * (CAST(n1 + n0 AS DOUBLE) - 1.0))
             |      ELSE 0.0 END) OVER w AS vc
             |  FROM risk
             |  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW))
             |SELECT CAST(tot1 AS BIGINT) AS n1, CAST(tot0 AS BIGINT) AS n0,
             |  CAST(o1c AS BIGINT) AS o1, e1c AS e1, vc AS v,
             |  CASE WHEN vc > 0 THEN (CAST(o1c AS DOUBLE) - e1c) / sqrt(vc)
             |    END AS z,
             |  CASE WHEN vc > 0 THEN (CAST(o1c AS DOUBLE) - e1c)
             |    * (CAST(o1c AS DOUBLE) - e1c) / vc END AS chi2
             |FROM curve ORDER BY t DESC LIMIT 1""".stripMargin)),

    // ---- q256: CUPED VARIANCE REDUCTION — post-1996 revenue
    // adjusted by each customer's pre-1996 revenue, θ pooled across
    // parity-assigned arms ([[graft.operators.Experiment.cuped]]).
    // Money in exact cents; the five sufficient statistics accumulate
    // in decimal(38,0) and cast ONCE to double, so θ and the adjusted
    // means are pinned double chains — hash-exact.
    Q(
      "q256_cuped",
      (s, d) => {
        import s.implicits._
        val cut = lit("1996-01-01").cast("timestamp")
        val per = Tables.orders(s, d).groupBy($"o_custkey").agg(
          sum(when($"o_orderdate" < cut,
            round($"o_totalprice" * 100).cast("long")).otherwise(0L)).as("x"),
          sum(when($"o_orderdate" >= cut,
            round($"o_totalprice" * 100).cast("long")).otherwise(0L)).as("y"))
          .withColumn("arm", $"o_custkey" % 2)
        graft.operators.Experiment.cuped(per, $"arm", $"y", $"x")
          .orderBy($"arm")
      },
      Some("""WITH per AS MATERIALIZED (SELECT o_custkey % 2 AS arm,
             |    sum(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
             |      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS x,
             |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
             |      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS y
             |  FROM orders GROUP BY o_custkey),
             |pa AS MATERIALIZED (SELECT arm, count(*) AS n,
             |    CAST(sum(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
             |    CAST(sum(CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
             |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sxy,
             |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sxx
             |  FROM per GROUP BY 1),
             |pooled AS (SELECT sum(n) AS gn,
             |    CAST(sum(sy) AS DECIMAL(38,0)) AS gsy,
             |    CAST(sum(sx) AS DECIMAL(38,0)) AS gsx,
             |    CAST(sum(sxy) AS DECIMAL(38,0)) AS gsxy,
             |    CAST(sum(sxx) AS DECIMAL(38,0)) AS gsxx
             |  FROM pa),
             |th AS (SELECT
             |    CASE WHEN CAST(gn AS DOUBLE) * CAST(gsxx AS DOUBLE)
             |        - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) > 0
             |      THEN (CAST(gn AS DOUBLE) * CAST(gsxy AS DOUBLE)
             |          - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE))
             |        / (CAST(gn AS DOUBLE) * CAST(gsxx AS DOUBLE)
             |          - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE))
             |      END AS theta,
             |    CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE) AS gmx
             |  FROM pooled)
             |SELECT arm, n,
             |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
             |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
             |  theta,
             |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             |    - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - gmx)
             |    AS adj_mean
             |FROM pa CROSS JOIN th ORDER BY arm""".stripMargin)),

    // ---- q257: DIFFERENCE-IN-DIFFERENCES — did BUILDING-segment
    // order values move differently across the 1996 boundary than the
    // other segments? The 2×2 natural-experiment contrast
    // ([[graft.operators.Experiment.diffInDiff]]): four cell means of
    // exact cents sums, one pinned double contrast — hash-exact.
    Q(
      "q257_diff_in_diff",
      (s, d) => {
        import s.implicits._
        val cut = lit("1996-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(
          $"o_custkey", ($"o_orderdate" >= cut).as("po"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
        val c = Tables.customer(s, d).select(
          $"c_custkey", ($"c_mktsegment" === "BUILDING").as("tr"))
        graft.operators.Experiment.diffInDiff(
          o.join(c, $"o_custkey" === $"c_custkey"), $"tr", $"po", $"cents")
      },
      Some("""WITH j AS MATERIALIZED (SELECT
             |    c_mktsegment = 'BUILDING' AS tr,
             |    o_orderdate >= TIMESTAMP '1996-01-01' AS po,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |agg AS (SELECT
             |    sum(CASE WHEN NOT tr AND NOT po THEN 1 ELSE 0 END) AS n00,
             |    sum(CASE WHEN NOT tr AND po THEN 1 ELSE 0 END) AS n01,
             |    sum(CASE WHEN tr AND NOT po THEN 1 ELSE 0 END) AS n10,
             |    sum(CASE WHEN tr AND po THEN 1 ELSE 0 END) AS n11,
             |    CAST(sum(CASE WHEN NOT tr AND NOT po
             |      THEN CAST(y AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s00,
             |    CAST(sum(CASE WHEN NOT tr AND po
             |      THEN CAST(y AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s01,
             |    CAST(sum(CASE WHEN tr AND NOT po
             |      THEN CAST(y AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s10,
             |    CAST(sum(CASE WHEN tr AND po
             |      THEN CAST(y AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS s11
             |  FROM j)
             |SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
             |  CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
             |  CASE WHEN n00 > 0 THEN CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)
             |    END AS m00,
             |  CASE WHEN n01 > 0 THEN CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
             |    END AS m01,
             |  CASE WHEN n10 > 0 THEN CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE)
             |    END AS m10,
             |  CASE WHEN n11 > 0 THEN CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
             |    END AS m11,
             |  CASE WHEN n00 > 0 AND n01 > 0 AND n10 > 0 AND n11 > 0
             |    THEN (CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
             |        - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
             |      - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
             |        - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE))
             |    END AS did
             |FROM agg""".stripMargin)),

    // ---- q258: GRID-DENSITY CLUSTERING — customers as (acctbal,
    // order-count) points on a fixed 500×2 grid; cells with ≥ 20
    // points are dense, clusters = 8-neighbourhood components of the
    // dense cells ([[graft.operators.Clustering.gridDensityClusters]]).
    // Every stage is bounded by the GRID, not the corpus; the oracle
    // replays the components with a fixpoint recursive CTE (UNION
    // dedup terminates). All-integer output — hash-exact.
    Q(
      "q258_grid_density_clusters",
      (s, d) => {
        import s.implicits._
        val y = Tables.orders(s, d).groupBy($"o_custkey")
          .agg(count(lit(1)).as("y"))
        val pts = Tables.customer(s, d)
          .join(y, $"c_custkey" === $"o_custkey", "left")
          .select($"c_acctbal".as("x"), coalesce($"y", lit(0L)).as("y"))
        graft.operators.Clustering.gridDensityClusters(
          pts, $"x", $"y", cellW = 500.0, cellH = 2.0, minPts = 20L)
          .orderBy($"cx", $"cy")
      },
      Some("""WITH RECURSIVE yc AS (
             |  SELECT o_custkey, count(*) AS y FROM orders GROUP BY 1),
             |pts AS MATERIALIZED (SELECT c_acctbal AS x, coalesce(yc.y, 0) AS y
             |  FROM customer LEFT JOIN yc ON c_custkey = o_custkey),
             |cells AS MATERIALIZED (SELECT
             |    CAST(floor(x / 500.0) AS BIGINT) AS cx,
             |    CAST(floor(y / 2.0) AS BIGINT) AS cy, count(*) AS n_points
             |  FROM pts GROUP BY 1, 2),
             |dense AS MATERIALIZED (SELECT cx, cy, n_points,
             |    (cx + 1048576) * 2097152 + (cy + 1048576) AS id
             |  FROM cells WHERE n_points >= 20),
             |e AS MATERIALIZED (SELECT a.id AS ea, b.id AS eb
             |  FROM dense a JOIN dense b
             |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
             |    AND a.id <> b.id),
             |reach(id, r) AS (
             |  SELECT id, id FROM dense
             |  UNION
             |  SELECT e.ea, reach.r FROM reach JOIN e ON e.eb = reach.id)
             |SELECT d.cx, d.cy, CAST(d.n_points AS BIGINT) AS n_points,
             |  comp.cluster
             |FROM dense d JOIN (SELECT id, min(r) AS cluster FROM reach
             |  GROUP BY id) comp ON d.id = comp.id
             |ORDER BY cx, cy""".stripMargin)),

    // ---- q259: LANDMARK CLOSENESS — closeness centrality of the
    // q227 supplier—part graph against 4 fixed landmark suppliers
    // ([[graft.operators.Graph.landmarkCloseness]]): k·BFS instead of
    // all-pairs, harmonic mass in exact sixtieths (60/d integral for
    // d ≤ 4), one pinned double division. The oracle unrolls the same
    // 4 min-collapse rounds per landmark (the q227 replay-by-
    // construction argument).
    Q(
      "q259_landmark_closeness",
      (s, d) => {
        import s.implicits._
        val e = Tables.lineitem(s, d).select(
          ($"l_suppkey" * 2).as("sa"), ($"l_partkey" * 2 + 1).as("pb"))
        graft.operators.Graph.landmarkCloseness(
          e, $"sa", $"pb", landmarks = Seq(2L, 4L, 6L, 8L), maxHops = 4)
          .select(
            when($"node" % 2 === 0, "s").otherwise("p").as("node_kind"),
            expr("node div 2").as("key"),
            $"n_reached", $"total_dist", $"harmonic_x60", $"closeness")
          .orderBy($"node_kind", $"key")
      },
      Some("""WITH ed0 AS MATERIALIZED (
             |  SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
             |  FROM lineitem),
             |ed AS MATERIALIZED (SELECT a, b FROM ed0
             |  UNION SELECT b AS a, a AS b FROM ed0),
             |d0 AS MATERIALIZED (SELECT CAST(lm AS BIGINT) AS lm,
             |    CAST(lm AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
             |  FROM (SELECT unnest([2, 4, 6, 8]) AS lm)),
             |d1 AS MATERIALIZED (SELECT lm, node, min(dist) AS dist FROM (
             |  SELECT lm, node, dist FROM d0
             |  UNION ALL SELECT d0.lm, ed.b AS node, d0.dist + 1 AS dist
             |  FROM d0 JOIN ed ON d0.node = ed.a) GROUP BY 1, 2),
             |d2 AS MATERIALIZED (SELECT lm, node, min(dist) AS dist FROM (
             |  SELECT lm, node, dist FROM d1
             |  UNION ALL SELECT d1.lm, ed.b AS node, d1.dist + 1 AS dist
             |  FROM d1 JOIN ed ON d1.node = ed.a) GROUP BY 1, 2),
             |d3 AS MATERIALIZED (SELECT lm, node, min(dist) AS dist FROM (
             |  SELECT lm, node, dist FROM d2
             |  UNION ALL SELECT d2.lm, ed.b AS node, d2.dist + 1 AS dist
             |  FROM d2 JOIN ed ON d2.node = ed.a) GROUP BY 1, 2),
             |d4 AS MATERIALIZED (SELECT lm, node, min(dist) AS dist FROM (
             |  SELECT lm, node, dist FROM d3
             |  UNION ALL SELECT d3.lm, ed.b AS node, d3.dist + 1 AS dist
             |  FROM d3 JOIN ed ON d3.node = ed.a) GROUP BY 1, 2)
             |SELECT CASE WHEN node % 2 = 0 THEN 's' ELSE 'p' END AS node_kind,
             |  node // 2 AS key,
             |  count(*) AS n_reached,
             |  CAST(sum(dist) AS BIGINT) AS total_dist,
             |  CAST(sum(60 // dist) AS BIGINT) AS harmonic_x60,
             |  CAST(count(*) AS DOUBLE) / CAST(sum(dist) AS DOUBLE) AS closeness
             |FROM d4 WHERE dist > 0 GROUP BY 1, 2
             |ORDER BY node_kind, key""".stripMargin)))

  /** Continuation Seq (JVM method-size hygiene, the ScaleOps7
    * precedent).
    */
  val all2: Seq[Q] = Seq(

    // ---- q260: RUN-LENGTH ENCODING — each user's event-type
    // timeline collapsed to runs (value change or a > 2-day gap opens
    // a new run): the CDC/state-compression batch twin of
    // [[graft.streaming.RunLength]]. Fully declarative
    // gaps-and-islands (lag → run counter → per-run aggregate),
    // partitioned by user; all-integer/string output — hash-exact.
    Q(
      "q260_run_length",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull && $"event_id".isNotNull)
          .select($"user_id", $"ts", $"event_type", $"event_id")
          .as[graft.streaming.PatternMatch.Ev]
        graft.streaming.RunLength.encodeBatch(
          ev, Set("view", "click", "purchase", "error"),
          idleCloseUs = 2L * 86400L * 1000000L)
          .orderBy($"user_id", $"start_us")
      },
      Some("""WITH e AS MATERIALIZED (SELECT user_id, epoch_us(ts) AS tus,
             |    event_id, event_type AS v
             |  FROM events
             |  WHERE event_type IN ('view', 'click', 'purchase', 'error')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_id IS NOT NULL),
             |m AS MATERIALIZED (SELECT user_id, tus, event_id, v,
             |    CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
             |      OR tus - lag(tus) OVER w > 172800000000 THEN 1 ELSE 0 END AS nr
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |r AS (SELECT user_id, v, tus,
             |    sum(nr) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
             |  FROM m)
             |SELECT user_id, min(v) AS value, min(tus) AS start_us,
             |  max(tus) AS end_us, count(*) AS n
             |FROM r GROUP BY user_id, run
             |ORDER BY user_id, start_us""".stripMargin)),

    // ---- q261: STREAMING RLE GATE — q260's runs recovered LIVE from
    // scrambled micro-batches (hash-chosen boundary bands arrive one
    // slice late, inside the 2-day watermark delay) through
    // [[graft.streaming.RunLength.encodeEventTime]]; the flush
    // sentinel pushes the watermark past every run's idle horizon, so
    // the stream closes exactly the batch twin's run set and drains
    // its state to zero. Oracle: the q260 gaps-and-islands SQL — the
    // event multiset is unchanged by batch scrambling.
    Q(
      "q261_streaming_rle",
      (s, d) => streamingRle(s, d),
      Some("""WITH e AS MATERIALIZED (SELECT user_id, epoch_us(ts) AS tus,
             |    event_id, event_type AS v
             |  FROM events
             |  WHERE event_type IN ('view', 'click', 'purchase', 'error')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_id IS NOT NULL),
             |m AS MATERIALIZED (SELECT user_id, tus, event_id, v,
             |    CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
             |      OR tus - lag(tus) OVER w > 172800000000 THEN 1 ELSE 0 END AS nr
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |r AS (SELECT user_id, v, tus,
             |    sum(nr) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
             |  FROM m)
             |SELECT user_id, min(v) AS value, min(tus) AS start_us,
             |  max(tus) AS end_us, count(*) AS n
             |FROM r GROUP BY user_id, run
             |ORDER BY user_id, start_us""".stripMargin)),

    // ---- q262: UNIFORM-PRICE AUCTION CLEARING — per part, even-
    // orderkey lineitems bid and odd-orderkey lineitems ask at their
    // integer unit price; the call-auction rule picks the volume-
    // maximizing price (ties → min imbalance → lowest price)
    // ([[graft.operators.Auction.uniformClearing]]). Orders collapse
    // to price-level cells; the demand/supply curves are windows over
    // each part's PRICE AXIS. All-integer — hash-exact.
    Q(
      "q262_auction_clearing",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_partkey", $"l_orderkey",
          $"l_quantity".cast("long").as("qv"),
          ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
          .withColumn("uc", expr("cents div qv"))
        val bids = li.filter($"l_orderkey" % 2 === 0)
        val asks = li.filter($"l_orderkey" % 2 === 1)
        graft.operators.Auction.uniformClearing(
          bids, asks,
          $"l_partkey", $"uc", $"qv",
          $"l_partkey", $"uc", $"qv")
          .orderBy($"key")
      },
      Some("""WITH li AS MATERIALIZED (SELECT l_partkey AS k, l_orderkey AS ok,
             |    CAST(l_quantity AS BIGINT) AS q,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      // CAST(l_quantity AS BIGINT) AS p
             |  FROM lineitem),
             |b AS (SELECT k, p, sum(q) AS bq FROM li WHERE ok % 2 = 0
             |  GROUP BY 1, 2),
             |a AS (SELECT k, p, sum(q) AS aq FROM li WHERE ok % 2 = 1
             |  GROUP BY 1, 2),
             |lv AS MATERIALIZED (SELECT coalesce(b.k, a.k) AS k,
             |    coalesce(b.p, a.p) AS p,
             |    coalesce(bq, 0) AS bq, coalesce(aq, 0) AS aq
             |  FROM b FULL OUTER JOIN a ON b.k = a.k AND b.p = a.p),
             |c AS MATERIALIZED (SELECT k, p, bq, aq,
             |    sum(aq) OVER (PARTITION BY k ORDER BY p ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS supply,
             |    sum(bq) OVER (PARTITION BY k ORDER BY p DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS demand
             |  FROM lv),
             |x AS (SELECT k, p, demand, supply,
             |    least(demand, supply) AS volume,
             |    row_number() OVER (PARTITION BY k
             |      ORDER BY least(demand, supply) DESC,
             |        abs(demand - supply) ASC, p ASC) AS rn
             |  FROM c)
             |SELECT k AS key, p AS clearing_price,
             |  CAST(volume AS BIGINT) AS volume,
             |  CAST(demand AS BIGINT) AS demand, CAST(supply AS BIGINT) AS supply
             |FROM x WHERE rn = 1 ORDER BY key""".stripMargin)))

  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Continuation Seq 3: SPC charts, per-group proration, containment
    * join.
    */
  val all3: Seq[Q] = Seq(

    // ---- q263: p-CHART — daily fraction of F-status orders against
    // variable-n three-sigma limits ([[graft.operators.Spc.pChart]]).
    // One reduction to per-day counts + one broadcast centerline; the
    // statistics AND the out-of-control flags are pinned chains of
    // correctly-rounded double ops on exact integers — hash-exact.
    Q(
      "q263_p_chart",
      (s, d) => {
        import s.implicits._
        graft.operators.Spc.pChart(
          Tables.orders(s, d)
            .select(
              floor(unix_micros($"o_orderdate".cast("timestamp"))
                / lit(86400000000L)).cast("long").as("day"),
              ($"o_orderstatus" === "F").as("def")),
          $"day", $"def")
          .orderBy($"k")
      },
      Some("""WITH per AS MATERIALIZED (SELECT
             |    CAST(floor(epoch_us(o_orderdate) / 86400000000) AS BIGINT) AS k,
             |    count(*) AS n,
             |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS defects
             |  FROM orders GROUP BY 1),
             |ov AS (SELECT CAST(sum(defects) AS DOUBLE)
             |    / CAST(sum(n) AS DOUBLE) AS pbar FROM per)
             |SELECT k, n, CAST(defects AS BIGINT) AS defects,
             |  CAST(defects AS DOUBLE) / CAST(n AS DOUBLE) AS phat, pbar,
             |  pbar + 3.0 * sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE)) AS ucl,
             |  greatest(0.0,
             |    pbar - 3.0 * sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE))) AS lcl,
             |  (CAST(defects AS DOUBLE) / CAST(n AS DOUBLE)
             |      > pbar + 3.0 * sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE))
             |    OR CAST(defects AS DOUBLE) / CAST(n AS DOUBLE)
             |      < greatest(0.0, pbar - 3.0
             |        * sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE)))) AS ooc
             |FROM per CROSS JOIN ov ORDER BY k""".stripMargin)),

    // ---- q264: c-CHART — daily error-event counts against Poisson
    // three-sigma limits c̄ ± 3√c̄ ([[graft.operators.Spc.cChart]]).
    Q(
      "q264_c_chart",
      (s, d) => {
        import s.implicits._
        graft.operators.Spc.cChart(
          Tables.events(s, d)
            .filter($"event_type" === "error" && $"ts".isNotNull)
            .select(floor(unix_micros($"ts") / lit(86400000000L))
              .cast("long").as("day")),
          $"day")
          .orderBy($"k")
      },
      Some("""WITH per AS MATERIALIZED (SELECT
             |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS k,
             |    count(*) AS c
             |  FROM events WHERE event_type = 'error' AND ts IS NOT NULL
             |  GROUP BY 1),
             |ov AS (SELECT CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS cbar FROM per)
             |SELECT k, CAST(c AS BIGINT) AS c, cbar,
             |  cbar + 3.0 * sqrt(cbar) AS ucl,
             |  greatest(0.0, cbar - 3.0 * sqrt(cbar)) AS lcl,
             |  (CAST(c AS DOUBLE) > cbar + 3.0 * sqrt(cbar)
             |    OR CAST(c AS DOUBLE) < greatest(0.0, cbar - 3.0 * sqrt(cbar)))
             |    AS ooc
             |FROM per CROSS JOIN ov ORDER BY k""".stripMargin)),

    // ---- q265: REVENUE RECOGNITION — each order's cents prorated
    // across the calendar months of its 90-day service window by
    // overlap days, with per-order largest-remainder exactness
    // (Σ recognized = the order's cents;
    // [[graft.operators.Allocation.largestRemainderBy]]). Pure int64
    // arithmetic end to end — hash-exact.
    Q(
      "q265_revenue_recognition",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_orderkey".as("k"),
          $"o_orderdate".as("st"),
          ($"o_orderdate" + expr("INTERVAL 90 DAYS")).as("en"),
          ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
        val m = o.select($"k", $"cents", $"st", $"en",
          explode(sequence(date_trunc("month", $"st"),
            date_trunc("month", $"en"), expr("INTERVAL 1 MONTH"))).as("m"))
          .withColumn("mn", $"m" + expr("INTERVAL 1 MONTH"))
          .withColumn("days",
            datediff(least($"en", $"mn").cast("date"),
              greatest($"st", $"m").cast("date")).cast("long"))
          .filter($"days" > 0)
        graft.operators.Allocation.largestRemainderBy(
          m, $"k", $"m", $"days", $"cents")
          .groupBy($"item").agg(
            sum($"alloc").as("recognized_cents"),
            count(lit(1)).as("n_orders"))
          .select(date_format($"item", "yyyy-MM").as("month"),
            $"recognized_cents", $"n_orders")
          .orderBy($"month")
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_orderdate AS st,
             |    o_orderdate + INTERVAL 90 DAY AS en,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM orders),
             |mx AS (SELECT k, cents, st, en,
             |    unnest(generate_series(date_trunc('month', st),
             |      date_trunc('month', en), INTERVAL 1 MONTH)) AS m
             |  FROM o),
             |w AS MATERIALIZED (SELECT * FROM (SELECT k, cents, m,
             |    CAST(date_diff('day', CAST(greatest(st, m) AS DATE),
             |      CAST(least(en, m + INTERVAL 1 MONTH) AS DATE)) AS BIGINT)
             |      AS days
             |  FROM mx) WHERE days > 0),
             |g AS (SELECT k, cents, m, days,
             |    sum(days) OVER (PARTITION BY k) AS gw FROM w),
             |b AS MATERIALIZED (SELECT k, cents, m,
             |    (cents * days) // gw AS base, (cents * days) % gw AS rem
             |  FROM g),
             |l AS (SELECT k, cents - sum(base) AS r FROM b GROUP BY k, cents),
             |al AS (SELECT b.k, b.m,
             |    base + CASE WHEN row_number() OVER (PARTITION BY b.k
             |      ORDER BY rem DESC, m ASC) <= l.r THEN 1 ELSE 0 END AS alloc
             |  FROM b JOIN l ON b.k = l.k)
             |SELECT strftime(m, '%Y-%m') AS month,
             |  CAST(sum(alloc) AS BIGINT) AS recognized_cents,
             |  count(*) AS n_orders
             |FROM al GROUP BY 1 ORDER BY month""".stripMargin)),

    // ---- q266: EXACT CONTAINMENT PAIRS — ordered (src → dst) doc
    // pairs with |src ∩ dst|/|src| ≥ 1/2 over 3-gram shingles: the
    // quote/subset detector resemblance dedup misses
    // ([[graft.operators.Dedup.containmentPairsFromHashed]]).
    // Candidate generation is COMPLETE (containment prefix filter),
    // so the oracle is a direct unblocked all-pairs equality — no
    // recall slack. Thresholding is cross-multiplied int64.
    Q(
      "q266_containment_pairs",
      (s, d) => {
        import s.implicits._
        graft.operators.Dedup.containmentPairsFromHashed(
          LlmOps.sharedShingleSets(s, d), tNum = 1L, tDen = 2L)
          .orderBy($"id_src", $"id_dst")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
              |sh AS MATERIALIZED (SELECT doc_id,
              |  list_distinct(CASE WHEN len(t) >= 3
              |    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
              |    ELSE [array_to_string(t, ' ')] END) AS sh FROM toks),
              |post AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
              |cand AS (SELECT a.doc_id AS id_src, b.doc_id AS id_dst,
              |    count(*) AS c
              |  FROM post a JOIN post b ON a.shingle = b.shingle
              |    AND a.doc_id <> b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id_src, id_dst, CAST(c AS BIGINT) AS overlap,
              |  CAST(len(sa.sh) AS BIGINT) AS n_src,
              |  CAST(c AS DOUBLE) / CAST(len(sa.sh) AS DOUBLE) AS containment
              |FROM cand JOIN sh sa ON id_src = sa.doc_id
              |WHERE c * 2 >= len(sa.sh)
              |ORDER BY id_src, id_dst""".stripMargin)),

    // ---- q267: CONTENT-ADDRESSED CHUNKING — documents split into
    // fixed 256-char chunks addressed by portable md5, with
    // corpus-wide reference counts: the dedup-ratio audit of a
    // content-addressed blob store
    // ([[graft.operators.Multimodal.fixedChunks]]). Character-based
    // substring/length agree across engines — hash-exact.
    Q(
      "q267_blob_chunks",
      (s, d) => {
        import s.implicits._
        graft.operators.Multimodal.fixedChunks(
          Tables.documents(s, d), $"doc_id", $"text", chunkChars = 256)
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH d AS (SELECT doc_id, text AS t FROM documents
             |  WHERE text IS NOT NULL AND length(text) > 0),
             |ix AS (SELECT doc_id, t,
             |    unnest(range(0, ((length(t) - 1) // 256) + 1)) AS i FROM d),
             |h AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             |    CAST(i * 256 AS BIGINT) AS "offset",
             |    CAST(length(substring(t, i * 256 + 1, 256)) AS BIGINT) AS length,
             |    md5(substring(t, i * 256 + 1, 256)) AS chunk_md5
             |  FROM ix),
             |r AS (SELECT chunk_md5, count(*) AS refs FROM h GROUP BY 1)
             |SELECT doc_id, chunk_idx, "offset", length, h.chunk_md5,
             |  CAST(refs AS BIGINT) AS refs
             |FROM h JOIN r ON h.chunk_md5 = r.chunk_md5
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- q268: SPLIT-CONFORMAL INTERVALS — customers hash-split
    // into train/calibrate/test thirds; an OLS of revenue-cents on
    // acctbal-cents fits on train, q̂ is the exact
    // ⌈(n_cal+1)·7/8⌉-th smallest |calibration residual| (α = 1/8),
    // and the 87.5 % coverage guarantee is AUDITED on the test third
    // ([[graft.operators.ModelEval.splitConformal]]). All statistics
    // from decimal(38,0) sums cast once — hash-exact.
    Q(
      "q268_split_conformal",
      (s, d) => {
        import s.implicits._
        val rev = Tables.orders(s, d).groupBy($"o_custkey").agg(
          sum(round($"o_totalprice" * 100).cast("long")).as("yc"))
        val per = Tables.customer(s, d)
          .join(rev, $"c_custkey" === $"o_custkey", "left")
          .select($"c_custkey".as("u"),
            round($"c_acctbal" * 100).cast("long").as("xc"),
            coalesce($"yc", lit(0L)).as("ycents"))
        graft.operators.ModelEval.splitConformal(
          per, $"u", $"xc", $"ycents", alphaNum = 1L, alphaDen = 8L)
      },
      Some(s"""WITH rev AS (SELECT o_custkey,
              |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS yc
              |  FROM orders GROUP BY 1),
              |per AS (SELECT c_custkey AS u,
              |    CAST(round(c_acctbal * 100) AS BIGINT) AS x,
              |    coalesce(rev.yc, 0) AS y
              |  FROM customer LEFT JOIN rev ON c_custkey = o_custkey),
              |base AS MATERIALIZED (SELECT
              |    ${graft.operators.KmvSketch.hash60Sql("u")} % 3 AS split, x, y
              |  FROM per),
              |tr AS (SELECT count(*) AS n,
              |    CAST(sum(CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
              |    CAST(sum(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
              |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              |      AS DECIMAL(38,0)) AS sxy,
              |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              |      AS DECIMAL(38,0)) AS sxx
              |  FROM base WHERE split = 0),
              |p0 AS (SELECT CAST(n AS BIGINT) AS n_train,
              |    CAST(n AS DOUBLE) AS gn, CAST(sx AS DOUBLE) AS dsx,
              |    CAST(sy AS DOUBLE) AS dsy,
              |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
              |  FROM tr),
              |par AS (SELECT n_train, slope,
              |    (dsy - slope * dsx) / gn AS icept FROM p0),
              |cal AS MATERIALIZED (SELECT
              |    abs(CAST(y AS DOUBLE) - (icept + slope * CAST(x AS DOUBLE))) AS r
              |  FROM base, par WHERE split = 1),
              |kk AS (SELECT least(count(*), ((count(*) + 1) * 7 + 7) // 8) AS k,
              |    count(*) AS n FROM cal),
              |q AS (SELECT r AS qhat FROM (SELECT r,
              |      row_number() OVER (ORDER BY r) AS rn FROM cal)
              |  WHERE rn = (SELECT k FROM kk)),
              |tst AS (SELECT count(*) AS n_test,
              |    sum(CASE WHEN abs(CAST(y AS DOUBLE)
              |        - (icept + slope * CAST(x AS DOUBLE)))
              |        <= (SELECT qhat FROM q) THEN 1 ELSE 0 END) AS covered
              |  FROM base, par WHERE split = 2)
              |SELECT (SELECT n_train FROM par) AS n_train,
              |  (SELECT CAST(n AS BIGINT) FROM kk) AS n_cal,
              |  CAST(n_test AS BIGINT) AS n_test,
              |  (SELECT slope FROM par) AS slope,
              |  (SELECT icept FROM par) AS intercept,
              |  (SELECT CAST(k AS BIGINT) FROM kk) AS k,
              |  (SELECT qhat FROM q) AS qhat,
              |  CAST(covered AS BIGINT) AS covered,
              |  CASE WHEN n_test > 0
              |    THEN CAST(covered AS DOUBLE) / CAST(n_test AS DOUBLE)
              |    END AS coverage
              |FROM tst""".stripMargin)))

  /** Continuation Seq 4: ordered-trend ranks, paired flips, forecast
    * backtest, vocabulary growth.
    */
  val all4: Seq[Q] = Seq(

    // ---- q269: JONCKHEERE–TERPSTRA PAIR TABLE — doubled pairwise
    // Mann-Whitney counts across the 5 ORDERED order priorities on
    // order value ([[graft.operators.RankStats.jonckheerePairs]]):
    // cells on the shared value axis, one window, one pair
    // reduction — never O(n²) pair enumeration. u2 accumulates in
    // decimal(38,0) (n_i·n_j-scale products) and travels as a VARCHAR
    // digest — hash-exact.
    Q(
      "q269_jonckheere_pairs",
      (s, d) => {
        import s.implicits._
        graft.operators.RankStats.jonckheerePairs(
          Tables.orders(s, d),
          substring($"o_orderpriority", 1, 1).cast("long"),
          $"o_totalprice")
          .withColumn("u2", $"u2".cast("string"))
          .orderBy($"gi", $"gj")
      },
      Some("""WITH cells AS MATERIALIZED (SELECT
             |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
             |    o_totalprice AS v, count(*) AS c
             |  FROM orders GROUP BY 1, 2),
             |axis AS (SELECT DISTINCT v FROM cells),
             |gs AS (SELECT DISTINCT g FROM cells),
             |dense AS MATERIALIZED (SELECT gs.g, axis.v,
             |    coalesce(c.c, 0) AS c
             |  FROM gs CROSS JOIN axis
             |  LEFT JOIN cells c ON c.g = gs.g AND c.v = axis.v),
             |cum AS MATERIALIZED (SELECT g, v, c,
             |    coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
             |  FROM dense),
             |tot AS (SELECT g, sum(c) AS n FROM cells GROUP BY 1),
             |pr AS (SELECT l.g AS gi, r.g AS gj,
             |    CAST(sum(CAST(r.c AS DECIMAL(19,0))
             |      * CAST(2 * l.below + l.c AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS u2
             |  FROM cum l JOIN cum r ON l.v = r.v AND l.g < r.g
             |  GROUP BY 1, 2)
             |SELECT gi, gj, CAST(ti.n AS BIGINT) AS n_i,
             |  CAST(tj.n AS BIGINT) AS n_j,
             |  CAST(u2 AS VARCHAR) AS u2
             |FROM pr JOIN tot ti ON gi = ti.g JOIN tot tj ON gj = tj.g
             |ORDER BY gi, gj""".stripMargin)),

    // ---- q270: McNEMAR'S TEST — did customers' urgent-order
    // behaviour flip across the 1996 boundary? Paired pre/post flags
    // per customer; only discordant cells matter
    // ([[graft.operators.Experiment.mcnemar]]).
    Q(
      "q270_mcnemar",
      (s, d) => {
        import s.implicits._
        val cut = lit("1996-01-01").cast("timestamp")
        val per = Tables.orders(s, d).groupBy($"o_custkey").agg(
          max(when($"o_orderpriority" === "1-URGENT" && $"o_orderdate" < cut,
            1L).otherwise(0L)).as("pre"),
          max(when($"o_orderpriority" === "1-URGENT" && $"o_orderdate" >= cut,
            1L).otherwise(0L)).as("post"))
        graft.operators.Experiment.mcnemar(per, $"pre" === 1L, $"post" === 1L)
      },
      Some("""WITH per AS (SELECT o_custkey,
             |    max(CASE WHEN o_orderpriority = '1-URGENT'
             |      AND o_orderdate < TIMESTAMP '1996-01-01'
             |      THEN 1 ELSE 0 END) AS pre,
             |    max(CASE WHEN o_orderpriority = '1-URGENT'
             |      AND o_orderdate >= TIMESTAMP '1996-01-01'
             |      THEN 1 ELSE 0 END) AS post
             |  FROM orders GROUP BY 1),
             |agg AS (SELECT
             |    sum(CASE WHEN pre = 0 AND post = 0 THEN 1 ELSE 0 END) AS n00,
             |    sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END) AS n01,
             |    sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END) AS n10,
             |    sum(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END) AS n11
             |  FROM per)
             |SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
             |  CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
             |  CASE WHEN n01 + n10 > 0
             |    THEN (CAST(n01 AS DOUBLE) - CAST(n10 AS DOUBLE))
             |      * (CAST(n01 AS DOUBLE) - CAST(n10 AS DOUBLE))
             |      / (CAST(n01 AS DOUBLE) + CAST(n10 AS DOUBLE))
             |    END AS chi2
             |FROM agg""".stripMargin)),

    // ---- q271: MASE FORECAST BACKTEST — seasonal-naive (lag-7)
    // daily revenue forecasts per order priority, scored on 1998
    // against the in-sample one-step naive MAE
    // ([[graft.operators.TimeSeries.maseBacktest]]). Absolute errors
    // in exact cents, decimal(38,0) sums, two pinned divisions.
    Q(
      "q271_mase_backtest",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.maseBacktest(
          Tables.orders(s, d),
          key = $"o_orderpriority",
          ts = $"o_orderdate".cast("timestamp"),
          valueCents = ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"),
          seasonLag = 7, splitPeriod = 10227L, periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH perp AS MATERIALIZED (SELECT o_orderpriority AS k,
             |    CAST(floor(epoch_us(o_orderdate) / 86400000000) AS BIGINT)
             |      AS period,
             |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS BIGINT) AS v
             |  FROM orders GROUP BY 1, 2),
             |fc AS (SELECT a.k, count(*) AS n_test,
             |    CAST(sum(CAST(abs(a.v - b.v) AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sf
             |  FROM perp a JOIN perp b ON a.k = b.k AND a.period = b.period + 7
             |  WHERE a.period >= 10227 GROUP BY 1),
             |nv AS (SELECT a.k, count(*) AS n_naive,
             |    CAST(sum(CAST(abs(a.v - b.v) AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sn
             |  FROM perp a JOIN perp b ON a.k = b.k AND a.period = b.period + 1
             |  WHERE a.period < 10227 GROUP BY 1)
             |SELECT coalesce(fc.k, nv.k) AS key,
             |  coalesce(n_test, 0) AS n_test, coalesce(n_naive, 0) AS n_naive,
             |  coalesce(CAST(sf AS DOUBLE), 0.0) AS sae_forecast,
             |  coalesce(CAST(sn AS DOUBLE), 0.0) AS sae_naive,
             |  CASE WHEN n_test > 0 AND n_naive > 0 AND CAST(sn AS DOUBLE) > 0
             |    THEN (CAST(sf AS DOUBLE) / CAST(n_test AS DOUBLE))
             |      / (CAST(sn AS DOUBLE) / CAST(n_naive AS DOUBLE))
             |    END AS mase
             |FROM fc FULL OUTER JOIN nv ON fc.k = nv.k
             |ORDER BY key""".stripMargin)),

    // ---- q272: VOCABULARY GROWTH CURVE — new distinct tokens per
    // 256-doc slab of the corpus in doc-id order, with the cumulative
    // Heaps curve ([[graft.operators.TextAnalysis.vocabularyGrowth]]).
    // Tokens reduce to their first doc; the window runs over bucket
    // rows only.
    Q(
      "q272_vocab_growth",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.vocabularyGrowth(
          Tables.documents(s, d), $"doc_id", $"text", bucketDocs = 32)
          .orderBy($"bucket")
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($sqlToks) AS tok
              |  FROM documents WHERE doc_id IS NOT NULL),
              |fd AS (SELECT tok, min(doc_id) AS fd FROM toks GROUP BY 1),
              |nt AS (SELECT fd // 32 AS bucket, count(*) AS new_tokens
              |  FROM fd GROUP BY 1),
              |dc AS (SELECT doc_id // 32 AS bucket, count(*) AS n_docs
              |  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1)
              |SELECT coalesce(dc.bucket, nt.bucket) AS bucket,
              |  coalesce(n_docs, 0) AS n_docs,
              |  coalesce(new_tokens, 0) AS new_tokens,
              |  CAST(sum(coalesce(new_tokens, 0)) OVER (
              |    ORDER BY coalesce(dc.bucket, nt.bucket)
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              |    AS vocab_cum
              |FROM dc FULL OUTER JOIN nt ON dc.bucket = nt.bucket
              |ORDER BY bucket""".stripMargin)))

  /** Continuation Seq 5: calibration, agreement, feature screening,
    * uplift.
    */
  val all5: Seq[Q] = Seq(

    // ---- q273: EXPECTED CALIBRATION ERROR — each customer scored
    // with their (segment × balance-bucket) historical urgent rate in
    // exact micro-units; ECE collapses algebraically to
    // Σ|pos·10⁶ − Σscore| / (N·10⁶) — ONE exact integer numerator,
    // one pinned division ([[graft.operators.ModelEval.eceFromScores]]).
    Q(
      "q273_ece",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("uk")).distinct()
        val cust = Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"uk", "left")
          .select($"c_mktsegment".as("seg"),
            floor($"c_acctbal" / 1000.0).cast("long").as("bb"),
            $"uk".isNotNull.as("y"))
        val grp = cust.groupBy($"seg", $"bb").agg(
          count(lit(1)).as("gn"),
          sum(when($"y", 1L).otherwise(0L)).as("gp"))
          .select($"seg".as("gseg"), $"bb".as("gbb"),
            expr("(gp * 1000000) div gn").as("sm"))
        val scored = cust.join(grp,
          $"seg" === $"gseg" && $"bb" === $"gbb")
        graft.operators.ModelEval.eceFromScores(scored, $"sm", $"y", bins = 16)
          .withColumn("gap_units", $"gap_units".cast("string"))
      },
      Some("""WITH u AS (SELECT DISTINCT o_custkey AS uk FROM orders
             |  WHERE o_orderpriority = '1-URGENT'),
             |cust AS MATERIALIZED (SELECT c_mktsegment AS seg,
             |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bb,
             |    u.uk IS NOT NULL AS y
             |  FROM customer LEFT JOIN u ON c_custkey = u.uk),
             |grp AS (SELECT seg, bb,
             |    (sum(CASE WHEN y THEN 1 ELSE 0 END) * 1000000) // count(*) AS sm
             |  FROM cust GROUP BY 1, 2),
             |scored AS MATERIALIZED (SELECT sm, y
             |  FROM cust JOIN grp USING (seg, bb)),
             |perbin AS (SELECT least(15, (sm * 16) // 1000000) AS bin,
             |    count(*) AS n,
             |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
             |    CAST(sum(CAST(sm AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS ssum
             |  FROM scored GROUP BY 1),
             |agg AS (SELECT CAST(sum(n) AS BIGINT) AS n,
             |    count(*) AS bins_used,
             |    CAST(sum(abs(CAST(pos AS DECIMAL(19,0)) * 1000000 - ssum))
             |      AS DECIMAL(38,0)) AS gap_units
             |  FROM perbin)
             |SELECT n, bins_used, CAST(gap_units AS VARCHAR) AS gap_units,
             |  CAST(gap_units AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
             |    AS ece
             |FROM agg""".stripMargin)),

    // ---- q274: COHEN'S KAPPA — chance-corrected agreement between
    // the priority band and the order status mapped onto the same
    // 3-label scale ([[graft.operators.Experiment.cohenKappa]]);
    // exact contingency/marginal products in decimal(38,0), κ one
    // pinned chain.
    Q(
      "q274_cohen_kappa",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), "hot")
            .when($"o_orderpriority" === "3-MEDIUM", "mid")
            .otherwise("low").as("r1"),
          when($"o_orderstatus" === "F", "hot")
            .when($"o_orderstatus" === "P", "mid")
            .otherwise("low").as("r2"))
        graft.operators.Experiment.cohenKappa(o, $"r1", $"r2")
      },
      Some("""WITH r AS MATERIALIZED (SELECT
             |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
             |      WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
             |      ELSE 'low' END AS a,
             |    CASE WHEN o_orderstatus = 'F' THEN 'hot'
             |      WHEN o_orderstatus = 'P' THEN 'mid'
             |      ELSE 'low' END AS b
             |  FROM orders),
             |cells AS MATERIALIZED (SELECT a, b, count(*) AS c FROM r
             |  GROUP BY 1, 2),
             |tot AS (SELECT sum(c) AS n,
             |    sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree FROM cells),
             |rm AS (SELECT a, sum(c) AS ra FROM cells GROUP BY 1),
             |cm AS (SELECT b, sum(c) AS cb FROM cells GROUP BY 1),
             |pe AS (SELECT CAST(sum(CAST(coalesce(ra, 0) AS DECIMAL(19,0))
             |    * CAST(coalesce(cb, 0) AS DECIMAL(19,0))) AS DECIMAL(38,0))
             |    AS pe_num
             |  FROM rm FULL OUTER JOIN cm ON rm.a = cm.b)
             |SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
             |  CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
             |  CAST(pe_num AS DOUBLE)
             |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
             |  CASE WHEN CAST(pe_num AS DOUBLE)
             |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
             |    THEN (CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
             |        - CAST(pe_num AS DOUBLE)
             |          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             |      / (1.0 - CAST(pe_num AS DOUBLE)
             |          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             |    END AS kappa
             |FROM tot CROSS JOIN pe""".stripMargin)),

    // ---- q275: GINI FEATURE SCREEN — segment, nation and balance
    // sign ranked as predictors of the urgent flag
    // ([[graft.operators.Profiling.giniFeatureGain]]); per-value
    // terms are pinned doubles of exact integers and the per-feature
    // total is a WINDOW running sum in value order — hash-exact, no
    // ln.
    Q(
      "q275_gini_feature_screen",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("uk")).distinct()
        val cust = Tables.customer(s, d)
          .join(Tables.nation(s, d), $"c_nationkey" === $"n_nationkey")
          .join(urgent, $"c_custkey" === $"uk", "left")
          .select($"c_mktsegment", $"n_name",
            ($"c_acctbal" >= 0).as("pos_bal"), $"uk".isNotNull.as("y"))
        graft.operators.Profiling.giniFeatureGain(
          cust, $"y", Seq(
            "segment" -> $"c_mktsegment",
            "nation" -> $"n_name",
            "bal_sign" -> $"pos_bal"))
          .orderBy($"feature")
      },
      Some("""WITH u AS (SELECT DISTINCT o_custkey AS uk FROM orders
             |  WHERE o_orderpriority = '1-URGENT'),
             |cust AS MATERIALIZED (SELECT c_mktsegment AS seg, n_name,
             |    c_acctbal >= 0 AS pos_bal, u.uk IS NOT NULL AS y
             |  FROM customer
             |  JOIN nation ON c_nationkey = n_nationkey
             |  LEFT JOIN u ON c_custkey = u.uk),
             |melted AS (
             |  SELECT 'segment' AS feature, coalesce(seg, '__null__') AS value,
             |    y FROM cust
             |  UNION ALL SELECT 'nation', coalesce(n_name, '__null__'), y
             |  FROM cust
             |  UNION ALL SELECT 'bal_sign',
             |    coalesce(CAST(pos_bal AS VARCHAR), '__null__'), y FROM cust),
             |cells AS MATERIALIZED (SELECT feature, value, count(*) AS nv,
             |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS pv
             |  FROM melted GROUP BY 1, 2),
             |root AS (SELECT count(*) AS nn,
             |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS pp FROM cust),
             |terms AS MATERIALIZED (SELECT feature, value, nv, pv,
             |    (CAST(nv AS DOUBLE) * CAST(nv AS DOUBLE)
             |      - CAST(pv AS DOUBLE) * CAST(pv AS DOUBLE)
             |      - CAST(nv - pv AS DOUBLE) * CAST(nv - pv AS DOUBLE))
             |      / (CAST(nn AS DOUBLE) * CAST(nv AS DOUBLE)) AS term,
             |    nn, pp
             |  FROM cells CROSS JOIN root),
             |cum AS (SELECT feature, value, nn, pp,
             |    sum(term) OVER (PARTITION BY feature ORDER BY value
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gw,
             |    count(*) OVER (PARTITION BY feature) AS nvals,
             |    row_number() OVER (PARTITION BY feature ORDER BY value DESC)
             |      AS rn
             |  FROM terms)
             |SELECT feature, CAST(nvals AS BIGINT) AS n_values,
             |  gw AS gini_weighted,
             |  2.0 * CAST(pp AS DOUBLE) * (CAST(nn AS DOUBLE)
             |    - CAST(pp AS DOUBLE))
             |    / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) - gw AS gini_gain
             |FROM cum WHERE rn = 1 ORDER BY feature""".stripMargin)),

    // ---- q276: QINI UPLIFT CURVE — hash-arm customers ranked by
    // account balance into 8 exact equal-frequency buckets; per
    // cumulative depth the incremental urgent conversions vs the
    // control baseline ([[graft.operators.ModelEval.qiniCurve]]).
    // The oracle replays the exact order-statistic cuts (the q199
    // pattern) and the pinned qini chain.
    Q(
      "q276_qini_curve",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("uk")).distinct()
        val scored = Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"uk", "left")
          .select($"c_custkey".as("u"), $"c_acctbal".as("s"),
            $"uk".isNotNull.as("y"))
        graft.operators.ModelEval.qiniCurve(scored, $"u", $"s", $"y",
          buckets = 8)
          .orderBy($"bucket")
      },
      Some(s"""WITH u AS (SELECT DISTINCT o_custkey AS uk FROM orders
              |  WHERE o_orderpriority = '1-URGENT'),
              |base AS MATERIALIZED (SELECT
              |    ${graft.operators.KmvSketch.hash60Sql("c_custkey")} % 2 = 0
              |      AS t,
              |    c_acctbal AS s, u.uk IS NOT NULL AS y
              |  FROM customer LEFT JOIN u ON c_custkey = u.uk
              |  WHERE c_acctbal IS NOT NULL AND NOT isnan(c_acctbal)),
              |nn AS (SELECT count(*) AS n FROM base),
              |ranked AS MATERIALIZED (
              |  SELECT s, t, y, row_number() OVER (ORDER BY s) AS r FROM base),
              |cuts AS MATERIALIZED (
              |  SELECT r.s AS cut
              |  FROM ranked r, nn, (SELECT unnest(generate_series(1, 7)) AS i) g
              |  WHERE r.r = CAST(ceil(g.i * nn.n / 8.0) AS BIGINT)),
              |bkt AS (
              |  SELECT r.r, r.t, r.y, 8 - count(c.cut) AS bucket
              |  FROM ranked r LEFT JOIN cuts c ON c.cut < r.s
              |  GROUP BY r.r, r.t, r.y),
              |agg AS (SELECT bucket,
              |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS n_t,
              |    sum(CASE WHEN t AND y THEN 1 ELSE 0 END) AS conv_t,
              |    sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS n_c,
              |    sum(CASE WHEN NOT t AND y THEN 1 ELSE 0 END) AS conv_c
              |  FROM bkt GROUP BY 1),
              |cum AS (SELECT bucket,
              |    CAST(n_t AS BIGINT) AS n_t, CAST(conv_t AS BIGINT) AS conv_t,
              |    CAST(n_c AS BIGINT) AS n_c, CAST(conv_c AS BIGINT) AS conv_c,
              |    CAST(sum(n_t) OVER w AS BIGINT) AS cum_n_t,
              |    CAST(sum(conv_t) OVER w AS BIGINT) AS cum_conv_t,
              |    CAST(sum(n_c) OVER w AS BIGINT) AS cum_n_c,
              |    CAST(sum(conv_c) OVER w AS BIGINT) AS cum_conv_c
              |  FROM agg
              |  WINDOW w AS (ORDER BY bucket
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT CAST(bucket AS INTEGER) AS bucket, n_t, conv_t, n_c,
              |  conv_c, cum_n_t, cum_conv_t, cum_n_c, cum_conv_c,
              |  CASE WHEN cum_n_c > 0
              |    THEN CAST(cum_conv_t AS DOUBLE) - CAST(cum_conv_c AS DOUBLE)
              |      * (CAST(cum_n_t AS DOUBLE) / CAST(cum_n_c AS DOUBLE))
              |    END AS qini
              |FROM cum ORDER BY bucket""".stripMargin)))

  /** Continuation Seq 6: rank correlation, scale reliability,
    * concentration.
    */
  val all6: Seq[Q] = Seq(

    // ---- q277: SPEARMAN ρ — rank correlation between account
    // balance and order count per market segment
    // ([[graft.operators.RankStats.spearman]]): Pearson on DOUBLED
    // midranks from the bucketed machinery (no per-group sort), six
    // decimal(38,0) sufficient statistics, one pinned chain —
    // hash-exact where float ranks never are.
    Q(
      "q277_spearman",
      (s, d) => {
        import s.implicits._
        val oc = Tables.orders(s, d).groupBy($"o_custkey")
          .agg(count(lit(1)).as("oc"))
        val per = Tables.customer(s, d)
          .join(oc, $"c_custkey" === $"o_custkey", "left")
          .select($"c_mktsegment".as("seg"), $"c_acctbal".as("x"),
            coalesce($"oc", lit(0L)).cast("double").as("y"))
        graft.operators.RankStats.spearman(per, $"seg", $"x", $"y")
          .orderBy($"k")
      },
      Some("""WITH oc AS (SELECT o_custkey, count(*) AS oc FROM orders
             |  GROUP BY 1),
             |per AS MATERIALIZED (SELECT c_mktsegment AS k, c_acctbal AS x,
             |    CAST(coalesce(oc.oc, 0) AS DOUBLE) AS y
             |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
             |cx AS (SELECT k, x AS v, count(*) AS c FROM per GROUP BY 1, 2),
             |rx AS MATERIALIZED (SELECT k, v,
             |    2 * coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + c + 1 AS mr2
             |  FROM cx),
             |cy AS (SELECT k, y AS v, count(*) AS c FROM per GROUP BY 1, 2),
             |ry AS MATERIALIZED (SELECT k, v,
             |    2 * coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + c + 1 AS mr2
             |  FROM cy),
             |rws AS MATERIALIZED (SELECT per.k, rx.mr2 AS rx, ry.mr2 AS ry
             |  FROM per
             |  JOIN rx ON per.k = rx.k AND per.x = rx.v
             |  JOIN ry ON per.k = ry.k AND per.y = ry.v),
             |st AS (SELECT k, count(*) AS n,
             |    CAST(sum(CAST(rx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
             |    CAST(sum(CAST(ry AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
             |    CAST(sum(CAST(rx AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sxy,
             |    CAST(sum(CAST(rx AS DECIMAL(19,0)) * CAST(rx AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sxx,
             |    CAST(sum(CAST(ry AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS syy
             |  FROM rws GROUP BY 1)
             |SELECT k, n,
             |  CASE WHEN n > 1
             |      AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
             |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             |    END AS rho
             |FROM st ORDER BY k""".stripMargin)),

    // ---- q278: CRONBACH'S ALPHA — do an order's three size
    // indicators (total quantity, line count, total discount mass)
    // measure one construct?
    // ([[graft.operators.Profiling.cronbachAlpha]]): the variance
    // ratio collapses to two exact decimal(38,0) aggregates, one
    // pinned α chain — hash-exact. Exact decimal numerator and
    // denominator travel as VARCHAR digests.
    Q(
      "q278_cronbach_alpha",
      (s, d) => {
        import s.implicits._
        val per = Tables.lineitem(s, d).groupBy($"l_orderkey").agg(
          sum($"l_quantity".cast("long")).as("it_qty"),
          count(lit(1)).as("it_lines"),
          sum(($"l_discount".cast("decimal(12,6)") * 1000000).cast("long"))
            .as("it_disc"))
        graft.operators.Profiling.cronbachAlpha(per, Seq(
          "qty" -> $"it_qty", "lines" -> $"it_lines", "disc" -> $"it_disc"))
          .withColumn("var_num", $"var_num".cast("string"))
          .withColumn("var_den", $"var_den".cast("string"))
      },
      Some("""WITH per AS MATERIALIZED (SELECT l_orderkey,
             |    sum(CAST(l_quantity AS BIGINT)) AS a,
             |    count(*) AS b,
             |    sum(CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000
             |      AS BIGINT)) AS c
             |  FROM lineitem GROUP BY 1),
             |ag AS (SELECT count(*) AS n,
             |    CAST(sum(CAST(a AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sxa,
             |    CAST(sum(CAST(a AS DECIMAL(19,0)) * CAST(a AS DECIMAL(19,0)))
             |      AS DECIMAL(19,0)) AS sxxa,
             |    CAST(sum(CAST(b AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sxb,
             |    CAST(sum(CAST(b AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0)))
             |      AS DECIMAL(19,0)) AS sxxb,
             |    CAST(sum(CAST(c AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sxc,
             |    CAST(sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
             |      AS DECIMAL(19,0)) AS sxxc,
             |    CAST(sum(CAST(a + b + c AS DECIMAL(19,0)))
             |      AS DECIMAL(19,0)) AS st,
             |    CAST(sum(CAST(a + b + c AS DECIMAL(19,0))
             |      * CAST(a + b + c AS DECIMAL(19,0)))
             |      AS DECIMAL(19,0)) AS stt
             |  FROM per),
             |fin AS (SELECT n,
             |    CAST((CAST(n AS DECIMAL(10,0)) * sxxa - sxa * sxa)
             |      + (CAST(n AS DECIMAL(10,0)) * sxxb - sxb * sxb)
             |      + (CAST(n AS DECIMAL(10,0)) * sxxc - sxc * sxc)
             |      AS DECIMAL(38,0)) AS var_num,
             |    CAST(CAST(n AS DECIMAL(10,0)) * stt - st * st
             |      AS DECIMAL(38,0)) AS var_den
             |  FROM ag)
             |SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k_items,
             |  CAST(var_num AS VARCHAR) AS var_num,
             |  CAST(var_den AS VARCHAR) AS var_den,
             |  CASE WHEN var_den > 0
             |    THEN 3.0 * (1.0 - CAST(var_num AS DOUBLE)
             |        / CAST(var_den AS DOUBLE)) / 2.0
             |    END AS alpha
             |FROM fin""".stripMargin)),

    // ---- q279: HERFINDAHL CONCENTRATION — customer revenue
    // concentration per nation, HHI = Σwᵢ²/W² from two exact
    // decimal(38,0) aggregates
    // ([[graft.operators.Profiling.herfindahl]]).
    Q(
      "q279_herfindahl",
      (s, d) => {
        import s.implicits._
        val rev = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .select($"c_nationkey".as("nk"), $"c_custkey".as("ck"),
            ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("w"))
        graft.operators.Profiling.herfindahl(rev, $"nk", $"ck", $"w")
          .orderBy($"k")
      },
      Some("""WITH rev AS MATERIALIZED (SELECT c_nationkey AS k,
             |    c_custkey AS e,
             |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS w
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |st AS (SELECT k, count(*) AS n_entities,
             |    CAST(sum(CAST(w AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sw,
             |    CAST(sum(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sw2
             |  FROM rev GROUP BY 1)
             |SELECT k, n_entities,
             |  CASE WHEN sw > 0 THEN CAST(sw2 AS DOUBLE)
             |    / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)) END AS hhi
             |FROM st ORDER BY k""".stripMargin)))

  /** Continuation Seq 7: storage estimation + graph structure
    * metrics over the q162 part co-purchase graph.
    */
  val all7: Seq[Q] = Seq(

    // ---- q280: DELTA-VARINT POSTING SIZE — what would the documents
    // inverted index cost under gap+LEB128 encoding vs raw 8-byte
    // ids? ([[graft.operators.Encoding.postingVarintEstimate]]) Pure
    // integer CASE thresholds at powers of 128 — hash-exact.
    Q(
      "q280_posting_varint",
      (s, d) => {
        import s.implicits._
        val post = Tables.documents(s, d)
          .filter($"doc_id".isNotNull)
          .select($"doc_id",
            explode(graft.operators.TextAnalysis.tokens($"text")).as("t"))
        graft.operators.Encoding.postingVarintEstimate(post, $"t", $"doc_id")
      },
      Some(s"""WITH post AS MATERIALIZED (SELECT DISTINCT tok AS t,
              |    doc_id AS id
              |  FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents
              |    WHERE doc_id IS NOT NULL)),
              |g AS (SELECT t,
              |    coalesce(id - lag(id) OVER (PARTITION BY t ORDER BY id), id)
              |      AS enc
              |  FROM post),
              |v AS (SELECT CASE WHEN enc < 128 THEN 1
              |    WHEN enc < 16384 THEN 2 WHEN enc < 2097152 THEN 3
              |    WHEN enc < 268435456 THEN 4 WHEN enc < 34359738368 THEN 5
              |    WHEN enc < 4398046511104 THEN 6 ELSE 7 END AS vb, t
              |  FROM g)
              |SELECT count(DISTINCT t) AS n_terms, count(*) AS n_postings,
              |  count(*) * 8 AS raw_bytes,
              |  CAST(sum(vb) AS BIGINT) AS varint_bytes,
              |  CAST(sum(vb) AS DOUBLE) / CAST(count(*) * 8 AS DOUBLE)
              |    AS ratio
              |FROM v""".stripMargin)),

    // ---- q281: RICH-CLUB COEFFICIENTS — does the co-purchase
    // graph's high-degree elite over-connect internally?
    // ([[graft.operators.Graph.richClub]]) One conditional
    // aggregation for every threshold; exact integers.
    Q(
      "q281_rich_club",
      (s, d) => {
        import s.implicits._
        graft.operators.Graph.richClub(
          copurchaseEdges(s, d), $"src", $"dst",
          ks = Seq(120L, 140L, 160L, 180L))
          .orderBy($"k")
      },
      Some(s"""WITH $sqlCopurchase,
              |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon
              |  UNION ALL SELECT b, a FROM canon),
              |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM sym
              |  GROUP BY 1),
              |j AS MATERIALIZED (SELECT s.src, s.dst, da.deg AS da,
              |    db.deg AS db
              |  FROM sym s JOIN deg da ON s.src = da.src
              |  JOIN deg db ON s.dst = db.src
              |  WHERE s.src < s.dst),
              |e AS (SELECT k,
              |    sum(CASE WHEN da > k AND db > k THEN 1 ELSE 0 END) AS ek
              |  FROM j CROSS JOIN (SELECT unnest([120, 140, 160, 180]) AS k)
              |  GROUP BY 1),
              |n AS (SELECT k, sum(CASE WHEN deg > k THEN 1 ELSE 0 END) AS nk
              |  FROM deg CROSS JOIN (SELECT unnest([120, 140, 160, 180]) AS k)
              |  GROUP BY 1)
              |SELECT CAST(e.k AS BIGINT) AS k, CAST(nk AS BIGINT) AS n_nodes,
              |  CAST(ek AS BIGINT) AS n_club_edges,
              |  CASE WHEN nk >= 2 THEN 2.0 * CAST(ek AS DOUBLE)
              |    / (CAST(nk AS DOUBLE) * (CAST(nk AS DOUBLE) - 1.0)) END
              |    AS phi
              |FROM e JOIN n ON e.k = n.k ORDER BY k""".stripMargin)),

    // ---- q282: DEGREE ASSORTATIVITY — do hub parts co-purchase
    // with other hubs? ([[graft.operators.Graph.degreeAssortativity]])
    // Pearson over directed-orientation endpoint degrees from six
    // decimal(38,0) statistics — hash-exact.
    Q(
      "q282_assortativity",
      (s, d) => {
        import s.implicits._
        graft.operators.Graph.degreeAssortativity(
          copurchaseEdges(s, d), $"src", $"dst")
      },
      Some(s"""WITH $sqlCopurchase,
              |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon
              |  UNION ALL SELECT b, a FROM canon),
              |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM sym
              |  GROUP BY 1),
              |j AS (SELECT da.deg AS da, db.deg AS db
              |  FROM sym s JOIN deg da ON s.src = da.src
              |  JOIN deg db ON s.dst = db.src),
              |st AS (SELECT count(*) AS m2,
              |    CAST(sum(CAST(da AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sa,
              |    CAST(sum(CAST(db AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sb,
              |    CAST(sum(CAST(da AS DECIMAL(19,0)) * CAST(db AS DECIMAL(19,0)))
              |      AS DECIMAL(38,0)) AS sab,
              |    CAST(sum(CAST(da AS DECIMAL(19,0)) * CAST(da AS DECIMAL(19,0)))
              |      AS DECIMAL(38,0)) AS saa,
              |    CAST(sum(CAST(db AS DECIMAL(19,0)) * CAST(db AS DECIMAL(19,0)))
              |      AS DECIMAL(38,0)) AS sbb
              |  FROM j),
              |nn AS (SELECT count(*) AS n_nodes FROM deg)
              |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
              |  CAST(m2 // 2 AS BIGINT) AS n_edges,
              |  CASE WHEN CAST(m2 AS DOUBLE) * CAST(saa AS DOUBLE)
              |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
              |    AND CAST(m2 AS DOUBLE) * CAST(sbb AS DOUBLE)
              |      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
              |    THEN (CAST(m2 AS DOUBLE) * CAST(sab AS DOUBLE)
              |        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
              |      / (sqrt(CAST(m2 AS DOUBLE) * CAST(saa AS DOUBLE)
              |          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
              |        * sqrt(CAST(m2 AS DOUBLE) * CAST(sbb AS DOUBLE)
              |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
              |    END AS r
              |FROM st CROSS JOIN nn""".stripMargin)),

    // ---- q283: GLOBAL CLUSTERING COEFFICIENT — the wedge-closure
    // ratio 3T/W over the co-purchase graph
    // ([[graft.operators.Graph.globalClustering]]); triangle mass
    // reuses the degree-ordered O(E^1.5) enumeration, wedges one
    // aggregation over degrees.
    Q(
      "q283_global_clustering",
      (s, d) => {
        import s.implicits._
        graft.operators.Graph.globalClustering(
          copurchaseEdges(s, d), $"src", $"dst")
          .withColumn("wedges", $"wedges".cast("string"))
      },
      Some(s"""WITH $sqlCopurchase,
              |tri AS MATERIALIZED (
              |  SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
              |  FROM canon e1
              |  JOIN canon e2 ON e2.a = e1.b
              |  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
              |sym AS (SELECT a AS src FROM canon
              |  UNION ALL SELECT b FROM canon),
              |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM sym
              |  GROUP BY 1),
              |ds AS (SELECT count(*) AS n_nodes,
              |    CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
              |    sum(CAST(deg AS BIGINT) * CAST(deg - 1 AS BIGINT)) AS w2
              |  FROM deg),
              |tt AS (SELECT count(*) AS t FROM tri)
              |SELECT CAST(n_nodes AS BIGINT) AS n_nodes, n_edges,
              |  CAST(t AS BIGINT) AS triangles,
              |  CAST(w2 // 2 AS VARCHAR) AS wedges,
              |  CASE WHEN w2 > 0
              |    THEN CAST(t * 3 AS DOUBLE) / (CAST(w2 AS DOUBLE) / 2.0)
              |    END AS gcc
              |FROM ds CROSS JOIN tt""".stripMargin)))

  /** The q162 part co-purchase edge list: parts sharing an order,
    * canonical (a < b).
    */
  private def copurchaseEdges(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val it = Tables.lineitem(s, d)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
      .distinct()
    it.as("l").join(it.as("r"),
      col("l.b") === col("r.b") && col("l.p") < col("r.p"))
      .select(col("l.p").as("src"), col("r.p").as("dst"))
  }

  private def sqlCopurchase: String =
    """it AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS b, l_partkey AS p
      |  FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      |canon AS MATERIALIZED (
      |  SELECT DISTINCT l.p AS a, r.p AS b
      |  FROM it l JOIN it r ON l.b = r.b AND l.p < r.p)""".stripMargin

  /** q261 drive: q243's scrambled-slice geometry (hash-chosen
    * boundary bands moved one slice later, inside the watermark
    * delay) with the flush sentinel filtered by the operator's own
    * `values` set.
    */
  private def streamingRle(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val scratch = Scratch.tempDir("q261_rle_ooo")
    try {
      val ev = Tables.events(s, d)
        .filter($"user_id".isNotNull && $"ts".isNotNull && $"event_id".isNotNull)
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
      val name = "q261_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.RunLength.encodeEventTime(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.streaming.PatternMatch.Ev],
        values = Set("view", "click", "purchase", "error"),
        idleCloseUs = 2L * 86400L * 1000000L,
        delay = "2 days")
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q261 stream did not terminate within 600s — refusing a partial run set")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 4,
          s"q261 ran $dataBatches data micro-batch(es); the out-of-order point " +
            "needs all 3 scrambled slices + the flush sentinel as separate batches")
        val drained = q.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        require(drained.contains(0L),
          s"q261 run-length state not drained at end of stream: $drained rows")
        s.table(name)
          .select($"user_id", $"value", $"start_us", $"end_us", $"n")
          .orderBy($"user_id", $"start_us")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }
}

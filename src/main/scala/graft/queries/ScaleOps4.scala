package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Attribution, Cf, Graph, MarketBasket, Profiling, Regression}

/** Round-6 continuation (q161–q168): pairwise association-rule
  * mining, degree-oriented triangle counting, grouped closed-form
  * multi-feature OLS, first/last-touch conversion attribution,
  * item-item collaborative filtering, label-propagation communities,
  * the Benford first-digit audit, and per-group Gini concentration —
  * operator families the catalog did not yet cover.
  */
object ScaleOps4 {

  /** Unrolled synchronous-LPA oracle over the part co-order graph:
    * the q89 replay pattern — each iteration is a count CTE plus a
    * (count DESC, label ASC) argmax CTE, all MATERIALIZED (referenced
    * twice), ending in an exact integer hash-match.
    */
  private def lpaOracle(iters: Int): String = {
    val header =
      """WITH it AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |ed AS MATERIALIZED (
        |  SELECT DISTINCT l.p AS s, r.p AS t
        |  FROM it l JOIN it r ON l.ok = r.ok AND l.p < r.p),
        |e AS MATERIALIZED (SELECT s AS a, t AS b FROM ed UNION ALL SELECT t AS a, s AS b FROM ed),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM e)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.b AS node, l.lbl AS lbl, count(*) AS c
         |  FROM e JOIN l${i - 1} l ON l.node = e.a GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT node, lbl FROM c$i
         |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) = 1)""".stripMargin
    }
    (Seq(header) ++ steps).mkString(",\n") +
      s"\nSELECT node, lbl FROM l$iters ORDER BY node"
  }

  /** Certificate oracle for [[graft.operators.Clustering.lloyd]]:
    * re-derives the deterministic seeds, then for every refined
    * iteration replays the assignment from the EMITTED previous
    * centroids with the exact `list_dot_product` decomposition the
    * Scala kernel computes (q90 precedent), and verifies the emitted
    * counts exactly and the emitted means to 1e-9 (partition-ordered
    * double sums are the one non-portable step). Empty clusters must
    * carry the previous centroid verbatim.
    */
  private def lloydOracle(k: Int, iters: Int, dim: Int): String = {
    val hash = graft.operators.KmvSketch.hash60Sql("vec_id")
    val header =
      s"""WITH outp AS (SELECT * FROM read_parquet('{{OUT}}/q169_lloyd_kmeans/*.parquet')),
         |e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings
         |  WHERE vec_id IS NOT NULL AND len(embedding) = $dim
         |    AND len(list_filter(CAST(embedding AS DOUBLE[]), x -> x IS NULL OR isnan(x))) = 0),
         |seeds AS MATERIALIZED (SELECT cid, v FROM (
         |  SELECT v, row_number() OVER (ORDER BY $hash, vec_id) AS cid FROM e) WHERE cid <= $k),
         |cent AS MATERIALIZED (SELECT iter, cid, list(value ORDER BY dim_idx) AS c
         |  FROM outp WHERE dim_idx >= 0 GROUP BY iter, cid),
         |cnts AS MATERIALIZED (SELECT iter, cid, CAST(value AS BIGINT) AS n
         |  FROM outp WHERE dim_idx = -1),
         |dims AS (SELECT unnest(generate_series(0, ${dim - 1})) AS d)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""a$t AS MATERIALIZED (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      (list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.c)
         |        + list_dot_product(c.c, c.c)) ASC, c.cid ASC) AS rn
         |  FROM e CROSS JOIN (SELECT cid, c FROM cent WHERE iter = ${t - 1}) c)
         |  WHERE rn = 1),
         |m$t AS MATERIALIZED (SELECT cid, d, sum(x) / count(*) AS mu, count(*) AS n FROM (
         |  SELECT a.cid, dims.d, a.v[dims.d + 1] AS x FROM a$t a CROSS JOIN dims)
         |  GROUP BY cid, d),
         |bad$t AS (SELECT
         |    -- counts: emitted n must equal the replayed cluster size
         |    EXISTS (SELECT 1 FROM cnts LEFT JOIN (SELECT cid, max(n) AS n FROM m$t GROUP BY cid) m
         |        ON cnts.cid = m.cid
         |      WHERE cnts.iter = $t AND coalesce(m.n, 0) <> cnts.n)
         |    -- refined centroids: mean to 1e-9 where the cluster is
         |    -- non-empty; the previous centroid VERBATIM where empty
         |    OR EXISTS (SELECT 1 FROM cent c JOIN m$t m ON c.cid = m.cid
         |      WHERE c.iter = $t AND abs(c.c[m.d + 1] - m.mu) > 1e-9)
         |    OR EXISTS (SELECT 1 FROM cent c JOIN cnts ON cnts.iter = $t AND cnts.cid = c.cid
         |      JOIN cent p ON p.iter = ${t - 1} AND p.cid = c.cid
         |      WHERE c.iter = $t AND cnts.n = 0 AND c.c <> p.c)
         |    AS bad)""".stripMargin
    }
    val badAll = (1 to iters).map(t => s"(SELECT bad FROM bad$t)").mkString(" OR ")
    val gate =
      s"""flag AS (SELECT NOT (
         |    $badAll
         |    -- seeds: iter-0 centroids are the content-hash-selected
         |    -- vectors, bit-exact
         |    OR EXISTS (SELECT 1 FROM seeds s JOIN cent c ON c.iter = 0 AND c.cid = s.cid
         |      WHERE c.c <> s.v)
         |    OR (SELECT count(*) FROM outp) <> ${(iters + 1) * k * dim + iters * k}
         |    OR (SELECT count(*) FROM cent) <> ${(iters + 1) * k}
         |    OR (SELECT count(*) FROM cnts WHERE n < 0) <> 0
         |  ) AS ok)
         |SELECT iter, cid, dim_idx, value FROM outp WHERE (SELECT ok FROM flag)
         |UNION ALL
         |SELECT CAST(-1 AS INT), CAST(-1 AS INT), CAST(-999 AS INT), CAST(-999 AS DOUBLE)
         |WHERE NOT (SELECT ok FROM flag)
         |ORDER BY iter, cid, dim_idx""".stripMargin
    (Seq(header) ++ steps ++ Seq(gate)).mkString(",\n")
  }

  /** Unrolled HITS replay (q89 pagerank-oracle pattern): per
    * iteration an auth half-step CTE + its L2 norm, then a hub
    * half-step + norm; tolerance gate at 1e-9 (float reductions are
    * partition-ordered on the Spark side).
    */
  private def hitsOracle(iters: Int): String = {
    val header =
      """WITH e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
        |    CAST(l_partkey AS BIGINT) + 1000000 AS dst FROM lineitem),
        |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |s0 AS MATERIALIZED (SELECT node, 1.0 AS hub, 1.0 AS auth FROM nodes)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""ra$k AS MATERIALIZED (SELECT nodes.node, coalesce(c.a, 0) AS a
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.hub) AS a
         |    FROM s${k - 1} p JOIN e ON e.src = p.node GROUP BY e.dst) c USING (node)),
         |na$k AS (SELECT sqrt(sum(a * a)) AS n FROM ra$k),
         |au$k AS MATERIALIZED (SELECT node,
         |  CASE WHEN (SELECT n FROM na$k) > 0 THEN a / (SELECT n FROM na$k) ELSE 0.0 END AS auth
         |  FROM ra$k),
         |rh$k AS MATERIALIZED (SELECT nodes.node, coalesce(c.h, 0) AS h
         |  FROM nodes LEFT JOIN (
         |    SELECT e.src AS node, sum(p.auth) AS h
         |    FROM au$k p JOIN e ON e.dst = p.node GROUP BY e.src) c USING (node)),
         |nh$k AS (SELECT sqrt(sum(h * h)) AS n FROM rh$k),
         |s$k AS MATERIALIZED (SELECT rh$k.node,
         |  CASE WHEN (SELECT n FROM nh$k) > 0 THEN h / (SELECT n FROM nh$k) ELSE 0.0 END AS hub,
         |  au$k.auth
         |  FROM rh$k JOIN au$k USING (node))""".stripMargin
    }
    val gate =
      s"""emitted AS (SELECT node, hub, auth FROM read_parquet('{{OUT}}/q173_hits/*.parquet')),
         |flag AS (SELECT (
         |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM s$iters)
         |    AND (SELECT count(DISTINCT node) FROM emitted) = (SELECT count(*) FROM emitted)
         |    AND NOT EXISTS (SELECT 1 FROM emitted x LEFT JOIN s$iters r USING (node)
         |      WHERE r.node IS NULL OR abs(x.hub - r.hub) > 1e-9
         |         OR abs(x.auth - r.auth) > 1e-9)
         |  ) AS ok)
         |SELECT node, hub, auth FROM emitted WHERE (SELECT ok FROM flag)
         |UNION ALL
         |SELECT CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
         |WHERE NOT (SELECT ok FROM flag)
         |ORDER BY node""".stripMargin
    (Seq(header) ++ steps ++ Seq(gate)).mkString(",\n")
  }

  val all: Seq[Q] = Seq(

    // ---- q161: market-basket association rules over (order, brand)
    // baskets. Counts are exact integers; support/confidence/lift are
    // single IEEE divisions of those integers in a pinned order, so
    // the oracle reproduces the doubles bit-for-bit and the gate can
    // hash-match. The brand dimension join broadcasts; the only wide
    // exchanges are the basket self-join (co-partitioned on order id,
    // pair fan-out bounded by lines-per-order) and the pair count.
    Q(
      "q161_assoc_rules",
      (s, d) => {
        import s.implicits._
        val items = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
          .select($"l_orderkey", $"p_brand")
        MarketBasket.associationRules(items, $"l_orderkey", $"p_brand",
            minPairCount = 2L, minConfidence = 0.05)
          .orderBy($"antecedent", $"consequent")
      },
      Some("""WITH it AS MATERIALIZED (
             |  SELECT DISTINCT l_orderkey AS b, p_brand AS i
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL),
             |marg AS MATERIALIZED (SELECT i, count(*) AS item_n FROM it GROUP BY 1),
             |nb AS (SELECT count(DISTINCT b) AS n FROM it),
             |pairs AS MATERIALIZED (
             |  SELECT l.i AS ia, r.i AS ib, count(*) AS pair_n
             |  FROM it l JOIN it r ON l.b = r.b AND l.i < r.i
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |dir AS (
             |  SELECT ia AS antecedent, ib AS consequent, pair_n FROM pairs
             |  UNION ALL
             |  SELECT ib AS antecedent, ia AS consequent, pair_n FROM pairs)
             |SELECT d.antecedent, d.consequent, d.pair_n,
             |  a.item_n AS ante_n, c.item_n AS cons_n,
             |  CAST(d.pair_n AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
             |  CAST(d.pair_n AS DOUBLE) / CAST(a.item_n AS DOUBLE) AS confidence,
             |  (CAST(d.pair_n AS DOUBLE) / CAST(a.item_n AS DOUBLE))
             |    / (CAST(c.item_n AS DOUBLE) / CAST(nb.n AS DOUBLE)) AS lift
             |FROM dir d
             |JOIN marg a ON d.antecedent = a.i
             |JOIN marg c ON d.consequent = c.i
             |CROSS JOIN nb
             |WHERE CAST(d.pair_n AS DOUBLE) / CAST(a.item_n AS DOUBLE) >= 0.05
             |ORDER BY antecedent, consequent""".stripMargin),
      bench = true),

    // ---- q162: per-node triangle counts over the part co-order
    // graph (parts are adjacent when some order contains both). The
    // Spark plan orients edges by (degree, id) — wedge work bounded
    // O(E^1.5) under any skew; the oracle needs no orientation at all
    // (a triangle is a triangle): it 3-way-joins the canonical a<b
    // edge list on id order, which enumerates the identical set.
    Q(
      "q162_triangle_counts",
      (s, d) => {
        import s.implicits._
        val it = Tables.lineitem(s, d)
          .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
          .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
          .distinct()
        val edges = it.as("l").join(it.as("r"),
            col("l.b") === col("r.b") && col("l.p") < col("r.p"))
          .select(col("l.p").as("src"), col("r.p").as("dst"))
        Graph.triangleCounts(edges, $"src", $"dst")
          .orderBy($"node")
      },
      Some("""WITH it AS MATERIALIZED (
             |  SELECT DISTINCT l_orderkey AS b, l_partkey AS p
             |  FROM lineitem
             |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |canon AS MATERIALIZED (
             |  SELECT DISTINCT l.p AS a, r.p AS b
             |  FROM it l JOIN it r ON l.b = r.b AND l.p < r.p),
             |tri AS MATERIALIZED (
             |  SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
             |  FROM canon e1
             |  JOIN canon e2 ON e2.a = e1.b
             |  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT node, count(*) AS tri_n
             |FROM (
             |  SELECT n1 AS node FROM tri
             |  UNION ALL SELECT n2 FROM tri
             |  UNION ALL SELECT n3 FROM tri)
             |GROUP BY node
             |ORDER BY node""".stripMargin),
      bench = true),

    // ---- q163: grouped 2-feature OLS (extendedprice on quantity and
    // discount, per brand) from one pass of exact decimal sufficient
    // statistics. Coefficients are doubles solved in a pinned order
    // from EXACT statistics; the only cross-engine drift is the
    // 1-ulp decimal→double cast (q112 precedent), so the oracle
    // recomputes the solve and accepts within a 1e-9 relative band,
    // checking the null pattern (singular groups) exactly.
    Q(
      "q163_grouped_ols",
      (s, d) => {
        import s.implicits._
        val df = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
        Regression.groupedOls2(df, $"p_brand",
            $"l_extendedprice", $"l_quantity", $"l_discount")
          .orderBy($"key")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q163_grouped_ols/*.parquet')),
             |base AS (SELECT p_brand AS k,
             |    CAST(l_extendedprice AS DECIMAL(19,4)) AS y,
             |    CAST(l_quantity AS DECIMAL(19,4)) AS x1,
             |    CAST(l_discount AS DECIMAL(19,4)) AS x2
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand IS NOT NULL
             |    AND l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
             |    AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
             |    AND l_discount IS NOT NULL AND NOT isnan(l_discount)),
             |st AS (SELECT k, count(*) AS n,
             |    CAST(sum(x1) AS DOUBLE) AS sx1, CAST(sum(x2) AS DOUBLE) AS sx2,
             |    CAST(sum(y) AS DOUBLE) AS sy,
             |    CAST(sum(x1 * x1) AS DOUBLE) AS sx1x1,
             |    CAST(sum(x2 * x2) AS DOUBLE) AS sx2x2,
             |    CAST(sum(x1 * x2) AS DOUBLE) AS sx1x2,
             |    CAST(sum(x1 * y) AS DOUBLE) AS sx1y,
             |    CAST(sum(x2 * y) AS DOUBLE) AS sx2y,
             |    CAST(sum(y * y) AS DOUBLE) AS syy
             |  FROM base GROUP BY k),
             |ctr AS (SELECT k, n,
             |    sx1x1 - sx1 * sx1 / CAST(n AS DOUBLE) AS c11,
             |    sx2x2 - sx2 * sx2 / CAST(n AS DOUBLE) AS c22,
             |    sx1x2 - sx1 * sx2 / CAST(n AS DOUBLE) AS c12,
             |    sx1y - sx1 * sy / CAST(n AS DOUBLE) AS c1y,
             |    sx2y - sx2 * sy / CAST(n AS DOUBLE) AS c2y,
             |    syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
             |    sx1, sx2, sy
             |  FROM st),
             |sol AS (SELECT k, n, c1y, c2y, cyy, sx1, sx2, sy,
             |    c11 * c22 - c12 * c12 AS det,
             |    n >= 3 AND c11 * c22 - c12 * c12 > 1e-9 * c11 * c22 AS ok_det,
             |    c11, c22, c12
             |  FROM ctr),
             |expect AS (SELECT k, n,
             |    CASE WHEN ok_det THEN (c22 * c1y - c12 * c2y) / det END AS b1,
             |    CASE WHEN ok_det THEN (c11 * c2y - c12 * c1y) / det END AS b2,
             |    CASE WHEN ok_det THEN
             |      (sy - ((c22 * c1y - c12 * c2y) / det) * sx1
             |          - ((c11 * c2y - c12 * c1y) / det) * sx2) / CAST(n AS DOUBLE) END AS b0,
             |    CASE WHEN ok_det AND cyy > 0 THEN
             |      (((c22 * c1y - c12 * c2y) / det) * c1y
             |       + ((c11 * c2y - c12 * c1y) / det) * c2y) / cyy END AS r2
             |  FROM sol),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT key) FROM emitted) = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.key = x.k
             |      WHERE e.n <> x.n
             |         OR (e.b0 IS NULL) <> (x.b0 IS NULL)
             |         OR abs(coalesce(e.b0, 0) - coalesce(x.b0, 0)) > 1e-9 * greatest(1, abs(coalesce(x.b0, 0)))
             |         OR (e.b1 IS NULL) <> (x.b1 IS NULL)
             |         OR abs(coalesce(e.b1, 0) - coalesce(x.b1, 0)) > 1e-9 * greatest(1, abs(coalesce(x.b1, 0)))
             |         OR (e.b2 IS NULL) <> (x.b2 IS NULL)
             |         OR abs(coalesce(e.b2, 0) - coalesce(x.b2, 0)) > 1e-9 * greatest(1, abs(coalesce(x.b2, 0)))
             |         OR (e.r2 IS NULL) <> (x.r2 IS NULL)
             |         OR abs(coalesce(e.r2, 0) - coalesce(x.r2, 0)) > 1e-9 * greatest(1, abs(coalesce(x.r2, 0))))
             |    AND NOT EXISTS (SELECT 1 FROM emitted e WHERE e.key NOT IN (SELECT k FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x WHERE x.k NOT IN (SELECT key FROM emitted))
             |  ) AS ok)
             |SELECT key, n, b0, b1, b2, r2 FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'ORACLE-MISMATCH', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY key""".stripMargin)),

    // ---- q164: first/last-touch conversion attribution. One shuffle
    // on user id; both attributions are ignore-nulls carry-forwards
    // over the strictly-preceding frame of the (ts, event_id) total
    // order, so ties are deterministic and the gate hash-matches
    // exactly (timestamps and integer microsecond gaps, no floats).
    Q(
      "q164_touch_attribution",
      (s, d) => {
        import s.implicits._
        Attribution.touchAttribution(Tables.events(s, d),
            $"user_id", $"ts", $"event_id", $"event_type",
            $"event_type" === "purchase")
          .withColumnRenamed("user", "user_id")
          .orderBy($"conv_id")
      },
      Some("""WITH base AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    event_type = 'purchase' AS is_conv
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_id IS NOT NULL AND event_type IS NOT NULL),
             |w AS (SELECT *,
             |    last_value(CASE WHEN NOT is_conv THEN event_type END IGNORE NULLS) OVER win AS lt_type,
             |    last_value(CASE WHEN NOT is_conv THEN ts END IGNORE NULLS) OVER win AS lt_ts,
             |    first_value(CASE WHEN NOT is_conv THEN event_type END IGNORE NULLS) OVER win AS ft_type,
             |    first_value(CASE WHEN NOT is_conv THEN ts END IGNORE NULLS) OVER win AS ft_ts
             |  FROM base
             |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT event_id AS conv_id, user_id, ts AS conv_ts,
             |  ft_type AS first_touch_type, ft_ts AS first_touch_ts,
             |  lt_type AS last_touch_type, lt_ts AS last_touch_ts,
             |  epoch_us(ts) - epoch_us(lt_ts) AS gap_us
             |FROM w WHERE is_conv
             |ORDER BY conv_id""".stripMargin)),

    // ---- q165: item-item collaborative filtering — top-5 cosine
    // neighbors per brand on the binary customer×brand matrix. Counts
    // are exact; cosine is three correctly-rounded IEEE ops in pinned
    // order, so the gate hash-matches the doubles; rank ties break on
    // the neighbor id in both engines.
    Q(
      "q165_item_cf_topk",
      (s, d) => {
        import s.implicits._
        val interactions = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
          .select($"o_custkey", $"p_brand")
        Cf.itemCosineTopK(interactions, $"o_custkey", $"p_brand", k = 5, minCo = 2L)
          .orderBy($"item", $"rank")
      },
      Some("""WITH it AS MATERIALIZED (
             |  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS u, p_brand AS i
             |  FROM orders
             |  JOIN lineitem ON o_orderkey = l_orderkey
             |  JOIN part ON l_partkey = p_partkey
             |  WHERE o_custkey IS NOT NULL AND p_brand IS NOT NULL),
             |marg AS MATERIALIZED (SELECT i, count(*) AS item_n FROM it GROUP BY 1),
             |pairs AS MATERIALIZED (
             |  SELECT l.i AS ia, r.i AS ib, count(*) AS co_n
             |  FROM it l JOIN it r ON l.u = r.u AND l.i < r.i
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |dir AS (
             |  SELECT ia AS item, ib AS neighbor, co_n FROM pairs
             |  UNION ALL SELECT ib AS item, ia AS neighbor, co_n FROM pairs),
             |scored AS (
             |  SELECT d.item, d.neighbor, d.co_n, a.item_n, c.item_n AS nbr_n,
             |    CAST(d.co_n AS DOUBLE)
             |      / (sqrt(CAST(a.item_n AS DOUBLE)) * sqrt(CAST(c.item_n AS DOUBLE))) AS cosine
             |  FROM dir d JOIN marg a ON d.item = a.i JOIN marg c ON d.neighbor = c.i)
             |SELECT item, neighbor, CAST(rank AS INT) AS rank, co_n, item_n, nbr_n, cosine
             |FROM (SELECT *, row_number() OVER (PARTITION BY item
             |    ORDER BY cosine DESC, neighbor ASC) AS rank FROM scored)
             |WHERE rank <= 5
             |ORDER BY item, rank""".stripMargin)),

    // ---- q166: label-propagation communities on the part co-order
    // graph, 4 synchronous rounds, most-frequent-neighbor-label with
    // min-label ties — fully deterministic, so the oracle replays the
    // rounds as unrolled CTEs (the q89 pattern) and the all-integer
    // output hash-matches exactly.
    Q(
      "q166_label_propagation",
      (s, d) => {
        import s.implicits._
        val it = Tables.lineitem(s, d)
          .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
          .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
          .distinct()
        val edges = it.as("l").join(it.as("r"),
            col("l.b") === col("r.b") && col("l.p") < col("r.p"))
          .select(col("l.p").as("src"), col("r.p").as("dst"))
        Graph.labelPropagation(edges, $"src", $"dst", iters = 4)
          .orderBy($"node")
      },
      Some(lpaOracle(4))),

    // ---- q167: Benford first-digit audit of line amounts — the
    // forensic fabricated-amounts test. The digit comes from the
    // decimal string of round(amount·100) (libm-free, exact in any
    // engine); Benford expectations are cast literals; shares are
    // pinned single divisions of exact counts → exact hash match.
    Q(
      "q167_benford_audit",
      (s, d) => {
        import s.implicits._
        Profiling.benfordFirstDigit(Tables.lineitem(s, d), $"l_extendedprice", scale = 2)
          .orderBy($"digit")
      },
      Some("""WITH base AS (
             |  SELECT substring(CAST(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS VARCHAR), 1, 1) AS digit
             |  FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
             |    AND l_extendedprice > 0),
             |fb AS MATERIALIZED (SELECT digit FROM base WHERE digit <> '0'),
             |counts AS MATERIALIZED (SELECT digit, count(*) AS n FROM fb GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts),
             |exp AS (SELECT * FROM (VALUES
             |  ('1', CAST('0.3010299956639812' AS DOUBLE)),
             |  ('2', CAST('0.17609125905568124' AS DOUBLE)),
             |  ('3', CAST('0.12493873660829993' AS DOUBLE)),
             |  ('4', CAST('0.09691001300805642' AS DOUBLE)),
             |  ('5', CAST('0.07918124604762482' AS DOUBLE)),
             |  ('6', CAST('0.06694678963061322' AS DOUBLE)),
             |  ('7', CAST('0.05799194697768673' AS DOUBLE)),
             |  ('8', CAST('0.05115252244738129' AS DOUBLE)),
             |  ('9', CAST('0.04575749056067514' AS DOUBLE))) AS v(digit, expected_share))
             |SELECT c.digit, c.n,
             |  CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS share,
             |  e.expected_share,
             |  (CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE)) - e.expected_share AS deviation
             |FROM counts c JOIN exp e USING (digit) CROSS JOIN tot t
             |ORDER BY digit""".stripMargin)),

    // ---- q168: Gini concentration of customer revenue within each
    // nation — who owns the market. Rank-weighted sums accumulate in
    // exact decimal; the closed form is a pinned double solve, so the
    // oracle recomputes it and accepts within the 1e-9 relative band
    // (q163 pattern; the decimal→double cast is the only drift).
    Q(
      "q168_gini_revenue",
      (s, d) => {
        import s.implicits._
        val rev = Tables.orders(s, d)
          .groupBy($"o_custkey")
          .agg(sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("revenue"))
        val byNation = rev
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        Profiling.gini(byNation, $"n_name", $"c_custkey", $"revenue")
          .orderBy($"group")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q168_gini_revenue/*.parquet')),
             |rev AS (SELECT o_custkey,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS revenue
             |  FROM orders GROUP BY 1),
             |base AS (SELECT n_name AS grp, c_custkey AS id,
             |    CAST(revenue AS DECIMAL(19,4)) AS x
             |  FROM rev
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  WHERE n_name IS NOT NULL AND revenue IS NOT NULL AND NOT isnan(revenue)),
             |rk AS (SELECT grp, CAST(row_number() OVER (PARTITION BY grp ORDER BY x, id) AS DECIMAL(19,0)) AS i, x
             |  FROM base),
             |st AS (SELECT grp, count(*) AS n,
             |    CAST(sum(x) AS DOUBLE) AS sx,
             |    CAST(sum(i * x) AS DOUBLE) AS swx
             |  FROM rk GROUP BY grp),
             |expect AS (SELECT grp, n,
             |    CASE WHEN sx > 0 THEN
             |      2.0 * swx / (CAST(n AS DOUBLE) * sx)
             |        - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) END AS g
             |  FROM st),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND (SELECT count(DISTINCT "group") FROM emitted) = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e."group" = x.grp
             |      WHERE e.n <> x.n
             |         OR (e.gini IS NULL) <> (x.g IS NULL)
             |         OR abs(coalesce(e.gini, 0) - coalesce(x.g, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e WHERE e."group" NOT IN (SELECT grp FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x WHERE x.grp NOT IN (SELECT "group" FROM emitted))
             |  ) AS ok)
             |SELECT "group", n, gini FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'ORACLE-MISMATCH', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY "group"""".stripMargin)),

    // ---- q169: distributed Lloyd k-means over the full embedding
    // corpus — map-side kernel assignment + one bounded partial-sum
    // aggregation per round, content-hash seeds. The output is the
    // whole iteration trace (seed centroids, refined centroids,
    // cluster sizes), and the certificate oracle replays every
    // assignment from the emitted centroids bit-for-bit (same
    // dot-product decomposition), checks counts exactly and means to
    // 1e-9 — see [[lloydOracle]].
    Q(
      "q169_lloyd_kmeans",
      (s, d) => {
        import s.implicits._
        graft.operators.Clustering.lloyd(
          Tables.embeddings(s, d), $"embedding", $"vec_id", k = 8, iters = 3, dim = 64)
          .orderBy($"iter", $"cid", $"dim_idx")
      },
      Some(lloydOracle(k = 8, iters = 3, dim = 64))),

    // ---- q170: Kaplan–Meier churn curve over user lifetimes —
    // duration = whole days between a user's first and last event;
    // users still active in the final 3 days of the observation
    // window are right-censored. Counts and risk sets are exact; the
    // survival product is exp∘Σ∘ln (the one libm step), so the oracle
    // replays counts exactly and survival to 1e-9 — the q113 pattern.
    Q(
      "q170_kaplan_meier",
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
        graft.operators.Survival.kaplanMeier(subjects, $"dur", $"churned")
          .orderBy($"t")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q170_kaplan_meier/*.parquet')),
             |per AS (SELECT user_id, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
             |obs AS (SELECT max(last_us) AS obs_us FROM per),
             |subj AS (SELECT
             |    CAST(floor(CAST(last_us - first_us AS DOUBLE) / 86400000000.0) AS BIGINT) AS dur,
             |    last_us <= obs_us - 3 * 86400000000 AS churned
             |  FROM per CROSS JOIN obs),
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
             |    END AS survival
             |  FROM curve),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM surv)
             |    AND (SELECT count(DISTINCT t) FROM emitted) = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN surv x USING (t)
             |      WHERE e.n_risk <> x.n_risk OR e.n_death <> x.n_death
             |         OR e.n_censored <> x.n_censored
             |         OR abs(e.survival - x.survival) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e WHERE e.t NOT IN (SELECT t FROM surv))
             |    AND NOT EXISTS (SELECT 1 FROM surv x WHERE x.t NOT IN (SELECT t FROM emitted))
             |  ) AS ok)
             |SELECT t, n_risk, n_death, n_censored, survival FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY t""".stripMargin)),

    // ---- q171: two-proportion z-test between content-hash-assigned
    // arms — did arm A's users purchase at a different rate than arm
    // B's? Exact counts through pinned correctly-rounded arithmetic:
    // the z statistic hash-matches bit-for-bit, no tolerance.
    Q(
      "q171_ab_ztest",
      (s, d) => {
        import s.implicits._
        val per = Tables.events(s, d)
          .filter($"user_id".isNotNull)
          .groupBy($"user_id")
          // a user whose event_type values are ALL NULL nulls the max;
          // coalesce to false so the arm counts match the oracle's
          // CASE…ELSE 0 semantics instead of tripping the loud guard
          .agg(coalesce(max($"event_type" === "purchase"), lit(false))
            .as("converted"))
        graft.operators.Experiment.twoProportionZ(per, $"user_id", $"converted")
      },
      Some(s"""WITH per AS (SELECT user_id,
              |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS c
              |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
              |armed AS (SELECT ${graft.operators.KmvSketch.hash60Sql("user_id")} % 2 = 0 AS arm_a, c
              |  FROM per),
              |agg AS (SELECT
              |    sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS n_a,
              |    sum(CASE WHEN arm_a AND c THEN 1 ELSE 0 END) AS conv_a,
              |    sum(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS n_b,
              |    sum(CASE WHEN NOT arm_a AND c THEN 1 ELSE 0 END) AS conv_b
              |  FROM armed)
              |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
              |  CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
              |  CASE WHEN n_a > 0 THEN CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS p_a,
              |  CASE WHEN n_b > 0 THEN CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS p_b,
              |  CASE WHEN n_a > 0 AND n_b > 0
              |      AND CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) > 0.0
              |      AND CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) < 1.0
              |    THEN (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              |          - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
              |      / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              |          * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              |          * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
              |  END AS z
              |FROM agg""".stripMargin)),

    // ---- q173: HITS hubs/authorities on the supplier→part bipartite
    // graph (suppliers are pure hubs, parts pure authorities — the
    // cleanest read of Kleinberg's duality), 5 power iterations with
    // L2 normalization. The oracle replays the recurrence as unrolled
    // CTEs and compares to 1e-9 (q89's tolerance contract — float
    // reductions are partition-ordered).
    Q(
      "q173_hits",
      (s, d) => {
        import s.implicits._
        Graph.hits(
          Tables.lineitem(s, d).select(
            $"l_suppkey".cast("long").as("src"),
            ($"l_partkey".cast("long") + 1000000L).as("dst")),
          $"src", $"dst", iters = 5)
          .orderBy($"node")
      },
      Some(hitsOracle(5))))
}

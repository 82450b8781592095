package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-9 continuation (q284+): ranked-retrieval evaluation, graph
  * structure, and further scale-shaped analytics.
  */
object ScaleOps9 {

  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  val all: Seq[Q] = Seq(

    // ---- q284: RANKED-RETRIEVAL METRICS — treat each supplier's
    // distinct parts as a scored candidate list (best line price
    // ranks; graded relevance from best kept-quantity bucket) and
    // evaluate NDCG@10 / AP / RR per supplier
    // ([[graft.operators.RankingMetrics]]). Per-query windows only
    // (a task owns one supplier's list); log2-discount doubles
    // re-derived by the oracle in the same pinned order, 1e-9 gate,
    // poison row on any mismatch. The (supplier, part) pre-aggregate
    // uses only order-independent max() so the candidate rows are
    // engine-stable.
    Q(
      "q284_ranking_metrics",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_suppkey".isNotNull && $"l_partkey".isNotNull &&
            $"l_extendedprice".isNotNull &&
            $"l_quantity".isNotNull && $"l_returnflag".isNotNull)
          .groupBy($"l_suppkey".as("q"), $"l_partkey".as("i"))
          .agg(
            max($"l_extendedprice").as("s"),
            max(when($"l_returnflag" === "N",
              least(floor($"l_quantity" / 16).cast("long"), lit(3L)))
              .otherwise(0L)).as("r"))
        graft.operators.RankingMetrics.rankingMetrics(
          li, $"q", $"i", $"s", $"r", k = 10)
          .withColumnRenamed("q", "suppkey")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q284_ranking_metrics/*.parquet')),
             |base AS MATERIALIZED (SELECT l_suppkey AS q,
             |    l_partkey AS i,
             |    max(l_extendedprice) AS s,
             |    max(CASE WHEN l_returnflag = 'N'
             |      THEN least(CAST(floor(l_quantity / 16) AS BIGINT), 3)
             |      ELSE 0 END) AS r
             |  FROM lineitem
             |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
             |    AND l_extendedprice IS NOT NULL
             |    AND l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
             |  GROUP BY 1, 2),
             |ranked AS MATERIALIZED (SELECT q, i, s, r,
             |    row_number() OVER (PARTITION BY q ORDER BY s DESC, i ASC)
             |      AS pos,
             |    row_number() OVER (PARTITION BY q ORDER BY r DESC, i ASC)
             |      AS ipos
             |  FROM base),
             |folded AS MATERIALIZED (SELECT q, r, pos, ipos,
             |    sum(CASE WHEN pos <= 10 THEN
             |        CAST((CAST(1 AS BIGINT) << CAST(r AS INTEGER)) - 1
             |          AS DOUBLE) / log2(CAST(pos + 1 AS DOUBLE))
             |      ELSE CAST('0' AS DOUBLE) END)
             |      OVER (PARTITION BY q ORDER BY pos ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS dcg_cum,
             |    sum(CASE WHEN ipos <= 10 THEN
             |        CAST((CAST(1 AS BIGINT) << CAST(r AS INTEGER)) - 1
             |          AS DOUBLE) / log2(CAST(ipos + 1 AS DOUBLE))
             |      ELSE CAST('0' AS DOUBLE) END)
             |      OVER (PARTITION BY q ORDER BY ipos ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS idcg_cum,
             |    sum(CASE WHEN r > 0 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY q ORDER BY pos ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS hits_cum
             |  FROM ranked),
             |folded2 AS MATERIALIZED (SELECT q, r, pos, ipos, dcg_cum,
             |    idcg_cum, hits_cum,
             |    sum(CASE WHEN r > 0 THEN CAST(hits_cum AS DOUBLE)
             |        / CAST(pos AS DOUBLE) ELSE CAST('0' AS DOUBLE) END)
             |      OVER (PARTITION BY q ORDER BY pos ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS prec_cum
             |  FROM folded),
             |expect AS MATERIALIZED (SELECT q AS suppkey,
             |    count(*) AS n_items,
             |    sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS n_rel,
             |    max_by(dcg_cum, pos) AS dcg_k,
             |    max_by(idcg_cum, ipos) AS idcg_k,
             |    max_by(prec_cum, pos) AS psum,
             |    min(CASE WHEN r > 0 THEN pos END) AS fh
             |  FROM folded2 GROUP BY q),
             |expect2 AS MATERIALIZED (SELECT suppkey, n_items, n_rel, dcg_k,
             |    CASE WHEN idcg_k > 0 THEN dcg_k / idcg_k END AS ndcg_k,
             |    CASE WHEN n_rel > 0 THEN psum / CAST(n_rel AS DOUBLE) END
             |      AS ap,
             |    CASE WHEN fh IS NOT NULL
             |      THEN CAST('1' AS DOUBLE) / CAST(fh AS DOUBLE) END AS rr
             |  FROM expect),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect2)
             |    AND (SELECT count(DISTINCT suppkey) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      JOIN expect2 x ON e.suppkey = x.suppkey
             |      WHERE e.n_items <> x.n_items OR e.n_rel <> x.n_rel
             |        OR abs(e.dcg_k - x.dcg_k) > 1e-9
             |        OR (e.ndcg_k IS NULL) <> (x.ndcg_k IS NULL)
             |        OR abs(coalesce(e.ndcg_k, 0) - coalesce(x.ndcg_k, 0)) > 1e-9
             |        OR (e.ap IS NULL) <> (x.ap IS NULL)
             |        OR abs(coalesce(e.ap, 0) - coalesce(x.ap, 0)) > 1e-9
             |        OR (e.rr IS NULL) <> (x.rr IS NULL)
             |        OR abs(coalesce(e.rr, 0) - coalesce(x.rr, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.suppkey NOT IN (SELECT suppkey FROM expect2))
             |  ) AS ok)
             |SELECT suppkey, n_items, n_rel, dcg_k, ndcg_k, ap, rr
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q285: LOCAL CLUSTERING COEFFICIENT per node — how
    // interconnected is each part's co-purchase neighbourhood?
    // ([[graft.operators.Graph.localClustering]]) Shared
    // degree-ordered O(E^1.5) triangle enumeration + one degree
    // aggregation; exact integers, one pinned division — hash-exact.
    Q(
      "q285_local_clustering",
      (s, d) => {
        import s.implicits._
        graft.operators.Graph.localClustering(
          copurchaseEdges(s, d), $"src", $"dst")
      },
      Some(s"""WITH ${sqlCopurchase()},
              |tri AS MATERIALIZED (
              |  SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
              |  FROM canon e1
              |  JOIN canon e2 ON e2.a = e1.b
              |  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
              |tcount AS MATERIALIZED (SELECT node, count(*) AS tri_n
              |  FROM (SELECT n1 AS node FROM tri
              |    UNION ALL SELECT n2 FROM tri
              |    UNION ALL SELECT n3 FROM tri)
              |  GROUP BY 1),
              |sym AS (SELECT a AS src FROM canon
              |  UNION ALL SELECT b FROM canon),
              |deg AS (SELECT src AS node, count(*) AS deg FROM sym
              |  GROUP BY 1)
              |SELECT d.node, d.deg,
              |  coalesce(t.tri_n, 0) AS tri_n,
              |  CASE WHEN d.deg >= 2 THEN
              |    2.0 * CAST(coalesce(t.tri_n, 0) AS DOUBLE)
              |      / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0))
              |  END AS lcc
              |FROM deg d LEFT JOIN tcount t ON d.node = t.node""".stripMargin)),

    // ---- q286: K-TRUSS — the cohesive core of the high-value
    // co-purchase graph: every surviving edge sits on ≥ 3 triangles
    // (k = 5) within the truss ([[graft.operators.Graph.kTruss]]).
    // Iterative peeling (converges in ≤ 6 rounds on this data; the
    // oracle unrolls 9 monotone rounds — extra rounds are no-ops
    // after the fixpoint). Exact integers — hash-exact.
    Q(
      "q286_ktruss",
      (s, d) => {
        import s.implicits._
        graft.operators.Graph.kTruss(
          copurchaseEdges(s, d, minPrice = 50000.0),
          $"src", $"dst", k = 5, maxIter = 9)
      },
      Some(sqlKtruss(rounds = 9, minSup = 3))),

    // ---- q287: POWER-LAW TAIL EXPONENT of the token-frequency
    // distribution — the Zipf health check
    // ([[graft.operators.Profiling.powerLawAlpha]], Clauset-Shalizi-
    // Newman MLE, xmin = 5). Frequencies collapse to distinct value
    // cells; ln terms fold in ONE pinned value order; the oracle
    // replays the fold term-for-term and gates at 1e-9 (libm ln),
    // poison row on mismatch.
    Q(
      "q287_power_law_alpha",
      (s, d) => {
        import s.implicits._
        val freq = Tables.documents(s, d)
          .filter($"doc_id".isNotNull)
          .select(explode(graft.operators.TextAnalysis.tokens($"text"))
            .as("t"))
          .groupBy($"t").agg(count(lit(1)).as("f"))
        graft.operators.Profiling.powerLawAlpha(freq, $"f", xmin = 5L)
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q287_power_law_alpha/*.parquet')),
              |freq AS MATERIALIZED (SELECT tok, count(*) AS f
              |  FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents
              |    WHERE doc_id IS NOT NULL)
              |  GROUP BY 1),
              |cells AS MATERIALIZED (SELECT f AS x, count(*) AS c
              |  FROM freq WHERE f >= 5 GROUP BY 1),
              |folded AS (SELECT x,
              |    sum(CAST(c AS DOUBLE) * ln(CAST(x AS DOUBLE) / 5.0))
              |      OVER (ORDER BY x ASC
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS lns,
              |    sum(c) OVER (ORDER BY x ASC
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS cum_n
              |  FROM cells),
              |expect AS (SELECT max_by(cum_n, x) AS n_tail,
              |    CAST(5 AS BIGINT) AS x_min,
              |    max_by(lns, x) AS ln_sum
              |  FROM folded),
              |expect2 AS (SELECT n_tail, x_min, ln_sum,
              |    CASE WHEN ln_sum > 0 THEN 1.0 + CAST(n_tail AS DOUBLE) / ln_sum
              |      END AS alpha
              |  FROM expect),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = 1
              |    AND NOT EXISTS (SELECT 1 FROM emitted e, expect2 x
              |      WHERE e.n_tail <> x.n_tail OR e.x_min <> x.x_min
              |        OR abs(e.ln_sum - x.ln_sum) > 1e-9
              |        OR (e.alpha IS NULL) <> (x.alpha IS NULL)
              |        OR abs(coalesce(e.alpha, 0) - coalesce(x.alpha, 0)) > 1e-9)
              |  ) AS ok)
              |SELECT n_tail, x_min, ln_sum, alpha FROM emitted
              |WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
              |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)""".stripMargin)))

  /** Continuation Seq 2: spatial blocking, categorical dependence,
    * keyword extraction.
    */
  val all2: Seq[Q] = Seq(

    // ---- q288: SPATIAL RADIUS JOIN — all embedding pairs within
    // Euclidean 0.05 of each other in the (dim1, dim2) plane, via
    // grid-cell blocking ([[graft.operators.Spatial.radiusJoin]]):
    // cell side = radius, 9-neighborhood equi-join, exact distance
    // verify — never all-pairs. The oracle IS all-pairs (an interval
    // prefilter + the identical pinned dist² expression), so blocking
    // completeness is verified exactly; dist² is IEEE-pinned on both
    // sides — hash-exact.
    Q(
      "q288_spatial_radius_join",
      (s, d) => {
        import s.implicits._
        val pts = Tables.embeddings(s, d)
          .filter($"vec_id".isNotNull && size($"embedding") >= 2)
          .select($"vec_id",
            element_at($"embedding", 1).cast("double").as("x"),
            element_at($"embedding", 2).cast("double").as("y"))
        graft.operators.Spatial.radiusJoin(
          pts, $"vec_id", $"x", $"y", radius = 0.05)
      },
      Some("""WITH pts AS MATERIALIZED (SELECT vec_id,
             |    CAST(embedding[1] AS DOUBLE) AS x,
             |    CAST(embedding[2] AS DOUBLE) AS y
             |  FROM embeddings
             |  WHERE vec_id IS NOT NULL AND len(embedding) >= 2)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             |    AS dist2
             |FROM pts a JOIN pts b
             |  ON a.vec_id < b.vec_id
             |  AND b.x BETWEEN a.x - CAST('0.05' AS DOUBLE)
             |    AND a.x + CAST('0.05' AS DOUBLE)
             |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             |  <= CAST('0.05' AS DOUBLE) * CAST('0.05' AS DOUBLE)""".stripMargin)),

    // ---- q289: CATEGORICAL ASSOCIATION — are order priority and
    // order status independent? χ² over the full grid (zero cells
    // included), Cramér's V, and mutual information
    // ([[graft.operators.Profiling.categoricalAssociation]]). Cells
    // fold in one pinned (a, b) order; the oracle replays the fold
    // term-for-term and gates at 1e-9 (libm ln), poison on mismatch.
    Q(
      "q289_categorical_assoc",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
          .filter($"o_orderpriority".isNotNull && $"o_orderstatus".isNotNull)
        graft.operators.Profiling.categoricalAssociation(
          o, $"o_orderpriority", $"o_orderstatus")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q289_categorical_assoc/*.parquet')),
             |cells AS MATERIALIZED (SELECT o_orderpriority AS ai,
             |    o_orderstatus AS bi, count(*) AS c
             |  FROM orders
             |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
             |  GROUP BY 1, 2),
             |rt AS MATERIALIZED (SELECT ai, sum(c) AS ri FROM cells GROUP BY 1),
             |ct AS MATERIALIZED (SELECT bi, sum(c) AS cj FROM cells GROUP BY 1),
             |grid AS MATERIALIZED (SELECT rt.ai, ct.bi, rt.ri, ct.cj,
             |    coalesce(cells.c, 0) AS cij
             |  FROM rt CROSS JOIN ct
             |  LEFT JOIN cells ON cells.ai = rt.ai AND cells.bi = ct.bi),
             |tot AS MATERIALIZED (SELECT CAST(sum(cij) AS DOUBLE) AS nd,
             |    CAST(sum(cij) AS BIGINT) AS n FROM grid),
             |folded AS (SELECT ai, bi,
             |    sum((CAST(cij AS DOUBLE)
             |        - CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) / nd)
             |      * (CAST(cij AS DOUBLE)
             |        - CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) / nd)
             |      / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) / nd))
             |      OVER (ORDER BY ai ASC, bi ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS chi_cum,
             |    sum(CASE WHEN cij > 0 THEN
             |        (CAST(cij AS DOUBLE) / nd)
             |          * ln(nd * CAST(cij AS DOUBLE)
             |            / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)))
             |      ELSE CAST('0' AS DOUBLE) END)
             |      OVER (ORDER BY ai ASC, bi ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS mi_cum,
             |    row_number() OVER (ORDER BY ai ASC, bi ASC) AS rn
             |  FROM grid CROSS JOIN tot),
             |expect AS (SELECT
             |    (SELECT n FROM tot) AS n,
             |    (SELECT count(*) FROM rt) AS n_rows,
             |    (SELECT count(*) FROM ct) AS n_cols,
             |    max_by(chi_cum, rn) AS chi2,
             |    max_by(mi_cum, rn) AS mi
             |  FROM folded),
             |expect2 AS (SELECT n, n_rows, n_cols, chi2,
             |    CASE WHEN least(n_rows, n_cols) >= 2 THEN
             |      sqrt(chi2 / (CAST(n AS DOUBLE)
             |        * CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE)))
             |    END AS cramers_v, mi
             |  FROM expect),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 1
             |    AND NOT EXISTS (SELECT 1 FROM emitted e, expect2 x
             |      WHERE e.n <> x.n OR e.n_rows <> x.n_rows
             |        OR e.n_cols <> x.n_cols
             |        OR abs(e.chi2 - x.chi2) > 1e-9
             |        OR (e.cramers_v IS NULL) <> (x.cramers_v IS NULL)
             |        OR abs(coalesce(e.cramers_v, 0) - coalesce(x.cramers_v, 0)) > 1e-9
             |        OR abs(e.mi - x.mi) > 1e-9)
             |  ) AS ok)
             |SELECT n, n_rows, n_cols, chi2, cramers_v, mi FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q290: RAKE KEYWORD SCORES — stopword-delimited phrase
    // co-occurrence ranking over the documents corpus
    // ([[graft.operators.TextAnalysis.rakeScores]]). Per-doc
    // boundary window + plain groupBys; exact integers and one
    // pinned division — hash-exact.
    Q(
      "q290_rake_keywords",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.rakeScores(
          Tables.documents(s, d).filter($"doc_id".isNotNull),
          $"doc_id", $"text")
      },
      Some(s"""WITH toks AS MATERIALIZED (SELECT doc_id,
              |    generate_subscripts(tk, 1) AS idx, unnest(tk) AS w
              |  FROM (SELECT doc_id, $sqlToks AS tk FROM documents
              |    WHERE doc_id IS NOT NULL)),
              |flagged AS MATERIALIZED (SELECT doc_id, idx, w,
              |    w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it',
              |          'that', 'for') AS stop
              |  FROM toks),
              |phrased AS MATERIALIZED (SELECT doc_id, w,
              |    sum(CASE WHEN stop THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY doc_id ORDER BY idx ASC
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS ph, stop
              |  FROM flagged),
              |nonstop AS MATERIALIZED (SELECT doc_id, w, ph FROM phrased
              |  WHERE NOT stop),
              |plen AS MATERIALIZED (SELECT doc_id, ph, count(*) AS plen
              |  FROM nonstop GROUP BY 1, 2)
              |SELECT n.w AS word, count(*) AS freq,
              |  CAST(sum(p.plen) AS BIGINT) AS deg,
              |  CAST(sum(p.plen) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              |    AS score
              |FROM nonstop n JOIN plen p
              |  ON n.doc_id = p.doc_id AND n.ph = p.ph
              |GROUP BY 1""".stripMargin)))

  /** Continuation Seq 3: cash-flow analytics, market bars, and
    * inequality measurement.
    */
  val all3: Seq[Q] = Seq(

    // ---- q291: DISCOUNTED CASH FLOW — per-supplier monthly net
    // flows (returned lines are refunds, so months go negative),
    // NPV at 1%/month and the exact-cents payback month
    // ([[graft.operators.Finance.dcf]]). Cash cumulates in int64
    // cents (payback never rides a float); the oracle replays the
    // pinned discount fold and gates NPV at 1e-9, poison on
    // mismatch.
    Q(
      "q291_dcf_npv",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_suppkey".isNotNull && $"l_shipdate".isNotNull &&
            $"l_extendedprice".isNotNull && $"l_returnflag".isNotNull)
          .select(
            $"l_suppkey".as("k"),
            (year($"l_shipdate") * 12 + month($"l_shipdate")).as("p"),
            (round($"l_extendedprice" * 100).cast("long") *
              when($"l_returnflag" === "R", -1L).otherwise(1L)).as("cents"))
        graft.operators.Finance.dcf(
          li, $"k", $"p", $"cents", ratePerPeriod = 0.01)
          .withColumnRenamed("k", "suppkey")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q291_dcf_npv/*.parquet')),
             |cf AS MATERIALIZED (SELECT l_suppkey AS k,
             |    year(l_shipdate) * 12 + month(l_shipdate) AS p,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |      * CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) AS cf
             |  FROM lineitem
             |  WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
             |    AND l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
             |  GROUP BY 1, 2),
             |wt AS MATERIALIZED (SELECT k, p, cf,
             |    p - min(p) OVER (PARTITION BY k) AS t
             |  FROM cf),
             |folded AS MATERIALIZED (SELECT k, t,
             |    sum(cf) OVER (PARTITION BY k ORDER BY t ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum_cents,
             |    sum(CAST(cf AS DOUBLE)
             |        / power(CAST('1.01' AS DOUBLE), CAST(t AS DOUBLE)))
             |      OVER (PARTITION BY k ORDER BY t ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum_disc
             |  FROM wt),
             |expect AS MATERIALIZED (SELECT k AS suppkey,
             |    count(*) AS n_periods,
             |    CAST(max_by(cum_cents, t) AS BIGINT) AS total_cents,
             |    min(CASE WHEN cum_cents >= 0 THEN t END) AS payback_t,
             |    max_by(cum_disc, t) AS npv
             |  FROM folded GROUP BY k),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      JOIN expect x ON e.suppkey = x.suppkey
             |      WHERE e.n_periods <> x.n_periods
             |        OR e.total_cents <> x.total_cents
             |        OR (e.payback_t IS NULL) <> (x.payback_t IS NULL)
             |        OR coalesce(e.payback_t, -1) <> coalesce(x.payback_t, -1)
             |        OR abs(e.npv - x.npv)
             |          > 1e-9 * greatest(CAST('1' AS DOUBLE), abs(x.npv)))
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.suppkey NOT IN (SELECT suppkey FROM expect))
             |  ) AS ok)
             |SELECT suppkey, n_periods, total_cents, payback_t, npv
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q292: OHLC/VWAP WEEKLY BARS — candlesticks per return
    // flag over shipped line prices
    // ([[graft.operators.TimeSeries.ohlcBars]]). Pinned-order
    // open/close windows, exact cents extremes, decimal→int64-
    // guarded vwap numerator — hash-exact.
    Q(
      "q292_ohlc_bars",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_returnflag".isNotNull && $"l_shipdate".isNotNull &&
            $"l_extendedprice".isNotNull && $"l_quantity".isNotNull)
          .select($"l_returnflag".as("flag"), $"l_shipdate",
            round($"l_extendedprice" * 100).cast("long").as("cents"),
            round($"l_quantity").cast("long").as("q"))
        graft.operators.TimeSeries.ohlcBars(
          li, $"flag", $"l_shipdate", $"cents", $"q",
          periodSeconds = 604800L)
          .withColumnRenamed("k", "flag")
          .orderBy($"flag", $"bucket")
      },
      Some("""WITH base AS MATERIALIZED (SELECT l_returnflag AS k,
             |    epoch_us(l_shipdate) AS us,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
             |    CAST(round(l_quantity) AS BIGINT) AS q
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL AND l_shipdate IS NOT NULL
             |    AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
             |bucketed AS MATERIALIZED (SELECT k, us, price, q,
             |    CAST(floor(CAST(us AS DOUBLE) / 604800000000.0) AS BIGINT)
             |      AS b
             |  FROM base),
             |ranked AS MATERIALIZED (SELECT k, b, us, price, q,
             |    row_number() OVER (PARTITION BY k, b
             |      ORDER BY us ASC, price ASC) AS rn_o,
             |    row_number() OVER (PARTITION BY k, b
             |      ORDER BY us DESC, price DESC) AS rn_c
             |  FROM bucketed)
             |SELECT k AS flag, b AS bucket,
             |  count(*) AS n_trades,
             |  max(CASE WHEN rn_o = 1 THEN price END) AS open,
             |  max(price) AS high, min(price) AS low,
             |  max(CASE WHEN rn_c = 1 THEN price END) AS close,
             |  CAST(sum(q) AS BIGINT) AS volume,
             |  CASE WHEN sum(q) > 0 THEN
             |    CAST(CAST(sum(CAST(price AS HUGEINT) * CAST(q AS HUGEINT))
             |        AS BIGINT) AS DOUBLE)
             |      / CAST(CAST(sum(q) AS BIGINT) AS DOUBLE)
             |  END AS vwap
             |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q293: GINI COEFFICIENT of per-customer order revenue
    // within each nation ([[graft.operators.RankStats.
    // giniCoefficient]]) — exact decimal rank statistics on the
    // shared bucketed-midrank machinery, no global sort; sum digest
    // hash-exact, gini gated at 1e-9 (the decimal-38→double cast),
    // poison on mismatch.
    Q(
      "q293_gini_revenue",
      (s, d) => {
        import s.implicits._
        val cust = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_totalprice".isNotNull)
          .groupBy($"o_custkey")
          .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
          .join(broadcast(Tables.nation(s, d)
            .join(Tables.customer(s, d), $"c_nationkey" === $"n_nationkey")
            .select($"c_custkey", $"n_name")), $"o_custkey" === $"c_custkey")
        graft.operators.RankStats.giniCoefficient(
          cust, $"n_name", $"cents")
          .withColumnRenamed("k", "nation")
          .orderBy($"nation")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q293_gini_revenue/*.parquet')),
             |cust AS MATERIALIZED (SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
             |  GROUP BY 1),
             |tagged AS MATERIALIZED (SELECT n.n_name AS k, cust.cents AS v
             |  FROM cust
             |  JOIN customer c ON cust.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
             |cells AS MATERIALIZED (SELECT k, v, count(*) AS c
             |  FROM tagged GROUP BY 1, 2),
             |mr AS MATERIALIZED (SELECT k, v, c,
             |    2 * (sum(c) OVER (PARTITION BY k ORDER BY v ASC
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
             |      + c + 1 AS mr2
             |  FROM cells),
             |st AS MATERIALIZED (SELECT k,
             |    CAST(sum(c) AS BIGINT) AS n,
             |    sum(CAST(c AS HUGEINT) * CAST(v AS HUGEINT)) AS sv,
             |    sum(CAST(c AS HUGEINT) * CAST(mr2 AS HUGEINT)
             |      * CAST(v AS HUGEINT)) AS svr
             |  FROM mr GROUP BY 1),
             |expect AS MATERIALIZED (SELECT k AS nation, n,
             |    CAST(sv AS VARCHAR) AS sum_cents,
             |    CASE WHEN n >= 2 AND sv > 0 THEN
             |      (CAST(svr AS DOUBLE)
             |        - CAST(n + 1 AS DOUBLE) * CAST(sv AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE))
             |    END AS gini
             |  FROM st),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      JOIN expect x ON e.nation = x.nation
             |      WHERE e.n <> x.n OR e.sum_cents <> x.sum_cents
             |        OR (e.gini IS NULL) <> (x.gini IS NULL)
             |        OR abs(coalesce(e.gini, 0) - coalesce(x.gini, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.nation NOT IN (SELECT nation FROM expect))
             |  ) AS ok)
             |SELECT nation, n, sum_cents, gini FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'poison', CAST(-1 AS BIGINT), '-1', CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)))

  /** Continuation Seq 4: the live-stream twin of the OHLC bars.
    */
  val all4: Seq[Q] = Seq(

    // ---- q294: STREAMING OHLC BARS — q292's candlestick semantics
    // as a LIVE watermarked windowed aggregation: daily bars per
    // event type over a real multi-micro-batch AvailableNow stream.
    // Open/close come from ORDER-INDEPENDENT struct min/max (the
    // streaming-legal formulation of q292's pinned row_number — same
    // tie-break: earliest us, then lowest price), so partial
    // aggregation across micro-batches cannot flap. The 1-hour
    // watermark + a far-future sentinel flush every real window; the
    // oracle replays the identical bars in batch SQL — exact cents,
    // hash-exact.
    Q(
      "q294_streaming_ohlc",
      (s, d) => streamingOhlc(s, d),
      Some("""WITH base AS MATERIALIZED (SELECT event_type AS k,
             |    epoch_us(ts) AS us,
             |    CAST(round(value * 100) AS BIGINT) AS price
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |    AND value IS NOT NULL),
             |bucketed AS MATERIALIZED (SELECT k, us, price,
             |    CAST(floor(CAST(us AS DOUBLE) / 86400000000.0) AS BIGINT)
             |      AS b
             |  FROM base),
             |ranked AS MATERIALIZED (SELECT k, b, us, price,
             |    row_number() OVER (PARTITION BY k, b
             |      ORDER BY us ASC, price ASC) AS rn_o,
             |    row_number() OVER (PARTITION BY k, b
             |      ORDER BY us DESC, price DESC) AS rn_c
             |  FROM bucketed)
             |SELECT k AS event_type, b * 86400 AS bucket_start_s,
             |  count(*) AS n_events,
             |  max(CASE WHEN rn_o = 1 THEN price END) AS open,
             |  max(price) AS high, min(price) AS low,
             |  max(CASE WHEN rn_c = 1 THEN price END) AS close
             |FROM ranked GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)))

  /** Continuation Seq 5: K-sample location/spread tests from the
    * exact rank and decimal machineries.
    */
  val all5: Seq[Q] = Seq(

    // ---- q295: KRUSKAL–WALLIS H — does order value differ across
    // the five priorities, per order status?
    // ([[graft.operators.RankStats.kruskalWallis]]): POOLED midranks
    // from the bucketed machinery (no per-key sort), exact
    // decimal(38,0) per-group rank sums, each group's R²/n term one
    // pinned double accumulated through a window in group order (the
    // ≤5-row term table, never the data) — hash-exact, tie-corrected.
    Q(
      "q295_kruskal_wallis",
      (s, d) => {
        import s.implicits._
        val per = Tables.orders(s, d).select(
          $"o_orderstatus".as("st"),
          substring($"o_orderpriority", 1, 1).cast("long").as("pg"),
          $"o_totalprice".as("v"))
        graft.operators.RankStats.kruskalWallis(per, $"st", $"pg", $"v")
          .orderBy($"k")
      },
      Some("""WITH per AS MATERIALIZED (SELECT o_orderstatus AS k,
             |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
             |    o_totalprice AS v
             |  FROM orders),
             |pooled AS MATERIALIZED (SELECT k, v, count(*) AS c
             |  FROM per GROUP BY 1, 2),
             |rx AS MATERIALIZED (SELECT k, v,
             |    2 * coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + c + 1 AS mr2
             |  FROM pooled),
             |gc AS (SELECT k, g, v, count(*) AS cg FROM per GROUP BY 1, 2, 3),
             |pg AS MATERIALIZED (SELECT gc.k, gc.g, sum(gc.cg) AS ng,
             |    CAST(sum(CAST(gc.cg AS DECIMAL(18,0))
             |      * CAST(rx.mr2 AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS r2
             |  FROM gc JOIN rx ON gc.k = rx.k AND gc.v = rx.v
             |  GROUP BY 1, 2),
             |terms AS (SELECT k, g,
             |    CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
             |      / (4.0 * CAST(ng AS DOUBLE)) AS t
             |  FROM pg),
             |folded AS (SELECT k,
             |    sum(t) OVER (PARTITION BY k ORDER BY g
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
             |    row_number() OVER (PARTITION BY k ORDER BY g) AS rn,
             |    count(*) OVER (PARTITION BY k) AS gcnt
             |  FROM terms),
             |sfin AS (SELECT k, s, gcnt FROM folded WHERE rn = gcnt),
             |pk AS (SELECT k, sum(c) AS n,
             |    CAST(sum(CAST(c AS DECIMAL(12,0)) * CAST(c AS DECIMAL(12,0))
             |        * CAST(c AS DECIMAL(12,0)) - CAST(c AS DECIMAL(12,0)))
             |      AS DECIMAL(38,0)) AS ties
             |  FROM pooled GROUP BY 1)
             |SELECT pk.k, CAST(pk.n AS BIGINT) AS n,
             |  CAST(gcnt AS BIGINT) AS n_groups,
             |  CASE WHEN pk.n >= 2
             |    THEN 12.0 / (CAST(pk.n AS DOUBLE) * (CAST(pk.n AS DOUBLE) + 1.0))
             |        * s - 3.0 * (CAST(pk.n AS DOUBLE) + 1.0)
             |    END AS h,
             |  CASE WHEN pk.n >= 2
             |      AND 1.0 - CAST(ties AS DOUBLE)
             |        / (CAST(pk.n AS DOUBLE) * CAST(pk.n AS DOUBLE)
             |          * CAST(pk.n AS DOUBLE) - CAST(pk.n AS DOUBLE)) > 0
             |    THEN (12.0 / (CAST(pk.n AS DOUBLE) * (CAST(pk.n AS DOUBLE) + 1.0))
             |        * s - 3.0 * (CAST(pk.n AS DOUBLE) + 1.0))
             |      / (1.0 - CAST(ties AS DOUBLE)
             |        / (CAST(pk.n AS DOUBLE) * CAST(pk.n AS DOUBLE)
             |          * CAST(pk.n AS DOUBLE) - CAST(pk.n AS DOUBLE)))
             |    END AS h_adj
             |FROM pk JOIN sfin ON pk.k = sfin.k ORDER BY pk.k""".stripMargin)),

    // ---- q296: ONE-WAY ANOVA F — does shipped quantity differ
    // across return flags, per line status?
    // ([[graft.operators.Experiment.anovaF]]): integer values keep
    // S_g, S, Σv² exact decimals; each group's S²/n term is one
    // pinned double folded through a window in group order —
    // hash-exact, with LOUD 2⁵³ guards on every decimal→double cast.
    Q(
      "q296_anova_f",
      (s, d) => {
        import s.implicits._
        val per = Tables.lineitem(s, d).select(
          $"l_linestatus".as("ls"),
          ascii($"l_returnflag").cast("long").as("g"),
          $"l_quantity".cast("long").as("v"))
        graft.operators.Experiment.anovaF(per, $"ls", $"g", $"v")
          .orderBy($"k")
      },
      Some("""WITH per AS MATERIALIZED (SELECT l_linestatus AS k,
             |    CAST(ascii(l_returnflag) AS BIGINT) AS g,
             |    CAST(l_quantity AS BIGINT) AS v
             |  FROM lineitem),
             |pg AS MATERIALIZED (SELECT k, g, count(*) AS ng,
             |    CAST(sum(CAST(v AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sg,
             |    CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS qg
             |  FROM per GROUP BY 1, 2),
             |terms AS (SELECT k, g, ng, sg, qg,
             |    CAST(abs(sg) AS DOUBLE) * CAST(abs(sg) AS DOUBLE)
             |      / CAST(ng AS DOUBLE) AS t
             |  FROM pg),
             |folded AS (SELECT k,
             |    sum(t) OVER (PARTITION BY k ORDER BY g
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tsum,
             |    sum(ng) OVER (PARTITION BY k) AS n,
             |    sum(sg) OVER (PARTITION BY k) AS s,
             |    sum(qg) OVER (PARTITION BY k) AS q2,
             |    row_number() OVER (PARTITION BY k ORDER BY g) AS rn,
             |    count(*) OVER (PARTITION BY k) AS gcnt
             |  FROM terms)
             |SELECT k, CAST(n AS BIGINT) AS n, CAST(gcnt AS BIGINT) AS n_groups,
             |  tsum - CAST(abs(s) AS DOUBLE) * CAST(abs(s) AS DOUBLE)
             |    / CAST(n AS DOUBLE) AS ssb,
             |  CAST(q2 AS DOUBLE) - tsum AS ssw,
             |  CASE WHEN gcnt >= 2 AND n > gcnt
             |      AND CAST(q2 AS DOUBLE) - tsum > 0
             |    THEN ((tsum - CAST(abs(s) AS DOUBLE) * CAST(abs(s) AS DOUBLE)
             |          / CAST(n AS DOUBLE)) / (CAST(gcnt AS DOUBLE) - 1.0))
             |      / ((CAST(q2 AS DOUBLE) - tsum)
             |        / (CAST(n AS DOUBLE) - CAST(gcnt AS DOUBLE)))
             |    END AS f
             |FROM folded WHERE rn = gcnt ORDER BY k""".stripMargin)),

    // ---- q297: BROWN–FORSYTHE — is quantity SPREAD equal across
    // order priorities, per line status?
    // ([[graft.operators.Experiment.brownForsythe]]): per-(key, group)
    // medians from the two-crossing order-statistic geometry over
    // distinct-value cells (windows over cells, never rows), DOUBLED
    // deviations |2v − med2| stay exact integers, then the q296 ANOVA
    // chain — hash-exact. SSB/SSW are on the doubled scale; F is
    // scale-invariant.
    Q(
      "q297_brown_forsythe",
      (s, d) => {
        import s.implicits._
        val od = Tables.orders(s, d).select(
          $"o_orderkey",
          substring($"o_orderpriority", 1, 1).cast("long").as("g"))
        val per = Tables.lineitem(s, d)
          .join(od, $"l_orderkey" === $"o_orderkey")
        graft.operators.Experiment.brownForsythe(
          per, $"l_linestatus", $"g", $"l_quantity".cast("long"))
          .orderBy($"k")
      },
      Some("""WITH per AS MATERIALIZED (SELECT l_linestatus AS k,
             |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
             |    CAST(l_quantity AS BIGINT) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |cells AS (SELECT k, g, v, count(*) AS c FROM per GROUP BY 1, 2, 3),
             |cum AS MATERIALIZED (SELECT k, g, v, c,
             |    sum(c) OVER (PARTITION BY k, g ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(c) OVER (PARTITION BY k, g) AS ng
             |  FROM cells),
             |med AS MATERIALIZED (SELECT k, g,
             |    min(CASE WHEN cum >= (ng + 1) // 2 THEN v END)
             |      + min(CASE WHEN cum >= ng // 2 + 1 THEN v END) AS med2
             |  FROM cum GROUP BY 1, 2),
             |dev AS MATERIALIZED (SELECT per.k, per.g,
             |    abs(2 * per.v - med.med2) AS v
             |  FROM per JOIN med ON per.k = med.k AND per.g = med.g),
             |pg AS MATERIALIZED (SELECT k, g, count(*) AS ng,
             |    CAST(sum(CAST(v AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sg,
             |    CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS qg
             |  FROM dev GROUP BY 1, 2),
             |terms AS (SELECT k, g, ng, sg, qg,
             |    CAST(abs(sg) AS DOUBLE) * CAST(abs(sg) AS DOUBLE)
             |      / CAST(ng AS DOUBLE) AS t
             |  FROM pg),
             |folded AS (SELECT k,
             |    sum(t) OVER (PARTITION BY k ORDER BY g
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tsum,
             |    sum(ng) OVER (PARTITION BY k) AS n,
             |    sum(sg) OVER (PARTITION BY k) AS s,
             |    sum(qg) OVER (PARTITION BY k) AS q2,
             |    row_number() OVER (PARTITION BY k ORDER BY g) AS rn,
             |    count(*) OVER (PARTITION BY k) AS gcnt
             |  FROM terms)
             |SELECT k, CAST(n AS BIGINT) AS n, CAST(gcnt AS BIGINT) AS n_groups,
             |  tsum - CAST(abs(s) AS DOUBLE) * CAST(abs(s) AS DOUBLE)
             |    / CAST(n AS DOUBLE) AS ssb,
             |  CAST(q2 AS DOUBLE) - tsum AS ssw,
             |  CASE WHEN gcnt >= 2 AND n > gcnt
             |      AND CAST(q2 AS DOUBLE) - tsum > 0
             |    THEN ((tsum - CAST(abs(s) AS DOUBLE) * CAST(abs(s) AS DOUBLE)
             |          / CAST(n AS DOUBLE)) / (CAST(gcnt AS DOUBLE) - 1.0))
             |      / ((CAST(q2 AS DOUBLE) - tsum)
             |        / (CAST(n AS DOUBLE) - CAST(gcnt AS DOUBLE)))
             |    END AS f
             |FROM folded WHERE rn = gcnt ORDER BY k""".stripMargin)),

    // ---- q298: MAXIMUM DRAWDOWN — worst peak-to-trough decline of
    // each event type's value path in (ts, event_id) order
    // ([[graft.operators.TimeSeries.maxDrawdown]]): one cumulative
    // integer-max window per key, then order-independent max
    // aggregates; the per-row fraction is a single correctly-rounded
    // division of exact int64 cents — hash-exact.
    Q(
      "q298_max_drawdown",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"event_type".isNotNull && $"ts".isNotNull &&
            $"value".isNotNull && $"event_id".isNotNull)
        graft.operators.TimeSeries.maxDrawdown(
          ev, $"event_type", $"ts", $"event_id",
          round($"value" * 100).cast("long"))
          .orderBy($"k")
      },
      Some("""WITH base AS MATERIALIZED (SELECT event_type AS k,
             |    epoch_us(ts) AS us, event_id AS tb,
             |    CAST(round(value * 100) AS BIGINT) AS p
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |    AND value IS NOT NULL AND event_id IS NOT NULL),
             |r AS (SELECT k, p,
             |    max(p) OVER (PARTITION BY k ORDER BY us, tb
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
             |  FROM base)
             |SELECT k, count(*) AS n, max(p) AS peak_cents,
             |  max(m - p) AS max_dd_cents,
             |  max(CASE WHEN m > 0
             |    THEN CAST(m - p AS DOUBLE) / CAST(m AS DOUBLE) END)
             |    AS max_dd_frac
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q299: LORENZ CURVE — the octile inequality curve of
    // per-customer order revenue, q293's Gini companion
    // ([[graft.operators.RankStats.lorenzCurve]]): cut values from
    // the bin-id-predicate exact selection (no global sort), then ONE
    // conditional-sum pass evaluates every cut; cumulative mass at an
    // exact rank is tie-order-independent by construction. Exact
    // decimal digests for the cents, pinned double shares —
    // hash-exact.
    Q(
      "q299_lorenz_curve",
      (s, d) => {
        import s.implicits._
        val cust = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_totalprice".isNotNull)
          .groupBy($"o_custkey")
          .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
        graft.operators.RankStats.lorenzCurve(cust, $"cents", buckets = 8)
          .orderBy($"bucket")
      },
      Some("""WITH cust AS MATERIALIZED (SELECT
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
             |  GROUP BY o_custkey),
             |nn AS (SELECT count(*) AS n,
             |    CAST(sum(CAST(v AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS tot
             |  FROM cust),
             |cells AS (SELECT v, count(*) AS c FROM cust GROUP BY 1),
             |cum AS MATERIALIZED (SELECT v, c,
             |    sum(c) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
             |  FROM cells),
             |ranks AS (SELECT i, (i * n + 7) // 8 AS r
             |  FROM (SELECT unnest(generate_series(1, 8)) AS i), nn),
             |cuts AS MATERIALIZED (SELECT i, r, min(cum.v) AS cut
             |  FROM ranks JOIN cum ON cum.cumc >= ranks.r GROUP BY 1, 2),
             |bel AS (SELECT cuts.i, cuts.r, cuts.cut,
             |    CAST(coalesce(sum(CASE WHEN cells.v < cuts.cut
             |      THEN CAST(cells.c AS DECIMAL(19,0))
             |        * CAST(cells.v AS DECIMAL(19,0)) END), 0)
             |      AS DECIMAL(38,0)) AS sb,
             |    CAST(coalesce(sum(CASE WHEN cells.v < cuts.cut
             |      THEN cells.c END), 0) AS BIGINT) AS cb
             |  FROM cuts, cells GROUP BY 1, 2, 3)
             |SELECT CAST(i AS INTEGER) AS bucket, CAST(r AS BIGINT) AS rank,
             |  CAST(cut AS BIGINT) AS cut_cents,
             |  CAST(CAST(sb + CAST(r - cb AS DECIMAL(19,0))
             |    * CAST(cut AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS VARCHAR)
             |    AS cum_cents,
             |  CASE WHEN tot > 0 THEN
             |    CAST(CAST(sb + CAST(r - cb AS DECIMAL(19,0))
             |      * CAST(cut AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS DOUBLE)
             |      / CAST(tot AS DOUBLE) END AS cum_share,
             |  CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS pop_share
             |FROM bel, nn ORDER BY bucket""".stripMargin)),

    // ---- q300: BOUNDED KATZ CENTRALITY — 3-hop damped-walk
    // influence (α = 1/8) over the high-value co-purchase graph
    // ([[graft.operators.Graph.katzBounded]]): three sparse
    // join+aggregate rounds shuffling on node ids only, walk counts
    // in exact decimals, the score kept ×8³ as one integer so the
    // only double is the final division — hash-exact.
    Q(
      "q300_katz_centrality",
      (s, d) => {
        import s.implicits._
        val e = copurchaseEdges(s, d, minPrice = 50000.0)
        graft.operators.Graph.katzBounded(
          e, $"src", $"dst", hops = 3, alphaDen = 8L)
          .orderBy($"node")
      },
      Some(s"""WITH ${sqlCopurchase(minPrice = "50000")},
             |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon
             |  UNION ALL SELECT b, a FROM canon),
             |w1 AS MATERIALIZED (SELECT src AS node, count(*) AS w
             |  FROM sym GROUP BY 1),
             |w2 AS MATERIALIZED (SELECT sym.src AS node, sum(w1.w) AS w
             |  FROM sym JOIN w1 ON sym.dst = w1.node GROUP BY 1),
             |w3 AS MATERIALIZED (SELECT sym.src AS node, sum(w2.w) AS w
             |  FROM sym JOIN w2 ON sym.dst = w2.node GROUP BY 1)
             |SELECT w1.node, CAST(w1.w AS BIGINT) AS w1,
             |  CAST(w2.w AS BIGINT) AS w2, CAST(w3.w AS BIGINT) AS w3,
             |  CAST(CAST(w1.w AS BIGINT) * 64 + CAST(w2.w AS BIGINT) * 8
             |    + CAST(w3.w AS BIGINT) AS DOUBLE) / 512.0 AS katz
             |FROM w1 JOIN w2 USING (node) JOIN w3 USING (node)
             |ORDER BY node""".stripMargin)))

  /** Continuation Seq 6: paired/repeated-measures rank tests and the
    * entropy inequality index.
    */
  val all6: Seq[Q] = Seq(

    // ---- q301: WILCOXON SIGNED-RANK — did customers' order value
    // shift between their first and last order, per market segment?
    // ([[graft.operators.RankStats.wilcoxonSignedRank]]): pooled
    // midranks of |Δ| from the bucketed machinery, exact decimal
    // rank sums, pinned z chain — hash-exact.
    Q(
      "q301_wilcoxon_signed_rank",
      (s, d) => {
        import s.implicits._
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        val wD = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey")
          .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        val fl = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_orderdate".isNotNull &&
            $"o_totalprice".isNotNull && $"o_orderkey".isNotNull)
          .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
          .withColumn("ra", row_number().over(wA))
          .withColumn("rd", row_number().over(wD))
          .groupBy($"o_custkey")
          .agg(
            max(when($"ra" === 1, $"cents")).as("x"),
            max(when($"rd" === 1, $"cents")).as("y"),
            count(lit(1)).as("no"))
          .filter($"no" >= 2)
        val per = fl.join(
          broadcast(Tables.customer(s, d)
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        graft.operators.RankStats.wilcoxonSignedRank(
          per, $"c_mktsegment", $"x", $"y").orderBy($"k")
      },
      Some("""WITH oc AS MATERIALIZED (SELECT o_custkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS ra,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rd,
             |    count(*) OVER (PARTITION BY o_custkey) AS no
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
             |    AND o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL),
             |fl AS (SELECT o_custkey,
             |    max(CASE WHEN ra = 1 THEN cents END) AS x,
             |    max(CASE WHEN rd = 1 THEN cents END) AS y
             |  FROM oc WHERE no >= 2 GROUP BY 1),
             |per AS MATERIALIZED (SELECT c.c_mktsegment AS k,
             |    fl.y - fl.x AS dd
             |  FROM fl JOIN customer c ON fl.o_custkey = c.c_custkey),
             |np AS (SELECT k, count(*) AS n_pairs FROM per GROUP BY 1),
             |nz AS MATERIALIZED (SELECT k, CAST(abs(dd) AS DOUBLE) AS v,
             |    CASE WHEN dd > 0 THEN 1 ELSE 0 END AS pos
             |  FROM per WHERE dd <> 0),
             |cells AS MATERIALIZED (SELECT k, v, count(*) AS c,
             |    CAST(sum(pos) AS BIGINT) AS p
             |  FROM nz GROUP BY 1, 2),
             |mr AS MATERIALIZED (SELECT k, v, c, p,
             |    2 * coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + c + 1 AS mr2
             |  FROM cells),
             |st AS MATERIALIZED (SELECT k, CAST(sum(c) AS BIGINT) AS n,
             |    CAST(sum(CAST(p AS DECIMAL(18,0))
             |      * CAST(mr2 AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS w2p,
             |    CAST(sum(CAST(c AS DECIMAL(12,0)) * CAST(c AS DECIMAL(12,0))
             |        * CAST(c AS DECIMAL(12,0)) - CAST(c AS DECIMAL(12,0)))
             |      AS DECIMAL(38,0)) AS ties
             |  FROM mr GROUP BY 1)
             |SELECT np.k, np.n_pairs, coalesce(st.n, 0) AS n_nonzero,
             |  CASE WHEN st.n IS NOT NULL
             |    THEN CAST(w2p AS DOUBLE) / 2.0 END AS w_plus,
             |  CASE WHEN st.n IS NOT NULL
             |      AND CAST(st.n AS DOUBLE) * (CAST(st.n AS DOUBLE) + 1.0)
             |        * (2.0 * CAST(st.n AS DOUBLE) + 1.0) / 24.0
             |        - CAST(ties AS DOUBLE) / 48.0 > 0
             |    THEN (CAST(w2p AS DOUBLE) / 2.0
             |        - CAST(st.n AS DOUBLE) * (CAST(st.n AS DOUBLE) + 1.0)
             |          / 4.0)
             |      / sqrt(CAST(st.n AS DOUBLE) * (CAST(st.n AS DOUBLE) + 1.0)
             |        * (2.0 * CAST(st.n AS DOUBLE) + 1.0) / 24.0
             |        - CAST(ties AS DOUBLE) / 48.0)
             |    END AS z
             |FROM np LEFT JOIN st ON np.k = st.k ORDER BY np.k""".stripMargin)),

    // ---- q302: FRIEDMAN TEST — does spend rank consistently across
    // the five order priorities within each customer (blocks), per
    // market segment? ([[graft.operators.RankStats.friedman]]):
    // within-block ranks over K-row partitions (millions of tiny
    // independent windows, no global sort), Σ R_t² exact in decimal —
    // no float fold at all — pinned χ² chain, tie-corrected;
    // hash-exact.
    Q(
      "q302_friedman",
      (s, d) => {
        import s.implicits._
        val cells = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_orderpriority".isNotNull &&
            $"o_totalprice".isNotNull)
          .groupBy($"o_custkey",
            substring($"o_orderpriority", 1, 1).cast("long").as("t"))
          .agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
        val per = cells.join(
          broadcast(Tables.customer(s, d)
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        graft.operators.RankStats.friedman(
          per, $"c_mktsegment", $"o_custkey", $"t", $"v").orderBy($"k")
      },
      Some("""WITH cells AS MATERIALIZED (SELECT c.c_mktsegment AS k,
             |    o.o_custkey AS b,
             |    CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS t,
             |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  WHERE o.o_custkey IS NOT NULL AND o.o_orderpriority IS NOT NULL
             |    AND o.o_totalprice IS NOT NULL
             |  GROUP BY 1, 2, 3),
             |kt AS (SELECT k, count(DISTINCT t) AS kk FROM cells GROUP BY 1),
             |pb AS (SELECT k, b, count(*) AS bt FROM cells GROUP BY 1, 2),
             |comp AS MATERIALIZED (SELECT pb.k, pb.b
             |  FROM pb JOIN kt ON pb.k = kt.k WHERE pb.bt = kt.kk),
             |kept AS MATERIALIZED (SELECT cells.k, cells.b, cells.t, cells.v
             |  FROM cells JOIN comp ON cells.k = comp.k AND cells.b = comp.b),
             |ranked AS MATERIALIZED (SELECT k, b, t, v,
             |    2 * rank() OVER (PARTITION BY k, b ORDER BY v ASC)
             |      + count(*) OVER (PARTITION BY k, b, v) - 1 AS mr2
             |  FROM kept),
             |pt AS (SELECT k, t,
             |    CAST(sum(CAST(mr2 AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS r2
             |  FROM ranked GROUP BY 1, 2),
             |s2 AS (SELECT k, CAST(sum(r2 * r2) AS DECIMAL(38,0)) AS s2,
             |    count(*) AS ktr
             |  FROM pt GROUP BY 1),
             |bc AS (SELECT k, count(*) AS nb FROM comp GROUP BY 1),
             |tc AS (SELECT k,
             |    CAST(sum(CAST(c AS DECIMAL(12,0)) * CAST(c AS DECIMAL(12,0))
             |        * CAST(c AS DECIMAL(12,0)) - CAST(c AS DECIMAL(12,0)))
             |      AS DECIMAL(38,0)) AS ties
             |  FROM (SELECT k, b, v, count(*) AS c FROM ranked GROUP BY 1, 2, 3)
             |  GROUP BY 1)
             |SELECT s2.k, CAST(bc.nb AS BIGINT) AS n_blocks,
             |  CAST(s2.ktr AS BIGINT) AS k_treatments,
             |  CASE WHEN s2.ktr >= 2
             |    THEN 12.0 / (CAST(bc.nb AS DOUBLE) * CAST(s2.ktr AS DOUBLE)
             |        * (CAST(s2.ktr AS DOUBLE) + 1.0))
             |      * (CAST(s2.s2 AS DOUBLE) / 4.0)
             |      - 3.0 * CAST(bc.nb AS DOUBLE) * (CAST(s2.ktr AS DOUBLE) + 1.0)
             |    END AS chi2,
             |  CASE WHEN s2.ktr >= 2
             |      AND 1.0 - CAST(tc.ties AS DOUBLE)
             |        / (CAST(bc.nb AS DOUBLE) * CAST(s2.ktr AS DOUBLE)
             |          * (CAST(s2.ktr AS DOUBLE) * CAST(s2.ktr AS DOUBLE) - 1.0)) > 0
             |    THEN (12.0 / (CAST(bc.nb AS DOUBLE) * CAST(s2.ktr AS DOUBLE)
             |        * (CAST(s2.ktr AS DOUBLE) + 1.0))
             |      * (CAST(s2.s2 AS DOUBLE) / 4.0)
             |      - 3.0 * CAST(bc.nb AS DOUBLE) * (CAST(s2.ktr AS DOUBLE) + 1.0))
             |      / (1.0 - CAST(tc.ties AS DOUBLE)
             |        / (CAST(bc.nb AS DOUBLE) * CAST(s2.ktr AS DOUBLE)
             |          * (CAST(s2.ktr AS DOUBLE) * CAST(s2.ktr AS DOUBLE) - 1.0)))
             |    END AS chi2_adj
             |FROM s2 JOIN bc ON s2.k = bc.k JOIN tc ON s2.k = tc.k
             |ORDER BY s2.k""".stripMargin)),

    // ---- q303: THEIL T INDEX — entropy inequality of per-customer
    // revenue by nation, completing the inequality family (q293 Gini,
    // q299 Lorenz, q279 HHI)
    // ([[graft.operators.Profiling.theilIndex]]). ln() is not
    // bit-portable, so this is the q61/q125 SOUNDNESS gate: exact n
    // and decimal sum digests must match exactly, theil within 1e-9,
    // poison row otherwise.
    Q(
      "q303_theil_index",
      (s, d) => {
        import s.implicits._
        val cust = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_totalprice".isNotNull)
          .groupBy($"o_custkey")
          .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
          .join(broadcast(Tables.nation(s, d)
            .join(Tables.customer(s, d), $"c_nationkey" === $"n_nationkey")
            .select($"c_custkey", $"n_name")), $"o_custkey" === $"c_custkey")
        graft.operators.Profiling.theilIndex(cust, $"n_name", $"cents")
          .orderBy($"k")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q303_theil_index/*.parquet')),
             |cust AS MATERIALIZED (SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
             |  GROUP BY 1),
             |tagged AS MATERIALIZED (SELECT n.n_name AS k, cust.v
             |  FROM cust
             |  JOIN customer c ON cust.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
             |st AS (SELECT k, count(*) AS n,
             |    CAST(sum(CAST(v AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sv
             |  FROM tagged GROUP BY 1),
             |expect AS MATERIALIZED (SELECT t.k, CAST(st.n AS BIGINT) AS n,
             |    CAST(st.sv AS VARCHAR) AS sum_cents,
             |    CASE WHEN st.sv > 0 THEN
             |      sum(CASE WHEN t.v > 0 THEN
             |        (CAST(t.v AS DOUBLE)
             |          / (CAST(st.sv AS DOUBLE) / CAST(st.n AS DOUBLE)))
             |        * ln(CAST(t.v AS DOUBLE)
             |          / (CAST(st.sv AS DOUBLE) / CAST(st.n AS DOUBLE)))
             |        ELSE 0.0 END) / CAST(st.n AS DOUBLE)
             |      END AS theil
             |  FROM tagged t JOIN st ON t.k = st.k
             |  GROUP BY t.k, st.n, st.sv),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x
             |      ON e.k = x.k
             |      WHERE e.n <> x.n OR e.sum_cents <> x.sum_cents
             |        OR (e.theil IS NULL) <> (x.theil IS NULL)
             |        OR abs(coalesce(e.theil, 0) - coalesce(x.theil, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.k NOT IN (SELECT k FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x
             |      WHERE x.k NOT IN (SELECT k FROM emitted))
             |  ) AS ok)
             |SELECT k, n, sum_cents, theil FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), '-1', CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY k""".stripMargin)),

    // ---- q304: LINK PREDICTION — common-neighbor count and the
    // resource-allocation index over the high-value co-purchase
    // graph ([[graft.operators.Graph.linkPrediction]]): wedge work
    // bounded by an EXPLICIT center-degree cap (part of the
    // semantics, replayed by the oracle), existing edges anti-joined
    // out before the per-pair reduction, the RA sum folded through a
    // window in neighbor order — hash-exact.
    Q(
      "q304_link_prediction",
      (s, d) => {
        import s.implicits._
        val e = copurchaseEdges(s, d, minPrice = 50000.0)
        graft.operators.Graph.linkPrediction(
          e, $"src", $"dst", minCommon = 3, maxCenterDegree = 64)
          .orderBy($"a", $"b")
      },
      Some(s"""WITH ${sqlCopurchase(minPrice = "50000")},
             |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM canon
             |  UNION ALL SELECT b, a FROM canon),
             |deg AS MATERIALIZED (SELECT src AS c, count(*) AS d
             |  FROM sym GROUP BY 1),
             |wed AS MATERIALIZED (SELECT e1.src AS u, e2.dst AS v,
             |    e1.dst AS w, deg.d
             |  FROM sym e1
             |  JOIN deg ON e1.dst = deg.c AND deg.d <= 64
             |  JOIN sym e2 ON e2.src = e1.dst AND e1.src < e2.dst),
             |-- exact rational RA: sum(LCM/deg) as hugeint (LCM =
             |-- lcm(1..64), every division exact), ONE double division
             |-- at the end — replays the operator's order-free sum
             |sc AS (SELECT u, v, count(*) AS cn,
             |    sum(CAST('1182266884102822267511361600' AS HUGEINT)
             |        // CAST(d AS HUGEINT)) AS sra
             |  FROM wed GROUP BY 1, 2),
             |surv AS (SELECT sc.u, sc.v, sc.cn, sc.sra FROM sc
             |  LEFT JOIN canon ON canon.a = sc.u AND canon.b = sc.v
             |  WHERE canon.a IS NULL AND sc.cn >= 3)
             |SELECT u AS a, v AS b, CAST(cn AS BIGINT) AS common_neighbors,
             |  CAST(sra AS DOUBLE)
             |    / CAST('1182266884102822267511361600' AS DOUBLE) AS ra_index
             |FROM surv
             |ORDER BY a, b""".stripMargin)),

    // ---- q305: QUANTILE-FORECAST BACKTEST — fit each return flag's
    // 3/4 quantity quantile on pre-1998 shipments, score later
    // shipments with the exact ×4 integer PINBALL loss
    // ([[graft.operators.ModelEval.quantilePinballBacktest]]):
    // two-crossing order statistics over cells, decimal loss digest,
    // one pinned mean division — hash-exact.
    Q(
      "q305_pinball_backtest",
      (s, d) => {
        import s.implicits._
        graft.operators.ModelEval.quantilePinballBacktest(
          Tables.lineitem(s, d)
            .filter($"l_returnflag".isNotNull && $"l_quantity".isNotNull &&
              $"l_shipdate".isNotNull),
          $"l_returnflag", $"l_quantity",
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"),
          num = 3, den = 4)
          .orderBy($"g")
      },
      Some("""WITH base AS MATERIALIZED (SELECT l_returnflag AS g,
             |    CAST(l_quantity AS BIGINT) AS v,
             |    l_shipdate < TIMESTAMP '1998-01-01' AS tr
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
             |    AND l_shipdate IS NOT NULL),
             |cells AS (SELECT g, v, count(*) AS c FROM base WHERE tr
             |  GROUP BY 1, 2),
             |cum AS MATERIALIZED (SELECT g, v,
             |    sum(c) OVER (PARTITION BY g ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(c) OVER (PARTITION BY g) AS n
             |  FROM cells),
             |fc AS MATERIALIZED (SELECT g,
             |    min(CASE WHEN cum >= floor((3 * n + 3) / CAST(4 AS DOUBLE))
             |      THEN v END) AS f,
             |    CAST(max(n) AS BIGINT) AS n_train
             |  FROM cum GROUP BY 1),
             |ev AS (SELECT base.g, count(*) AS n_eval,
             |    CAST(sum(CAST(greatest(3 * (base.v - fc.f),
             |      -1 * (base.v - fc.f)) AS DECIMAL(19,0)))
             |      AS DECIMAL(38,0)) AS sx
             |  FROM base JOIN fc ON base.g = fc.g
             |  WHERE NOT base.tr GROUP BY 1)
             |SELECT fc.g, fc.n_train, fc.f AS forecast,
             |  coalesce(ev.n_eval, 0) AS n_eval,
             |  CAST(coalesce(ev.sx, 0) AS VARCHAR) AS pinball_xden,
             |  CASE WHEN ev.n_eval > 0
             |    THEN CAST(ev.sx AS DOUBLE) / (4.0 * CAST(ev.n_eval AS DOUBLE))
             |    END AS mean_pinball
             |FROM fc LEFT JOIN ev ON fc.g = ev.g
             |ORDER BY fc.g""".stripMargin)),

    // ---- q306: STREAMING HIGH-WATER-MARK ALERTS — live "new
    // all-time high" detection per event type
    // ([[graft.streaming.HighWater]], the watermark-buffer template's
    // fifth instance). Batch membership is scrambled exactly like
    // q203/q223/q243 (hash-chosen trailing bands one batch late,
    // inside the 2-day delay) + the far-future flush sentinel; the
    // buffers must drain to one scalar state row per key. The oracle
    // is fully declarative: an alert is any row beating the window
    // max of all prior rows in (ts, id) order.
    Q(
      "q306_streaming_highwater",
      (s, d) => streamingHighWater(s, d),
      Some("""WITH base AS MATERIALIZED (SELECT event_type AS k,
             |    epoch_us(ts) AS us, event_id AS id,
             |    CAST(round(value * 100) AS BIGINT) AS p
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |    AND value IS NOT NULL AND event_id IS NOT NULL),
             |r AS (SELECT k, us, id, p,
             |    coalesce(max(p) OVER (PARTITION BY k ORDER BY us, id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             |      AS prev
             |  FROM base)
             |SELECT k AS key, us AS alert_us, id AS event_id,
             |  p AS price_cents, prev AS prev_max_cents
             |FROM r WHERE p > prev
             |ORDER BY key, alert_us, event_id""".stripMargin)),

    // ---- q307: RFM SEGMENTATION — the classic customer grid from
    // exact global quintile cuts per dimension
    // ([[graft.operators.Profiling.rfmSegments]], cuts via the
    // bin-id-predicate selection — no global sort). Rank-position
    // scores are tie-deterministic in both engines; monetary digests
    // exact — hash-exact.
    Q(
      "q307_rfm_segments",
      (s, d) => {
        import s.implicits._
        val cust = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_orderdate".isNotNull &&
            $"o_totalprice".isNotNull)
          .groupBy($"o_custkey")
          .agg(
            datediff(lit("2002-01-01").cast("date"),
              max($"o_orderdate").cast("date")).as("r_days"),
            count(lit(1)).as("freq"),
            sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
        graft.operators.Profiling.rfmSegments(
          cust, $"r_days", $"freq", $"cents")
          .orderBy($"r_score", $"f_score", $"m_score")
      },
      Some("""WITH cust AS MATERIALIZED (SELECT o_custkey,
             |    date_diff('day', CAST(max(o_orderdate) AS DATE),
             |      DATE '2002-01-01') AS r,
             |    count(*) AS f,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS m
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
             |    AND o_totalprice IS NOT NULL
             |  GROUP BY 1),
             |nn AS (SELECT count(*) AS n FROM cust),
             |ranks AS (SELECT i, (i * n + 4) // 5 AS rk
             |  FROM (SELECT unnest(generate_series(1, 4)) AS i), nn),
             |cr AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum
             |  FROM (SELECT r AS v, count(*) AS c FROM cust GROUP BY 1)),
             |kr AS MATERIALIZED (SELECT ranks.i, min(cr.v) AS cut
             |  FROM ranks JOIN cr ON cr.cum >= ranks.rk GROUP BY 1),
             |cf AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum
             |  FROM (SELECT f AS v, count(*) AS c FROM cust GROUP BY 1)),
             |kf AS MATERIALIZED (SELECT ranks.i, min(cf.v) AS cut
             |  FROM ranks JOIN cf ON cf.cum >= ranks.rk GROUP BY 1),
             |cm AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum
             |  FROM (SELECT m AS v, count(*) AS c FROM cust GROUP BY 1)),
             |km AS MATERIALIZED (SELECT ranks.i, min(cm.v) AS cut
             |  FROM ranks JOIN cm ON cm.cum >= ranks.rk GROUP BY 1),
             |sc AS (SELECT cust.o_custkey,
             |    6 - (1 + (SELECT count(*) FROM kr WHERE kr.cut < cust.r))
             |      AS r_score,
             |    1 + (SELECT count(*) FROM kf WHERE kf.cut < cust.f)
             |      AS f_score,
             |    1 + (SELECT count(*) FROM km WHERE km.cut < cust.m)
             |      AS m_score,
             |    cust.m
             |  FROM cust)
             |SELECT CAST(r_score AS INTEGER) AS r_score,
             |  CAST(f_score AS INTEGER) AS f_score,
             |  CAST(m_score AS INTEGER) AS m_score,
             |  count(*) AS n_customers,
             |  CAST(CAST(sum(CAST(m AS DECIMAL(19,0))) AS DECIMAL(38,0))
             |    AS VARCHAR) AS sum_monetary
             |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- q308: DECISION-STUMP TRAINING — the best numeric split
    // per feature against "line was returned"
    // ([[graft.operators.Profiling.bestNumericSplit]]): cumulative
    // cell counts per feature (windows over distinct values, one
    // partition per feature), pinned-double weighted Gini per
    // candidate, argmin with value tie-break — hash-exact.
    Q(
      "q308_best_split",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_returnflag".isNotNull && $"l_quantity".isNotNull &&
            $"l_extendedprice".isNotNull && $"l_discount".isNotNull)
          .withColumn("y", ($"l_returnflag" === "R").cast("long"))
        val stacked = li.select(explode(array(
          struct(lit("quantity").as("ft"),
            $"l_quantity".cast("long").as("v")),
          struct(lit("price_10k").as("ft"),
            floor($"l_extendedprice" / 10000).cast("long").as("v")),
          struct(lit("disc_pct").as("ft"),
            round($"l_discount" * 100).cast("long").as("v")))).as("c"),
          $"y")
          .select($"c.ft".as("ft"), $"c.v".as("v"), $"y")
        graft.operators.Profiling.bestNumericSplit(
          stacked, $"ft", $"v", $"y")
          .orderBy($"feature")
      },
      Some("""WITH li AS MATERIALIZED (SELECT l_quantity, l_extendedprice,
             |    l_discount,
             |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
             |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
             |base AS MATERIALIZED (
             |  SELECT 'quantity' AS ft, CAST(l_quantity AS BIGINT) AS v, y
             |    FROM li
             |  UNION ALL
             |  SELECT 'price_10k',
             |    CAST(floor(l_extendedprice / 10000) AS BIGINT), y FROM li
             |  UNION ALL
             |  SELECT 'disc_pct', CAST(round(l_discount * 100) AS BIGINT), y
             |    FROM li),
             |cells AS (SELECT ft, v, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
             |  FROM base GROUP BY 1, 2),
             |cum AS MATERIALIZED (SELECT ft, v,
             |    CAST(sum(c) OVER (PARTITION BY ft ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS nl,
             |    CAST(sum(p) OVER (PARTITION BY ft ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS pl,
             |    CAST(sum(c) OVER (PARTITION BY ft) AS BIGINT) AS n,
             |    CAST(sum(p) OVER (PARTITION BY ft) AS BIGINT) AS pt
             |  FROM cells),
             |cand AS (SELECT ft, v, nl, n, pt,
             |    (CAST(nl AS DOUBLE) * (1.0
             |        - (CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
             |          + CAST(nl - pl AS DOUBLE) * CAST(nl - pl AS DOUBLE))
             |          / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)))
             |      + CAST(n - nl AS DOUBLE) * (1.0
             |        - (CAST(pt - pl AS DOUBLE) * CAST(pt - pl AS DOUBLE)
             |          + CAST(n - nl - (pt - pl) AS DOUBLE)
             |            * CAST(n - nl - (pt - pl) AS DOUBLE))
             |          / (CAST(n - nl AS DOUBLE) * CAST(n - nl AS DOUBLE))))
             |      / CAST(n AS DOUBLE) AS wg
             |  FROM cum WHERE nl < n),
             |pick AS (SELECT ft, v, nl, n, pt, wg,
             |    row_number() OVER (PARTITION BY ft ORDER BY wg, v) AS rn
             |  FROM cand)
             |SELECT ft AS feature, n, v AS split_value, nl AS n_left,
             |  wg AS gini_split,
             |  1.0 - (CAST(pt AS DOUBLE) * CAST(pt AS DOUBLE)
             |    + CAST(n - pt AS DOUBLE) * CAST(n - pt AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_root,
             |  (1.0 - (CAST(pt AS DOUBLE) * CAST(pt AS DOUBLE)
             |    + CAST(n - pt AS DOUBLE) * CAST(n - pt AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) - wg AS gain
             |FROM pick WHERE rn = 1 ORDER BY feature""".stripMargin)),

    // ---- q309: SOURCE-OVERLAP MATRIX — pairwise 3-gram shingle
    // containment between corpus sources
    // ([[graft.operators.Dedup.sourceOverlapFromHashed]] over the
    // session-shared hashed-shingle projection): distinct
    // (source, shingle) postings, an S²-bounded self-equi-join on the
    // hash, exact counts, one pinned Jaccard division — hash-exact
    // (the oracle re-derives overlap on shingle STRINGS; hash
    // collisions are absent at gate scale and sub-0.01% forever).
    Q(
      "q309_source_overlap",
      (s, d) => {
        import s.implicits._
        val tags = Tables.documents(s, d)
          .filter($"doc_id".isNotNull && $"text".isNotNull &&
            $"source".isNotNull)
          .select($"doc_id", $"source")
        graft.operators.Dedup.sourceOverlapFromHashed(
          LlmOps.sharedShingleSets(s, d), tags)
          .orderBy($"src_a", $"src_b")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $sqlToks AS t
             |  FROM documents
             |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
             |    AND source IS NOT NULL),
             |sh AS (SELECT doc_id, source,
             |  list_distinct(CASE WHEN len(t) >= 3
             |    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
             |    ELSE [array_to_string(t, ' ')] END) AS sh FROM toks),
             |post AS MATERIALIZED (SELECT DISTINCT source, unnest(sh) AS h
             |  FROM sh),
             |per AS MATERIALIZED (SELECT source, count(*) AS nsh
             |  FROM post GROUP BY 1),
             |pairs AS (SELECT a.source AS src_a, b.source AS src_b,
             |    count(*) AS intersection
             |  FROM post a JOIN post b
             |    ON a.h = b.h AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT src_a, src_b,
             |  CAST(pa.nsh AS BIGINT) AS n_a, CAST(pb.nsh AS BIGINT) AS n_b,
             |  intersection,
             |  CAST(intersection AS DOUBLE)
             |    / CAST(pa.nsh + pb.nsh - intersection AS DOUBLE) AS jaccard
             |FROM pairs
             |JOIN per pa ON src_a = pa.source
             |JOIN per pb ON src_b = pb.source
             |ORDER BY src_a, src_b""".stripMargin)))

  /** Continuation Seq 7: intermittent-demand forecasting, data
    * valuation, fairness audit.
    */
  val all7: Seq[Q] = Seq(

    // ---- q310: CROSTON INTERMITTENT DEMAND — weekly per-part
    // quantity forecast where most weeks are zero
    // ([[graft.operators.TimeSeries.croston]]): separate dyadic-α
    // smoothing of nonzero sizes and inter-demand gaps, ONE aggregate
    // HOF per key over the dense grid, pinned fold order — integer
    // demands make the fold bit-equal across engines, hash-exact.
    Q(
      "q310_croston",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.croston(
          Tables.lineitem(s, d),
          $"l_partkey", $"l_shipdate".cast("timestamp"), $"l_quantity",
          periodSeconds = 604800L, alpha = 0.25)
          .orderBy($"key")
      },
      Some("""WITH o AS (SELECT l_partkey AS k,
             |    CAST(floor(CAST(epoch_us(l_shipdate) AS DOUBLE)
             |      / 604800000000.0) AS BIGINT) AS period,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS vd
             |  FROM lineitem
             |  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
             |    AND l_quantity IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1
             |  FROM o GROUP BY 1),
             |grid AS (SELECT k, unnest(generate_series(p0, p1)) AS period
             |  FROM sp),
             |gv AS MATERIALIZED (SELECT g.k, g.period,
             |    coalesce(o.vd, CAST('0' AS DOUBLE)) AS v
             |  FROM grid g LEFT JOIN o ON g.k = o.k AND g.period = o.period),
             |se AS (SELECT k, count(*) AS n_periods,
             |    CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_demand,
             |    list(v ORDER BY period) AS l
             |  FROM gv GROUP BY 1),
             |ex AS (SELECT k, n_periods, n_demand,
             |    list_reduce(
             |      list_prepend([CAST('0' AS DOUBLE), CAST('0' AS DOUBLE),
             |          CAST('0' AS DOUBLE), CAST('0' AS DOUBLE)],
             |        list_transform(l, v -> [v, CAST('0' AS DOUBLE),
             |          CAST('0' AS DOUBLE), CAST('0' AS DOUBLE)])),
             |      (acc, x) -> [
             |        CASE WHEN x[1] > 0 THEN CASE WHEN acc[4] = 0 THEN x[1]
             |          ELSE acc[1] + CAST('0.25' AS DOUBLE) * (x[1] - acc[1])
             |          END ELSE acc[1] END,
             |        CASE WHEN x[1] > 0 THEN CASE WHEN acc[4] = 0
             |          THEN acc[3] + CAST('1' AS DOUBLE)
             |          ELSE acc[2] + CAST('0.25' AS DOUBLE)
             |            * ((acc[3] + CAST('1' AS DOUBLE)) - acc[2])
             |          END ELSE acc[2] END,
             |        CASE WHEN x[1] > 0 THEN CAST('0' AS DOUBLE)
             |          ELSE acc[3] + CAST('1' AS DOUBLE) END,
             |        CASE WHEN x[1] > 0 THEN CAST('1' AS DOUBLE)
             |          ELSE acc[4] END]) AS st
             |  FROM se)
             |SELECT k AS key, n_periods, n_demand,
             |  CASE WHEN n_demand > 0 THEN st[1] END AS size,
             |  CASE WHEN n_demand > 0 THEN st[2] END AS interval,
             |  CASE WHEN n_demand > 0 AND st[2] > 0 THEN st[1] / st[2] END
             |    AS forecast
             |FROM ex ORDER BY key""".stripMargin)),

    // ---- q311: LEAVE-ONE-OUT SOURCE ABLATION — each source's
    // marginal effect on the corpus long-doc rate
    // ([[graft.operators.Profiling.leaveOneOutAblation]]): one
    // aggregation pass, removal is arithmetic on exact totals —
    // hash-exact.
    Q(
      "q311_source_ablation",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.leaveOneOutAblation(
          Tables.documents(s, d)
            .filter($"source".isNotNull && $"n_chars".isNotNull),
          $"source", ($"n_chars" >= 1000).cast("long"), lit(1L))
          .orderBy($"g")
      },
      Some("""WITH per AS (SELECT source AS g,
             |    CAST(sum(CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS pg,
             |    count(*) AS qg
             |  FROM documents
             |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
             |  GROUP BY 1),
             |tot AS (SELECT CAST(sum(pg) AS BIGINT) AS pt,
             |    CAST(sum(qg) AS BIGINT) AS qt FROM per)
             |SELECT g, pg AS num_g, qg AS den_g,
             |  CAST(pt AS DOUBLE) / CAST(qt AS DOUBLE) AS rate_overall,
             |  CASE WHEN qt > qg
             |    THEN CAST(pt - pg AS DOUBLE) / CAST(qt - qg AS DOUBLE)
             |    END AS rate_without,
             |  CASE WHEN qt > qg
             |    THEN CAST(pt AS DOUBLE) / CAST(qt AS DOUBLE)
             |      - CAST(pt - pg AS DOUBLE) / CAST(qt - qg AS DOUBLE)
             |    END AS delta
             |FROM per, tot ORDER BY g""".stripMargin)),

    // ---- q312: DISPARATE-IMPACT AUDIT — four-fifths-rule screen of
    // urgent-order access across market segments
    // ([[graft.operators.Experiment.disparateImpact]]): reference =
    // rate argmax via TakeOrdered, ratio a pinned double, and the
    // FLAG evaluated entirely in exact integers (HUGEINT mirror in
    // the oracle) so boundaries cannot flap — hash-exact.
    Q(
      "q312_disparate_impact",
      (s, d) => {
        import s.implicits._
        val pos = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("uk")).distinct()
        val per = Tables.customer(s, d)
          .join(pos, $"c_custkey" === $"uk", "left")
          .select($"c_mktsegment".as("seg"), $"uk".isNotNull.as("y"))
        graft.operators.Experiment.disparateImpact(per, $"seg", $"y")
          .orderBy($"g")
      },
      Some("""WITH pos AS (SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderpriority = '1-URGENT'),
             |per AS MATERIALIZED (SELECT c_mktsegment AS g, count(*) AS n,
             |    CAST(sum(CASE WHEN pos.o_custkey IS NOT NULL THEN 1 ELSE 0
             |      END) AS BIGINT) AS p
             |  FROM customer LEFT JOIN pos ON c_custkey = pos.o_custkey
             |  GROUP BY 1),
             |ref AS (SELECT g AS ref_group, p AS pr, n AS nr
             |  FROM (SELECT g, p, n,
             |      CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS rate FROM per)
             |  ORDER BY rate DESC, g LIMIT 1)
             |SELECT per.g, per.n, per.p AS positives,
             |  CAST(per.p AS DOUBLE) / CAST(per.n AS DOUBLE) AS rate,
             |  ref.ref_group,
             |  CASE WHEN ref.pr > 0
             |    THEN (CAST(per.p AS DOUBLE) * CAST(ref.nr AS DOUBLE))
             |      / (CAST(ref.pr AS DOUBLE) * CAST(per.n AS DOUBLE))
             |    END AS ratio,
             |  CASE WHEN ref.pr > 0
             |    THEN CAST(per.p AS HUGEINT) * CAST(ref.nr AS HUGEINT) * 5
             |      < CAST(ref.pr AS HUGEINT) * CAST(per.n AS HUGEINT) * 4
             |    END AS below_threshold
             |FROM per, ref ORDER BY per.g""".stripMargin)),

    // ---- q313: MEAN CUMULATIVE FUNCTION — expected cumulative
    // purchases per signed-up user over calendar days
    // ([[graft.operators.Survival.meanCumulativeFunction]], the
    // recurrent-event sibling of q254's Nelson–Aalen): per-day cells,
    // risk-set prefix and MCF as window running sums in pinned day
    // order over the calendar-bounded axis — hash-exact.
    Q(
      "q313_mcf",
      (s, d) => {
        import s.implicits._
        graft.operators.Survival.meanCumulativeFunction(
          Tables.events(s, d)
            .filter($"user_id".isNotNull && $"ts".isNotNull &&
              $"event_type".isNotNull),
          $"user_id", $"ts",
          $"event_type" === "signup", $"event_type" === "purchase")
          .orderBy($"day")
      },
      Some("""WITH base AS MATERIALIZED (SELECT user_id AS s,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
             |      AS BIGINT) AS day,
             |    event_type = 'signup' AS en,
             |    event_type = 'purchase' AS ev
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_type IS NOT NULL),
             |entries AS MATERIALIZED (SELECT s, min(day) AS eday
             |  FROM base WHERE en GROUP BY 1),
             |counted AS MATERIALIZED (SELECT b.day, count(*) AS d
             |  FROM base b JOIN entries e ON b.s = e.s AND b.day >= e.eday
             |  WHERE b.ev GROUP BY 1),
             |ecell AS MATERIALIZED (SELECT eday AS day, count(*) AS e
             |  FROM entries GROUP BY 1),
             |axis AS (SELECT DISTINCT day FROM (
             |  SELECT day FROM counted UNION ALL SELECT day FROM ecell)),
             |dense AS (SELECT a.day,
             |    coalesce(CAST(ec.e AS BIGINT), 0) AS e,
             |    coalesce(CAST(c.d AS BIGINT), 0) AS d
             |  FROM axis a
             |  LEFT JOIN ecell ec ON a.day = ec.day
             |  LEFT JOIN counted c ON a.day = c.day),
             |c1 AS (SELECT day, d,
             |    CAST(sum(e) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS n_at_risk
             |  FROM dense),
             |c2 AS (SELECT day, d, n_at_risk,
             |    sum(CASE WHEN d > 0 AND n_at_risk > 0
             |      THEN CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
             |      ELSE 0.0 END) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mcf
             |  FROM c1)
             |SELECT day, n_at_risk, d AS n_events, mcf
             |FROM c2 WHERE d > 0 ORDER BY day""".stripMargin)),

    // ---- q314: FISHER PRICE INDEX — Laspeyres/Paasche/Fisher per
    // brand between pre- and post-1998 shipments
    // ([[graft.operators.Finance.priceIndex]]): exact decimal revenue
    // totals for the pure sums; the per-item cross terms are float
    // sums, and DuckDB's windowed SUM reassociates via a segment tree
    // on frames past a few dozen rows, so the indices are 1e-9
    // soundness-gated (exact n_items; poison on any drift).
    Q(
      "q314_price_index",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_shipdate".isNotNull && $"l_extendedprice".isNotNull &&
            $"l_quantity".isNotNull && $"l_partkey".isNotNull)
          .join(broadcast(Tables.part(s, d)
            .select($"p_partkey", $"p_brand")),
            $"l_partkey" === $"p_partkey")
        graft.operators.Finance.priceIndex(
          li, $"p_brand", $"l_partkey",
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"),
          round($"l_extendedprice" * 100).cast("long"),
          $"l_quantity")
          .orderBy($"g")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q314_price_index/*.parquet')),
             |base AS MATERIALIZED (SELECT p.p_brand AS g,
             |    l.l_partkey AS i,
             |    l.l_shipdate < TIMESTAMP '1998-01-01' AS b,
             |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS r,
             |    CAST(l.l_quantity AS BIGINT) AS q
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |  WHERE l.l_shipdate IS NOT NULL AND l.l_extendedprice IS NOT NULL
             |    AND l.l_quantity IS NOT NULL AND l.l_partkey IS NOT NULL),
             |per AS MATERIALIZED (SELECT g, i,
             |    CAST(sum(CASE WHEN b THEN r ELSE 0 END) AS BIGINT) AS r0,
             |    CAST(sum(CASE WHEN b THEN q ELSE 0 END) AS BIGINT) AS q0,
             |    CAST(sum(CASE WHEN NOT b THEN r ELSE 0 END) AS BIGINT) AS r1,
             |    CAST(sum(CASE WHEN NOT b THEN q ELSE 0 END) AS BIGINT) AS q1
             |  FROM base GROUP BY 1, 2),
             |kept AS (SELECT * FROM per WHERE q0 > 0 AND q1 > 0),
             |expect AS MATERIALIZED (SELECT g,
             |    CAST(count(*) AS BIGINT) AS n_items,
             |    sum(CAST(r1 AS DOUBLE) * CAST(q0 AS DOUBLE)
             |      / CAST(q1 AS DOUBLE)) AS lnum,
             |    sum(CAST(r0 AS DOUBLE) * CAST(q1 AS DOUBLE)
             |      / CAST(q0 AS DOUBLE)) AS pden,
             |    CAST(CAST(sum(CAST(r0 AS DECIMAL(19,0))) AS DECIMAL(38,0))
             |      AS DOUBLE) AS sr0,
             |    CAST(CAST(sum(CAST(r1 AS DECIMAL(19,0))) AS DECIMAL(38,0))
             |      AS DOUBLE) AS sr1
             |  FROM kept GROUP BY 1),
             |ex AS (SELECT g, n_items,
             |    CASE WHEN sr0 > 0 THEN lnum / sr0 END AS laspeyres,
             |    CASE WHEN pden > 0 THEN sr1 / pden END AS paasche,
             |    CASE WHEN sr0 > 0 AND pden > 0
             |      THEN sqrt((lnum / sr0) * (sr1 / pden)) END AS fisher
             |  FROM expect),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM ex)
             |    AND (SELECT count(DISTINCT g) FROM emitted)
             |      = (SELECT count(*) FROM emitted)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN ex x ON e.g = x.g
             |      WHERE e.n_items <> x.n_items
             |        OR (e.laspeyres IS NULL) <> (x.laspeyres IS NULL)
             |        OR (e.paasche IS NULL) <> (x.paasche IS NULL)
             |        OR (e.fisher IS NULL) <> (x.fisher IS NULL)
             |        OR abs(coalesce(e.laspeyres, 0) - coalesce(x.laspeyres, 0)) > 1e-9
             |        OR abs(coalesce(e.paasche, 0) - coalesce(x.paasche, 0)) > 1e-9
             |        OR abs(coalesce(e.fisher, 0) - coalesce(x.fisher, 0)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.g NOT IN (SELECT g FROM ex))
             |    AND NOT EXISTS (SELECT 1 FROM ex x
             |      WHERE x.g NOT IN (SELECT g FROM emitted))
             |  ) AS ok)
             |SELECT g, n_items, laspeyres, paasche, fisher FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY g""".stripMargin)),

    // ---- q315: LANGUAGE-ID CONFUSION MATRIX — q22's heuristic
    // predictor evaluated against the labeled corpus
    // ([[graft.operators.ModelEval.confusionMatrix]]): exact cell and
    // row counts, one pinned share division — hash-exact.
    Q(
      "q315_langid_confusion",
      (s, d) => {
        import s.implicits._
        val pred = Tables.documents(s, d)
          .filter($"lang".isNotNull)
          .select($"lang",
            graft.operators.TextAnalysis.langId($"text").as("lang_pred"))
        graft.operators.ModelEval.confusionMatrix(
          pred, $"lang", $"lang_pred")
          .orderBy($"actual", $"predicted")
      },
      Some(s"""WITH t AS (SELECT lang,
             |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS n_cjk,
             |    len(list_filter($sqlToks, x -> list_contains(${graft.operators.TextAnalysis.stopwordsEn.mkString("['", "','", "']")}, x))) AS en,
             |    len(list_filter($sqlToks, x -> list_contains(${graft.operators.TextAnalysis.stopwordsDe.mkString("['", "','", "']")}, x))) AS de,
             |    len(list_filter($sqlToks, x -> list_contains(${graft.operators.TextAnalysis.stopwordsFr.mkString("['", "','", "']")}, x))) AS fr,
             |    len(list_filter($sqlToks, x -> list_contains(${graft.operators.TextAnalysis.stopwordsEs.mkString("['", "','", "']")}, x))) AS es
             |  FROM documents WHERE lang IS NOT NULL),
             |pred AS (SELECT lang AS actual,
             |    CASE WHEN n_cjk > 0 THEN 'zh'
             |         WHEN en >= de AND en >= fr AND en >= es THEN 'en'
             |         WHEN de >= fr AND de >= es THEN 'de'
             |         WHEN fr >= es THEN 'fr'
             |         ELSE 'es' END AS predicted
             |  FROM t),
             |cells AS MATERIALIZED (SELECT actual, predicted, count(*) AS n
             |  FROM pred GROUP BY 1, 2),
             |rt AS (SELECT actual, CAST(sum(n) AS BIGINT) AS row_total
             |  FROM cells GROUP BY 1)
             |SELECT c.actual, c.predicted, c.n, r.row_total,
             |  CAST(c.n AS DOUBLE) / CAST(r.row_total AS DOUBLE) AS row_share
             |FROM cells c JOIN rt r USING (actual)
             |ORDER BY actual, predicted""".stripMargin)),

    // ---- q316: RIDGE REGRESSION in closed form — order value
    // (dollars) on line count and total quantity per order status,
    // λ = 1024 ([[graft.operators.Regression.ridge2]]): one exact
    // moment pass, Cramer's rule as four pinned 3×3 determinant
    // chains — hash-exact, no iterative solver.
    Q(
      "q316_ridge_regression",
      (s, d) => {
        import s.implicits._
        val per = Tables.lineitem(s, d)
          .filter($"l_orderkey".isNotNull && $"l_quantity".isNotNull)
          .groupBy($"l_orderkey")
          .agg(count(lit(1)).as("x1"),
            sum($"l_quantity".cast("long")).as("x2"))
          .join(Tables.orders(s, d)
            .filter($"o_totalprice".isNotNull)
            .select($"o_orderkey", $"o_orderstatus",
              floor($"o_totalprice").cast("long").as("yd")),
            $"l_orderkey" === $"o_orderkey")
        graft.operators.Regression.ridge2(
          per, $"o_orderstatus", $"x1", $"x2", $"yd", lambda = 1024.0)
          .orderBy($"key")
      },
      Some("""WITH per AS MATERIALIZED (SELECT o.o_orderstatus AS k,
             |    li.x1, li.x2, o.yd
             |  FROM (SELECT l_orderkey, count(*) AS x1,
             |      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
             |    FROM lineitem
             |    WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
             |    GROUP BY 1) li
             |  JOIN (SELECT o_orderkey, o_orderstatus,
             |      CAST(floor(o_totalprice) AS BIGINT) AS yd
             |    FROM orders WHERE o_totalprice IS NOT NULL) o
             |  ON li.l_orderkey = o.o_orderkey),
             |m AS (SELECT k, count(*) AS n,
             |    CAST(sum(CAST(x1 AS DECIMAL(19,0))) AS DOUBLE) AS s1,
             |    CAST(sum(CAST(x2 AS DECIMAL(19,0))) AS DOUBLE) AS s2,
             |    CAST(sum(CAST(x1 AS DECIMAL(19,0)) * CAST(x1 AS DECIMAL(19,0))) AS DOUBLE) AS s11,
             |    CAST(sum(CAST(x1 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0))) AS DOUBLE) AS s12,
             |    CAST(sum(CAST(x2 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0))) AS DOUBLE) AS s22,
             |    CAST(sum(CAST(yd AS DECIMAL(19,0))) AS DOUBLE) AS sy,
             |    CAST(sum(CAST(x1 AS DECIMAL(19,0)) * CAST(yd AS DECIMAL(19,0))) AS DOUBLE) AS s1y,
             |    CAST(sum(CAST(x2 AS DECIMAL(19,0)) * CAST(yd AS DECIMAL(19,0))) AS DOUBLE) AS s2y
             |  FROM per GROUP BY 1),
             |det AS (SELECT k, n,
             |    CAST(n AS DOUBLE) AS a11, s1 AS a12, s2 AS a13,
             |    s11 + 1024.0 AS a22, s12 AS a23, s22 + 1024.0 AS a33,
             |    sy AS c1, s1y AS c2, s2y AS c3
             |  FROM m),
             |sol AS (SELECT k, n,
             |    a11 * (a22 * a33 - a23 * a23)
             |      - a12 * (a12 * a33 - a23 * a13)
             |      + a13 * (a12 * a23 - a22 * a13) AS dA,
             |    c1 * (a22 * a33 - a23 * a23)
             |      - a12 * (c2 * a33 - a23 * c3)
             |      + a13 * (c2 * a23 - a22 * c3) AS d0,
             |    a11 * (c2 * a33 - a23 * c3)
             |      - c1 * (a12 * a33 - a23 * a13)
             |      + a13 * (a12 * c3 - c2 * a13) AS d1,
             |    a11 * (a22 * c3 - c2 * a23)
             |      - a12 * (a12 * c3 - c2 * a13)
             |      + c1 * (a12 * a23 - a22 * a13) AS d2
             |  FROM det)
             |SELECT k AS key, n, dA AS det,
             |  CASE WHEN dA > 0 THEN d0 / dA END AS b0,
             |  CASE WHEN dA > 0 THEN d1 / dA END AS b1,
             |  CASE WHEN dA > 0 THEN d2 / dA END AS b2
             |FROM sol ORDER BY key""".stripMargin)),

    // ---- q317: COVARIATE BALANCE — standardized mean differences of
    // account balance (dollars) and order count between hash-assigned
    // arms ([[graft.operators.Experiment.covariateBalance]]): one
    // pass, exact decimal sums, pinned SMD chain — hash-exact.
    Q(
      "q317_covariate_balance",
      (s, d) => {
        import s.implicits._
        val oc = Tables.orders(s, d).filter($"o_custkey".isNotNull)
          .groupBy($"o_custkey").agg(count(lit(1)).as("oc"))
        val per = Tables.customer(s, d)
          .filter($"c_custkey".isNotNull && $"c_acctbal".isNotNull)
          .join(oc, $"c_custkey" === $"o_custkey", "left")
          .select(
            (pmod(graft.operators.KmvSketch.hash60($"c_custkey"),
              lit(2L)) === 1L).as("armb"),
            floor($"c_acctbal").cast("long").as("acct"),
            coalesce($"oc", lit(0L)).as("nord"))
        graft.operators.Experiment.covariateBalance(per, $"armb",
          Seq("acct_dollars" -> $"acct", "n_orders" -> $"nord"))
          .orderBy($"covariate")
      },
      Some(s"""WITH oc AS (SELECT o_custkey, count(*) AS oc FROM orders
             |  WHERE o_custkey IS NOT NULL GROUP BY 1),
             |per AS MATERIALIZED (SELECT
             |    (${graft.operators.KmvSketch.hash60Sql("c_custkey")} % 2) = 1 AS armb,
             |    CAST(floor(c_acctbal) AS BIGINT) AS acct,
             |    coalesce(oc.oc, 0) AS nord
             |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey
             |  WHERE c_custkey IS NOT NULL AND c_acctbal IS NOT NULL),
             |wide AS (SELECT
             |    CAST(sum(CASE WHEN NOT armb THEN 1 ELSE 0 END) AS BIGINT) AS na,
             |    CAST(sum(CASE WHEN armb THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             |    CAST(sum(CASE WHEN NOT armb THEN CAST(acct AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS sa1,
             |    CAST(sum(CASE WHEN NOT armb THEN CAST(acct AS DECIMAL(19,0)) * CAST(acct AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS qa1,
             |    CAST(sum(CASE WHEN armb THEN CAST(acct AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS sb1,
             |    CAST(sum(CASE WHEN armb THEN CAST(acct AS DECIMAL(19,0)) * CAST(acct AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS qb1,
             |    CAST(sum(CASE WHEN NOT armb THEN CAST(nord AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS sa2,
             |    CAST(sum(CASE WHEN NOT armb THEN CAST(nord AS DECIMAL(19,0)) * CAST(nord AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS qa2,
             |    CAST(sum(CASE WHEN armb THEN CAST(nord AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS sb2,
             |    CAST(sum(CASE WHEN armb THEN CAST(nord AS DECIMAL(19,0)) * CAST(nord AS DECIMAL(19,0)) ELSE 0 END) AS DOUBLE) AS qb2
             |  FROM per),
             |pts AS (
             |  SELECT 'acct_dollars' AS covariate, na, nb, sa1 AS sa,
             |    qa1 AS qa, sb1 AS sb, qb1 AS qb FROM wide
             |  UNION ALL
             |  SELECT 'n_orders', na, nb, sa2, qa2, sb2, qb2 FROM wide)
             |SELECT covariate, na AS n_a, nb AS n_b,
             |  CASE WHEN na > 0 THEN sa / CAST(na AS DOUBLE) END AS mean_a,
             |  CASE WHEN nb > 0 THEN sb / CAST(nb AS DOUBLE) END AS mean_b,
             |  CASE WHEN na > 1 AND nb > 1 AND
             |      ((CAST(na AS DOUBLE) * qa - sa * sa)
             |          / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))
             |        + (CAST(nb AS DOUBLE) * qb - sb * sb)
             |          / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) / 2.0 > 0
             |    THEN (sb / CAST(nb AS DOUBLE) - sa / CAST(na AS DOUBLE))
             |      / sqrt(((CAST(na AS DOUBLE) * qa - sa * sa)
             |          / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))
             |        + (CAST(nb AS DOUBLE) * qb - sb * sb)
             |          / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) / 2.0)
             |    END AS smd
             |FROM pts ORDER BY covariate""".stripMargin)),

    // ---- q318: AALEN–JOHANSEN COMPETING RISKS — cumulative
    // incidence of first purchase (cause 1) vs first error (cause 2)
    // after signup, censored at 2024-02-01
    // ([[graft.operators.Survival.aalenJohansen]]): one row per
    // distinct duration, suffix risk sets, survival prefix exp∘Σ∘ln —
    // integer columns hash-exact, float columns 1e-9 soundness-gated
    // (the q170 KM discipline), poison on mismatch.
    Q(
      "q318_aalen_johansen",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull &&
            $"event_type".isNotNull)
          .select($"user_id".as("u"),
            floor(unix_micros($"ts") / lit(86400000000L)).cast("long")
              .as("day"),
            $"event_type".as("et"))
        val entry = ev.filter($"et" === "signup")
          .groupBy($"u").agg(min($"day").as("eday"))
        val pe = ev.filter($"et" === "purchase" || $"et" === "error")
          .select($"u".as("pu"), $"day",
            when($"et" === "purchase", 1L).otherwise(2L).as("r"))
        val withEntry = pe.join(entry, $"pu" === $"u" && $"day" >= $"eday")
        val firsts = withEntry.groupBy($"pu").agg(min($"day").as("fd"))
          .select($"pu".as("fu"), $"fd")
        val causes = withEntry
          .join(firsts, $"pu" === $"fu" && $"day" === $"fd")
          .groupBy($"pu").agg(min($"r").as("cz"), min($"fd").as("fday"))
        val horizon = lit(19754L) // 2024-02-01 in epoch days
        val dur = entry.join(causes, $"u" === $"pu", "left")
          .select(
            coalesce($"fday" - $"eday", horizon - $"eday").as("t"),
            coalesce($"cz", lit(0L)).as("cause"))
        graft.operators.Survival.aalenJohansen(dur, $"t", $"cause")
          .orderBy($"t")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q318_aalen_johansen/*.parquet')),
             |ev AS MATERIALIZED (SELECT user_id AS u,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
             |      AS BIGINT) AS day,
             |    event_type AS et
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |    AND event_type IS NOT NULL),
             |entry AS MATERIALIZED (SELECT u, min(day) AS eday
             |  FROM ev WHERE et = 'signup' GROUP BY 1),
             |pe AS (SELECT ev.u, ev.day,
             |    CASE WHEN ev.et = 'purchase' THEN 1 ELSE 2 END AS r
             |  FROM ev WHERE et IN ('purchase', 'error')),
             |we AS MATERIALIZED (SELECT pe.u, pe.day, pe.r, e.eday
             |  FROM pe JOIN entry e ON pe.u = e.u AND pe.day >= e.eday),
             |firsts AS (SELECT u, min(day) AS fd FROM we GROUP BY 1),
             |causes AS MATERIALIZED (SELECT we.u, min(we.r) AS cz,
             |    min(we.day) AS fday
             |  FROM we JOIN firsts f ON we.u = f.u AND we.day = f.fd
             |  GROUP BY 1),
             |dur AS MATERIALIZED (SELECT
             |    coalesce(c.fday - e.eday, 19754 - e.eday) AS t,
             |    coalesce(c.cz, 0) AS cause
             |  FROM entry e LEFT JOIN causes c ON e.u = c.u),
             |cells AS (SELECT t, count(*) AS leave,
             |    CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS d1,
             |    CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS d2
             |  FROM dur GROUP BY 1),
             |nn AS (SELECT count(*) AS n_total FROM dur),
             |st AS (SELECT t, d1, d2, d1 + d2 AS dd,
             |    (SELECT n_total FROM nn)
             |      - coalesce(CAST(sum(leave) OVER (ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |        AS BIGINT), 0) AS n_risk
             |  FROM cells),
             |lg AS (SELECT *, CASE WHEN dd > 0 AND dd < n_risk
             |      THEN ln(1.0 - CAST(dd AS DOUBLE) / CAST(n_risk AS DOUBLE))
             |      ELSE 0.0 END AS lnterm
             |  FROM st),
             |sm AS (SELECT *, exp(coalesce(sum(lnterm) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
             |      AS s_minus
             |  FROM lg),
             |ex AS (SELECT t, n_risk, d1, d2, s_minus,
             |    sum(s_minus * (CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE)))
             |      OVER (ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif1,
             |    sum(s_minus * (CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE)))
             |      OVER (ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif2
             |  FROM sm),
             |expect AS MATERIALIZED (SELECT * FROM ex WHERE d1 + d2 > 0),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x
             |      ON e.t = x.t
             |      WHERE e.n_risk <> x.n_risk OR e.d1 <> x.d1 OR e.d2 <> x.d2
             |        OR abs(e.s_minus - x.s_minus) > 1e-9
             |        OR abs(e.cif1 - x.cif1) > 1e-9
             |        OR abs(e.cif2 - x.cif2) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.t NOT IN (SELECT t FROM expect))
             |    AND NOT EXISTS (SELECT 1 FROM expect x
             |      WHERE x.t NOT IN (SELECT t FROM emitted))
             |  ) AS ok)
             |SELECT t, n_risk, d1, d2, s_minus, cif1, cif2 FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY t""".stripMargin)),

    // ---- q319: PERCENT OF PARENT — nation revenue share within its
    // region, region share of the total: the hierarchy-contribution
    // report in exact decimal sums with pinned share divisions and
    // VARCHAR digests — hash-exact.
    Q(
      "q319_percent_of_parent",
      (s, d) => {
        import s.implicits._
        val nat = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_totalprice".isNotNull)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(sum(round($"o_totalprice" * 100).cast("long")
            .cast("decimal(19,0)")).cast("decimal(38,0)").as("cents"))
        val reg = nat.groupBy($"r_name")
          .agg(sum($"cents").cast("decimal(38,0)").as("rcents"))
          .select($"r_name".as("rr"), $"rcents")
        val tot = reg.agg(sum($"rcents").cast("decimal(38,0)").as("tcents"))
        nat.join(broadcast(reg), $"r_name" === $"rr")
          .crossJoin(broadcast(tot))
          .select($"r_name".as("region"), $"n_name".as("nation"),
            $"cents".cast("string").as("revenue_cents"),
            ($"cents".cast("double") / $"rcents".cast("double"))
              .as("share_of_region"),
            ($"rcents".cast("double") / $"tcents".cast("double"))
              .as("region_share_of_total"))
          .orderBy($"region", $"nation")
      },
      Some("""WITH nat AS MATERIALIZED (SELECT r.r_name AS region,
             |    n.n_name AS nation,
             |    CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
             |      AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS cents
             |  FROM orders o
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey
             |  WHERE o.o_custkey IS NOT NULL AND o.o_totalprice IS NOT NULL
             |  GROUP BY 1, 2),
             |reg AS MATERIALIZED (SELECT region,
             |    CAST(sum(cents) AS DECIMAL(38,0)) AS rcents
             |  FROM nat GROUP BY 1),
             |tot AS (SELECT CAST(sum(rcents) AS DECIMAL(38,0)) AS tcents
             |  FROM reg)
             |SELECT nat.region, nat.nation,
             |  CAST(nat.cents AS VARCHAR) AS revenue_cents,
             |  CAST(nat.cents AS DOUBLE) / CAST(reg.rcents AS DOUBLE)
             |    AS share_of_region,
             |  CAST(reg.rcents AS DOUBLE) / CAST(tot.tcents AS DOUBLE)
             |    AS region_share_of_total
             |FROM nat JOIN reg USING (region), tot
             |ORDER BY region, nation""".stripMargin)),

    // ---- q320: MOOD'S MEDIAN TEST — is quantity's location equal
    // across order priorities per line status, classified against the
    // pooled two-crossing median
    // ([[graft.operators.RankStats.moodMedianTest]]): exact integer
    // contingency cells, χ² folded over the ≤5-row group window —
    // hash-exact.
    Q(
      "q320_mood_median",
      (s, d) => {
        import s.implicits._
        val od = Tables.orders(s, d).select(
          $"o_orderkey",
          substring($"o_orderpriority", 1, 1).cast("long").as("g"))
        val per = Tables.lineitem(s, d)
          .join(od, $"l_orderkey" === $"o_orderkey")
        graft.operators.RankStats.moodMedianTest(
          per, $"l_linestatus", $"g", $"l_quantity".cast("long"))
          .orderBy($"k")
      },
      Some("""WITH per AS MATERIALIZED (SELECT l_linestatus AS k,
             |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
             |    CAST(l_quantity AS BIGINT) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |cells AS (SELECT k, v, count(*) AS c FROM per GROUP BY 1, 2),
             |cum AS MATERIALIZED (SELECT k, v,
             |    sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(c) OVER (PARTITION BY k) AS n
             |  FROM cells),
             |med AS MATERIALIZED (SELECT k,
             |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
             |      + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS med2
             |  FROM cum GROUP BY 1),
             |pg AS MATERIALIZED (SELECT per.k, per.g,
             |    CAST(sum(CASE WHEN 2 * per.v > med.med2 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS a,
             |    CAST(sum(CASE WHEN 2 * per.v > med.med2 THEN 0 ELSE 1 END)
             |      AS BIGINT) AS b
             |  FROM per JOIN med ON per.k = med.k
             |  GROUP BY 1, 2),
             |wm AS (SELECT k, g, a, b,
             |    CAST(sum(a) OVER (PARTITION BY k) AS BIGINT) AS bigA,
             |    CAST(sum(b) OVER (PARTITION BY k) AS BIGINT) AS bigB,
             |    a + b AS ng,
             |    CAST(sum(a + b) OVER (PARTITION BY k) AS BIGINT) AS nTot
             |  FROM pg),
             |terms AS (SELECT k, g, bigA, bigB, nTot,
             |    CASE WHEN bigA > 0 AND bigB > 0 THEN
             |      (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE)
             |          * CAST(bigA AS DOUBLE) / CAST(nTot AS DOUBLE))
             |        * (CAST(a AS DOUBLE) - CAST(ng AS DOUBLE)
             |          * CAST(bigA AS DOUBLE) / CAST(nTot AS DOUBLE))
             |        / (CAST(ng AS DOUBLE) * CAST(bigA AS DOUBLE)
             |          / CAST(nTot AS DOUBLE))
             |      + (CAST(b AS DOUBLE) - CAST(ng AS DOUBLE)
             |          * CAST(bigB AS DOUBLE) / CAST(nTot AS DOUBLE))
             |        * (CAST(b AS DOUBLE) - CAST(ng AS DOUBLE)
             |          * CAST(bigB AS DOUBLE) / CAST(nTot AS DOUBLE))
             |        / (CAST(ng AS DOUBLE) * CAST(bigB AS DOUBLE)
             |          / CAST(nTot AS DOUBLE))
             |      ELSE 0.0 END AS t
             |  FROM wm),
             |folded AS (SELECT k, bigA, bigB, nTot,
             |    sum(t) OVER (PARTITION BY k ORDER BY g
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trun,
             |    row_number() OVER (PARTITION BY k ORDER BY g) AS rn,
             |    count(*) OVER (PARTITION BY k) AS gcnt
             |  FROM terms)
             |SELECT k, nTot AS n, CAST(gcnt AS BIGINT) AS n_groups,
             |  bigA AS n_above,
             |  CASE WHEN bigA > 0 AND bigB > 0 THEN trun END AS chi2
             |FROM folded WHERE rn = gcnt ORDER BY k""".stripMargin)),

    // ---- q321: BRIER DECOMPOSITION — reliability / resolution /
    // uncertainty of the q273 group-rate forecaster
    // ([[graft.operators.ModelEval.brierDecomposition]]): exact
    // integer cells + the raw Brier numerator as a decimal digest;
    // REL/RES are pinned-double bin folds, 1e-9 soundness-gated.
    Q(
      "q321_brier_decomposition",
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
        graft.operators.ModelEval.brierDecomposition(
          scored, $"sm", $"y", bins = 16)
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q321_brier_decomposition/*.parquet')),
             |urgent AS (SELECT DISTINCT o_custkey AS uk FROM orders
             |  WHERE o_orderpriority = '1-URGENT'),
             |cust AS MATERIALIZED (SELECT c_mktsegment AS seg,
             |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bb,
             |    u.uk IS NOT NULL AS y
             |  FROM customer LEFT JOIN urgent u ON c_custkey = u.uk),
             |grp AS (SELECT seg, bb,
             |    (CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
             |      * 1000000) // count(*) AS sm
             |  FROM cust GROUP BY 1, 2),
             |scored AS MATERIALIZED (SELECT cust.seg, cust.bb, cust.y, grp.sm
             |  FROM cust JOIN grp USING (seg, bb)),
             |pb AS MATERIALIZED (SELECT
             |    least(15, (sm * 16) // 1000000) AS bin,
             |    count(*) AS n,
             |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             |    CAST(sum(CAST(sm AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS ssum,
             |    CAST(sum(CAST(sm - CASE WHEN y THEN 1000000 ELSE 0 END
             |        AS DECIMAL(19,0))
             |      * CAST(sm - CASE WHEN y THEN 1000000 ELSE 0 END
             |        AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sq
             |  FROM scored GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nT,
             |    CAST(sum(pos) AS BIGINT) AS pT,
             |    CAST(sum(sq) AS DECIMAL(38,0)) AS bT,
             |    count(*) AS bu FROM pb),
             |terms AS (SELECT pb.*,
             |    CAST(ssum - CAST(pos AS DECIMAL(19,0)) * 1000000 AS DOUBLE)
             |      * CAST(ssum - CAST(pos AS DECIMAL(19,0)) * 1000000 AS DOUBLE)
             |      / (CAST(n AS DOUBLE) * 1e12) AS relterm,
             |    (CAST(pos AS DOUBLE) - CAST(n AS DOUBLE)
             |        * CAST(tot.pT AS DOUBLE) / CAST(tot.nT AS DOUBLE))
             |      * (CAST(pos AS DOUBLE) - CAST(n AS DOUBLE)
             |        * CAST(tot.pT AS DOUBLE) / CAST(tot.nT AS DOUBLE))
             |      / CAST(n AS DOUBLE) AS resterm
             |  FROM pb, tot),
             |ex AS (SELECT tot.nT AS n, CAST(tot.bu AS BIGINT) AS bins_used,
             |    CAST(tot.bT AS VARCHAR) AS brier_units,
             |    (SELECT sum(relterm) FROM terms) / CAST(tot.nT AS DOUBLE)
             |      AS rel,
             |    (SELECT sum(resterm) FROM terms) / CAST(tot.nT AS DOUBLE)
             |      AS res,
             |    (CAST(tot.pT AS DOUBLE) / CAST(tot.nT AS DOUBLE))
             |      * (1.0 - CAST(tot.pT AS DOUBLE) / CAST(tot.nT AS DOUBLE))
             |      AS unc
             |  FROM tot),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 1
             |    AND NOT EXISTS (SELECT 1 FROM emitted e, ex x
             |      WHERE e.n <> x.n OR e.bins_used <> x.bins_used
             |        OR e.brier_units <> x.brier_units
             |        OR abs(e.rel - x.rel) > 1e-9
             |        OR abs(e.res - x.res) > 1e-9
             |        OR abs(e.unc - x.unc) > 1e-9)
             |  ) AS ok)
             |SELECT n, bins_used, brier_units, rel, res, unc FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), '-1',
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q322: DIRECTLY STANDARDIZED RATES — each nation's
    // finished-order rate re-weighted to the global priority mix
    // ([[graft.operators.Experiment.standardizedRates]]): exact
    // cells, ≤5 pinned stratum terms per group — hash-exact.
    Q(
      "q322_standardized_rates",
      (s, d) => {
        import s.implicits._
        val per = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_orderstatus".isNotNull &&
            $"o_orderpriority".isNotNull)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)),
            $"c_nationkey" === $"n_nationkey")
          .select($"n_name".as("nat"),
            substring($"o_orderpriority", 1, 1).cast("long").as("prio"),
            ($"o_orderstatus" === "F").as("fin"))
        graft.operators.Experiment.standardizedRates(
          per, $"nat", $"prio", $"fin")
          .orderBy($"g")
      },
      Some("""WITH per AS MATERIALIZED (SELECT n.n_name AS g,
             |    CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS s,
             |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
             |  FROM orders o
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  WHERE o.o_custkey IS NOT NULL AND o.o_orderstatus IS NOT NULL
             |    AND o.o_orderpriority IS NOT NULL),
             |cells AS MATERIALIZED (SELECT g, s, count(*) AS ngs,
             |    CAST(sum(y) AS BIGINT) AS pgs
             |  FROM per GROUP BY 1, 2),
             |mix AS MATERIALIZED (SELECT s,
             |    CAST(count(*) AS DOUBLE)
             |      / (SELECT CAST(count(*) AS DOUBLE) FROM per) AS w
             |  FROM per GROUP BY 1),
             |folded AS (SELECT g,
             |    sum(mix.w * (CAST(pgs AS DOUBLE) / CAST(ngs AS DOUBLE)))
             |      OVER wc AS stdRun,
             |    sum(mix.w) OVER wc AS covRun,
             |    CAST(sum(ngs) OVER wa AS BIGINT) AS n,
             |    CAST(sum(pgs) OVER wa AS BIGINT) AS p,
             |    row_number() OVER (PARTITION BY g ORDER BY cells.s) AS rn,
             |    count(*) OVER wa AS scnt
             |  FROM cells JOIN mix USING (s)
             |  WINDOW wc AS (PARTITION BY g ORDER BY cells.s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wa AS (PARTITION BY g))
             |SELECT g, n, p AS positives,
             |  CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS crude_rate,
             |  stdRun AS std_rate, covRun AS coverage_w
             |FROM folded WHERE rn = scnt ORDER BY g""".stripMargin)),

    // ---- q323: COCHRAN'S Q — do the five priorities differ in
    // "customer finished an order there", per market segment
    // ([[graft.operators.Experiment.cochranQ]]): exact integer
    // block/column totals, one pinned division, digests for the
    // numerator/denominator — hash-exact.
    Q(
      "q323_cochran_q",
      (s, d) => {
        import s.implicits._
        val cells = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_orderpriority".isNotNull &&
            $"o_orderstatus".isNotNull)
          .groupBy($"o_custkey",
            substring($"o_orderpriority", 1, 1).cast("long").as("t"))
          .agg(max(($"o_orderstatus" === "F").cast("long")).as("y"))
        val per = cells.join(
          broadcast(Tables.customer(s, d)
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        graft.operators.Experiment.cochranQ(
          per, $"c_mktsegment", $"o_custkey", $"t", $"y" === 1L)
          .orderBy($"k")
      },
      Some("""WITH cells AS MATERIALIZED (SELECT c.c_mktsegment AS k,
             |    o.o_custkey AS b,
             |    CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS t,
             |    max(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  WHERE o.o_custkey IS NOT NULL AND o.o_orderpriority IS NOT NULL
             |    AND o.o_orderstatus IS NOT NULL
             |  GROUP BY 1, 2, 3),
             |kt AS (SELECT k, count(DISTINCT t) AS kk FROM cells GROUP BY 1),
             |pb AS (SELECT k, b, count(*) AS bt, CAST(sum(y) AS BIGINT) AS r
             |  FROM cells GROUP BY 1, 2),
             |comp AS MATERIALIZED (SELECT pb.k, pb.b, pb.r
             |  FROM pb JOIN kt ON pb.k = kt.k WHERE pb.bt = kt.kk),
             |kept AS MATERIALIZED (SELECT cells.k, cells.b, cells.t, cells.y
             |  FROM cells JOIN comp ON cells.k = comp.k AND cells.b = comp.b),
             |ct AS (SELECT k, t, CAST(sum(y) AS BIGINT) AS cj
             |  FROM kept GROUP BY 1, 2),
             |byk AS (SELECT k, count(*) AS ktr,
             |    CAST(sum(CAST(cj AS HUGEINT)) AS HUGEINT) AS tt,
             |    CAST(sum(CAST(cj AS HUGEINT) * CAST(cj AS HUGEINT))
             |      AS HUGEINT) AS sc2
             |  FROM ct GROUP BY 1),
             |rk AS (SELECT k, count(*) AS nb,
             |    CAST(sum(CAST(r AS HUGEINT) * CAST(r AS HUGEINT)) AS HUGEINT)
             |      AS sr2
             |  FROM comp GROUP BY 1)
             |SELECT byk.k, CAST(rk.nb AS BIGINT) AS n_blocks,
             |  CAST(byk.ktr AS BIGINT) AS k_treatments,
             |  CAST((byk.ktr - 1) * (byk.ktr * byk.sc2 - byk.tt * byk.tt)
             |    AS VARCHAR) AS q_num,
             |  CAST(byk.ktr * byk.tt - rk.sr2 AS VARCHAR) AS q_den,
             |  CASE WHEN byk.ktr * byk.tt - rk.sr2 > 0
             |    THEN CAST((byk.ktr - 1) * (byk.ktr * byk.sc2
             |        - byk.tt * byk.tt) AS DOUBLE)
             |      / CAST(byk.ktr * byk.tt - rk.sr2 AS DOUBLE)
             |    END AS q_stat
             |FROM byk JOIN rk ON byk.k = rk.k ORDER BY byk.k""".stripMargin)))

  /** Continuation Seq 8: readability, optimal sampling design,
    * burstiness.
    */
  val all8: Seq[Q] = Seq(

    // ---- q324: FLESCH READING EASE — per-document readability from
    // computable proxies ([[graft.operators.TextAnalysis.readability]]):
    // exact regex-counted words/sentences/vowel groups, one pinned
    // formula — hash-exact (the replace-then-measure counting is
    // length-convention-proof: only ASCII removals are counted).
    Q(
      "q324_readability",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.readability(
          Tables.documents(s, d).filter($"doc_id".isNotNull),
          $"text", $"doc_id")
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, coalesce(text, '') AS tx
             |  FROM documents WHERE doc_id IS NOT NULL),
             |m AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split_regex(lower(tx), '[^a-z0-9]+'), x -> x <> '')) AS INTEGER) AS words,
             |    regexp_replace(tx, '[.!?]+', '.', 'g') AS sr,
             |    regexp_replace(lower(tx), '[aeiou]+', 'V', 'g') AS vg
             |  FROM t),
             |c AS (SELECT doc_id, words,
             |    greatest(1, CAST(length(sr)
             |      - length(regexp_replace(sr, '\\.', '', 'g')) AS INTEGER))
             |      AS sentences,
             |    CAST(length(vg) - length(regexp_replace(vg, 'V', '', 'g'))
             |      AS INTEGER) AS syllables
             |  FROM m)
             |SELECT doc_id, words, sentences, syllables,
             |  CASE WHEN words > 0 THEN
             |    CAST('206.835' AS DOUBLE)
             |      - CAST('1.015' AS DOUBLE)
             |        * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
             |      - CAST('84.6' AS DOUBLE)
             |        * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
             |    END AS flesch
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- q325: NEYMAN ALLOCATION — a 10000-row sample budget split
    // across brands by N_h·S_h of line price dollars
    // ([[graft.operators.Sampling.neymanAllocation]]): exact decimal
    // moments, the floored weight the identical double in both
    // engines, largest-remainder integerization — hash-exact and
    // Σ alloc = 10000 by construction.
    Q(
      "q325_neyman_allocation",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_partkey".isNotNull && $"l_extendedprice".isNotNull)
          .join(broadcast(Tables.part(s, d)
            .select($"p_partkey", $"p_brand")), $"l_partkey" === $"p_partkey")
        graft.operators.Sampling.neymanAllocation(
          li, $"p_brand", floor($"l_extendedprice").cast("long"),
          total = 10000L)
          .orderBy($"stratum")
      },
      Some("""WITH base AS MATERIALIZED (SELECT p.p_brand AS h,
             |    CAST(floor(l.l_extendedprice) AS BIGINT) AS v
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |  WHERE l.l_partkey IS NOT NULL AND l.l_extendedprice IS NOT NULL),
             |st AS (SELECT h, count(*) AS n,
             |    CAST(sum(CAST(v AS DECIMAL(19,0))) AS DOUBLE) AS s,
             |    CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
             |      AS DOUBLE) AS q
             |  FROM base GROUP BY 1),
             |wt AS MATERIALIZED (SELECT h, n,
             |    CASE WHEN n > 1 AND
             |        (CAST(n AS DOUBLE) * q - s * s)
             |          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0
             |      THEN CAST(floor(CAST(n AS DOUBLE)
             |        * sqrt((CAST(n AS DOUBLE) * q - s * s)
             |          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
             |        AS BIGINT)
             |      ELSE 0 END AS w
             |  FROM st),
             |tw AS (SELECT CAST(sum(w) AS BIGINT) AS gw FROM wt),
             |based AS MATERIALIZED (SELECT h, n, w,
             |    (10000 * w) // (SELECT gw FROM tw) AS base,
             |    (10000 * w) % (SELECT gw FROM tw) AS rem
             |  FROM wt),
             |lo AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS r FROM based),
             |rk AS (SELECT *, row_number()
             |    OVER (ORDER BY rem DESC, h ASC) AS rn
             |  FROM based)
             |SELECT h AS stratum, CAST(n AS BIGINT) AS n_rows, w AS weight,
             |  CAST(base + CASE WHEN rn <= (SELECT r FROM lo) THEN 1 ELSE 0
             |    END AS BIGINT) AS alloc
             |FROM rk ORDER BY stratum""".stripMargin)),

    // ---- q326: FANO FACTOR — burstiness of each event type's daily
    // arrival counts over the dense zero-filled grid
    // ([[graft.operators.TimeSeries.fanoFactor]]): exact integer
    // counts, exact decimal moments, pinned ratio — hash-exact.
    Q(
      "q326_fano_burstiness",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.fanoFactor(
          Tables.events(s, d)
            .filter($"event_type".isNotNull && $"ts".isNotNull),
          $"event_type", $"ts", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
             |      AS BIGINT) AS period,
             |    count(*) AS c
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, min(period) AS p0, max(period) AS p1
             |  FROM o GROUP BY 1),
             |grid AS (SELECT k, unnest(generate_series(p0, p1)) AS period
             |  FROM sp),
             |gv AS (SELECT g.k, coalesce(o.c, 0) AS c
             |  FROM grid g LEFT JOIN o ON g.k = o.k AND g.period = o.period),
             |st AS (SELECT k, count(*) AS n,
             |    CAST(sum(CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS s,
             |    CAST(sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
             |      AS DOUBLE) AS q
             |  FROM gv GROUP BY 1)
             |SELECT k AS key, CAST(n AS BIGINT) AS n_periods,
             |  s / CAST(n AS DOUBLE) AS mean_count,
             |  CASE WHEN n > 1 THEN (CAST(n AS DOUBLE) * q - s * s)
             |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             |    END AS var_count,
             |  CASE WHEN n > 1 AND s / CAST(n AS DOUBLE) > 0
             |    THEN ((CAST(n AS DOUBLE) * q - s * s)
             |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |      / (s / CAST(n AS DOUBLE))
             |    END AS fano
             |FROM st ORDER BY key""".stripMargin)),

    // ---- q327: PAGE'S TREND TEST — does customer spend rise
    // monotonically with priority tier, per segment?
    // ([[graft.operators.RankStats.pageTrend]], q302's ordered
    // alternative): within-block ranks, L = Σ j·R_j exact in decimal,
    // pinned z — hash-exact.
    Q(
      "q327_page_trend",
      (s, d) => {
        import s.implicits._
        val cells = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_orderpriority".isNotNull &&
            $"o_totalprice".isNotNull)
          .groupBy($"o_custkey",
            substring($"o_orderpriority", 1, 1).cast("long").as("t"))
          .agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
        val per = cells.join(
          broadcast(Tables.customer(s, d)
            .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        graft.operators.RankStats.pageTrend(
          per, $"c_mktsegment", $"o_custkey", $"t", $"v").orderBy($"k")
      },
      Some("""WITH cells AS MATERIALIZED (SELECT c.c_mktsegment AS k,
             |    o.o_custkey AS b,
             |    CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS t,
             |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  WHERE o.o_custkey IS NOT NULL AND o.o_orderpriority IS NOT NULL
             |    AND o.o_totalprice IS NOT NULL
             |  GROUP BY 1, 2, 3),
             |kt AS (SELECT k, count(DISTINCT t) AS kk FROM cells GROUP BY 1),
             |pb AS (SELECT k, b, count(*) AS bt FROM cells GROUP BY 1, 2),
             |comp AS MATERIALIZED (SELECT pb.k, pb.b
             |  FROM pb JOIN kt ON pb.k = kt.k WHERE pb.bt = kt.kk),
             |kept AS MATERIALIZED (SELECT cells.k, cells.b, cells.t, cells.v
             |  FROM cells JOIN comp ON cells.k = comp.k AND cells.b = comp.b),
             |ranked AS MATERIALIZED (SELECT k, b, t,
             |    2 * rank() OVER (PARTITION BY k, b ORDER BY v ASC)
             |      + count(*) OVER (PARTITION BY k, b, v) - 1 AS mr2
             |  FROM kept),
             |byk AS (SELECT k,
             |    CAST(sum(CAST(t AS DECIMAL(6,0)) * CAST(mr2 AS DECIMAL(18,0)))
             |      AS DECIMAL(38,0)) AS l2,
             |    count(DISTINCT t) AS ktr
             |  FROM ranked GROUP BY 1),
             |bc AS (SELECT k, count(*) AS nb FROM comp GROUP BY 1)
             |SELECT byk.k, CAST(bc.nb AS BIGINT) AS n_blocks,
             |  CAST(byk.ktr AS BIGINT) AS k_treatments,
             |  CAST(l2 AS DOUBLE) / 2.0 AS l_stat,
             |  CASE WHEN byk.ktr >= 2 AND bc.nb >= 1
             |      AND CAST(bc.nb AS DOUBLE) * CAST(byk.ktr AS DOUBLE)
             |        * CAST(byk.ktr AS DOUBLE) * (CAST(byk.ktr AS DOUBLE) + 1.0)
             |        * (CAST(byk.ktr AS DOUBLE) * CAST(byk.ktr AS DOUBLE) - 1.0)
             |        / 144.0 > 0
             |    THEN (CAST(l2 AS DOUBLE) / 2.0
             |        - CAST(bc.nb AS DOUBLE) * CAST(byk.ktr AS DOUBLE)
             |          * (CAST(byk.ktr AS DOUBLE) + 1.0)
             |          * (CAST(byk.ktr AS DOUBLE) + 1.0) / 4.0)
             |      / sqrt(CAST(bc.nb AS DOUBLE) * CAST(byk.ktr AS DOUBLE)
             |        * CAST(byk.ktr AS DOUBLE) * (CAST(byk.ktr AS DOUBLE) + 1.0)
             |        * (CAST(byk.ktr AS DOUBLE) * CAST(byk.ktr AS DOUBLE) - 1.0)
             |        / 144.0)
             |    END AS z
             |FROM byk JOIN bc ON byk.k = bc.k ORDER BY byk.k""".stripMargin)),

    // ---- q328: SHANNON DIVERSITY — each language's effective source
    // count ([[graft.operators.Profiling.shannonDiversity]]): exact
    // cells; H and exp(H) are ln-based, so 1e-9 soundness-gated with
    // a poison row (the q303 discipline).
    Q(
      "q328_shannon_diversity",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.shannonDiversity(
          Tables.documents(s, d), $"lang", $"source")
          .orderBy($"g")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q328_shannon_diversity/*.parquet')),
             |cells AS MATERIALIZED (SELECT lang AS g, source AS c,
             |    count(*) AS nc
             |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
             |  GROUP BY 1, 2),
             |tot AS (SELECT g, CAST(sum(nc) AS BIGINT) AS n,
             |    count(*) AS ncat FROM cells GROUP BY 1),
             |ex AS MATERIALIZED (SELECT cells.g, tot.n,
             |    CAST(tot.ncat AS BIGINT) AS n_categories,
             |    sum(-(CAST(nc AS DOUBLE) / CAST(tot.n AS DOUBLE))
             |      * ln(CAST(nc AS DOUBLE) / CAST(tot.n AS DOUBLE))) AS h
             |  FROM cells JOIN tot ON cells.g = tot.g
             |  GROUP BY 1, 2, 3),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM ex)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN ex x ON e.g = x.g
             |      WHERE e.n <> x.n OR e.n_categories <> x.n_categories
             |        OR abs(e.shannon - x.h) > 1e-9
             |        OR abs(e.effective_categories - exp(x.h)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.g NOT IN (SELECT g FROM ex))
             |    AND NOT EXISTS (SELECT 1 FROM ex x
             |      WHERE x.g NOT IN (SELECT g FROM emitted))
             |  ) AS ok)
             |SELECT g, n, n_categories, shannon, effective_categories
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY g""".stripMargin)),

    // ---- q329: WILSON SCORE INTERVALS — each nation's urgent-order
    // rate with the well-behaved binomial CI
    // ([[graft.operators.Experiment.wilsonInterval]]): exact counts,
    // one pinned closed-form chain per group — hash-exact.
    Q(
      "q329_wilson_ci",
      (s, d) => {
        import s.implicits._
        val per = Tables.orders(s, d)
          .filter($"o_custkey".isNotNull && $"o_orderpriority".isNotNull)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)),
            $"c_nationkey" === $"n_nationkey")
          .select($"n_name".as("nat"),
            ($"o_orderpriority" === "1-URGENT").as("u"))
        graft.operators.Experiment.wilsonInterval(per, $"nat", $"u")
          .orderBy($"g")
      },
      Some("""WITH per AS MATERIALIZED (SELECT n.n_name AS g,
             |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             |      AS y
             |  FROM orders o
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  WHERE o.o_custkey IS NOT NULL AND o.o_orderpriority IS NOT NULL),
             |st AS (SELECT g, count(*) AS n, CAST(sum(y) AS BIGINT) AS p
             |  FROM per GROUP BY 1)
             |SELECT g, n, p AS positives,
             |  CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
             |  ((CAST(p AS DOUBLE) / CAST(n AS DOUBLE)
             |      + CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE)
             |        / (2.0 * CAST(n AS DOUBLE)))
             |    - CAST('1.96' AS DOUBLE)
             |      * sqrt((CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
             |          * (1.0 - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
             |          / CAST(n AS DOUBLE)
             |        + CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE)
             |          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             |    / (1.0 + CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE)
             |      / CAST(n AS DOUBLE)) AS ci_low,
             |  ((CAST(p AS DOUBLE) / CAST(n AS DOUBLE)
             |      + CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE)
             |        / (2.0 * CAST(n AS DOUBLE)))
             |    + CAST('1.96' AS DOUBLE)
             |      * sqrt((CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
             |          * (1.0 - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
             |          / CAST(n AS DOUBLE)
             |        + CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE)
             |          / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             |    / (1.0 + CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE)
             |      / CAST(n AS DOUBLE)) AS ci_high
             |FROM st ORDER BY g""".stripMargin)),

    // ---- q330: LIFO LOT MATCHING — q241's cost-basis ledger under
    // the newest-first convention
    // ([[graft.operators.Fifo.matchLotsLifo]]): the identical
    // cumulative-quantity geometry with the buy order reversed —
    // exact int64/decimal money, hash-exact digests.
    Q(
      "q330_lifo_matching",
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
        graft.operators.Fifo.matchLotsLifo(
          buys, sells,
          buyKey = $"l_partkey", buyTs = $"sd", buyTiebreak = $"tb",
          buyQty = $"qv", buyUnitCost = $"uc",
          sellKey = $"l_partkey", sellQty = $"qv")
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
             |    coalesce(sum(q) OVER (PARTITION BY b.k
             |      ORDER BY ts DESC, tb DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cumBefore,
             |    coalesce(s.sold, 0) AS soldT
             |  FROM b LEFT JOIN s ON b.k = s.k),
             |m AS (SELECT k, q, c, soldT,
             |    greatest(0, least(q, soldT - cumBefore)) AS matched FROM lots),
             |pk AS (SELECT k, sum(q) AS bought_qty, max(soldT) AS sold_qty,
             |    sum(matched) AS matched_qty, sum(matched * c) AS cogs,
             |    sum(q - matched) AS remaining_qty,
             |    sum((q - matched) * c) AS remaining_cost
             |  FROM m GROUP BY k),
             |so AS (SELECT s.k, CAST(0 AS BIGINT) AS bought_qty,
             |    s.sold AS sold_qty,
             |    CAST(0 AS BIGINT) AS matched_qty, CAST(0 AS BIGINT) AS cogs,
             |    CAST(0 AS BIGINT) AS remaining_qty,
             |    CAST(0 AS BIGINT) AS remaining_cost
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
             |  CAST(greatest(0, sold_qty - bought_qty) AS BIGINT)
             |    AS unmatched_sold
             |FROM al ORDER BY key""".stripMargin)),

    // ---- q331: INFORMATION-GAIN FEATURE SCREEN — q308's features
    // ranked by the entropy criterion
    // ([[graft.operators.Profiling.infoGainScreen]], the ln sibling
    // q275's scaladoc promises): exact cells; gains 1e-9
    // soundness-gated with a poison row.
    Q(
      "q331_info_gain",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_returnflag".isNotNull && $"l_quantity".isNotNull &&
            $"l_extendedprice".isNotNull && $"l_discount".isNotNull)
          .withColumn("y", ($"l_returnflag" === "R").cast("long"))
        val stacked = li.select(explode(array(
          struct(lit("quantity").as("ft"),
            $"l_quantity".cast("long").as("v")),
          struct(lit("price_10k").as("ft"),
            floor($"l_extendedprice" / 10000).cast("long").as("v")),
          struct(lit("disc_pct").as("ft"),
            round($"l_discount" * 100).cast("long").as("v")))).as("c"),
          $"y")
          .select($"c.ft".as("ft"), $"c.v".as("v"), $"y")
        graft.operators.Profiling.infoGainScreen(
          stacked, $"ft", $"v", $"y")
          .orderBy($"feature")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q331_info_gain/*.parquet')),
             |li AS MATERIALIZED (SELECT l_quantity, l_extendedprice,
             |    l_discount,
             |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
             |  FROM lineitem
             |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
             |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
             |base AS MATERIALIZED (
             |  SELECT 'quantity' AS ft,
             |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS v, y FROM li
             |  UNION ALL
             |  SELECT 'price_10k',
             |    CAST(CAST(floor(l_extendedprice / 10000) AS BIGINT)
             |      AS VARCHAR), y FROM li
             |  UNION ALL
             |  SELECT 'disc_pct',
             |    CAST(CAST(round(l_discount * 100) AS BIGINT) AS VARCHAR), y
             |    FROM li),
             |cells AS (SELECT ft, v, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
             |  FROM base GROUP BY 1, 2),
             |tot AS (SELECT ft, CAST(sum(c) AS BIGINT) AS n,
             |    CAST(sum(p) AS BIGINT) AS pt, count(*) AS nv
             |  FROM cells GROUP BY 1),
             |hr AS (SELECT ft, n, pt, nv,
             |    -(CASE WHEN pt > 0 THEN (CAST(pt AS DOUBLE) / CAST(n AS DOUBLE))
             |        * ln(CAST(pt AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END
             |      + CASE WHEN n - pt > 0
             |        THEN (CAST(n - pt AS DOUBLE) / CAST(n AS DOUBLE))
             |          * ln(CAST(n - pt AS DOUBLE) / CAST(n AS DOUBLE))
             |        ELSE 0.0 END) AS h_root
             |  FROM tot),
             |hw AS (SELECT cells.ft,
             |    sum((CAST(c AS DOUBLE) / CAST(hr.n AS DOUBLE)) *
             |      (-(CASE WHEN p > 0 THEN (CAST(p AS DOUBLE) / CAST(c AS DOUBLE))
             |          * ln(CAST(p AS DOUBLE) / CAST(c AS DOUBLE)) ELSE 0.0 END
             |        + CASE WHEN c - p > 0
             |          THEN (CAST(c - p AS DOUBLE) / CAST(c AS DOUBLE))
             |            * ln(CAST(c - p AS DOUBLE) / CAST(c AS DOUBLE))
             |          ELSE 0.0 END))) AS h_w
             |  FROM cells JOIN hr ON cells.ft = hr.ft GROUP BY 1),
             |ex AS MATERIALIZED (SELECT hr.ft,
             |    CAST(hr.nv AS BIGINT) AS n_values, hr.h_root, hw.h_w
             |  FROM hr JOIN hw ON hr.ft = hw.ft),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM ex)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN ex x
             |      ON e.feature = x.ft
             |      WHERE e.n_values <> x.n_values
             |        OR abs(e.entropy_root - x.h_root) > 1e-9
             |        OR abs(e.entropy_weighted - x.h_w) > 1e-9
             |        OR abs(e.info_gain - (x.h_root - x.h_w)) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE e.feature NOT IN (SELECT ft FROM ex))
             |    AND NOT EXISTS (SELECT 1 FROM ex x
             |      WHERE x.ft NOT IN (SELECT feature FROM emitted))
             |  ) AS ok)
             |SELECT feature, n_values, entropy_root, entropy_weighted,
             |  info_gain
             |FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY feature""".stripMargin)),

    // ---- q332: SEASONAL MANN–KENDALL — monotone value trend per
    // event type with the weekly rhythm removed (pairs compare only
    // within the same weekday;
    // [[graft.operators.TimeSeries.seasonalMannKendall]]): exact
    // integer S and variance numerator, pinned z — hash-exact.
    Q(
      "q332_seasonal_mann_kendall",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.seasonalMannKendall(
          Tables.events(s, d)
            .filter($"event_type".isNotNull && $"ts".isNotNull &&
              $"value".isNotNull),
          $"event_type", $"ts", $"value",
          periodSeconds = 86400L, seasonPeriods = 7)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
             |      AS BIGINT) AS period,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
             |    AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |oo AS MATERIALIZED (SELECT k, period, y, period % 7 AS sea
             |  FROM o),
             |sp AS (SELECT k, count(*) AS n FROM oo GROUP BY 1),
             |ss AS (SELECT a.k,
             |    CAST(sum(CASE WHEN b.y > a.y THEN 1
             |      WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
             |  FROM oo a JOIN oo b ON a.k = b.k AND a.sea = b.sea
             |    AND a.period < b.period
             |  GROUP BY 1),
             |ps AS (SELECT k, sea, count(*) AS ns FROM oo GROUP BY 1, 2),
             |tc AS (SELECT k, sea,
             |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS ties
             |  FROM (SELECT k, sea, y, count(*) AS t FROM oo GROUP BY 1, 2, 3)
             |  GROUP BY 1, 2),
             |vn AS (SELECT ps.k,
             |    CAST(sum(ns * (ns - 1) * (2 * ns + 5) - ties) AS BIGINT)
             |      AS vnum
             |  FROM ps JOIN tc ON ps.k = tc.k AND ps.sea = tc.sea
             |  GROUP BY 1)
             |SELECT sp.k AS key, CAST(sp.n AS BIGINT) AS n_periods,
             |  coalesce(ss.s_stat, 0) AS s_stat,
             |  CASE WHEN sp.n >= 2
             |      AND CAST(coalesce(vn.vnum, 0) AS DOUBLE) / 18.0 > 0 THEN
             |    CASE WHEN coalesce(ss.s_stat, 0) > 0
             |      THEN (CAST(ss.s_stat AS DOUBLE) - 1.0)
             |        / sqrt(CAST(vn.vnum AS DOUBLE) / 18.0)
             |    WHEN coalesce(ss.s_stat, 0) < 0
             |      THEN (CAST(ss.s_stat AS DOUBLE) + 1.0)
             |        / sqrt(CAST(vn.vnum AS DOUBLE) / 18.0)
             |    ELSE 0.0 END
             |    END AS z
             |FROM sp LEFT JOIN ss ON sp.k = ss.k
             |LEFT JOIN vn ON sp.k = vn.k
             |ORDER BY key""".stripMargin)))

  /** q306 drive: the q243 out-of-order scaffold (three scrambled
    * slices with hash-chosen one-batch-late bands + flush sentinel,
    * `maxFilesPerTrigger = 1`) through [[graft.streaming.HighWater]];
    * requires ≥ 4 data micro-batches and exactly one scalar state row
    * per key (buffers drained) at end of stream.
    */
  private def streamingHighWater(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q306_hwm_ooo")
    try {
      val ev = Tables.events(s, d)
        .filter($"event_type".isNotNull && $"ts".isNotNull &&
          $"value".isNotNull && $"event_id".isNotNull)
        .select($"event_type".as("key"), $"ts", $"event_id",
          round($"value" * 100).cast("long").as("price_cents"))
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
        lit(0L).as("price_cents"))
      val inDir = ScaleOps2.stageOrderedFiles(scratch, Seq(
        (ev.filter($"ts" < c1 && !late1), "00_a"),
        (ev.filter(($"ts" >= c1 && $"ts" < c2 && !late2) || late1), "01_b"),
        (ev.filter($"ts" >= c2 || late2), "02_c"),
        (sentinel, "03_flush")))
      val schema = s.read.parquet(inDir.toString).schema
      val name = "q306_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.HighWater.detectEventTime(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .as[graft.streaming.HighWater.HwEv],
        delay = "2 days")
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q306 stream did not terminate within 600s — refusing a partial alert set")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 4,
          s"q306 ran $dataBatches data micro-batch(es); the out-of-order point " +
            "needs all 3 scrambled slices + the flush sentinel as separate batches")
        val stateRows = q.recentProgress.lastOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        require(stateRows.contains(nKeys + 1L),
          s"q306 expected one scalar state row per key (${nKeys + 1}), got $stateRows")
        s.table(name)
          .filter($"key" =!= "__flush__")
          .select($"key", $"alert_us", $"event_id", $"price_cents",
            $"prev_max_cents")
          .orderBy($"key", $"alert_us", $"event_id")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q294 drive: two time-sliced parquet files + a far-future
    * sentinel staged into one directory, consumed with
    * `maxFilesPerTrigger = 1` (≥ 2 real micro-batches enforced) by a
    * watermarked tumbling-day aggregation in append mode; the
    * sentinel advances the watermark past every real window end so
    * append mode flushes them, then filters itself out.
    */
  private def streamingOhlc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q294_ohlc")
    try {
      val ev = Tables.events(s, d)
        .filter($"event_type".isNotNull && $"ts".isNotNull &&
          $"value".isNotNull)
        .select($"event_type", $"ts".cast("timestamp").as("ts"),
          round($"value" * 100).cast("long").as("price"))
      val bounds = ev.agg(min($"ts"), max($"ts")).head()
      val (minTs, maxTs) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
      val cut = new java.sql.Timestamp((minTs.getTime + maxTs.getTime) / 2)
      val sentinelTs = new java.sql.Timestamp(
        maxTs.getTime + 3L * 86400000L)
      val inDir = scratch.resolve("input")
      java.nio.file.Files.createDirectories(inDir)
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = scratch.resolve(s"tmp_$name")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp)
        val src = try part.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow()
        finally part.close()
        val dst = inDir.resolve(s"$name.parquet")
        java.nio.file.Files.move(src, dst)
        java.nio.file.Files.setLastModifiedTime(
          dst, java.nio.file.attribute.FileTime.fromMillis(mtime)): Unit
      }
      val t0 = System.currentTimeMillis() - 60000L
      stage(ev.filter($"ts" <= cut), "00_early", t0)
      stage(ev.filter($"ts" > cut), "01_late", t0 + 5000L)
      stage(Seq(("__sentinel__", sentinelTs, 0L))
        .toDF("event_type", "ts", "price"), "02_sentinel", t0 + 10000L)
      val schema = s.read.parquet(inDir.toString).schema
      val input = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      val bars = input
        .withWatermark("ts", "1 hour")
        .withColumn("us", unix_micros($"ts"))
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          min(struct($"us", $"price")).getField("price").as("open"),
          max($"price").as("high"),
          min($"price").as("low"),
          max(struct($"us", $"price")).getField("price").as("close"))
      val name = "q294_ohlc_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = bars.writeStream.outputMode("append")
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q294 stream did not terminate within 600s — refusing a partial result")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 2,
          s"q294 ran $dataBatches data micro-batch(es); the cross-batch " +
            "state path needs at least 2")
        s.table(name)
          .filter($"event_type" =!= "__sentinel__")
          .select($"event_type",
            (unix_micros($"window.start") / 1000000L).cast("long").as("bucket_start_s"),
            $"n_events", $"open", $"high", $"low", $"close")
          .orderBy($"event_type", $"bucket_start_s")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** The q162-family part co-purchase edge list: parts sharing an
    * order (lines above `minPrice` only), canonical (a < b).
    */
  private def copurchaseEdges(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      minPrice: Double = 0.0): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // materialized hash-partitioned by order id: Spark does not reuse
    // exchanges across the self-join's `.as` aliases (each side would
    // re-scan + re-shuffle the distinct), while the partitioned
    // checkpoint makes the pair join plan with zero exchanges
    val it = Tables.lineitem(s, d)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull &&
        $"l_extendedprice" > minPrice)
      .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
      .distinct()
      .localCheckpoint(true)
    it.as("l").join(it.as("r"),
      col("l.o") === col("r.o") && col("l.p") < col("r.p"))
      .select(col("l.p").as("src"), col("r.p").as("dst"))
  }

  private def sqlCopurchase(minPrice: String = "0"): String =
    s"""it AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |  FROM lineitem
       |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
       |    AND l_extendedprice > $minPrice),
       |canon AS MATERIALIZED (
       |  SELECT DISTINCT l.p AS a, r.p AS b
       |  FROM it l JOIN it r ON l.o = r.o AND l.p < r.p)""".stripMargin

  /** The q286 oracle: `rounds` unrolled peeling rounds over the
    * high-value co-purchase graph, then the converged supports.
    * Peeling is monotone, so rounds past the fixpoint are no-ops;
    * the Spark side raises if it needs more than `rounds`.
    */
  private def sqlKtruss(rounds: Int, minSup: Int): String = {
    val head = s"""WITH ${sqlCopurchase(minPrice = "50000")},
                  |r0 AS MATERIALIZED (SELECT a, b FROM canon)""".stripMargin
    val body = (1 to rounds).map { i =>
      s"""t$i AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM r${i - 1} e1
         |  JOIN r${i - 1} e2 ON e2.a = e1.b
         |  JOIN r${i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
         |r$i AS MATERIALIZED (SELECT a, b FROM (
         |    SELECT a, b, count(*) AS sup FROM (
         |      SELECT x AS a, y AS b FROM t$i
         |      UNION ALL SELECT x, z FROM t$i
         |      UNION ALL SELECT y, z FROM t$i)
         |    GROUP BY 1, 2)
         |  WHERE sup >= $minSup)""".stripMargin
    }.mkString(",\n")
    val fin = s"""tf AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                 |  FROM r$rounds e1
                 |  JOIN r$rounds e2 ON e2.a = e1.b
                 |  JOIN r$rounds e3 ON e3.a = e1.a AND e3.b = e2.b)
                 |SELECT a, b, support FROM (
                 |  SELECT a, b, count(*) AS support FROM (
                 |    SELECT x AS a, y AS b FROM tf
                 |    UNION ALL SELECT x, z FROM tf
                 |    UNION ALL SELECT y, z FROM tf)
                 |  GROUP BY 1, 2)
                 |WHERE support >= $minSup""".stripMargin
    s"$head,\n$body,\n$fin"
  }
}

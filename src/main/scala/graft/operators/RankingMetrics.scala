package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-query ranked-retrieval quality metrics — the evaluation loop of
  * every search / recommendation / RAG-retrieval pipeline: given each
  * query's scored candidate list and graded relevance labels, compute
  * DCG@k / NDCG@k (Järvelin & Kekäläinen 2002), average precision, and
  * reciprocal rank. MAP / mean-NDCG / MRR are one further `avg` over
  * the per-query rows, which stay exposed so error analysis can sort
  * by them.
  *
  * Scale shape: every window here is PARTITIONED BY QUERY — a task
  * owns one query's candidate list (bounded: a retrieval list is 10s
  * to 1000s of rows), and parallelism comes from the millions of
  * queries. Nothing global is sorted; no reducer ever owns more than
  * one query's list. This is the opposite geometry from
  * [[RankStats]]' bucketed global midranks, and the right one when
  * the rank axis is per-group and bounded.
  *
  * Determinism: the ranking order is pinned (score DESC, item ASC) so
  * ties cannot flap between engines; position-discount sums
  * accumulate through an ORDERED running window (sequential
  * per-partition fold, left-to-right in rank order). Discounts use
  * `log2` doubles, so oracles should re-derive with the same pinned
  * order and gate at 1e-9 rather than hash-match the floats.
  *
  * Contract: `rel` must be a non-null integer in [0, 30] (2^rel − 1
  * gains stay exact in a double; raises beyond — a relevance GRADE
  * outside that range is a label bug, not data). `score` must be
  * non-null and finite. Item ids must be distinct within a query
  * (the tie-break needs a total order; duplicate ids raise).
  */
object RankingMetrics {

  /** Per-query metrics: (query, n_items, n_rel, dcg_k, ndcg_k, ap,
    * rr). `ap` (binary hit = rel > 0) and `rr` are over the FULL
    * list; `dcg_k`/`ndcg_k` honor the cutoff (ideal DCG@k from the
    * relevance-sorted order). Queries with no relevant item emit
    * null ndcg_k/ap/rr.
    */
  def rankingMetrics(
      df: DataFrame,
      query: Column,
      item: Column,
      score: Column,
      rel: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"rankingMetrics: k must be >= 1, got $k")
    val sD = score.cast("double")
    val sG = when(sD.isNull || isnan(sD) || sD === Double.PositiveInfinity ||
      sD === Double.NegativeInfinity, raise_error(lit(
      "rankingMetrics: score must be non-null and finite"))).otherwise(sD)
    val rL = rel.cast("long")
    val rG = when(rL.isNull || rL < 0L || rL > 30L, raise_error(lit(
      "rankingMetrics: rel must be an integer in [0, 30]"))).otherwise(rL)
    val base = df.select(query.as("q"), item.as("i"), sG.as("s"), rG.as("r"))
    val wRank = Window.partitionBy(col("q"))
      .orderBy(col("s").desc, col("i").asc)
    val wIdeal = Window.partitionBy(col("q"))
      .orderBy(col("r").desc, col("i").asc)
    // duplicate item ids would make the pinned tie-break ambiguous —
    // the guard rides INSIDE pos (a column every downstream term
    // consumes); a standalone guard column would be pruned unevaluated
    val ranked = base
      .withColumn("pos", when(
        count(lit(1)).over(Window.partitionBy(col("q"), col("i"))) > 1L,
        raise_error(lit("rankingMetrics: duplicate item id within a query"))
          .cast("int"))
        .otherwise(row_number().over(wRank)))
      .withColumn("ipos", row_number().over(wIdeal))
    // gain 2^r − 1 is exact in a double for r ≤ 30
    val gn = (expr("shiftleft(cast(1 as bigint), cast(r as int))") - 1L)
      .cast("double")
    val wCum = Window.partitionBy(col("q")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCumI = Window.partitionBy(col("q")).orderBy(col("ipos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ordered running folds: sequential left-to-right in rank order,
    // so the double sums have ONE pinned evaluation order. Built in
    // stages — hits_cum must exist before the precision terms use it
    // (window functions cannot nest).
    val folded = ranked
      .withColumn("dcg_cum",
        sum(when(col("pos") <= k, gn / log2(col("pos") + 1))
          .otherwise(lit(0.0))).over(wCum))
      .withColumn("idcg_cum",
        sum(when(col("ipos") <= k, gn / log2(col("ipos") + 1))
          .otherwise(lit(0.0))).over(wCumI))
      .withColumn("hits_cum",
        sum(when(col("r") > 0L, 1L).otherwise(0L)).over(wCum))
      .withColumn("prec_cum",
        sum(when(col("r") > 0L,
          col("hits_cum").cast("double") / col("pos").cast("double"))
          .otherwise(lit(0.0))).over(wCum))
    folded.groupBy(col("q")).agg(
      count(lit(1)).as("n_items"),
      sum(when(col("r") > 0L, 1L).otherwise(0L)).as("n_rel"),
      max(struct(col("pos"), col("dcg_cum"))).getField("dcg_cum").as("dcg_k"),
      max(struct(col("ipos"), col("idcg_cum"))).getField("idcg_cum")
        .as("idcg_k"),
      max(struct(col("pos"), col("prec_cum"))).getField("prec_cum").as("psum"),
      min(when(col("r") > 0L, col("pos"))).as("fh"))
      .select(
        col("q"), col("n_items"), col("n_rel"), col("dcg_k"),
        when(col("idcg_k") > 0.0, col("dcg_k") / col("idcg_k"))
          .otherwise(lit(null).cast("double")).as("ndcg_k"),
        when(col("n_rel") > 0L, col("psum") / col("n_rel").cast("double"))
          .otherwise(lit(null).cast("double")).as("ap"),
        when(col("fh").isNotNull, lit(1.0) / col("fh").cast("double"))
          .otherwise(lit(null).cast("double")).as("rr"))
  }
}

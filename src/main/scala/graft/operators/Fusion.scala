package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * combine several rankings of the same item space into one consensus
  * ranking by summing `1 / (k + rank)` across the lists each item
  * appears in. The standard ensemble step for hybrid retrieval
  * (lexical ⊕ vector) and for multi-query retrieval (RAG-style query
  * reformulations fused into one candidate list) — rank-based, so it
  * needs no score calibration between heterogeneous rankers.
  *
  * Scale shape: one partial-aggregable groupBy over the (list, item,
  * rank) tuples — input volume is Σ top-k of the fused lists (bounded
  * by construction), never a corpus. The fold over each item's ranks
  * runs in ASCENDING rank order from a sorted collect_list, making the
  * double sum bit-deterministic under any partitioning (`0.0 + x = x`
  * exactly, so a seeded fold over the sorted list equals any pairwise
  * left fold an oracle replays) — RRF scores are exact divisions of
  * small integers, so a DuckDB oracle hash-matches them bit-for-bit.
  */
object Fusion {

  /** @param ranked  one row per (list, item) with the item's 1-based
    *                rank in that list
    * @param list    ranking-list identifier column
    * @param item    item identifier column (non-null integral)
    * @param rank    1-based rank within the list (non-null integral)
    * @param kRrf    the RRF smoothing constant (60 in the paper)
    * @return (item_id, n_lists, rrf_score) — every item that appeared
    *         in at least one list, with its fused score
    */
  def rrf(
      ranked: DataFrame,
      list: Column,
      item: Column,
      rank: Column,
      kRrf: Int = 60): DataFrame = {
    require(kRrf >= 1, s"RRF constant must be >= 1, got $kRrf")
    val guardedItem = when(item.cast("long").isNull, raise_error(lit(
      "Fusion.rrf: item is null or not castable to long"))).otherwise(item.cast("long"))
    val guardedRank = when(rank.cast("long").isNull || rank.cast("long") < 1,
      raise_error(lit("Fusion.rrf: rank must be a 1-based positive integer")))
      .otherwise(rank.cast("long"))
    // (list, item) duplicates would double-count a list's vote —
    // collapse to the BEST (minimum) rank per (list, item): a
    // dropDuplicates here would keep an arbitrary survivor and make
    // the fused score partition-dependent when upstream feeds
    // conflicting ranks. The collapse runs over the bounded fused
    // input, not a corpus.
    ranked
      .select(list.as("l"), guardedItem.as("item_id"), guardedRank.as("r"))
      .groupBy("l", "item_id").agg(min(col("r")).as("r"))
      .groupBy("item_id")
      .agg(
        count(lit(1)).as("n_lists"),
        sort_array(collect_list(col("r"))).as("rs"))
      .select(
        col("item_id"),
        col("n_lists"),
        aggregate(col("rs"), lit(0.0),
          (acc, r) => acc + lit(1.0) / (lit(kRrf.toDouble) + r.cast("double")))
          .as("rrf_score"))
  }
}

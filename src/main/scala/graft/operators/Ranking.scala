package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped top-k as a FIRST-CLASS operator — "the k best items per
  * group" (top spenders per nation, hottest parts per supplier) with
  * the bounded-heap plan the ANN stack already proved out
  * ([[TopKByScore]]): map-side partial top-k heaps reduce every
  * partition to ≤ k rows per group BEFORE the shuffle, so ranking n
  * rows moves O(k · partitions) rows — the `row_number().over(...)`
  * formulation this replaces shuffles and sorts the ENTIRE input
  * through the window operator, which is exactly the plan that dies
  * first at 100 TB. Ordering is (score desc, id asc) — ties are
  * deterministic, NaN ranks worst, and ranks are dense 1..k.
  */
object Ranking {

  def topNPerGroup(
      df: DataFrame,
      group: Column,
      id: Column,
      score: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tk = udaf(new TopKByScore(k))
    df.select(
        group.as("group"),
        when(id.cast("long").isNull, raise_error(lit(
          "topNPerGroup: id must be non-null and long-castable")))
          .otherwise(id.cast("long")).as("__id"),
        when(score.cast("double").isNull, raise_error(lit(
          "topNPerGroup: score must be non-null and double-castable")))
          .otherwise(score.cast("double")).as("__s"))
      .groupBy(col("group"))
      .agg(tk(col("__s"), col("__id")).as("__topk"))
      .select(col("group"), posexplode(col("__topk.items")).as(Seq("__p", "__e")))
      .select(
        col("group"), (col("__p") + 1).cast("int").as("rank"),
        col("__e._2").as("id"), col("__e._1").as("score"))
  }
}

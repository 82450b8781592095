package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's runtime skew-join split handles
  * most cases (enabled in this engine's sessions); these are the
  * explicit tools for the plans AQE can't rewrite — a hot GROUP BY key
  * or a broadcast-ineligible join with a known-skewed build side.
  * Salting only redistributes work: results are identical to the
  * unsalted plan (asserted in SkewSpec).
  */
object Skew {

  /** Salt from the ROW CONTENT, not rand(): rand's output depends on
    * row order within a partition, so a fetch-failure recompute or
    * speculative rerun could re-salt rows differently than the outputs
    * already fetched — double-counting some rows and dropping others
    * (the SPARK-23207 class of bugs). A content hash reruns
    * identically. Rows that are fully identical share a salt; salting
    * still spreads any realistically skewed key.
    */
  private def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)).cast("int")

  /** Two-phase aggregation for skewed grouping keys: partial aggregate
    * over (keys, salt) — spreading each hot key over `salts` reducers —
    * then final combine over keys. Supply MERGEABLE partial aggregates
    * (sum/count/min/max; avg must be decomposed by the caller).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows are scattered
    * over `salts` buckets, the (small, but not broadcastable) right side
    * is replicated across every bucket, and the join runs on
    * (key, bucket) — each hot key now occupies `salts` reducers instead
    * of one. Row-identical to `left.join(right, keys, joinType)` for
    * inner/left joins.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    // right/full joins would emit `salts` null-extended copies of every
    // unmatched replicated right row — refuse instead of corrupting
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got '$joinType'")
    val l = left.withColumn("__salt", saltCol(left, salts))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}

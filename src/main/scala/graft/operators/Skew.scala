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

  private def saltCol(salts: Int): Column =
    (rand(42) * salts).cast("int")

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
      .withColumn("__salt", saltCol(salts))
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
    val l = left.withColumn("__salt", saltCol(salts))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}

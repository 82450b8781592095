package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT per-group WEIGHTED quantiles — "the median price weighted by
  * volume", the inventory/market-share statistic plain quantiles
  * misstate. The q-th weighted quantile is the smallest value v whose
  * cumulative weight reaches q of the group's total: selection over
  * the VALUE axis, so the answer is an existing value and hash-exact.
  *
  * `q = num/den` stays a RATIONAL through the whole computation: the
  * crossing test is `den·cumW ≥ num·totW` in decimal — no division,
  * no float threshold, no cross-engine rounding surface.
  *
  * Tie-free by construction: weights aggregate per (group, value)
  * FIRST, so the running cumulative is over distinct values and the
  * in-run arrival order of equal values cannot move the crossing
  * point. Scale: one hash aggregation, then one window over each
  * group's DISTINCT values (the same bound as any exact per-group
  * order statistic), then a min — nothing global, nothing
  * driver-side.
  */
object WeightedQuantile {

  def weightedQuantile(
      df: DataFrame,
      group: Column,
      value: Column,
      weight: Column,
      num: Int,
      den: Int): DataFrame = {
    require(den >= 1 && num >= 1 && num <= den,
      s"quantile num/den must satisfy 1 <= num <= den, got $num/$den")
    val base = df
      .select(group.as("g"), value.cast("double").as("v"),
        weight.cast("decimal(27,6)").as("w"))
      .filter(col("g").isNotNull && col("v").isNotNull && !isnan(col("v")) &&
        col("w").isNotNull)
    // negative weights make "cumulative weight" meaningless — loudly
    // reject through a payload column (q108 discipline: never wrap a
    // grouping key in the guard)
    val guarded = base.withColumn("w",
      when(col("w") < 0, raise_error(lit(
        "weightedQuantile: negative weight"))).otherwise(col("w")))
    val perValue = guarded.groupBy(col("g"), col("v"))
      .agg(sum(col("w")).as("w"))
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
    val wg = Window.partitionBy(col("g"))
    perValue.select(
      col("g"), col("v"),
      sum(col("w")).over(wv).as("cw"),
      sum(col("w")).over(wg).as("tw"))
      .filter(col("cw") * den >= col("tw") * num && col("tw") > 0)
      .groupBy(col("g"))
      .agg(min(col("v")).as("q_value"))
  }
}

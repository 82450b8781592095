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

  /** Per-group INTERPOLATED quantiles (`quantile_cont` / type-7) —
    * the grouped sibling of
    * [[ExactQuantile.selectQuantilesInterpolated]] (whose driver-side
    * refinement loop cannot fan out over many groups): h =
    * (n−1)·num/den stays RATIONAL, the two bracketing order
    * statistics are exact integer-rank crossings over each group's
    * distinct-value cumulative (the [[weightedQuantile]] geometry —
    * per-group windows over DISTINCT values; right-sized when values
    * are discretized, the documented trade), and the lerp runs in
    * pinned doubles with frac = ((n−1)·num mod den)/den — so the
    * oracle hash-matches. Output: one row per (group, quantile):
    * (group, q_num, q_den, n, value).
    */
  def interpolatedQuantiles(
      df: DataFrame,
      group: Column,
      value: Column,
      qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    qs.foreach { case (num, den) =>
      require(den >= 1 && num >= 0 && num <= den,
        s"quantile num/den must satisfy 0 <= num <= den, got $num/$den")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .select(group.as("g"), value.cast("double").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && !isnan(col("v")))
    val perValue = base.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
    val wg = Window.partitionBy(col("g"))
    val dv = perValue.select(col("g"), col("v"),
      sum(col("c")).over(wv).as("cum"), sum(col("c")).over(wg).as("n"))
    val qdf = qs.toDF("num", "den")
    // per (group, q): integer ranks kLo/kHi and the rational fraction
    val ks = dv.select(col("g"), col("n")).distinct()
      .crossJoin(broadcast(qdf))
      .select(col("g"), col("n"), col("num"), col("den"),
        (expr("(n - 1) * num div den") + 1L).as("kLo"),
        least(expr("(n - 1) * num div den") + 2L, col("n")).as("kHi"),
        (expr("(n - 1) * num % den").cast("double") / col("den")).as("frac"))
    val lo = dv.join(ks.select(col("g").as("kg"), col("num"), col("den"), col("kLo")),
      col("g") === col("kg") && col("cum") >= col("kLo"))
      .groupBy(col("g"), col("num"), col("den"))
      .agg(min(col("v")).as("xlo"))
    val hi = dv.join(ks.select(col("g").as("kg"), col("num").as("num2"),
      col("den").as("den2"), col("kHi")),
      col("g") === col("kg") && col("cum") >= col("kHi"))
      .groupBy(col("kg"), col("num2"), col("den2"))
      .agg(min(col("v")).as("xhi"))
    ks.join(lo, Seq("g", "num", "den"))
      .join(hi, col("g") === col("kg") && col("num") === col("num2") &&
        col("den") === col("den2"))
      .select(col("g").as("group"), col("num").as("q_num"), col("den").as("q_den"),
        col("n"),
        (col("xlo") + col("frac") * (col("xhi") - col("xlo"))).as("value"))
  }
}

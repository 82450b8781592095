package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series preparation: aggregate an event log to one
  * row per (key, period) and FILL THE GAPS — every period in the key's
  * observed [first, last] range gets a row, missing periods marked and
  * valued by the chosen interpolation. The resample/asfreq step every
  * downstream window model assumes (and, for training pipelines, the
  * densification before sequence models see the series).
  *
  * Fill modes:
  *   - `zero`: absent periods carry 0.0 — the correct reading when the
  *     value is an additive flow (nothing happened → nothing summed);
  *   - `locf`: last observation carried forward — the correct reading
  *     when the value is a level/state sample.
  *
  * Period ids are the same provably-exact
  * `floor(unix_micros / period)` arithmetic as `Funnel.retention`.
  *
  * Scale: the observed aggregation is ONE partial-aggregable pass
  * (events collapse map-side to key-periods); the dense grid
  * `sequence(first, last)` explodes per KEY — output rows are period
  * counts, not event counts; the LOCF window partitions by key over
  * that bounded per-key grid (days, not events — contrast the q48
  * lesson where the window spanned a whole stratum's rows). The grid
  * length is guarded (`maxPeriodsPerKey`) so one corrupt timestamp
  * cannot explode a key into a billion-row sequence.
  */
object TimeSeries {

  def gapFill(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      fillMode: String = "zero",
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(fillMode == "zero" || fillMode == "locf",
      s"fillMode must be 'zero' or 'locf', got '$fillMode'")
    require(maxPeriodsPerKey >= 1, s"maxPeriodsPerKey must be >= 1, got $maxPeriodsPerKey")
    val p = periodSeconds * 1000000L
    val observed = events
      .select(key.as("k"), ts.as("ts"), value.cast("decimal(18,6)").as("v"))
      .filter(col("k").isNotNull && col("ts").isNotNull)
      .select(col("k"), floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"),
        col("v"))
      .groupBy(col("k"), col("period"))
      .agg(sum(col("v")).cast("double").as("vsum"))
    val spans = observed.groupBy(col("k"))
      .agg(min(col("period")).as("p0"), max(col("period")).as("p1"))
      .select(col("k"),
        when(col("p1") - col("p0") + 1 > maxPeriodsPerKey, raise_error(concat(
          lit(s"gapFill: key "), col("k").cast("string"),
          lit(s" spans more than $maxPeriodsPerKey periods — corrupt timestamp " +
            "or wrong periodSeconds?"))))
          .otherwise(col("p0")).as("p0"),
        col("p1"))
    val grid = spans.select(col("k"),
      explode(sequence(col("p0"), col("p1"))).as("period"))
    val joined = grid.join(observed, Seq("k", "period"), "left")
      .withColumn("filled", col("vsum").isNull)
    val valued = fillMode match {
      case "zero" => joined.withColumn("value", coalesce(col("vsum"), lit(0.0)))
      case "locf" =>
        val w = Window.partitionBy(col("k")).orderBy(col("period"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // the first period of every key is observed by construction
        // (the span starts at the first observation), so LOCF never
        // sees a leading null
        joined.withColumn("value", last(col("vsum"), ignoreNulls = true).over(w))
    }
    valued.select(col("k").as("key"), col("period"), col("value"), col("filled"))
  }
}

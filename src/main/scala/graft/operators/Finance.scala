package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cash-flow analytics: discounted present value and payback over
  * per-key period series — the project/customer profitability loop
  * of every finance mart.
  *
  * Scale shape: flows first collapse to one row per (key, period)
  * (partial-aggregable), then every window is PARTITIONED BY KEY over
  * that bounded period axis (a 30-year monthly series is 360 rows) —
  * a task owns one key's series, parallelism comes from the millions
  * of keys.
  *
  * Determinism: cash accumulates in EXACT cents (int64 — payback
  * flips on a sign, so it must never ride a float); only the
  * discounted series is double, folded through an ordered running
  * window (one pinned left-to-right order) with a libm `pow` per
  * term — oracles replay the fold and gate NPV at 1e-9 while
  * everything else hash-matches.
  */
object Finance {

  /** Per-key discounted cash flow: n_periods, total_cents (exact),
    * payback_t (first period offset where the UNDISCOUNTED running
    * total turns ≥ 0 — null if never), and npv at `ratePerPeriod`
    * (discounting from the key's first period, t = 0). `period` is
    * any integer timeline (month index, day bucket); gaps are
    * allowed and simply skip t values.
    */
  def dcf(
      df: DataFrame,
      key: Column,
      period: Column,
      amountCents: Column,
      ratePerPeriod: Double): DataFrame = {
    require(ratePerPeriod > -1.0 && java.lang.Double.isFinite(ratePerPeriod),
      s"dcf: ratePerPeriod must be finite and > -1, got $ratePerPeriod")
    val pG = when(period.cast("long").isNull, raise_error(lit(
      "dcf: period must be non-null and long-castable")))
      .otherwise(period.cast("long"))
    val aG = when(amountCents.cast("long").isNull, raise_error(lit(
      "dcf: amountCents must be non-null and long-castable")))
      .otherwise(amountCents.cast("long"))
    val cf = df.select(key.as("k"), pG.as("p"), aG.as("cents"))
      .groupBy(col("k"), col("p")).agg(sum(col("cents")).as("cf"))
    val wKey = Window.partitionBy(col("k"))
    val wCum = Window.partitionBy(col("k")).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = col("p") - min(col("p")).over(wKey)
    val folded = cf
      .withColumn("t", t)
      .withColumn("disc",
        col("cf").cast("double") / pow(lit(1.0 + ratePerPeriod), col("t")))
      .withColumn("cum_cents", sum(col("cf")).over(wCum))
      .withColumn("cum_disc", sum(col("disc")).over(wCum))
    folded.groupBy(col("k")).agg(
      count(lit(1)).as("n_periods"),
      max(struct(col("t"), col("cum_cents"))).getField("cum_cents")
        .as("total_cents"),
      min(when(col("cum_cents") >= 0L, col("t"))).as("payback_t"),
      max(struct(col("t"), col("cum_disc"))).getField("cum_disc").as("npv"))
  }
}

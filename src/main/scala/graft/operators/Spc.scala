package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** STATISTICAL PROCESS CONTROL charts (Shewhart): flag subgroups
  * whose defect behaviour is inconsistent with the process average —
  * the monitoring primitive between raw counts and full drift tests
  * ([[KsTest]], PSI): cheap, interpretable, and per-subgroup.
  *
  * Both charts are one partial-aggregable reduction to per-subgroup
  * counts plus one broadcast of the pooled centerline — no window, no
  * global sort. Every statistic is a pinned chain of correctly-
  * rounded double ops (divisions, √, ×3) on EXACT integer counts, so
  * outputs — including the out-of-control FLAGS, which compare two
  * identically-derived doubles — hash-match a DuckDB oracle with no
  * tolerance.
  */
object Spc {

  /** p-CHART — per-subgroup defect PROPORTION against variable-n
    * three-sigma limits: p̂ᵢ = dᵢ/nᵢ, centerline p̄ = Σd/Σn, limits
    * p̄ ± 3·√(p̄(1−p̄)/nᵢ), LCL floored at 0. `defective` must be a
    * non-null boolean (raises otherwise). Output per subgroup:
    * (k, n, defects, phat, pbar, ucl, lcl, ooc).
    */
  def pChart(df: DataFrame, group: Column, defective: Column): DataFrame = {
    val dG = when(defective.cast("boolean").isNull, raise_error(lit(
      "pChart: defective flag must be a non-null boolean")))
      .otherwise(defective.cast("boolean"))
    val perG = df.select(group.as("k"), dG.as("d"))
      .groupBy(col("k")).agg(
        count(lit(1)).as("n"),
        sum(when(col("d"), 1L).otherwise(0L)).as("defects"))
    val overall = perG.agg(
      sum(col("n")).as("tn"), sum(col("defects")).as("td"))
      .select((col("td").cast("double") / col("tn").cast("double")).as("pbar"))
    val nD = col("n").cast("double")
    val sigma = sqrt(col("pbar") * (lit(1.0) - col("pbar")) / nD)
    val ucl = col("pbar") + lit(3.0) * sigma
    val lcl = greatest(lit(0.0), col("pbar") - lit(3.0) * sigma)
    val phat = col("defects").cast("double") / nD
    perG.crossJoin(broadcast(overall)).select(
      col("k"), col("n"), col("defects"),
      phat.as("phat"), col("pbar"),
      ucl.as("ucl"), lcl.as("lcl"),
      (phat > ucl || phat < lcl).as("ooc"))
  }

  /** c-CHART — per-subgroup event COUNT against the Poisson
    * three-sigma limits: centerline c̄ = mean subgroup count, limits
    * c̄ ± 3·√c̄, LCL floored at 0. The subgroup universe is the
    * DISTINCT group values present in `df` (a subgroup with zero
    * events is invisible to the chart — give the caller the dense
    * axis if silence should alarm). Output per subgroup:
    * (k, c, cbar, ucl, lcl, ooc).
    */
  def cChart(df: DataFrame, group: Column): DataFrame = {
    val perG = df.select(group.as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
    val overall = perG.agg(
      sum(col("c")).as("tc"), count(lit(1)).as("tg"))
      .select((col("tc").cast("double") / col("tg").cast("double")).as("cbar"))
    val sigma = sqrt(col("cbar"))
    val ucl = col("cbar") + lit(3.0) * sigma
    val lcl = greatest(lit(0.0), col("cbar") - lit(3.0) * sigma)
    val cD = col("c").cast("double")
    perG.crossJoin(broadcast(overall)).select(
      col("k"), col("c"), col("cbar"),
      ucl.as("ucl"), lcl.as("lcl"),
      (cD > ucl || cD < lcl).as("ooc"))
  }
}

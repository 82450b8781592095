package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experimentation statistics. Assignment is CONTENT-ADDRESSED —
  * the portable 60-bit md5 hash of the subject key modulo the arm
  * count ([[Sampling]] convention) — so arms are stable across runs,
  * engines, and reprocessing; no RNG, no assignment table to join.
  */
object Experiment {

  /** Two-proportion z-test between hash-assigned arms A (bucket 0)
    * and B (bucket 1): one row
    * (n_a, conv_a, n_b, conv_b, p_a, p_b, z) with the pooled-variance
    * statistic
    *
    *   z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))
    *
    * Every input to the formula is an exact integer count and every
    * operation (divisions, sqrt) is correctly rounded and applied in
    * a pinned order, so the z statistic is bit-reproducible by any
    * engine — no tolerance needed. Degenerate pooled rates (p̂ = 0 or
    * 1, or an empty arm) emit NULL z rather than ±∞.
    *
    * `converted` marks a subject-level success; `df` must already be
    * one row per subject (the caller owns the subject reduction —
    * conversion is a property of the subject, not of event rows).
    */
  def twoProportionZ(
      df: DataFrame,
      subject: Column,
      converted: Column): DataFrame = {
    val base = df
      .filter(subject.isNotNull)
      .select(
        (pmod(KmvSketch.hash60(subject), lit(2)) === 0).as("arm_a"),
        when(converted.cast("boolean").isNull,
          raise_error(lit("twoProportionZ: converted flag must be non-null")))
          .otherwise(converted.cast("boolean")).as("c"))
    val agg = base.agg(
      sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm_a") && col("c"), 1L).otherwise(0L)).as("conv_a"),
      sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("arm_a") && col("c"), 1L).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    agg.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0, pa).as("p_a"),
      when(col("n_b") > 0, pb).as("p_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && pp > 0.0 && pp < 1.0,
        (pa - pb) / se).as("z"))
  }
}

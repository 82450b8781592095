package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form linear models fit per group in ONE aggregation pass —
  * the normal-equations trick: a 2-feature OLS fit needs only the
  * nine sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂,
  * Σx₁y, Σx₂y), all partial-aggregable, so a million-group fit is one
  * map-side-combined shuffle no matter how many rows feed it. The
  * per-group solve is a 2×2 Cramer inversion — pure scalar arithmetic
  * in the projection, no iteration, no driver round-trips.
  *
  * Numeric portability (the cross-engine oracle contract): inputs are
  * cast to DECIMAL(18,4) so every sufficient statistic is EXACT
  * (products carry precision 37 < 38, no engine-dependent overflow
  * or scale loss); the exact statistics are then cast to double once
  * and the solve runs in a pinned IEEE operation order — an oracle
  * replaying the same statistics reproduces the same coefficients to
  * a strict tolerance (1-ulp decimal→double conversion drift is the
  * only residual, per the q112 precedent).
  */
object Regression {

  /** Per-group OLS of y on (x1, x2) with intercept:
    * (key, n, b0, b1, b2, r2). Rows with a null key or null/NaN
    * inputs drop. Groups whose centered design matrix is singular
    * (fewer than 3 points, or collinear features) emit NULL
    * coefficients — the honest answer, not a pseudo-inverse guess.
    */
  def groupedOls2(
      df: DataFrame,
      key: Column,
      y: Column,
      x1: Column,
      x2: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(18,4)")
    val base = df
      .filter(key.isNotNull &&
        y.isNotNull && !isnan(y.cast("double")) &&
        x1.isNotNull && !isnan(x1.cast("double")) &&
        x2.isNotNull && !isnan(x2.cast("double")))
      .select(key.as("key"), d(y).as("y"), d(x1).as("x1"), d(x2).as("x2"))
    val stats = base.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum(col("x1")).cast("double").as("sx1"),
      sum(col("x2")).cast("double").as("sx2"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x1") * col("x1")).cast("double").as("sx1x1"),
      sum(col("x2") * col("x2")).cast("double").as("sx2x2"),
      sum(col("x1") * col("x2")).cast("double").as("sx1x2"),
      sum(col("x1") * col("y")).cast("double").as("sx1y"),
      sum(col("x2") * col("y")).cast("double").as("sx2y"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    // centered second moments, pinned order: S_ab = s_ab - s_a*s_b/n
    val nD = col("n").cast("double")
    def centered(sab: Column, sa: Column, sb: Column) = sab - sa * sb / nD
    val m = stats
      .withColumn("c11", centered(col("sx1x1"), col("sx1"), col("sx1")))
      .withColumn("c22", centered(col("sx2x2"), col("sx2"), col("sx2")))
      .withColumn("c12", centered(col("sx1x2"), col("sx1"), col("sx2")))
      .withColumn("c1y", centered(col("sx1y"), col("sx1"), col("sy")))
      .withColumn("c2y", centered(col("sx2y"), col("sx2"), col("sy")))
      .withColumn("cyy", centered(col("syy"), col("sy"), col("sy")))
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
    val solvable = col("n") >= 3 && col("det") > lit(1e-9) * col("c11") * col("c22")
    val b1 = (col("c22") * col("c1y") - col("c12") * col("c2y")) / col("det")
    val b2 = (col("c11") * col("c2y") - col("c12") * col("c1y")) / col("det")
    m.withColumn("b1", when(solvable, b1))
      .withColumn("b2", when(solvable, b2))
      .withColumn("b0", when(solvable,
        (col("sy") - col("b1") * col("sx1") - col("b2") * col("sx2")) / nD))
      .withColumn("r2", when(solvable && col("cyy") > 0,
        (col("b1") * col("c1y") + col("b2") * col("c2y")) / col("cyy")))
      .select("key", "n", "b0", "b1", "b2", "r2")
  }
}

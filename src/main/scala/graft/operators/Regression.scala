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

  /** RIDGE REGRESSION (two features + unpenalized intercept) per key,
    * in CLOSED FORM — the L2-regularized sibling of [[groupedOls2]]:
    * one pass accumulates the exact integer moment matrix, and the
    * 3×3 ridge normal equations
    *
    *   [ n    Σx₁      Σx₂    ] [b₀]   [ Σy   ]
    *   [ Σx₁  Σx₁²+λ   Σx₁x₂  ] [b₁] = [ Σx₁y ]
    *   [ Σx₂  Σx₁x₂    Σx₂²+λ ] [b₂]   [ Σx₂y ]
    *
    * solve by CRAMER'S RULE — four 3×3 determinants, each ONE pinned
    * chain of correctly-rounded double ops on exactly-cast decimal
    * sums, so the coefficients are hash-exact (no iterative solver,
    * no float accumulation hazard). λ must be a dyadic rational so
    * both engines hold the identical double. Inputs must be
    * integer-valued (the caller owns scaling — keep Σx², Σxy under
    * 2⁵³, guarded LOUDLY). Degenerate systems (det ≤ 0 — λ > 0 makes
    * the matrix PD whenever n ≥ 1, so only empty keys) emit nulls.
    *
    * Output per key: (key, n, det, b0, b1, b2).
    */
  def ridge2(
      df: DataFrame,
      key: Column,
      x1: Column,
      x2: Column,
      y: Column,
      lambda: Double): DataFrame = {
    require(lambda > 0.0, s"lambda must be > 0, got $lambda")
    require(lambda * 4096.0 == math.rint(lambda * 4096.0),
      s"lambda must be an exact dyadic rational (k/4096), got $lambda")
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"ridge2: $name must be a non-null integer"))).otherwise(c.cast("long"))
    val base = df.select(key.as("k"), g(x1, "x1").as("a"),
      g(x2, "x2").as("b"), g(y, "y").as("yy"))
    val d19 = "decimal(19,0)"
    def s38(c: Column) = sum(c).cast("decimal(38,0)")
    val m = base.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      s38(col("a").cast(d19)).as("s1"),
      s38(col("b").cast(d19)).as("s2"),
      s38(col("a").cast(d19) * col("a").cast(d19)).as("s11"),
      s38(col("a").cast(d19) * col("b").cast(d19)).as("s12"),
      s38(col("b").cast(d19) * col("b").cast(d19)).as("s22"),
      s38(col("yy").cast(d19)).as("sy"),
      s38(col("a").cast(d19) * col("yy").cast(d19)).as("s1y"),
      s38(col("b").cast(d19) * col("yy").cast(d19)).as("s2y"))
    val twoP53 = 9007199254740992L
    def e(name: String): Column = {
      val c = col(name)
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"ridge2: |$name| exceeds 2^53 — rescale the inputs")))
        .otherwise(c).cast("double")
    }
    val nD = col("n").cast("double")
    val (a11, a12, a13) = (nD, e("s1"), e("s2"))
    val (a22, a23, a33) =
      (e("s11") + lit(lambda), e("s12"), e("s22") + lit(lambda))
    val (b1v, b2v, b3v) = (e("sy"), e("s1y"), e("s2y"))
    // symmetric 3×3 determinant, one pinned chain (det3 is reused
    // verbatim for each Cramer numerator with a column swapped)
    def det3(
        r1: (Column, Column, Column),
        r2: (Column, Column, Column),
        r3: (Column, Column, Column)): Column =
      r1._1 * (r2._2 * r3._3 - r2._3 * r3._2) -
        r1._2 * (r2._1 * r3._3 - r2._3 * r3._1) +
        r1._3 * (r2._1 * r3._2 - r2._2 * r3._1)
    val dA = det3((a11, a12, a13), (a12, a22, a23), (a13, a23, a33))
    val d0 = det3((b1v, a12, a13), (b2v, a22, a23), (b3v, a23, a33))
    val d1 = det3((a11, b1v, a13), (a12, b2v, a23), (a13, b3v, a33))
    val d2 = det3((a11, a12, b1v), (a12, a22, b2v), (a13, a23, b3v))
    m.select(col("k").as("key"), col("n"),
      dA.as("det"),
      when(dA > 0.0, d0 / dA).otherwise(lit(null).cast("double")).as("b0"),
      when(dA > 0.0, d1 / dA).otherwise(lit(null).cast("double")).as("b1"),
      when(dA > 0.0, d2 / dA).otherwise(lit(null).cast("double")).as("b2"))
  }
}

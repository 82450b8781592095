package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Regression.groupedOls2]]: exact recovery of a noise-free plane,
  * NULL coefficients for singular designs, and null/NaN row drops.
  * Inputs use ≤4-decimal values so the DECIMAL(18,4) cast is lossless
  * and the expected coefficients are exact up to the pinned-order
  * double solve.
  */
class RegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("recovers a noise-free plane exactly (b0=3, b1=2, b2=-5, r2=1)") {
    val rows = for {
      x1 <- 0 to 6; x2 <- 0 to 6
    } yield ("g", 3.0 + 2.0 * x1 - 5.0 * x2, x1.toDouble, x2.toDouble)
    val got = Regression.groupedOls2(rows.toDF("k", "y", "x1", "x2"),
      col("k"), col("y"), col("x1"), col("x2")).collect().head
    assert(got.getLong(1) == 49L)
    assert(math.abs(got.getDouble(2) - 3.0) < 1e-9, s"b0=${got.getDouble(2)}")
    assert(math.abs(got.getDouble(3) - 2.0) < 1e-9, s"b1=${got.getDouble(3)}")
    assert(math.abs(got.getDouble(4) + 5.0) < 1e-9, s"b2=${got.getDouble(4)}")
    assert(math.abs(got.getDouble(5) - 1.0) < 1e-9, s"r2=${got.getDouble(5)}")
  }

  test("collinear features and tiny groups emit NULL coefficients") {
    val df = Seq(
      // x2 = 2*x1 exactly — singular normal matrix
      ("collinear", 1.0, 1.0, 2.0), ("collinear", 2.0, 2.0, 4.0),
      ("collinear", 3.0, 3.0, 6.0), ("collinear", 4.0, 4.0, 8.0),
      // two points < 3 minimum
      ("tiny", 1.0, 1.0, 0.0), ("tiny", 2.0, 0.0, 1.0))
      .toDF("k", "y", "x1", "x2")
    val got = Regression.groupedOls2(df, col("k"), col("y"), col("x1"), col("x2"))
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("collinear", "tiny").foreach { k =>
      val r = got(k)
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
        s"$k should be unsolvable: $r")
    }
  }

  test("null and NaN rows drop; null keys drop") {
    val clean = (0 to 6).flatMap(x1 => (0 to 6).map(x2 =>
      (Option("g"), Option(1.0 + 2.0 * x1 + 3.0 * x2), Option(x1.toDouble), Option(x2.toDouble))))
    val dirty = clean ++ Seq(
      (Option("g"), Option(Double.NaN), Option(1.0), Option(1.0)),
      (Option("g"), Option.empty[Double], Option(1.0), Option(1.0)),
      (Option("g"), Option(5.0), Option.empty[Double], Option(1.0)),
      (Option.empty[String], Option(5.0), Option(1.0), Option(1.0)))
    val a = Regression.groupedOls2(clean.toDF("k", "y", "x1", "x2"),
      col("k"), col("y"), col("x1"), col("x2")).collect().head
    val b = Regression.groupedOls2(dirty.toDF("k", "y", "x1", "x2"),
      col("k"), col("y"), col("x1"), col("x2")).collect().head
    assert(a.getLong(1) == b.getLong(1))
    (2 to 5).foreach(i =>
      assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-12))
  }
}

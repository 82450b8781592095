package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Profiling.benfordFirstDigit]] and [[Profiling.gini]]: digit
  * extraction without libm, share arithmetic, drop rules; the Gini
  * closed form against hand-computed distributions and its invariance
  * to permutation within ties.
  */
class ProfilingAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("benford: digits, shares, and drop rules") {
    val vals = Seq(1.23, 19.99, 100.0, 2.5, 250.0, 0.31, // digits 1,1,1,2,2,3
      0.001,          // below half-cent resolution at scale 2 → drops
      -5.0, Double.NaN) // non-positive / NaN → drop
    val got = Profiling.benfordFirstDigit(vals.toDF("v"), col("v"), scale = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set("1", "2", "3"))
    assert(got("1")._1 == 3L && got("2")._1 == 2L && got("3")._1 == 1L)
    assert(math.abs(got("1")._2 - 3.0 / 6.0) < 1e-15)
    assert(math.abs(got("3")._2 - 1.0 / 6.0) < 1e-15)
  }

  test("benford: expected shares are the Benford constants") {
    val vals = (1 to 9).map(_.toDouble)
    val got = Profiling.benfordFirstDigit(vals.toDF("v"), col("v"), scale = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    (1 to 9).foreach { d =>
      assert(math.abs(got(d.toString) - math.log10(1.0 + 1.0 / d)) < 1e-15)
    }
  }

  test("gini: known distributions") {
    // perfectly even: G = 0
    val even = Seq(("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 10.0), ("g", 4L, 10.0))
    val g0 = Profiling.gini(even.toDF("k", "id", "v"), col("k"), col("id"), col("v"))
      .collect().head.getDouble(2)
    assert(math.abs(g0) < 1e-12)
    // one owner takes all of n=4: G = (n-1)/n = 0.75
    val skew = Seq(("g", 1L, 0.0), ("g", 2L, 0.0), ("g", 3L, 0.0), ("g", 4L, 40.0))
    val g1 = Profiling.gini(skew.toDF("k", "id", "v"), col("k"), col("id"), col("v"))
      .collect().head.getDouble(2)
    assert(math.abs(g1 - 0.75) < 1e-12)
    // textbook: (1,2,3,4) → G = 0.25
    val lin = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0), ("g", 4L, 4.0))
    val g2 = Profiling.gini(lin.toDF("k", "id", "v"), col("k"), col("id"), col("v"))
      .collect().head.getDouble(2)
    assert(math.abs(g2 - 0.25) < 1e-12)
  }

  test("gini: tie permutation invariance, zero-sum NULL, negative fails loudly") {
    // same multiset, different id assignment among tied values
    val a = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 20.0))
    val b = Seq(("g", 3L, 5.0), ("g", 1L, 5.0), ("g", 2L, 20.0))
    val ga = Profiling.gini(a.toDF("k", "id", "v"), col("k"), col("id"), col("v"))
      .collect().head.getDouble(2)
    val gb = Profiling.gini(b.toDF("k", "id", "v"), col("k"), col("id"), col("v"))
      .collect().head.getDouble(2)
    assert(ga == gb)
    val zero = Seq(("z", 1L, 0.0), ("z", 2L, 0.0))
    val rz = Profiling.gini(zero.toDF("k", "id", "v"), col("k"), col("id"), col("v"))
      .collect().head
    assert(rz.isNullAt(2))
    val neg = Seq(("n", 1L, -1.0), ("n", 2L, 3.0))
    intercept[Exception] {
      Profiling.gini(neg.toDF("k", "id", "v"), col("k"), col("id"), col("v")).collect()
    }
  }
}

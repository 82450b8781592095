package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KS two-sample test: exact D on hand-computed CDFs, brute-force
  * parity under any bucketing/partitioning, shift sensitivity vs
  * same-distribution negatives, and guards.
  */
class KsTestSpec extends SparkTestBase {

  private def bruteD(ref: Seq[Double], cur: Seq[Double]): Double = {
    val values = (ref ++ cur).distinct.sorted
    values.map { v =>
      val f1 = ref.count(_ <= v).toDouble / ref.size
      val f2 = cur.count(_ <= v).toDouble / cur.size
      math.abs(f1 - f2)
    }.max
  }

  test("matches a hand-computed D exactly") {
    import spark.implicits._
    // ref {1,2,3,4}, cur {3,4,5,6}: D at v=2: |2/4 - 0| = 0.5
    val rows = Seq(1.0, 2.0, 3.0, 4.0).map((_, true)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map((_, false))
    val r = KsTest.ksTwoSample(rows.toDF("v", "r"), $"v", $"r").collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5, s"D ${r.getDouble(2)}")
  }

  test("equals the brute-force D on random data, any buckets/partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val ref = Seq.fill(400)(rnd.nextGaussian())
    val cur = Seq.fill(300)(rnd.nextGaussian() * 1.4 + 0.3)
    val expect = bruteD(ref, cur)
    val rows = ref.map((_, true)) ++ cur.map((_, false))
    for (buckets <- Seq(1, 16, 256); parts <- Seq(3, 13)) {
      val d = KsTest.ksTwoSample(
        rows.toDF("v", "r").repartition(parts), $"v", $"r", buckets)
        .collect()(0).getDouble(2)
      assert(d == expect, s"buckets=$buckets parts=$parts: $d != $expect")
    }
  }

  test("flags a genuine shift and stays quiet on identical distributions") {
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    val a = Seq.fill(500)(rnd.nextGaussian())
    val shifted = a.map(_ + 1.0)
    val hot = KsTest.ksTwoSample(
      (a.map((_, true)) ++ shifted.map((_, false))).toDF("v", "r"), $"v", $"r")
      .collect()(0)
    assert(hot.getBoolean(4), s"1-sigma shift not flagged (D=${hot.getDouble(2)})")
    // the same sample against itself: D = 0, never flagged
    val same = KsTest.ksTwoSample(
      (a.map((_, true)) ++ a.map((_, false))).toDF("v", "r"), $"v", $"r")
      .collect()(0)
    assert(same.getDouble(2) == 0.0 && !same.getBoolean(4))
  }

  test("guards: null value/side, empty side, bad buckets fail loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      KsTest.ksTwoSample(Seq((1.0, true)).toDF("v", "r"), $"v", $"r", 0)
    }
    val oneSided = Seq((1.0, true), (2.0, true)).toDF("v", "r")
    val ex = intercept[IllegalArgumentException] {
      KsTest.ksTwoSample(oneSided, $"v", $"r").collect()
    }
    assert(ex.getMessage.contains("non-empty"), ex.getMessage)
    val nullVal = Seq((Option.empty[Double], true)).toDF("v", "r")
    val ex2 = intercept[Exception] {
      KsTest.ksTwoSample(nullVal, $"v", $"r").collect()
    }
    assert(ex2.getMessage.contains("ksTwoSample"), ex2.getMessage)
  }
}

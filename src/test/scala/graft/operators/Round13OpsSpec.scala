package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class Round13OpsSpec extends SparkTestBase {
  import spark.implicits._

  // --- MMD two-sample ----------------------------------------------

  test("mmdTwoSample is ~0 for identically distributed slices") {
    val rows = (0 until 200).flatMap { i =>
      Seq((i % 7L, true), (i % 7L, false))
    }
    val out = KsTest.mmdTwoSample(rows.toDF("bin", "ina"), $"bin", $"ina")
      .collect().head
    assert(out.getLong(0) == 200 && out.getLong(1) == 200 && out.getLong(2) == 7)
    assert(math.abs(out.getDouble(3)) < 1e-12,
      s"identical distributions must give mmd2 ~ 0, got ${out.getDouble(3)}")
  }

  test("mmdTwoSample hits the closed form for two point masses") {
    // all slice-A mass at bin 0, all slice-B mass at bin 3, σ = 2:
    // MMD² = K(0,0) + K(3,3) − 2K(0,3) = 2(1 − exp(−9/8))
    val df = (Seq.fill(11)((0L, true)) ++ Seq.fill(7)((3L, false)))
      .toDF("bin", "ina")
    val out = KsTest.mmdTwoSample(df, $"bin", $"ina",
      sigmaNum = 2L, sigmaDen = 1L).collect().head
    val expect = 2.0 * (1.0 - math.exp(-9.0 / 8.0))
    assert(math.abs(out.getDouble(3) - expect) < 1e-12,
      s"expected $expect, got ${out.getDouble(3)}")
  }

  test("mmdTwoSample is non-negative and grows with separation") {
    def mmdAt(gap: Long): Double =
      KsTest.mmdTwoSample(
        (Seq.fill(20)((0L, true)) ++ Seq.fill(20)((gap, false)) ++
          Seq.fill(5)((0L, false)) ++ Seq.fill(5)((gap, true)))
          .toDF("bin", "ina"),
        $"bin", $"ina", sigmaNum = 3L, sigmaDen = 1L)
        .collect().head.getDouble(3)
    val d1 = mmdAt(1L)
    val d4 = mmdAt(4L)
    assert(d1 >= -1e-15 && d4 >= -1e-15, "MMD² is a squared RKHS norm")
    assert(d4 > d1, s"larger separation must read larger: d1=$d1 d4=$d4")
  }

  test("mmdTwoSample raises loudly on bad input") {
    val e1 = intercept[Exception] {
      KsTest.mmdTwoSample(
        Seq.empty[(Long, Boolean)].toDF("bin", "ina"), $"bin", $"ina")
    }
    assert(e1.getMessage.contains("empty input"))
    val e2 = intercept[Exception] {
      KsTest.mmdTwoSample(
        Seq((1L, true), (2L, true)).toDF("bin", "ina"), $"bin", $"ina")
    }
    assert(e2.getMessage.contains("both slices need mass"))
    val e3 = intercept[Exception] {
      KsTest.mmdTwoSample(
        (0L until 10L).map(i => (i, i % 2 == 0)).toDF("bin", "ina"),
        $"bin", $"ina", maxBins = 5)
    }
    assert(e3.getMessage.contains("exceed maxBins"))
    val e4 = intercept[Exception] {
      KsTest.mmdTwoSample(
        Seq((Some(1L), true), (None, false)).toDF("bin", "ina"),
        $"bin", $"ina").collect()
    }
    assert(e4.getMessage.contains("non-null"))
  }
}

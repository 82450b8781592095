package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Histogram sketch states: exact bin counts under any partitioning,
  * clamp saturation, merge ≡ global build, quantile selection rule on
  * hand-computed data, one-bin-width error bound, and guards. Plus
  * KmvSketch.mergeSorted (the driver-side streaming merge) against
  * the in-plan aggregator.
  */
class HistogramSpec extends SparkTestBase {

  test("bin counts are exact and clamp at both edges") {
    import spark.implicits._
    // lo=0, hi=10, bins=5 → width 2. Values: -3 clamps to bin 0,
    // 99 clamps to bin 4, boundaries land in the upper bin
    val vals = Seq(-3.0, 0.0, 1.9, 2.0, 5.0, 9.9, 10.0, 99.0)
    val got = Sketches.histogramBins(vals.toDF("v").repartition(3), Seq.empty, $"v", 0.0, 10.0, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 4L -> 3L))
  }

  test("merging finer-grain states equals the direct build") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(i => (s"g${i % 3}", i % 7, rnd.nextDouble() * 120))
      .toDF("g", "sub", "v")
    val fine = Sketches.histogramBins(rows, Seq("g", "sub"), $"v", 0.0, 100.0, 10)
    val merged = fine.groupBy($"g", $"bin").agg(sum($"n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Sketches.histogramBins(rows, Seq("g"), $"v", 0.0, 100.0, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct)
  }

  test("quantile rule: lower edge of the first bin reaching ceil(q*N)") {
    import spark.implicits._
    // 10 values in [0,100), bins of width 10: 1,11,21,...,91 → one per
    // bin. p50 → rank 5 → bin 4 → edge 40; p90 → rank 9 → edge 80;
    // p100 → edge 90
    val vals = (0 until 10).map(i => i * 10 + 1.0)
    val st = Sketches.histogramBins(vals.toDF("v"), Seq.empty, $"v", 0.0, 100.0, 10)
    val r = Sketches.histogramQuantiles(st, Seq.empty, Seq(0.5, 0.9, 1.0), 0.0, 100.0, 10)
      .collect()(0)
    assert(r.getLong(0) == 10L) // n_total
    assert(r.getDouble(1) == 40.0, s"p50 ${r.getDouble(1)}")
    assert(r.getDouble(2) == 80.0, s"p90 ${r.getDouble(2)}")
    assert(r.getDouble(3) == 90.0, s"p100 ${r.getDouble(3)}")
  }

  test("estimates sit within one bin width of the exact quantile") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vals = (1 to 5000).map(_ => rnd.nextDouble() * 200)
    val st = Sketches.histogramBins(vals.toDF("v"), Seq.empty, $"v", 0.0, 200.0, 40)
    val got = Sketches.histogramQuantiles(st, Seq.empty, Seq(0.5, 0.99), 0.0, 200.0, 40)
      .collect()(0)
    val sorted = vals.sorted
    def exact(q: Double) = sorted(math.ceil(q * sorted.size).toInt - 1)
    assert(math.abs(got.getDouble(1) - exact(0.5)) <= 5.0) // one bin = 5
    assert(math.abs(got.getDouble(2) - exact(0.99)) <= 5.0)
  }

  test("guards: bad bins/range/quantiles fail loudly") {
    import spark.implicits._
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Sketches.histogramBins(df, Seq.empty, $"v", 0.0, 10.0, 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.histogramBins(df, Seq.empty, $"v", 10.0, 10.0, 4)
    }
    val st = Sketches.histogramBins(df, Seq.empty, $"v", 0.0, 10.0, 4)
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(st, Seq.empty, Seq(0.0), 0.0, 10.0, 4)
    }
  }

  test("KmvSketch.mergeSorted equals the in-plan aggregator's merge") {
    import spark.implicits._
    val k = 16
    val a = (1L to 200L)
    val b = (150L to 400L)
    val skA = KmvSketch.sketch(a.toDF("id"), Seq.empty, $"id", k).collect()(0).getSeq[Long](0)
    val skB = KmvSketch.sketch(b.toDF("id"), Seq.empty, $"id", k).collect()(0).getSeq[Long](0)
    val driverMerged = KmvSketch.mergeSorted(skA, skB, k)
    val planMerged = KmvSketch.sketch((a ++ b).toDF("id"), Seq.empty, $"id", k)
      .collect()(0).getSeq[Long](0)
    // driver merge of partial states can only agree with the global
    // build when the partials cover the global k-min (they do: each
    // side's k-min contains its global-candidate hashes)
    assert(driverMerged == planMerged)
  }
}

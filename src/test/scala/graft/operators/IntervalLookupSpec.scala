package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SearchSorted kernel + IntervalLookup operator: brute-force parity,
  * boundary semantics, validation, and the zero-join plan shape.
  */
class IntervalLookupSpec extends SparkTestBase {

  test("searchSorted: counts boundaries <= v; NaN probes give 0") {
    import spark.implicits._
    val bounds = Seq(1.0, 3.0, 3.0, 7.5)
    val probes = Seq(0.5, 1.0, 2.9, 3.0, 5.0, 7.5, 100.0, Double.NaN)
    val got = probes.toDF("v")
      .select(graft.functions.GraftFunctions.searchSorted(spark, $"v", bounds).as("i"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 1, 3, 3, 4, 4, 0))
  }

  test("lookupInterval equals brute-force BETWEEN semantics incl. gaps and nulls") {
    import spark.implicits._
    val dims = Seq((0.0, 10.0, "a"), (10.0, 20.0, "b"), (30.0, 40.0, "c"))
      .toDF("lo", "hi", "band")
    val facts = Seq(
      (1L, Some(-1.0)), (2L, Some(0.0)), (3L, Some(9.999)), (4L, Some(10.0)),
      (5L, Some(25.0)), // gap between b and c
      (6L, Some(30.0)), (7L, Some(39.9)), (8L, Some(40.0)), // hi is exclusive
      (9L, None),
    ).toDF("id", "v")
    val got = IntervalLookup.lookupInterval(
      facts, dims, $"v", $"lo", $"hi", $"band", "out")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got == Map(
      1L -> None, 2L -> Some("a"), 3L -> Some("a"), 4L -> Some("b"),
      5L -> None, 6L -> Some("c"), 7L -> Some("c"), 8L -> None, 9L -> None))
  }

  test("lookupInterval plan: no join, no shuffle — pure projection over the scan") {
    import spark.implicits._
    val dims = Seq((0.0, 10.0, "a")).toDF("lo", "hi", "band")
    val facts = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = IntervalLookup.lookupInterval(
      facts, dims, $"o_totalprice", $"lo", $"hi", $"band", "out")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"lookup must not plan a join:\n$plan")
    assert(!plan.contains("Exchange"), s"lookup must not shuffle:\n$plan")
  }

  test("lookupInterval validation: overlaps, inverted, oversize, clobber all throw") {
    import spark.implicits._
    val facts = Seq((1L, 5.0)).toDF("id", "v")
    def d(rows: (Double, Double, String)*) = rows.toDF("lo", "hi", "band")
    intercept[IllegalArgumentException] { // overlap
      IntervalLookup.lookupInterval(facts, d((0.0, 10.0, "a"), (5.0, 15.0, "b")),
        $"v", $"lo", $"hi", $"band", "out")
    }
    intercept[IllegalArgumentException] { // inverted
      IntervalLookup.lookupInterval(facts, d((10.0, 0.0, "a")),
        $"v", $"lo", $"hi", $"band", "out")
    }
    intercept[IllegalArgumentException] { // existing column
      IntervalLookup.lookupInterval(facts, d((0.0, 1.0, "a")),
        $"v", $"lo", $"hi", $"band", "v")
    }
    intercept[IllegalArgumentException] { // oversize dimension
      val big = (0 until 11).map(i => (i * 1.0, i + 0.5, s"x$i")).toDF("lo", "hi", "band")
      IntervalLookup.lookupInterval(facts, big,
        $"v", $"lo", $"hi", $"band", "out", maxIntervals = 10)
    }
  }
}

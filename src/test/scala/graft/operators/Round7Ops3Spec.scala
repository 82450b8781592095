package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-7 wave 3: Holt linear trend, grouped top-k, equal-frequency
  * binning, reliability calibration bins.
  */
class Round7Ops3Spec extends SparkTestBase {
  import spark.implicits._

  test("holtLinear: matches a local fold; trend tracks a linear series") {
    import java.sql.Timestamp
    // user 1: perfectly linear 10, 20, 30, 40 over 4 days
    val rows = (0 until 4).map(d =>
      (1L, new Timestamp((d * 86400L) * 1000), 10.0 * (d + 1)))
    val got = TimeSeries.holtLinear(
      rows.toDF("u", "ts", "v"), $"u", $"ts", $"v", 86400L, 0.25, 0.125)
      .collect()(0)
    // local replay: l1=10, b1=0
    var l = 10.0
    var b = 0.0
    for (x <- Seq(20.0, 30.0, 40.0)) {
      val nl = 0.25 * x + 0.75 * (l + b)
      b = 0.125 * (nl - l) + 0.875 * b
      l = nl
    }
    assert(got.getLong(1) == 4L && got.getLong(2) == 3L)
    assert(got.getDouble(3) == l, s"level ${got.getDouble(3)} vs $l")
    assert(got.getDouble(4) == b, s"trend ${got.getDouble(4)} vs $b")
    assert(got.getDouble(5) == l + b)
    assert(b > 0.0, "rising series must carry a positive trend")
  }

  test("holtLinear: non-dyadic smoothing weights are rejected") {
    val df = Seq((1L, new java.sql.Timestamp(0L), 1.0)).toDF("u", "ts", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.holtLinear(df, $"u", $"ts", $"v", 86400L, alpha = 0.3)
    }
  }

  test("topNPerGroup: dense ranks, (score desc, id asc) ties, bounded output") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 7.0), (1L, 13L, 1.0),
      (2L, 20L, 2.0)).toDF("g", "id", "s")
    val got = Ranking.topNPerGroup(df, $"g", $"id", $"s", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == Set(
      (1L, 1, 12L, 7.0), (1L, 2, 10L, 5.0), (1L, 3, 11L, 5.0),
      (2L, 1, 20L, 2.0)))
  }

  test("topNPerGroup plan: partial top-k aggregates map-side, no Window operator") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 6.0)).toDF("g", "id", "s")
    val p = Ranking.topNPerGroup(df, $"g", $"id", $"s", k = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"grouped top-k must not be a window\n$p")
    assert(p.contains("partial"), s"the heap must partial-aggregate\n$p")
  }

  test("equalFrequencyBins: quartiles split a known multiset; ties land in the lower bin") {
    // 8 values; quartile cutpoints at k=ceil(2)=2nd, 4th, 6th sorted
    // values → cuts 2, 4, 6; ties (the cut values) stay low
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0).toDF("x")
    val got = ExactQuantile.equalFrequencyBins(df, $"x", nBins = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(0) == ((2L, 1.0, 2.0)))
    assert(got(1) == ((2L, 3.0, 4.0)))
    assert(got(2) == ((2L, 5.0, 6.0)))
    assert(got(3) == ((2L, 7.0, 8.0)))
  }

  test("reliabilityBins: exact counts/rates; out-of-range probability fails loudly") {
    val df = Seq(
      (0.05, true), (0.05, false), (0.95, true), (0.95, true)).toDF("p", "y")
    val got = Profiling.reliabilityBins(df, $"p", $"y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(0L) == ((2L, 1L, 0.05, 0.5)))
    assert(got(9L) == ((2L, 2L, 0.95, 1.0)))
    val ex = intercept[Exception] {
      Profiling.reliabilityBins(
        Seq((1.5, true)).toDF("p", "y"), $"p", $"y", bins = 10).collect()
    }
    assert(ex.getMessage.contains("outside [0, 1]"))
  }

  test("datasetDigest: invariant to order/partitioning, moved by any changed row") {
    val rows = Seq((1L, "a"), (2L, "b"), (3L, Option.empty[String].orNull))
    val base = rows.toDF("k", "v")
    def digest(df: org.apache.spark.sql.DataFrame) =
      Profiling.datasetDigest(df, Seq("k", "v")).collect()(0).getString(1)
    val d0 = digest(base)
    assert(digest(base.repartition(7)) == d0, "repartitioning must not move the digest")
    assert(digest(rows.reverse.toDF("k", "v")) == d0, "row order must not move the digest")
    assert(digest(Seq((1L, "a"), (2L, "B"), (3L, null: String)).toDF("k", "v")) != d0,
      "a changed cell must move the digest")
    // null renders as the \N sentinel, distinct from the string and from empty
    assert(digest(Seq((3L, "\\N")).toDF("k", "v")) ==
      digest(Seq((3L, null: String)).toDF("k", "v")),
      "sentinel collision is DOCUMENTED canonical-rendering behavior") // pins the contract
    assert(digest(Seq((3L, "")).toDF("k", "v")) !=
      digest(Seq((3L, null: String)).toDF("k", "v")))
  }

  test("columnProfile: null/distinct/min/max per column") {
    val df = Seq(
      (Some(1L), "x"), (Some(1L), "y"), (None, "y")).toDF("k", "v")
    val got = Profiling.columnProfile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("k") == ((3L, 1L, 1L, "1", "1")))
    assert(got("v") == ((3L, 0L, 2L, "x", "y")))
  }

  test("columnProfile plan: ONE scan of the base table for any column count") {
    val dir = java.nio.file.Files.createTempDirectory("colprof_plan")
    try {
      val p = dir.resolve("t").toString
      spark.range(100)
        .selectExpr("id AS k", "CAST(id % 7 AS STRING) AS v", "id * 2.5 AS w")
        .write.parquet(p)
      val profiled = Profiling.columnProfile(
        spark.read.parquet(p), Seq("k", "v", "w"))
      val rels = profiled.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }
      assert(rels.size == 1,
        s"expected exactly one base-table scan, got ${rels.size}")
      // and the single scan still yields the exact typed profile
      val got = profiled.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
        .toMap
      assert(got("k") == ((100L, 0L, 100L, "0", "99")), got("k").toString)
      assert(got("v") == ((100L, 0L, 7L, "0", "6")), got("v").toString)
      assert(got("w") == ((100L, 0L, 100L, "0.0", "247.5")), got("w").toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("topKStreamable + explodeTopK ≡ topNPerGroup (the packed/streaming formulation)") {
    val df = Seq(
      ("a", 10L, 5.0), ("a", 11L, 9.0), ("a", 12L, 9.0), ("a", 13L, 1.0),
      ("b", 20L, 2.0)).toDF("g", "id", "s")
    val direct = Ranking.topNPerGroup(df, $"g", $"id", $"s", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val packed = Ranking.explodeTopK(
      Ranking.topKStreamable(df, "g", "s", "id", k = 2))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(direct == packed)
    assert(packed == Set(
      ("a", 1, 11L, 9.0), ("a", 2, 12L, 9.0), ("b", 1, 20L, 2.0)))
  }

  test("mergeAdditive: snapshot + delta equals full recompute; one-sided keys coalesce") {
    val snap = Seq((1L, 2L, BigDecimal(10)), (2L, 1L, BigDecimal(5)))
      .toDF("k", "n", "s")
    val delta = Seq((2L, 3L, BigDecimal(7)), (3L, 1L, BigDecimal(2)))
      .toDF("k", "n", "s")
    val got = Incremental.mergeAdditive(snap, delta, Seq("k"), Seq("n", "s"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(got == Map(
      1L -> ((2L, 10.0)), 2L -> ((4L, 12.0)), 3L -> ((1L, 2.0))))
    intercept[IllegalArgumentException] {
      Incremental.mergeAdditive(snap, delta, Seq("k"), Seq("missing"))
    }
  }
}

package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val day0 = ts("2024-01-01 00:00:00").getTime / 86400000L

  private val fixture = Seq(
    // u1: observed days 0, 3 (two events on day 0 sum), gap at 1-2
    (1L, ts("2024-01-01 10:00:00"), 2.5),
    (1L, ts("2024-01-01 11:00:00"), 1.5),
    (1L, ts("2024-01-04 09:00:00"), 7.0),
    // u2: a single day — no gaps, one row out
    (2L, ts("2024-01-02 00:00:00"), 3.0))
    .toDF("user_id", "ts", "value")

  test("locf carries the last daily sum across gaps; filled flags mark synthesized rows") {
    val out = TimeSeries.gapFill(fixture, $"user_id", $"ts", $"value", 86400L, "locf")
      .orderBy($"key", $"period").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, day0, 4.0, false),
      (1L, day0 + 1, 4.0, true),
      (1L, day0 + 2, 4.0, true),
      (1L, day0 + 3, 7.0, false),
      (2L, day0 + 1, 3.0, false)))
  }

  test("zero mode fills flow gaps with 0.0") {
    val out = TimeSeries.gapFill(fixture, $"user_id", $"ts", $"value", 86400L, "zero")
      .orderBy($"key", $"period").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (day0, 4.0, false), (day0 + 1, 0.0, true), (day0 + 2, 0.0, true),
      (day0 + 3, 7.0, false), (day0 + 1, 3.0, false)))
  }

  test("span guard and parameter guards are loud; repartition-invariant") {
    val wild = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2031-01-01 00:00:00"), 1.0)).toDF("user_id", "ts", "value")
    val e = intercept[Exception] {
      TimeSeries.gapFill(wild, $"user_id", $"ts", $"value", 86400L,
        "zero", maxPeriodsPerKey = 100).collect()
    }
    assert(e.getMessage.contains("periods"))
    intercept[IllegalArgumentException] {
      TimeSeries.gapFill(fixture, $"user_id", $"ts", $"value", 86400L, "linear")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.gapFill(fixture, $"user_id", $"ts", $"value", 0L)
    }
    val x = TimeSeries.gapFill(fixture, $"user_id", $"ts", $"value", 86400L, "locf")
      .orderBy($"key", $"period").collect()
    val y = TimeSeries.gapFill(fixture.repartition(7), $"user_id", $"ts", $"value",
      86400L, "locf").orderBy($"key", $"period").collect()
    assert(x.toSeq == y.toSeq)
  }

  test("linearTrend recovers an exact line; degenerate keys emit null") {
    // u1: daily sums on days d, d+1, d+2 are 1, 3, 5 → y = 2x + 1
    // exactly (x rebased to the first day); u2: single day → null
    val df = Seq(
      (1L, ts("2024-01-01 05:00:00"), 1.0),
      (1L, ts("2024-01-02 05:00:00"), 2.0),
      (1L, ts("2024-01-02 06:00:00"), 1.0),
      (1L, ts("2024-01-03 05:00:00"), 5.0),
      (2L, ts("2024-01-01 00:00:00"), 9.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.linearTrend(df, $"user_id", $"ts", $"value", 86400L)
      .orderBy($"key").collect()
    val u1 = out(0)
    assert(u1.getLong(1) == 3L)
    assert(u1.getDouble(2) == 2.0 && u1.getDouble(3) == 1.0,
      s"exact line must come back exactly, got ${u1.getDouble(2)}, ${u1.getDouble(3)}")
    assert(out(1).getLong(1) == 1L && out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("linearTrend statistics are bit-identical under repartitioning") {
    val big = (1 to 2000).map { i =>
      (i % 7L, ts(f"2024-01-${i % 28 + 1}%02d 12:00:00"), i * 0.37)
    }.toDF("user_id", "ts", "value")
    val a = TimeSeries.linearTrend(big, $"user_id", $"ts", $"value", 86400L)
      .orderBy($"key").collect()
    val b = TimeSeries.linearTrend(big.repartition(13), $"user_id", $"ts", $"value", 86400L)
      .orderBy($"key").collect()
    // == on Row compares doubles bitwise-equal via equals — the
    // decimal/long statistics make this hold, not just a tolerance
    assert(a.toSeq == b.toSeq)
    intercept[IllegalArgumentException] {
      TimeSeries.linearTrend(big, $"user_id", $"ts", $"value", 0L)
    }
  }

  test("ema folds the daily series in period order, seeded by the first observation") {
    // u1 daily sums: day0 = 8 (two events), day2 = 4, day3 = 0
    // ema: seed 8 → 8*.75 + 4*.25 = 7 → 7*.75 + 0*.25 = 5.25
    // (gap day1 is NOT filled — observed-periods-only contract)
    val df = Seq(
      (1L, ts("2024-01-01 01:00:00"), 5.0),
      (1L, ts("2024-01-01 02:00:00"), 3.0),
      (1L, ts("2024-01-03 01:00:00"), 4.0),
      (1L, ts("2024-01-04 01:00:00"), 0.0),
      (2L, ts("2024-01-02 12:00:00"), 9.0)) // single period → ema = 9
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.ema(df, $"user_id", $"ts", $"value", 86400L, alpha = 0.25)
      .orderBy($"key").collect()
    assert(out(0).getLong(1) == 3L && out(0).getDouble(3) == 5.25,
      s"got ${out(0).getDouble(3)}")
    assert(out(1).getLong(1) == 1L && out(1).getDouble(3) == 9.0)
    assert(out(0).getLong(2) == ts("2024-01-04 00:00:00").getTime / 86400000L)
    intercept[IllegalArgumentException] {
      TimeSeries.ema(df, $"user_id", $"ts", $"value", 86400L, alpha = 0.3)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.ema(df, $"user_id", $"ts", $"value", 86400L, alpha = 1.0)
    }
  }

  test("theilSenSlope shrugs off the outlier that drags OLS") {
    // days 0..3 on the exact line y = 2x, plus a wild day-4 spike:
    // 6 of 10 pairwise slopes are exactly 2, so the median is 2.0
    // bit-exact; the OLS slope on the same series is pulled far above
    val df = Seq(
      (1L, ts("2024-01-01 01:00:00"), 0.0),
      (1L, ts("2024-01-02 01:00:00"), 2.0),
      (1L, ts("2024-01-03 01:00:00"), 4.0),
      (1L, ts("2024-01-04 01:00:00"), 6.0),
      (1L, ts("2024-01-05 01:00:00"), 100.0),
      (2L, ts("2024-01-01 00:00:00"), 9.0)) // single period → null slope
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.theilSenSlope(df, $"user_id", $"ts", $"value", 86400L)
      .orderBy($"key").collect()
    assert(out(0).getLong(1) == 5L && out(0).getDouble(2) == 2.0,
      s"median pairwise slope must be exactly 2.0, got ${out(0).getDouble(2)}")
    assert(out(1).getLong(1) == 1L && out(1).isNullAt(2))
    val ols = TimeSeries.linearTrend(df.filter($"user_id" === 1L),
      $"user_id", $"ts", $"value", 86400L).collect().head.getDouble(2)
    assert(ols > 10.0, s"the spike must drag OLS (got $ols) while Theil-Sen holds 2.0")
    intercept[IllegalArgumentException] {
      TimeSeries.theilSenSlope(df, $"user_id", $"ts", $"value", 86400L,
        maxPeriodsPerKey = 1)
    }
    val e = intercept[Exception] {
      TimeSeries.theilSenSlope(df, $"user_id", $"ts", $"value", 86400L,
        maxPeriodsPerKey = 3).collect()
    }
    assert(e.getMessage.contains("periods"))
  }
}

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
}

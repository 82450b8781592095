package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohorts by first-active period; offsets count distinct users") {
    // daily periods. u1 active day 0, 1, 3; u2 active day 0 (twice —
    // dedup within a period); u3 first seen day 1, active day 3
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-04 10:00:00")),
      (2L, ts("2024-01-01 08:00:00")),
      (2L, ts("2024-01-01 23:00:00")),
      (3L, ts("2024-01-02 00:00:00")),
      (3L, ts("2024-01-04 23:59:59")))
      .toDF("user_id", "ts")
    val out = Funnel.retention(df, $"user_id", $"ts", periodSeconds = 86400L)
      .orderBy($"cohort_period", $"period_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val day0 = ts("2024-01-01 00:00:00").getTime / 86400000L
    assert(out == Map(
      (day0, 0L) -> 2L, // u1, u2
      (day0, 1L) -> 1L, // u1
      (day0, 3L) -> 1L, // u1
      (day0 + 1, 0L) -> 1L, // u3's own cohort
      (day0 + 1, 2L) -> 1L)) // u3 two days after its first day
  }

  test("repartition-invariant and null-tolerant") {
    val df = Seq(
      (Some(1L), Option(ts("2024-01-01 00:00:00"))),
      (Some(1L), None),
      (None, Option(ts("2024-01-02 00:00:00"))))
      .toDF("user_id", "ts")
    val a = Funnel.retention(df, $"user_id", $"ts", 86400L).collect()
    assert(a.length == 1 && a.head.getLong(2) == 1L)
    val big = (1L to 200L).map(u => u -> ts(f"2024-01-${u % 20 + 1}%02d 12:00:00"))
      .toDF("user_id", "ts")
    val x = Funnel.retention(big, $"user_id", $"ts", 7L * 86400L)
      .orderBy($"cohort_period", $"period_offset").collect()
    val y = Funnel.retention(big.repartition(17), $"user_id", $"ts", 7L * 86400L)
      .orderBy($"cohort_period", $"period_offset").collect()
    assert(x.toSeq == y.toSeq)
    intercept[IllegalArgumentException] {
      Funnel.retention(df, $"user_id", $"ts", 0L)
    }
  }
}

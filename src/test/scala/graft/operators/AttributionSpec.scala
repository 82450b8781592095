package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Attribution.touchAttribution]]: first/last-touch selection over
  * the (ts, event_id) total order, organic conversions keep NULL
  * touches, timestamp ties break on event_id, and the microsecond gap
  * is exact.
  */
class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Timestamp, Long, String)]) =
    Attribution.touchAttribution(
      rows.toDF("user_id", "ts", "event_id", "event_type"),
      col("user_id"), col("ts"), col("event_id"), col("event_type"),
      col("event_type") === "purchase")

  test("last touch is the latest preceding non-conversion; first is the earliest") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "purchase"),
      (1L, ts("2024-01-01 10:20:00"), 4L, "signup"),
      (1L, ts("2024-01-01 10:30:00"), 5L, "purchase"))
    val got = run(rows).collect().map(r => r.getLong(0) -> r).toMap
    val p1 = got(3L)
    assert(p1.getString(3) == "view" && p1.getString(5) == "click")
    assert(p1.getLong(7) == 5L * 60 * 1000000L) // 10:05 -> 10:10
    val p2 = got(5L)
    // first touch stays the very first event; last advances past the
    // earlier purchase to the signup
    assert(p2.getString(3) == "view" && p2.getString(5) == "signup")
    assert(p2.getLong(7) == 10L * 60 * 1000000L)
  }

  test("organic conversion (no preceding touch) keeps NULL touch columns") {
    val rows = Seq(
      (7L, ts("2024-01-01 09:00:00"), 10L, "purchase"),
      (7L, ts("2024-01-01 09:30:00"), 11L, "click"))
    val got = run(rows).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
  }

  test("timestamp tie breaks on event_id: the lower-id touch precedes") {
    val t = ts("2024-01-01 12:00:00")
    val rows = Seq(
      (2L, t, 20L, "click"),     // same instant, id below the purchase
      (2L, t, 21L, "purchase"),
      (2L, t, 22L, "view"))      // same instant, id above — must NOT attribute
    val got = run(rows).collect()
    assert(got.length == 1)
    assert(got.head.getString(5) == "click")
    assert(got.head.getLong(7) == 0L)
  }

  test("users never cross-attribute") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (2L, ts("2024-01-01 10:30:00"), 2L, "purchase"))
    val got = run(rows).collect()
    assert(got.length == 1 && got.head.isNullAt(5))
  }
}

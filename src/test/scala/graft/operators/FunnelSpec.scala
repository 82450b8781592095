package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture = Seq(
    // u1: full funnel inside the window
    (1L, ts("2024-01-01 00:00:00"), "view"),
    (1L, ts("2024-01-01 01:00:00"), "click"),
    (1L, ts("2024-01-01 02:00:00"), "purchase"),
    // u2: purchase BEFORE click — order matters, stage stops at click
    (2L, ts("2024-01-01 00:00:00"), "view"),
    (2L, ts("2024-01-01 00:30:00"), "purchase"),
    (2L, ts("2024-01-01 01:00:00"), "click"),
    // u3: click only at the EXACT same ts as view — strictly-after
    // ordering rejects it, stage 1
    (3L, ts("2024-01-01 00:00:00"), "view"),
    (3L, ts("2024-01-01 00:00:00"), "click"),
    // u4: click inside the window; purchase one ms past the deadline
    // does not count
    (4L, ts("2024-01-01 00:00:00"), "view"),
    (4L, ts("2024-01-01 01:00:00"), "click"),
    (4L, new Timestamp(ts("2024-01-01 02:00:00").getTime + 1), "purchase"),
    // u5: no view at all — not in the funnel output
    (5L, ts("2024-01-01 00:00:00"), "click"),
    (5L, ts("2024-01-01 00:10:00"), "purchase"))
    .toDF("user_id", "ts", "event_type")

  test("stages, ordering, and window boundaries") {
    // 2h window → deadline = 02:00:00 for every user. u1's purchase
    // lands exactly AT the deadline (inclusive — kept); u4's purchase
    // 1ms past it is dropped.
    val out = Funnel.earliest(fixture, $"user_id", $"ts", $"event_type",
      Seq("view", "click", "purchase"), windowSeconds = 7200L)
      .orderBy($"user").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byUser = out.map(r => r.getLong(0) -> r).toMap
    assert(byUser(1L).getInt(4) == 3 && byUser(1L).getBoolean(5),
      "purchase exactly at the deadline is inside the window")
    // u2: purchase at 00:30 is AFTER its click at 01:00? No — click is
    // at 01:00, purchase 00:30 < click → not strictly after → stage 2
    assert(byUser(2L).getInt(4) == 2 && !byUser(2L).getBoolean(5))
    assert(byUser(3L).getInt(4) == 1)
    assert(byUser(4L).getInt(4) == 2,
      "purchase 1ms past the deadline is outside the window")
  }

  test("earliest traversal is greedy: taking the first feasible step never hurts") {
    // view@0; clicks at 10 and 20; purchase at 15 — only the click@10
    // traversal converts. A latest-click formulation would miss it.
    val df = Seq(
      (9L, ts("2024-01-01 00:00:00"), "view"),
      (9L, ts("2024-01-01 00:10:00"), "click"),
      (9L, ts("2024-01-01 00:20:00"), "click"),
      (9L, ts("2024-01-01 00:15:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.earliest(df, $"user_id", $"ts", $"event_type",
      Seq("view", "click", "purchase"), windowSeconds = 3600L).collect().head
    assert(r.getInt(4) == 3 && r.getBoolean(5))
    assert(r.getTimestamp(2) == ts("2024-01-01 00:10:00"))
  }

  test("null timestamps and null users drop; parameter guards are loud") {
    val df = Seq(
      (Some(8L), Option(ts("2024-01-01 00:00:00")), "view"),
      (Some(8L), None, "click"),
      (None, Option(ts("2024-01-01 00:05:00")), "click"))
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.earliest(df, $"user_id", $"ts", $"event_type",
      Seq("view", "click"), windowSeconds = 3600L).collect()
    assert(r.length == 1 && r.head.getInt(3) == 1,
      "the only click has a null ts — it cannot advance the funnel")
    intercept[IllegalArgumentException] {
      Funnel.earliest(df, $"user_id", $"ts", $"event_type", Seq("view"), 10L)
    }
    intercept[IllegalArgumentException] {
      Funnel.earliest(df, $"user_id", $"ts", $"event_type", Seq("view", "view"), 10L)
    }
    intercept[IllegalArgumentException] {
      Funnel.earliest(df, $"user_id", $"ts", $"event_type", Seq("view", "click"), 0L)
    }
  }

  test("result is repartition-invariant (mins are order-free)") {
    val base = fixture
    val a = Funnel.earliest(base, $"user_id", $"ts", $"event_type",
      Seq("view", "click", "purchase"), 3600L).orderBy($"user").collect()
    val b = Funnel.earliest(base.repartition(7, $"event_type"), $"user_id", $"ts",
      $"event_type", Seq("view", "click", "purchase"), 3600L)
      .orderBy($"user").collect()
    assert(a.toSeq == b.toSeq)
  }
}

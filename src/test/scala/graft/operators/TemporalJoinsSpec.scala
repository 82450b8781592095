package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** TemporalJoins (as-of + bounded range) against brute-force
  * re-derivations on controlled inputs, plus plan-shape assertions
  * (the whole point of the binned range join is that no cartesian /
  * nested-loop join appears).
  */
class TemporalJoinsSpec extends SparkTestBase {

  // (id, user, t_us, kind, value) — timestamps built from µs longs so
  // boundary cases are exact. Users 1 and 2 interleave; user 3 has
  // probes but no refs (unmatched path); user 4 has a ref-time TIE.
  private def fixture = {
    import spark.implicits._
    Seq(
      // user 1: clicks at 100s, 200s; errors at 150s, 200s, 50s
      (1L, 1L, 100000000L, "click", 1.0),
      (2L, 1L, 200000000L, "click", 2.0),
      (3L, 1L, 150000000L, "error", 0.0),
      (4L, 1L, 200000000L, "error", 0.0), // equal ts → inclusive picks click 2
      (5L, 1L, 50000000L, "error", 0.0), // before any click
      // user 2: one click after the error only
      (6L, 2L, 500000000L, "error", 0.0),
      (7L, 2L, 600000000L, "click", 3.0),
      // user 3: error, no clicks at all
      (8L, 3L, 100000000L, "error", 0.0),
      // user 4: two clicks at the SAME ts → max event_id must win
      (9L, 4L, 100000000L, "click", 4.0),
      (10L, 4L, 100000000L, "click", 5.0),
      (11L, 4L, 300000000L, "error", 0.0),
    ).toDF("event_id", "user_id", "t_us", "event_type", "value")
      .withColumn("ts", timestamp_micros($"t_us"))
  }

  private def run(strict: Boolean) = {
    import spark.implicits._
    val e = fixture
    TemporalJoins.asofJoin(
      e.filter($"event_type" === "error"), e.filter($"event_type" === "click"),
      probeKey = $"user_id", probeTime = $"ts",
      refKey = $"user_id", refTime = $"ts",
      probeOut = Seq("event_id" -> $"event_id"),
      refOut = Seq("click_id" -> $"event_id", "click_value" -> $"value"),
      refOrder = $"event_id",
      strict = strict)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
  }

  test("asofJoin: inclusive picks newest ref at-or-before, ties by max refOrder") {
    val got = run(strict = false)
    assert(got == Map(
      3L -> Some(1L), // click@100 <= error@150
      4L -> Some(2L), // equal ts included
      5L -> None, // no click yet
      6L -> None, // click is after the error
      8L -> None, // user has no clicks
      11L -> Some(10L), // ts tie between clicks 9/10 → max event_id
    ))
  }

  test("asofJoin: strict excludes equal-time refs") {
    val got = run(strict = true)
    assert(got(4L) == Some(1L)) // equal-ts click 2 excluded → falls back to click 1
    assert(got(3L) == Some(1L) && got(11L) == Some(10L)) // strictly-prior unchanged
  }

  test("asofJoin: every probe row survives exactly once (left semantics)") {
    assert(run(strict = false).keySet == Set(3L, 4L, 5L, 6L, 8L, 11L))
  }

  test("rangeJoinPairs: equals brute force on seeded data, boundary inclusive") {
    import spark.implicits._
    // deterministic pseudo-random events: 3 users × 40 events whose
    // times come from a hash mix — no RNG, reproducible
    val rows = for {
      u <- 1L to 3L
      i <- 0L until 40L
    } yield {
      val t = ((u * 7919L + i * 104729L) % 1000L) * 1000000L // µs, 0..999 s
      val kind = if (i % 3 == 0) "error" else "click"
      (u * 100 + i, u, t, kind)
    }
    val df = rows.toDF("event_id", "user_id", "t_us", "event_type")
      .withColumn("ts", timestamp_micros($"t_us"))
    val tol = 60L
    val got = TemporalJoins.rangeJoinPairs(
      df.filter($"event_type" === "error"), df.filter($"event_type" === "click"),
      leftKey = $"user_id", leftTime = $"ts",
      rightKey = $"user_id", rightTime = $"ts",
      toleranceSeconds = tol,
      leftOut = Seq("a" -> $"event_id"),
      rightOut = Seq("b" -> $"event_id"))
    val gotPairs = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ia, ua, ta, ka) <- rows if ka == "error"
      (ib, ub, tb, kb) <- rows if kb == "click" && ub == ua &&
        math.abs(tb - ta) <= tol * 1000000L
    } yield (ia, ib)).toSet
    assert(gotPairs == want)
    assert(want.nonEmpty, "fixture must exercise matches")
    // each pair appears exactly once despite the 3-bin expansion
    assert(got.count() == gotPairs.size)
    // delta sign: right minus left
    val d = got.filter(col("a") === col("b") - 1).select("delta_seconds")
    d.collect() // just force it; schema presence is the check
  }

  test("rangeJoinPairs boundary: |delta| == tolerance joins, +1µs does not") {
    import spark.implicits._
    val l = Seq((1L, 1L, 0L)).toDF("event_id", "user_id", "t_us")
      .withColumn("ts", timestamp_micros($"t_us"))
    val r = Seq((2L, 1L, 10000000L), (3L, 1L, 10000001L))
      .toDF("event_id", "user_id", "t_us")
      .withColumn("ts", timestamp_micros($"t_us"))
    val got = TemporalJoins.rangeJoinPairs(
      l, r, $"user_id", $"ts", $"user_id", $"ts", toleranceSeconds = 10L,
      leftOut = Seq("a" -> $"event_id"), rightOut = Seq("b" -> $"event_id"))
      .select("b").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L)) // exactly-at-tolerance in; 1 µs past out
  }

  test("temporal joins plan shape: no cartesian or nested-loop join") {
    import spark.implicits._
    val e = fixture
    val asof = TemporalJoins.asofJoin(
      e.filter($"event_type" === "error"), e.filter($"event_type" === "click"),
      $"user_id", $"ts", $"user_id", $"ts",
      Seq("a" -> $"event_id"), Seq("b" -> $"event_id"), refOrder = $"event_id")
    val range = TemporalJoins.rangeJoinPairs(
      e.filter($"event_type" === "error"), e.filter($"event_type" === "click"),
      $"user_id", $"ts", $"user_id", $"ts", 60L,
      Seq("a" -> $"event_id"), Seq("b" -> $"event_id"))
    Seq(asof, range).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"temporal join degraded to a product plan:\n$plan")
    }
  }

  test("asofJoin rejects colliding output names") {
    import spark.implicits._
    val e = fixture
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(
        e, e, $"user_id", $"ts", $"user_id", $"ts",
        Seq("x" -> $"event_id"), Seq("x" -> $"event_id"), refOrder = $"event_id")
    }
  }
}

package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** [[PatternMatch]] semantics: the pure transition function, the
  * window reset, first-match/non-overlap rules, and stream ≡ batch
  * parity across micro-batch splits.
  */
class PatternMatchSpec extends SparkTestBase {
  import PatternMatch._

  private val steps = Seq("view", "click", "purchase")

  private val genEvents: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(0, 60)
    ts <- Gen.listOfN(n, Gen.chooseNum(0L, 500L))
    ty <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase", "other", "view"))
  } yield ts.sorted.zip(ty)

  test("property: emissions are windowed, ordered, non-overlapping, prefix-stable, noise-immune, split-invariant") {
    val w = 100L
    val prop = Prop.forAll(genEvents, Gen.chooseNum(0, 60)) { (evs, cutRaw) =>
      val (_, whole) = advance(PatState(0, 0L), evs, steps, w)
      val windowed = whole.forall { case (a, b) => a <= b && b - a <= w }
      val ordered = whole == whole.sortBy(_._2)
      val nonOverlap = whole.sliding(2).forall {
        case Seq((_, b1), (a2, _)) => a2 >= b1
        case _ => true
      }
      // split anywhere: state carries across the cut
      val cut = math.min(cutRaw, evs.size)
      val (s1, e1) = advance(PatState(0, 0L), evs.take(cut), steps, w)
      val (_, e2) = advance(s1, evs.drop(cut), steps, w)
      val splitInvariant = (e1 ++ e2) == whole
      // prefix stability: more events never retract a detection
      val prefixStable = e1 == whole.take(e1.size)
      // non-step noise cannot change the answer
      val denoised = advance(
        PatState(0, 0L), evs.filter(e => steps.contains(e._2)), steps, w)._2
      windowed && ordered && nonOverlap && splitInvariant && prefixStable &&
        denoised == whole
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private def run(evs: (Long, String)*): Seq[(Long, Long)] =
    advance(PatState(0, 0L), evs, steps, windowUs = 100L)._2

  test("advance: complete pattern emits (t0, tEnd); incomplete emits nothing") {
    assert(run((1L, "view"), (2L, "click"), (3L, "purchase")) == Seq((1L, 3L)))
    assert(run((1L, "view"), (2L, "click")) == Seq.empty)
    assert(run((1L, "click"), (2L, "purchase")) == Seq.empty)
  }

  test("advance: window expiry resets; the expiring event can restart a match") {
    // view@1, click@2, purchase@200 — beyond the 100µs window: no emit
    assert(run((1L, "view"), (2L, "click"), (200L, "purchase")) == Seq.empty)
    // view@1 stale by view@200 which restarts; completes at 210
    assert(run((1L, "view"), (200L, "view"), (205L, "click"), (210L, "purchase"))
      == Seq((200L, 210L)))
  }

  test("advance: first-match semantics — a second view does not slide the window") {
    assert(run((1L, "view"), (50L, "view"), (60L, "click"), (99L, "purchase"))
      == Seq((1L, 99L)))
  }

  test("advance: completion consumes state — back-to-back matches do not overlap") {
    assert(run(
      (1L, "view"), (2L, "click"), (3L, "purchase"),
      (4L, "view"), (5L, "click"), (6L, "purchase"))
      == Seq((1L, 3L), (4L, 6L)))
    // a purchase right after completion has no in-flight match
    assert(run((1L, "view"), (2L, "click"), (3L, "purchase"), (4L, "purchase"))
      == Seq((1L, 3L)))
  }

  test("advance: state carries across batch boundaries (split anywhere, same result)") {
    val evs = Seq(
      (1L, "view"), (2L, "other"), (3L, "click"), (90L, "purchase"),
      (95L, "view"), (99L, "click"), (300L, "purchase"), (301L, "view"),
      (302L, "click"), (303L, "purchase"))
    val whole = advance(PatState(0, 0L), evs, steps, 100L)._2
    for (cut <- 1 until evs.size) {
      val (s1, e1) = advance(PatState(0, 0L), evs.take(cut), steps, 100L)
      val (_, e2) = advance(s1, evs.drop(cut), steps, 100L)
      assert(e1 ++ e2 == whole, s"split at $cut diverged")
    }
  }

  test("detectEventTime: shuffled in-batch order + one-batch-late events == ordered batch result; state drains to zero") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val windowUs = 100L * 1000000L // 100 s
    // three users; matches that span the batch cut AND depend on
    // events delivered a batch late
    val ordered = Seq(
      Ev(1L, t(1), "view", 1), Ev(1L, t(2), "click", 2),
      Ev(1L, t(3), "purchase", 3), // complete inside batch 1's range
      Ev(2L, t(4), "view", 4), // batch-1-range start...
      Ev(2L, t(40), "click", 5), Ev(2L, t(50), "purchase", 6), // ...completed by batch 2
      Ev(3L, t(5), "view", 7), Ev(3L, t(6), "click", 8),
      Ev(3L, t(200), "purchase", 9), // beyond window: no match
      Ev(3L, t(210), "view", 10), Ev(3L, t(215), "click", 11),
      Ev(3L, t(220), "purchase", 12), // fresh complete match
      Ev(1L, t(45), "other", 13)) // noise
    val expected = PatternMatch
      .detectBatch(ordered.toDS(), steps, windowUs)
      .collect().map(d => (d.user_id, d.start_us, d.end_us)).toSet
    assert(expected.nonEmpty, "fixture must produce detections")

    // delivery plan: batch 1 gets PART of the early events, SHUFFLED;
    // batch 2 gets the rest shuffled PLUS two early events arriving a
    // whole batch late (ids 2 and 7, still inside the 60 s lateness
    // horizon); batch 3 is a far-future flush sentinel (non-step type:
    // advances the watermark, never enters state)
    val late = ordered.filter(e => Set(2L, 7L).contains(e.event_id))
    val batch1 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) <= 6000000L && !Set(2L, 7L).contains(e.event_id)))
    val batch2 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) > 6000000L) ++ late)
    val sentinel = Ev(999L, t(10000), "other", 99)

    val input = MemoryStream[Ev]
    val q = PatternMatch
      .detectEventTime(input.toDS(), steps, windowUs, delay = "60 seconds")
      .writeStream.format("memory").queryName("cep_ooo_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("cep_ooo_out").as[Detection]
        .collect().map(d => (d.user_id, d.start_us, d.end_us)).toSet
      assert(got == expected,
        s"out-of-order stream diverged: got $got expected $expected")
      // the leak assertion: every buffer sealed, every partial match
      // evicted, every empty state removed — zero rows in the store
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 0L, s"state store not drained: $stateRows rows")
    } finally q.stop()
  }

  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  test("detectBatch matches the documented example end to end") {
    import spark.implicits._
    def t(us: Long) = {
      val ts = new java.sql.Timestamp(us / 1000000L * 1000L)
      ts.setNanos(((us % 1000000L) * 1000L).toInt)
      ts
    }
    val ds = Seq(
      Ev(1L, t(1000), "view", 1), Ev(1L, t(2000), "click", 2),
      Ev(1L, t(3000), "purchase", 3),
      Ev(2L, t(1000), "view", 4), Ev(2L, t(2000), "purchase", 5)).toDS()
    val got = PatternMatch.detectBatch(ds, steps, windowUs = 10000L)
      .collect().map(d => (d.user_id, d.start_us, d.end_us)).toSet
    assert(got == Set((1L, 1000L, 3000L)))
  }
}

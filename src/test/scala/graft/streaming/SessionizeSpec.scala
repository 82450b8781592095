package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The stateful streaming sessionizer must agree with the batch (lag +
  * cumsum) formulation — stream/batch parity for custom state.
  */
class SessionizeSpec extends SparkTestBase {

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  private val eventsSeq = Seq(
    // user 1: two sessions (gap 25 min > 10)
    Sessionize.Event(1L, ts(0), 1.0),
    Sessionize.Event(1L, ts(5), 2.0),
    Sessionize.Event(1L, ts(30), 3.0),
    Sessionize.Event(1L, ts(35), 4.0),
    // user 2: one session
    Sessionize.Event(2L, ts(1), 10.0),
    Sessionize.Event(2L, ts(9), 10.0))

  test("streaming flatMapGroupsWithState sessions == batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.streaming(input.toDS(), gapMinutes = 10,
      stragglerTimeout = false)
    val q = sessions.writeStream
      .format("memory").queryName("sessionize_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // two batches: first closes nothing, second closes user 1's first
      // session (gap exceeded within the same user's event sequence)
      input.addData(eventsSeq.take(2): _*)
      q.processAllAvailable()
      input.addData(eventsSeq.drop(2): _*)
      q.processAllAvailable()
      val closed = spark.table("sessionize_out").as[Sessionize.Session].collect()
      // user 1's first session must be closed by the arrival of ts=30
      assert(closed.exists(s =>
        s.user_id == 1 && s.n_events == 2 && s.total_value == 3.0 &&
          s.session_start == ts(0) && s.session_end == ts(5)))
      // still-open sessions (user1 second, user2) are in state, not output
      assert(closed.length == 1)
    } finally q.stop()

    // batch formulation on the same data: all 3 sessions
    val batch = Sessionize.batch(eventsSeq.toDF(), gapMinutes = 10)
      .orderBy($"user_id", $"session_start").collect()
    assert(batch.length == 3)
    assert(batch.map(r => (r.getLong(0), r.getInt(3))).toSeq ==
      Seq((1L, 2), (1L, 2), (2L, 2)))
  }

  test("a cross-batch late event extends the session start backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.streaming(input.toDS(), gapMinutes = 10,
      stragglerTimeout = false)
    val q = sessions.writeStream
      .format("memory").queryName("sessionize_late_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1 opens a session at ts=10; batch 2 delivers a LATE event
      // at ts=5 (within gap of last=10) that must pull session_start
      // back, then an event past the gap closes the session
      input.addData(Sessionize.Event(7L, ts(10), 1.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(7L, ts(5), 2.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(7L, ts(60), 9.0))
      q.processAllAvailable()
      val closed = spark.table("sessionize_late_out").as[Sessionize.Session].collect()
      assert(closed.length == 1)
      val s = closed.head
      assert(s.session_start == ts(5), s"late event did not extend start: $s")
      assert(s.session_end == ts(10) && s.n_events == 2 && s.total_value == 3.0)
    } finally q.stop()
  }

  test("a straggler older than the open session by more than the gap closes separately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.streaming(input.toDS(), gapMinutes = 10,
      stragglerTimeout = false)
    val q = sessions.writeStream
      .format("memory").queryName("sessionize_straggler_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1 opens a session at ts=240 (4h); batch 2 delivers two
      // stragglers around ts=0 — 4 hours BEFORE the open session. The
      // old signed gap test (t - last <= gap) merged them into one
      // 4-hour session; the batch twin splits them, and so must we:
      // the straggler pair closes as its own session, the ts=240
      // session stays open (and closes when ts=300 exceeds the gap)
      input.addData(Sessionize.Event(9L, ts(240), 1.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(9L, ts(0), 2.0), Sessionize.Event(9L, ts(5), 3.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(9L, ts(300), 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessionize_straggler_out")
        .as[Sessionize.Session].collect().sortBy(_.session_start.getTime)
      assert(closed.length == 2, s"expected straggler pair + first session, got ${closed.toSeq}")
      assert(closed(0).session_start == ts(0) && closed(0).session_end == ts(5) &&
        closed(0).n_events == 2 && closed(0).total_value == 5.0)
      assert(closed(1).session_start == ts(240) && closed(1).session_end == ts(240) &&
        closed(1).n_events == 1 && closed(1).total_value == 1.0)

      // batch twin on the union agrees: 3 sessions total
      val batch = Sessionize.batch(Seq(
        Sessionize.Event(9L, ts(240), 1.0), Sessionize.Event(9L, ts(0), 2.0),
        Sessionize.Event(9L, ts(5), 3.0), Sessionize.Event(9L, ts(300), 4.0)).toDF(),
        gapMinutes = 10).collect()
      assert(batch.length == 3)
    } finally q.stop()
  }

  test("property: advance() over in-order micro-batches == global gap-split; conservation under ANY batching") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import scala.collection.mutable.ArrayBuffer

    def dec(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // independent reference: one pass over the globally-sorted events,
    // split where the gap exceeds gapUs (pure integer-µs formulation)
    def reference(sorted: Seq[(Long, Double)], gapUs: Long): Seq[(Long, Long, Int, BigDecimal)] = {
      val groups = ArrayBuffer.empty[ArrayBuffer[(Long, Double)]]
      sorted.foreach { case (t, v) =>
        if (groups.nonEmpty && t - groups.last.last._1 <= gapUs) groups.last += ((t, v))
        else groups += ArrayBuffer((t, v))
      }
      groups.map(g => (g.head._1, g.last._1, g.size,
        g.foldLeft(BigDecimal(0))((a, e) => a + dec(e._2)))).toSeq
    }
    def drive(chunks: Seq[Seq[(Long, Double)]], gapUs: Long): Seq[Sessionize.SessionState] = {
      var state: Option[Sessionize.SessionState] = None
      val closed = ArrayBuffer.empty[Sessionize.SessionState]
      chunks.foreach { c =>
        val (cl, op) = Sessionize.advance(state, c, gapUs)
        closed ++= cl
        state = op
      }
      (closed ++ state.toSeq).toSeq
    }

    val gen = for {
      n <- Gen.choose(0, 60)
      ts <- Gen.listOfN(n, Gen.choose(0L, 5000000L))
      vs <- Gen.listOfN(n, Gen.choose(-700, 700).map(_ / 7.0))
      gapUs <- Gen.choose(1L, 400000L)
      cuts <- Gen.listOfN(6, Gen.choose(0, math.max(n, 1)))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (ts.zip(vs), gapUs, cuts, seed)

    val prop = Prop.forAll(gen) { case (events, gapUs, cuts, seed) =>
      val sorted = events.sortBy(identity)
      val ref = reference(sorted, gapUs)

      // 1. EXACT parity when batches are consecutive chunks of the
      //    event-time order (arbitrary chunk boundaries)
      val bounds = (0 +: cuts.map(math.min(_, sorted.length)) :+ sorted.length).sorted
      val ordered = bounds.zip(bounds.tail).map { case (a, b) => sorted.slice(a, b) }
      val got = drive(ordered, gapUs)
        .sortBy(s => (s.start, s.last))
        .map(s => (s.start, s.last, s.n, s.total))
      val orderedOk = got == ref

      // 2. CONSERVATION under completely arbitrary (out-of-order)
      //    batching: every event lands in exactly one emitted session,
      //    totals conserve exactly, and each session is internally
      //    gap-valid (the exact session SET may legitimately differ —
      //    state keeps only the chronologically-last open session)
      val shuffled = new scala.util.Random(seed).shuffle(events)
      val arbitrary = shuffled.grouped(math.max(1, shuffled.length / 4 + 1)).toSeq
      val got2 = drive(arbitrary, gapUs)
      val conserveOk =
        got2.map(_.n).sum == events.length &&
          got2.foldLeft(BigDecimal(0))((a, s) => a + s.total) ==
            events.foldLeft(BigDecimal(0))((a, e) => a + dec(e._2)) &&
          got2.forall(s => s.start <= s.last)

      orderedOk && conserveOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("sub-millisecond boundary gaps split exactly like the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def tsMicro(sec: Long, micro: Int): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(sec * 1000L)
      t.setNanos(micro * 1000)
      t
    }
    // gap=1min; second event at exactly gap + 500µs — a ms-truncated
    // comparison sees exactly 60000ms (merge), µs precision sees
    // 60000500µs > gap (split), matching batch's fractional doubles
    val e1 = Sessionize.Event(11L, tsMicro(0, 0), 1.0)
    val e2 = Sessionize.Event(11L, tsMicro(60, 500), 2.0)
    val e3 = Sessionize.Event(11L, tsMicro(7200, 0), 3.0)

    val batch = Sessionize.batch(Seq(e1, e2, e3).toDF(), gapMinutes = 1).collect()
    assert(batch.length == 3, s"batch twin should split at +500µs: ${batch.toSeq}")

    val input = MemoryStream[Sessionize.Event]
    val q = Sessionize.streaming(input.toDS(), gapMinutes = 1, stragglerTimeout = false)
      .writeStream.format("memory").queryName("sessionize_micro_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(e1, e2, e3)
      q.processAllAvailable()
      val closed = spark.table("sessionize_micro_out").as[Sessionize.Session].collect()
      assert(closed.length == 2, s"stream must split at +500µs like batch: ${closed.toSeq}")
      assert(closed.map(_.n_events).toSeq == Seq(1, 1))
      // emitted timestamps round-trip the microsecond component
      assert(closed.exists(_.session_start == tsMicro(60, 500)))
    } finally q.stop()
  }
}

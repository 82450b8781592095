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
}

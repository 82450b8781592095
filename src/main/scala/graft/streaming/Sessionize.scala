package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state streaming
  * operator (`flatMapGroupsWithState`), plus the batch formulation
  * (lag + cumulative sum) that defines its semantics and serves as the
  * oracle: a session is a maximal run of a user's events with
  * consecutive gaps ≤ `gap`.
  */
// Serializable: the flatMapGroupsWithState closure calls the object's
// µs-conversion helpers, so the (stateless) module ships with the task
object Sessionize extends Serializable {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  // total accumulates as an exact decimal (scale 6, HALF_UP per event —
  // mirroring the batch twin's cast to decimal(18,6) before summing) so
  // stream/batch parity cannot drift by a ulp from double fold order.
  // start/last are event-time MICROSECONDS: the batch twin compares
  // fractional-second doubles (µs-precision timestamps), so a
  // millisecond-truncated getTime would split/merge sub-ms boundary
  // gaps differently than the oracle
  final case class SessionState(
      start: Long, last: Long, n: Int, total: BigDecimal)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toTimestamp(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int,
      total_value: Double)

  /** Batch sessionization: session boundary where the gap from the
    * previous event exceeds `gapMinutes`; session id = cumulative count
    * of boundaries. Deterministic (unique per-user order by ts,
    * tie-broken by value).
    */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "value")
    val gapUs = gapMinutes * 60000000L
    // EXACT integer microseconds on both sides (matching the streaming
    // twin's `t - s.last <= gapUs` and the oracle's epoch_us): the
    // earlier double-cast comparison carried ~0.5 µs of rounding at
    // epoch magnitudes, so an event exactly at the gap boundary could
    // split in batch yet merge in streaming. Null-ts events DROP in
    // both modes (the streaming path's µs conversion cannot represent
    // them; batch emitting junk null-boundary sessions for the same
    // rows would be a parity break, not tolerance).
    events
      .filter(col("ts").isNotNull)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .drop("session_no")
  }

  /** Streaming sessionization with explicit state: one
    * [[SessionState]] per user, closed and emitted when the event-time
    * gap is exceeded (or, when `stragglerTimeout` is on, via
    * processing-time timeout so the last session of an idle user
    * eventually flushes). Note: processing-time timeouts keep the
    * no-data batch loop alive — turn `stragglerTimeout` off for
    * drain-and-stop tests (`processAllAvailable` never quiesces
    * otherwise). Input must be a STREAMING Dataset[Event]; output
    * appends closed sessions.
    */
  private def dec(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** One micro-batch's state transition, PURE (property-tested against
    * an independent batch reference in SessionizeSpec): gap-split the
    * batch's (micros, value) events into session runs, coalesce them
    * with the carried-over open session in chronological order, close
    * everything but the chronologically-last session. A cross-batch
    * straggler run merges only when genuinely within the gap of its
    * neighbor (an unconditional `t <= last + gap` test would swallow
    * arbitrarily old events into the current session); nothing later in
    * event time can re-open a closed predecessor within this state
    * model, so the dropped sessions are final.
    */
  private[streaming] def advance(
      state: Option[SessionState],
      batch: Seq[(Long, Double)],
      gapUs: Long): (Seq[SessionState], Option[SessionState]) = {
    // 1. gap-split THIS batch (sorted, so runs only extend forward)
    val runs = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    batch.sortBy(identity).foreach { case (t, v) =>
      runs.lastOption match {
        case Some(s) if t - s.last <= gapUs =>
          runs(runs.length - 1) = s.copy(last = t, n = s.n + 1, total = s.total + dec(v))
        case _ => runs += SessionState(t, t, 1, dec(v))
      }
    }
    // 2. coalesce with the open session in chronological order
    val all = (state.toSeq ++ runs).sortBy(s => (s.start, s.last))
    val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    all.foreach { s =>
      merged.lastOption match {
        case Some(p) if s.start - p.last <= gapUs =>
          merged(merged.length - 1) = SessionState(
            math.min(p.start, s.start), math.max(p.last, s.last),
            p.n + s.n, p.total + s.total)
        case _ => merged += s
      }
    }
    // 3. all but the chronologically-last close; the last stays open
    (merged.dropRight(1).toSeq, merged.lastOption)
  }

  def streaming(
      events: Dataset[Event],
      gapMinutes: Int,
      stragglerTimeout: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    val gapUs = gapMinutes * 60000000L

    def toSession(uid: Long, s: SessionState): Session = Session(
      uid, toTimestamp(s.start), toTimestamp(s.last), s.n, s.total.toDouble)

    val timeoutConf =
      if (stragglerTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    events
      .filter((e: Event) => e.ts != null) // null-ts drops, as in batch
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession(uid, _)).iterator
            state.remove()
            out
          } else {
            val (closed, open) = advance(
              state.getOption, it.map(e => (micros(e.ts), e.value)).toSeq, gapUs)
            open match {
              case Some(s) =>
                state.update(s)
                if (stragglerTimeout) state.setTimeoutDuration(gapMs)
              case None => state.remove()
            }
            closed.map(toSession(uid, _)).iterator
          }
      }
  }
}

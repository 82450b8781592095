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
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  // total accumulates as an exact decimal (scale 6, HALF_UP per event —
  // mirroring the batch twin's cast to decimal(18,6) before summing) so
  // stream/batch parity cannot drift by a ulp from double fold order
  final case class SessionState(
      start: Long, last: Long, n: Int, total: BigDecimal)

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
    val gapSec = gapMinutes * 60.0
    // fractional-second epoch on both sides (a truncating unix_timestamp
    // would disagree with the oracle's epoch() near the gap boundary)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > gapSec, 1)
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
  def streaming(
      events: Dataset[Event],
      gapMinutes: Int,
      stragglerTimeout: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def toSession(uid: Long, s: SessionState): Session = Session(
      uid, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
      s.n, s.total.toDouble)

    def dec(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

    val timeoutConf =
      if (stragglerTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession(uid, _)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a late event may predate the session start — extend
                  // BOTH bounds, or session_start disagrees with the
                  // batch oracle's min(ts)
                  cur = Some(s.copy(
                    start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1,
                    total = s.total + dec(e.value)))
                case Some(s) =>
                  closed += toSession(uid, s)
                  cur = Some(SessionState(t, t, 1, dec(e.value)))
                case None =>
                  cur = Some(SessionState(t, t, 1, dec(e.value)))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                if (stragglerTimeout) state.setTimeoutDuration(gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}

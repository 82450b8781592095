package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING CUSUM DRIFT ALERTS — Page's cumulative-sum change
  * detector (Page 1954) as a live monitor: per key, the one-sided
  * CUSUM statistic over value deviations from the `allowance` k,
  *
  *   S_t = max(0, S_{t−1} + (v_t − k))  =  R_t − min(0, min_{j≤t} R_j),
  *
  * with an alert the moment S crosses the `threshold` h FROM BELOW —
  * the sequential "has the level drifted up" alarm (SLA latency
  * creep, cost-per-unit drift, error-rate ramps). No alarm reset: the
  * right-hand closed form keeps the statistic declarative, so a
  * window-SQL oracle replays it exactly, and re-crossings after a dip
  * below h alert again — the monitoring semantics.
  *
  * Out-of-order arrival rides the watermark-buffer template (sixth
  * instance: [[PatternMatch]], [[NegativeFunnel]], `Throttle`,
  * [[RunLength]], [[HighWater]]): arrivals buffer per key, the
  * watermark seals a prefix whose event-time order is final, sealed
  * events run through the pure integer fold. Order matters — WHICH
  * event crosses depends on the running prefix.
  *
  * State per key is the unsealed buffer plus TWO scalars (the running
  * sum R and its prefix minimum m) that never expire — all-time
  * monitors reset upstream by re-keying (e.g. key = (service, week)).
  * All arithmetic is int64 cents — exact, engine-portable.
  */
object Cusum extends Serializable {

  final case class CuEv(
      key: String, ts: java.sql.Timestamp, event_id: Long, value_cents: Long)

  final case class CuAlert(
      key: String, alert_us: Long, event_id: Long, cusum_cents: Long)

  private[streaming] final case class CuBuf(t: Long, id: Long, v: Long)

  private[streaming] final case class CuState(
      r: Long, m: Long, drainedTo: Long, buf: Seq[CuBuf])

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** One sealed slice through the fold, PURE; events must arrive
    * sorted by (event-time, id). Returns the new (R, m) scalars and
    * the alert rows (t, id, S-at-crossing).
    */
  private[streaming] def advance(
      r0: Long,
      m0: Long,
      allowance: Long,
      threshold: Long,
      events: Seq[(Long, Long, Long)]): (Long, Long, Seq[(Long, Long, Long)]) = {
    var r = r0
    var m = m0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for ((t, id, v) <- events) {
      val sPrev = r - m
      r = Math.addExact(r, Math.subtractExact(v, allowance))
      m = math.min(m, r)
      val s = r - m
      if (sPrev < threshold && s >= threshold) out += ((t, id, s))
    }
    (r, m, out.toSeq)
  }

  /** Event-time streaming detection; arrivals may be arbitrarily out
    * of order within the `delay` lateness horizon. `threshold` must
    * be positive (a non-positive h alerts on every first event —
    * a configuration error, not a monitor).
    */
  def detectEventTime(
      events: Dataset[CuEv],
      allowance: Long,
      threshold: Long,
      delay: String): Dataset[CuAlert] = {
    require(threshold > 0L, s"threshold must be > 0, got $threshold")
    import events.sparkSession.implicits._
    def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
    events.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[CuEv], st: GroupState[CuState]) =>
          val wmMs = st.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prev = st.getOption.getOrElse(
            CuState(0L, 0L, Long.MinValue, Vector.empty))
          val incoming = it
            .map(e => CuBuf(micros(e.ts), e.event_id, e.value_cents))
            .filter(_.t > prev.drainedTo)
          val buf = prev.buf ++ incoming
          val (sealedEvs, pending) = buf.partition(_.t <= wmUs)
          val sorted = sealedEvs.sortBy(e => (e.t, e.id))
          val (r, m, emits) = advance(
            prev.r, prev.m, allowance, threshold,
            sorted.map(e => (e.t, e.id, e.v)))
          st.update(CuState(r, m, math.max(prev.drainedTo, wmUs), pending))
          if (pending.nonEmpty)
            st.setTimeoutTimestamp(
              math.max(ceilMs(pending.map(_.t).min), wmMs + 1L))
          emits.map { case (t, id, s) => CuAlert(key, t, id, s) }.iterator
      }
  }

  /** Batch twin — identical alerts over a static Dataset (the parity
    * anchor; the R − min-prefix closed form replays it in window
    * SQL).
    */
  def detectBatch(
      events: Dataset[CuEv],
      allowance: Long,
      threshold: Long): Dataset[CuAlert] = {
    require(threshold > 0L, s"threshold must be > 0, got $threshold")
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (key: String, it: Iterator[CuEv]) =>
      val sorted = it.toSeq
        .map(e => (micros(e.ts), e.event_id, e.value_cents))
        .sortBy(e => (e._1, e._2))
      val (_, _, emits) = advance(0L, 0L, allowance, threshold, sorted)
      emits.map { case (t, id, s) => CuAlert(key, t, id, s) }.iterator
    }
  }
}

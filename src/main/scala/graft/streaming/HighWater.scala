package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING HIGH-WATER-MARK ALERTS — emit an alert the moment a
  * key's price sets a new all-time maximum, in event-time order and
  * robust to out-of-order arrival: the live form of "new 52-week
  * high" / SLA-record monitoring. Each alert carries the previous
  * maximum (−1 for a key's first event).
  *
  * Out-of-order arrival is handled by the watermark-buffer template
  * (fifth instance: [[PatternMatch.detectEventTime]],
  * [[NegativeFunnel.detectEventTime]], `Throttle`, `RunLength`):
  * arrivals buffer per key, the watermark seals a prefix whose order
  * is final, sealed events run through the pure fold. Order matters
  * here even though max() is commutative, because WHICH events alert
  * depends on the prefix: a late lower high must still alert if it
  * preceded the higher one in event time.
  *
  * State per key is the unsealed buffer plus ONE scalar (the running
  * maximum). The scalar never expires — that is the semantics of an
  * all-time high; a deployment that wants a rolling horizon should
  * reset keys upstream (e.g. key = (instrument, year)). The key grain
  * bounds total state at #keys × one long, and the buffer drains to
  * empty whenever the watermark catches up.
  *
  * `price_cents` must be ≥ 0 (the fold raises otherwise — a negative
  * price would collide with the −1 "no previous maximum" sentinel).
  */
object HighWater extends Serializable {

  final case class HwEv(
      key: String, ts: java.sql.Timestamp, event_id: Long, price_cents: Long)

  final case class HwAlert(
      key: String, alert_us: Long, event_id: Long,
      price_cents: Long, prev_max_cents: Long)

  private[streaming] final case class HwBuf(t: Long, id: Long, p: Long)

  private[streaming] final case class HwState(
      hwm: Long, drainedTo: Long, buf: Seq[HwBuf])

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** One sealed slice through the fold, PURE; events must arrive
    * sorted by (event-time, id). Returns the new running maximum and
    * the alerts (t, id, price, previous max).
    */
  private[streaming] def advance(
      hwm0: Long,
      events: Seq[(Long, Long, Long)]): (Long, Seq[(Long, Long, Long, Long)]) = {
    var hwm = hwm0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for ((t, id, p) <- events) {
      require(p >= 0L, s"HighWater: price_cents must be >= 0, got $p")
      if (p > hwm) { out += ((t, id, p, hwm)); hwm = p }
    }
    (hwm, out.toSeq)
  }

  /** Event-time streaming detection; arrivals may be arbitrarily out
    * of order within the `delay` lateness horizon.
    */
  def detectEventTime(
      events: Dataset[HwEv],
      delay: String): Dataset[HwAlert] = {
    import events.sparkSession.implicits._
    def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
    events.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[HwEv], st: GroupState[HwState]) =>
          val wmMs = st.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prev = st.getOption.getOrElse(
            HwState(-1L, Long.MinValue, Vector.empty))
          val incoming = it
            .map(e => HwBuf(micros(e.ts), e.event_id, e.price_cents))
            .filter(_.t > prev.drainedTo)
          val buf = prev.buf ++ incoming
          val (sealedEvs, pending) = buf.partition(_.t <= wmUs)
          val sorted = sealedEvs.sortBy(e => (e.t, e.id))
          val (hwm, emits) = advance(
            prev.hwm, sorted.map(e => (e.t, e.id, e.p)))
          st.update(HwState(hwm, math.max(prev.drainedTo, wmUs), pending))
          if (pending.nonEmpty)
            st.setTimeoutTimestamp(
              math.max(ceilMs(pending.map(_.t).min), wmMs + 1L))
          emits.map { case (t, id, p, pm) =>
            HwAlert(key, t, id, p, pm)
          }.iterator
      }
  }

  /** Batch twin — identical alerts over a static Dataset (the parity
    * anchor; a window-SQL oracle replays it declaratively).
    */
  def detectBatch(events: Dataset[HwEv]): Dataset[HwAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (key: String, it: Iterator[HwEv]) =>
      val sorted = it.toSeq
        .map(e => (micros(e.ts), e.event_id, e.price_cents))
        .sortBy(e => (e._1, e._2))
      val (_, emits) = advance(-1L, sorted)
      emits.map { case (t, id, p, pm) => HwAlert(key, t, id, p, pm) }.iterator
    }
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING NEGATIVE-CONDITION FUNNEL — the live twin of
  * [[graft.operators.Funnel.negativeFunnel]]'s pattern family:
  * `A (¬C)* B` within an event-time window, with CONSUMPTION
  * semantics (a valid B consumes its A, so each A credits at most
  * one conversion and the stream keeps emitting as new journeys
  * complete — the right semantics for an unbounded stream, where
  * "earliest per user ever" would pin per-key state forever).
  *
  * Per user in (event-time, event_id) order: an A arms the match
  * (replacing any armed A — last-A semantics, matching the batch
  * operator), a C poisons the armed A, a B with an armed unpoisoned
  * A within `windowUs` emits (a_us, b_us) and disarms. The fold is
  * deterministic, so a SQL recursion replays it exactly.
  *
  * Out-of-order arrival is handled by the watermark-buffer template
  * (third instance: [[PatternMatch.detectEventTime]], `Throttle
  * .streamingKeepFirstPerTtlEventTime`): arrivals buffer per key,
  * the watermark seals a prefix whose order is final, sealed events
  * run through the pure fold, and state is bounded and self-cleaning
  * — the buffer holds only unsealed events, an armed A whose window
  * the watermark has passed is evicted (no future sealed B can
  * validate it), and a key with no buffer and no viable armed A has
  * its state REMOVED (`EventTimeTimeout` re-arms idle keys so
  * sealing/cleanup proceed without fresh arrivals).
  */
object NegativeFunnel extends Serializable {

  import PatternMatch.{BufEv, Ev}

  final case class NfMatch(user_id: Long, a_us: Long, b_us: Long)

  /** aT = −1 when disarmed; cAfter poisons the armed A. */
  final case class NfCore(aT: Long, cAfter: Boolean)

  final case class NfBufState(
      aT: Long, cAfter: Boolean, drainedTo: Long, buf: Seq[BufEv])

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** One sealed slice through the fold, PURE; events must arrive
    * sorted by (event-time, id). A stale armed A is harmless here —
    * the window check rejects it — so eviction is the caller's
    * state-hygiene concern, not a semantic one.
    */
  private[streaming] def advance(
      st: NfCore,
      events: Seq[(Long, String)],
      stepA: String,
      stepB: String,
      blocker: String,
      windowUs: Long): (NfCore, Seq[(Long, Long)]) = {
    var aT = st.aT
    var cAfter = st.cAfter
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((t, typ) <- events) {
      if (typ == stepA) { aT = t; cAfter = false }
      else if (typ == blocker) { if (aT >= 0L) cAfter = true }
      else if (typ == stepB) {
        if (aT >= 0L && !cAfter && t - aT <= windowUs) {
          out += ((aT, t))
          aT = -1L; cAfter = false
        }
      }
    }
    (NfCore(aT, cAfter), out.toSeq)
  }

  /** Event-time streaming detection; arrivals may be arbitrarily
    * out of order within the `delay` lateness horizon.
    */
  def detectEventTime(
      events: Dataset[Ev],
      stepA: String,
      stepB: String,
      blocker: String,
      windowUs: Long,
      delay: String): Dataset[NfMatch] = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    require(Set(stepA, stepB, blocker).size == 3,
      s"stepA/stepB/blocker must be distinct, got ($stepA, $stepB, $blocker)")
    import events.sparkSession.implicits._
    val stepSet = Set(stepA, stepB, blocker)
    def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], st: GroupState[NfBufState]) =>
          val wmMs = st.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prev = st.getOption.getOrElse(
            NfBufState(-1L, cAfter = false, Long.MinValue, Vector.empty))
          val incoming = it
            .map(e => BufEv(micros(e.ts), e.event_id, e.event_type))
            .filter(e => stepSet(e.typ) && e.t > prev.drainedTo)
          val buf = prev.buf ++ incoming
          val (sealedEvs, pending) = buf.partition(_.t <= wmUs)
          val sorted = sealedEvs.sortBy(e => (e.t, e.id))
          val (ns, emits) = advance(
            NfCore(prev.aT, prev.cAfter),
            sorted.map(e => (e.t, e.typ)), stepA, stepB, blocker, windowUs)
          // evict an armed A the watermark has outrun: every future
          // sealed B has t > wmUs > aT + window — it can never match
          val aT = if (ns.aT >= 0L && wmUs - ns.aT > windowUs) -1L else ns.aT
          if (pending.isEmpty && aT < 0L) {
            if (st.exists) st.remove()
          } else {
            st.update(NfBufState(aT, if (aT < 0L) false else ns.cAfter,
              math.max(prev.drainedTo, wmUs), pending))
            val nextUs =
              if (pending.nonEmpty) pending.map(_.t).min else aT + windowUs
            st.setTimeoutTimestamp(math.max(ceilMs(nextUs), wmMs + 1L))
          }
          emits.map { case (a, b) => NfMatch(user, a, b) }.iterator
      }
  }

  /** Batch twin — identical consumption semantics over a static
    * Dataset (the parity anchor; oracles replay the fold in SQL
    * recursion independently).
    */
  def detectBatch(
      events: Dataset[Ev],
      stepA: String,
      stepB: String,
      blocker: String,
      windowUs: Long): Dataset[NfMatch] = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (user: Long, it: Iterator[Ev]) =>
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val (_, emits) = advance(
        NfCore(-1L, cAfter = false),
        sorted.map(e => (micros(e.ts), e.event_type)),
        stepA, stepB, blocker, windowUs)
      emits.map { case (a, b) => NfMatch(user, a, b) }.iterator
    }
  }
}

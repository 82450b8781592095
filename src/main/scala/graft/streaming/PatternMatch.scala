package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Complex-event-processing (CEP) pattern detection — "did this user
  * do A then B then C within a window" as a STREAMING operator with
  * explicit per-key state (`flatMapGroupsWithState`), the classic
  * match-recognize / funnel-alerting primitive that pure aggregation
  * cannot express (the match is ORDER-dependent and consumes events).
  *
  * Semantics (deterministic, exactly replayable by a SQL state
  * machine): per user, events process in (event-time, event_id)
  * order; the state is (stage, t0) where stage counts matched steps
  * and t0 is the first step's event time. For each event, FIRST a
  * stale partial match resets (event time − t0 > window), THEN the
  * event either starts a match (stage 0 + first step), advances one
  * (stage s + step s), completes one (last stage + last step → emit
  * (user, t0, t), reset), or is ignored. Non-advancing events never
  * restart an in-flight match (first-match semantics); overlapping
  * matches never emit (completion consumes the state) — both choices
  * are what makes the output a deterministic function of the event
  * multiset order.
  *
  * Scale: state is TWO scalars per key (an int and a long) — no event
  * buffering, no per-key history; each micro-batch sorts only its own
  * per-key slice. Cross-batch correctness requires event-time-ordered
  * micro-batches per key (the staged-slices contract every stateful
  * gate query in this engine uses; production = watermark + ordered
  * replay).
  */
object PatternMatch extends Serializable {

  final case class Ev(
      user_id: Long, ts: java.sql.Timestamp, event_type: String, event_id: Long)

  final case class PatState(stage: Int, t0: Long)

  final case class Detection(user_id: Long, start_us: Long, end_us: Long)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** One batch's transitions, PURE (unit-tested directly): returns the
    * new state and the completed (start_us, end_us) matches, given the
    * key's events ALREADY sorted by (time, tiebreak).
    */
  private[streaming] def advance(
      state: PatState,
      events: Seq[(Long, String)],
      steps: Seq[String],
      windowUs: Long): (PatState, Seq[(Long, Long)]) = {
    var stage = state.stage
    var t0 = state.t0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((t, typ) <- events) {
      if (stage > 0 && t - t0 > windowUs) stage = 0
      if (stage == 0) {
        if (typ == steps.head) { stage = 1; t0 = t }
      } else if (stage == steps.length - 1) {
        if (typ == steps.last) { out += ((t0, t)); stage = 0 }
      } else if (typ == steps(stage)) stage += 1
    }
    (PatState(stage, t0), out.toSeq)
  }

  /** Streaming detection over a streaming `Dataset[Ev]`. `steps` must
    * have ≥ 2 distinct stages; `windowUs` bounds first-step→last-step
    * event time. Emits one [[Detection]] per completed match.
    *
    * Contract caveats (both lifted by [[detectEventTime]], the
    * production path): (a) cross-batch correctness requires
    * event-time-ordered micro-batches per key; (b) state uses
    * `NoTimeout` and is never removed, so key cardinality must be
    * bounded for the query's lifetime (the gate/testing contract —
    * a finite staged replay over a finite key set).
    */
  def detect(
      events: Dataset[Ev],
      steps: Seq[String],
      windowUs: Long): Dataset[Detection] = {
    require(steps.size >= 2, s"pattern needs >= 2 steps, got $steps")
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], st: GroupState[PatState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val (ns, emits) = advance(
            st.getOption.getOrElse(PatState(0, 0L)),
            sorted.map(e => (micros(e.ts), e.event_type)),
            steps, windowUs)
          st.update(ns)
          emits.map { case (a, b) => Detection(user, a, b) }.iterator
      }
  }

  /** One buffered, not-yet-sealed event: event-time µs, the arrival
    * tiebreak id, and the type. Kept in state only between the event's
    * arrival and the watermark passing it — bounded by the lateness
    * horizon, never by history.
    */
  final case class BufEv(t: Long, id: Long, typ: String)

  /** [[detectEventTime]] state: the two-scalar machine plus the
    * watermark buffer. `drainedTo` is the sealed horizon in µs —
    * events at or below it already went through the machine, so a
    * straggler older than it is dropped (the standard too-late-data
    * contract; within the watermark delay nothing is ever dropped).
    */
  final case class BufState(
      stage: Int, t0: Long, drainedTo: Long, buf: Seq[BufEv])

  /** Out-of-order-tolerant streaming detection: the production
    * variant of [[detect]]. Events may arrive in any order within —
    * and across — micro-batches as long as they are no later than
    * `delay` behind the stream's max event time (the watermark
    * contract). Per key, arriving events are buffered; once the
    * watermark passes an event's time it is SEALED — no earlier event
    * can arrive — so sealed events run through the same pure
    * [[advance]] machine in (event-time, event_id) order and emitted
    * detections are final (a pure function of the event multiset,
    * independent of arrival order). State is bounded and self-
    * cleaning: the buffer holds only events inside the lateness
    * horizon, an expired partial match (watermark > t0 + window) is
    * evicted as soon as it can no longer complete, and a key with no
    * buffer and no in-flight match has its state REMOVED — an
    * `EventTimeTimeout` re-invokes idle keys so sealing and cleanup
    * happen even when the key receives no further events.
    */
  def detectEventTime(
      events: Dataset[Ev],
      steps: Seq[String],
      windowUs: Long,
      delay: String): Dataset[Detection] = {
    require(steps.size >= 2, s"pattern needs >= 2 steps, got $steps")
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    import events.sparkSession.implicits._
    val stepSet = steps.toSet
    def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], st: GroupState[BufState]) =>
          val wmMs = st.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prev = st.getOption.getOrElse(
            BufState(0, 0L, Long.MinValue, Vector.empty))
          // buffer the arrivals. Non-step noise is dropped BEFORE the
          // buffer — [[advance]] provably ignores it (the denoise
          // property in PatternMatchSpec), so this changes nothing
          // semantically while keeping state proportional to step-
          // event density (and letting watermark-advancing sentinel/
          // noise events pass through without parking in state). A
          // straggler at or below the sealed horizon cannot be
          // replayed in order — drop it (it is beyond the promised
          // lateness `delay` by construction)
          val incoming = it
            .map(e => BufEv(micros(e.ts), e.event_id, e.event_type))
            .filter(e => stepSet(e.typ) && e.t > prev.drainedTo)
          val buf = prev.buf ++ incoming
          // seal: the watermark guarantees no event <= wmUs is still
          // in flight, so this prefix's order is now FINAL
          val (sealedEvs, pending) = buf.partition(_.t <= wmUs)
          val sorted = sealedEvs.sortBy(e => (e.t, e.id))
          val (ns, emits) = advance(
            PatState(prev.stage, prev.t0),
            sorted.map(e => (e.t, e.typ)), steps, windowUs)
          // evict an expired partial match: every future sealed event
          // has t > wmUs > t0 + window, so advance would reset it on
          // arrival anyway — dropping it now (identical semantics)
          // lets the empty state be removed instead of leaking
          val stage = if (ns.stage > 0 && wmUs - ns.t0 > windowUs) 0 else ns.stage
          if (pending.isEmpty && stage == 0) {
            if (st.exists) st.remove()
          } else {
            st.update(BufState(stage, ns.t0, math.max(prev.drainedTo, wmUs), pending))
            // re-arm: fire when the watermark passes the next thing
            // that needs action — the earliest pending event's seal
            // point, or the in-flight match's expiry
            val nextUs =
              if (pending.nonEmpty) pending.map(_.t).min else ns.t0 + windowUs
            st.setTimeoutTimestamp(math.max(ceilMs(nextUs), wmMs + 1L))
          }
          emits.map { case (a, b) => Detection(user, a, b) }.iterator
      }
  }

  /** Batch twin — identical semantics over a static Dataset (the
    * parity anchor for specs; the gate oracle replays the same state
    * machine in SQL recursion independently).
    */
  def detectBatch(
      events: Dataset[Ev],
      steps: Seq[String],
      windowUs: Long): Dataset[Detection] = {
    require(steps.size >= 2, s"pattern needs >= 2 steps, got $steps")
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (user: Long, it: Iterator[Ev]) =>
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val (_, emits) = advance(
        PatState(0, 0L), sorted.map(e => (micros(e.ts), e.event_type)),
        steps, windowUs)
      emits.map { case (a, b) => Detection(user, a, b) }.iterator
    }
  }
}

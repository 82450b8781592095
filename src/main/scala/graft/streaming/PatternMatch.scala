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

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING RUN-LENGTH ENCODING — collapse each key's consecutive
  * identical values into runs (value, start_us, end_us, n): the
  * classic state-compression step for CDC feeds, sensor streams and
  * status timelines, where storing every observation of an unchanged
  * value is pure redundancy.
  *
  * A run CLOSES when a different value arrives, when the SAME value
  * arrives after a gap longer than `idleCloseUs` (a stale repeat is a
  * new run, not a 3-week-long one), or — live only — when the
  * watermark outruns the idle horizon, which is the same rule: any
  * future sealed event necessarily has a gap > `idleCloseUs`, so the
  * closure it would force is emitted early. That makes per-key state
  * O(1) AND self-draining, and makes the streaming output equal the
  * batch twin's once the watermark passes every run's horizon.
  *
  * Out-of-order arrival uses the watermark-buffer template (fifth
  * instance: [[PatternMatch.detectEventTime]], [[NegativeFunnel]],
  * `Throttle`, `StreamingDedup`): arrivals buffer per key, the
  * watermark seals a prefix whose (event-time, id) order is final,
  * sealed events run through the pure fold. Values outside `values`
  * filter BEFORE buffering (the denoise discipline — flush sentinels
  * never park in state).
  *
  * The batch twin is fully DECLARATIVE — the textbook gaps-and-islands
  * window plan (lag → run counter → per-run aggregate), whole-stage
  * codegen end to end, partitioned by key so no reducer owns more
  * than one key's timeline. Oracles replay it verbatim in SQL; every
  * output field is an exact integer or a carried string — hash-exact.
  */
object RunLength extends Serializable {

  import PatternMatch.{BufEv, Ev}

  final case class Run(
      user_id: Long, value: String, start_us: Long, end_us: Long, n: Long)

  /** v == null ⇔ no open run. */
  final case class RlCore(v: String, startUs: Long, lastUs: Long, n: Long)

  final case class RlBufState(
      v: String, startUs: Long, lastUs: Long, n: Long,
      drainedTo: Long, buf: Seq[BufEv])

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** One sealed slice through the fold, PURE; events must arrive
    * sorted by (event-time, id).
    */
  private[streaming] def advance(
      st: RlCore,
      events: Seq[(Long, String)],
      idleCloseUs: Long): (RlCore, Seq[(String, Long, Long, Long)]) = {
    var v = st.v
    var start = st.startUs
    var last = st.lastUs
    var n = st.n
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    for ((t, typ) <- events) {
      if (v == null) { v = typ; start = t; last = t; n = 1L }
      else if (typ == v && t - last <= idleCloseUs) { last = t; n += 1L }
      else {
        out += ((v, start, last, n))
        v = typ; start = t; last = t; n = 1L
      }
    }
    (RlCore(v, start, last, n), out.toSeq)
  }

  /** Event-time streaming encoder; arrivals may be arbitrarily out of
    * order within the `delay` lateness horizon.
    */
  def encodeEventTime(
      events: Dataset[Ev],
      values: Set[String],
      idleCloseUs: Long,
      delay: String): Dataset[Run] = {
    require(idleCloseUs > 0, s"idleCloseUs must be > 0, got $idleCloseUs")
    require(values.nonEmpty, "values must be non-empty")
    import events.sparkSession.implicits._
    def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], st: GroupState[RlBufState]) =>
          val wmMs = st.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prev = st.getOption.getOrElse(
            RlBufState(null, 0L, 0L, 0L, Long.MinValue, Vector.empty))
          val incoming = it
            .map(e => BufEv(micros(e.ts), e.event_id, e.event_type))
            .filter(e => values(e.typ) && e.t > prev.drainedTo)
          val buf = prev.buf ++ incoming
          val (sealedEvs, pending) = buf.partition(_.t <= wmUs)
          val sorted = sealedEvs.sortBy(e => (e.t, e.id))
          val (c1, closed) = advance(
            RlCore(prev.v, prev.startUs, prev.lastUs, prev.n),
            sorted.map(e => (e.t, e.typ)), idleCloseUs)
          // close an open run the watermark has outrun: every future
          // sealed event has t > wmUs > lastUs + idleCloseUs, so the
          // gap rule would close this run anyway — emit it now and
          // free the state
          val outrun = c1.v != null && wmUs - c1.lastUs > idleCloseUs
          val emits =
            if (outrun) closed :+ ((c1.v, c1.startUs, c1.lastUs, c1.n))
            else closed
          val core = if (outrun) RlCore(null, 0L, 0L, 0L) else c1
          if (pending.isEmpty && core.v == null) {
            if (st.exists) st.remove()
          } else {
            st.update(RlBufState(core.v, core.startUs, core.lastUs, core.n,
              math.max(prev.drainedTo, wmUs), pending))
            val nextUs =
              if (pending.nonEmpty) pending.map(_.t).min
              else core.lastUs + idleCloseUs + 1L
            st.setTimeoutTimestamp(math.max(ceilMs(nextUs), wmMs + 1L))
          }
          emits.map { case (v, s0, e0, n0) => Run(user, v, s0, e0, n0) }.iterator
      }
  }

  /** Batch twin — the declarative gaps-and-islands plan (identical
    * run boundaries; the batch pass also closes each key's final run,
    * which the streaming side does once the watermark passes its idle
    * horizon).
    */
  def encodeBatch(
      events: Dataset[Ev],
      values: Set[String],
      idleCloseUs: Long): DataFrame = {
    require(idleCloseUs > 0, s"idleCloseUs must be > 0, got $idleCloseUs")
    require(values.nonEmpty, "values must be non-empty")
    val df = events.toDF()
      .filter(col("event_type").isin(values.toSeq: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type").as("v"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus").asc, col("event_id").asc)
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("pv", lag(col("v"), 1).over(w))
      .withColumn("pt", lag(col("tus"), 1).over(w))
      .withColumn("nr", when(col("pv").isNull || col("pv") =!= col("v")
        || col("tus") - col("pt") > idleCloseUs, 1L).otherwise(0L))
      .withColumn("run", sum(col("nr")).over(wRows))
      .groupBy(col("user_id"), col("run"))
      .agg(
        min(col("v")).as("value"), // constant within a run
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("value"), col("start_us"), col("end_us"), col("n"))
  }
}

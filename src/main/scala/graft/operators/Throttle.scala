package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

/** TTL THROTTLE / DEBOUNCE — keep a key's FIRST event, then suppress
  * that key until `ttl` has elapsed SINCE THE LAST KEPT event, then
  * admit again (alert de-noising, notification rate-limiting,
  * at-most-one-per-window feed sampling). This is NOT expressible
  * with lag/windows: whether an event is kept depends on the previous
  * KEPT event, a chain that threads through the whole key history —
  * the same sequential-dependence class as CEP (q191), so the oracle
  * is a recursive-CTE replay, and the Spark plan must be a
  * stream-scan, not a window.
  *
  * Plan shape (spill-safe at any key cardinality or history length):
  * `repartition(key)` + `sortWithinPartitions(key, ts, tiebreak)` +
  * ONE forward scan per partition holding just (current key, last
  * kept ts) — two scalars of state, no per-key buffering, no
  * `groupByKey` materialization. One shuffle, one sort, O(1) memory.
  *
  * Determinism: events order by `(ts, tiebreak)` within a key;
  * equal-ts events after a kept one are suppressed (strict
  * `ts − lastKept ≥ ttl` re-admission).
  */
object Throttle {

  def keepFirstPerTtl(
      df: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      ttlUs: Long): DataFrame = {
    require(ttlUs > 0, s"ttlUs must be > 0, got $ttlUs")
    val base = df
      .select(key.as("k"), ts.cast("timestamp").as("ts"), tiebreak.cast("long").as("tb"))
      .filter(col("k").isNotNull && col("ts").isNotNull)
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("ts"), col("tb"))
    val schema = StructType(Seq(
      StructField("k", base.schema("k").dataType),
      StructField("ts", TimestampType),
      StructField("tb", LongType)))
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    // mapPartitions over the PUBLIC Dataset API — the
    // sortWithinPartitions order is preserved into the iterator, so
    // the scan sees each key's events contiguously in (ts, tb) order
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    base.mapPartitions { it =>
      var curKey: Any = null
      var hasKey = false
      var lastKeptUs = 0L
      it.filter { r =>
        val k = r.get(0)
        val t = micros(r.getTimestamp(1))
        if (!hasKey || k != curKey) {
          curKey = k; hasKey = true; lastKeptUs = t; true
        } else if (t - lastKeptUs >= ttlUs) {
          lastKeptUs = t; true
        } else false
      }
    }(enc)
  }

  /** STREAMING twin — the same machine as a stateful streaming
    * operator: per key the state is ONE scalar (the last kept event
    * time), each micro-batch's slice sorts locally and folds through
    * it. Same contract as [[graft.streaming.PatternMatch.detect]]:
    * cross-batch correctness requires event-time-ordered micro-
    * batches per key and a bounded key set for the query's lifetime
    * (the gate/staged-slices shape); an out-of-order production
    * deployment would buffer within a watermark the way
    * `detectEventTime` does.
    */
  def streamingKeepFirstPerTtl(
      events: org.apache.spark.sql.Dataset[ThrottleEv],
      ttlUs: Long): org.apache.spark.sql.Dataset[ThrottleEv] = {
    require(ttlUs > 0, s"ttlUs must be > 0, got $ttlUs")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[ThrottleEv],
         st: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.tb))
          var last = st.getOption.getOrElse(Long.MinValue)
          val kept = sorted.filter { e =>
            val t = micros(e.ts)
            if (last == Long.MinValue || t - last >= ttlUs) { last = t; true }
            else false
          }
          st.update(last)
          val _ = k
          kept.iterator
      }
  }

  final case class ThrottleEv(k: Long, ts: java.sql.Timestamp, tb: Long)

  /** Buffered event + the throttle's event-time state — the same
    * watermark-buffer shape as
    * [[graft.streaming.PatternMatch.BufState]] (that scaladoc carries
    * the template's invariants): `lastKept` is the machine (one
    * scalar, MinValue = nothing kept yet), `drainedTo` the sealed
    * horizon, `buf` the unsealed events bounded by the lateness
    * window.
    */
  final case class ThrottleBufState(
      lastKept: Long, drainedTo: Long, buf: Seq[(Long, Long)])

  /** OUT-OF-ORDER-tolerant streaming throttle — the production twin
    * of [[streamingKeepFirstPerTtl]], built on the watermark-buffer
    * template ([[graft.streaming.PatternMatch.detectEventTime]] is
    * the first instance; the invariants are identical): arrivals
    * buffer per key, seal in (event-time, tiebreak) order once the
    * watermark passes them, fold through the same keep-first-per-ttl
    * machine, and the emitted admissions are a pure function of the
    * event multiset. State self-cleans: a key whose buffer is empty
    * and whose last admission is more than ttl behind the watermark
    * can never suppress a future event (any future sealed event has
    * t > wm ≥ lastKept + ttl → admitted regardless), so its state is
    * REMOVED; an EventTimeTimeout re-invokes idle keys to seal and
    * clean without new arrivals.
    */
  def streamingKeepFirstPerTtlEventTime(
      events: org.apache.spark.sql.Dataset[ThrottleEv],
      ttlUs: Long,
      delay: String): org.apache.spark.sql.Dataset[ThrottleEv] = {
    require(ttlUs > 0, s"ttlUs must be > 0, got $ttlUs")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)
    events.withWatermark("ts", delay)
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, it: Iterator[ThrottleEv], st: GroupState[ThrottleBufState]) =>
          val wmMs = st.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prev = st.getOption.getOrElse(
            ThrottleBufState(Long.MinValue, Long.MinValue, Vector.empty))
          val incoming = it.map(e => (micros(e.ts), e.tb))
            .filter(_._1 > prev.drainedTo)
          val buf = prev.buf ++ incoming
          val (sealedEvs, pending) = buf.partition(_._1 <= wmUs)
          var last = prev.lastKept
          val kept = sealedEvs.sortBy(identity).filter { case (t, _) =>
            if (last == Long.MinValue || t - last >= ttlUs) { last = t; true }
            else false
          }
          // dead state: empty buffer and the last admission so old
          // that every future sealed event re-admits anyway
          val dead = pending.isEmpty &&
            (last == Long.MinValue || wmUs - last >= ttlUs)
          if (dead) {
            if (st.exists) st.remove()
          } else {
            st.update(ThrottleBufState(
              last, math.max(prev.drainedTo, wmUs), pending))
            val nextUs =
              if (pending.nonEmpty) pending.map(_._1).min else last + ttlUs
            st.setTimeoutTimestamp(math.max(ceilMs(nextUs), wmMs + 1L))
          }
          kept.map { case (t, tb) => ThrottleEv(k, toTs(t), tb) }.iterator
      }
  }

  /** TOKEN-BUCKET admission — [[keepFirstPerTtl]]'s burst-capable
    * generalization: a key holds up to `burst` tokens, one token
    * refills every `ttlUs`, each ADMITTED event spends one; a quiet
    * key can then burst `burst` admissions back-to-back before
    * settling to the 1-per-ttl steady state (the real rate-limiter /
    * notification-budget semantics). All arithmetic is INTEGER
    * microtoken-µs (bucket, refill, spend), so the recursive oracle
    * replays it exactly — no float drift surface. Same plan shape as
    * [[keepFirstPerTtl]]: one shuffle, one sort, an O(1)-state
    * forward scan (state = current key, bucket level, last seen ts).
    */
  def tokenBucket(
      df: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      ttlUs: Long,
      burst: Int): DataFrame = {
    require(ttlUs > 0, s"ttlUs must be > 0, got $ttlUs")
    require(burst >= 1, s"burst must be >= 1, got $burst")
    val capUs = burst.toLong * ttlUs
    val base = df
      .select(key.as("k"), ts.cast("timestamp").as("ts"), tiebreak.cast("long").as("tb"))
      .filter(col("k").isNotNull && col("ts").isNotNull)
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("ts"), col("tb"))
    val schema = StructType(Seq(
      StructField("k", base.schema("k").dataType),
      StructField("ts", TimestampType),
      StructField("tb", LongType)))
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    base.mapPartitions { it =>
      var curKey: Any = null
      var hasKey = false
      var bucketUs = 0L
      var lastUs = 0L
      it.filter { r =>
        val k = r.get(0)
        val t = micros(r.getTimestamp(1))
        if (!hasKey || k != curKey) {
          curKey = k; hasKey = true; bucketUs = capUs; lastUs = t
        } else {
          bucketUs = math.min(capUs, bucketUs + (t - lastUs))
          lastUs = t
        }
        if (bucketUs >= ttlUs) { bucketUs -= ttlUs; true } else false
      }
    }(enc)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pre-filtered joins: when a join is SELECTIVE (most probe-side
  * rows match nothing), the dominant cost at scale is shuffling probe
  * rows that are about to be discarded. This operator builds a bloom
  * filter over the build side's join keys (a distributed
  * `stat.bloomFilter` pass — the build side never funnels through one
  * node beyond the KB–MB filter itself), ships it as a binary literal,
  * and drops non-matching probe rows MAP-SIDE with the codegen'd
  * [[graft.functions.BloomMightContainLong]] probe — BEFORE the join
  * exchange. The exact join that follows removes the false positives,
  * so results are identical to the plain join while the shuffle moves
  * ~(selectivity + fpp) of the probe side.
  *
  * This is the explicit, composable form of Spark's runtime row-level
  * filtering: it works for any join the optimizer would not rewrite
  * (e.g. when the build side is itself a subquery the heuristics skip),
  * and the filter can be built once and reused across queries via
  * [[buildKeyFilter]].
  *
  * Scale shape: build side is NOT required to be broadcast-small — a
  * 10^9-key build side yields a ~1.7 GB filter at 1% fpp, so the cap
  * defaults well below that; for typical selective joins (10^6–10^8
  * keys) the filter is 1–170 MB and task-plan shipping amortizes it
  * per executor. Keys are normalized to long (the surrogate-key /
  * integral-id case); null keys never equi-join and are dropped from
  * both the filter and the probe.
  */
object BloomJoin {

  /** Distributed build of a serialized bloom filter over `key` (cast to
    * long, nulls dropped). Two passes over `df`: an exact count to size
    * the filter, then a per-partition build merged up a tree.
    *
    * Built DIRECTLY with `BloomFilter.create` over per-task partials
    * merged on the driver, NOT `DataFrame.stat.bloomFilter`: Spark 4
    * routes the latter through
    * the runtime-filter aggregate, whose
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` conf
    * silently CLAMPS the filter to 2²⁶ bits (8 MB) — at 12M keys that
    * clamp turned the requested 1% fpp into a measured 22%, and the
    * q162 wedge pre-filter was passing 26% of 411M wedges instead of
    * ~6%. The sizing must be ours, not a conf's.
    */
  def buildKeyFilter(
      df: DataFrame,
      key: Column,
      fpp: Double = 0.01,
      maxFilterBytes: Long = 64L << 20): Array[Byte] = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val keys = df.select(key.cast("long").as("__graft_bloom_key"))
      .where(col("__graft_bloom_key").isNotNull)
    val n = math.max(keys.count(), 1L)
    // loud size check BEFORE paying the build pass
    val bits = math.ceil(
      -n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    require(bits / 8L + 32L <= maxFilterBytes,
      s"bloom filter needs ~${bits / 8} bytes for $n keys at fpp=$fpp, over the " +
        s"$maxFilterBytes cap — raise fpp/cap, or the build side is large enough " +
        "that a plain shuffled join is the right plan")
    import org.apache.spark.util.sketch.BloomFilter
    // Build shape (round-14, guide §1.4 / §2.3): (a) queryExecution
    // .toRdd, not .rdd — the pass reads one long per row and .rdd
    // would deserialize every InternalRow into an external Row first;
    // (b) each task CREATES its filter locally from (n, fpp) instead
    // of receiving a serialized multi-MB zeroValue with the closure
    // (treeAggregate ships + deserializes the zero per task); (c) task
    // count capped at ~2M keys/task (coalesceForBuild) so the number
    // of full-size partial filters — transient memory, merge and
    // result-ship traffic — stays proportional to the key volume, not
    // the session parallelism.
    val partials = coalesceForBuild(keys.queryExecution.toRdd, n)
      .mapPartitions { it =>
        val f = BloomFilter.create(n, fpp)
        while (it.hasNext) f.putLong(it.next().getLong(0))
        val out = new java.io.ByteArrayOutputStream()
        f.writeTo(out)
        Iterator.single(out.toByteArray)
        // bounded: ONE partial per build task — coalesceForBuild caps
        // tasks at max(cpus/2, ceil(n / 2M)), and each partial ≤
        // maxFilterBytes (the require above raises before the pass)
      }.collect()
    if (partials.isEmpty) { // zero-partition input (treeAggregate's zeroValue used to cover this)
      val out = new java.io.ByteArrayOutputStream()
      BloomFilter.create(n, fpp).writeTo(out)
      return out.toByteArray
    }
    val merged = BloomFilter.readFrom(new java.io.ByteArrayInputStream(partials.head))
    partials.tail.foreach { b =>
      merged.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
    }
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    out.toByteArray
  }

  /** Distributed build of a serialized SPLIT-BLOCK bloom filter over
    * `key` — the cache-local variant for probe-bound pre-filters: all
    * probe bits of a key live in one 256-bit block
    * ([[graft.functions.BlockedBloom]]), so a membership test is ~one
    * cache line of traffic instead of ~7 scattered misses into a
    * filter that has long outgrown L2. Prefer this whenever the probe
    * side is 10x+ the build side (the q162 wedge filter probes 411M
    * keys against 12M); the classic [[buildKeyFilter]] stays for
    * fp-rate-sensitive or space-tight uses. ~16 bits/key ≈ 1% fp.
    */
  def buildBlockedKeyFilter(
      df: DataFrame,
      key: Column,
      bitsPerKey: Int = 16,
      maxFilterBytes: Long = 64L << 20): Array[Byte] =
    buildBlockedKeyFilterSized(df, key, -1L, bitsPerKey, maxFilterBytes)

  /** [[buildBlockedKeyFilter]] with a caller-KNOWN key count, skipping
    * the sizing count pass (one fewer action + full scan of the build
    * side). `knownN` must be an UPPER BOUND on the non-null key count
    * — the bloom contract (no false negatives) holds for ANY sizing;
    * an overestimate only lowers the false-positive rate (more blocks
    * than needed), an underestimate raises it. Callers that just
    * materialized the build side (e.g. via
    * [[PartitionedCheckpoint.byKeysNCounted]]) pass the exact count.
    * `knownN <= 0` falls back to counting.
    */
  def buildBlockedKeyFilterSized(
      df: DataFrame,
      key: Column,
      knownN: Long,
      bitsPerKey: Int = 16,
      maxFilterBytes: Long = 64L << 20): Array[Byte] = {
    import graft.functions.BlockedBloom
    val keys = df.select(key.cast("long").as("__graft_bloom_key"))
      .where(col("__graft_bloom_key").isNotNull)
    val n = math.max(if (knownN > 0) knownN else keys.count(), 1L)
    val proto = BlockedBloom.create(n, bitsPerKey)
    require(proto.numBlocks.toLong * 32L + 4L <= maxFilterBytes,
      s"blocked bloom needs ${proto.numBlocks * 32L} bytes for $n keys at " +
        s"$bitsPerKey bits/key, over the $maxFilterBytes cap — lower bitsPerKey/raise " +
        "the cap, or the build side is large enough that a plain shuffled join " +
        "is the right plan")
    // same build shape as buildKeyFilter (round-14): toRdd (no
    // external-Row conversion), create-in-task (no multi-MB zeroValue
    // shipped per task), ~2M keys/task partial count
    val partials = coalesceForBuild(keys.queryExecution.toRdd, n)
      .mapPartitions { it =>
        val f = BlockedBloom.create(n, bitsPerKey)
        while (it.hasNext) f.put(it.next().getLong(0))
        Iterator.single(f.serialized)
        // bounded: ONE partial per build task — coalesceForBuild caps
        // tasks at max(cpus/2, ceil(n / 2M)), and each partial ≤
        // maxFilterBytes (the require above raises before the pass)
      }.collect()
    if (partials.isEmpty) return proto.serialized // zero-partition input
    val merged = BlockedBloom.deserialize(partials.head)
    partials.tail.foreach(b => merged.mergeInPlace(BlockedBloom.deserialize(b)))
    merged.serialized
  }

  /** Task-count cap for a filter build pass: every task allocates (and
    * ships back) a FULL filter instance, so task count multiplies the
    * transient memory and the merge/serialize traffic — 32 tasks over
    * 12M sf1 keys meant 32 × 24 MB instances (768 MB of transient
    * arrays + 31 full-array merges) to do 12M cheap put()s (measured:
    * the q162 bloom-build stage at sf1 spent 2.45 s, almost all of it
    * in merge + GC). One task per ~2M keys keeps the put work
    * parallel where it matters (billions of build keys at cluster
    * scale) and collapses the instance count where it does not
    * (guide §2.3: shuffle — here, ship — fewer bytes).
    *
    * The target is FLOORED at half the session's parallelism: a
    * no-shuffle `coalesce` propagates its narrow partition count up
    * the WHOLE upstream stage, so when the build side is an unmaterialized
    * scan + filter (q76's bloomSemiJoin over a filtered orders scan,
    * ~90k keys) an unfloored target of 1 would serialize the entire
    * scan into one task. With the floor, cheap-key/expensive-scan
    * build sides keep scan parallelism while a multi-million-key build
    * over an already-checkpointed input (q162's oriented edges) still
    * collapses from 32 to ~cpus/2 full-size filter instances.
    */
  private def coalesceForBuild(
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      n: Long): org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = {
    val byKeys = (n + (2L << 20) - 1) / (2L << 20)
    val parallelismFloor =
      math.max(1L, rdd.sparkContext.defaultParallelism.toLong / 2)
    val target = math.max(1L, math.min(
      rdd.getNumPartitions.toLong, math.max(parallelismFloor, byKeys))).toInt
    if (target < rdd.getNumPartitions) rdd.coalesce(target, shuffle = false)
    else rdd
  }

  /** [[bloomPreFilter]] with the split-block filter — identical
    * no-false-negative contract, probe cost ~one cache line per row.
    */
  def blockedBloomPreFilter(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      bitsPerKey: Int = 16,
      maxFilterBytes: Long = 64L << 20): DataFrame = {
    val bytes = buildBlockedKeyFilter(small, smallKey, bitsPerKey, maxFilterBytes)
    big.where(graft.functions.GraftFunctions.blockedBloomContains(
      big.sparkSession, bigKey.cast("long"), bytes))
  }

  /** `big` rows whose `bigKey` MIGHT match a `smallKey` — the map-side
    * pre-filter alone (false positives at rate ~fpp remain; no false
    * negatives). Use when an exact join follows anyway or approximate
    * membership suffices.
    */
  def bloomPreFilter(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      fpp: Double = 0.01,
      maxFilterBytes: Long = 64L << 20): DataFrame = {
    val bytes = buildKeyFilter(small, smallKey, fpp, maxFilterBytes)
    big.where(graft.functions.GraftFunctions.bloomContains(
      big.sparkSession, bigKey.cast("long"), bytes))
  }

  /** Exact semi join (`big` rows with at least one `smallKey` match),
    * bloom-pre-filtered: identical rows to `big.join(small, bigKey ===
    * smallKey, "left_semi")`, but only ~(selectivity + fpp) of `big`
    * reaches the join exchange.
    */
  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      fpp: Double = 0.01,
      maxFilterBytes: Long = 64L << 20): DataFrame = {
    val pre = bloomPreFilter(big, small, bigKey, smallKey, fpp, maxFilterBytes)
    val smallKeys = small.select(smallKey.cast("long").as("__graft_bloom_key"))
      .where(col("__graft_bloom_key").isNotNull)
    pre.join(smallKeys, bigKey.cast("long") === col("__graft_bloom_key"), "left_semi")
  }
}

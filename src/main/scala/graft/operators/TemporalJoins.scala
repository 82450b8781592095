package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference (and built-in Spark SQL) lack:
  * as-of joins and bounded range (interval) joins. Both are expressed
  * as compositions of built-in operators so Catalyst keeps whole-stage
  * codegen and AQE in play — no custom physical operator is needed
  * (SURVEY.md §2.4 notes the reference has no join code at all; these
  * are the "operator Spark lacks → compose existing ops" path of the
  * design brief).
  *
  * Scale design:
  *  - [[asofJoin]] is the union-tag + keyed-window plan: ONE shuffle of
  *    (probe ∪ ref) on the join key, then a per-key running `last`
  *    — no point-in-time self-join, no per-probe subquery. Keys
  *    partition independently, so the plan scales with key cardinality;
  *    a single pathologically hot key is the caller's salting problem
  *    (same contract as every keyed window in this engine).
  *  - [[rangeJoinPairs]] buckets time into tolerance-sized bins and
  *    turns the inequality join into an equi-join on (key, bin) with a
  *    3-bin probe-side expansion — Catalyst gets a shuffled (or
  *    broadcast) HASH join instead of the cross-product-with-filter a
  *    naive theta join degrades to. Each true pair is produced exactly
  *    once (bins of matching rows differ by at most 1).
  */
object TemporalJoins {

  /** As-of join: for every probe row, attach the payload of the single
    * newest ref row with the same key whose time is <= the probe's
    * (strictly < when `strict`). Probe rows with no qualifying ref are
    * kept with null payload (left-join semantics).
    *
    * Determinism: among refs tied on (key, time) the one with the
    * LARGEST `refOrder` wins; callers must pass a `refOrder` unique per
    * (key, time) to make results reproducible (an id column does).
    * Null keys group together (Spark window partitioning), matching
    * refs with null keys — filter them out first if that is not wanted.
    *
    * `probeOut`/`refOut` name the output columns: the result has one
    * row per probe row with columns `probeOut ++ refOut` (refOut null
    * when unmatched). Output names must be distinct.
    */
  def asofJoin(
      probe: DataFrame,
      ref: DataFrame,
      probeKey: Column,
      probeTime: Column,
      refKey: Column,
      refTime: Column,
      probeOut: Seq[(String, Column)],
      refOut: Seq[(String, Column)],
      refOrder: Column,
      strict: Boolean = false): DataFrame = {
    require(probeOut.nonEmpty && refOut.nonEmpty, "probeOut and refOut must be non-empty")
    val names = probeOut.map(_._1) ++ refOut.map(_._1)
    require(names.distinct.size == names.size,
      s"output column names must be distinct, got ${names.mkString(", ")}")
    // Tag ordering decides tie semantics at equal (key, time): refs
    // sorting BEFORE probes are visible to the running `last` →
    // inclusive (<=); refs sorting AFTER are not → strict (<).
    val (refTag, probeTag) = if (strict) (1, 0) else (0, 1)
    val rStruct = struct(refOut.map { case (n, c) => c.as(n) }: _*)
    val pStruct = struct(probeOut.map { case (n, c) => c.as(n) }: _*)
    val rSide = ref.select(
      refKey.as("__k"), refTime.as("__t"), lit(refTag).as("__tag"),
      refOrder.cast("long").as("__ord"), rStruct.as("__r"))
    val rType = rSide.schema("__r").dataType
    val pSide = probe.select(
      probeKey.as("__k"), probeTime.as("__t"), lit(probeTag).as("__tag"),
      lit(0L).as("__ord"), lit(null).cast(rType).as("__r"), pStruct.as("__p"))
    val pType = pSide.schema("__p").dataType
    val unioned = rSide.withColumn("__p", lit(null).cast(pType)).unionByName(pSide)
    // running last non-null ref payload in (time, tag, ord) order; the
    // frame is cumulative so each probe row sees exactly the refs at or
    // before it under the tie rule above
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__p").isNotNull)
      .select(
        probeOut.map { case (n, _) => col("__p").getField(n).as(n) } ++
          refOut.map { case (n, _) => col("__m").getField(n).as(n) }: _*)
  }

  /** Bounded range join: every (left, right) pair sharing a key whose
    * times differ by at most `toleranceSeconds` (inclusive, either
    * direction). Inner-join semantics — unmatched rows drop.
    *
    * Output: `leftOut ++ rightOut ++ (deltaName → right_time −
    * left_time in seconds, signed)`. Output names must be distinct.
    */
  def rangeJoinPairs(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      leftTime: Column,
      rightKey: Column,
      rightTime: Column,
      toleranceSeconds: Long,
      leftOut: Seq[(String, Column)],
      rightOut: Seq[(String, Column)],
      deltaName: String = "delta_seconds"): DataFrame = {
    require(toleranceSeconds >= 1, s"toleranceSeconds must be >= 1, got $toleranceSeconds")
    val names = leftOut.map(_._1) ++ rightOut.map(_._1) :+ deltaName
    require(names.distinct.size == names.size,
      s"output column names must be distinct, got ${names.mkString(", ")}")
    val tolMicros = Math.multiplyExact(toleranceSeconds, 1000000L)
    val lStruct = struct(leftOut.map { case (n, c) => c.as(n) }: _*)
    val rStruct = struct(rightOut.map { case (n, c) => c.as(n) }: _*)
    // µs since epoch on both sides: bin width = tolerance, so a match's
    // bins differ by at most 1 and the 3-bin expansion is complete;
    // expansion is LEFT-side only, so each pair joins exactly once
    val l = left.select(
        leftKey.as("__k"), unix_micros(leftTime).as("__t"), lStruct.as("__lp"))
      .withColumn("__b",
        explode(array(
          floor(col("__t") / tolMicros) - 1,
          floor(col("__t") / tolMicros),
          floor(col("__t") / tolMicros) + 1)))
    val r = right.select(
      rightKey.as("__k2"), unix_micros(rightTime).as("__t2"), rStruct.as("__rp"),
      floor(unix_micros(rightTime) / tolMicros).as("__b2"))
    l.join(r,
        col("__k") === col("__k2") && col("__b") === col("__b2") &&
          abs(col("__t2") - col("__t")) <= tolMicros)
      .select(
        leftOut.map { case (n, _) => col("__lp").getField(n).as(n) } ++
          rightOut.map { case (n, _) => col("__rp").getField(n).as(n) } :+
          ((col("__t2") - col("__t")) / 1000000.0).as(deltaName): _*)
  }

  /** Keyless interval-overlap join: every (left, right) pair whose
    * closed integer intervals `[lStart, lEnd]` × `[rStart, rEnd]`
    * overlap (touching endpoints count). This is the general range join
    * Spark SQL lacks — a bare theta join planner-degrades to a
    * nested-loop cross product, O(|L|·|R|) at any cluster size.
    *
    * Plan: both sides replicate to every `binWidth`-sized bin their
    * interval touches and the theta join becomes an EQUI-join on bin
    * id; the overlap predicate then exact-filters within the bin. A
    * pair overlapping across several shared bins is emitted exactly
    * ONCE by the canonical-bin rule — only the bin containing the
    * overlap's start, `max(lStart, rStart)`, produces it — so no
    * distinct-shuffle dedup runs afterwards.
    *
    * Scale: shuffle keys are bin ids, uniform for bounded interval
    * lengths; per-row replication is `len/binWidth + 1`, so set
    * `binWidth` near the typical interval length (too small →
    * replication, too big → fat bins that approach the cross product
    * within a bin). Intervals touching more than `maxBinsPerInterval`
    * bins fail LOUDLY — one unbounded interval would otherwise
    * replicate itself across the whole axis and masquerade as a hang.
    * Bin ids use exact integer floor division (no doubles), so any
    * long endpoint is safe, negatives included. `end < start` rows
    * fail loudly too: silently dropping a malformed interval would
    * read as "no overlap" — indistinguishable from correct data.
    *
    * Output: `leftOut ++ rightOut ++ (overlapName → inclusive overlap
    * length, min(lEnd,rEnd) − max(lStart,rStart) + 1)`.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: Column,
      lEnd: Column,
      rStart: Column,
      rEnd: Column,
      leftOut: Seq[(String, Column)],
      rightOut: Seq[(String, Column)],
      binWidth: Long,
      overlapName: String = "overlap_len",
      maxBinsPerInterval: Long = 65536L): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1, got $maxBinsPerInterval")
    val names = leftOut.map(_._1) ++ rightOut.map(_._1) :+ overlapName
    require(names.distinct.size == names.size,
      s"output column names must be distinct, got ${names.mkString(", ")}")
    // exact integer floor division via pmod (Column `/` is double —
    // loses exactness past 2^53; `div` truncates toward zero and
    // mis-bins negative endpoints)
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / lit(binWidth)).cast("long")
    def side(df: DataFrame, s: Column, e: Column, outs: Seq[(String, Column)],
             sN: String, eN: String, pN: String, who: String) = {
      val guardedE = when(e.cast("long") < s.cast("long"), raise_error(concat(
        lit(s"intervalOverlapJoin: $who interval end < start at start="),
        s.cast("string")))).otherwise(e.cast("long"))
      df.select(s.cast("long").as(sN), guardedE.as(eN),
          struct(outs.map { case (n, c) => c.as(n) }: _*).as(pN))
        .filter(col(sN).isNotNull && col(eN).isNotNull)
    }
    val l = side(left, lStart, lEnd, leftOut, "__ls", "__le", "__lp", "left")
    val r = side(right, rStart, rEnd, rightOut, "__rs", "__re", "__rp", "right")
    def bins(sN: String, eN: String, who: String): Column = {
      val lo = floorDiv(col(sN)); val hi = floorDiv(col(eN))
      when(hi - lo + 1 > maxBinsPerInterval, raise_error(concat(
        lit(s"intervalOverlapJoin: $who interval at start="), col(sN).cast("string"),
        lit(s" touches more than $maxBinsPerInterval bins of width $binWidth — " +
          "widen binWidth or split the interval"))))
        .otherwise(sequence(lo, hi))
    }
    val lx = l.withColumn("__b", explode(bins("__ls", "__le", "left")))
    val rx = r.withColumn("__b2", explode(bins("__rs", "__re", "right")))
    lx.join(rx,
        col("__b") === col("__b2") &&
          col("__ls") <= col("__re") && col("__rs") <= col("__le") &&
          // canonical bin: only the bin holding the overlap's start emits
          col("__b") === floorDiv(greatest(col("__ls"), col("__rs"))))
      .select(
        leftOut.map { case (n, _) => col("__lp").getField(n).as(n) } ++
          rightOut.map { case (n, _) => col("__rp").getField(n).as(n) } :+
          (least(col("__le"), col("__re")) - greatest(col("__ls"), col("__rs")) + 1)
            .as(overlapName): _*)
  }
}

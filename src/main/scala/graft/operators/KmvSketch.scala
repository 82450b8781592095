package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the set-operation
  * member of the sketch family (q45/q70 HLL estimates cardinality but
  * cannot intersect; q77 CMS estimates frequency): keeping the k
  * smallest DISTINCT hash values of a key column yields a mergeable,
  * fixed-size state whose k-th smallest value estimates cardinality
  * (Bar-Yossef et al. 2002) AND whose states support set algebra —
  * the union sketch is the k smallest of the merged states, and the
  * fraction of union survivors present in both sides estimates
  * Jaccard (Beyer et al., SIGMOD 2007), giving intersection sizes HLL
  * fundamentally cannot produce.
  *
  * Scale shape: the state is built by a bounded [[KmvMin]]
  * `Aggregator` — partial buffers dedup and truncate to k map-side,
  * so each partition-group ships AT MOST k longs regardless of input
  * rows (the q29/q79 bounded-aggregator discipline; a
  * `collect_set`-then-sort formulation would shuffle every distinct
  * key). Rollups across groups merge states element-wise-min without
  * touching raw data again — KB sketches replace raw-history rescans,
  * the q70 incremental-analytics economics.
  *
  * Determinism: hashes are the PORTABLE 60-bit md5 prefix (the q27
  * SimHash convention — `conv(substring(md5(x),1,15),16,10)`), so a
  * DuckDB oracle re-derives every sketch, estimate, and overlap
  * bit-for-bit: min-k of a deterministic hash is a deterministic
  * "probabilistic" structure (the q77 precedent). The estimator
  * `(k-1) · 2^60 / h_(k)` divides exactly-representable doubles
  * (k-1 has ≤ 6 significant bits; h_(k) < 2^60 < 2^62 round-trips
  * through double identically in both engines), so even the estimates
  * hash-match exactly.
  */
object KmvSketch {

  /** Portable 60-bit hash of any column (cast to string first so the
    * same value hashes identically regardless of input type width).
    * Uniform on [0, 2^60); collision probability at gate scales is
    * ~n²/2^61 — negligible, and the oracle replays collisions anyway.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB expression mirroring [[hash60]] for oracle construction. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substring(md5(CAST($expr AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** Per-group KMV states: one row per group with the ascending array
    * of the ≤ k smallest distinct [[hash60]] values of `key`.
    * Output: groupCols ++ (kmv array<long>). One shuffle of bounded
    * ≤ k-long partials.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], key: Column, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2 (the estimator uses the k-th minimum), got $k")
    val agg = udaf(new KmvMin(k))
    df.select(groupCols.map(col) :+ hash60(key).as("h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("h")).as("buf"))
      .select(groupCols.map(col) :+ col("buf.hs").as("kmv"): _*)
  }

  /** Merge previously-built states into coarser groups (rollup): the
    * merged sketch is the ≤ k smallest distinct values of the union —
    * identical to sketching the union's raw data (associativity the
    * spec proves), but touching only KB states.
    */
  def mergeStates(df: DataFrame, groupCols: Seq[String], kmvCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val agg = udaf(new KmvMin(k))
    df.select(groupCols.map(col) :+ explode(kmvCol).as("h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("h")).as("buf"))
      .select(groupCols.map(col) :+ col("buf.hs").as("kmv"): _*)
  }

  /** [[mergeStates]] at STATE grain: each input row contributes its
    * whole sorted sketch through one linear distinct-merge instead of
    * k exploded rows through k binary-search inserts — the hot path
    * for sketch-iteration operators ([[graft.operators.Graph
    * .neighborhoodFunction]] pushes E·k exploded rows per round
    * through the element-grain form; this keeps it at E rows). The
    * result is the identical ≤ k smallest distinct values (merge is
    * [[mergeSorted]], the associativity the spec pins).
    */
  def mergeStatesArrays(
      df: DataFrame, groupCols: Seq[String], kmvCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val agg = udaf(new KmvMinStates(k))
    df.select(groupCols.map(col) :+ kmvCol.as("hs0"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("hs0")).as("buf"))
      .select(groupCols.map(col) :+ col("buf.hs").as("kmv"): _*)
  }

  /** Distinct-count estimate from a state: exact size while the
    * sketch is unsaturated (< k values seen — every distinct hash is
    * present), else `(k-1) · 2^60 / h_(k)`.
    */
  def estimate(kmvCol: Column, k: Int): Column =
    when(size(kmvCol) < k, size(kmvCol).cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(1152921504606846976.0) /
          element_at(kmvCol, k).cast("double"))

  /** DuckDB expression mirroring [[estimate]] over a `hs` list. */
  def estimateSql(hsExpr: String, k: Int): String =
    s"CASE WHEN len($hsExpr) < $k THEN CAST(len($hsExpr) AS DOUBLE) " +
      s"ELSE ${(k - 1).toDouble} * 1152921504606846976.0 / CAST($hsExpr[$k] AS DOUBLE) END"

  /** Driver-side state merge (incremental/streaming maintenance, the
    * q80 foreachBatch shape): ≤ k smallest distinct values of two
    * sorted-ascending states — the same linear distinct-merge the
    * [[KmvMin]] aggregator runs inside the plan, exposed for code that
    * folds collected states outside one.
    */
  def mergeSorted(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] = {
    require(k >= 1, s"KMV needs k >= 1, got $k")
    // primitive scratch, exact-sized copy-out: this runs once per EDGE
    // in the sketch-iteration hot loop (neighborhoodFunction) — a
    // boxed growable buffer per call was measurable there
    val na = a.size
    val nb = b.size
    val out = new Array[Long](math.min(k, na + nb))
    var n = 0
    var i = 0
    var j = 0
    while (n < k && (i < na || j < nb)) {
      val v =
        if (j >= nb || (i < na && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    val exact = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    scala.collection.immutable.ArraySeq.unsafeWrapArray(exact)
  }

  /** Jaccard estimate between two states: |S ∩ A ∩ B| / |S| where S
    * is the (≤ k)-min union sketch. Exact integer membership counts →
    * one deterministic double division.
    */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val s = slice(array_sort(array_distinct(concat(a, b))), 1, k)
    val matches = size(filter(s, h => array_contains(a, h) && array_contains(b, h)))
    matches.cast("double") / size(s).cast("double")
  }
}

/** Bounded ascending-distinct-min buffer: `hs` is sorted ascending,
  * duplicate-free, ≤ k. Reduce is a binary-search insert (dedup on
  * equal); merge is a linear distinct-merge scan. The [[Similarity]]
  * TopKByScore geometry, ascending and deduped.
  */
private[operators] final case class KmvBuf(hs: Seq[Long])

private[operators] final class KmvMin(k: Int)
    extends Aggregator[Long, KmvBuf, KmvBuf] {
  require(k >= 1, s"KMV needs k >= 1, got $k")

  override def zero: KmvBuf = KmvBuf(Seq.empty)

  override def reduce(buf: KmvBuf, h: Long): KmvBuf = {
    val arr = buf.hs
    val n = arr.size
    if (n >= k && h >= arr.last) buf
    else {
      // first index with element >= h
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < h) lo = mid + 1 else hi = mid
      }
      if (lo < n && arr(lo) == h) buf // already present
      else {
        val outLen = math.min(n + 1, k)
        val out = new Array[Long](outLen)
        var i = 0
        while (i < lo) { out(i) = arr(i); i += 1 }
        if (lo < outLen) out(lo) = h
        var j = lo
        while (j + 1 < outLen) { out(j + 1) = arr(j); j += 1 }
        KmvBuf(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    if (a.hs.isEmpty) b
    else if (b.hs.isEmpty) a
    else {
      val x = a.hs
      val y = b.hs
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      var j = 0
      while (out.size < k && (i < x.size || j < y.size)) {
        val v =
          if (j >= y.size || (i < x.size && x(i) <= y(j))) { val v = x(i); i += 1; v }
          else { val v = y(j); j += 1; v }
        if (out.isEmpty || out.last != v) out += v
      }
      KmvBuf(out.toSeq)
    }

  override def finish(r: KmvBuf): KmvBuf = r
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}

/** State-grain twin of [[KmvMin]]: reduce merges a whole
  * sorted-ascending sketch via the linear distinct-merge. Same
  * algebra, E-row input instead of E·k.
  */
private[operators] final class KmvMinStates(k: Int)
    extends Aggregator[Seq[Long], KmvBuf, KmvBuf] {
  require(k >= 1, s"KMV needs k >= 1, got $k")

  override def zero: KmvBuf = KmvBuf(Seq.empty)

  override def reduce(buf: KmvBuf, hs: Seq[Long]): KmvBuf =
    if (hs == null || hs.isEmpty) buf
    else KmvBuf(KmvSketch.mergeSorted(buf.hs, hs, k))

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    if (a.hs.isEmpty) b
    else if (b.hs.isEmpty) a
    else KmvBuf(KmvSketch.mergeSorted(a.hs, b.hs, k))

  override def finish(r: KmvBuf): KmvBuf = r
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch: mergeable fixed-size frequency summaries
  * (Cormode & Muthukrishnan, J. Algorithms 2005 — public-domain
  * algorithm, no reference-repo counterpart). Complements the other
  * sketch states in this engine: HLL states answer "how many
  * distinct" (q70), Misra-Gries answers "which are the heaviest"
  * (q71), CMS answers "how often does THIS key occur" for any key,
  * from d·w counters regardless of cardinality.
  *
  * The 100 TB story is the state shape: each partial buffer is a
  * constant d·w long array that partial-aggregates map-side and merges
  * by element-wise addition in ANY order — per-group states persist as
  * `array<bigint>` columns, and incremental rollups union-merge stored
  * states instead of rescanning raw history (same contract as the q70
  * HLL states). Estimates are overestimates only: for every key,
  * `true ≤ est`, and `est ≤ true + εN` with ε = e/w at the usual
  * probabilistic guarantee.
  *
  * Hashing is the engine-portable md5 idiom (first 8 hex chars of
  * `md5(token + "|" + row)` as an unsigned 32-bit value, mod w) — NOT
  * the fastest hash, but any engine can replay the exact counters
  * (`('0x' || substring(md5(t || '|' || j), 1, 8))::BIGINT % w`), so
  * the correctness gate is a deterministic hash-match, not a tolerance
  * band.
  */
object CountMin {

  /** Bucket of `token` in hash row `j`: first 4 bytes of
    * md5(token + "|" + j) as an unsigned 32-bit big-endian value,
    * mod w. Bit-reproducible in any engine with md5.
    */
  def bucket(token: String, j: Int, w: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((token + "|" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (u % w).toInt
  }

  /** Per-group CMS states: `groupCols :+ cms` where `cms` is the d·w
    * counter array (row j occupies slots [j·w, (j+1)·w)). Null tokens
    * are dropped (a null key never has a meaningful frequency).
    */
  def cmsStates(
      df: DataFrame, token: Column, groupCols: Seq[String], w: Int, d: Int): DataFrame = {
    requireShape(w, d)
    val agg = udaf(new CmsBuildAgg(w, d))
    val base = df.select(groupCols.map(col) :+ token.cast("string").as("__tok"): _*)
      .where(col("__tok").isNotNull)
    base.groupBy(groupCols.map(col): _*).agg(agg(col("__tok")).as("cms"))
  }

  /** Union-merge of CMS states (element-wise addition — the merged
    * sketch is IDENTICAL to one built over the concatenated inputs,
    * in any merge order). States must share (w, d); length is checked
    * per row.
    */
  def cmsMergeStates(df: DataFrame, state: Column, w: Int, d: Int): DataFrame = {
    requireShape(w, d)
    val agg = udaf(new CmsMergeAgg(w * d))
    df.select(state.as("__cms")).agg(agg(col("__cms")).as("cms"))
  }

  /** Point estimates from a (single-row) state frame: one `(key, est)`
    * row per requested key — est = min over the d rows of the key's
    * counter, the classic CMS upper-bound estimate. Buckets for the
    * literal keys are computed driver-side, so the lookup is d
    * `element_at`s per key: no shuffle, no join.
    */
  def cmsPointEstimates(
      states: DataFrame, state: Column, keys: Seq[String], w: Int, d: Int): DataFrame = {
    requireShape(w, d)
    require(keys.nonEmpty, "cmsPointEstimates needs at least one key")
    require(keys.forall(_ != null), "cmsPointEstimates: null key")
    val pairs = keys.map { k =>
      val slots = (0 until d).map(j => j * w + bucket(k, j, w) + 1) // 1-based element_at
      val est = slots.map(i => element_at(state, i)).reduce(least(_, _))
      struct(lit(k).as("key"), est.as("est"))
    }
    states.select(explode(array(pairs: _*)).as("e"))
      .select(col("e.key").as("key"), col("e.est").as("est"))
  }

  private def requireShape(w: Int, d: Int): Unit = {
    require(w >= 2, s"CMS width must be >= 2, got $w")
    require(d >= 1 && d <= 16, s"CMS depth must be in [1, 16], got $d")
    require(w.toLong * d <= (1L << 24), s"CMS state ${w}x$d exceeds the 16M-counter cap")
  }
}

private[operators] final case class CmsBuf(counts: Array[Long])

/** CMS build aggregator: reduce increments d counters per token,
  * merge is element-wise addition — associative, commutative, and
  * equal to a single-pass build over the union (the property the
  * mergeable-states query gates).
  */
private[operators] final class CmsBuildAgg(w: Int, d: Int)
    extends Aggregator[String, CmsBuf, Array[Long]] {

  override def zero: CmsBuf = CmsBuf(new Array[Long](w * d))

  override def reduce(b: CmsBuf, tok: String): CmsBuf = {
    var j = 0
    while (j < d) {
      b.counts(j * w + CountMin.bucket(tok, j, w)) += 1L
      j += 1
    }
    b
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    var i = 0
    while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
    a
  }

  override def finish(r: CmsBuf): Array[Long] = r.counts

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** CMS state merger: element-wise addition of already-built states.
  * A null state or a state of the wrong length fails LOUDLY — silently
  * skipping one would produce a plausible but wrong merged sketch.
  */
private[operators] final class CmsMergeAgg(len: Int)
    extends Aggregator[Seq[Long], CmsBuf, Array[Long]] {

  override def zero: CmsBuf = CmsBuf(new Array[Long](len))

  override def reduce(b: CmsBuf, state: Seq[Long]): CmsBuf = {
    require(state != null, "cmsMergeStates: null state row")
    require(state.length == len,
      s"cmsMergeStates: state has ${state.length} counters, expected $len — " +
        "all merged states must share (w, d)")
    var i = 0
    state.foreach { c => b.counts(i) += c; i += 1 }
    b
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    var i = 0
    while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
    a
  }

  override def finish(r: CmsBuf): Array[Long] = r.counts

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

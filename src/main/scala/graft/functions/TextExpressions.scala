package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lowercased unicode-word tokenization as a native expression: one
  * code-point scan per row instead of `filter(split(lower(text), regex))`
  * — the regex engine plus two interpreted higher-order functions that
  * dominate the text-operator hot path (tokens feed shingles, MinHash,
  * SimHash, quality, language-ID).
  *
  * Semantics match the HOF formulation (`TextAnalysis.tokensHof`):
  * tokens are maximal runs of Unicode letters + DECIMAL digits (Nd;
  * letter-like numerics Ⅻ/² are separators in BOTH formulations —
  * parity asserted on Nl/No and supplementary-plane inputs in
  * OperatorsSpec), lowercased, empty runs dropped. (The one remaining
  * exotic divergence class — titlecase digraphs whose case-mapping
  * differs between lower-then-split and split-then-lower — doesn't
  * occur in the corpora this engine targets.)
  */
case class TokenizeWords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokenize requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_tokenize"

  override protected def nullSafeEval(input: Any): Any =
    TokenizeWords.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeWords.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeWords {

  /** Static entry point shared by interpreted eval and generated code. */
  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = ArrayBuffer.empty[Any]
    val n = str.length
    var i = 0
    var start = -1
    while (i < n) {
      val cp = str.codePointAt(i)
      val isWord = Character.isLetterOrDigit(cp)
      if (isWord && start < 0) start = i
      else if (!isWord && start >= 0) {
        // Locale.ROOT: default-locale toLowerCase breaks the asserted
        // bit-equality with Spark's locale-independent lower() on e.g.
        // Turkish-locale JVMs ("I" -> dotless i) — and would hash the
        // same text differently on differently-configured executors
        out += UTF8String.fromString(
          str.substring(start, i).toLowerCase(java.util.Locale.ROOT))
        start = -1
      }
      i += Character.charCount(cp)
    }
    if (start >= 0)
      out += UTF8String.fromString(str.substring(start).toLowerCase(java.util.Locale.ROOT))
    new GenericArrayData(out.toArray)
  }
}

/** JARO-WINKLER string similarity as a native codegen'd expression —
  * the record-linkage scoring kernel (Winkler 1990, the Census
  * Bureau's name matcher): Jaro's match-window/transposition measure
  * plus the up-to-4-char common-prefix boost `jw = j + 0.1·ℓ·(1−j)`,
  * applied when j > 0.7. One fused byte-level scan per pair — the
  * composable-Column formulation would be a regex-free but
  * interpreted multi-pass; inside a blocked fuzzy self-join this
  * expression runs once per candidate pair, squarely on the hot path.
  *
  * Semantics pinned to the BYTE sequence (not code points): this
  * matches DuckDB's `jaro_winkler_similarity` (verified on multibyte
  * inputs — 'héllo'/'hello' scores as 6-vs-5 bytes), which is the
  * cross-engine oracle; both empty strings score 0 (DuckDB contract),
  * and the boost fires strictly above 0.7. Result is a pure function
  * of the bytes — no locale, no normalization (callers lowercase
  * first if they want case-insensitive matching).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_jaro_winkler requires two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry point shared by interpreted eval and generated code. */
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a(i) == b(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}

/** Thresholded edit distance — `levenshtein(a, b)` when it is ≤ k,
  * −1 otherwise — as a native kernel for the fuzzy-join verification
  * loop ([[graft.operators.FuzzyJoin]]): the full DP is O(|a|·|b|)
  * cells, but a verifier that only needs "≤ k or not" can (1) strip
  * the common prefix and suffix first — FastSS blocks share long
  * prefixes by construction, so this usually deletes most of the
  * problem — and (2) run Ukkonen's band of width 2k+1 with an
  * early-exit when a whole row exceeds k. Code-point semantics match
  * Spark's `levenshtein` exactly (both engines' parity is pinned by
  * the fuzzy-join oracles); one kernel call replaces the
  * filter-then-recompute double evaluation.
  */
case class LevenshteinAtMost(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 0 && k <= 64, s"graft_lev_le: k must be in [0, 64], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_lev_le requires two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "graft_lev_le"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinAtMost.led(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LevenshteinAtMost.led($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinAtMost {

  /** Static entry point shared by interpreted eval and generated code:
    * levenshtein(ua, ub) if ≤ k, else −1.
    */
  def led(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val sa = ua.toString
    val sb = ub.toString
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    var lo = 0
    var aHi = a.length
    var bHi = b.length
    if (math.abs(aHi - bHi) > k) return -1
    // strip the common prefix and suffix — edits there cost 0, and
    // FastSS blocks share long prefixes by construction
    while (lo < aHi && lo < bHi && a(lo) == b(lo)) lo += 1
    while (aHi > lo && bHi > lo && a(aHi - 1) == b(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val m = aHi - lo
    val n = bHi - lo
    if (m == 0) return n // n <= k by the length pre-check
    if (n == 0) return m
    if (k == 0) return -1 // unequal remainders cannot be distance 0
    // banded DP, rows over a's remainder, band j in [i-k, i+k]
    val inf = k + 1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= m) {
      val jLo = math.max(1, i - k)
      val jHi = math.min(n, i + k)
      cur(jLo - 1) = if (i - (jLo - 1) <= k) i else inf
      var rowMin = cur(jLo - 1)
      j = jLo
      while (j <= jHi) {
        val sub = prev(j - 1) + (if (a(lo + i - 1) == b(lo + j - 1)) 0 else 1)
        val del = (if (j - 1 >= jLo - 1) cur(j - 1) else inf) + 1
        val ins = (if (j <= math.min(n, i - 1 + k)) prev(j) else inf) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (jHi < n) cur(jHi + 1) = inf
      if (rowMin > k) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(n) <= k) prev(n) else -1
  }
}

/** Greedy longest-match subword segmentation (wordpiece-style
  * "tokenizer apply") as a native expression: every token of the input
  * array splits into the longest vocabulary pieces matching at each
  * position, single-character fallback where nothing matches (total —
  * no [UNK] state; a char that IS a vocab piece segments identically
  * either way). Output is the flattened piece sequence across tokens.
  *
  * Map-side at any scale: the vocabulary rides along as an array
  * literal (like [[NearestCentroids]]' centroid literal) and compiles
  * once per executor into a hash set via a single-slot identity cache
  * — a non-literal vocab column still evaluates correctly, just
  * recompiling per distinct array instance.
  */
case class WordpieceEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece requires (array<string> tokens, array<string> vocab), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece"

  override protected def nullSafeEval(toks: Any, vocab: Any): Any =
    WordpieceKernels.encode(toks.asInstanceOf[ArrayData], vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, v) => s"graft.functions.WordpieceKernels.encode($t, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deletion-neighborhood HASHES — the FastSS blocking key generator
  * ([[graft.operators.FuzzyJoin]]) as a native kernel: the sorted
  * distinct 64-bit hashes of every variant of `s` reachable by ≤ k
  * code-point deletions (including s itself), WITHOUT materializing a
  * single variant string. A polynomial rolling hash over per-position
  * mixed code points (h(v) = Σ mix(vₜ)·Bᵗ mod 2⁶⁴, B odd) makes each
  * deletion variant O(1) from the prefix table: deleting position i
  * shifts the suffix down one power, which is a multiply by B⁻¹ (odd
  * B is invertible mod 2⁶⁴); deleting i < j splits into three
  * segments with B⁻¹ and B⁻² corrections. The hash of the del-variant
  * therefore EQUALS the hash the variant string would get as a full
  * string — cross-string block keys agree exactly.
  *
  * The join's exactness is untouched: equal variant strings always
  * hash equal (completeness preserved), and a 64-bit collision can
  * only MERGE two blocks whose candidate pairs still face exact
  * verification (soundness preserved). Per-position `mix` (a 64-bit
  * avalanche of the code point) breaks the linear structure a raw
  * c·Bᵗ polynomial would leak between near-equal code points.
  *
  * Replaces 1 + L + L(L−1)/2 substr/concat string allocations per
  * row (then a string array_distinct and a string-keyed shuffle) with
  * pure long arithmetic and an 8-byte shuffle key — measured 2.8 s →
  * sub-second on the sf1 q365 variant stage.
  */
case class DeletionHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 2, s"graft_del_hashes: k must be in [1, 2], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_del_hashes requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "graft_del_hashes"

  override protected def nullSafeEval(s: Any): Any =
    DeletionHashes.hashes(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeletionHashes.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeletionHashes {
  private val B = 0x9E3779B97F4A7C15L
  // modular inverse of B mod 2^64 via Newton iteration (B odd)
  private val Binv: Long = {
    var x = B // x ≡ B⁻¹ mod 2³ to start; each step doubles the bits
    var i = 0
    while (i < 5) { x = x * (2L - B * x); i += 1 }
    x
  }
  private val Binv2 = Binv * Binv

  /** splitmix64-style avalanche of a code point — breaks the linear
    * structure of the raw polynomial.
    */
  private def mix(c: Int): Long = {
    var z = c + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Static entry point shared by interpreted eval and generated
    * code: sorted distinct hashes of Del≤k(s) ∪ {s}.
    */
  def hashes(us: UTF8String, k: Int): ArrayData = {
    val cp = us.toString.codePoints().toArray
    val L = cp.length
    if (L > 8192)
      throw new IllegalArgumentException(
        s"graft_del_hashes: input has $L code points (> 8192) — the " +
          "depth-2 neighborhood would explode; pre-truncate or pre-filter")
    // prefix hashes H(t) = Σ_{u<t} mix(cp(u))·B^u
    val h = new Array[Long](L + 1)
    var pw = 1L
    var t = 0
    while (t < L) { h(t + 1) = h(t) + mix(cp(t)) * pw; pw *= B; t += 1 }
    val full = h(L)
    val n = 1 + (if (k >= 1) L else 0) + (if (k >= 2) L * (L - 1) / 2 else 0)
    val out = new Array[Long](n)
    out(0) = full
    var w = 1
    var i = 0
    while (i < L) { // delete position i
      out(w) = h(i) + (full - h(i + 1)) * Binv
      w += 1
      i += 1
    }
    if (k >= 2) {
      i = 0
      while (i < L - 1) {
        val pre = h(i)
        var j = i + 1
        while (j < L) { // delete positions i < j
          out(w) = pre + (h(j) - h(i + 1)) * Binv + (full - h(j + 1)) * Binv2
          w += 1
          j += 1
        }
        i += 1
      }
    }
    java.util.Arrays.sort(out)
    // in-place unique over the sorted array
    var u = 0
    var r = 1
    while (r < n) {
      if (out(r) != out(u)) { u += 1; out(u) = out(r) }
      r += 1
    }
    val uniq = if (u + 1 == n) out else java.util.Arrays.copyOf(out, u + 1)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(uniq)
  }
}

/** Identity-keyed compile cache for literal-argument kernels: a
  * literal's ArrayData is ONE instance reused for every row of a
  * partition, so compiling per distinct instance is compiling once —
  * but a query can hold SEVERAL such kernels with different literals
  * in one projection (two tokenizers side by side), where a
  * single-slot cache would thrash: each call evicts the other's entry
  * and both recompile EVERY row. A few slots absorb that; the bound
  * keeps a (pathological) non-literal argument column from leaking.
  * The volatile-immutable-list publish is race-safe: a lost update
  * merely recompiles.
  */
private[functions] final class IdentityCache[V <: AnyRef](
    compile: ArrayData => V, slots: Int = 4) {
  private final case class Slot(key: ArrayData, value: V)
  @volatile private var cache: List[Slot] = Nil
  def get(key: ArrayData): V = {
    var cur = cache
    while (cur.nonEmpty) {
      if (cur.head.key eq key) return cur.head.value
      cur = cur.tail
    }
    val v = compile(key)
    cache = (Slot(key, v) :: cache).take(slots)
    v
  }
}

object WordpieceKernels {

  private final class Compiled(val pieces: java.util.HashSet[String], val maxLen: Int)

  private val cache = new IdentityCache[Compiled](vocab => {
    val set = new java.util.HashSet[String]()
    var maxLen = 1
    var i = 0
    while (i < vocab.numElements()) {
      if (!vocab.isNullAt(i)) {
        val p = vocab.getUTF8String(i).toString
        if (p.nonEmpty) {
          set.add(p)
          if (p.length > maxLen) maxLen = p.length
        }
      }
      i += 1
    }
    new Compiled(set, maxLen)
  })

  private def compiled(vocab: ArrayData): Compiled = cache.get(vocab)

  /** Static entry point shared by interpreted eval and generated code. */
  def encode(toks: ArrayData, vocab: ArrayData): ArrayData = {
    val v = compiled(vocab)
    val out = ArrayBuffer.empty[Any]
    var ti = 0
    while (ti < toks.numElements()) {
      if (!toks.isNullAt(ti)) {
        val word = toks.getUTF8String(ti).toString
        var p = 0
        while (p < word.length) {
          var len = math.min(v.maxLen, word.length - p)
          var hit = 1
          var found = false
          while (len >= 1 && !found) {
            if (v.pieces.contains(word.substring(p, p + len))) {
              hit = len
              found = true
            }
            len -= 1
          }
          // the char-fallback must advance by a full CODE POINT: a
          // lone high surrogate is not a valid string, and
          // UTF8String.fromString would encode each half as '?' —
          // collapsing every supplementary-plane character to the
          // same piece
          if (!found && Character.isHighSurrogate(word.charAt(p)) &&
              p + 1 < word.length && Character.isLowSurrogate(word.charAt(p + 1)))
            hit = 2
          out += UTF8String.fromString(word.substring(p, p + hit))
          p += hit
        }
      }
      ti += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** BPE tokenizer APPLY (the consumer of [[graft.operators.TextAnalysis
  * .bpeTrain]]'s merge table): each token starts as its code-point
  * characters, then the merges apply IN RANK ORDER, each rank merging
  * every left-to-right non-overlapping occurrence of its pair —
  * Sennrich et al. 2016's `apply_bpe` processing order, and exactly
  * the per-round application the trainer itself used, so encoding the
  * training corpus reproduces the trainer's final symbol state.
  * Output is the flattened piece sequence across tokens.
  *
  * Map-side at any scale: the merge table rides in as an
  * `array<string>` literal of "left right" rows (tokens never contain
  * spaces, so the join is unambiguous) compiled once per executor via
  * the same single-slot identity cache as [[WordpieceEncode]]'s vocab.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode requires (array<string> tokens, array<string> merges), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(toks: Any, merges: Any): Any =
    BpeKernels.encode(toks.asInstanceOf[ArrayData], merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, m) => s"graft.functions.BpeKernels.encode($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeKernels {

  // parsed (left, right) pairs in rank order — the same
  // [[IdentityCache]] discipline as WordpieceKernels (one compile per
  // literal instance, multi-kernel projections don't thrash)
  private val cache = new IdentityCache[Array[(String, String)]](merges => {
    val out = Array.newBuilder[(String, String)]
    var i = 0
    while (i < merges.numElements()) {
      if (!merges.isNullAt(i)) {
        val row = merges.getUTF8String(i).toString
        val sp = row.indexOf(' ')
        require(sp > 0 && sp < row.length - 1,
          s"graft_bpe_encode: merge row '$row' is not 'left right'")
        out += ((row.substring(0, sp), row.substring(sp + 1)))
      }
      i += 1
    }
    out.result()
  })

  private def compiled(merges: ArrayData): Array[(String, String)] = cache.get(merges)

  /** Static entry point shared by interpreted eval and generated code. */
  def encode(toks: ArrayData, merges: ArrayData): ArrayData = {
    val table = compiled(merges)
    val out = ArrayBuffer.empty[Any]
    var ti = 0
    while (ti < toks.numElements()) {
      if (!toks.isNullAt(ti)) {
        val word = toks.getUTF8String(ti).toString
        // code-point characters (supplementary-plane safe, like the
        // tokenizer)
        var syms = {
          val b = ArrayBuffer.empty[String]
          var p = 0
          while (p < word.length) {
            val cp = word.codePointAt(p)
            val n = Character.charCount(cp)
            b += word.substring(p, p + n)
            p += n
          }
          b
        }
        var m = 0
        while (m < table.length && syms.length > 1) {
          val (l, r) = table(m)
          // left-to-right non-overlapping — the trainer's application
          val nb = ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              nb += (syms(i) + syms(i + 1)); i += 2
            } else { nb += syms(i); i += 1 }
          }
          syms = nb
          m += 1
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      ti += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Token-sequence Levenshtein distance as a native kernel — the core
  * of WER ([[graft.operators.TextAnalysis.wordErrorRate]]): the
  * minimum token substitutions + insertions + deletions turning `left`
  * into `right`. Same two-row O(m·n) DP shape as [[TokenLcs]] but over
  * the edit recurrence; the builtin `levenshtein` is CHARACTER-level
  * (and WER over a re-joined string would mis-count multi-char
  * tokens), so a token-grain kernel is the only codegen'd route. The
  * caller caps the sequences (documented truncation) because the
  * product cost is real.
  */
case class TokenEditDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_tok_lev requires two array<string>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "graft_tok_lev"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokLevKernel.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TokLevKernel.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokLevKernel {

  /** Static entry point shared by interpreted eval and generated code.
    * Null elements equal nothing (the tokenizer never emits them;
    * defensive, not load-bearing) — a null token always costs a
    * substitution against any other token.
    */
  def dist(a: ArrayData, b: ArrayData): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0) return n
    if (n == 0) return m
    // two-row DP; prev = distances for i tokens of a, cur for i+1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      cur(0) = i + 1
      j = 0
      while (j < n) {
        val bj = if (b.isNullAt(j)) null else b.getUTF8String(j)
        val sub = prev(j) + (if (ai != null && bj != null && ai.equals(bj)) 0 else 1)
        val del = prev(j + 1) + 1
        val ins = cur(j) + 1
        var best = sub
        if (del < best) best = del
        if (ins < best) best = ins
        cur(j + 1) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }
}

/** Token-sequence LCS length as a native kernel — the core of
  * ROUGE-L ([[graft.operators.TextAnalysis.rougeL]]). The classic
  * two-row O(m·n) DP over UTF8String equality; the caller caps the
  * sequences (ROUGE truncation) because the product cost is real.
  * An interpreted HOF formulation would pay a boxed nested fold per
  * pair — this is one tight int loop in generated code.
  */
case class TokenLcs(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_lcs requires two array<string>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "graft_lcs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsKernel.lcsLen(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LcsKernel.lcsLen($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsKernel {

  /** Static entry point shared by interpreted eval and generated code.
    * Null elements never match anything (the tokenizer never emits
    * them; defensive, not load-bearing).
    */
  def lcsLen(a: ArrayData, b: ArrayData): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0
    // two-row DP; previous row `prev`, current `cur`
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      var j = 0
      while (j < n) {
        val bj = if (b.isNullAt(j)) null else b.getUTF8String(j)
        cur(j + 1) =
          if (ai != null && bj != null && ai.equals(bj)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(n)
  }
}

/** Registry for all graft_* native expressions (idempotent; works on any
  * session including the driver's).
  */
object GraftFunctions {

  // one registration per session — repeat calls are no-ops, so hot
  // paths can call register() freely without "replaced a previously
  // registered function" warnings on every query (weak keys: sessions
  // can be GC'd)
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit =
    // synchronized + mark-AFTER-success: a concurrent caller must not
    // proceed while registration is mid-flight (it would hit "undefined
    // function"), and a doRegister failure must not permanently mark
    // the session registered with half the functions missing
    registered.synchronized {
      if (!java.lang.Boolean.TRUE.equals(registered.get(spark))) {
        doRegister(spark)
        registered.put(spark, java.lang.Boolean.TRUE)
      }
    }

  /** One (name, usage, builder) row per graft_* function — the SINGLE
    * source both registration paths derive from ([[doRegister]] for the
    * lazy Column-API path, [[graft.GraftExtensions]] for
    * `spark.sql.extensions`), so the two registries cannot drift (an
    * earlier hand-maintained extensions list silently omitted
    * graft_nearest_centroids).
    */
  private[graft] final case class FnSpec(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression)

  /** Arity guard with a readable error (instead of
    * IndexOutOfBoundsException from `exprs(i)`).
    */
  private def arity(fn: String, usage: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.size != n)
      throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${exprs.size} — usage: $usage")

  /** Foldable-int argument with readable errors (a column reference
    * would otherwise die in eval() with UnsupportedOperationException,
    * and NULL with an NPE).
    */
  private def intArg(fn: String, exprs: Seq[Expression], i: Int): Int = {
    val e = exprs(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a literal integer, got ${e.sql}")
    def fit(l: Long, integral: Boolean, shown: Any): Int = {
      if (!integral)
        throw new IllegalArgumentException(
          s"$fn argument ${i + 1} must be an INTEGRAL literal, got $shown " +
            "(a fractional value would silently truncate)")
      if (l < Int.MinValue || l > Int.MaxValue)
        throw new IllegalArgumentException(
          s"$fn argument ${i + 1} is out of int range: $shown")
      l.toInt
    }
    e.eval() match {
      case d: java.lang.Double => fit(d.toLong, d.doubleValue() == math.rint(d.doubleValue()), d)
      case f: java.lang.Float => fit(f.toLong, f.floatValue() == math.rint(f.floatValue()), f)
      case dec: org.apache.spark.sql.types.Decimal =>
        fit(dec.toLong, dec.toDouble == math.rint(dec.toDouble), dec)
      case n: Number => fit(n.longValue(), integral = true, n)
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a non-null literal integer, got $other")
    }
  }

  /** Foldable-double argument with readable errors (mirror of
    * [[intArg]] for fractional parameters).
    */
  private def doubleArg(fn: String, exprs: Seq[Expression], i: Int): Double = {
    val e = exprs(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a literal number, got ${e.sql}")
    e.eval() match {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.doubleValue()
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a non-null literal number, got $other")
    }
  }

  private def spec(name: String, usage: String, n: Int)(
      b: Seq[Expression] => Expression): FnSpec =
    FnSpec(name, usage, exprs => { arity(name, usage, exprs, n); b(exprs) })

  private[graft] val specs: Seq[FnSpec] = Seq(
    spec("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two array<double>", 2)(
      exprs => CosineSimilarity(exprs.head, exprs(1))),
    spec("graft_tokenize",
      "graft_tokenize(text) - lowercased unicode word tokens", 1)(
      exprs => TokenizeWords(exprs.head)),
    spec("graft_minhash",
      "graft_minhash(array<string>, k) - k-permutation MinHash signature", 2)(
      exprs => MinHashSignature(exprs.head, intArg("graft_minhash", exprs, 1))),
    spec("graft_minhash64",
      "graft_minhash64(array<bigint>, k) - MinHash from pre-hashed elements", 2)(
      exprs => MinHashFromHashes(exprs.head, intArg("graft_minhash64", exprs, 1))),
    spec("graft_simhash",
      "graft_simhash(array<string>) - 64-bit SimHash", 1)(
      exprs => SimHash64(exprs.head)),
    spec("graft_simhash60",
      "graft_simhash60(array<string>) - portable 60-bit md5 SimHash", 1)(
      exprs => PortableSimHash60(exprs.head)),
    spec("graft_shingles",
      "graft_shingles(array<string>, n) - sorted distinct hashed n-gram shingles", 2)(
      exprs => HashedShingles(exprs.head, intArg("graft_shingles", exprs, 1))),
    spec("graft_overlap",
      "graft_overlap(a, b) - intersection size of two sorted array<bigint>", 2)(
      exprs => SortedOverlapCount(exprs.head, exprs(1))),
    spec("graft_ppjoin_expand",
      "graft_ppjoin_expand(block, tfrac) - PPJoin positional-filtered pair expansion", 2)(
      exprs => PpjoinExpand(exprs.head, doubleArg("graft_ppjoin_expand", exprs, 1))),
    spec("graft_matvec",
      "graft_matvec(v, rows) - dot product of v against each matrix row", 2)(
      exprs => MatVecDots(exprs.head, exprs(1))),
    spec("graft_nearest_centroids",
      "graft_nearest_centroids(v, centroids, top) - nearest IVF cells, best-first", 3)(
      exprs => NearestCentroids(exprs.head, exprs(1),
        intArg("graft_nearest_centroids", exprs, 2))),
    spec("graft_nearest_centroids_l2",
      "graft_nearest_centroids_l2(v, centroids, top) - nearest by squared L2, best-first", 3)(
      exprs => NearestCentroidsL2(exprs.head, exprs(1),
        intArg("graft_nearest_centroids_l2", exprs, 2))),
    spec("graft_hyperplane_buckets",
      "graft_hyperplane_buckets(v, bits, tables) - hyperplane-LSH bucket id per table", 3)(
      exprs => HyperplaneBuckets(exprs.head,
        intArg("graft_hyperplane_buckets", exprs, 1),
        intArg("graft_hyperplane_buckets", exprs, 2))),
    spec("graft_wordpiece",
      "graft_wordpiece(tokens, vocab) - greedy longest-match subword pieces", 2)(
      exprs => WordpieceEncode(exprs.head, exprs(1))),
    spec("graft_bpe_encode",
      "graft_bpe_encode(tokens, merges) - BPE pieces via rank-ordered 'left right' merges", 2)(
      exprs => BpeEncode(exprs.head, exprs(1))),
    spec("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - byte-level Jaro-Winkler similarity", 2)(
      exprs => JaroWinkler(exprs.head, exprs(1))),
    spec("graft_lcs",
      "graft_lcs(a, b) - longest-common-subsequence length of two array<string>", 2)(
      exprs => TokenLcs(exprs.head, exprs(1))),
    spec("graft_tok_lev",
      "graft_tok_lev(a, b) - token-level Levenshtein distance of two array<string>", 2)(
      exprs => TokenEditDistance(exprs.head, exprs(1))),
    spec("graft_lev_le",
      "graft_lev_le(a, b, k) - levenshtein(a, b) if <= k else -1 (banded, early-exit)", 3)(
      exprs => LevenshteinAtMost(exprs.head, exprs(1),
        intArg("graft_lev_le", exprs, 2))),
    spec("graft_del_hashes",
      "graft_del_hashes(s, k) - sorted distinct hashes of all <=k-deletion variants", 2)(
      exprs => DeletionHashes(exprs.head, intArg("graft_del_hashes", exprs, 1))),
    spec("graft_wedge_candidates",
      "graft_wedge_candidates(ns, filter) - bloom-gated i<j wedge pair survivors", 2)(
      exprs => WedgeCandidates(exprs.head, exprs(1))),
    spec("graft_searchsorted",
      "graft_searchsorted(v, sorted_bounds) - count of boundaries <= v (binary search)", 2)(
      exprs => SearchSorted(exprs.head, exprs(1))),
    spec("graft_bloom_contains",
      "graft_bloom_contains(key, filter_bytes) - bloom-filter membership probe", 2)(
      exprs => BloomMightContainLong(exprs.head, exprs(1))),
    spec("graft_blocked_bloom_contains",
      "graft_blocked_bloom_contains(key, filter_bytes) - split-block bloom membership probe", 2)(
      exprs => BlockedBloomContains(exprs.head, exprs(1))),
    // variadic: bits first, then >= 2 key columns
    FnSpec("graft_zorder",
      "graft_zorder(bits, k1, k2, ...) - Morton-interleaved clustering key",
      exprs => {
        if (exprs.size < 3)
          throw new IllegalArgumentException(
            "graft_zorder expects (bits, k1, k2, ...) with at least two key columns")
        ZOrderKey(exprs.tail, intArg("graft_zorder", exprs, 0))
      }))

  private def doRegister(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    specs.foreach(s => reg.createOrReplaceTempFunction(s.name, s.builder, "scala_udf"))
  }

  // Column builders. Each has an explicit-session overload — the form
  // to THREAD an owning session through (a DataFrame-taking operator
  // passes df.sparkSession) — and a no-session convenience overload
  // that falls back to SparkSession.active. The fallback is only safe
  // when the column will be analyzed by the session that is active at
  // build time; registration is all-or-nothing per session (one
  // doRegister installs every graft_* function), so a single
  // register(owningSession) anywhere in an operator covers every
  // builder the operator uses.

  def cosine(a: Column, b: Column): Column = cosine(SparkSession.active, a, b)
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_cosine", a, b)
  }

  def tokenize(text: Column): Column = tokenize(SparkSession.active, text)
  def tokenize(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("graft_tokenize", text)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    jaroWinkler(SparkSession.active, a, b)
  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_jaro_winkler", a, b)
  }

  def levAtMost(a: Column, b: Column, k: Int): Column =
    levAtMost(SparkSession.active, a, b, k)
  def levAtMost(spark: SparkSession, a: Column, b: Column, k: Int): Column = {
    register(spark)
    call_function("graft_lev_le", a, b, org.apache.spark.sql.functions.lit(k))
  }

  def delHashes(s: Column, k: Int): Column =
    delHashes(SparkSession.active, s, k)
  def delHashes(spark: SparkSession, s: Column, k: Int): Column = {
    register(spark)
    call_function("graft_del_hashes", s, org.apache.spark.sql.functions.lit(k))
  }

  def minhash(strings: Column, k: Int): Column = minhash(SparkSession.active, strings, k)
  def minhash(spark: SparkSession, strings: Column, k: Int): Column = {
    register(spark)
    call_function("graft_minhash", strings, org.apache.spark.sql.functions.lit(k))
  }

  def simhash(strings: Column): Column = simhash(SparkSession.active, strings)
  def simhash(spark: SparkSession, strings: Column): Column = {
    register(spark)
    call_function("graft_simhash", strings)
  }

  def shingles(tokens: Column, n: Int): Column = shingles(SparkSession.active, tokens, n)
  def shingles(spark: SparkSession, tokens: Column, n: Int): Column = {
    register(spark)
    call_function("graft_shingles", tokens, org.apache.spark.sql.functions.lit(n))
  }

  def minhashFromHashes(hashes: Column, k: Int): Column =
    minhashFromHashes(SparkSession.active, hashes, k)
  def minhashFromHashes(spark: SparkSession, hashes: Column, k: Int): Column = {
    register(spark)
    call_function("graft_minhash64", hashes, org.apache.spark.sql.functions.lit(k))
  }

  def tokenLcs(a: Column, b: Column): Column = tokenLcs(SparkSession.active, a, b)
  def tokenLcs(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_lcs", a, b)
  }

  def tokenLev(a: Column, b: Column): Column = tokenLev(SparkSession.active, a, b)
  def tokenLev(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_tok_lev", a, b)
  }

  def sortedOverlap(a: Column, b: Column): Column = sortedOverlap(SparkSession.active, a, b)
  def sortedOverlap(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_overlap", a, b)
  }

  def matVec(v: Column, rows: Column): Column = matVec(SparkSession.active, v, rows)
  def matVec(spark: SparkSession, v: Column, rows: Column): Column = {
    register(spark)
    call_function("graft_matvec", v, rows)
  }

  def ppjoinExpand(block: Column, tFrac: Double): Column =
    ppjoinExpand(SparkSession.active, block, tFrac)
  def ppjoinExpand(spark: SparkSession, block: Column, tFrac: Double): Column = {
    register(spark)
    call_function("graft_ppjoin_expand", block,
      org.apache.spark.sql.functions.lit(tFrac))
  }

  def nearestCentroids(v: Column, centroids: Column, top: Int): Column =
    nearestCentroids(SparkSession.active, v, centroids, top)
  def nearestCentroids(spark: SparkSession, v: Column, centroids: Column, top: Int): Column = {
    register(spark)
    call_function("graft_nearest_centroids", v, centroids,
      org.apache.spark.sql.functions.lit(top))
  }

  def nearestCentroidsL2(v: Column, centroids: Column, top: Int): Column =
    nearestCentroidsL2(SparkSession.active, v, centroids, top)
  def nearestCentroidsL2(spark: SparkSession, v: Column, centroids: Column, top: Int): Column = {
    register(spark)
    call_function("graft_nearest_centroids_l2", v, centroids,
      org.apache.spark.sql.functions.lit(top))
  }

  def hyperplaneBuckets(v: Column, bits: Int, tables: Int): Column =
    hyperplaneBuckets(SparkSession.active, v, bits, tables)
  def hyperplaneBuckets(spark: SparkSession, v: Column, bits: Int, tables: Int): Column = {
    register(spark)
    call_function("graft_hyperplane_buckets", v,
      org.apache.spark.sql.functions.lit(bits), org.apache.spark.sql.functions.lit(tables))
  }

  def wordpiece(tokens: Column, vocab: Seq[String]): Column =
    wordpiece(SparkSession.active, tokens, vocab)
  def wordpiece(spark: SparkSession, tokens: Column, vocab: Seq[String]): Column = {
    // an empty Seq builds array() of NO columns — array<void> — and
    // dies with a confusing type error at analysis; say it directly
    // (the bpeEncode sibling already does)
    require(vocab.nonEmpty, "wordpiece needs a non-empty vocab")
    register(spark)
    call_function("graft_wordpiece", tokens,
      org.apache.spark.sql.functions.array(
        vocab.map(org.apache.spark.sql.functions.lit): _*))
  }

  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    bpeEncode(SparkSession.active, tokens, merges)
  def bpeEncode(spark: SparkSession, tokens: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "bpeEncode needs at least one merge rule")
    register(spark)
    call_function("graft_bpe_encode", tokens,
      org.apache.spark.sql.functions.array(
        merges.map { case (l, r) => org.apache.spark.sql.functions.lit(s"$l $r") }: _*))
  }

  def searchSorted(value: Column, bounds: Seq[Double]): Column =
    searchSorted(SparkSession.active, value, bounds)
  def searchSorted(spark: SparkSession, value: Column, bounds: Seq[Double]): Column = {
    require(bounds.nonEmpty, "searchSorted needs at least one boundary")
    register(spark)
    call_function("graft_searchsorted", value,
      org.apache.spark.sql.functions.array(
        bounds.map(org.apache.spark.sql.functions.lit): _*))
  }

  def zorderKey(bits: Int, keys: Seq[Column]): Column =
    zorderKey(SparkSession.active, bits, keys)
  def zorderKey(spark: SparkSession, bits: Int, keys: Seq[Column]): Column = {
    register(spark)
    call_function("graft_zorder",
      org.apache.spark.sql.functions.lit(bits) +: keys: _*)
  }

  def bloomContains(key: Column, filterBytes: Array[Byte]): Column =
    bloomContains(SparkSession.active, key, filterBytes)
  def bloomContains(spark: SparkSession, key: Column, filterBytes: Array[Byte]): Column = {
    register(spark)
    call_function("graft_bloom_contains", key,
      org.apache.spark.sql.functions.lit(filterBytes))
  }

  def blockedBloomContains(spark: SparkSession, key: Column, filterBytes: Array[Byte]): Column = {
    register(spark)
    call_function("graft_blocked_bloom_contains", key,
      org.apache.spark.sql.functions.lit(filterBytes))
  }

  def simhash60(tokens: Column): Column = simhash60(SparkSession.active, tokens)
  def simhash60(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("graft_simhash60", tokens)
  }
}

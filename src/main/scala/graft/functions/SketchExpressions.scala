package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch kernels. The HOF formulations hash every shingle once
  * PER HASH FUNCTION (k × strings × interpreted lambda); these hash each
  * string ONCE (xxh64) and derive the k minhash functions by cheap
  * integer re-mixing — the standard universal-hashing construction for
  * MinHash — in a single generated pass.
  */
object SketchKernels {
  /** PPJoin in-block pair expansion — the q25 candidate generator as
    * ONE fused loop: for each ordered pair (a, b) in a prefix block of
    * (doc_id, n_sh, pos) structs, emit (id_a, id_b) iff the positional
    * bound `1 + min(n_a-pos_a-1, n_b-pos_b-1) >= (n_a+n_b)*tFrac - 1e-9`
    * holds. Bit-identical to the nested transform/filter HOF chain it
    * replaces (same int arithmetic, same double comparison), which was
    * interpreted per probe; the completeness oracle (q25 vs the
    * unblocked all-pairs join) gates any divergence.
    */
  def ppjoinExpand(ms: ArrayData, tFrac: Double): ArrayData = {
    val n = ms.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < n - 1) {
      val a = ms.getStruct(i, 3)
      val aId = a.getLong(0)
      val na = a.getInt(1)
      val ra = na - a.getInt(2) - 1
      var j = i + 1
      while (j < n) {
        val b = ms.getStruct(j, 3)
        val nb = b.getInt(1)
        val rb = nb - b.getInt(2) - 1
        if ((1 + math.min(ra, rb)).toDouble >= (na + nb) * tFrac - 1e-9) {
          out += new GenericInternalRow(Array[Any](aId, b.getLong(0)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }


  private final val Seed = 42L

  def hashString(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)

  /** k-permutation MinHash signature of a string array: sig[i] =
    * min over elements of mix(xxh64(element), i).
    */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) { // null elements are skipped, not NPE'd
        val h = hashString(arr.getUTF8String(j))
        var i = 0
        while (i < k) {
          val g = XXH64.hashLong(h, i.toLong)
          if (g < sig(i)) sig(i) = g
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig.map(java.lang.Long.valueOf(_): Any))
  }

  /** k-permutation MinHash signature from ALREADY HASHED elements —
    * bit-equal to [[minhash]] over the corresponding strings (the
    * string path hashes each element to exactly these longs first).
    */
  def minhashFromHashes(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) { // skip nulls like [[minhash]] — getLong on
        // a null slot would silently read 0L and min every lane against
        // the same constant, inflating similarity between unrelated docs
        val h = arr.getLong(j)
        var i = 0
        while (i < k) {
          val g = XXH64.hashLong(h, i.toLong)
          if (g < sig(i)) sig(i) = g
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig.map(java.lang.Long.valueOf(_): Any))
  }

  /** Distinct xxh64-hashed word n-gram shingles of a token array in ONE
    * pass, SORTED ASCENDING: each window's tokens are byte-copied
    * (space-joined) into a reusable buffer and hashed in place — no
    * shingle String or array<string> ever materializes. Values are
    * bit-equal to `xxhash64(concat_ws(' ', slice(toks, i, n)))` (same
    * seed 42, same UTF-8 bytes), so hashed-set Jaccard and MinHash
    * signatures built from these match the string formulation exactly.
    * The sorted order feeds [[sortedOverlap]]'s merge scan. Fewer than
    * n tokens (including zero) hash the whole-array join — mirroring
    * TextAnalysis.shinglesFromTokens.
    */
  def hashedShingles(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    val windows = if (cnt >= n) cnt - n + 1 else 1
    val winLen = if (cnt >= n) n else cnt
    var buf = new Array[Byte](64)
    val hs = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var len = 0
      var j = 0
      var wrote = false
      while (j < winLen) {
        // null tokens are SKIPPED entirely — concat_ws(' ', ...) drops
        // null elements WITHOUT emitting a separator, and the
        // documented bit-equality requires the same joined bytes (the
        // previous empty-string join produced "a  b" where concat_ws
        // gives "a b", silently changing the hash)
        if (!toks.isNullAt(w + j)) {
          val t = toks.getUTF8String(w + j)
          val nb = t.numBytes()
          if (len + nb + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + nb + 1))
          if (wrote) { buf(len) = ' '; len += 1 }
          t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
          len += nb
          wrote = true
        }
        j += 1
      }
      hs(w) = XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, Seed)
      w += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place (sorted)
    var m = 0
    var i = 0
    while (i < windows) {
      if (m == 0 || hs(i) != hs(m - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED distinct long arrays — a merge
    * scan: O(|a|+|b|), no hash set, no intersection array. With set
    * sizes alongside, Jaccard = c / (na + nb - c).
    *
    * Disorder is DETECTED, not silently tolerated: each advance checks
    * the array is still ascending (one compare per step, free next to
    * the scan itself) and throws — an unsorted input would otherwise
    * undercount the overlap and silently drop near-dup pairs. Elements
    * past the shorter array's exhaustion point are not walked, so this
    * is a strong guard, not a full validation; the sorted-ascending
    * precondition is part of the `*FromHashed` contract.
    */
  def sortedOverlap(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    var px = Long.MinValue
    var py = Long.MinValue
    while (i < na && j < nb) {
      // null slots would read as phantom 0Ls (getLong on a null slot)
      // and match EACH OTHER, inflating the overlap — same stance as
      // disorder: detect loudly, never silently miscount
      if (a.isNullAt(i) || b.isNullAt(j)) throw new IllegalArgumentException(
        "graft_overlap requires non-null elements (see Dedup.*FromHashed scaladoc); " +
          s"found null at a[$i]/b[$j]")
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < px || y < py) throw new IllegalArgumentException(
        "graft_overlap requires sorted-ascending arrays (see Dedup.*FromHashed scaladoc); " +
          s"found descent at positions a[$i]/b[$j]")
      px = x
      py = y
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** PORTABLE 60-bit SimHash of a token array in one pass — bit-equal
    * to the Column formulation in `Dedup.portableSimhashAcc/FromAcc`
    * (and to the DuckDB oracle that recomputes it): token hash = first
    * 15 md5 hex chars as a 60-bit int (= bytes 0..6 big-endian shifted
    * left 4, OR the high nibble of byte 7), bit i set iff the ±1 vote
    * sum over tokens is ≥ 0 (ties SET the bit — unlike [[simhash]]'s
    * strictly-positive rule).
    */
  def portableSimhash60(arr: ArrayData): Long = {
    val md = md5Local.get()
    val sums = new Array[Int](60)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) { // null elements are skipped, not NPE'd
        md.reset()
        val d = md.digest(arr.getUTF8String(j).getBytes)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) & 0xffL) >>> 4)
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (sums(i) >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** 64-bit SimHash of a string array: per-bit ±1 vote of each element's
    * hash, sign-packed.
    */
  def simhash(arr: ArrayData): Long = {
    val sums = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) { // null elements are skipped, not NPE'd
        val h = hashString(arr.getUTF8String(j))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires (array<string>, k > 0), got ${child.dataType.simpleString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.minhash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires (array<string>, n > 0), got ${child.dataType.simpleString}, n=$n")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.hashedShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.hashedShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashFromHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash64 requires (array<bigint>, k > 0), got ${child.dataType.simpleString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash64"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.minhashFromHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.minhashFromHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PortableSimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 requires array<string>, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.portableSimhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.portableSimhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SortedOverlapCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_overlap requires two array<bigint> (sorted), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "graft_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.sortedOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchKernels.sortedOverlap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class PpjoinExpand(child: Expression, tFrac: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, IntegerType, _, _),
      StructField(_, IntegerType, _, _))), _) if tFrac > 0.0 && tFrac < 1.0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_ppjoin_expand requires array<struct<bigint,int,int>> and 0 < tFrac < 1, " +
        s"got ${child.dataType.simpleString}, tFrac=$tFrac")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_ppjoin_expand"

  override protected def nullSafeEval(ms: Any): Any =
    SketchKernels.ppjoinExpand(ms.asInstanceOf[ArrayData], tFrac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Double.toString round-trips exactly, so the embedded Java literal
    // is the same double the interpreted path uses
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.ppjoinExpand($c, ${tFrac}D)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

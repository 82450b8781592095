package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Cosine similarity of two `array<double>` columns as a NATIVE Catalyst
  * expression with whole-stage codegen — one fused loop per row instead
  * of the interpreted `aggregate(zip_with(...))` higher-order chain
  * (HOFs are CodegenFallback). Numerically IDENTICAL to the HOF
  * formulation and to DuckDB's `list_dot_product`-based oracle: all
  * three accumulate dot/norms left-to-right in doubles, so results are
  * bit-equal.
  *
  * This is the extension path SURVEY.md §7.2 reserves for operators the
  * built-ins can't express EFFICIENTLY: at 100 TB the candidate-scoring
  * loop of ANN/near-dup runs billions of times — codegen removes the
  * per-element lambda interpretation entirely.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  // ragged inputs (length mismatch) return NULL, exactly like the HOF
  // formulation whose zip_with pads with null — a silently truncated
  // cosine over corrupted vectors must not look like a real score
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null ELEMENT nulls the result, exactly like the HOF's
      // zip_with/aggregate — getDouble on a null slot would silently
      // read 0.0 and a corrupted vector would score plausibly
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `tables` hyperplane-LSH bucket ids of a vector in ONE pass —
  * the native twin of [[graft.operators.Similarity.hyperplaneBucket]]
  * applied at seeds 0..tables-1. Component j of hyperplane (t, b) is
  * `sign(xxhash64(t, b, j))` with xxhash64's int-fold semantics (seed
  * 42, then each int folded left-to-right), so bucket values are
  * BIT-EQUAL to the HOF formulation (asserted in spec) — but the
  * interpreted per-component lambda chain (tables × bits × dim
  * evaluations per row) collapses into a generated loop.
  */
object VectorKernels {

  /** Count of sorted-ascending boundary elements <= v (binary search).
    * Shared by interpreted eval and generated code.
    */
  def searchSorted(v: Double, bounds: ArrayData): Int = {
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // getDouble on a null slot reads 0.0 — a silently WRONG bin;
      // every other kernel in this package fails loudly on corrupt
      // inputs, and a miscounted interval is worse than an error
      if (bounds.isNullAt(mid))
        throw new IllegalArgumentException(
          s"graft_searchsorted: boundary element $mid is null — boundaries " +
            "must be non-null sorted doubles")
      if (bounds.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }


  def hyperplaneBuckets(v: ArrayData, bits: Int, tables: Int): ArrayData = {
    val dim = v.numElements()
    // empty vectors and vectors with null elements land in bucket 0 of
    // every table — matching the HOF, whose dot is null there (empty
    // aggregate/zip_with null-pad) and whose when(...).otherwise(0L)
    // then contributes no bits. The kernel's raw loop would instead
    // compute dot = 0.0 (>= 0) and set EVERY bit.
    var corrupt = dim == 0
    var ci = 0
    while (!corrupt && ci < dim) {
      if (v.isNullAt(ci)) corrupt = true
      ci += 1
    }
    if (corrupt) {
      val zeros = new Array[Any](tables)
      java.util.Arrays.fill(zeros.asInstanceOf[Array[AnyRef]], java.lang.Long.valueOf(0L))
      return new GenericArrayData(zeros)
    }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        // xxhash64(seed_t, b, j) over three ints, seed 42 — the (t, b)
        // prefix is loop-invariant, only the j fold runs per component
        val hb = XXH64.hashInt(b, XXH64.hashInt(t, 42L))
        var dot = 0.0
        var j = 0
        while (j < dim) {
          val sign = if (XXH64.hashInt(j, hb) >= 0L) 1.0 else -1.0
          dot += v.getDouble(j) * sign
          j += 1
        }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Ids (1-based positions) of the `top` centroids nearest to `v` by
  * cosine, best-first — the map-side IVF cell assignment. Centroids
  * arrive as an `array<array<double>>` LITERAL (the coarse quantizer is
  * nlist × dim doubles, trained driver-side), so assignment is pure
  * per-row math inside whole-stage codegen: the index build touches no
  * shuffle at all, vs the crossJoin(centroids) → groupBy(id) → top-k
  * aggregation it replaces, whose exchange moved one (id, vector) row
  * per corpus row.
  *
  * Ranking matches the aggregation it replaces bit-for-bit: cosine
  * accumulates left-to-right in doubles (same as [[CosineSimilarity]]),
  * NaN scores (zero vectors) and dimension mismatches rank WORST
  * deterministically, ties break toward the smaller centroid id.
  */
object CentroidKernels {

  /** Dense matrix–vector product against a LITERAL row matrix: one
    * left-to-right dot per row, the exact float expression a DuckDB
    * oracle writes as `list_dot_product(v, row)` per row — projections
    * re-derive bit-for-bit. Returns null (not a plausible projection)
    * when the vector is corrupt (null elements) or any matrix row is
    * null / ragged / null-element — the matrix is caller-built, so a
    * bad row is a bug surfaced as a droppable null, mirroring
    * [[CosineSimilarity]]'s corrupt-input nulling.
    */
  def matVecDots(v: ArrayData, rows: ArrayData): ArrayData = {
    val dim = v.numElements()
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val k = rows.numElements()
    val out = new Array[Any](k)
    var r = 0
    while (r < k) {
      if (rows.isNullAt(r)) return null
      val row = rows.getArray(r)
      if (row.numElements() != dim) return null
      var j = 0
      while (j < dim) {
        if (row.isNullAt(j)) return null
        j += 1
      }
      var dot = 0.0
      j = 0
      while (j < dim) {
        dot += v.getDouble(j) * row.getDouble(j)
        j += 1
      }
      out(r) = dot
      r += 1
    }
    new GenericArrayData(out)
  }

  def nearestCentroids(v: ArrayData, cents: ArrayData, top: Int): ArrayData = {
    val k = cents.numElements()
    val t = math.min(top, k)
    val dim = v.numElements()
    // a vector with null elements is corrupt: rank it worst against
    // every centroid (like NaN / dimension mismatch) instead of letting
    // getDouble read the null slots as 0.0 and assign it plausibly
    var corrupt = false
    var ni = 0
    while (!corrupt && ni < dim) {
      if (v.isNullAt(ni)) corrupt = true
      ni += 1
    }
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      // a null centroid row or a centroid with null elements is as
      // corrupt as a corrupt v: rank it worst instead of NPE-ing on
      // getArray or reading null slots as plausible 0.0 coordinates
      // (operators build centroids driver-side so this is the SQL
      // surface's guard)
      val cent = if (cents.isNullAt(c)) null else cents.getArray(c)
      sims(c) =
        if (corrupt || cent == null || cent.numElements() != dim) Double.NegativeInfinity
        else {
          var centCorrupt = false
          var ci = 0
          while (!centCorrupt && ci < dim) {
            if (cent.isNullAt(ci)) centCorrupt = true
            ci += 1
          }
          if (centCorrupt) Double.NegativeInfinity
          else {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < dim) {
              val x = v.getDouble(i); val y = cent.getDouble(i)
              dot += x * y; na += x * x; nb += y * y
              i += 1
            }
            val s = dot / (math.sqrt(na) * math.sqrt(nb))
            if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
          }
        }
      c += 1
    }
    // selection by repeated argmax — nlist is small (≤ a few hundred),
    // O(k·top) with zero allocation beats heap bookkeeping here
    val used = new Array[Boolean](k)
    val out = new Array[Any](t)
    var o = 0
    while (o < t) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && (best < 0 || sims(i) > bestS)) { best = i; bestS = sims(i) }
        i += 1
      }
      used(best) = true
      out(o) = best + 1
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Squared-L2 twin of [[nearestCentroids]] — the metric FAISS PQ
    * uses for RESIDUAL codebooks (residuals are not normalized, so
    * cosine assignment is meaningless near the cell center). Distance
    * is computed as the dot-product decomposition
    * `dot(v,v) - 2*dot(v,c) + dot(c,c)` with each dot accumulating
    * left-to-right — the exact float expression a DuckDB oracle
    * writes with three `list_dot_product` calls, so assignments are
    * re-derivable bit-for-bit. Corrupt inputs (null elements, null
    * centroid rows, dimension mismatch) and NaN distances rank WORST
    * (+inf) with ties to the smaller centroid id, mirroring the
    * cosine kernel's -inf rule. Returns 1-based positions.
    */
  def nearestCentroidsL2(v: ArrayData, cents: ArrayData, top: Int): ArrayData = {
    val k = cents.numElements()
    val t = math.min(top, k)
    val dim = v.numElements()
    var corrupt = false
    var ni = 0
    while (!corrupt && ni < dim) {
      if (v.isNullAt(ni)) corrupt = true
      ni += 1
    }
    // dot(v,v) once — shared by every centroid's decomposition
    var vv = 0.0
    if (!corrupt) {
      var i = 0
      while (i < dim) { val x = v.getDouble(i); vv += x * x; i += 1 }
    }
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = if (cents.isNullAt(c)) null else cents.getArray(c)
      dists(c) =
        if (corrupt || cent == null || cent.numElements() != dim) Double.PositiveInfinity
        else {
          var centCorrupt = false
          var ci = 0
          while (!centCorrupt && ci < dim) {
            if (cent.isNullAt(ci)) centCorrupt = true
            ci += 1
          }
          if (centCorrupt) Double.PositiveInfinity
          else {
            var vc = 0.0; var cc = 0.0; var i = 0
            while (i < dim) {
              val x = v.getDouble(i); val y = cent.getDouble(i)
              vc += x * y; cc += y * y
              i += 1
            }
            val d = vv - 2.0 * vc + cc
            if (java.lang.Double.isNaN(d)) Double.PositiveInfinity else d
          }
        }
      c += 1
    }
    val used = new Array[Boolean](k)
    val out = new Array[Any](t)
    var o = 0
    while (o < t) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && (best < 0 || dists(i) < bestD)) { best = i; bestD = dists(i) }
        i += 1
      }
      used(best) = true
      out(o) = best + 1
      o += 1
    }
    new GenericArrayData(out)
  }
}

case class MatVecDots(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_matvec requires (array<double>, array<array<double>>), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_matvec"

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any, rows: Any): Any =
    CentroidKernels.matVecDots(v.asInstanceOf[ArrayData], rows.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.CentroidKernels.matVecDots"
    nullSafeCodeGen(ctx, ev, (v, r) => {
      s"""
         |${ev.value} = $f($v, $r);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class NearestCentroids(left: Expression, right: Expression, top: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) if top > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroids requires (array<double>, array<array<double>>, top > 0), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}, top=$top")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_nearest_centroids"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    CentroidKernels.nearestCentroids(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], top)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.CentroidKernels.nearestCentroids($v, $c, $top)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class NearestCentroidsL2(left: Expression, right: Expression, top: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) if top > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroids_l2 requires (array<double>, array<array<double>>, top > 0), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}, top=$top")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_nearest_centroids_l2"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    CentroidKernels.nearestCentroidsL2(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], top)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.CentroidKernels.nearestCentroidsL2($v, $c, $top)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class HyperplaneBuckets(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if bits > 0 && bits <= 63 && tables > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_buckets requires (array<double>, 0 < bits <= 63, tables > 0), " +
        s"got ${child.dataType.simpleString}, bits=$bits, tables=$tables")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBuckets(input.asInstanceOf[ArrayData], bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.hyperplaneBuckets($c, $bits, $tables)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `searchsorted`: the number of elements of a SORTED-ascending
  * `array<double>` that are <= the probe value — binary search, O(log
  * m) per row with whole-stage codegen. The generalization of
  * `width_bucket` to arbitrary boundaries, and the kernel behind
  * point-in-interval lookup joins ([[graft.operators.IntervalLookup]]):
  * a broadcast-small sorted interval table becomes an array literal and
  * every fact row finds its interval map-side — zero shuffle, zero
  * join, at any corpus scale.
  *
  * The boundaries array must be sorted ascending (the operator
  * validates; raw SQL callers own it — an unsorted array gives
  * meaningless indices, same contract as java.util.Arrays.binarySearch).
  * NaN probes return 0 (NaN compares false to everything).
  */
case class SearchSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_searchsorted requires (double, array<double>), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_searchsorted"

  override protected def nullSafeEval(v: Any, bounds: Any): Any =
    VectorKernels.searchSorted(v.asInstanceOf[Double], bounds.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, b) => s"graft.functions.VectorKernels.searchSorted($v, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

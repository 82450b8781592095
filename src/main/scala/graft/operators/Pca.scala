package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the
  * dimensionality-reduction / whitening step (dedup in PCA space,
  * energy-compact storage, decorrelated features) a vector pipeline
  * wants next to q82's trained PQ and q137's data-independent JL.
  *
  * Scale shape: the ONLY distributed work is one pass accumulating
  * `(n, Σv, upper-triangle Σ vᵢvⱼ)` in a partial-aggregable array
  * buffer (1 + d + d(d+1)/2 doubles — 2 145 for d = 64), merged
  * map-side like any algebraic aggregate; the corpus never shuffles.
  * The d×d covariance then eigendecomposes on the DRIVER (cyclic
  * Jacobi — d is the embedding width, a few hundred at most, the
  * q93/q96 bounded-driver-step precedent), and the k top eigenpairs
  * ship back as plain scalar rows.
  *
  * Verification splits two ways (the q30 soundness/recall split):
  * float sums are partition-ordered, so covariance entries are not
  * bit-portable — instead the ORACLE recomputes covariance in SQL and
  * checks the emitted pairs' CERTIFICATE (orthonormality to 1e-9,
  * eigen-residual ‖Cv − λv‖∞ ≤ 1e-6, λ descending, λ₁ ≥ max Cᵢᵢ),
  * which any wrong vector, wrong value, or mis-sorted pair fails; the
  * SPEC pins MAXIMALITY (these are the top k, not just any k) against
  * a local full eigendecomposition of the exactly-replayed covariance.
  */
object Pca {

  /** Fit PCA and emit the model as scalar rows:
    * `('eigval', k, -1, λ_k)` and `('eigvec', k, j, v_kj)` for
    * k < topK, j < dim — gate-sortable, oracle-checkable. Eigenvector
    * sign is pinned: the largest-|component| (smallest j on ties) is
    * positive. Vectors must have exactly `dim` non-null elements;
    * ragged/null-element vectors fail loudly (a silently dropped slice
    * would bias the covariance).
    */
  def fitRows(df: DataFrame, vec: Column, dim: Int, topK: Int): DataFrame = {
    val spark = df.sparkSession
    val model = fit(df, vec, dim, topK)
    import spark.implicits._
    val rows =
      model.eigvals.zipWithIndex.map { case (l, k) => ("eigval", k, -1, l) } ++
        (for (k <- 0 until topK; j <- 0 until dim)
          yield ("eigvec", k, j, model.eigvecs(k)(j)))
    rows.toSeq.toDF("part", "k", "j", "value")
  }

  final case class Model(
      n: Long,
      mean: Array[Double],
      eigvals: Array[Double],
      eigvecs: Array[Array[Double]])

  /** One distributed co-moment pass: `(n, Σv, upper-triangle Σ vᵢvⱼ)`
    * as a flat array — the MERGEABLE sufficient statistic (element-wise
    * addition combines passes over disjoint slices, the incremental /
    * streaming path q148 exercises).
    */
  def sumsOf(df: DataFrame, vec: Column, dim: Int): Array[Double] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val agg = udaf(new CoMoments(dim))
    df.select(vec.cast("array<double>").as("v"))
      .agg(agg(col("v")).as("m"))
      .selectExpr("m.sums as sums").collect()(0).getSeq[Double](0).toArray
  }

  /** The driver-side model: top-k eigenvalues (descending) and
    * unit-norm eigenvectors of the SAMPLE covariance (n−1 divisor).
    */
  def fit(df: DataFrame, vec: Column, dim: Int, topK: Int): Model =
    modelFromSums(sumsOf(df, vec, dim), dim, topK)

  /** Solve the eigenproblem from (possibly merged) co-moment sums. */
  def modelFromSums(row: Array[Double], dim: Int, topK: Int): Model = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(topK >= 1 && topK <= dim, s"topK must be in [1, $dim], got $topK")
    require(row.length == 1 + dim + dim * (dim + 1) / 2,
      s"co-moment array of length ${row.length} does not match dim $dim")
    val n = row(0).toLong
    require(n >= 2, s"PCA needs at least 2 vectors, got $n")
    val mean = Array.tabulate(dim)(i => row(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val c = (row(idx) - n * mean(i) * mean(j)) / (n - 1)
      cov(i)(j) = c
      cov(j)(i) = c
      idx += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => -vals(i)).take(topK)
    val eigvals = order.map(vals).toArray
    val eigvecs = order.map { i =>
      val v = Array.tabulate(dim)(r => vecs(r)(i))
      // pin the sign: largest |component| (smallest index on ties) > 0
      var bi = 0
      for (r <- 1 until dim) if (math.abs(v(r)) > math.abs(v(bi))) bi = r
      if (v(bi) < 0) v.map(-_) else v
    }.toArray
    Model(n, mean, eigvals, eigvecs)
  }

  /** Project vectors onto a fitted model's top components:
    * `coord_k = dot(v, e_k) − dot(µ, e_k)` — the centering constant
    * folds to one driver-computed scalar per component, so the
    * distributed work is ONE [[graft.functions.MatVecDots]] kernel
    * call per row (zero shuffle) minus a literal. Emits
    * (vec_id, comp, coord); corrupt vectors (ragged/null elements)
    * emit no rows (the kernel's nulling).
    */
  def project(df: DataFrame, vec: Column, id: Column, model: Model): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = array(model.eigvecs.map(e => array(e.map(lit(_)): _*)): _*)
    val centers = model.eigvecs.map { e =>
      var dot = 0.0
      var j = 0
      while (j < e.length) { dot += model.mean(j) * e(j); j += 1 }
      dot
    }
    val centerArr = array(centers.map(lit(_)): _*)
    df.select(
      id.cast("long").as("vec_id"),
      graft.functions.GraftFunctions.matVec(vec.cast("array<double>"), rows).as("p"))
      .filter(col("vec_id").isNotNull)
      .select(col("vec_id"), posexplode(col("p")).as(Seq("comp", "dot")))
      .select(col("vec_id"), col("comp").cast("int").as("comp"),
        (col("dot") - element_at(centerArr, col("comp") + 1)).as("coord"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Deterministic sweep
    * order; converges quadratically — 64×64 finishes in a handful of
    * sweeps.
    */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-22) {
      off = 0.0
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-14) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    require(sweep < maxSweeps || off <= 1e-18,
      s"Jacobi did not converge in $maxSweeps sweeps (off-norm $off)")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}

/** Partial-aggregable co-moment buffer: sums(0) = n, sums(1..d) = Σvᵢ,
  * then the upper triangle Σ vᵢvⱼ row-major. Ragged or null-element
  * vectors fail LOUDLY — dropping them would silently bias the
  * covariance; nulls at the row level are skipped by Spark's
  * null-safe aggregate input.
  */
private[operators] final case class CoMomentsBuf(sums: Seq[Double])

private[operators] final class CoMoments(dim: Int)
    extends Aggregator[Seq[Double], CoMomentsBuf, CoMomentsBuf] {
  private val len = 1 + dim + dim * (dim + 1) / 2

  override def zero: CoMomentsBuf = CoMomentsBuf(Vector.fill(len)(0.0))

  override def reduce(buf: CoMomentsBuf, v: Seq[Double]): CoMomentsBuf = {
    if (v == null) return buf
    require(v.length == dim,
      s"PCA: vector of length ${v.length}, expected $dim — ragged corpora bias covariance")
    val arr = v.toArray
    val out = buf.sums.toArray
    out(0) += 1.0
    var i = 0
    while (i < dim) { out(1 + i) += arr(i); i += 1 }
    var idx = 1 + dim
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) { out(idx) += arr(i) * arr(j); idx += 1; j += 1 }
      i += 1
    }
    CoMomentsBuf(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  override def merge(a: CoMomentsBuf, b: CoMomentsBuf): CoMomentsBuf = {
    val x = a.sums.toArray
    val y = b.sums
    var i = 0
    while (i < len) { x(i) += y(i); i += 1 }
    CoMomentsBuf(scala.collection.immutable.ArraySeq.unsafeWrapArray(x))
  }

  override def finish(r: CoMomentsBuf): CoMomentsBuf = r
  override def bufferEncoder: Encoder[CoMomentsBuf] = Encoders.product[CoMomentsBuf]
  override def outputEncoder: Encoder[CoMomentsBuf] = Encoders.product[CoMomentsBuf]
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT order statistics without a global sort — the distributed
  * selection problem (exact p50/p99 of a 100 TB column) solved by
  * iterative range refinement: bucket-count the candidate set, find
  * the bucket holding the k-th smallest from the (tiny) count frame,
  * recurse INTO that bucket, and finish with a bounded per-value
  * count. Every pass is one map-side-combined aggregation over the
  * (shrinking) candidate set; nothing ever sorts more than the final
  * bucket's DISTINCT values, and the driver only ever holds ≤ `bins`
  * bucket counts per level plus the final distinct-value list (loudly
  * capped). The returned value is an EXISTING element of the column
  * (selection, not interpolation), so the result is bit-exact and
  * hash-matchable — no tolerance, unlike the one-bin-width
  * [[Sketches.histogramQuantiles]] estimate.
  *
  * Refinement filters by BIN-ID PREDICATE, not by numeric range: the
  * count pass and the recursion filter evaluate the IDENTICAL bin
  * expression, so float rounding at bucket edges can never put a row
  * in one bucket for counting and another for recursion (the bin
  * function is monotone in v, so buckets stay order-contiguous and
  * selection stays exact regardless of edge rounding).
  *
  * k is `ceil(q·N)` (the lower discrete quantile). NULL/NaN are
  * excluded up front; an empty input fails loudly.
  */
object ExactQuantile {

  /** Shared prep: filtered candidate frame (localCheckpointed — the
    * refinement passes re-read it, not the source) plus (n, lo, hi).
    */
  private def prepBase(df: DataFrame, value: Column)
      : (DataFrame, Long, Double, Double) = {
    val spark = df.sparkSession
    import spark.implicits._
    val v0 = value.cast("double")
    val base = df.filter(v0.isNotNull && !isnan(v0)).select(v0.as("v"))
      .localCheckpoint()
    val stats = base.agg(count(lit(1)), min($"v"), max($"v")).collect()(0)
    val n = stats.getLong(0)
    require(n > 0, "selectQuantiles: no non-null, non-NaN values")
    (base, n, stats.getDouble(1), stats.getDouble(2))
  }

  /** k-th ORDER STATISTICS (1-based ranks) — the raw exact selection
    * behind [[selectQuantiles]], for callers whose rank comes from
    * something other than ⌈q·n⌉ (split-conformal's
    * ⌈(n_cal+1)(1−α)⌉). Same bin-id-predicate refinement, no global
    * sort; the returned values are bit-exact data values. Driver-side
    * output is bounded by `ks.size`. Also returns n so callers can
    * derive coverage denominators from the SAME null/NaN filter.
    */
  def selectKth(
      df: DataFrame,
      value: Column,
      ks: Seq[Long],
      bins: Int = 1024,
      levels: Int = 2,
      maxDistinctInBucket: Int = 1 << 16): (Long, Seq[(Long, Double)]) = {
    require(ks.nonEmpty, "selectKth: need at least one rank")
    val (base, n, lo, hi) = prepBase(df, value)
    require(ks.forall(k => k >= 1 && k <= n),
      s"ranks must be in [1, $n], got $ks")
    val sel = selectRanksOn(base, ks.distinct, lo, hi,
      bins, levels, maxDistinctInBucket)
    val out = ks.map(k => k -> sel(k))
    base.unpersist()
    (n, out)
  }

  def selectQuantiles(
      df: DataFrame,
      value: Column,
      qs: Seq[Double],
      bins: Int = 1024,
      levels: Int = 2,
      maxDistinctInBucket: Int = 1 << 16): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(levels >= 0, s"levels must be >= 0, got $levels")
    val spark = df.sparkSession
    val (base, n, statsLo, statsHi) = prepBase(df, value)
    val ks = qs.map(q => q -> math.max(1L, math.ceil(q * n).toLong))
    val sel = selectRanksOn(base, ks.map(_._2).distinct, statsLo, statsHi,
      bins, levels, maxDistinctInBucket)
    val out = ks.map { case (q, k) => (q, k, sel(k)) }
    val res = spark.createDataFrame(out).toDF("q", "k", "value")
    base.unpersist()
    res
  }

  /** EXACT INTERPOLATED quantiles (`quantile_cont` / numpy type-7
    * semantics): h = (n−1)·q, result = x_{⌊h⌋+1} + (h−⌊h⌋)·
    * (x_{⌊h⌋+2} − x_{⌊h⌋+1}) over the 1-based order statistics —
    * the continuous sibling of [[selectQuantiles]]' discrete
    * selection, computed from the SAME bin-id-predicate rank
    * refinement (two exact selections per quantile, deduplicated
    * across quantiles; still no global sort). The two order
    * statistics are bit-exact data values; only the final lerp is
    * float arithmetic, in pinned order (x_lo + frac·(x_hi − x_lo)),
    * so an oracle replaying the same formula from the same rank
    * selections hash-matches. Output: (q, value).
    */
  def selectQuantilesInterpolated(
      df: DataFrame,
      value: Column,
      qs: Seq[Double],
      bins: Int = 1024,
      levels: Int = 2,
      maxDistinctInBucket: Int = 1 << 16): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1], got $qs")
    val spark = df.sparkSession
    val (base, n, lo0, hi0) = prepBase(df, value)
    val wanted = qs.map { q =>
      val h = (n - 1).toDouble * q
      val kLo = math.floor(h).toLong + 1L
      val kHi = math.min(kLo + 1L, n)
      (q, h, kLo, kHi)
    }
    val ranks = wanted.flatMap(w => Seq(w._3, w._4)).distinct.sorted
    val sel = selectRanksOn(base, ranks, lo0, hi0, bins, levels, maxDistinctInBucket)
    val out = wanted.map { case (q, h, kLo, kHi) =>
      val xLo = sel(kLo)
      val xHi = sel(kHi)
      val frac = h - math.floor(h)
      (q, xLo + frac * (xHi - xLo))
    }
    val res = spark.createDataFrame(out).toDF("q", "value")
    base.unpersist()
    res
  }

  /** The [[selectQuantiles]] refinement loop, exposed for callers that
    * need raw rank → value selections on a prepped base frame.
    */
  private def selectRanksOn(
      base: DataFrame,
      ks: Seq[Long],
      lo0: Double,
      hi0: Double,
      bins: Int,
      levels: Int,
      maxDistinctInBucket: Int): Map[Long, Double] = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(levels >= 0, s"levels must be >= 0, got $levels")
    val spark = base.sparkSession
    import spark.implicits._

    def binExpr(lo: Double, width: Double): Column =
      least(lit(bins - 1).cast("long"),
        greatest(lit(0L), floor(($"v" - lit(lo)) / lit(width)).cast("long")))

    // the k-th smallest among rows satisfying `pred`, whose values lie
    // (nominally) in [lo, hi]; `rem` refinement levels left
    @scala.annotation.tailrec
    def kth(pred: Column, lo: Double, hi: Double, k: Long, rem: Int): Double = {
      // NOT (hi - lo) / bins: a column spanning most of the double
      // range makes hi - lo overflow to Infinity, and the recursive
      // bound lo + 0 * Infinity is then NaN — dividing each endpoint
      // first keeps every intermediate finite (|hi/bins| ≤ maxDouble/2)
      val width = hi / bins - lo / bins
      if (rem == 0 || width == 0.0) {
        val vals = base.filter(pred)
          .groupBy($"v").agg(count(lit(1)).as("c"))
          .orderBy($"v")
          .limit(maxDistinctInBucket + 1)
          .collect()
        require(vals.length <= maxDistinctInBucket,
          s"selectRanksOn: >$maxDistinctInBucket distinct values in the final " +
            s"bucket — raise bins, levels, or maxDistinctInBucket")
        var acc = 0L
        var res = Double.NaN
        var found = false
        for (r <- vals if !found) {
          acc += r.getLong(1)
          if (acc >= k) { res = r.getDouble(0); found = true }
        }
        if (!found) throw new IllegalStateException(
          s"selectRanksOn: rank $k not reached (acc=$acc)")
        res
      } else {
        val b = binExpr(lo, width)
        val counts = base.filter(pred)
          .select(b.as("b")).groupBy($"b").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
        var acc = 0L
        var tgt = -1L
        var before = 0L
        for ((bid, c) <- counts if tgt < 0) {
          if (acc + c >= k) { tgt = bid; before = acc } else acc += c
        }
        if (tgt < 0) throw new IllegalStateException(
          s"selectRanksOn: rank $k not reached (acc=$acc)")
        kth(pred && b === tgt, lo + tgt * width,
          if (tgt == bins - 1) hi else lo + (tgt + 1) * width,
          k - before, rem - 1)
      }
    }

    ks.map(k => k -> kth(lit(true), lo0, hi0, k, levels)).toMap
  }

  /** EQUAL-FREQUENCY (quantile) binning — the feature-engineering
    * staple: cut a column at its exact i/nBins quantiles (the
    * [[selectQuantiles]] cutpoints — real data values, bit-exact) and
    * report each bin's population and value range. A row's bin is the
    * COUNT OF CUTPOINTS STRICTLY BELOW its value, so ties on a
    * cutpoint land in the lower bin deterministically; the binning
    * pass is one map-side expression over ≤ nBins−1 literal
    * cutpoints plus one aggregation. Heavy duplicate mass makes the
    * bins legitimately unequal (the k-th VALUE is the cut — exact
    * selection semantics, not approximate equal-mass) — that skew is
    * the honest answer, not an error.
    */
  def equalFrequencyBins(
      df: DataFrame,
      value: Column,
      nBins: Int,
      bins: Int = 1024): DataFrame = {
    require(nBins >= 2 && nBins <= 64, s"nBins must be in [2, 64], got $nBins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val cuts = selectQuantiles(df, value, qs, bins)
      .collect().map(_.getDouble(2)).toSeq // ≤ 63 values — bounded
    val v = value.cast("double")
    val bin = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(v > c, 1).otherwise(0)
    }
    df.filter(v.isNotNull && !isnan(v))
      .select(bin.as("bin"), v.as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }
}

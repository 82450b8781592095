package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketches. [[heavyHitters]] is the
  * Misra-Gries summary with the Agarwal et al. mergeable-summaries
  * merge (sum counts, then subtract the (k+1)-th largest and drop
  * non-positives), so partial buffers combine map-side like any
  * algebraic aggregate and the shuffle carries ≤ k counters per
  * partition — the 100 TB "top tokens" plan when the exact groupBy of
  * [[graft.queries.LlmOps]] q56 would shuffle the full vocabulary.
  *
  * Guarantee (any merge order): for every token,
  * `true − N/(k+1) ≤ est ≤ true` with N = total input count, and every
  * token with `true > N/(k+1)` is present in the final buffer. The
  * oracle gates exactly these bounds; estimates themselves may vary
  * run-to-run with partitioning (all orders satisfy the bounds).
  */
object Sketches {

  /** Mergeable equi-width HISTOGRAM states — the quantile member of
    * the sketch family (HLL counts distincts, CMS counts frequencies,
    * KMV does set algebra; the histogram answers "what is p90"). The
    * state is plain (group…, bin, n) ROWS: bin assignment is map-side
    * arithmetic, the count partial-aggregates, and MERGING states —
    * across time grains, ingest increments, or cluster shards — is
    * nothing but summing n by (group, bin), an algebraic aggregate at
    * any scale. `bins` bounds both state size and quantile error
    * (≤ one bin width).
    *
    * Values below `lo` clamp into bin 0 and at/above `hi` into the
    * last bin (documented saturation — quantiles near the clamp
    * report the clamped edge). Bin ids replay exactly in SQL:
    * `min(bins-1, floor((v − lo) / width))` in IEEE doubles.
    */
  def histogramBins(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1, s"histogramBins needs bins >= 1, got $bins")
    require(lo < hi, s"histogramBins needs lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val v = value.cast("double")
    val bin = least(lit(bins - 1).cast("long"),
      greatest(lit(0L), floor((v - lit(lo)) / lit(width)).cast("long")))
    // NULL and NaN carry no bin: greatest() skips nulls (NULL would
    // silently land in bin 0) and NaN casts to 0 — both would corrupt
    // bin-0 counts and every quantile derived from them, so they are
    // excluded here rather than relying on callers to pre-filter.
    df.filter(v.isNotNull && !isnan(v))
      .select(groupCols.map(col) :+ bin.as("bin"): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates from histogram states: for each requested
    * q ∈ (0, 1], the LOWER EDGE of the first bin whose cumulative
    * count reaches `ceil(q · N)` — deterministic, exactly replayable,
    * within one bin width of the true quantile. The cumulative window
    * runs over ≤ `bins` rows per group (never raw data). Output:
    * groupCols…, n_total, one `p<percent>` double column per q.
    */
  def histogramQuantiles(
      states: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double],
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val width = (hi - lo) / bins
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(groupCols.map(col): _*)
    val cum = states
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("ntot", sum(col("n")).over(wTot))
    val aggs = qs.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("ntot")),
        lit(lo) + col("bin").cast("double") * lit(width)))
        .as(s"p${math.round(q * 100)}")
    }
    cum.groupBy(groupCols.map(col) :+ col("ntot"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("ntot", "n_total")
  }

  /** Misra-Gries heavy hitters over a string column: at most `k`
    * (token, est_count) rows, est sorted descending (ties by token).
    * One pass, O(k) state per partial buffer, no full-vocabulary
    * shuffle.
    */
  def heavyHitters(df: DataFrame, token: Column, k: Int): DataFrame = {
    require(k >= 1, s"heavyHitters needs k >= 1, got $k")
    val mg = udaf(new MisraGries(k))
    df.select(token.cast("string").as("__tok"))
      .filter(col("__tok").isNotNull)
      .agg(mg(col("__tok")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("token"), col("e._2").as("est_count"))
      .orderBy(col("est_count").desc, col("token").asc)
  }
}

private[operators] final case class MGBuf(counts: Map[String, Long])

/** Mergeable Misra-Gries summary (k counters). `reduce` is the classic
  * stream update; `merge` sums matching counters and then subtracts the
  * (k+1)-th largest combined count from every counter, dropping
  * non-positives — the reduction that keeps the merged summary inside
  * k counters while preserving the N/(k+1) error bound (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS'12;
  * public-domain algorithm, no reference-repo counterpart).
  */
private[operators] final class MisraGries(k: Int)
    extends Aggregator[String, MGBuf, Seq[(String, Long)]] {
  require(k >= 1)

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(b: MGBuf, tok: String): MGBuf = {
    val m = b.counts
    m.get(tok) match {
      case Some(c) => MGBuf(m.updated(tok, c + 1))
      case None if m.size < k => MGBuf(m.updated(tok, 1L))
      case None =>
        // decrement-all: every counter drops 1 (the unseen token's
        // implicit counter cancels against them); zeros evict
        MGBuf(m.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None })
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    if (a.counts.isEmpty) return b
    if (b.counts.isEmpty) return a
    val combined = b.counts.foldLeft(a.counts) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) MGBuf(combined)
    else {
      // subtract the (k+1)-th largest count; ≤ k strictly-positive
      // counters remain
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      MGBuf(combined.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None })
    }
  }

  override def finish(r: MGBuf): Seq[(String, Long)] =
    r.counts.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-model evaluation beyond [[Profiling.reliabilityBins]]'
  * calibration view: the cumulative GAINS / LIFT table — "if I act on
  * the top 1/b of the ranking, what fraction of the positives do I
  * capture, and how much better than random is that?" — the
  * campaign-targeting / review-prioritization staple.
  *
  * NO GLOBAL SORT: bucket boundaries are the exact
  * `ceil(i·n/buckets)`-th smallest scores from
  * [[ExactQuantile.selectQuantiles]] (distributed selection), then
  * every row buckets map-side against the ≤ buckets−1 broadcast cut
  * values — a single-partition `ntile` window over 100 TB is exactly
  * the plan this avoids. `buckets` must be a power of two ≤ 256 so
  * every quantile fraction i/buckets is a dyadic rational, exact in
  * double — `ceil(q·n)` then agrees bit-for-bit with integer
  * arithmetic (the dyadic-weights discipline, q103/q119 precedent).
  *
  * Tie semantics: rows scoring EQUAL to a cut fall in the lower-score
  * bucket (`cut < s` strictly opens the next bucket); duplicate cut
  * values skip buckets on both the engine and oracle side
  * identically. Bucket 1 is the TOP of the ranking. `cum_lift` and
  * `cum_capture` are single double divisions of exact integer
  * products — bit-portable. A label column with zero positives is a
  * caller error and fails loudly.
  */
object ModelEval {

  def gainsTable(
      df: DataFrame,
      score: Column,
      label: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 256 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two in [2, 256], got $buckets " +
        "(i/buckets must be exact in double)")
    val base = df.select(score.cast("double").as("s"), label.cast("long").as("y"))
      .filter(col("s").isNotNull && !isnan(col("s")) && col("y").isNotNull)
    // ≤ buckets-1 doubles on the driver — bounded by construction
    val cuts = ExactQuantile.selectQuantiles(
      base, col("s"), (1 until buckets).map(_.toDouble / buckets))
      .select("value").collect().map(_.getDouble(0)).sorted
    val ascBucket = cuts.map(c => when(col("s") > lit(c), 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    val agg = base
      .withColumn("bucket", lit(buckets) + 1 - ascBucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    // windows over the ≤ buckets-row AGGREGATE — bounded, not a
    // global window over the data
    val wc = Window.orderBy(col("bucket"))
    val wAll = wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg.select(
      col("bucket"), col("n"), col("pos"),
      sum(col("n")).over(wc).as("cum_n"),
      sum(col("pos")).over(wc).as("cum_pos"),
      sum(col("n")).over(wAll).as("total_n"),
      sum(col("pos")).over(wAll).as("total_pos"))
      .select(
        col("bucket"), col("n"), col("pos"), col("cum_n"), col("cum_pos"),
        when(col("total_pos") === 0L, raise_error(lit(
          "gainsTable: label column has zero positives")))
          .otherwise((col("cum_pos") * col("total_n")).cast("double") /
            (col("cum_n") * col("total_pos")))
          .as("cum_lift"),
        (col("cum_pos").cast("double") / col("total_pos")).as("cum_capture"))
  }
}

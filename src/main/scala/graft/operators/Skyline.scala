package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-d Pareto frontier (skyline, Borzsony et al. ICDE 2001): the rows
  * not dominated in (maximize `x`, minimize `y`) — for data curation,
  * "the cheapest document at every achievable quality level" (no other
  * doc is both better-or-equal on x and cheaper on y, with one strict).
  * Duplicate (x, y) points all survive (distinct-value domination).
  *
  * Scale shape — the q48/q73 two-phase bucket geometry, because the
  * naive formulations both die at scale (a NOT EXISTS theta self-join
  * is O(n²); a running-min window over the global x order funnels the
  * corpus through ONE reducer):
  *   1. rows bucket by integer-ranged x (map-side arithmetic);
  *   2. per-bucket min(y) aggregates partially; the ≤ `buckets` bucket
  *      summaries compute a strictly-higher-bucket suffix-min on the
  *      driver (bounded collect, q61 precedent) — any row with
  *      y ≥ that suffix-min is dominated by a higher-bucket row
  *      (equal-width buckets make cross-bucket x strictly greater)
  *      and drops MAP-SIDE before any window;
  *   3. the exact windows run per (bucket, distinct x): a
  *      rows-frame suffix-min over each bucket's distinct-x summaries
  *      (bucket-bounded, never the corpus) decides strictly-greater-x
  *      domination inside the bucket, and `y = min y at my x` decides
  *      equal-x domination.
  * A row survives iff y < every strictly-greater-x min (cross-bucket
  * AND in-bucket) and y equals its own x's min.
  *
  * Both columns must be non-null integral (exact arithmetic end to
  * end — the DuckDB oracle replays domination with a brute-force
  * NOT EXISTS and hash-matches). Null x/y rows fail loudly: silently
  * dropping them would hide upstream corruption, and null ordering in
  * a frontier is undefined.
  */
object Skyline {

  /** @param df      input rows
    * @param id      non-null integral row id (carried through)
    * @param x       maximize dimension (non-null integral)
    * @param y       minimize dimension (non-null integral)
    * @param buckets phase-1 x-range buckets (≥ 1; ~√(distinct x) is a
    *                good default — bounds both the driver collect and
    *                the per-bucket window)
    * @return (id, x, y) — the surviving frontier rows
    */
  def paretoFrontier2d(
      df: DataFrame,
      id: Column,
      x: Column,
      y: Column,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def guarded(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"paretoFrontier2d: $name is null or not castable to long"))).otherwise(c.cast("long"))
    val base = df.select(
      guarded(id, "id").as("id"), guarded(x, "x").as("x"), guarded(y, "y").as("y"))

    val spark = df.sparkSession
    val bounds = base.agg(min("x"), max("x")).collect()(0)
    if (bounds.isNullAt(0)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], base.schema)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // integer bucket id in [0, buckets): floor((x-lo)*buckets/span).
    // Multiply in decimal (38 digits) — long·int can overflow for
    // extreme x spans; the result is < buckets so the cast back is safe.
    val span = hi - lo + 1
    val bucketCol =
      ((col("x") - lit(lo)).cast("decimal(20,0)") * lit(buckets) / lit(span))
        .cast("long").as("b")
    val rows = base.select(col("id"), col("x"), col("y"), bucketCol)

    // phase 1+2: per-bucket min(y) → strictly-higher-bucket suffix min,
    // computed over ≤ `buckets` rows on the driver and shipped back as
    // a when-ladder literal (buckets is small by contract)
    val perBucket = rows.groupBy("b").agg(min("y").as("by")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val suffix = scala.collection.mutable.LongMap.empty[Long] // b -> min y over b' > b
    var run = Long.MaxValue
    perBucket.reverse.foreach { case (b, by) =>
      suffix(b) = run
      run = math.min(run, by)
    }
    val suffixCol = perBucket.map(_._1).foldLeft(lit(Long.MaxValue)) { (acc, b) =>
      when(col("b") === b, lit(suffix(b))).otherwise(acc)
    }

    // map-side cross-bucket prune (most of the corpus exits here), then
    // the bounded in-bucket windows on the survivors
    val pruned = rows.filter(col("y") < suffixCol)
      .withColumn("cross_min", suffixCol)

    val perX = pruned.groupBy("b", "x").agg(min("y").as("xy"))
    val wSuffix = Window.partitionBy("b").orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = perX.select(
      col("b"), col("x"), col("xy"),
      coalesce(min(col("xy")).over(wSuffix), lit(Long.MaxValue)).as("in_min"))

    pruned
      .join(inBucket, Seq("b", "x"))
      .filter(col("y") === col("xy") && col("y") < col("in_min"))
      .select(col("id"), col("x"), col("y"))
  }
}

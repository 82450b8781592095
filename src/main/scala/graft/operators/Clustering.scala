package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the full-
  * corpus refinement the sample-trained quantizers of [[Similarity]]
  * deliberately avoid, exposed as its own operator because a
  * training-data pipeline clusters corpora (SemDeDup-style semantic
  * dedup, topic bucketing, coreset seeding) where the SAMPLE is not
  * the product — the assignment of every corpus vector is.
  *
  * Scale shape per iteration: centroids ship as a plan literal
  * (k·dim doubles), assignment is the map-side codegen kernel
  * [[graft.functions.CentroidKernels.nearestCentroidsL2]] — ZERO
  * shuffle — and the update is ONE map-side-combined aggregation of
  * (cid, dim) partial sums; only k·dim rows cross the wire to the
  * driver to build the next literal. Nothing driver-side grows with
  * the corpus.
  *
  * Determinism: seeds are the k vectors with the smallest (portable
  * 60-bit md5 hash of id, id) — content-addressed, RNG-free, engine-
  * replayable ([[Sampling]] convention). Assignment uses the same
  * left-to-right dot-product decomposition DuckDB's
  * `list_dot_product` computes, ties to the smaller centroid id, so
  * an oracle re-derives every assignment from the emitted centroids
  * bit-for-bit; the only non-portable arithmetic is the partition-
  * ordered mean (verified to tolerance — the certificate pattern).
  */
object Clustering {

  /** Lloyd refinement: returns the full iteration trace as scalar
    * rows — (iter, cid, dim_idx, value) centroid coordinates for
    * iter 0 (the seeds) through `iters`, plus (iter, cid, -1, n)
    * assignment-count rows for each refined iteration. Clusters that
    * capture no vectors keep their previous centroid (the standard
    * empty-cluster rule, and the one an oracle can replay).
    *
    * Vectors must have exactly `dim` non-null elements; ragged or
    * null-element vectors drop (both sides of an oracle can state
    * that filter — contrast the routing rule of
    * [[Similarity.ivfPqTopK]] where retention is the documented
    * choice).
    */
  def lloyd(
      df: DataFrame,
      vec: Column,
      id: Column,
      k: Int,
      iters: Int,
      dim: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val base = df
      .select(id.cast("long").as("vid"), vec.cast("array<double>").as("v"))
      .filter(col("vid").isNotNull && size(col("v")) === dim &&
        forall(col("v"), x => x.isNotNull && !isnan(x)))
      .localCheckpoint(true)

    val seeds = base
      .orderBy(KmvSketch.hash60(col("vid")), col("vid"))
      .limit(k)
      .collect()
      .map(r => r.getSeq[Double](1).toArray)
    require(seeds.length == k,
      s"lloyd: corpus has only ${seeds.length} usable vectors for k=$k")

    var cents: Seq[Array[Double]] = seeds.toSeq
    val trace = Seq.newBuilder[(Int, Int, Int, Double)]
    for ((c, ci) <- cents.zipWithIndex; d <- 0 until dim)
      trace += ((0, ci + 1, d, c(d)))

    for (it <- 1 to iters) {
      val centLit = typedLit(cents.map(_.toSeq))
      val assigned = base.withColumn("cid",
        element_at(
          graft.functions.GraftFunctions.nearestCentroidsL2(spark, col("v"), centLit, 1), 1))
      // (cid, dim) partial sums — one map-side-combined shuffle of at
      // most k·dim groups, then a bounded k·dim-row collect
      val stats = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
        .toMap
      val counts = (1 to k).map(c => c -> stats.get((c, 0)).map(_._2).getOrElse(0L)).toMap
      cents = cents.zipWithIndex.map { case (prev, ci) =>
        val c = ci + 1
        if (counts(c) == 0L) prev
        else Array.tabulate(dim)(d => stats((c, d))._1 / counts(c).toDouble)
      }
      for ((cv, ci) <- cents.zipWithIndex; d <- 0 until dim)
        trace += ((it, ci + 1, d, cv(d)))
      for (c <- 1 to k)
        trace += ((it, c, -1, counts(c).toDouble))
    }
    import spark.implicits._
    trace.result().toDF("iter", "cid", "dim_idx", "value")
  }
}

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

  /** SIMPLIFIED SILHOUETTE (Hruschka, de Castro & Campello 2004) —
    * the internal clustering-quality index, per point: with a(i) the
    * euclidean distance to the point's OWN centroid and b(i) the
    * distance to the nearest OTHER centroid,
    *
    *   s(i) = (b − a) / max(a, b) ∈ [−1, 1],
    *
    * positive when the point sits clearly inside its cluster,
    * negative when another centroid is closer than its own — the
    * audit that says whether a clustering (SemDeDup cells, topic
    * buckets, IVF lists) actually separates the corpus. The
    * "simplified" form replaces full-silhouette's O(n²) pairwise
    * means with centroid distances — the only form that scales.
    *
    * Determinism: centroids are the k content-addressed seed vectors
    * (smallest (md5-60bit(id), id) — [[lloyd]]'s convention) shipped
    * as plan literals; every distance is the dot-product
    * decomposition vv − 2·dot + cc with left-to-right folds (the
    * [[graft.functions.VectorKernels]] ≡ `list_dot_product`
    * contract), clamped at 0 before the IEEE-exact sqrt, assignment
    * ties to the smallest centroid id, and s(i) is a pinned
    * (subtract, max, divide) chain — the whole row set replays
    * bit-for-bit in SQL. Points equidistant-at-zero (duplicate seed
    * vectors) emit s = 0 by convention. Output: one row per
    * well-formed vector — (vec_id, cluster, d_own, d_other,
    * silhouette).
    */
  def simplifiedSilhouette(
      df: DataFrame,
      vec: Column,
      id: Column,
      k: Int,
      dim: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (b(i) needs another centroid), got $k")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val base = df
      .select(id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"))
      .filter(col("vec_id").isNotNull && size(col("v")) === dim &&
        forall(col("v"), x => x.isNotNull && !isnan(x)))
    // bounded: exactly k rows (the content-addressed seed set)
    val seeds = base.orderBy(KmvSketch.hash60(col("vec_id")), col("vec_id"))
      .limit(k).collect().map(r => r.getSeq[Double](1).toArray)
    require(seeds.length == k,
      s"simplifiedSilhouette: corpus has only ${seeds.length} usable vectors for k=$k")
    val rows = array(seeds.map(c => array(c.map(lit(_)): _*)): _*)
    val ccs = array(seeds.map(c => lit(c.map(x => x * x).sum)): _*)
    val withD = base
      .withColumn("vv",
        aggregate(zip_with(col("v"), col("v"), (a, b) => a * b), lit(0.0),
          (acc, x) => acc + x))
      // clamp at 0: cancellation can round a true-zero distance to a
      // tiny negative, and the oracle's sqrt throws on it
      .withColumn("d2s", zip_with(
        graft.functions.GraftFunctions.matVec(col("v"), rows), ccs,
        (dot, cc) => greatest(col("vv") - lit(2.0) * dot + cc, lit(0.0))))
      .withColumn("cid", array_position(col("d2s"), array_min(col("d2s"))).cast("int"))
      .withColumn("a2", array_min(col("d2s")))
      .withColumn("b2", array_min(zip_with(
        col("d2s"), sequence(lit(1), lit(k)),
        (d, i) => when(i === col("cid"), lit(Double.PositiveInfinity)).otherwise(d))))
    val aD = sqrt(col("a2"))
    val bD = sqrt(col("b2"))
    withD.select(col("vec_id"), col("cid").as("cluster"),
      aD.as("d_own"), bD.as("d_other"),
      when(greatest(aD, bD) > 0.0, (bD - aD) / greatest(aD, bD))
        .otherwise(lit(0.0)).as("silhouette"))
  }

  /** GRID-DENSITY CLUSTERING — the STING/DBSCAN-lite family: points
    * land in fixed-width 2-D grid cells, cells holding ≥ `minPts`
    * points are DENSE, and clusters are the connected components of
    * the dense cells under 8-neighbourhood adjacency (sparse cells
    * are noise). The classic shape for density structure at corpus
    * scale: unlike point-pairwise DBSCAN (an O(n²) ε-join), every
    * stage here is bounded by the GRID, not the corpus — one
    * partial-aggregable pass collapses n points to ≤ cells counts,
    * the adjacency self-join and the component loop
    * ([[Graph.connectedComponentsFrontier]]'s frontier discipline)
    * run on dense cells only.
    *
    * Cell widths are CALLER-FIXED literals (never data-derived spans
    * — no overflow geometry, and both engines replay the same
    * `floor(v/w)` doubles). Cluster ids are the minimum encoded cell
    * id of the component — deterministic, engine-portable. Cell
    * coordinates must fit |floor(v/w)| < 2²⁰ (raises otherwise; a
    * grid finer than a million cells per axis is a parameter bug,
    * not data).
    *
    * Output: one row per DENSE cell — (cx, cy, n_points, cluster).
    */
  def gridDensityClusters(
      df: DataFrame,
      x: Column,
      y: Column,
      cellW: Double,
      cellH: Double,
      minPts: Long,
      maxIter: Int = 64): DataFrame = {
    require(cellW > 0 && cellH > 0, s"cell sizes must be > 0, got $cellW x $cellH")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    def cellOf(c: Column, w: Double, what: String): Column = {
      val v = c.cast("double")
      val g = when(v.isNull || isnan(v) || v === Double.PositiveInfinity ||
        v === Double.NegativeInfinity, raise_error(lit(
        s"gridDensityClusters: $what must be non-null and finite"))).otherwise(v)
      val cell = floor(g / lit(w)).cast("long")
      when(abs(cell) >= (1L << 20), raise_error(lit(
        s"gridDensityClusters: $what cell index out of range — widen cells"))
        .cast("long")).otherwise(cell)
    }
    val cells = df
      .select(cellOf(x, cellW, "x").as("cx"), cellOf(y, cellH, "y").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n_points"))
    val off = 1L << 20
    val spanC = 1L << 21
    val dense = cells.filter(col("n_points") >= minPts)
      .withColumn("id", (col("cx") + off) * spanC + (col("cy") + off))
      .localCheckpoint(true) // self-joined 8 ways + labeled below
    // 8-neighbourhood adjacency: explode the offsets on one side and
    // equi-join on the shifted coordinates — never a theta-join
    val offsets = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    val offDf = {
      import df.sparkSession.implicits._
      offsets.toDF("dx", "dy")
    }
    val edges = dense.select(col("cx"), col("cy"), col("id").as("ida"))
      .crossJoin(broadcast(offDf))
      .select((col("cx") + col("dx")).as("ncx"), (col("cy") + col("dy")).as("ncy"),
        col("ida"))
      .join(dense.select(col("cx").as("ncx"), col("cy").as("ncy"),
        col("id").as("idb")), Seq("ncx", "ncy"))
      .select(col("ida").as("ea"), col("idb").as("eb"))
    val labeled =
      if (edges.isEmpty) dense.select(col("id"), col("id").as("component"))
      else Graph.connectedComponentsFrontier(edges, col("ea"), col("eb"), maxIter)
        .select(col("node").as("id"), col("component"))
    // isolated dense cells (no dense neighbour) are singleton clusters
    dense.join(labeled, Seq("id"), "left")
      .select(col("cx"), col("cy"), col("n_points"),
        coalesce(col("component"), col("id")).as("cluster"))
  }
}

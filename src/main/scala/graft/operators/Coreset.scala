package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-CENTER coreset selection (Gonzalez 1985; the diversity
  * selector of active learning and data-pruning pipelines, e.g.
  * Sener & Savarese 2018): pick the min-id seed, then repeatedly the
  * point FARTHEST (squared L2) from everything chosen so far — a
  * 2-approximation to the optimal k-center cover, and the standard
  * "maximally diverse k examples" primitive.
  *
  * Scale shape: k − 1 bounded passes over the corpus (the algorithm
  * is inherently sequential in k — each pass is one map-side distance
  * evaluation + one bounded `TakeOrdered`-style max; nothing
  * shuffles). Chosen centers ride into each pass as LITERALS:
  * `dist²(v, c) = dot(v,v) − 2·dot(v,c) + dot(c,c)` with the cross
  * terms through the [[graft.functions.MatVecDots]] kernel, the
  * self-term computed once and carried, and `dot(c,c)` driver-side —
  * the exact dot-product decomposition (the `NearestCentroidsL2`
  * convention) a SQL oracle replays bit-for-bit, so even the
  * distances are exactly portable. Min-over-chosen is order-free;
  * the argmax tie-breaks to the smallest id. Null / empty / null-element
  * vectors are EXCLUDED up front; vectors whose DIMENSION differs
  * from the seed's get a NULL distance from the matvec kernel and
  * are excluded at selection time (`d2.isNotNull`), so they can
  * never be chosen and never break the documented early stop.
  *
  * Returns (rank, vec_id, dist2): rank 1 is the seed (dist2 null),
  * rank r > 1 was chosen with `dist2` = its distance to the first
  * r − 1 centers at selection time (non-increasing in r — the
  * classic coverage-radius curve).
  */
object Coreset {

  def kCenterGreedy(df: DataFrame, vec: Column, id: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val base0 = df.select(
      id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"))
      .filter(col("vec_id").isNotNull && size(col("v")) > 0 &&
        !exists(col("v"), x => x.isNull))
    // self-term once; the loop's passes reuse this materialization
    // instead of re-reading the source k times
    val base = base0.withColumn("vv",
      aggregate(zip_with(col("v"), col("v"), (a, b) => a * b), lit(0.0),
        (acc, x) => acc + x))
      .localCheckpoint()

    def vecOf(vid: Long): Array[Double] =
      // bounded: exactly one row — vec_id is the key
      base.filter(col("vec_id") === vid).select("v").collect()(0)
        .getSeq[Double](0).toArray

    val seedRow = base.agg(min("vec_id")).collect()(0)
    require(!seedRow.isNullAt(0), "kCenterGreedy: no well-formed vectors")
    val seed = seedRow.getLong(0)

    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Option[Double])]((seed, None))
    var centers = Vector(vecOf(seed))
    var r = 1
    while (r < k) {
      val rows = array(centers.map(c => array(c.map(lit(_)): _*)): _*)
      val ccs = array(centers.map(c => lit(c.map(x => x * x).sum)): _*)
      // min over chosen of vv − 2·dot + cc; order-free, exact
      val dmin = array_min(zip_with(
        graft.functions.GraftFunctions.matVec(col("v"), rows), ccs,
        (dot, cc) => col("vv") - lit(2.0) * dot + cc))
      val next = base
        .filter(!col("vec_id").isInCollection(chosen.map(_._1)))
        .select(col("vec_id"), dmin.as("d2"))
        // dimension-mismatched vectors null out of the matvec kernel;
        // dropping them here (not just sorting them last) keeps the
        // documented early stop when k exceeds the well-formed count
        .filter(col("d2").isNotNull)
        .orderBy(col("d2").desc, col("vec_id"))
        .limit(1).collect()
      if (next.isEmpty) r = k // fewer distinct points than k — stop
      else {
        val row = next(0)
        chosen += ((row.getLong(0), Some(row.getDouble(1))))
        centers = centers :+ vecOf(row.getLong(0))
        r += 1
      }
    }
    import spark.implicits._
    chosen.toSeq.zipWithIndex
      .map { case ((vid, d2), i) => (i + 1, vid, d2) }
      .toDF("rank", "vec_id", "dist2")
  }
}

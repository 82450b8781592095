package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive training pairs —
  * every anchor document needs `k` pseudo-random negatives, but at
  * pipeline scale the sampling must be REPLAYABLE (re-runs, oracle
  * checks, incremental rebuilds must produce the same pairs) and
  * JOIN-SHAPED (no per-row random access into the corpus).
  *
  * Construction: hash-partition the corpus into `buckets` cells; for
  * draw j, anchor a targets cell `hash60(a # j) mod buckets` and takes
  * that cell's canonical representative — the doc with the smallest
  * (hash60(id), id) in the cell — falling back to the cell's SECOND
  * smallest when the representative is the anchor itself. Cells are
  * uniform under the md5-based [[KmvSketch.hash60]], so negatives are
  * uniform-ish over the corpus, deterministic, and exactly replayable
  * in SQL. A draw landing in an empty... (impossible — every cell id
  * comes from a hash of an existing doc? No: cell ids range over all
  * `buckets` values, and a cell CAN be empty) — a draw into an empty
  * cell, or into a singleton cell holding only the anchor, yields a
  * NULL negative and is DROPPED rather than silently resampled
  * (resampling loops are not join-shaped). Drops are observable, not
  * hidden: an anchor with fewer than `k` output rows had that many
  * draws land empty — `groupBy(doc_id).count()` on the result is the
  * per-anchor audit (no count column is emitted; the output stays
  * one row per surviving (anchor, draw) pair).
  *
  * Scale: the representative table is ≤ 2·`buckets` rows (two tiny
  * aggregation passes over (cell, hash)), broadcast to the exploded
  * (anchor, draw) frame — one narrow shuffle-free join; the corpus is
  * scanned twice (reps + anchors), never self-joined.
  */
object Contrastive {

  def negativeSample(
      df: DataFrame,
      id: Column,
      k: Int,
      buckets: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val base = df.select(
      when(id.cast("long").isNull, raise_error(lit(
        "negativeSample: id must be non-null and long-castable")))
        .otherwise(id.cast("long")).as("doc_id"))
      .withColumn("h", KmvSketch.hash60(col("doc_id")))
      .withColumn("cell", pmod(col("h"), lit(buckets.toLong)))
    // rep1 = min (h, id) per cell; rep2 = min over the rest
    val rep1 = base.groupBy(col("cell"))
      .agg(min(struct(col("h").as("h"), col("doc_id").as("id"))).as("r1"))
      .select(col("cell"), col("r1.id").as("rep1"))
    val rep2 = base.join(rep1, Seq("cell"))
      .filter(col("doc_id") =!= col("rep1"))
      .groupBy(col("cell"))
      .agg(min(struct(col("h").as("h"), col("doc_id").as("id"))).as("r2"))
      .select(col("cell"), col("r2.id").as("rep2"))
    val reps = rep1.join(rep2, Seq("cell"), "left")
    val draws = base.select(col("doc_id"))
      .select(col("doc_id"), explode(array((1 to k).map(lit): _*)).as("draw"))
      .withColumn("tcell",
        pmod(KmvSketch.hash60(concat_ws("#", col("doc_id"), col("draw"))),
          lit(buckets.toLong)))
    draws
      .join(broadcast(reps), col("tcell") === col("cell"), "left")
      .select(col("doc_id"), col("draw"),
        when(col("rep1") =!= col("doc_id"), col("rep1"))
          .otherwise(col("rep2")).as("neg_id"))
      .filter(col("neg_id").isNotNull)
  }
}

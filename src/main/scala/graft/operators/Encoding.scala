package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-free categorical feature encoding for model training.
  *
  * Target encoding replaces a high-cardinality category with the
  * target rate observed for that category — but computing the rate on
  * the row's own fold leaks the label into the feature. The standard
  * fix is OUT-OF-FOLD encoding: hash-assign every entity to one of
  * `folds` folds, and encode each (category, fold) cell with the rate
  * computed from the OTHER folds only.
  *
  * Everything is exact: folds come from the portable
  * [[KmvSketch.hash60]] (md5-based, replayable in any engine), the
  * out-of-fold numerator/denominator are integer subtractions of two
  * aggregation passes over the SAME counts, and the encoding is one
  * correctly-rounded integer division — the output hash-matches with
  * no tolerance. A (category, fold) cell whose out-of-fold count is
  * zero carries a NULL encoding (nothing to encode from — explicit,
  * not a silent 0 that would masquerade as "never converts").
  *
  * Scale: ONE (category, fold) count aggregation (map-side combined);
  * category totals are a rollup of those cells (never a second scan);
  * the per-category frame joins back broadcast. No windows, no
  * per-entity state.
  */
object Encoding {

  def targetEncodeOof(
      df: DataFrame,
      category: Column,
      entity: Column,
      target: Column,
      folds: Int): DataFrame = {
    require(folds >= 2, s"out-of-fold needs folds >= 2, got $folds")
    val cell = df
      .filter(category.isNotNull && entity.isNotNull)
      .select(
        category.as("category"),
        pmod(KmvSketch.hash60(entity), lit(folds.toLong)).as("fold"),
        when(target.isNull, raise_error(lit(
          "targetEncodeOof: null target — coalesce it to a definite label first")))
          .otherwise(target).cast("boolean").as("__t"))
      .groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n_fold"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("pos_fold"))
    val totals = cell.groupBy(col("category"))
      .agg(sum(col("n_fold")).as("n_total"), sum(col("pos_fold")).as("pos_total"))
    cell.join(broadcast(totals), Seq("category"))
      .select(
        col("category"), col("fold"), col("n_fold"), col("pos_fold"),
        (col("n_total") - col("n_fold")).as("n_oof"),
        (col("pos_total") - col("pos_fold")).as("pos_oof"),
        when(col("n_total") - col("n_fold") > 0,
          (col("pos_total") - col("pos_fold")).cast("double") /
            (col("n_total") - col("n_fold")).cast("double")).as("encoding"))
  }

  /** DELTA-VARINT POSTING-LIST SIZE ESTIMATE — the storage-planning
    * question of every inverted index / content-addressed store:
    * "what does this posting table cost under the standard
    * gap + LEB128-varint encoding, vs raw 8-byte ids?" Per (term,
    * sorted doc-id list): first id absolute, successors as gaps, each
    * value a ⌈bits/7⌉-byte varint. All pure integer arithmetic — the
    * byte widths are CASE thresholds at powers of 128 — so the
    * estimate hash-matches exactly.
    *
    * Scale: gaps are one lag window PARTITIONED BY TERM (each task
    * owns one term's postings), widths fold map-side into per-term
    * sums, corpus totals are a second bounded aggregate. Output: one
    * row (n_terms, n_postings, raw_bytes, varint_bytes, ratio).
    * Ids must be non-null, non-negative and < 2⁴⁹ (7 varint bytes —
    * raises beyond, rather than silently under-counting).
    */
  def postingVarintEstimate(
      df: DataFrame,
      term: Column,
      docId: Column): DataFrame = {
    val idG = when(docId.cast("long").isNull || docId.cast("long") < 0L ||
      docId.cast("long") >= (1L << 49), raise_error(lit(
      "postingVarintEstimate: doc id must be in [0, 2^49)")))
      .otherwise(docId.cast("long"))
    val post = df.select(term.as("t"), idG.as("id"))
      .filter(col("t").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("t")).orderBy(col("id").asc)
    def varintBytes(v: Column): Column =
      when(v < (1L << 7), 1L).when(v < (1L << 14), 2L)
        .when(v < (1L << 21), 3L).when(v < (1L << 28), 4L)
        .when(v < (1L << 35), 5L).when(v < (1L << 42), 6L)
        .otherwise(7L)
    val gaps = post
      .withColumn("prev", lag(col("id"), 1).over(w))
      // first posting stores the absolute id; successors the gap
      .withColumn("enc", coalesce(col("id") - col("prev"), col("id")))
      .select(col("t"), varintBytes(col("enc")).as("vb"))
    gaps.agg(
      count_distinct(col("t")).as("n_terms"),
      count(lit(1)).as("n_postings"),
      (count(lit(1)) * 8).as("raw_bytes"),
      sum(col("vb")).as("varint_bytes"))
      .select(col("n_terms"), col("n_postings"), col("raw_bytes"),
        col("varint_bytes"),
        (col("varint_bytes").cast("double") / col("raw_bytes").cast("double"))
          .as("ratio"))
  }
}

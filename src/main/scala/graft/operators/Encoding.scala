package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}

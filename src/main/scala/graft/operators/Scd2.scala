package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING-DIMENSION TYPE 2 build — turn an append-only
  * change log (one row per observation of an entity's attributes)
  * into the warehouse dimension shape: one row per VERSION of the
  * entity with `[valid_from, valid_to)` validity, a dense version
  * number, and an `is_current` flag. The reference's demo rebuilds
  * its silver tables from scratch per document; a deployed payer
  * pipeline ingests monthly MRF revisions, and "what was this rate's
  * network on June 3rd" is exactly the SCD2 point-in-time question
  * (pair with [[TemporalJoins.asofJoin]] for the lookup side).
  *
  * Semantics (deterministic): per key, observations order by
  * `(ts, tiebreak)`; consecutive observations with IDENTICAL tracked
  * attributes collapse into one version (null-safe struct equality —
  * a change TO null or FROM null is a change); each surviving change
  * opens a version at its `ts`, closed by the next change's `ts`
  * (half-open, so versions tile the timeline with no gaps or
  * overlaps); the last version has `valid_to` null and
  * `is_current` true.
  *
  * Scale: ONE hash partition by key and ONE sort per partition —
  * both window passes (change detection, then numbering/closing over
  * the survivors) share the same `(key) × (ts, tiebreak)` ordering,
  * so Catalyst plans a single exchange+sort. Nothing is driver-side;
  * version counts per key are bounded by that key's change count,
  * never by history length.
  */
object Scd2 {

  def fromChangeLog(
      df: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      attrs: Seq[(String, Column)]): DataFrame = {
    require(attrs.nonEmpty, "Scd2: no tracked attributes")
    val base = df.select(
      Seq(key.as("k"), ts.as("valid_from"), tiebreak.as("tb"),
        struct(attrs.map { case (n, c) => c.as(n) }: _*).as("attrs")): _*)
    val w = Window.partitionBy(col("k")).orderBy(col("valid_from"), col("tb"))
    val changes = base
      .withColumn("prev", lag(col("attrs"), 1).over(w))
      // null-safe: the first observation (prev IS NULL) always opens
      .filter(col("prev").isNull || !(col("attrs") <=> col("prev")))
    val wv = Window.partitionBy(col("k")).orderBy(col("valid_from"), col("tb"))
    changes.select(
      Seq(
        col("k"),
        col("valid_from"),
        lead(col("valid_from"), 1).over(wv).as("valid_to"),
        row_number().over(wv).as("version"),
        lead(col("valid_from"), 1).over(wv).isNull.as("is_current")) ++
        attrs.map { case (n, _) => col("attrs").getField(n).as(n) }: _*)
  }
}

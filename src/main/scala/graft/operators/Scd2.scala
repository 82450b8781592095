package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING-DIMENSION TYPE 2 build — turn an append-only
  * OBSERVATION log (one row per sighting of an entity's attributes,
  * no-op repeats included) into the warehouse dimension shape: one
  * row per VERSION of the entity with `[valid_from, valid_to)`
  * validity, a dense version number, and an `is_current` flag.
  *
  * Relation to [[Cdc.scd2History]] (the change-feed consumer): that
  * op trusts its input to already BE the change feed — explicit
  * per-key version numbers, tombstone deletes, loud failure on
  * duplicates. This one starts one step earlier, from raw repeated
  * observations (the ingest shape when upstream has no CDC), derives
  * the change set itself via null-safe run collapse, and adds what a
  * maintained dimension needs next: [[applyDelta]] incremental merge
  * and the q208 streaming-maintenance loop. The reference's demo rebuilds
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

  /** INCREMENTAL SCD2 maintenance — merge a batch of NEW observations
    * into an existing [[fromChangeLog]] dimension without touching
    * untouched keys: the production economics (a 100 TB dimension
    * never rebuilds from raw history; only keys present in the delta
    * re-version, everything else passes through an anti-join).
    *
    * Equivalence contract (spec-proven: applyDelta ≡ full rebuild):
    * the delta must be STRICTLY NEWER per key — every delta
    * observation's `ts` must postdate ALL of the key's prior
    * observations (time-partitioned ingestion gives this for free).
    * The raise_error payload guard enforces the checkable part
    * (newer than the newest surviving `valid_from`); an observation
    * that was COLLAPSED into the current version after that point is
    * unrecoverable from the dimension alone, so a delta slipping into
    * that tail window is the caller's contract violation the guard
    * cannot catch — an out-of-order backfill needs the full-rebuild
    * path, not a silent wrong merge. Touched keys' surviving versions are
    * reconstructed as a change log (`valid_from` as ts, `version` as
    * the tiebreak — the surviving versions' relative order, which by
    * the contract never has to interleave with delta tiebreaks at
    * equal ts) and re-versioned together with the delta through the
    * SAME [[fromChangeLog]] program, so collapse-into-the-current-
    * version and reopening `valid_to` fall out for free.
    */
  def applyDelta(
      dim: DataFrame,
      delta: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      attrs: Seq[(String, Column)]): DataFrame = {
    require(attrs.nonEmpty, "Scd2.applyDelta: no tracked attributes")
    val names = attrs.map(_._1)
    val deltaObs = delta.select(
      Seq(key.as("k"), ts.as("t"), tiebreak.cast("long").as("tb")) ++
        attrs.map { case (n, c) => c.as(n) }: _*)
    val touched = deltaObs.select(col("k")).distinct()
    val untouched = dim.join(touched, Seq("k"), "left_anti")
    val dimTouched = dim.join(touched, Seq("k"))
    val oldObs = dimTouched.select(
      Seq(col("k"), col("valid_from").as("t"),
        col("version").cast("long").as("tb")) ++
        names.map(col): _*)
    val oldMax = dimTouched.groupBy(col("k"))
      .agg(max(col("valid_from")).as("__old_max"))
    // strictly-newer guard rides the ts payload, never a key (q108)
    val checkedDelta = deltaObs.join(oldMax, Seq("k"), "left")
      .select(
        Seq(col("k"),
          when(col("__old_max").isNotNull && col("t") <= col("__old_max"),
            raise_error(lit("Scd2.applyDelta: delta observation at or before " +
              "an existing version's valid_from — out-of-order backfill " +
              "needs a full rebuild")))
            .otherwise(col("t")).as("t"),
          col("tb")) ++ names.map(col): _*)
    val rebuilt = fromChangeLog(
      oldObs.unionByName(checkedDelta),
      col("k"), col("t"), col("tb"),
      names.map(n => n -> col(n)))
    untouched.unionByName(rebuilt)
  }
}

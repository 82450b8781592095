package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: Delta-style MERGE INTO (upsert +
  * tombstone delete) and SCD2 history construction, re-expressed as
  * plain Catalyst plans over parquet — the lakehouse write-path
  * semantics without a table format. Together with [[Compaction]] and
  * the z-order key these are the maintenance loop a 100 TB curated
  * corpus actually runs: merge the day's changes, rewrite small files,
  * keep history queryable.
  */
object Cdc {

  /** MERGE INTO semantics: apply one change batch to a snapshot.
    * Change rows with `deleteFlag` true remove the matching snapshot
    * row; others replace it (update) or append (insert). Exactly
    * Delta's `whenMatched update/delete + whenNotMatched insert`.
    *
    * A change batch with TWO rows for one key is an ambiguous merge —
    * it fails loudly (the same contract as Delta MERGE's
    * multiple-matches error), as do null change keys, which cannot
    * address any row. `snapOut`/`changeOut` must emit the SAME column
    * names — the merged table has one schema.
    *
    * Scale: the snapshot moves through ONE left-anti join on the key;
    * the change side is the small one by nature (a day's changes vs
    * the corpus) so AQE broadcasts it and the snapshot never
    * shuffles. The duplicate-key guard windows only the CHANGE batch.
    */
  def upsertMerge(
      snapshot: DataFrame,
      changes: DataFrame,
      snapKey: Column,
      changeKey: Column,
      deleteFlag: Column,
      snapOut: Seq[(String, Column)],
      changeOut: Seq[(String, Column)]): DataFrame = {
    require(snapOut.nonEmpty && snapOut.map(_._1) == changeOut.map(_._1),
      s"snapOut and changeOut must emit the same column names, got " +
        s"${snapOut.map(_._1).mkString(",")} vs ${changeOut.map(_._1).mkString(",")}")
    val guardedKey = when(changeKey.cast("long").isNull, raise_error(lit(
      "upsertMerge: change key must be non-null and long-castable — a null key " +
        "cannot address a snapshot row"))).otherwise(changeKey.cast("long"))
    val ch = changes.select(
      guardedKey.as("__k"), deleteFlag.cast("boolean").as("__del"),
      struct(changeOut.map { case (n, c) => c.as(n) }: _*).as("__p"))
    val wk = Window.partitionBy(col("__k"))
    val chGuarded = ch
      .withColumn("__n", count(lit(1)).over(wk))
      .withColumn("__p", when(col("__n") > 1, raise_error(concat(
        lit("upsertMerge: ambiguous merge — change batch has multiple rows for key "),
        col("__k").cast("string")))).otherwise(col("__p")))
    val sn = snapshot.select(
      snapKey.cast("long").as("__k2"),
      struct(snapOut.map { case (n, c) => c.as(n) }: _*).as("__p2"))
    val kept = sn.join(chGuarded.select(col("__k")), col("__k2") === col("__k"), "left_anti")
      .select(col("__p2").as("__p"))
    val applied = chGuarded.filter(!coalesce(col("__del"), lit(false))).select(col("__p"))
    kept.unionByName(applied).select(snapOut.map { case (n, _) =>
      col("__p").getField(n).as(n) }: _*)
  }

  /** SCD2 history from a change log: one validity interval per
    * non-delete change, `[version, next change's version)` per key —
    * open-ended (`valid_to` null, `is_current` true) for the last
    * change unless a delete closes it. Delete rows emit no interval;
    * they only terminate the predecessor's.
    *
    * Two changes at one (key, version) are an unordered history —
    * loud failure, same spirit as [[upsertMerge]]'s ambiguity rule.
    *
    * Scale: one shuffle of the change log on key, a single lead()
    * window per key — change logs per key are bounded by change rate,
    * not corpus size, so the per-key reducer geometry holds (contrast
    * with `tokenBudgetCap`'s few-strata case).
    */
  /** SNAPSHOT DIFF — derive the change feed between two materialized
    * snapshots (Delta CDF's "what changed", computed after the fact
    * from the states themselves): every key classifies as `insert`
    * (only in the new snapshot), `delete` (only in the old), `update`
    * (both, payload differs) or `unchanged` (both, payload
    * null-safe-equal). The inverse of [[upsertMerge]]: merge applies
    * changes to a state; diff recovers the changes from two states.
    *
    * Output: (key, change_type, old_<col>…, new_<col>…) — old columns
    * null for inserts, new columns null for deletes. Payload equality
    * is null-safe per column (`<=>` over the struct), so a null→value
    * transition is an update, not an accident.
    *
    * Scale: ONE full-outer equi-join on the key — both sides shuffle
    * once on the same key (co-partitioned), comparison is map-side,
    * no driver state. Duplicate keys within either snapshot are an
    * ill-defined diff and fail loudly (same contract as
    * [[upsertMerge]]'s ambiguity rule) — the guard is a grouped
    * aggregation on the SAME key the join shuffles on (partitioning
    * reused, no extra exchange), not a window (which would add a
    * per-partition sort the diff doesn't need).
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      oldKey: Column,
      newKey: Column,
      payload: Seq[String],
      includeUnchanged: Boolean = true): DataFrame = {
    require(payload.nonEmpty, "snapshotDiff needs at least one payload column")
    // the grouping key stays the BARE cast (a no-op Catalyst elides
    // when the key is already long) so the state agg's hash
    // partitioning propagates through the guard into the join — both
    // null-key and duplicate-key raises ride on the payload column
    // instead, which every downstream row evaluates
    def guard(df: DataFrame, k: Column, side: String) = {
      df.select(k.cast("long").as("__k"), struct(payload.map(col): _*).as("__p"))
        .groupBy(col("__k"))
        .agg(count(lit(1)).as("__n"), collect_list(col("__p")).as("__ps"))
        .select(col("__k"),
          when(col("__k").isNull, raise_error(lit(
            s"snapshotDiff: $side snapshot key is null or not long-castable")))
            .when(col("__n") > 1, raise_error(concat(
              lit(s"snapshotDiff: $side snapshot has multiple rows for key "),
              col("__k").cast("string"))))
            .otherwise(element_at(col("__ps"), 1)).as("__p"))
    }
    val a = guard(oldSnap, oldKey, "old").withColumnRenamed("__k", "__ka")
      .withColumnRenamed("__p", "__pa")
    val b = guard(newSnap, newKey, "new").withColumnRenamed("__k", "__kb")
      .withColumnRenamed("__p", "__pb")
    val joined = a.join(b, col("__ka") === col("__kb"), "full_outer")
    val changeType = when(col("__ka").isNull, lit("insert"))
      .when(col("__kb").isNull, lit("delete"))
      .when(col("__pa") <=> col("__pb"), lit("unchanged"))
      .otherwise(lit("update"))
    val out = joined.select(
      coalesce(col("__ka"), col("__kb")).as("key") +:
        changeType.as("change_type") +:
        (payload.map(c => col("__pa").getField(c).as(s"old_$c")) ++
          payload.map(c => col("__pb").getField(c).as(s"new_$c"))): _*)
    if (includeUnchanged) out else out.filter(col("change_type") =!= "unchanged")
  }

  def scd2History(
      log: DataFrame,
      key: Column,
      version: Column,
      deleteFlag: Column,
      payload: Seq[(String, Column)]): DataFrame = {
    require(payload.nonEmpty, "scd2History needs at least one payload column")
    val reserved = Set("key", "valid_from", "valid_to", "is_current")
    require(payload.map(_._1).forall(!reserved(_)),
      s"payload names may not collide with ${reserved.mkString(",")}")
    val guardedKey = when(key.cast("long").isNull, raise_error(lit(
      "scd2History: key must be non-null and long-castable"))).otherwise(key.cast("long"))
    val base = log.select(
      guardedKey.as("key"), version.as("__v"), deleteFlag.cast("boolean").as("__del"),
      struct(payload.map { case (n, c) => c.as(n) }: _*).as("__p"))
    val wk = Window.partitionBy(col("key")).orderBy(col("__v").asc)
    val wDup = Window.partitionBy(col("key"), col("__v"))
    base
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("__v", when(col("__dup") > 1, raise_error(concat(
        lit("scd2History: multiple changes at one (key, version) — key "),
        col("key").cast("string")))).otherwise(col("__v")))
      .withColumn("valid_to", lead(col("__v"), 1).over(wk))
      .filter(!coalesce(col("__del"), lit(false)))
      .select(
        col("key") +: payload.map { case (n, _) => col("__p").getField(n).as(n) } :+
          col("__v").as("valid_from") :+ col("valid_to") :+
          col("valid_to").isNull.as("is_current"): _*)
  }

  /** GOLDEN-RECORD survivorship — the field-level merge step MDM runs
    * after entity resolution (q115 finds the duplicates; this builds
    * the master row): per key, each field independently takes its
    * value from the NEWEST observation where that field is NON-NULL
    * ("newest non-null per column" — a null in a later observation
    * never erases an earlier value).
    *
    * One partial-aggregable struct-max per field (the q54 keep-best
    * shape): `max(when(f notNull, struct(version, tieBreak, f)))`
    * combines map-side, so a key observed a billion times still ships
    * one struct per (field, partition-group) — no per-key window, no
    * observation sort. `(version, tieBreak)` must be unique per row
    * for determinism (an id column does). Output: key, n_obs, one
    * column per field (null iff the field was null in EVERY
    * observation).
    */
  def goldenRecord(
      df: DataFrame,
      key: Column,
      version: Column,
      tieBreak: Column,
      fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord needs at least one field")
    val names = fields.map(_._1)
    require(names.distinct.size == names.size,
      s"goldenRecord field names must be distinct, got ${names.mkString(", ")}")
    require(!names.contains("key") && !names.contains("n_obs"),
      "field names 'key' and 'n_obs' collide with the output contract")
    val guardedKey = when(key.isNull, raise_error(lit(
      "goldenRecord: key is null — resolve entities first"))).otherwise(key)
    val aggs = count(lit(1)).as("n_obs") +: fields.map { case (n, c) =>
      max(when(c.isNotNull,
        struct(version.as("__v"), tieBreak.as("__t"), c.as("__x"))))
        .getField("__x").as(n)
    }
    df.groupBy(guardedKey.as("key")).agg(aggs.head, aggs.tail: _*)
  }
}

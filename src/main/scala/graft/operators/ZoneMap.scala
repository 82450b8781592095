package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZONE-MAP (min/max data-skipping) EFFECTIVENESS AUDIT — the
  * file-layout diagnostic behind every "why is this scan reading the
  * whole table" question at 100 TB. A zone map stores each file's
  * (min, max, rows) for a column; a range predicate [lo, hi] can SKIP
  * any file whose zone is disjoint from it. How much a layout lets a
  * predicate skip is a pure function of the layout — hash-placed
  * files have near-full-range zones on every column (skip ≈ 0), while
  * clustering/Z-ordering on the probe column shrinks zones until most
  * files fall outside any selective range. This operator measures
  * that, so a layout decision ([[Compaction]]'s bin packing, the
  * `graft_zorder` clustering key) is justified by a number instead of
  * folklore.
  *
  * Both passes are single partial-aggregable aggregations (per-file
  * min/max/count, then the one-row summary) — no windows, no
  * shuffles beyond the file-id aggregation, safe at any scale.
  */
object ZoneMap {

  /** Per-file zone-map build: (file_id, zmin, zmax, rows) for the
    * probe column. `fileId` is whatever placement rule the layout
    * under audit uses (a real `input_file_name`, a hash bucket, a
    * range bucket). Null probe values raise — a null would silently
    * fall out of min/max while staying in the file, making "skippable"
    * a lie.
    */
  def fileStats(df: DataFrame, fileId: Column, probe: Column): DataFrame = {
    val pG = when(probe.isNull, raise_error(lit(
      "ZoneMap.fileStats: probe column must be non-null — a null row would " +
        "be skipped with its file despite matching nothing")))
      .otherwise(probe)
    df.select(fileId.as("file_id"), pG.as("p"))
      .groupBy(col("file_id"))
      .agg(min(col("p")).as("zmin"), max(col("p")).as("zmax"),
        count(lit(1)).as("rows"))
  }

  /** One-row skipping summary of a zone-map frame against the range
    * predicate [lo, hi] (inclusive): total files/rows, skippable
    * files/rows (zone disjoint from the range), and the scanned-row
    * count a zone-map-aware reader would actually touch.
    */
  def skippingSummary(stats: DataFrame, lo: Column, hi: Column): DataFrame = {
    val skip = col("zmax") < lo || col("zmin") > hi
    stats.agg(
      count(lit(1)).as("n_files"),
      sum(col("rows")).as("n_rows"),
      sum(when(skip, 1L).otherwise(0L)).as("files_skipped"),
      sum(when(skip, col("rows")).otherwise(0L)).as("rows_skipped"),
      sum(when(!skip, col("rows")).otherwise(0L)).as("rows_scanned"))
  }

  /** Two-column zone maps — (file_id, z1min, z1max, z2min, z2max,
    * rows) — for CONJUNCTIVE predicate audits (the case Z-ordering
    * exists for: a file skips when EITHER column's zone misses its
    * range).
    */
  def fileStats2(df: DataFrame, fileId: Column, p1: Column, p2: Column): DataFrame = {
    def g(c: Column, nm: String) = when(c.isNull, raise_error(lit(
      s"ZoneMap.fileStats2: $nm must be non-null"))).otherwise(c)
    df.select(fileId.as("file_id"), g(p1, "probe 1").as("p1"), g(p2, "probe 2").as("p2"))
      .groupBy(col("file_id"))
      .agg(min(col("p1")).as("z1min"), max(col("p1")).as("z1max"),
        min(col("p2")).as("z2min"), max(col("p2")).as("z2max"),
        count(lit(1)).as("rows"))
  }

  /** Skipping summary against `[lo1, hi1] AND [lo2, hi2]`. */
  def skippingSummary2(
      stats: DataFrame,
      lo1: Column, hi1: Column,
      lo2: Column, hi2: Column): DataFrame = {
    val skip = col("z1max") < lo1 || col("z1min") > hi1 ||
      col("z2max") < lo2 || col("z2min") > hi2
    stats.agg(
      count(lit(1)).as("n_files"),
      sum(col("rows")).as("n_rows"),
      sum(when(skip, 1L).otherwise(0L)).as("files_skipped"),
      sum(when(skip, col("rows")).otherwise(0L)).as("rows_skipped"),
      sum(when(!skip, col("rows")).otherwise(0L)).as("rows_scanned"))
  }
}

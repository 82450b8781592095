package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance planning operators: the small-files compaction
  * planner that pairs with the q81 z-order clustering key (z-order
  * decides HOW rewritten data is laid out, the compaction plan decides
  * WHICH files are rewritten together). The reference has no
  * maintenance story at all; at 100 TB a streaming ingest's thousands
  * of small files per partition are the top operational cost of keeping
  * scans fast, so the planner is a first-class operator here.
  */
object Compaction {

  /** Deterministic bin-packing compaction plan: within every table
    * partition, files are packed greedily in (size desc, file id asc)
    * order into bins of ~`targetBytes` — bin id = exclusive running
    * sum of sizes divided (integer floor) by `targetBytes`. Every file
    * lands in exactly one bin; bins fill to at least `targetBytes`
    * before a new one opens (the last bin per partition may be
    * smaller); a file ≥ `targetBytes` gets a bin of its own plus the
    * spillover shift — the classic sorted-next-fit rewrite grouping a
    * lakehouse OPTIMIZE runs.
    *
    * Everything is exact integer arithmetic on a deterministic order,
    * so the plan is reproducible run-over-run and engine-over-engine —
    * a compaction plan that changes under retry would rewrite
    * different files than it just committed.
    *
    * Scale: one shuffle on the partition column; the per-partition
    * running sum is a single-reducer-per-partition window, which is
    * the right geometry HERE because table partitions are numerous by
    * construction (that is why the table is partitioned) and the unit
    * of work is a file listing — rows per partition are bounded by
    * file count, not data bytes. This is the documented contrast with
    * `tokenBudgetCap`'s few-strata case, which needed the two-phase
    * plan.
    *
    * Null/negative sizes and null file ids fail LOUDLY: a silently
    * skipped file would be silently excluded from compaction forever.
    */
  def compactionPlan(
      files: DataFrame,
      partition: Column,
      fileId: Column,
      sizeBytes: Column,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    val guardedId = when(fileId.cast("long").isNull, raise_error(lit(
      "compactionPlan: file id must be non-null and long-castable"))).otherwise(fileId.cast("long"))
    val guardedSize = when(sizeBytes.cast("long").isNull.or(sizeBytes.cast("long") < 0L),
      raise_error(concat(lit("compactionPlan: size must be a non-negative long, got "),
        coalesce(sizeBytes.cast("string"), lit("null")))))
      .otherwise(sizeBytes.cast("long"))
    val base = files.select(
      partition.as("partition"), guardedId.as("file_id"), guardedSize.as("size_bytes"))
    val w = Window.partitionBy(col("partition"))
      .orderBy(col("size_bytes").desc, col("file_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive running sum = inclusive - current; `div` keeps the
    // division in exact long arithmetic at any cumulative size (Column
    // `/` is double — lossy past 2^53), and truncation == floor because
    // both operands are non-negative
    val cumBefore = sum(col("size_bytes")).over(w) - col("size_bytes")
    base.withColumn("__cum", cumBefore)
      .withColumn("bin", expr(s"__cum div ${targetBytes}L"))
      .drop("__cum")
  }
}

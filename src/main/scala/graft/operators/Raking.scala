package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ITERATIVE PROPORTIONAL FITTING / raking (Deming & Stephan 1940 —
  * the survey-calibration workhorse, and the standard way to reweight
  * a training-data SAMPLE so its joint (row, column) margins match a
  * target population's): start every cell at its sample count and
  * alternate proportional scaling,
  *
  *   w ← w · R_r / Σ_c w   (row step),   w ← w · C_c / Σ_r w   (col step),
  *
  * for a fixed number of rounds. IPF converges to the maximum-entropy
  * table with the target margins (Csiszár 1975); fixed rounds keep the
  * operator deterministic and replayable.
  *
  * Scale shape: the corpus collapses to the CELL table in one
  * partial-aggregable pass (cells = |rows|×|cols| categories, guarded
  * by `maxCells` — margins are category-sized, never corpus-sized);
  * each round is two tiny aggregation+join steps over that frame,
  * eagerly checkpointed so the plan stays flat. Target margins with
  * zero or missing mass for an OBSERVED cell raise loudly — silently
  * zeroing a stratum is a bias bug, not a default. Weights are
  * doubles (products of margin ratios); oracles gate them at 1e-9 and
  * the counts exactly (the q89 fixed-iteration contract).
  *
  * Output per observed cell: (row_key, col_key, n_sample, weight).
  */
object Raking {

  /** @param targetRows (row_key, target) — one row per row category
    * @param targetCols (col_key, target) — one row per col category
    */
  def rakeWeights(
      sample: DataFrame,
      rowKey: Column,
      colKey: Column,
      targetRows: DataFrame,
      targetCols: DataFrame,
      rounds: Int = 4,
      maxCells: Long = 1000000L): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16], got $rounds")
    def keyG(c: Column, side: String): Column =
      when(c.cast("string").isNull, raise_error(lit(
        s"rakeWeights: $side key is null or not castable to string")))
        .otherwise(c.cast("string"))
    val cells0 = sample
      .select(keyG(rowKey, "row").as("row_key"), keyG(colKey, "col").as("col_key"))
      .groupBy(col("row_key"), col("col_key"))
      .agg(count(lit(1)).as("n_sample"))
      .select(col("row_key"), col("col_key"), col("n_sample"),
        col("n_sample").cast("double").as("w"))
      .localCheckpoint(true)
    val nCells = cells0.count()
    require(nCells > 0, "rakeWeights: the sample has no rows")
    require(nCells <= maxCells,
      s"rakeWeights: $nCells cells exceed maxCells=$maxCells — coarsen the keys")
    def tG(t: DataFrame, k: String): DataFrame =
      t.select(col(t.columns.head).cast("string").as(k),
        when(col(t.columns(1)).cast("double").isNull ||
          col(t.columns(1)).cast("double") <= 0.0, raise_error(lit(
          s"rakeWeights: target margin for a $k category is null or <= 0 — " +
            "drop the category from the sample or fix the target")))
          .otherwise(col(t.columns(1)).cast("double")).as("t"))
    val tr = tG(targetRows, "row_key").localCheckpoint(true)
    val tc = tG(targetCols, "col_key").localCheckpoint(true)
    def step(cells: DataFrame, key: String, target: DataFrame): DataFrame = {
      val m = cells.groupBy(col(key)).agg(sum(col("w")).as("m"))
      // inner join would silently DROP cells whose category has no
      // target row — detect and raise instead (left join + guard)
      val f = m.join(target, Seq(key), "left")
        .select(col(key),
          when(col("t").isNull, raise_error(concat(
            lit(s"rakeWeights: no target margin for $key '"), col(key),
            lit("' present in the sample"))))
            .otherwise(col("t") / col("m")).as("f"))
      cells.join(broadcast(f), Seq(key))
        .select(col("row_key"), col("col_key"), col("n_sample"),
          (col("w") * col("f")).as("w"))
    }
    var cells = cells0
    for (_ <- 1 to rounds) {
      cells = step(step(cells, "row_key", tr), "col_key", tc)
        .localCheckpoint(true)
    }
    cells.select(col("row_key"), col("col_key"), col("n_sample"),
      col("w").as("weight"))
  }
}

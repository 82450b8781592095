package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's runtime skew-join split handles
  * most cases (enabled in this engine's sessions); these are the
  * explicit tools for the plans AQE can't rewrite — a hot GROUP BY key
  * or a broadcast-ineligible join with a known-skewed build side.
  * Salting only redistributes work: results are identical to the
  * unsalted plan (asserted in SkewSpec).
  */
object Skew {

  /** Salt from DETERMINISTIC row data, not rand(): rand's output
    * depends on row order within a partition, so a fetch-failure
    * recompute or speculative rerun could re-salt rows differently than
    * the outputs already fetched — double-counting some rows and
    * dropping others (the SPARK-23207 class of bugs). A content hash
    * reruns identically.
    *
    * CAVEAT (and the reason `saltFrom` exists): hashing row content
    * means BYTE-IDENTICAL rows all land on one salt — the canonical
    * skew workload of a hot key repeated with identical payloads (log
    * dedup counts) gets no spreading at all. When the data has any
    * unique-ish column (an event id, an offset, a line number), pass it
    * as `saltFrom` — it is deterministic AND spreads identical
    * payloads. The all-columns content hash is only the fallback for
    * data with no such column.
    */
  private def saltCol(df: DataFrame, salts: Int, saltFrom: Option[Column]): Column =
    pmod(
      xxhash64(saltFrom.map(Seq(_)).getOrElse(df.columns.toSeq.map(col)): _*),
      lit(salts.toLong)).cast("int")

  /** Two-phase aggregation for skewed grouping keys: partial aggregate
    * over (keys, salt) — spreading each hot key over `salts` reducers —
    * then final combine over keys. Supply MERGEABLE partial aggregates
    * (sum/count/min/max; avg must be decomposed by the caller).
    *
    * `saltFrom`: optional deterministic salt source (e.g. a unique id
    * column). STRONGLY recommended when one exists — without it,
    * byte-identical duplicate rows share a salt and a hot key made of
    * identical rows is not spread (see [[saltCol]]).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      salts: Int = 16,
      saltFrom: Option[Column] = None): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val partial = df
      .withColumn("__salt", saltCol(df, salts, saltFrom))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows are scattered
    * over `salts` buckets, the (small, but not broadcastable) right side
    * is replicated across every bucket, and the join runs on
    * (key, bucket) — each hot key now occupies `salts` reducers instead
    * of one. Row-identical to `left.join(right, keys, joinType)` for
    * inner/left joins.
    *
    * `saltFrom`: optional deterministic salt source on the LEFT side
    * (e.g. a unique id column) — pass one when it exists, or
    * byte-identical duplicate left rows all hash to one salt and a hot
    * key of identical rows is not spread (see [[saltCol]]).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      joinType: String = "inner",
      saltFrom: Option[Column] = None): DataFrame = {
    // salts = 0 would be SILENT corruption, not an error: pmod(h, 0) is
    // NULL on the left while sequence(0, -1) = [0, -1] on the right, so
    // an inner join returns empty and a left join null-extends all rows
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // right/full joins would emit `salts` null-extended copies of every
    // unmatched replicated right row — refuse instead of corrupting
    // (comparison happens after underscore-stripping, so only the
    // underscore-free spellings belong in the set)
    val ok = Set("inner", "left", "leftouter", "leftsemi", "leftanti")
    require(ok.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got '$joinType'")
    val l = left.withColumn("__salt", saltCol(left, salts, saltFrom))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}

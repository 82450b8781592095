package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental VIEW MAINTENANCE for additive aggregates — the
  * warehouse pattern that makes a 100 TB daily rollup affordable:
  * never rescan history; merge yesterday's materialized aggregate
  * with today's delta aggregate. Correct for any ADDITIVE measure
  * (counts, decimal sums, and anything else where
  * total = f(old) + f(delta)); the caller keeps sums in DECIMAL until
  * after the merge so the incremental path is bit-identical to a full
  * recompute (decimal addition is associative — one final
  * decimal→double cast gives the same double either way, which is
  * exactly what the oracle checks).
  *
  * Scale: ONE full-outer join keyed on the group columns — both
  * sides are already aggregates (small relative to raw data), and the
  * join reuses their key partitioning; absent keys on either side
  * coalesce to zero. No window, no rescan of the base table.
  */
object Incremental {

  def mergeAdditive(
      snapshot: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      addCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeAdditive: no join keys")
    require(addCols.nonEmpty, "mergeAdditive: no additive columns")
    val missing = (keys ++ addCols).filterNot(snapshot.columns.contains) ++
      (keys ++ addCols).filterNot(delta.columns.contains)
    require(missing.isEmpty, s"mergeAdditive: missing columns ${missing.distinct}")
    val d = addCols.foldLeft(delta) { (f, c) => f.withColumnRenamed(c, s"__d_$c") }
    snapshot.join(d, keys, "full_outer")
      .select(
        keys.map(col) ++ addCols.map { c =>
          (coalesce(col(c), lit(0)) + coalesce(col(s"__d_$c"), lit(0))).as(c)
        }: _*)
  }
}

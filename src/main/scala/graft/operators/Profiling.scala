package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style corpus profiling: per-column row/null counts,
  * approximate distinct (HLL++), native-order min/max, and total
  * rendered length, for any set of columns, in ONE aggregation pass.
  *
  * The 100 TB story: every statistic here is partial-aggregable, so
  * the whole profile is a single map-side-combined scan — one job, one
  * 1-row shuffle — regardless of how many columns are profiled (the
  * naive per-column loop is N full scans). The 1-row aggregate then
  * unpivots to long format through `stack` in the SAME plan; nothing
  * recomputes per output row. min/max run on the NATIVE column type
  * before rendering to string ('10' < '9' lexicographically — casting
  * first would corrupt numeric extrema).
  */
object Profiling {

  /** One row per profiled column:
    * (column, n_rows, n_nonnull, n_distinct, min_value, max_value,
    * len_sum). `n_distinct` is HLL++ with `rsd` relative error; all
    * other fields are exact. `len_sum` totals the length of the
    * string rendering (a storage-footprint proxy that is also
    * engine-portable for oracle checks).
    */
  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.016): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    // names are interpolated into the stack() SQL below — restrict to
    // plain identifiers rather than risk a silently mangled expression
    val unsafe = cols.filterNot(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
    require(unsafe.isEmpty,
      s"profile: column name(s) not plain identifiers (alias them first): ${unsafe.mkString(", ")}")
    def c(name: String): Column = col(name)
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: cols.flatMap { n =>
      Seq(
        count(c(n)).as(s"__cnt_$n"),
        approx_count_distinct(c(n), rsd).as(s"__dist_$n"),
        min(c(n)).cast("string").as(s"__min_$n"),
        max(c(n)).cast("string").as(s"__max_$n"),
        coalesce(sum(length(c(n).cast("string"))), lit(0L)).as(s"__len_$n"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { n =>
      s"'$n', __cnt_$n, __dist_$n, __min_$n, __max_$n, __len_$n"
    }.mkString(", ")
    one.select(
      expr(s"stack(${cols.size}, $stackArgs) " +
        "as (column, n_nonnull, n_distinct, min_value, max_value, len_sum)"),
      col("__rows").as("n_rows"))
      .select(col("column"), col("n_rows"), col("n_nonnull"), col("n_distinct"),
        col("min_value"), col("max_value"), col("len_sum"))
  }
}

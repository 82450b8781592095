package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: the Spark definition plus (when
  * SQL-expressible) the DuckDB oracle producing the identical result —
  * same column names, same row set. `bench = true` marks the headline
  * queries timed by [[graft.Bench]].
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

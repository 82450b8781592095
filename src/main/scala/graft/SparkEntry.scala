package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in [[graft.queries.QueryCatalog]]; this
  * object is the stable façade the driver harness calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the 3-way join + aggregation shape of the reference's gold
    * "shoppable prices" query (SURVEY.md §3.3).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue_by_customer")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.QueryCatalog.oracleSql

  /** Headline queries timed by [[Bench]]. */
  def benchQueries: Seq[String] = graft.queries.QueryCatalog.benchNames
}

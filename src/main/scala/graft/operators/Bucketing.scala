package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE at write time so
  * every subsequent equi-join/aggregation on the bucket key runs with no
  * exchange at all — the decisive scan-time win for repeatedly joined
  * 100 TB fact tables (the shuffle is paid once, not per query).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. Joins
    * and aggregations keyed on `key` between tables bucketed with the
    * SAME bucket count then plan without ShuffleExchange.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    // repartition on the bucket key FIRST: without it every write task
    // emits up to `buckets` files (tasks × buckets small files at fleet
    // scale); with it, one file per bucket
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}

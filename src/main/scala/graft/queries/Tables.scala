package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata
  * (`/root/testdata/sf*`, see /root/repo/TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time so the
  * same definition runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, unchanged, against a cluster-sized warehouse: nothing
  * here assumes local paths beyond the `dir` prefix.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events table is written with TIMESTAMP(NANOS) parquet, which
    * Spark 4 rejects outright — read nanos as long (legacy conf) and
    * convert to a microsecond timestamp with integer division (a double
    * division would lose precision above 2^53; the data is µs-aligned so
    * the conversion is lossless).
    */
  /** The nanos→µs timestamp conversion shared by [[events]] and the
    * q19 file-stream reader — one definition, no drift.
    */
  def eventsTsFromNanos: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000"))

  /** Raw on-disk events schema (ts = nanos as long). Sets the legacy
    * conf for the duration of the footer read; note [[events]] must
    * leave it set for its lazily-executed result, so batch callers see
    * the conf mutated (documented trade-off — the flag only affects
    * TIMESTAMP(NANOS) parquet, which only this table uses).
    */
  def eventsRawSchema(s: SparkSession, d: String): org.apache.spark.sql.types.StructType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").schema
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", eventsTsFromNanos)
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

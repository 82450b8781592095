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
  /** The events table's on-disk `ts` representation has varied across
    * testdata generations: TIMESTAMP(NANOS) (Spark 4 rejects it — read
    * nanos as long under the legacy conf and divide), plain
    * `timestamp[us]` without isAdjustedToUTC (Spark reads
    * TIMESTAMP_NTZ — cast to TIMESTAMP, lossless because every graft
    * session pins spark.sql.session.timeZone=UTC, and it matches
    * DuckDB's naive reading of the same file), or a UTC-adjusted
    * timestamp (already the type every downstream op wants). One
    * normalization shared by [[events]] and the q19 file-stream
    * reader — no drift.
    */
  def normalizedEventsTs(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    dt match {
      // nanos as long: integer division (a double division would lose
      // precision above 2^53; the data is µs-aligned so this is lossless)
      case LongType => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _ => col("ts")
    }
  }

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
    df.withColumn("ts", normalizedEventsTs(df.schema("ts").dataType))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

package graft.streaming

import graft.SparkTestBase
import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming twin of the bounded range join (q67): a watermarked
  * stream-stream inner join with an interval condition must produce
  * exactly the pairs the batch [[TemporalJoins.rangeJoinPairs]]
  * produces on the same data — the contract that lets the temporal
  * correlation run over live event streams with bounded state (the
  * watermark bounds how long each side's rows are retained).
  */
class StreamingIntervalJoinSpec extends SparkTestBase {

  test("watermarked stream-stream interval join equals batch rangeJoinPairs") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val errDir = java.nio.file.Files.createTempDirectory("ssj_err")
    val clkDir = java.nio.file.Files.createTempDirectory("ssj_clk")
    val ckpt = java.nio.file.Files.createTempDirectory("ssj_ckpt")
    events.filter($"event_type" === "error").write.mode("overwrite").parquet(errDir.toString)
    events.filter($"event_type" === "click").write.mode("overwrite").parquet(clkDir.toString)
    val schema = spark.read.parquet(errDir.toString).schema

    val name = "ssj_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // watermarks bound state on both sides; 2h > the 1h join interval,
    // so no in-interval pair can be dropped as late
    val a = spark.readStream.schema(schema).parquet(errDir.toString)
      .withWatermark("ts", "2 hours").alias("a")
    val b = spark.readStream.schema(schema).parquet(clkDir.toString)
      .withWatermark("ts", "2 hours").alias("b")
    val joined = a.join(b,
      expr("""a.user_id = b.user_id AND
              b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR"""))
      .select(col("a.event_id").as("error_event_id"), col("b.event_id").as("click_event_id"))

    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(600000), "interval-join stream did not finish in 600s")
    finally q.stop()

    try {
      val streamed = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = TemporalJoins.rangeJoinPairs(
        events.filter($"event_type" === "error"),
        events.filter($"event_type" === "click"),
        leftKey = $"user_id", leftTime = $"ts",
        rightKey = $"user_id", rightTime = $"ts",
        toleranceSeconds = 3600L,
        leftOut = Seq("error_event_id" -> $"event_id"),
        rightOut = Seq("click_event_id" -> $"event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty, "fixture must produce pairs")
      assert(streamed == batch,
        s"stream-stream interval join diverged: ${streamed.size} vs ${batch.size} pairs")
    } finally spark.catalog.dropTempView(name)
  }
}

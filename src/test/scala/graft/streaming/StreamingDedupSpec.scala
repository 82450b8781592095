package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The bounded-state contract of watermarked streaming dedup: the
  * emitted set equals DISTINCT(keys) when every duplicate pair sits
  * within the watermark (determinism), no row is dropped as late under
  * time-ordered files (the staging invariant q50 relies on), and —
  * the part no SQL oracle can see — state is EVICTED as the watermark
  * advances, so a long stream never accumulates its whole history.
  */
class StreamingDedupSpec extends SparkTestBase {

  test("watermarked dedup: exact DISTINCT output, zero late drops, bounded state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wm_dedup").toFile
    val name = "wm_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      // 6 hours × 120 keys; every event duplicated at Δt=0 (guaranteed
      // collapse) — distinct = 720, input rows = 1440
      val hours = 6
      val perHour = 120
      val rows = for {
        h <- 0 until hours
        k <- 0 until perHour
        _ <- 0 until 2
      } yield (
        java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:${k % 60}%02d:${k / 60}%02d"),
        (h * perHour + k).toLong)
      val staged = rows.toDF("ts", "user_id")
      staged.repartitionByRange(hours, $"ts").sortWithinPartitions($"ts")
        .write.mode("overwrite").parquet(dir.toString)
      val parts = dir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val base = (System.currentTimeMillis() / 1000L) * 1000L - 3600000L
      parts.zipWithIndex.foreach { case (f, i) =>
        require(f.setLastModified(base + i * 2000L),
          s"could not set modification time on $f — staging order not guaranteed")
      }

      val q = spark.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .withColumn("minute", date_trunc("minute", $"ts"))
        .transform(df => StreamingDedup.withinWatermark(
          df, eventTime = "ts", delay = "10 minutes", keys = Seq("user_id", "minute")))
        .select($"user_id", $"minute")
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(300000), "stream did not terminate") finally q.stop()

      // exact DISTINCT: all 720 keys, each exactly once
      val emitted = spark.table(name).collect().map(r => (r.getLong(0), r.getTimestamp(1)))
      assert(emitted.length == hours * perHour, s"emitted ${emitted.length} rows, want 720")
      assert(emitted.distinct.length == emitted.length, "duplicate keys in output")

      val progresses = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(progresses.nonEmpty, "no state-operator progress recorded")
      // determinism witness: time-ordered files → nothing arrives late
      val lateDrops = progresses.map(_.stateOperators.head.numRowsDroppedByWatermark).sum
      assert(lateDrops == 0, s"$lateDrops rows dropped as late — staging order broken")
      // the bounded-state fact: by the final batches the watermark has
      // passed the early hours and their state is GONE — with unbounded
      // dropDuplicates state would reach all 720 keys
      val maxState = progresses.map(_.stateOperators.head.numRowsTotal).max
      assert(maxState < hours * perHour,
        s"state reached $maxState rows — watermark eviction never happened")
      val finalState = progresses.last.stateOperators.head.numRowsTotal
      assert(finalState <= 2L * perHour,
        s"final state $finalState rows — should hold ~one hour of keys, not the history")
    } finally {
      spark.catalog.dropTempView(name)
      dir.listFiles().foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
      java.nio.file.Files.deleteIfExists(dir.toPath)
    }
  }
}

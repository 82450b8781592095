package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Manual smoke: stream a real MRF file end-to-end (payer-mrf →
  * parquet sink, AvailableNow), then restart on the same checkpoint to
  * prove nothing re-emits. Usage: runMain graft.tools.StreamSmoke <path>
  * [maxChunksPerBatch]
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val maxPerBatch = if (args.length > 1) args(1) else ""
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = Files.createTempDirectory("stream-smoke-out").toString
    val ckpt = Files.createTempDirectory("stream-smoke-ckpt").toString
    def runOnce(): (Long, Long) = {
      val t0 = System.nanoTime()
      var reader = spark.readStream.format("payer-mrf")
      if (maxPerBatch.nonEmpty) reader = reader.option("maxChunksPerBatch", maxPerBatch)
      val q = reader.load(path)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      ((System.nanoTime() - t0) / 1000000, batches.toLong)
    }
    val (ms1, b1) = runOnce()
    val n1 = spark.read.parquet(out).count()
    println(f"run1: $n1 rows in $b1 batches, ${ms1 / 1000.0}%.2f s " +
      f"(${new java.io.File(path).length() / 1e9 / (ms1 / 60000.0)}%.1f GB/min)")
    val (ms2, _) = runOnce()
    val n2 = spark.read.parquet(out).count()
    println(f"run2 (restart, same checkpoint): ${n2 - n1} new rows, ${ms2 / 1000.0}%.2f s")
    spark.stop()
  }
}

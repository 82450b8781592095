package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.{QueryCatalog, Tables}

/** q116's contract: append-mode watermarked aggregation emits exactly
  * the windows the FINAL watermark closed — the batch aggregation
  * minus the still-open tail.
  */
class AppendWindowSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("append output ≡ batch windows closed below the final watermark") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val streamed = QueryCatalog.queries("q116_append_window_agg")(spark, sfDir).collect()

    val ev = Tables.events(spark, sfDir).filter($"ts".isNotNull)
    val wm = new java.sql.Timestamp(
      ev.agg(max($"ts")).head().getTimestamp(0).getTime - 3600000L)
    val batch = ev
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("total_value"))
      .filter($"w.end" <= lit(wm))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
      .orderBy($"window_start", $"event_type").collect()

    assert(streamed.toSeq == batch.toSeq)
    // the withheld tail must be non-empty, or the append semantics
    // were not actually exercised
    val all = ev.groupBy(window($"ts", "5 minutes"), $"event_type").count().count()
    assert(streamed.length < all,
      "final-hour windows must stay open (unemitted) in append mode")
  }
}

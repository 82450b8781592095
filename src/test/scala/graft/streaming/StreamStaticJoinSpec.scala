package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.{QueryCatalog, Tables}

/** q107's contract: the stream-static enrichment aggregate over ≥2
  * micro-batches must equal the one-shot batch join — streamed
  * delivery adds nothing but delivery.
  */
class StreamStaticJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed enrichment aggregate ≡ batch join") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val streamed = QueryCatalog.queries("q107_stream_static_join")(spark, sfDir).collect()

    val batch = Tables.events(spark, sfDir).filter($"ts".isNotNull)
      .join(Tables.customer(spark, sfDir), $"user_id" === $"c_custkey")
      .join(Tables.nation(spark, sfDir), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"))
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy($"nation").collect()

    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty, "the enrichment join must match some users")
  }
}

package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Cdc
import graft.queries.{QueryCatalog, Tables}

/** q102's contract: the foreachBatch CDC fold over ordered micro-
  * batches must equal the same three merges applied sequentially in
  * batch — the streamed path adds delivery, not semantics.
  */
class StreamingMergeSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed fold ≡ sequential batch merges (incl. delete-then-revive)") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val streamed = QueryCatalog.queries("q102_streaming_merge")(spark, sfDir).collect()

    val ev = Tables.events(spark, sfDir)
    def state(df: org.apache.spark.sql.DataFrame) = df.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("total_value"))
    def cut(day: Int) = lit(f"2024-01-$day%02d").cast("timestamp")
    val outs = Seq("user_id" -> col("user_id"), "n_events" -> col("n_events"),
      "total_value" -> col("total_value"))
    val batches = Seq(
      state(ev.filter($"ts" >= cut(11) && $"ts" < cut(16))).withColumn("del", lit(false)),
      state(ev.filter($"ts" >= cut(16) && $"ts" < cut(21)))
        .withColumn("del", $"user_id" % 9 === 0),
      state(ev.filter($"ts" >= cut(21))).withColumn("del", $"user_id" % 5 === 3))
    val expected = batches.foldLeft(state(ev.filter($"ts" < cut(11)))) { (snap, chg) =>
      Cdc.upsertMerge(snap, chg, col("user_id"), col("user_id"), col("del"), outs, outs)
    }.orderBy($"user_id").collect()

    assert(streamed.toSeq == expected.toSeq)

    val finalUsers = streamed.map(_.getLong(0)).toSet
    // the observable delete path must have BITTEN: users deleted in
    // the final window are absent from the final snapshot
    val w3deleted = batches(2).filter($"del").select($"user_id").collect().map(_.getLong(0))
    assert(w3deleted.nonEmpty && w3deleted.forall(u => !finalUsers.contains(u)),
      "fixture must exercise a delete that survives to the end")
    // ...and delete-then-revive too: users deleted in window 2 but
    // active (and not re-deleted) in window 3 are back
    val w2deleted = batches(1).filter($"del").select($"user_id").collect().map(_.getLong(0))
    val w3kept = batches(2).filter(!$"del").select($"user_id").collect().map(_.getLong(0)).toSet
    val revived = w2deleted.filter(w3kept)
    assert(revived.nonEmpty && revived.forall(finalUsers.contains),
      "fixture must exercise delete-then-revive across batches")
  }
}

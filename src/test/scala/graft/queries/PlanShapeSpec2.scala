package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Plan-shape assertions for the round-6 batch: the scale claims in
  * the Scaladocs are promises about EXCHANGES, not vibes — pin them.
  */
class PlanShapeSpec2 extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  test("snapshotDiff: guard aggregation reuses the join's key partitioning — no window, no extra exchange") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val ev = Tables.events(spark, sfDir)
    def state(df: org.apache.spark.sql.DataFrame) = df.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
    val diff = graft.operators.Cdc.snapshotDiff(
      state(ev.filter($"user_id" % 2 === 0)), state(ev),
      $"user_id", $"user_id", Seq("n_events", "total_value"))
    val p = plan(diff)
    assert(!p.contains("Window"), "the ambiguity guard must not be a window")
    // per side: ONE exchange feeds both the state agg, the guard agg
    // and the join (same key) — 2 total, not 4+
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 key exchanges (one per side), got $exchanges\n$p")
  }

  test("funnel: step aggregations are partial (map-side combine before the exchange)") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val f = graft.operators.Funnel.earliest(
      Tables.events(spark, sfDir), $"user_id", $"ts", $"event_type",
      Seq("view", "click", "purchase"), 7L * 86400L)
    val p = plan(f)
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"step mins must partial-aggregate map-side\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), "no cartesian anywhere")
  }

  test("retention: activity dedup partial-aggregates; no window") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val r = graft.operators.Funnel.retention(
      Tables.events(spark, sfDir), $"user_id", $"ts", 7L * 86400L)
    val p = plan(r)
    assert(!p.contains("Window"))
    assert(p.contains("partial"), s"distinct/min/count must map-side combine\n$p")
  }

  test("stream-static dim join broadcasts the dimension") {
    assume(new java.io.File(s"$sfDir/customer.parquet").exists())
    // the batch twin of q107's per-micro-batch plan
    val dim = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    val joined = Tables.events(spark, sfDir)
      .join(broadcast(dim), $"user_id" === $"c_custkey")
      .groupBy($"n_name").agg(count(lit(1)))
    val p = plan(joined)
    assert(p.contains("BroadcastHashJoin"), s"dim must broadcast\n$p")
    assert(!p.contains("SortMergeJoin"), "the fact side must never shuffle for the dim")
  }
}

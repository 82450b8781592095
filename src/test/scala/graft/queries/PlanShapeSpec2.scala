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

  test("q157: per-day prefix offsets broadcast-join (no per-day literal when-chain)") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val df = graft.SparkEntry.queries("q157_peak_concurrency")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"offsets must reach the delta stream via a broadcast join\n$p")
    // the old shape folded one nested `If` per distinct day into a
    // single projection expression — a plan linear in the calendar.
    // CASE WHEN (day = <literal>) is its physical signature; zero
    // occurrences means the offsets arrive via the join, not a chain.
    val whenChain = "CASE WHEN \\(day#\\d+L? = \\d+\\)".r.findAllIn(p).length
    assert(whenChain == 0, s"per-day literal when-chain resurfaced ($whenChain branches)\n$p")
  }

  test("q157 analyzes and runs at >=1000 distinct days (calendar-scale smoke)") {
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("q157days").toFile
    try {
      val days = 1100
      // per user per day: two events 1000 s apart (same 30-min-gap
      // session) → one session [d+10u s, d+1000+10u s]; all three
      // users overlap within a day, days never overlap each other
      val rows = (0 until days).flatMap { d =>
        (0 until 3).flatMap { u =>
          val base = 1704067200000L + d.toLong * 86400000L + u * 10000L
          Seq(
            (d.toLong * 6 + u * 2, new Timestamp(base), u.toLong, "view", 1.0, "{}"),
            (d.toLong * 6 + u * 2 + 1, new Timestamp(base + 1000000L),
              u.toLong, "view", 1.0, "{}"))
        }
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/events.parquet")
      val out = graft.SparkEntry.queries("q157_peak_concurrency")(
        spark, tmp.getAbsolutePath).collect()
      assert(out.length == 1)
      // 3 users live simultaneously on every one of the 1100 days
      assert(out(0).getAs[Long]("max_concurrency") == 3L)
      assert(out(0).getAs[Long]("n_sessions") == days.toLong * 3)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(tmp)
    }
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

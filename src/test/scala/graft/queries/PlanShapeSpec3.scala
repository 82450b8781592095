package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Plan-shape assertions for the round-8 session-2 batch: the
  * Scaladoc scale claims pinned as plans. The recurring promise is
  * "no single-reducer stage" — a global-sort window materializes as
  * `Exchange SinglePartition`, so its absence IS the claim.
  */
class PlanShapeSpec3 extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  private def scored = {
    val ev = Tables.events(spark, sfDir)
    ev.select($"event_type".as("g"), $"value".as("v"),
      ($"event_id" % 2 === 0).cast("long").as("y"))
      .filter($"v".isNotNull && !isnan($"v"))
  }

  test("rocAuc/mannWhitney: bucketed midranks — no single-partition exchange, windows stay partitioned") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    for (df <- Seq(
      graft.operators.RankStats.rocAuc(scored, $"g", $"v", $"y"),
      graft.operators.RankStats.mannWhitney(scored, $"g", $"v", $"y"))) {
      val p = plan(df)
      assert(p.contains("Window"), "the in-bucket cumulative IS a window")
      assert(!p.contains("Exchange SinglePartition"),
        s"no global-sort stage allowed in the rank machinery\n$p")
      assert(!p.toLowerCase.contains("cartesianproduct"))
    }
  }

  test("Fifo.matchLots: per-key cumulative window only — no single-partition exchange") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val li = Tables.lineitem(spark, sfDir).select(
      $"l_partkey", $"l_shipdate".cast("timestamp").as("sd"),
      ($"l_orderkey" * 8 + $"l_linenumber").as("tb"),
      $"l_quantity".cast("long").as("qv"),
      lit(1L).as("uc"), $"l_orderkey".as("ok"))
    val out = graft.operators.Fifo.matchLots(
      li.filter($"ok" % 2 === 0), li.filter($"ok" % 2 === 1),
      $"l_partkey", $"sd", $"tb", $"qv", $"uc", $"l_partkey", $"qv")
    val p = plan(out)
    assert(!p.contains("Exchange SinglePartition"), s"FIFO must stay per-key\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"))
  }

  test("positionCredit + negativeFunnel: carry-forward windows partitioned by user") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val ev = Tables.events(spark, sfDir)
    for (df <- Seq(
      graft.operators.Attribution.positionCredit(
        ev, $"user_id", $"ts", $"event_id", $"event_type",
        $"event_type" === "purchase"),
      graft.operators.Funnel.negativeFunnel(
        ev, $"user_id", $"ts", $"event_id", $"event_type",
        "view", "purchase", "error", 7L * 86400L * 1000000L))) {
      val p = plan(df)
      assert(!p.contains("Exchange SinglePartition"),
        s"journey/funnel windows must partition by user\n$p")
      assert(!p.toLowerCase.contains("cartesianproduct"))
    }
  }

  test("correlationMatrix: ONE scan, one aggregation — no window, map-side combine") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val df = graft.operators.Profiling.correlationMatrix(
      Tables.lineitem(spark, sfDir),
      Seq("qty" -> $"l_quantity", "price" -> $"l_extendedprice",
        "disc" -> $"l_discount"))
    val p = plan(df)
    assert(!p.contains("Window"), s"the matrix is an aggregation, not windows\n$p")
    assert(p.contains("partial"), s"statistics must map-side combine\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected ONE lineitem scan, got $scans\n$p")
  }
}

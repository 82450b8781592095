package graft

import graft.tools.PlanGuard

/** The catalog-wide bounded-frame GATE: every `SparkEntry.queries`
  * entry, built at sf0.001 and classified by [[PlanGuard]], must show
  * 0 cartesian products, 0 single-partition exchanges over unbounded
  * frames, and 0 globally-unpartitioned windows over unbounded frames
  * — each bound PROVED structurally on the plan tree (every
  * leaf-to-operator path passes an aggregate, a limit, a driver
  * literal, or a `boundedCheckpoint`-tagged checkpoint). A new query
  * that funnels an un-aggregated corpus through one window/exchange
  * partition FAILS here, not in a 100× production run.
  *
  * Plans are classified WITHOUT executing the query (window/aggregate
  * STRUCTURE is identical in the initial adaptive plan; AQE only
  * re-plans exchanges and join strategies at runtime) — eager
  * checkpoints inside query constructors still run, which is what
  * keeps this suite minutes, not hours, at sf0.001. The full-catalog
  * FINAL-plan sweep lives in `graft.tools.PlanAudit` (part 2) and is
  * committed as `PLANS_rNN.md` each round.
  */
class PlanGuardSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("catalog-wide: no cartesians, no unbounded single-partition " +
    "exchanges, no unbounded global windows (371+ plans)") {
    assume(new java.io.File(sfDir).isDirectory, s"fixture $sfDir missing")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val a = PlanGuard.audit(df)
      if (a.cartesians > 0 || a.unboundedSinglePart > 0 ||
          a.unboundedGlobalWindows > 0) {
        bad += s"$name: cart=${a.cartesians} " +
          s"unboundedSinglePartExch=${a.unboundedSinglePart} " +
          s"unboundedGlobalWindow=${a.unboundedGlobalWindows} " +
          a.findings.map(_.kind).distinct.mkString("[", ",", "]")
      }
      graft.Bench.freeLocalCheckpoints(spark)
    }
    // constructing q25/q26 registers the shared shingle projection for
    // this (session, sfDir); evict it so suite-global cache state is
    // exactly as before the sweep (CacheHygieneSpec asserts on it)
    graft.queries.LlmOps.evictSharedShingleCaches(spark)
    assert(bad.isEmpty,
      s"${bad.size} quer${if (bad.size == 1) "y" else "ies"} failed the " +
        s"bounded-frame proof:\n  ${bad.mkString("\n  ")}\n" +
        "Fix the plan (partition the window / pre-aggregate) or, if the " +
        "frame is bounded by construction behind a checkpoint, tag it " +
        "with PartitionedCheckpoint.boundedCheckpoint at the producing site.")
  }
}

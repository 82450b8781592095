package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Storage-hygiene contract of the dedup operators: a call may cache
  * internally while it runs, but no pinned storage survives the call
  * (the round-3 versions pinned a corpus-sized frame per invocation for
  * the session's lifetime). The one deliberate exception — the gate's
  * per-(session, dir) shared shingle projection — must release through
  * its documented eviction hook.
  */
class CacheHygieneSpec extends SparkTestBase {

  private def pinned: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Poll until the status store settles — listener-bus updates are
    * asynchronous, so an immediate read can miss just-finished jobs.
    */
  private def stableJobIds(): Set[Int] = {
    var prev = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    var same = 0
    while (same < 3) {
      Thread.sleep(100)
      val cur = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
      if (cur == prev) same += 1 else { same = 0; prev = cur }
    }
    prev
  }

  private def corpus = {
    import spark.implicits._
    (0L until 120L).map { i =>
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      (i, if (i % 3 == 0) base else base + s" tail${i % 7} more${i % 5} w$i")
    }.toDF("doc_id", "text")
  }

  test("dedup pair operators leave no pinned storage behind") {
    import spark.implicits._
    val before = pinned
    val df = corpus
    Dedup.simhashPairs(df, $"text", $"doc_id", maxHamming = 10).collect()
    Dedup.simhashPairsPortable(df, $"text", $"doc_id", maxHamming = 10).collect()
    Dedup.minhashLshPairs(df, $"text", $"doc_id", n = 3, threshold = 0.3).collect()
    Dedup.ngramJaccardPairs(df, $"text", $"doc_id", n = 3, threshold = 0.3).collect()
    Dedup.embeddingCosinePairs(
      (0L until 50L).map(i => (i, Seq(i.toDouble, 1.0, 2.0))).toDF("vec_id", "v"),
      $"v", $"vec_id", threshold = 0.9).collect()
    assert(pinned == before, s"operators pinned storage: ${pinned -- before}")
  }

  test("clusters: loop caches release; the returned cache unpersists cleanly") {
    import spark.implicits._
    val before = pinned
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.clusters(pairs)
    labels.collect()
    // the RETURNED frame is cached by documented contract (it holds the
    // converged labels); everything else must already be gone
    labels.unpersist(blocking = true)
    assert(pinned == before, s"clusters leaked loop caches: ${pinned -- before}")
  }

  test("evictSharedShingleCaches releases the gate's shared shingle projection") {
    val before = pinned
    graft.SparkEntry.queries("q26_dedup_minhash_lsh")(spark, "/root/testdata/sf0.001").count()
    assert(pinned != before, "expected the shared shingle projection to be cached")
    graft.queries.LlmOps.evictSharedShingleCaches(spark)
    assert(pinned == before, s"eviction left storage pinned: ${pinned -- before}")
  }

  test("clusters: per-round work stays bounded on a long chain (task budget)") {
    import spark.implicits._
    // chain 0-1-2-…-40 (diameter 40): label propagation + pointer
    // jumping converges in ~7 rounds. Two plan facts are pinned here:
    // (1) labels rebuild from a persisted RDD each round, so the
    // lineage is constant-size — chained cached Datasets grew the plan
    // ~4× per round and a 40-chain hung the driver on plan bookkeeping
    // (this very test caught it); (2) hop is NOT cached — ReuseExchange
    // dedups the self-join's identical propagate subtrees, and caching
    // hop measured ~40% MORE tasks (188 vs 134) for the cache fill +
    // InMemoryRelation scans. A regression on either fact blows the
    // task budget below.
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val before = stableJobIds()
    // localPairCap = 0 forces the DISTRIBUTED loop — this test pins
    // ITS task budget; the size-gated local fast path would short it
    val labels = Dedup.clusters(edges, localPairCap = 0)
    labels.collect()
    labels.unpersist(blocking = true)
    val jobs = (stableJobIds() -- before).size
    spark.sparkContext.removeSparkListener(listener)
    info(s"jobs=$jobs tasks=${tasks.get()}")
    assert(tasks.get() <= 165,
      s"clusters ran ${tasks.get()} tasks on a 40-chain (134 expected) — lineage growth or " +
        "an operator-internal cache crept back in")
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Graph.pageRank]] semantics: fixed-iteration power method with
  * uniform dangling-mass redistribution, duplicate edges collapsed,
  * loud failure on null endpoints. Expected values come from a local
  * scalar replay of the same recurrence (tolerance 1e-12 — the Spark
  * side folds double sums in partition order, so bit-equality is not
  * defined, but a 5-node graph leaves no room for drift).
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  // r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)
  private def localPageRank(
      edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outdeg.contains).map(rank).sum
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map { v =>
        v -> ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))
      }.toMap
    }
    rank
  }

  private val edges = Seq(
    (1L, 2L), (2L, 1L), (1L, 3L), (4L, 3L), (4L, 1L), (5L, 4L))
  // node 3 is dangling (no out-edges) — its mass must recycle

  test("pageRank matches a local replay and conserves total mass") {
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRank(df, col("src"), col("dst"), 0.85, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = localPageRank(edges, 0.85, 10)
    assert(got.keySet == want.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - want(node)) < 1e-12, s"node $node: $r vs ${want(node)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass leak: ${got.values.sum}")
  }

  test("duplicate edges count once (edge list is a multiset, graph is not)") {
    val single = edges.toDF("src", "dst")
    val tripled = (edges ++ edges ++ edges).toDF("src", "dst")
    val a = Graph.pageRank(single, col("src"), col("dst"), 0.85, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(tripled, col("src"), col("dst"), 0.85, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (node, r) => assert(math.abs(r - b(node)) < 1e-12) }
  }

  test("null endpoints fail loudly") {
    val df = Seq((Some(1L), Some(2L)), (Some(2L), None))
      .toDF("src", "dst")
    val ex = intercept[Exception] {
      Graph.pageRank(df, col("src"), col("dst"), 0.85, 2).collect()
    }
    // pin the GUARD's message, not just "some exception": a broken
    // raise_error path failing for an unrelated reason must not pass
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("node id must be non-null")),
      s"expected the null-endpoint guard message, got: ${msgs(ex).mkString(" | ")}")
  }

  test("parameter guards reject bad damping and iteration counts") {
    val df = edges.toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, col("src"), col("dst"), 1.0, 5)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, col("src"), col("dst"), 0.85, 0)
    }
  }

  test("bfsHops: min distances on a hand-built graph; undirected; cap and disconnection respected") {
    import spark.implicits._
    // path 1-2-3-4-5 plus shortcut 1-4, island 9-10. Edges given in
    // MIXED directions — BFS must treat them as undirected.
    val e = Seq((1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L), (1L, 4L), (10L, 9L))
      .toDF("src", "dst")
    val got = Graph.bfsHops(e, $"src", $"dst", source = 1L, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // shortest: 1→0, 2→1, 4→1 (shortcut), 3→2, 5→2; island unreachable
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2), got.toString)
    // cap: maxHops 1 keeps only the immediate neighborhood
    val capped = Graph.bfsHops(e, $"src", $"dst", source = 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 4L -> 1), capped.toString)
    // a source with no edges is just itself at hop 0
    val lone = Graph.bfsHops(e, $"src", $"dst", source = 42L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lone == Map(42L -> 0))
    intercept[IllegalArgumentException] {
      Graph.bfsHops(e, $"src", $"dst", source = 1L, maxHops = -1)
    }
  }

  // brute-force triangle oracle on the canonical simple graph
  private def localTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val canon = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct.toSet
    val nodes = canon.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if canon((a, b)) && canon((a, c)) && canon((b, c))
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  test("triangleCounts matches brute force; loops/duplicates/reversals collapse") {
    import spark.implicits._
    // K4 on 1-4 (4 triangles, each node in 3) + pendant 5 + hub 6
    // wired to 1,2 (closes one more triangle through edge 1-2)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 1L), (2L, 6L),
      // noise: loop, duplicate, reversed duplicate
      (3L, 3L), (1L, 2L), (2L, 1L))
    val got = Graph.triangleCounts(edges.toDF("s", "d"), $"s", $"d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == localTriangles(edges), s"got $got")
    // triangle-free graph emits nothing
    val none = Graph.triangleCounts(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d"), $"s", $"d")
    assert(none.count() == 0)
  }

  test("triangleCounts is skew-safe by orientation: a star closes no wedge at the hub") {
    import spark.implicits._
    // hub 0 connected to 1..40 plus one rim edge (1,2): exactly one
    // triangle. Degree orientation points every spoke AT the hub, so
    // the hub pivots no wedges — this is the property that bounds the
    // plan at scale; correctness-wise the count must still be exact.
    val star = (1L to 40L).map(i => (0L, i)) :+ (1L, 2L)
    val got = Graph.triangleCounts(star.toDF("s", "d"), $"s", $"d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), got.toString)
  }

  // synchronous LPA replay: most frequent neighbor label, tie smallest
  private def localLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    val adj = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
    }
    lbl
  }

  test("labelPropagation: two cliques joined by a bridge settle into two communities") {
    import spark.implicits._
    // clique 1-2-3, clique 10-11-12, bridge 3-10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L),
      // noise: duplicate, reversed, loop
      (2L, 1L), (1L, 2L), (5L, 5L), (5L, 6L))
    val got = Graph.labelPropagation(edges.toDF("s", "d"), $"s", $"d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == localLpa(edges, 4), s"got $got\nwant ${localLpa(edges, 4)}")
    // the two cliques must not share a label
    assert(Set(got(1L), got(2L)).intersect(Set(got(11L), got(12L))).isEmpty)
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(edges.toDF("s", "d"), $"s", $"d", iters = 0)
    }
  }

  // scalar replay of the HITS recurrence (L2-normalized half-steps)
  private def localHits(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 1.0).toMap
    def norm(m: Map[Long, Double]): Map[Long, Double] = {
      val n = math.sqrt(m.values.map(x => x * x).sum)
      if (n > 0) m.map { case (k, v) => k -> v / n } else m.map { case (k, _) => k -> 0.0 }
    }
    for (_ <- 1 to iters) {
      auth = norm(nodes.map(v =>
        v -> e.filter(_._2 == v).map(p => hub(p._1)).sum).toMap)
      hub = norm(nodes.map(u =>
        u -> e.filter(_._1 == u).map(p => auth(p._2)).sum).toMap)
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  test("hits matches a local replay; hubs and authorities separate on a bipartite graph") {
    import spark.implicits._
    // 1,2 point into 10,11,12; 2 also points at 13; duplicate edge
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 13L), (1L, 10L))
    val got = Graph.hits(edges.toDF("s", "d"), $"s", $"d", iters = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = localHits(edges, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (n, (h, a)) =>
      assert(math.abs(h - want(n)._1) < 1e-9, s"hub $n: $h vs ${want(n)._1}")
      assert(math.abs(a - want(n)._2) < 1e-9, s"auth $n: $a vs ${want(n)._2}")
    }
    // sources are pure hubs (auth 0), sinks pure authorities (hub 0)
    assert(got(1L)._2 == 0.0 && got(10L)._1 == 0.0)
    // node 1 points at more/better authorities than node 2
    assert(got(1L)._1 > got(2L)._1)
    // the doubly-cited 10 outranks the singly-cited 13
    assert(got(10L)._2 > got(13L)._2)
  }

  // ---- sparse checkpoint cadence: same answers, fewer scheduled jobs

  private def jobsDuring(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group, interruptOnCancel = false)
    try body finally sc.clearJobGroup()
    sc.statusTracker.getJobIdsForGroup(group).length
  }

  test("pageRank checkpoint-every-3 analyzes, matches per-iteration, and schedules fewer jobs") {
    val df = edges.toDF("src", "dst")
    def run(ck: Int) =
      Graph.pageRank(df, col("src"), col("dst"), 0.85, 9, checkpointEvery = ck)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var sparse: Map[Long, Double] = Map.empty
    var dense: Map[Long, Double] = Map.empty
    val jSparse = jobsDuring("pr-ck3") { sparse = run(3) }
    val jDense = jobsDuring("pr-ck1") { dense = run(1) }
    assert(sparse.keySet == dense.keySet)
    sparse.foreach { case (n, r) =>
      assert(math.abs(r - dense(n)) < 1e-12, s"node $n: $r vs ${dense(n)}")
    }
    assert(jSparse < jDense,
      s"sparse cadence must schedule fewer jobs: $jSparse vs $jDense")
  }

  test("hits and labelPropagation accept the sparse cadence (uncheckpointed lineage analyzes)") {
    import spark.implicits._
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 13L)).toDF("s", "d")
    // 7 iterations with cadence 3 leaves the FINAL iteration
    // un-checkpointed — the exact shape the old Dataset-qualified
    // refs failed to analyze
    val h = Graph.hits(e, $"s", $"d", iters = 7, checkpointEvery = 3).collect()
    assert(h.nonEmpty)
    val l = Graph.labelPropagation(e, $"s", $"d", iters = 7, checkpointEvery = 3).collect()
    assert(l.nonEmpty)
  }
}

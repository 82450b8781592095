package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph algorithms beyond the connected components in
  * [[Dedup.clusters]]. Same design rules: DataFrame joins/aggregations
  * only (each iteration is one shuffle on node id, exactly the
  * Pregel-style message exchange), with a sparse `localCheckpoint`
  * cadence (every `checkpointEvery` iterations) to truncate the
  * growing lineage without paying an eager materialization job per
  * iteration — the GraphX trade re-expressed on the Dataset API.
  */
object Graph {

  /** PageRank with damping `d` over a directed edge list, `iters`
    * fixed power iterations from the uniform start 1/N:
    *
    *   r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + dangling/N)
    *
    * Dangling mass (rank parked on nodes with no out-edges)
    * redistributes uniformly — the standard correction; without it
    * total rank leaks and scores drift low. Duplicate edges count
    * once (an edge list from a fact table is a multiset; PageRank is
    * defined on the graph). Null endpoints fail loudly.
    *
    * Scale: per iteration, ONE shuffle joins ranks to edges on src
    * and ONE aggregates contributions on dst — both partition by node
    * id, so AQE coalesces and the plan is the classic distributed
    * PageRank exchange. The dangling scalar is a 1-row aggregate
    * cross-joined back (broadcast, no extra shuffle of the rank
    * table). The rank table `localCheckpoint`s every
    * `checkpointEvery` iterations (executor-local MEMORY_AND_DISK
    * blocks, no DFS round-trip, reclaimed by the ContextCleaner as
    * previous tables unreference) — frequent enough to truncate the
    * growing lineage and bound the dangling-broadcast recompute
    * window, sparse enough that toy graphs aren't dominated by the
    * ~1 s/iteration scheduling cost of an eager materialization. The
    * every-k cadence analyzes because every join in the loop resolves
    * by COLUMN NAME against disjoint-named projections — an earlier
    * formulation used Dataset-qualified refs (`e("src")`), which
    * Spark's ambiguous-self-join detection rejects the moment an
    * un-checkpointed rank lineage contains `e` itself.
    */
  def pageRank(
      edges: DataFrame,
      src: Column,
      dst: Column,
      d: Double = 0.85,
      iters: Int = 10,
      checkpointEvery: Int = 3): DataFrame = {
    require(d > 0.0 && d < 1.0, s"damping must be in (0,1), got $d")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"pageRank: $side node id must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val e = edges.select(guarded(src, "src").as("src"), guarded(dst, "dst").as("dst"))
      .distinct()
    // node universe = src ∪ dst; out-degrees over the deduped edges
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    for (i <- 1 to iters) {
      // name-based join refs only: ranks (node, rank) × outdeg (src,
      // outdeg) × e (src, dst) have disjoint OUTPUT names at every
      // join, so DeduplicateRelations handles the e-inside-ranks
      // self-reference of un-checkpointed iterations
      val withDeg = ranks.join(outdeg, col("node") === col("src"), "left")
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dang"))
      val contribs = withDeg.filter(col("outdeg").isNotNull)
        .select(col("node"), (col("rank") / col("outdeg")).as("__c"))
        .join(e.select(col("src").as("cs"), col("dst").as("cd")),
          col("node") === col("cs"))
        .groupBy(col("cd").as("node2"))
        .agg(sum(col("__c")).as("__sum"))
      ranks = nodes
        .join(contribs, col("node") === col("node2"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - d) / n) +
            lit(d) * (coalesce(col("__sum"), lit(0.0)) + col("__dang") / lit(n.toDouble)))
            .as("rank"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Breadth-first hop distances from `source` over an UNDIRECTED
    * edge list: (node, hop) for every node within `maxHops`, hop =
    * its minimum distance. The level-synchronous frontier expansion —
    * per level ONE join of the (shrinking) frontier against the
    * bidirectional edge table + one anti-join against the visited set
    * (both shuffles keyed by node id); min-hop is exact BY
    * CONSTRUCTION (a node joins the visited set the first level it is
    * reachable, so no min aggregate is ever needed). `localCheckpoint`
    * per level for the same lineage/self-join reasons as [[pageRank]];
    * the loop stops at the first empty frontier, bounded by `maxHops`
    * (a disconnected or huge-diameter graph cannot run away).
    * Duplicate and reversed edges collapse; null endpoints fail
    * loudly (the [[pageRank]] contract).
    */
  def bfsHops(
      edges: DataFrame,
      src: Column,
      dst: Column,
      source: Long,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    def guarded(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"bfsHops: $name endpoint is null or not castable to long"))).otherwise(c.cast("long"))
    val fwd = edges.select(guarded(src, "src").as("a"), guarded(dst, "dst").as("b"))
    val e = fwd.unionByName(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var visited = Seq((source, 0)).toDF("node", "hop").localCheckpoint(true)
    var frontier = visited
    var hop = 1
    var done = false
    while (!done && hop <= maxHops) {
      val next = frontier
        .join(e, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next
        hop += 1
      }
    }
    visited
  }

  /** LANDMARK CLOSENESS CENTRALITY — closeness against a fixed set
    * of landmark nodes instead of all V sources: the standard scale
    * trade (Potamias et al. 2009) that turns O(V·E) all-pairs BFS
    * into k·BFS while preserving the ranking signal. State is
    * (landmark, node, hop) — k× the node set, never V² — and each of
    * the ≤ `maxHops` rounds is one shuffle join frontier⋈edges with
    * the [[bfsHops]] anti-join discipline.
    *
    * Exactness: hops are exact integers, so `total_dist` and
    * `n_reached` hash-match any engine. The harmonic closeness
    * Σ 1/d is emitted in EXACT SIXTIETHS (`harmonic_x60` =
    * Σ 60/d, integer for every d ≤ 6 — lcm(1..6) = 60; maxHops ≤ 6
    * is enforced so no float sum ever forms), plus one pinned
    * double division `closeness` = n_reached / total_dist.
    * Landmarks themselves count at distance 0 only toward their own
    * row's n_reached = 0 exclusion — self-reach (hop 0) is excluded
    * from all three statistics, the standard convention.
    *
    * Output: (node, n_reached, total_dist, harmonic_x60, closeness)
    * for every node reached by ≥ 1 landmark.
    */
  def landmarkCloseness(
      edges: DataFrame,
      src: Column,
      dst: Column,
      landmarks: Seq[Long],
      maxHops: Int): DataFrame = {
    require(landmarks.nonEmpty, "landmarkCloseness: need at least one landmark")
    require(maxHops >= 1 && maxHops <= 6,
      s"maxHops must be in [1, 6] (60/d exactness bound), got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    def guarded(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"landmarkCloseness: $name endpoint is null or not castable to long")))
        .otherwise(c.cast("long"))
    val fwd = edges.select(guarded(src, "src").as("a"), guarded(dst, "dst").as("b"))
    val e = fwd.unionByName(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var visited = landmarks.distinct.map(l => (l, l, 0))
      .toDF("lm", "node", "hop").localCheckpoint(true)
    var frontier = visited
    var hop = 1
    var done = false
    while (!done && hop <= maxHops) {
      val next = frontier
        .join(e, col("node") === col("a"))
        .select(col("lm"), col("b").as("node")).distinct()
        .join(visited, Seq("lm", "node"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next
        hop += 1
      }
    }
    visited.filter(col("hop") > 0)
      .groupBy(col("node")).agg(
        count(lit(1)).as("n_reached"),
        sum(col("hop").cast("long")).as("total_dist"),
        // 60/d is exact for every d ≤ 6; the long cast keeps the
        // column integral (Spark's `/` is always double)
        sum((lit(60.0) / col("hop").cast("double")).cast("long"))
          .as("harmonic_x60"))
      .withColumn("closeness",
        col("n_reached").cast("double") / col("total_dist").cast("double"))
  }

  /** Per-node triangle counts over an UNDIRECTED edge list: (node,
    * tri_n) for every node that closes at least one triangle. Loops
    * drop, duplicate/reversed edges collapse (triangles are defined
    * on the simple graph), null endpoints fail loudly.
    *
    * The wedge enumeration uses DEGREE-ORDERED orientation — every
    * edge points from its lower-(degree, id) endpoint to the higher —
    * which is what makes the plan survive skew: wedge count per node
    * is bounded by its ORIENTED out-degree squared, and orientation
    * caps oriented out-degree at O(√E) (a celebrity node with a
    * million followers has huge in-degree but tiny out-degree, so it
    * never becomes a wedge pivot). Total work is the optimal
    * O(E^1.5) regardless of the degree distribution — the standard
    * distributed-triangle trade (Suri & Vassilvitskii's MR model).
    * Three shuffles total: degree aggregation, the wedge self-join on
    * the pivot, and the wedge-closing join back against the oriented
    * edge set; the per-node count is one final aggregation over the
    * exploded triangle corners.
    */
  def triangleCounts(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"triangleCounts: $side node id must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val raw = edges.select(guarded(src, "src").as("x"), guarded(dst, "dst").as("y"))
      .filter(col("x") =!= col("y"))
    // canonical simple graph: unordered edge {a,b} stored once as a<b
    val canon = raw
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint(true)
    triangleList(canon)
      .select(explode(array(col("pivot"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_n"))
  }

  /** The degree-ordered triangle enumeration shared by
    * [[triangleCounts]], [[localClustering]] and [[kTruss]]: every
    * triangle of the CANONICAL simple graph (edges stored once as
    * a < b) exactly once, as (pivot, v, w). O(E^1.5) wedge work with
    * the bloom pre-filter before the close-join — see
    * [[triangleCounts]]' scaladoc for the full scale argument.
    */
  private def triangleList(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lower endpoint -> higher endpoint
    // identically-named struct fields on both branches — a struct
    // comparison/case requires congruent types
    val aKey = struct(col("da").as("d"), col("a").as("n"))
    val bKey = struct(col("db").as("d"), col("b").as("n"))
    val fwd = aKey < bKey
    // Materialized ONCE, hash-partitioned by the pivot: the checkpoint
    // preserves HashPartitioning(u) through LogicalRDD (see
    // [[PartitionedCheckpoint]] for the AQE caveat), so the wedge
    // self-join below plans with ZERO exchanges (both sides share the
    // partitioning) and the close join's probe side needs none either
    // — one paid shuffle replaces the three the planner would
    // otherwise insert over the 12M-row (sf1) oriented set.
    // the target's key is carried as TWO long columns (dv, v), not a
    // struct: the wedge predicate below evaluates once per ENUMERATED
    // pair (~411M at sf1) and a codegen'd pair of long compares beats
    // an interpreted struct ordering on the hot path
    // byKeysNCounted: the checkpoint's materialization pass doubles as
    // the bloom filter's sizing count (oriented keeps exactly one row
    // per canonical edge, and u/v are non-null by construction, so the
    // checkpoint row count IS the non-null key count) — round 15, one
    // fewer action + one fewer full pass over the oriented set per
    // triangle enumeration (and kTruss re-enumerates every peel round)
    val (oriented, orientedRows) = PartitionedCheckpoint.byKeysNCounted(
      canon
        .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
        .select(
          when(fwd, col("a")).otherwise(col("b")).as("u"),
          when(fwd, col("db")).otherwise(col("da")).as("dv"),
          when(fwd, col("b")).otherwise(col("a")).as("v")),
      0,
      col("u"))
    // wedges pivoting at u: (v, w) with (dv,v) < (dw,w) keeps each
    // wedge exactly once under the same (deg, id) total order. A
    // wedge closes iff the graph has edge {v,w}; orientation is a
    // TOTAL order and the wedge keeps vkey < wkey, so that edge — if
    // present — is oriented exactly v->w. The wedge table is the
    // plan's O(E^1.5) blowup and almost all of it closes nothing:
    // rather than materializing every enumerated pair through a
    // self-join (411M joined rows at sf1) and bloom-filtering after,
    // the [[graft.functions.WedgeCandidates]] kernel runs the i<j
    // double loop over each pivot's neighbor list (key-sorted
    // in-kernel since round 14) with the
    // split-block bloom probe INSIDE — only the ~5 % of wedges the
    // bloom cannot rule out are ever allocated as rows (sf1: the
    // wedge stage fell 10.3 s → ~4 s). The groupBy(u) rides the
    // checkpoint's declared HashPartitioning — no exchange — and the
    // bloom keeps the no-false-negative contract, so the exact close
    // join below removes the ~fpp false positives as before.
    val bloomBytes = BloomJoin.buildBlockedKeyFilterSized(
      oriented, xxhash64(col("u"), col("v")), orientedRows)
    val spark = canon.sparkSession
    // the filter ships as a BROADCAST, not a plan literal (round 15):
    // the literal form put the multi-MB bytes inside the expression
    // tree — every plan copy, canonicalization equality walk and the
    // stage task binary carried them (sf0.1: 4 MiB task-binary
    // warnings; sf1: ~24 MB), and every task rebuilt its own
    // deserialized BlockedBloom. The broadcast handle keeps the plan
    // bytes-free and the deserialized filter is shared per executor
    // JVM (see WedgeCandidatesBc)
    val bloomBc = spark.sparkContext.broadcast(bloomBytes)
    // no sort_array: the kernel key-sorts the primitive (d, n) columns
    // itself (round-14 — the SQL sort ran an interpreted per-element
    // struct comparator over 12M elements at sf1)
    val nbrs = oriented.groupBy(col("u"))
      .agg(collect_list(struct(col("dv").as("d"), col("v").as("n"))).as("ns"))
      .filter(size(col("ns")) >= 2)
    val candidates = nbrs.select(col("u").as("pivot"),
      explode(graft.functions.GraphFunctions.wedgeCandidatesBc(
        col("ns"), bloomBc)).as("p"))
      .select(col("pivot"), col("p.v").as("v"), col("p.w").as("w"))
    // shuffle-hash, not sort-merge: sorting the wedge-candidate side
    // (23M rows at sf1) buys nothing a per-partition hash map over the
    // oriented side (12M/Npart rows) doesn't, and the oriented scan's
    // preserved HashPartitioning(u) means the build side needs no
    // exchange at all when subset-key co-partitioning is allowed
    val tri = candidates.join(
      oriented.select(col("u").as("cv"), col("v").as("cw")).hint("shuffle_hash"),
      col("v") === col("cv") && col("w") === col("cw"))
    tri.select(col("pivot"), col("v"), col("w"))
  }

  /** PER-NODE LOCAL CLUSTERING COEFFICIENT — Watts & Strogatz 1998:
    * lcc(v) = triangles through v / (deg(v)·(deg(v)−1)/2), how
    * interconnected each node's neighbourhood is (the per-node
    * sibling of [[globalClustering]]). Triangle mass via the shared
    * degree-ordered O(E^1.5) enumeration; degrees one aggregation.
    * Exact integers + one pinned division. Output: (node, deg,
    * tri_n, lcc) for every node — tri_n 0 and lcc 0.0 when no
    * triangle closes, lcc null for degree-1 nodes (undefined).
    */
  def localClustering(
      edges: DataFrame,
      src: Column,
      dst: Column): DataFrame = {
    val sym = symmetrized(edges, src, dst, "localClustering")
      .localCheckpoint(true)
    val canon = sym.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val tri = triangleList(canon)
      .select(explode(array(col("pivot"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_n"))
    deg.join(tri, Seq("node"), "left")
      .select(
        col("node"), col("deg"),
        coalesce(col("tri_n"), lit(0L)).as("tri_n"),
        when(col("deg") >= 2L,
          lit(2.0) * coalesce(col("tri_n"), lit(0L)).cast("double")
            / (col("deg").cast("double") * (col("deg").cast("double") - 1.0)))
          .otherwise(lit(null).cast("double")).as("lcc"))
  }

  /** K-TRUSS — the maximal subgraph in which every edge sits on at
    * least k−2 triangles (Cohen 2008): the standard cohesive-core
    * extractor that is stricter than k-core (which bounds degree, not
    * closure) and cheaper than clique enumeration. Iterative peeling:
    * compute per-edge triangle support with the shared degree-ordered
    * O(E^1.5) enumeration, drop edges under the threshold, repeat
    * until a fixpoint — supports only DECREASE as edges leave, so
    * peeling is monotone and converges; each round is bounded by the
    * triangle-count plan, and the edge set only shrinks. Rounds
    * localCheckpoint eagerly (the two count actions materialize them
    * anyway), keeping lineage flat. Raises loudly after `maxIter`
    * rounds rather than running silently unbounded.
    *
    * Output: (a, b, support) per surviving canonical edge — support
    * measured WITHIN the converged truss, all exact integers.
    */
  def kTruss(
      edges: DataFrame,
      src: Column,
      dst: Column,
      k: Int,
      maxIter: Int = 12): DataFrame = {
    require(k >= 3, s"kTruss: k must be >= 3, got $k")
    val sym = symmetrized(edges, src, dst, "kTruss")
    var e = sym.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .localCheckpoint(true)
    var result: DataFrame = null
    var iter = 0
    while (result == null) {
      iter += 1
      require(iter <= maxIter,
        s"kTruss: no fixpoint after $maxIter peeling rounds")
      val tris = triangleList(e)
      // each triangle supports its 3 canonical edges; pivot/v/w carry
      // no orientation promise relative to a<b, so re-canonicalize
      val sup = tris.select(explode(array(
          struct(least(col("pivot"), col("v")).as("a"),
            greatest(col("pivot"), col("v")).as("b")),
          struct(least(col("pivot"), col("w")).as("a"),
            greatest(col("pivot"), col("w")).as("b")),
          struct(least(col("v"), col("w")).as("a"),
            greatest(col("v"), col("w")).as("b")))).as("ed"))
        .select(col("ed.a").as("a"), col("ed.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
      val kept = sup.filter(col("support") >= (k - 2).toLong)
        .localCheckpoint(true)
      val before = e.count()
      val after = kept.count()
      if (after == before || after == 0L) result = kept
      else e = kept.select(col("a"), col("b")).localCheckpoint(true)
    }
    result
  }

  /** HITS hubs-and-authorities over a DIRECTED edge list, `iters`
    * power iterations from all-ones with L2 normalization after each
    * half-step (Kleinberg's original formulation): good hubs point at
    * good authorities and vice versa — the second classic link-
    * analysis ranking next to [[pageRank]] (which measures a single
    * prestige; HITS separates pointing-well from being-pointed-at).
    *
    * Per iteration: TWO shuffles (auth update joins hubs to edges on
    * src and aggregates on dst; hub update the reverse) plus two
    * 1-row norm aggregates broadcast back — the [[pageRank]] exchange
    * geometry doubled. Duplicate edges collapse, null endpoints fail
    * loudly; the score table `localCheckpoint`s every
    * `checkpointEvery` iterations (name-isolated join refs make the
    * sparse cadence analyze — the [[pageRank]] note). Returns
    * (node, hub, auth); node set = src ∪ dst.
    * Like every float reduction, the sums are partition-ordered —
    * oracles replay the recurrence and compare to tolerance (the q89
    * contract).
    */
  def hits(
      edges: DataFrame,
      src: Column,
      dst: Column,
      iters: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"hits: $side node id must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val e = edges.select(guarded(src, "src").as("src"), guarded(dst, "dst").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    require(!nodes.isEmpty, "hits: empty graph")
    var scores = nodes.select(col("node"), lit(1.0).as("hub"), lit(1.0).as("auth"))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      // name-based join refs only (the [[pageRank]] cadence note)
      // auth(v) = Σ_{u→v} hub(u), then L2-normalize
      val rawAuth = nodes
        .join(scores.select(col("node").as("hn"), col("hub"))
          .join(e.select(col("src").as("es"), col("dst").as("ed")),
            col("hn") === col("es"))
          .groupBy(col("ed").as("an")).agg(sum(col("hub")).as("a")),
          col("node") === col("an"), "left")
        .select(col("node"), coalesce(col("a"), lit(0.0)).as("a"))
      val aNorm = rawAuth.agg(sqrt(sum(col("a") * col("a"))).as("__na"))
      val auth = rawAuth.crossJoin(broadcast(aNorm))
        .select(col("node"),
          when(col("__na") > 0.0, col("a") / col("__na")).otherwise(lit(0.0)).as("auth"))
      // hub(u) = Σ_{u→v} auth(v), then L2-normalize
      val rawHub = nodes
        .join(auth.select(col("node").as("an2"), col("auth").as("av"))
          .join(e.select(col("src").as("es2"), col("dst").as("ed2")),
            col("an2") === col("ed2"))
          .groupBy(col("es2").as("hn2")).agg(sum(col("av")).as("h")),
          col("node") === col("hn2"), "left")
        .select(col("node"), coalesce(col("h"), lit(0.0)).as("h"))
      val hNorm = rawHub.agg(sqrt(sum(col("h") * col("h"))).as("__nh"))
      val hub = rawHub.crossJoin(broadcast(hNorm))
        .select(col("node"),
          when(col("__nh") > 0.0, col("h") / col("__nh")).otherwise(lit(0.0)).as("hub"))
      scores = hub.join(auth, Seq("node")).select(col("node"), col("hub"), col("auth"))
      if (i % checkpointEvery == 0) scores = scores.localCheckpoint(true)
    }
    scores
  }

  /** Community detection by SYNCHRONOUS label propagation over an
    * undirected edge list: labels start as node ids; each of `iters`
    * rounds every node adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label. Both rules make the
    * algorithm fully deterministic (asynchronous LPA is famously
    * order-dependent; the synchronous min-tie variant is replayable
    * by any engine), at the cost of possible 2-cycles on bipartite
    * structures — fixed `iters` bounds that the same way fixed power
    * iterations bound [[pageRank]].
    *
    * Scale: per round, ONE shuffle joins labels to edges on the
    * source endpoint and a two-level aggregation — count per (node,
    * label), then a partial-aggregable max of (count, -label) per
    * node — picks the winner; no windows, no driver state. Duplicate
    * and reversed edges collapse; loops drop (a self-vote would make
    * every node its own community); null endpoints fail loudly.
    */
  def labelPropagation(
      edges: DataFrame,
      src: Column,
      dst: Column,
      iters: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"labelPropagation: $side node id must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val fwd = edges
      .select(guarded(src, "src").as("a"), guarded(dst, "dst").as("b"))
      .filter(col("a") =!= col("b"))
    val e = fwd.unionByName(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = e.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      labels = e.join(labels, col("a") === col("node"))
        .groupBy(col("b"), col("lbl")).agg(count(lit(1)).as("cnt"))
        // winner = max (cnt, -lbl): highest count, then smallest label
        .groupBy(col("b").as("node2"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("node2").as("node"), (-col("m.neg")).as("lbl"))
      // exact-integer recurrence: the sparse cadence (the [[pageRank]]
      // note) is purely a lineage/scheduling trade here
      if (i % checkpointEvery == 0) labels = labels.localCheckpoint(true)
    }
    labels
  }

  /** k-core decomposition by SYNCHRONOUS iterative peeling over an
    * UNDIRECTED edge list: `rounds` fixed rounds of "drop every node
    * whose degree in the SURVIVING subgraph is < k, then restrict the
    * edges to surviving endpoints". With enough rounds this converges
    * to the classic k-core (the maximal subgraph of min-degree ≥ k);
    * fixed rounds make it exactly replayable by an unrolled SQL oracle
    * (the [[labelPropagation]] determinism contract — once the peel
    * reaches fixpoint, further rounds are no-ops, so "enough" is
    * cheap to over-provision). Returns (node, deg): the surviving
    * nodes with their degree inside the surviving subgraph — exact
    * integers end to end.
    *
    * Scale: per round ONE degree aggregation keyed by node and one
    * semi-join restriction per endpoint — all exchanges hash on node
    * id; no windows, no driver state; the edge set only SHRINKS.
    * Duplicate/reversed edges collapse, loops drop, null endpoints
    * fail loudly (the [[pageRank]] guard contract); sparse
    * `localCheckpoint` cadence as in the other loops.
    */
  def kCore(
      edges: DataFrame,
      src: Column,
      dst: Column,
      k: Int,
      rounds: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"kCore: $side node id must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val fwd = edges
      .select(guarded(src, "src").as("a"), guarded(dst, "dst").as("b"))
      .filter(col("a") =!= col("b"))
    var e = fwd.unionByName(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    for (r <- 1 to rounds) {
      val keep = e.groupBy(col("a")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select(col("a"))
      e = e.join(keep, Seq("a"))
        .join(keep.select(col("a").as("b")), Seq("b"))
        .select(col("a"), col("b"))
      if (r % checkpointEvery == 0) e = e.localCheckpoint(true)
    }
    e.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Personalized PageRank: [[pageRank]] with the teleport (and the
    * dangling redistribution) concentrated on a SOURCE SET instead of
    * uniform — the standard "relevance to these seed nodes" ranking
    * (recommendation candidates, local community scoring):
    *
    *   r'(v) = (1-d)·1[v ∈ S]/|S|
    *           + d·(Σ_{u→v} r(u)/outdeg(u) + dangling·1[v ∈ S]/|S|)
    *
    * Nodes unreachable from S score exactly 0 (no uniform floor).
    * Total mass stays 1 by construction. `sources` is a small literal
    * seed set (an `isInCollection` membership column — seeds are user
    * input, not data-scale); everything else inherits the [[pageRank]]
    * exchange geometry, guards, and sparse checkpoint cadence.
    */
  def personalizedPageRank(
      edges: DataFrame,
      src: Column,
      dst: Column,
      sources: Seq[Long],
      d: Double = 0.85,
      iters: Int = 10,
      checkpointEvery: Int = 3): DataFrame = {
    require(d > 0.0 && d < 1.0, s"damping must be in (0,1), got $d")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(sources.nonEmpty, "personalizedPageRank: empty source set")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"personalizedPageRank: $side node id must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val e = edges.select(guarded(src, "src").as("src"), guarded(dst, "dst").as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val srcSet = sources.distinct
    val m = srcSet.size.toDouble
    val inS = col("node").isInCollection(srcSet)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    var ranks = nodes
      .withColumn("rank", when(inS, lit(1.0 / m)).otherwise(lit(0.0)))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      val withDeg = ranks.join(outdeg, col("node") === col("src"), "left")
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dang"))
      val contribs = withDeg.filter(col("outdeg").isNotNull)
        .select(col("node"), (col("rank") / col("outdeg")).as("__c"))
        .join(e.select(col("src").as("cs"), col("dst").as("cd")),
          col("node") === col("cs"))
        .groupBy(col("cd").as("node2"))
        .agg(sum(col("__c")).as("__sum"))
      ranks = nodes
        .join(contribs, col("node") === col("node2"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(d) * coalesce(col("__sum"), lit(0.0)) +
            when(inS, (lit(1.0 - d) + lit(d) * col("__dang")) / lit(m))
              .otherwise(lit(0.0)))
            .as("rank"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** FRONTIER (delta-iteration) CONNECTED COMPONENTS — min-label
    * propagation where each round touches ONLY edges incident to
    * nodes whose label changed last round: the Flink/Naiad delta-
    * iteration shape. Per round: the frontier's labels propagate to
    * neighbors (one shuffle restricted to frontier-incident edges),
    * improvements (strictly smaller candidate) become the next
    * frontier, and the loop stops when the frontier empties — work
    * per round is proportional to CHANGE, not graph size, which is
    * the regime that matters for mostly-converged or incrementally
    * grown graphs. Trade (documented, spec-pinned equal to
    * [[Dedup.clusters]]): rounds scale with component DIAMETER where
    * pointer jumping needs O(log n) rounds of full-graph work — on a
    * long path pointer jumping wins, on a near-converged 100 TB graph
    * the frontier does.
    *
    * Same engineering discipline as [[Dedup.clusters]]: labels and
    * frontier live as persisted RDDs and every round REBUILDS the
    * DataFrames, so the logical plan stays constant-size across
    * rounds (no lineage growth, no ambiguous-self-join hazard).
    * Output: (node, component) with component = min reachable node.
    */
  def connectedComponentsFrontier(
      edgesIn: DataFrame,
      src: Column,
      dst: Column,
      maxIter: Int = 200): DataFrame = {
    val sym = symmetrized(edgesIn, src, dst, "connectedComponentsFrontier")
    val seed = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    // round 0: every node announces itself
    frontierLoop(sym, seed, seed, maxIter, "connectedComponentsFrontier")
  }

  /** INCREMENTAL component maintenance — converged `oldLabels`
    * ((node, component) from a previous run) warm-start the frontier
    * loop after `deltaEdges` arrive: the initial frontier is ONLY the
    * delta endpoints (new nodes start as their own label), so two
    * merging components re-label in rounds proportional to the
    * SMALLER side's diameter while untouched regions never produce a
    * task — the daily-graph-growth economics the full recompute
    * cannot have. `allEdges` must be old ∪ delta (propagation crosses
    * old edges when a merge spreads). Spec-pinned equal to the full
    * recompute for random graph growth.
    */
  def connectedComponentsIncremental(
      oldLabels: DataFrame,
      allEdges: DataFrame,
      deltaEdges: DataFrame,
      src: Column,
      dst: Column,
      maxIter: Int = 200): DataFrame = {
    val sym = symmetrized(allEdges, src, dst, "connectedComponentsIncremental")
    // oldLabels arrives in this module's own output shape
    val old = oldLabels.select(col("node"), col("component").as("label"))
    val fresh = sym.select(col("src").as("node")).distinct()
      .join(old.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("label"))
    val labels0 = old.unionByName(fresh)
    val deltaSym = symmetrized(deltaEdges, src, dst, "connectedComponentsIncremental")
    val frontier0 = deltaSym.select(col("src").as("node")).distinct()
      .join(labels0, Seq("node"))
      .select(col("node"), col("label"))
    frontierLoop(sym, labels0, frontier0, maxIter,
      "connectedComponentsIncremental")
  }

  /** Bounded-round WEIGHTED single-source shortest paths — `rounds`
    * synchronous Bellman-Ford relaxations over an undirected weighted
    * edge list, returning each reached node's EXACT minimum path cost
    * over paths of at most `rounds` edges (the standard bounded-hop
    * SSSP contract; run with rounds ≥ diameter for the unbounded
    * answer). Frontier-restricted like
    * [[connectedComponentsFrontier]]: each round relaxes ONLY edges
    * incident to nodes whose distance improved last round — a no-op
    * relaxation is never re-sent — and the loop exits early when the
    * frontier empties. Frontier Bellman-Ford computes exactly the
    * full relaxation's per-round distances (a node that did not
    * improve re-relaxes to the same values it already sent), so the
    * bounded-hop semantics survive the optimization.
    *
    * Costs stay exact long arithmetic end to end. Parallel edges
    * collapse to their minimum weight; weights must be non-negative
    * longs (negative weights break the min-merge; they raise).
    * Per round: one frontier-edge join + min-aggregation, one
    * improvement anti-check against the running distances, one
    * min-merge — each round's result is `localCheckpoint`ed so the
    * plan stays constant-size ([[bfsHops]] discipline; rounds are
    * small by contract).
    */
  def ssspBoundedRounds(
      edgesIn: DataFrame,
      src: Column,
      dst: Column,
      weight: Column,
      source: Long,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val spark = edgesIn.sparkSession
    import spark.implicits._
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"ssspBoundedRounds: null/non-numeric $side endpoint")))
        .otherwise(c.cast("long"))
    val wG = when(weight.cast("long").isNull || weight.cast("long") < 0L,
      raise_error(lit("ssspBoundedRounds: weight must be a non-negative long")))
      .otherwise(weight.cast("long"))
    val e0 = edgesIn
      .select(guarded(src, "src").as("a"), guarded(dst, "dst").as("b"), wG.as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
    val sym = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b"), col("w")))
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
      .localCheckpoint(true)
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint(true)
    var frontier = dist
    var r = 0
    var done = false
    while (!done && r < rounds) {
      val cand = sym.join(frontier, col("node") === col("a"))
        .select(col("b").as("cn"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("cn")).agg(min(col("nd")).as("cd"))
      val improved = cand.join(dist, col("cn") === col("node"), "left")
        .filter(col("dist").isNull || col("cd") < col("dist"))
        .select(col("cn").as("node"), col("cd").as("dist"))
        .localCheckpoint(true)
      if (improved.isEmpty) done = true
      else {
        dist = dist.unionByName(improved)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
        frontier = improved
        r += 1
      }
    }
    dist
  }

  /** BOUNDED-HORIZON KATZ CENTRALITY over the undirected graph —
    * Σ_{i=1..hops} αⁱ·(walks of length i from v), the damped-walk
    * influence score (Katz 1953), truncated at `hops` so the
    * computation is `hops` sparse join+aggregate rounds instead of a
    * linear solve. α = 1/`alphaDen` must be an exact rational: walk
    * counts accumulate in decimal(38,0) and the score is kept ×
    * alphaDen^hops as ONE exact integer (katz_scaled), so the final
    * division is the only double — hash-exact.
    *
    * Each round shuffles on the node id only (edge ⨝ previous vector,
    * then groupBy src — the w-vector side is one row per node and
    * broadcast-eligible); nothing is ever quadratic in edges. Walk
    * counts grow like degreeⁱ — the 2⁵³ output guard raises LOUDLY
    * when the horizon is too deep for the graph's density (a regime
    * where truncated Katz is meaningless anyway).
    *
    * Output per node with ≥ 1 edge: (node, w1..w`hops`, katz) with
    * katz = katz_scaled / alphaDen^hops.
    */
  /** NEIGHBORHOOD FUNCTION via mergeable KMV sketches — the HyperANF
    * idea (Boldi, Rosa & Vigna, WWW 2011; Palmer et al.'s ANF) with
    * this engine's deterministic KMV sketch in place of HLL: per node
    * and hop radius t ≤ `rounds`, an estimate of |B(v, t)|, the
    * number of nodes within t hops. The exact ball needs all-pairs
    * BFS (O(V·E) — impossible at corpus scale); the sketch version is
    * `rounds` rounds of edge-join + k-min merge, O(rounds·E·k) rows
    * total, because KMV union IS ball union:
    *
    *   sketch_v(t) = kmin_k( sketch_v(t−1) ∪ ⋃_{u∈N(v)} sketch_u(t−1) ).
    *
    * Determinism: hashes are the portable md5-60bit [[KmvSketch]]
    * family and the k-min merge is order-free, so — unlike HLL
    * implementations with private seeds — every sketch, and therefore
    * every estimate, is REPLAYABLE by an unrolled SQL oracle
    * (the q259 landmark precedent): unsaturated balls report their
    * EXACT size, saturated ones the (k−1)·2⁶⁰/h₍ₖ₎ estimator, and the
    * k-th hash rides along as an exact integer digest. Graph is
    * symmetrized (undirected), every edge endpoint is a node, and
    * t = 0 is the singleton ball.
    *
    * Output: (node, t, n_hashes, kth_hash, ball_est) for every node
    * and t ∈ [0, rounds]; `kth_hash` null while unsaturated.
    */
  def neighborhoodFunction(
      edgesIn: DataFrame,
      src: Column,
      dst: Column,
      rounds: Int = 2,
      k: Int = 32): DataFrame = {
    require(rounds >= 1 && rounds <= 6, s"rounds must be in [1, 6], got $rounds")
    require(k >= 2 && k <= 1024, s"k must be in [2, 1024], got $k")
    val sym = symmetrized(edgesIn, src, dst, "neighborhoodFunction")
      .localCheckpoint(true)
    val nodes = sym.select(col("src").as("v")).distinct()
    val s0 = nodes
      .select(col("v"), array(KmvSketch.hash60(col("v"))).as("kmv"))
      .localCheckpoint(true)
    // Strategy is SIZE-GATED on the total state footprint V·(16+8k)
    // bytes (V is a cheap count over the already-materialized s0):
    //   small — broadcast the state side each round AND pin the
    //     adjacency by the AGG key w, so the round's join preserves
    //     the layout and the groupBy(w) merge runs with ZERO
    //     exchanges (sf1 A/B min-of-3: 8.9 s vs 11.9 s for the
    //     un-hinted SortMergeJoin shape, which re-exchanged and
    //     re-sorted the E-row adjacency every round);
    //   large (billions of nodes — broadcast infeasible) — shuffle-
    //     hash-hint the state side: same two exchanges as SMJ but no
    //     E-row sort per round (sf1 A/B: 9.0 s vs 9.8 s), and the
    //     per-partition hash build is states/numPartitions, which
    //     scales out with the cluster.
    // (An earlier u-pinned adjacency under the default SMJ was
    // measured SLOWER — sf1 45.6 s vs 21.7 s — pinning the JOIN key
    // buys nothing when the join still sorts; pinning the AGG key
    // under a broadcast join is what removes the exchanges.)
    val nodeCount = s0.count()
    val broadcastStates = nodeCount * (16L + 8L * k) <= (256L << 20)
    // self-loop per node: the radius-(t−1) ball of v itself always
    // merges into the radius-t ball
    val adjBase = sym.select(col("src").as("w"), col("dst").as("u"))
      .union(nodes.select(col("v").as("w"), col("v").as("u")))
    val adj =
      if (broadcastStates) PartitionedCheckpoint.byKeys(adjBase, col("w"))
      else adjBase.localCheckpoint(true)
    val states = (1 to rounds).foldLeft(Vector(s0)) { (acc, _) =>
      val prevBase = acc.last.select(col("v").as("u"), col("kmv"))
      val prev =
        if (broadcastStates) broadcast(prevBase)
        else prevBase.hint("shuffle_hash")
      // state-grain merge: E rows per round, one linear distinct-merge
      // per edge — not E·k exploded element inserts
      val merged = KmvSketch
        .mergeStatesArrays(adj.join(prev, Seq("u")), Seq("w"), col("kmv"), k)
        .select(col("w").as("v"), col("kmv"))
        .localCheckpoint(true)
      acc :+ merged
    }
    states.zipWithIndex.map { case (st, t) =>
      st.select(col("v").as("node"), lit(t).as("t"),
        size(col("kmv")).cast("long").as("n_hashes"),
        when(size(col("kmv")) >= k, element_at(col("kmv"), k))
          .otherwise(lit(null).cast("long")).as("kth_hash"),
        KmvSketch.estimate(col("kmv"), k).as("ball_est"))
    }.reduce(_.unionByName(_))
  }

  def katzBounded(
      edgesIn: DataFrame,
      src: Column,
      dst: Column,
      hops: Int = 3,
      alphaDen: Long = 8L): DataFrame = {
    require(hops >= 1 && hops <= 6, s"hops must be in [1, 6], got $hops")
    require(alphaDen >= 2L, s"alphaDen must be >= 2, got $alphaDen")
    val sym = symmetrized(edgesIn, src, dst, "katzBounded")
      .localCheckpoint(true)
    val twoP53 = 9007199254740992L
    def exactLong(c: Column, what: String): Column =
      when(c > lit(twoP53), raise_error(lit(
        s"katzBounded: $what exceeds 2^53 — shrink hops for this " +
          "graph density"))).otherwise(c).cast("long")
    val w1 = sym.groupBy(col("src")).agg(
      count(lit(1)).cast("decimal(38,0)").as("w1"))
      .select(col("src").as("node"), col("w1"))
    // ONE accumulating frame: round i recomputes the whole w-prefix
    // from the neighbor join (w1 = deg, w_j = Σ_neighbors w_{j−1}) —
    // the same recurrence for every column, so carrying w1..w_{i−1}
    // costs nothing beyond aggregate width and the old hops−1 final
    // joins on node (hops extra shuffles lining the columns up)
    // disappear entirely. Node sets agree across rounds: the graph is
    // symmetrized, so every node with an edge has walks of all lengths.
    val joined = (2 to hops).foldLeft(w1) { (prev, i) =>
      val p = prev.select(
        col("node").as("pn") +:
          (1 until i).map(j => col(s"w$j").as(s"pw$j")): _*)
      val aggs = count(lit(1)).cast("decimal(38,0)").as("w1") +:
        (2 to i).map(j =>
          sum(col(s"pw${j - 1}")).cast("decimal(38,0)").as(s"w$j"))
      sym.join(p, col("dst") === col("pn"))
        .groupBy(col("src"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("src").as("node") +: (1 to i).map(j => col(s"w$j")): _*)
    }
    val scaled = (1 to hops).map { i =>
      col(s"w$i") * lit(BigDecimal(alphaDen).pow(hops - i)).cast("decimal(38,0)")
    }.reduce(_ + _).cast("decimal(38,0)")
    val denom = math.pow(alphaDen.toDouble, hops.toDouble)
    joined.select(
      Seq(col("node")) ++
        (1 to hops).map(i => exactLong(col(s"w$i"), s"w$i").as(s"w$i")) ++
        Seq((exactLong(scaled, "the scaled score").cast("double") /
          lit(denom)).as("katz")): _*)
  }

  /** LINK PREDICTION SCORES — common-neighbor count and the
    * RESOURCE-ALLOCATION index Σ_w 1/deg(w) (Zhou, Lü & Zhang 2009;
    * the rational cousin of Adamic–Adar, chosen because 1/deg needs
    * no ln) for every non-adjacent pair with at least `minCommon`
    * shared neighbors.
    *
    * Wedge enumeration is bounded the [[triangleCounts]] way, but by
    * an EXPLICIT center-degree cap instead of orientation: wedges
    * through hubs above `maxCenterDegree` are excluded — that is part
    * of the operator's semantics (oracles replay it), not a silent
    * truncation, and it is principled for RA specifically: a hub
    * center contributes only 1/deg ≤ 1/cap to the score while
    * generating deg² wedge rows.
    *
    * The per-pair reduction happens FIRST, as one partial-aggregable
    * groupBy, and only the tiny ≥ `minCommon` survivor set meets the
    * adjacency anti-join (adjacency removal drops whole pairs, so the
    * order is semantics-free): at sf1 the previous shape pushed 110M
    * wedge rows through the anti-join and a (u,v) window to keep 74k
    * pairs. The RA sum stays hash-exact WITHOUT an ordered fold by
    * exact rational arithmetic: Σ 1/deg = (Σ LCM/deg) / LCM with
    * LCM = lcm(1..maxCenterDegree), every LCM/deg an exact
    * decimal(38,0) integer, and ONE pinned double division at the
    * end — order-free, so the map-side combine is fully exact. When
    * the cap is so large that LCM·cap overflows decimal(38,0)
    * (cap ≳ 80), the operator falls back to the ordered-window fold.
    *
    * Output per surviving pair (a < b):
    * (a, b, common_neighbors, ra_index).
    */
  def linkPrediction(
      edgesIn: DataFrame,
      src: Column,
      dst: Column,
      minCommon: Int = 2,
      maxCenterDegree: Int = 64): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2, got $maxCenterDegree")
    val sym = symmetrized(edgesIn, src, dst, "linkPrediction")
      .localCheckpoint(true)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("c"), col("d"))
    val centers = deg.filter(col("d") <= maxCenterDegree)
    val e1 = sym.select(col("src").as("u"), col("dst").as("w"))
    val e2 = sym.select(col("src").as("w2"), col("dst").as("v"))
    val wedges = e1
      .join(centers, col("w") === col("c"))
      .join(e2, col("w") === col("w2") && col("u") < col("v"))
      .select(col("u"), col("v"), col("w"), col("d"))
    val canon = sym.filter(col("src") < col("dst"))
      .select(col("src").as("ea"), col("dst").as("eb"))
    val lcm = (1 to maxCenterDegree)
      .foldLeft(BigInt(1))((l, i) => l / l.gcd(BigInt(i)) * i)
    if (lcm * maxCenterDegree < BigInt(10).pow(38)) {
      // exact-rational path: aggregate all wedges per pair (map-side
      // combinable — no ordered fold needed), THEN filter + anti-join.
      // The per-row addend LCM/deg is split into two LONG halves
      // (high = value >> shift, low = the shifted-off bits) summed as
      // plain longs — measured ~35% faster than a decimal(38,0)
      // aggregation buffer over the 117M-row (sf1) wedge stream — and
      // reassembled EXACTLY in decimal once per surviving pair.
      // The shift BALANCES the halves (≈ bitLength/2), so each sum
      // provably fits int64 for any pair with at most
      // 2^(62−max(shift, bitLength−shift)) common neighbors — ~2^17
      // at the default cap 64 — and a pair beyond that raises loudly
      // below instead of wrapping (an earlier variant sized the shift
      // against cap·addend, which bounds ONE addend, not the per-pair
      // addend COUNT — that is the uncapped endpoint degree).
      val shift = (lcm.bitLength + 1) / 2
      val mask = (BigInt(1) << shift) - 1
      val maxAddends = 1L << math.max(0, 62 - math.max(shift, lcm.bitLength - shift))
      val qArr = typedLit((1 to maxCenterDegree).map(d => ((lcm / d) >> shift).toLong))
      val rArr = typedLit((1 to maxCenterDegree).map(d => ((lcm / d) & mask).toLong))
      // the per-pair reduction is where the plan lives or dies at
      // scale: the wedge stream has ~1.07 rows per DISTINCT pair
      // (measured 117M rows / 109M pairs at sf1), so map-side partial
      // aggregation cannot shrink anything and its per-task hash map
      // over input-partition-sized slices only spills. An explicit
      // fine-grained repartition on the group keys moves the raw
      // (u, v, d) rows once and lets each small partition aggregate
      // completely in memory — 16.6 s → 9.1 s for the wedge stage at
      // sf1 under the 8 GiB bench heap. ×4 the session grain keeps
      // per-task agg state ~quarter-sized at any cluster scale.
      val aggParts = 4 * wedges.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt
      wedges
        .repartition(aggParts, col("u"), col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(qArr, col("d").cast("int"))).as("sq"),
          sum(element_at(rArr, col("d").cast("int"))).as("sr"))
        .filter(col("cn") >= minCommon)
        .join(canon,
          col("u") === col("ea") && col("v") === col("eb"), "left_anti")
        .select(col("u").as("a"), col("v").as("b"),
          col("cn").as("common_neighbors"),
          when(col("cn") > lit(maxAddends), raise_error(concat(
            lit(s"linkPrediction: a pair has more than $maxAddends common " +
              "neighbors — the split-long RA sum could overflow; raise " +
              "maxCenterDegree's LCM budget or use the window fallback ("),
            col("cn"), lit(" common)"))))
            .otherwise(
              (col("sq").cast("decimal(38,0)") *
                lit((BigInt(1) << shift).toString).cast("decimal(38,0)") +
                col("sr").cast("decimal(38,0)")).cast("decimal(38,0)")
                .cast("double") / lit(lcm.toDouble)).as("ra_index"))
    } else {
      val nonAdj = wedges.join(canon,
        col("u") === col("ea") && col("v") === col("eb"), "left_anti")
      val wCum = Window.partitionBy(col("u"), col("v")).orderBy(col("w").asc)
      val wAll = Window.partitionBy(col("u"), col("v"))
      nonAdj
        .withColumn("ra", sum(lit(1.0) / col("d").cast("double"))
          .over(wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(wCum))
        .withColumn("cn", count(lit(1)).over(wAll))
        .filter(col("rn") === col("cn") && col("cn") >= minCommon)
        .select(col("u").as("a"), col("v").as("b"),
          col("cn").as("common_neighbors"), col("ra").as("ra_index"))
    }
  }

  private def symmetrized(
      edgesIn: DataFrame, src: Column, dst: Column, op: String): DataFrame = {
    def guarded(c: Column, side: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"$op: null/non-numeric $side endpoint")))
        .otherwise(c.cast("long"))
    val e0 = edgesIn.select(
      guarded(src, "src").as("src"), guarded(dst, "dst").as("dst"))
    // dedup on the CANONICAL half (a < b), then mirror: the reversed
    // copies are distinct by construction, so the shuffle-heavy
    // distinct sees half the rows the mirror-then-distinct order paid
    val canon = e0
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    canon.union(canon.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def frontierLoop(
      symIn: DataFrame,
      labels0: DataFrame,
      frontier0: DataFrame,
      maxIter: Int,
      op: String): DataFrame = {
    val sym = symIn.cache()
    // Per-round state lives as EAGER LOCAL CHECKPOINTS, rebuilt into
    // constant-size plans each round (same no-lineage-growth
    // discipline as before round 15) — but the rows stay UnsafeRows in
    // the block store end to end. The previous shape persisted
    // `df.rdd` and rebuilt with `createDataFrame(rdd, schema)`, which
    // pays an InternalRow→Row deserialization when writing the cache
    // AND a Row→InternalRow conversion on every scan of it, every
    // round (guide §1.4's df.rdd warning — the same tax the round-14
    // bloom build removed from its one-shot pass, here multiplied by
    // the iteration count).
    var labels = labels0.select(col("node"), col("label")).localCheckpoint(true)
    var frontier =
      if (frontier0 eq labels0) labels
      else frontier0.select(col("node"), col("label")).localCheckpoint(true)
    var iter = 0
    var frontierEmpty = frontier.isEmpty
    while (!frontierEmpty && iter < maxIter) {
      val f = frontier.select(col("node").as("fn"), col("label").as("fl"))
      // neighbors of the frontier hear its labels; min per neighbor
      val cand = sym.join(f, col("src") === col("fn"))
        .groupBy(col("dst").as("cn"))
        .agg(min(col("fl")).as("cl"))
      // strict improvements only — they are EXACTLY the next frontier
      val improved = labels.join(cand, col("node") === col("cn"))
        .filter(col("cl") < col("label"))
        .select(col("node"), col("cl").as("label"))
        .localCheckpoint(true)
      frontierEmpty = improved.isEmpty
      if (!frontierEmpty) {
        val imp = improved.select(col("node").as("un"), col("label").as("ul"))
        val next = labels
          .join(imp, col("node") === col("un"), "left")
          .select(col("node"), coalesce(col("ul"), col("label")).as("label"))
          .localCheckpoint(true) // materialized before releasing inputs
        PartitionedCheckpoint.release(labels)
        if (frontier ne labels) PartitionedCheckpoint.release(frontier)
        labels = next
        frontier = improved
      } else {
        PartitionedCheckpoint.release(improved)
        if (frontier ne labels) PartitionedCheckpoint.release(frontier)
      }
      iter += 1
    }
    require(frontierEmpty,
      s"$op: not converged after $maxIter rounds " +
        "(component diameter exceeds maxIter)")
    val out = labels
      .select(col("node"), col("label").as("component"))
      .localCheckpoint(true)
    PartitionedCheckpoint.release(labels)
    sym.unpersist()
    out
  }

  /** DEGREE ASSORTATIVITY (Newman 2002) — the Pearson correlation of
    * endpoint degrees over the edges of the simple undirected graph:
    * positive = hubs link to hubs (social nets), negative = hubs link
    * to leaves (infrastructure/bipartite-ish). Degrees are one
    * aggregation over the symmetrized edge list; the correlation runs
    * over each DIRECTED orientation (the standard symmetric
    * formulation) with six exact decimal(38,0) sufficient statistics
    * and a pinned closed form — hash-exact. Output: one row
    * (n_nodes, n_edges, r) — r null for degenerate graphs (all
    * degrees equal).
    */
  def degreeAssortativity(
      edges: DataFrame,
      src: Column,
      dst: Column): DataFrame = {
    val sym = symmetrized(edges, src, dst, "degreeAssortativity")
      .localCheckpoint(true) // degree agg + edge join below
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val joined = sym
      .join(deg.select(col("src").as("ja"), col("deg").as("da")),
        col("src") === col("ja"))
      .join(deg.select(col("src").as("jb"), col("deg").as("db")),
        col("dst") === col("jb"))
    val d19 = "decimal(19,0)"
    def s38(c: Column) = sum(c.cast(d19)).cast("decimal(38,0)")
    val st = joined.agg(
      count(lit(1)).as("m2"), // both orientations
      s38(col("da")).as("sa"), s38(col("db")).as("sb"),
      s38(col("da").cast(d19) * col("db").cast(d19)).as("sab"),
      s38(col("da").cast(d19) * col("da").cast(d19)).as("saa"),
      s38(col("db").cast(d19) * col("db").cast(d19)).as("sbb"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
    def dbl(n: String) = col(n).cast("double")
    val mD = col("m2").cast("double")
    val va = mD * dbl("saa") - dbl("sa") * dbl("sa")
    val vb = mD * dbl("sbb") - dbl("sb") * dbl("sb")
    val cov = mD * dbl("sab") - dbl("sa") * dbl("sb")
    st.select(
      col("n_nodes"),
      expr("m2 div 2").as("n_edges"),
      when(va > 0.0 && vb > 0.0, cov / (sqrt(va) * sqrt(vb)))
        .otherwise(lit(null).cast("double")).as("r"))
  }

  /** RICH-CLUB COEFFICIENTS (Zhou & Mondragón 2004) — for each
    * threshold k: among the nodes of degree > k, the fraction of
    * possible edges realized, φ(k) = 2·E_k / (n_k·(n_k−1)). A rising
    * φ(k) = an elite core that over-connects internally. All
    * thresholds evaluate in ONE conditional aggregation over the
    * degree-joined edge list (ks are plan literals) — exact integers,
    * one pinned division per k. Output per k:
    * (k, n_nodes, n_club_edges, phi) — phi null when n_k < 2.
    */
  def richClub(
      edges: DataFrame,
      src: Column,
      dst: Column,
      ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty, "richClub: need at least one threshold")
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = symmetrized(edges, src, dst, "richClub")
      .localCheckpoint(true)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val joined = sym
      .join(deg.select(col("src").as("ja"), col("deg").as("da")),
        col("src") === col("ja"))
      .join(deg.select(col("src").as("jb"), col("deg").as("db")),
        col("dst") === col("jb"))
      // each undirected club edge counted once
      .filter(col("src") < col("dst"))
    val edgeAggs = ks.map(k =>
      sum(when(col("da") > k && col("db") > k, 1L).otherwise(0L)).as(s"e_$k"))
    val nodeAggs = ks.map(k =>
      sum(when(col("deg") > k, 1L).otherwise(0L)).as(s"n_$k"))
    val eRow = joined.agg(edgeAggs.head, edgeAggs.tail: _*)
    val nRow = deg.agg(nodeAggs.head, nodeAggs.tail: _*)
    val one = eRow.crossJoin(broadcast(nRow))
    val rows = ks.map { k =>
      struct(lit(k).as("k"), col(s"n_$k").as("n_nodes"),
        col(s"e_$k").as("n_club_edges"),
        when(col(s"n_$k") >= 2L,
          lit(2.0) * col(s"e_$k").cast("double")
            / (col(s"n_$k").cast("double")
              * (col(s"n_$k").cast("double") - lit(1.0))))
          .otherwise(lit(null).cast("double")).as("phi"))
    }
    one.select(explode(array(rows: _*)).as("e"))
      .select(col("e.k"), col("e.n_nodes"), col("e.n_club_edges"), col("e.phi"))
  }

  /** GLOBAL CLUSTERING COEFFICIENT — the wedge-closure ratio
    * C = 3·triangles / wedges with wedges = Σ_v deg_v·(deg_v−1)/2:
    * how much of the graph's neighbour structure closes into
    * triangles. Triangle mass reuses [[triangleCounts]]'s
    * degree-ordered O(E^1.5) enumeration (Σ per-node counts = 3·T);
    * wedges are one aggregation over degrees. Exact integers, one
    * pinned division. Output: one row
    * (n_nodes, n_edges, triangles, wedges, gcc) — gcc null when the
    * graph has no wedges.
    */
  def globalClustering(
      edges: DataFrame,
      src: Column,
      dst: Column): DataFrame = {
    val sym = symmetrized(edges, src, dst, "globalClustering")
      .localCheckpoint(true)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val degStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(col("deg").cast("decimal(19,0)") * (col("deg") - 1).cast(
        "decimal(19,0)")).cast("decimal(38,0)").as("w2"))
    val triTotal = triangleCounts(sym, col("src"), col("dst"))
      .agg(coalesce(sum(col("tri_n")), lit(0L)).as("tri3"))
    degStats.crossJoin(broadcast(triTotal)).select(
      col("n_nodes"), col("n_edges"),
      expr("tri3 div 3").as("triangles"),
      (col("w2") / 2).cast("decimal(38,0)").as("wedges"),
      when(col("w2") > 0,
        col("tri3").cast("double") / (col("w2").cast("double") / lit(2.0)))
        .otherwise(lit(null).cast("double")).as("gcc"))
  }
}

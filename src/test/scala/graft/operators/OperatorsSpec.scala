package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Correctness of the hash-family operators (no SQL oracle exists for
  * xxhash64-based sketches) against exact baselines + algebraic facts.
  */
class OperatorsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet").cache()

  test("exact dedup: identical texts collapse to one survivor") {
    import spark.implicits._
    val withDup = docs.select($"doc_id", $"text")
      .union(docs.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val survivors = Dedup.exact(withDup, $"text", $"doc_id")
    assert(survivors.count() == docs.count()) // every text now has 2 copies
    assert(survivors.agg(sum(when($"n_copies" === 2, 1).otherwise(0))).first().getLong(0) == docs.count())
    // survivor is always the min id (the original)
    assert(survivors.filter($"survivor_id" >= 1000000).count() == 0)
  }

  test("minhash-LSH pairs: high-similarity recall vs exact jaccard") {
    import spark.implicits._
    val exact = Dedup.ngramJaccardPairs(docs, $"text", $"doc_id", n = 3, threshold = 0.3)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val mh = Dedup.minhashLshPairs(docs, $"text", $"doc_id", n = 3, threshold = 0.3)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every minhash pair is verified with EXACT jaccard → must agree
    mh.foreach { case (k, j) => assert(exact.contains(k) && math.abs(exact(k) - j) < 1e-12) }
    // pairs at jaccard ≥ 0.5 collide in some band w.h.p. (16 bands × 4
    // rows: p = 1-(1-j^4)^16 ≥ 0.93 at j=0.5) — require full recall of
    // the strong pairs on this corpus
    val strong = exact.filter(_._2 >= 0.5).keySet
    assert(strong.subsetOf(mh.keySet),
      s"minhash missed strong pairs: ${strong -- mh.keySet}")
  }

  test("simhash: identical docs at hamming 0; near-dups under small hamming") {
    import spark.implicits._
    val withDup = docs.limit(50).select($"doc_id", $"text")
      .union(docs.limit(50).select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val pairs = Dedup.simhashPairs(withDup, $"text", $"doc_id", maxHamming = 0)
    val selfPairs = pairs.filter($"id_b" - $"id_a" === 1000000).count()
    assert(selfPairs == 50, s"expected 50 identical-doc pairs, got $selfPairs")
  }

  // Perturbed copies of one base text: signature distances land across
  // the 0..6 radius, including 4..6 where the round-1 fixed 4×16-band
  // layout was NOT pigeonhole-complete.
  private def perturbedDocs = {
    import spark.implicits._
    val base = docs.orderBy("doc_id").limit(1).collect().head.getAs[String]("text")
    (0 until 40).map { i =>
      (i.toLong, base + (" zq" + (i % 13)) * (i % 5) + (" wx" + (i % 7)) * (i / 8))
    }.toDF("doc_id", "text")
  }

  test("prefix-filtered Jaccard pairs equal brute force on random corpora") {
    import spark.implicits._
    // small vocab forces heavy shingle sharing — the adversarial case
    // for prefix selection and the positional bound
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 0 until 3) {
      val docs = (0 until 30).map { i =>
        val len = 3 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      for (t <- Seq(0.3, 0.6)) {
        def shingleSet(s: String): Set[String] = {
          val toks = s.split(" ").toSeq
          if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
          else Set(toks.mkString(" "))
        }
        val expected = (for {
          (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
          sa = shingleSet(ta); sb = shingleSet(tb)
          j = (sa & sb).size.toDouble / (sa | sb).size.toDouble if j >= t
        } yield (ia, ib, j)).toSet
        val got = Dedup.ngramJaccardPairs(df, $"text", $"doc_id", n = 3, threshold = t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got == expected,
          s"trial=$trial t=$t: missing ${expected -- got}, extra ${got -- expected}")
      }
    }
  }

  test("simhash banding is complete at the configured radius (xxhash64 kernel)") {
    import spark.implicits._
    val d = perturbedDocs
    val sigs = d.select($"doc_id", Dedup.simhash($"text").as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 6
    } yield (a, b, h)).toSet
    val got = Dedup.simhashPairs(d, $"text", $"doc_id", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, s"banded pairs != brute force: missing ${expected -- got}, extra ${got -- expected}")
    // the regression the fix targets: distances 4..6 exist AND are found
    val midRadius = expected.filter(p => p._3 >= 4 && p._3 <= 6)
    assert(midRadius.nonEmpty, "test corpus produced no distance-4..6 pairs; strengthen perturbations")
    assert(midRadius.subsetOf(got))
  }

  test("native PortableSimHash60 kernel is bit-equal to the Column formulation") {
    import spark.implicits._
    val corpus = docs.select($"text")
      .union(Seq("", "one", "a  b\t c", "é ✓ unicode").toDF("text"))
    val both = corpus
      .select(TextAnalysis.tokens($"text").as("toks"))
      .select(
        graft.functions.GraftFunctions.simhash60($"toks").as("fast"),
        Dedup.portableSimhashAcc($"toks").as("acc"))
      .select($"fast", Dedup.portableSimhashFromAcc($"acc").as("hof"))
    assert(both.filter($"fast" =!= $"hof").count() == 0)
  }

  test("portable simhash pairs equal brute force over portable signatures") {
    import spark.implicits._
    val d = perturbedDocs
    val sigs = d
      .select($"doc_id", graft.operators.TextAnalysis.tokens($"text").as("toks"))
      .select($"doc_id", Dedup.portableSimhashAcc($"toks").as("acc"))
      .select($"doc_id", Dedup.portableSimhashFromAcc($"acc").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.values.forall(s => s >= 0 && s < (1L << 60))) // 60-bit range
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 6
    } yield (a, b, h)).toSet
    val got = Dedup.simhashPairsPortable(d, $"text", $"doc_id", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("embedding cosine pairs: symmetric, bounded, matches manual calc") {
    import spark.implicits._
    // lshBits = 0 is the EXPLICIT all-pairs opt-in (exact baseline)
    val pairs = Dedup.embeddingCosinePairs(embs, $"embedding", $"vec_id", threshold = 0.35,
      lshBits = 0)
    val rows = pairs.collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.35 && r.getDouble(2) <= 1.0))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    // manual check of one pair
    if (rows.nonEmpty) {
      val r = rows.head
      val v = embs.filter($"vec_id".isin(r.getLong(0), r.getLong(1)))
        .orderBy($"vec_id").collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      val dot = v(0).zip(v(1)).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(v(0).map(x => x * x).sum) * math.sqrt(v(1).map(x => x * x).sum))
      assert(math.abs(cos - r.getDouble(2)) < 1e-9)
    }
  }

  test("bucketed embedding pairs: sound vs all-pairs, high recall, no cross join") {
    import spark.implicits._
    val exact = Dedup.embeddingCosinePairs(embs, $"embedding", $"vec_id", threshold = 0.35,
      lshBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.embeddingCosinePairs(embs, $"embedding", $"vec_id",
      threshold = 0.35, lshBits = 4, tables = 32)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // soundness: every bucketed pair is a true pair with the true cosine
    got.foreach { case (k, c) => assert(exact.contains(k) && exact(k) == c) }
    // recall: the 32-table amplification recovers nearly all pairs
    val recall = got.size.toDouble / math.max(exact.size, 1)
    info(f"bucketed cosine-pair recall = $recall%.3f (bits=4, tables=32)")
    assert(recall >= 0.85, f"recall $recall%.3f too low")
    // the graded plan must not contain an unbucketed cross join
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "bucketed path planned a cross join")
  }

  test("embeddingCosinePairs DEFAULT plan is bucketed — all-pairs is opt-in only") {
    import spark.implicits._
    val default = Dedup.embeddingCosinePairs(embs, $"embedding", $"vec_id", threshold = 0.35)
    val plan = default.queryExecution.executedPlan.toString
    assert(plan.contains("graft_hyperplane_buckets"),
      "default call did not take the LSH-bucketed path")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "default call planned an unbucketed self-join")
  }

  test("NearestCentroids kernel matches brute-force ranking incl. ties and NaN") {
    import spark.implicits._
    val cents: Seq[Seq[Double]] = Seq(
      Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0), Seq(2.0, 0.0) /* tie with cid 1 */)
    val vecs = Seq(
      1L -> Seq(3.0, 0.1),   // nearest cid 1, tie between 1 and 4 broken to 1
      2L -> Seq(0.1, 5.0),   // nearest cid 2
      3L -> Seq(-1.0, -0.1), // nearest cid 3
      4L -> Seq(0.0, 0.0))   // zero vector: all NaN → ranks by cid asc
    val got = vecs.toDF("id", "v")
      .select($"id",
        graft.functions.GraftFunctions.nearestCentroids($"v", typedLit(cents), 3).as("cids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.toMap.map { case (id, v) =>
      id -> cents.zipWithIndex
        .map { case (c, i) => (i + 1, { val s = cos(v, c); if (s.isNaN) Double.NegativeInfinity else s }) }
        .sortBy { case (cid, s) => (-s, cid) }.take(3).map(_._1)
    }
    assert(got == expected)
    assert(got(4L) == Seq(1, 2, 3)) // NaN everywhere → deterministic cid-asc order
    // codegen actually engages (no fallback to interpreted eval)
    val plan = vecs.toDF("id", "v")
      .select(graft.functions.GraftFunctions.nearestCentroids($"v", typedLit(cents), 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_nearest_centroids"))
  }

  test("NearestCentroidsL2 kernel matches brute-force argmin incl. ties, NaN, corrupt inputs") {
    import spark.implicits._
    val cents: Seq[Seq[Double]] = Seq(
      Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0) /* duplicate: tie with cid 1 */,
      Seq(10.0, 10.0))
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map(i => i -> Seq(rnd.nextGaussian() * 3, rnd.nextGaussian() * 3)) ++
      Seq(98L -> Seq(1.0, 0.0) /* exact centroid hit, tie 1 vs 3 → 1 */,
        99L -> Seq(Double.NaN, 0.0) /* NaN element → all dists NaN → cid asc */)
    val got = vecs.toDF("id", "v")
      .select($"id",
        graft.functions.GraftFunctions.nearestCentroidsL2($"v", typedLit(cents), 2).as("cids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // local replay of the kernel's exact decomposition
    def d2(a: Seq[Double], b: Seq[Double]): Double = {
      val aa = a.map(x => x * x).sum
      val ab = a.zip(b).map { case (x, y) => x * y }.sum
      val bb = b.map(x => x * x).sum
      val d = aa - 2.0 * ab + bb
      if (d.isNaN) Double.PositiveInfinity else d
    }
    vecs.foreach { case (id, v) =>
      val want = cents.zipWithIndex
        .map { case (c, i) => (i + 1, d2(v, c)) }
        .sortBy { case (cid, d) => (d, cid) }.take(2).map(_._1)
      assert(got(id) == want, s"id $id: ${got(id)} vs $want")
    }
    assert(got(98L) == Seq(1, 3)) // duplicate-centroid tie → smaller cid first
    assert(got(99L) == Seq(1, 2)) // corrupt vector → deterministic cid-asc
    // wrong-dimension centroid ranks worst, never crashes
    val mixed: Seq[Seq[Double]] = Seq(Seq(0.0, 0.0), Seq(1.0))
    val m = Seq(1L -> Seq(5.0, 5.0)).toDF("id", "v")
      .select(graft.functions.GraftFunctions.nearestCentroidsL2($"v", typedLit(mixed), 2))
      .collect().head.getSeq[Int](0)
    assert(m == Seq(1, 2))
    // codegen engages
    val plan = vecs.toDF("id", "v")
      .select(graft.functions.GraftFunctions.nearestCentroidsL2($"v", typedLit(cents), 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_nearest_centroids_l2"))
  }

  test("IVF index build has no full-corpus exchange (map-side cell assignment)") {
    import spark.implicits._
    val queries = embs.filter($"vec_id" < 5)
    val ivf = Similarity.ivfTopK(embs, queries,
      $"embedding", $"vec_id", $"embedding", $"vec_id", k = 3, nlist = 8, nprobe = 2)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("graft_nearest_centroids"),
      "cell assignment did not use the map-side kernel")
    // the only exchanges left are the candidate join + dedup + final
    // top-k agg; the old plan additionally aggregated the VECTORS
    // through first(cv)/first(qv) per assignCells call — one full-corpus
    // (id, vector) exchange each (dropDuplicates' first(cosine) over
    // scalar scores is fine and expected)
    val exchanges = "Exchange".r.findAllIn(plan).size
    info(s"ivfTopK plan has $exchanges Exchange nodes")
    assert(!plan.contains("first(cv") && !plan.contains("first(qv"),
      "plan still aggregates vectors through first() — assignment not map-side")
  }

  test("TopKByScore binary-insert reduce/merge matches naive sort at k=500") {
    val k = 500
    val agg = new TopKByScore(k)
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Double, Long)] = (1 to 3000).map { i =>
      val s = rnd.nextInt(5) match {
        case 0 => Double.NaN // NaN ranks worst, deterministically
        case 1 => rnd.nextInt(10).toDouble // force score ties
        case _ => rnd.nextDouble()
      }
      (s, i.toLong)
    }
    def rank(x: Double) = if (x.isNaN) Double.NegativeInfinity else x
    val expected = rows.sortBy { case (s, id) => (-rank(s), id) }.take(k)
    // single-buffer reduce path
    val reduced = rows.foldLeft(agg.zero)(agg.reduce).items
    assert(reduced.map { case (s, id) => (rank(s), id) } ==
      expected.map { case (s, id) => (rank(s), id) })
    // merge path over random partition splits
    val parts = rows.grouped(137).map(p => p.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge).items
    assert(merged.map { case (s, id) => (rank(s), id) } ==
      expected.map { case (s, id) => (rank(s), id) })
  }

  test("sortedOverlap detects unsorted input instead of undercounting") {
    import spark.implicits._
    // the descent (5 → 1 in `a`) sits at a position the merge scan
    // actually walks — descents past the shorter array's exhaustion
    // point are documented as undetectable
    val bad = Seq((Seq(5L, 1L, 9L), Seq(4L, 5L, 6L))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(graft.functions.GraftFunctions.sortedOverlap($"a", $"b")).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(ex).exists(_.contains("sorted-ascending")))
    // null slots would read as phantom 0Ls and match each other —
    // detected loudly like disorder, never a silently inflated count
    val withNull = Seq((Seq[java.lang.Long](null, 5L), Seq[java.lang.Long](null, 5L)))
      .toDF("a", "b")
    val exNull = intercept[Exception] {
      withNull.select(graft.functions.GraftFunctions.sortedOverlap($"a", $"b")).collect()
    }
    assert(rootMessages(exNull).exists(_.contains("non-null")))
  }

  test("hashedShingles joins null tokens exactly like concat_ws (skip, no separator)") {
    import spark.implicits._
    // concat_ws(' ', ['a', NULL, 'b']) = "a b" — the kernel must hash
    // the same bytes, not "a  b" from an empty-string join
    val df = Seq(Seq[String]("alpha", null, "beta", "gamma")).toDF("toks")
    val pair = df.select(
      sort_array(graft.functions.GraftFunctions.shingles($"toks", 3)).as("fast"),
      sort_array(transform(TextAnalysis.shinglesFromTokens($"toks", 3), s => xxhash64(s)))
        .as("hof")).first()
    assert(pair.getSeq[Long](0) == pair.getSeq[Long](1),
      s"null-token shingle hashes diverge: ${pair.getSeq[Long](0)} vs ${pair.getSeq[Long](1)}")
  }

  test("LSH top-k recall vs brute force is usable on unclustered data") {
    import spark.implicits._
    val queries = embs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(embs, queries,
      $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5)
      .select($"query_id", $"corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uniform random vectors are LSH's worst case (no cluster structure:
    // "neighbors" sit at cosine ~0.3 where sign-hash collision odds are
    // barely better than chance) — amplify with more, shorter tables
    val lsh = Similarity.lshTopK(embs, queries,
      $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5, bits = 4, tables = 16)
      .select($"query_id", $"corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.2f (bits=4, tables=16)")
    assert(recall >= 0.5, f"recall $recall%.2f too low")
    // LSH results are a subset of valid cosines, correctly ranked
    assert(lsh.forall { case (q, c) => q != c })
  }

  test("knnGraph: sound self-KNN edges (no self loops, ≤ k per node) with usable recall") {
    import spark.implicits._
    val k = 5
    val rows = Similarity.knnGraph(embs, $"embedding", $"vec_id", k = k, bits = 4, tables = 32)
      .collect()
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.values.forall(_.length <= k), "a node over-emitted past k")
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "self edge emitted")
    // ranks are 1..n per source, cosine non-increasing
    bySrc.values.foreach { edges =>
      val byRank = edges.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length).toSeq)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3); case _ => true
      })
    }
    val brute = Similarity.bruteForceTopK(embs, embs,
      $"embedding", $"vec_id", $"embedding", $"vec_id", k = k)
      .select($"query_id", $"corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    info(f"knnGraph recall@5 = $recall%.2f (bits=4, tables=32)")
    assert(recall >= 0.5, f"knnGraph recall $recall%.2f too low")
  }

  test("cluster resolution: chains collapse to the min id; invariants hold") {
    import spark.implicits._
    // a 4-chain, a 2-clique pair, and a singleton-free graph
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b").withColumn("jaccard", lit(1.0))
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // real pairs from the corpus: every doc maps to a cluster_id <= its id,
    // and every cluster_id is itself a member of the cluster
    val corpus = Dedup.ngramJaccardPairs(docs, $"text", $"doc_id", n = 3, threshold = 0.3)
    val cl = Dedup.clusters(corpus)
    assert(cl.filter($"cluster_id" > $"doc_id").count() == 0)
    val ids = cl.select("doc_id").collect().map(_.getLong(0)).toSet
    val clusterIds = cl.select("cluster_id").collect().map(_.getLong(0)).toSet
    assert(clusterIds.subsetOf(ids))
  }

  test("clusters: local union-find fast path == distributed loop, row for row") {
    import spark.implicits._
    // random-ish multi-component graph incl. a diameter-9 chain, dup
    // and reversed pairs — everything that could diverge between the
    // driver union-find and min-label propagation
    val pairs = (
      (0L until 9L).map(i => (i, i + 1)) ++           // chain
        Seq((20L, 21L), (21L, 20L), (20L, 21L)) ++    // dup + reversed
        Seq((30L, 32L), (31L, 32L), (33L, 31L)) ++    // star-ish
        Seq((40L, 41L))
      ).toDF("id_a", "id_b")
    val local = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.clusters(pairs, localPairCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    assert(local(9L) == 0L && local(33L) == 30L && local(41L) == 40L)
  }

  test("split assignment is deterministic and roughly proportioned") {
    import spark.implicits._
    val a = docs.select($"doc_id", Dedup.splitAssign($"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.orderBy($"doc_id".desc).select($"doc_id", Dedup.splitAssign($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // order/partitioning independent
    val frac = a.values.count(_ == "test").toDouble / a.size
    assert(frac > 0.02 && frac < 0.35, s"test fraction $frac implausible for 2/16")
  }

  test("native TokenizeWords expression equals the regex/HOF formulation") {
    import spark.implicits._
    val both = docs.select(
      TextAnalysis.tokens($"text").as("fast"),
      TextAnalysis.tokensHof($"text").as("hof"))
    assert(both.filter(not($"fast" === $"hof")).count() == 0)
    // unicode sanity beyond the corpus — incl. letter-LIKE numerics
    // (Ⅻ = Nl, ² = No): both formulations must split on them (the
    // kernel's isLetterOrDigit admits Nd only, and tokensHof's regex
    // says \p{Nd} to match — a \p{N} there would diverge), and
    // supplementary-plane letters (𐐷) must survive as tokens
    val exotic = Seq("Héllo wörld 123", "  a--b  ", "", "日本語 test", "ALL CAPS",
      "xⅫy a²b", "𐐷ok 𝒜𝓑")
      .toDF("text")
      .select(TextAnalysis.tokens($"text").as("fast"), TextAnalysis.tokensHof($"text").as("hof"))
    assert(exotic.filter(not($"fast" === $"hof")).count() == 0)
  }

  test("native HashedShingles kernel is bit-equal to xxhash64 over string shingles") {
    import spark.implicits._
    val corpus = docs.select($"text")
      .union(Seq("", "one", "one two", "one two three four é ✓", "a  b\t c").toDF("text"))
    val both = corpus
      .select(TextAnalysis.tokens($"text").as("toks"))
      .select(
        sort_array(graft.functions.GraftFunctions.shingles($"toks", 3)).as("fast"),
        sort_array(transform(TextAnalysis.shinglesFromTokens($"toks", 3), s => xxhash64(s))).as("hof"))
    assert(both.filter(not($"fast" === $"hof")).count() == 0)
    // and minhash-from-hashes equals minhash-from-strings
    val sigs = corpus
      .select(TextAnalysis.tokens($"text").as("toks"))
      .select(
        graft.functions.GraftFunctions.minhashFromHashes(
          graft.functions.GraftFunctions.shingles($"toks", 3), 64).as("fast"),
        Dedup.minhashSignature(TextAnalysis.shinglesFromTokens($"toks", 3), 64).as("hof"))
    assert(sigs.filter(not($"fast" === $"hof")).count() == 0)
  }

  test("native HyperplaneBuckets is bit-equal to the per-seed HOF buckets") {
    import spark.implicits._
    val v = $"embedding".cast("array<double>")
    val both = embs.select(
      graft.functions.GraftFunctions.hyperplaneBuckets(v, 4, 8).as("fast"),
      array((0 until 8).map(t => Similarity.hyperplaneBucket(v, 4, seed = t)): _*).as("hof"))
    assert(both.filter(not($"fast" === $"hof")).count() == 0)
  }

  test("native CosineSimilarity expression is bit-equal to the HOF formulation") {
    import spark.implicits._
    val pairs = embs.as("a").crossJoin(embs.as("b"))
      .filter($"a.vec_id" < $"b.vec_id").limit(5000)
      .select(
        Similarity.cosine($"a.embedding".cast("array<double>"), $"b.embedding".cast("array<double>")).as("fast"),
        Similarity.cosineHof($"a.embedding".cast("array<double>"), $"b.embedding".cast("array<double>")).as("hof"))
    // bit-equality, not epsilon — both must fold left-to-right
    assert(pairs.filter($"fast" =!= $"hof").count() == 0)
    // and the plan really uses the native expression inside codegen
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("graft_cosine"))
  }

  test("vector kernels match their HOF twins on corrupt inputs (null element, empty, ragged)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, null, 3.0)), // null element
      (3L, Seq.empty[java.lang.Double]), // empty
      (4L, Seq[java.lang.Double](0.0, 0.0, 0.0)), // zero vector (NaN cosine)
      (5L, Seq[java.lang.Double](2.0, 1.0)), // ragged vs dim 3
      (6L, Seq[java.lang.Double](1.0, Double.NaN, 2.0))) // NaN element
      .toDF("vec_id", "v")
    // cosine: null element and ragged pair → NULL like the HOF (a
    // corrupted vector must not produce a plausible score). Zero-norm
    // vectors are excluded from the HOF comparison: under ANSI mode
    // (Spark 4 default) the HOF's SQL division throws DIVIDE_BY_ZERO
    // there, while the kernel's Java division yields NaN — pinned
    // kernel-only below (and ranked-worst by TopKByScore's NaN test)
    val nonZero = rows.filter($"vec_id".isin(1L, 2L, 5L))
    val pairs = nonZero.as("a").crossJoin(nonZero.as("b"))
      .select(
        Similarity.cosine($"a.v", $"b.v").as("fast"),
        Similarity.cosineHof($"a.v", $"b.v").as("hof"))
    assert(pairs.filter(
      ($"fast".isNull && $"hof".isNotNull) ||
        ($"fast".isNotNull && $"hof".isNull) ||
        ($"fast" =!= $"hof")).count() == 0)
    val zeroish = rows.filter($"vec_id".isin(3L, 4L))
    val nan = zeroish.as("a").crossJoin(zeroish.as("b"))
      .filter($"a.vec_id" === $"b.vec_id") // same-dim pairs: empty×empty, zero×zero
      .select(Similarity.cosine($"a.v", $"b.v").as("fast"))
    assert(nan.count() == 2 && nan.filter(isnan($"fast")).count() == 2)
    // hyperplane buckets: empty and null-element vectors land in bucket
    // 0 of every table, exactly like the HOF's null dot → otherwise(0L);
    // a NaN element gives a NaN dot, which must mean "bit clear" on
    // BOTH paths (Spark SQL's NaN >= 0 is true — the HOF guards with
    // !isnan to match the kernel's Java comparison)
    val hb = rows.select(
      graft.functions.GraftFunctions.hyperplaneBuckets($"v", 4, 8).as("fast"),
      array((0 until 8).map(t => Similarity.hyperplaneBucket($"v", 4, seed = t)): _*).as("hof"))
    assert(hb.filter(not($"fast" === $"hof")).count() == 0)
    // minhash-from-hashes skips null slots (like minhash skips null
    // strings) instead of min-ing every lane against hash(0L)
    val mh = Seq(
      (Seq[java.lang.Long](10L, null, 20L), Seq[java.lang.Long](10L, 20L)))
      .toDF("with_null", "without")
      .select(
        graft.functions.GraftFunctions.minhashFromHashes($"with_null", 32).as("a"),
        graft.functions.GraftFunctions.minhashFromHashes($"without", 32).as("b"))
    assert(mh.filter(not($"a" === $"b")).count() == 0)
  }

  test("chunkTokens: window/overlap arithmetic, partial tails, empty docs") {
    import spark.implicits._
    def chunksOf(n: Int, window: Int, overlap: Int): Seq[Seq[String]] = {
      val toks = (0 until n).map(i => s"t$i")
      Seq(toks).toDF("toks")
        .select(TextAnalysis.chunkTokens($"toks", window, overlap).as("c"))
        .first().getSeq[scala.collection.Seq[String]](0).map(_.toSeq).toSeq
    }
    // empty doc → one empty chunk (no document silently vanishes)
    assert(chunksOf(0, 50, 10) == Seq(Seq()))
    // exactly one window
    assert(chunksOf(50, 50, 10).map(_.size) == Seq(50))
    // one token past the window → second chunk starts at stride=40 and
    // carries the 10-token overlap + the tail token
    val c51 = chunksOf(51, 50, 10)
    assert(c51.map(_.size) == Seq(50, 11))
    assert(c51(0).takeRight(10) == c51(1).take(10), "overlap region must repeat")
    assert(c51(1).last == "t50")
    // every token appears in at least one chunk; order preserved
    val c137 = chunksOf(137, 50, 10)
    assert(c137.flatten.distinct.size == 137)
    // zero overlap = exact partition
    assert(chunksOf(100, 25, 0).map(_.size) == Seq(25, 25, 25, 25))
    // NULL token array (null text) chunks like an empty doc — one empty
    // chunk, not a null-propagated vanishing document
    val nullChunks = Seq(Option.empty[Seq[String]]).toDF("toks")
      .select(TextAnalysis.chunkTokens($"toks", 50, 10).as("c"))
      .first().getSeq[scala.collection.Seq[String]](0)
    assert(nullChunks.map(_.toSeq) == Seq(Seq()))
    intercept[IllegalArgumentException](TextAnalysis.chunkTokens($"x", 10, 10))
  }

  test("stratifiedKeep is deterministic, append-stable, and rate-plausible") {
    import spark.implicits._
    val keep = graft.operators.Sampling.stratifiedKeep(
      $"lang", $"text", Map("en" -> 30, "zh" -> 100), defaultRate = 60)
    val kept = docs.withColumn("lang", lit("en")).filter(keep).select("doc_id")
    // deterministic: same rows on re-run
    assert(kept.collect().toSeq == docs.withColumn("lang", lit("en"))
      .filter(keep).select("doc_id").collect().toSeq)
    // append-stable: the kept set over HALF the corpus is exactly the
    // kept set of the full corpus restricted to that half
    val half = docs.filter($"doc_id" < 250).withColumn("lang", lit("en"))
    assert(half.filter(keep).select("doc_id").collect().map(_.getLong(0)).toSet ==
      kept.collect().map(_.getLong(0)).toSet.filter(_ < 250))
    // rate=100 keeps everything; rate plausibility at 30%
    assert(docs.withColumn("lang", lit("zh")).filter(keep).count() == docs.count())
    val frac = kept.count().toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"en rate 0.3 sampled at $frac")
  }

  test("decontaminate: overlap threshold, string ids, broadcast plan") {
    import spark.implicits._
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares 4 trigram shingles with the eval doc → contaminated at k≤4
      (1L, "alpha beta gamma delta epsilon eta"),
      // shares exactly 1 shingle → survives at k=2, drops at k=1
      (2L, "alpha beta gamma nine ten eleven"),
      (3L, "totally unrelated words here now")).toDF("doc_id", "text")
    def ids(minOverlap: Int) =
      Dedup.decontaminate(corpus, evalSet, $"text", $"doc_id", n = 3, minOverlap = minOverlap)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(1) == Set(3L))
    assert(ids(2) == Set(2L, 3L))
    assert(ids(100) == Set(1L, 2L, 3L))
    // STRING ids must work identically — a long cast would null them
    // and every contaminated doc would silently survive (fail open)
    val sCorpus = corpus.select(concat(lit("doc-"), $"doc_id").as("doc_id"), $"text")
    val sEval = evalSet.select(concat(lit("doc-"), $"doc_id").as("doc_id"), $"text")
    val sIds = Dedup.decontaminate(sCorpus, sEval, $"text", $"doc_id", n = 3, minOverlap = 1)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(sIds == Set("doc-3"), s"string ids failed open: $sIds")
    // plan: the eval-shingle join and the anti join are both broadcast
    // — the corpus is never shuffled by shingle
    val plan = Dedup.decontaminate(corpus, evalSet, $"text", $"doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("TokenizeWords is locale-independent (Turkish-I regression)") {
    import spark.implicits._
    val prev = java.util.Locale.getDefault
    try {
      // under a Turkish default locale, default-locale toLowerCase maps
      // "I" to dotless ı — the kernel must use Locale.ROOT and keep
      // bit-equality with Spark's locale-independent lower()
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val both = Seq("ID INPUT III").toDF("text")
        .select(
          TextAnalysis.tokens($"text").as("fast"),
          TextAnalysis.tokensHof($"text").as("hof"))
        .first()
      assert(both.getSeq[String](0) == Seq("id", "input", "iii"))
      assert(both.getSeq[String](0) == both.getSeq[String](1))
    } finally java.util.Locale.setDefault(prev)
  }

  test("IVF top-k: recall vs brute force at nprobe=4/16") {
    import spark.implicits._
    val queries = embs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(embs, queries,
      $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5)
      .select($"query_id", $"corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(embs, queries,
      $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5, nlist = 16, nprobe = 4)
      .select($"query_id", $"corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f (nlist=16, nprobe=4)")
    assert(recall >= 0.4, f"recall $recall%.2f too low")
  }

  test("multimodal: a custom codec swaps through the MediaCodec trait") {
    import spark.implicits._
    // a "codec" that reports byte_len as width — verifies the
    // partition-wise path drives whatever implementation is plugged in
    val fake = new Multimodal.MediaCodec {
      override def decodeOne(id: Long, bytes: Array[Byte]): Multimodal.DecodedMeta =
        Multimodal.DecodedMeta(id, width = bytes.length, height = 1, n_frames = 1,
          fingerprint = bytes.length.toLong)
    }
    val media = Multimodal.asMedia(docs.limit(10), "doc_id", "text", "text/plain")
    val got = Multimodal.decode(media, fake).collect().map(m => m.media_id -> m.width).toMap
    val expected = media.select($"media_id", $"byte_len").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }

  test("multimodal: stub decode is deterministic; frames reassemble") {
    import spark.implicits._
    val media = Multimodal.asMedia(docs.limit(20), "doc_id", "text", "text/plain").cache()
    val d1 = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(m => m.width >= 16 && m.height >= 16 && m.n_frames >= 1))
    val resized = Multimodal.resizeStub(Multimodal.decodeStub(media), maxSide = 64)
    assert(resized.agg(max($"width")).first().getInt(0) <= 64)
    // stride-1 frames concatenate back to the original payload bytes
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 1)
    val totals = frames.groupBy($"media_id").agg(sum($"frame_bytes").as("n"))
      .join(media, "media_id")
      .filter($"n" =!= $"byte_len")
    assert(totals.count() == 0)
  }

  test("keepBestPerCluster: best-quality survivor, singletons, member counts") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "aa", 0.2), (2L, "bb", 0.9), (3L, "cc", 0.9), // chain {1,2,3}: 2 wins (q tie 2<3)
      (4L, "dd", 0.1),                                   // singleton
      (5L, "ee", 0.5), (6L, "ff", 0.8))                  // pair {5,6}: 6 wins
      .toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerCluster(corpus, pairs, $"doc_id", $"q")
    try {
      val got = out.select($"doc_id", $"cluster_id", $"n_members").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq == Seq((2L, 1L, 3L), (4L, 4L, 1L), (6L, 5L, 2L)))
      // survivors keep their original columns
      assert(out.columns.toSeq == Seq("doc_id", "text", "q", "cluster_id", "n_members"))
    } finally out.unpersist()
  }

  test("keepBestPerCluster releases everything except the returned frame") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerCluster(corpus, pairs, $"doc_id", $"q")
    out.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "keepBestPerCluster leaked internal caches")
  }

  test("id/content guards: null ids and null shard content throw instead of eating rows") {
    import spark.implicits._
    val nullId = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val e1 = intercept[Exception](
      Dedup.keepBestPerCluster(nullId, pairs, $"doc_id", lit(1.0)).collect())
    assert(e1.getMessage.contains("keepBestPerCluster")
      || Option(e1.getCause).exists(_.getMessage.contains("keepBestPerCluster")))
    val e2 = intercept[Exception](
      Dedup.dedupSpans(nullId, $"text", $"doc_id", k = 2).collect())
    assert(e2.getMessage.contains("dedupSpans")
      || Option(e2.getCause).exists(_.getMessage.contains("dedupSpans")))
    val nullText = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val e3 = intercept[Exception](
      Sampling.shuffleShard(nullText, $"text", $"doc_id", numShards = 4).collect())
    assert(e3.getMessage.contains("shuffleShard")
      || Option(e3.getCause).exists(_.getMessage.contains("shuffleShard")))
    // tokenizer-abnormal BM25 terms refuse up front
    intercept[IllegalArgumentException](
      TextAnalysis.bm25Rank(nullText, $"text", $"doc_id", Seq("Spark")))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25Rank(nullText, $"text", $"doc_id", Seq("two words")))
  }

  test("unigramLogProb: hand-computed model, OOV floor, vocab truncation, empty docs") {
    import spark.implicits._
    // corpus counts: a=2, b=1, c=1, total=4
    val corpus = Seq((1L, "a a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(corpus, $"text", $"doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    val exp1 = (math.log(0.5) + math.log(0.5) + math.log(0.25)) / 3.0
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - exp1) < 1e-12)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - math.log(0.25)) < 1e-12)
    assert(got(3L)._1 == 0L && got(3L)._2.isNaN) // null logprob for empty doc
    // vocab truncation: with vocabSize=1 only 'a' (count 3) stays; b
    // (count 2) and c (count 1) both take the 1/total floor
    val c2 = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val t = TextAnalysis.unigramLogProb(c2, $"text", $"doc_id", vocabSize = 1)
      .collect().head.getDouble(2)
    val expT = (3 * math.log(3.0 / 6.0) + 3 * math.log(1.0 / 6.0)) / 6.0
    assert(math.abs(t - expT) < 1e-12)
    // id IS the document identity: rows sharing an id score as one
    // merged doc (one output row, union n_tokens, union logprob)
    val dup = Seq((7L, "a a"), (7L, "b")).toDF("doc_id", "text")
    val dr = TextAnalysis.unigramLogProb(dup, $"text", $"doc_id").collect()
    assert(dr.length == 1 && dr.head.getLong(1) == 3L)
    val expDup = (2 * math.log(2.0 / 3.0) + math.log(1.0 / 3.0)) / 3.0
    assert(math.abs(dr.head.getDouble(2) - expDup) < 1e-12)
    // null ids throw instead of silently dropping the doc
    val nid = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("doc_id", "text")
    val e = intercept[Exception](
      TextAnalysis.unigramLogProb(nid, $"text", $"doc_id").collect())
    assert(e.getMessage.contains("unigramLogProb")
      || Option(e.getCause).exists(_.getMessage.contains("unigramLogProb")))
  }

  test("bm25Rank: hand-computed scores, rank order, bounds") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark spark spark fast"),  // tf(spark)=3
      (2L, "spark slow"),              // tf(spark)=1
      (3L, "other words only here"),   // tf=0 for all terms
      (4L, ""))                        // empty doc
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25Rank(corpus, $"text", $"doc_id", Seq("spark"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // replicate the operator's exact double fold
    val n = 4.0; val df = 2.0; val totlen = 10.0; val avglen = totlen / n
    val k1 = 1.2; val b = 0.75
    def s(tf: Double, len: Double): Double =
      math.log((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * len / avglen))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L)) // score desc, ties by id
    assert(got(0)._2 == s(3.0, 4.0))
    assert(got(1)._2 == s(1.0, 2.0))
    assert(got(2)._2 == 0.0 && got(3)._2 == 0.0)
    val top1 = TextAnalysis.bm25Rank(corpus, $"text", $"doc_id", Seq("spark"), topK = 1)
    assert(top1.count() == 1)
    intercept[IllegalArgumentException](
      TextAnalysis.bm25Rank(corpus, $"text", $"doc_id", Seq.empty))
  }

  test("quantizeInt8: hand-quantized values, zero and null vectors") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "v")
      .select($"vec_id", Similarity.quantizeInt8($"v").as("q"))
      .select($"vec_id", $"q.scale".as("scale"), $"q.qvec".as("qvec"))
    val rows = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getSeq[Int](2))).sortBy(_._1)
    assert(rows(0) == ((1L, 1.0 / 127.0, Seq(127, -63, 32))))
    assert(rows(1) == ((2L, 0.0, Seq(0, 0))))
    assert(rows(2)._2 == null && rows(2)._3 == null)
  }

  test("dedupSpans: cross-doc and within-doc spans, keep-first witness, empty docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),         // first occurrence of "a b c"/"b c d" → survives intact
      (2L, "x y a b c d z"),       // shares both 3-grams → positions 2..5 removed
      (3L, "p q r"),               // unique → untouched
      (4L, ""),                    // empty → 0/0
      (5L, "m n o m n o m"),       // within-doc repeats: dup starts (5,3)/(5,4) cover 3..6
      (6L, "m n o m n o m"))       // exact dup of 5: fully removed (5 holds the firsts)
      .toDF("doc_id", "text")
    val got = Dedup.dedupSpans(corpus, $"text", $"doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("a b c d e f", 6L, 0L)))
    assert(got(2L) == (("x y z", 3L, 4L)))
    assert(got(3L) == (("p q r", 3L, 0L)))
    assert(got(4L) == (("", 0L, 0L)))
    assert(got(5L) == (("m n o", 3L, 4L)))
    assert(got(6L) == (("", 0L, 7L)))
    // keepFirst=false: ALL occurrences go, including doc 1's originals
    val all = Dedup.dedupSpans(corpus, $"text", $"doc_id", k = 3, keepFirst = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "e f")
    assert(all(5L) == "")
  }

  test("repetition metrics: hand-computed fractions, short docs, null text") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),          // 2-grams: ab ba ab ba → 2 dup of 4; top token a: 3/5
      (2L, "x"),                  // no 2-grams → 0.0; top share 1.0
      (3L, ""),                   // no tokens → all 0.0
      (4L, null.asInstanceOf[String]),
      (5L, "w w w w"))            // 2-grams all "w w" → 2/3 dup; top share 1.0
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .select($"doc_id",
        TextAnalysis.dupNgramFraction($"toks", 2).as("f2"),
        TextAnalysis.topTokenShare($"toks").as("tts"))
    val got = df.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((2.0 / 4.0, 3.0 / 5.0)))
    assert(got(2L) == ((0.0, 1.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0)))
    assert(got(5L) == ((2.0 / 3.0, 1.0)))
  }

  test("ngramsFromTokens keeps multiplicity; shinglesFromTokens does not") {
    import spark.implicits._
    val df = Seq(Tuple1("a b a b")).toDF("text")
      .select(TextAnalysis.tokens($"text").as("t"))
      .select(
        TextAnalysis.ngramsFromTokens($"t", 2).as("ng"),
        TextAnalysis.shinglesFromTokens($"t", 2).as("sh"))
    val r = df.first()
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(r.getSeq[String](1).sorted == Seq("a b", "b a"))
  }

  test("redactPii: all three classes, application order, no-match passthrough") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@sub.example.org now"),
      (2L, "host 192.168.0.1 port"),
      (3L, "call 555-0134 today"),
      // an IP must NOT be half-eaten by the phone pattern (no hyphens)
      // and a redacted email must not leave digits for later patterns
      (4L, "u9@a.bc at 10.0.0.7 or 555-0100"),
      (5L, "no pii here 12.3 and 42-1000"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.redactPii($"text").as("c"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail <EMAIL> now")
    assert(got(2L) == "host <IP> port")
    assert(got(3L) == "call <PHONE> today")
    assert(got(4L) == "<EMAIL> at <IP> or <PHONE>")
    assert(got(5L) == "no pii here 12.3 and 42-1000")
  }

  test("piiCounts counts every class over the ORIGINAL text") {
    import spark.implicits._
    val df = Seq(Tuple1("a@b.co c@d.org 1.2.3.4 555-0101 555-0102 555-0103")).toDF("text")
    val Seq(e, i, p) = TextAnalysis.piiCounts(col("text"))
    val r = df.select(e.as("e"), i.as("i"), p.as("p")).first()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 3)))
  }

  test("embeddingDecontaminate: threshold, NaN guard, raw-typed ids") {
    import spark.implicits._
    val evalSet = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),   // cos 1.0 → dropped
      (2L, Seq(0.9f, 0.1f)),   // cos ~0.994 → dropped
      (3L, Seq(0.0f, 1.0f)),   // orthogonal → kept
      (4L, Seq(-1.0f, 0.0f)),  // opposite → kept
      (5L, Seq(0.0f, 0.0f))    // zero norm: cosine NaN → kept (guard)
    ).toDF("vec_id", "embedding")
    val kept = Dedup.embeddingDecontaminate(
      corpus, evalSet, col("embedding"), col("vec_id"), minCosine = 0.9)
      .select($"vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L, 5L))
    // raw-typed ids: string ids must anti-join correctly, not null out
    val sCorpus = corpus.select(concat(lit("d"), $"vec_id").as("vec_id"), $"embedding")
    val sEval = evalSet.select(concat(lit("e"), $"vec_id").as("vec_id"), $"embedding")
    val sKept = Dedup.embeddingDecontaminate(
      sCorpus, sEval, col("embedding"), col("vec_id"), minCosine = 0.9)
      .select($"vec_id").as[String].collect().sorted
    assert(sKept.toSeq == Seq("d3", "d4", "d5"))
  }

  test("embeddingDecontaminate plan: broadcast eval side, no corpus sort-merge join") {
    import spark.implicits._
    val e = embs
    val kept = Dedup.embeddingDecontaminate(
      e.filter($"vec_id" >= 10), e.filter($"vec_id" < 10),
      col("embedding"), col("vec_id"), minCosine = 0.35)
    val plan = kept.queryExecution.executedPlan.toString
    // the scoring pass must be the broadcast nested-loop shape (eval
    // side broadcast under the corpus scan), the flagged-id anti-join
    // must be the hinted broadcast hash join, and the corpus must never
    // sort-merge — the 100 TB contract
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("hashedLinearScore plan: zero exchanges — fully map-side") {
    import spark.implicits._
    val scored = TextAnalysis.hashedLinearScore(docs, col("text"), col("doc_id"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hashedLinearScore: hand-computed weights, empty docs, null id throws") {
    import spark.implicits._
    def weight(tok: String, buckets: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val b = java.lang.Long.parseLong(hex, 16) % buckets
      (b * 40503L % 1048576L).toDouble / 1048576.0 - 0.5
    }
    val df = Seq(
      (1L, "alpha beta alpha"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearScore(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected1 = 2 * weight("alpha", 65536) + weight("beta", 65536)
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == expected1) // dyadic weights: sum is EXACT, == is right
    assert(got(2L) == ((0L, 0.0)))
    assert(got(3L) == ((0L, 0.0)))
    val nullId = Seq((null.asInstanceOf[java.lang.Long], "x")).toDF("doc_id", "text")
    intercept[Exception] {
      TextAnalysis.hashedLinearScore(nullId, col("text"), col("doc_id")).collect()
    }
  }

  test("tokenPairCounts: counts, tie-break order, short and null docs") {
    import spark.implicits._
    val df = Seq(
      Tuple1("a b a b"),     // pairs: (a,b) (b,a) (a,b)
      Tuple1("a b"),         // (a,b)
      Tuple1("solo"),        // no pairs
      Tuple1(""),            // no pairs
      Tuple1(null.asInstanceOf[String])).toDF("text")
    val got = TextAnalysis.tokenPairCounts(df, col("text"), topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 3L), ("b", "a", 1L)))
    // topN truncates deterministically on the (count desc, pair) order
    val top1 = TextAnalysis.tokenPairCounts(df, col("text"), topN = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(top1.toSeq == Seq(("a", "b", 3L)))
  }

  test("dedupAgainstExisting: normalization-insensitive match, survivors keep all columns") {
    import spark.implicits._
    val incoming = Seq(
      (1L, "Hello   World"),
      (2L, "fresh content here"),
      (3L, "another new doc")).toDF("doc_id", "text")
    // same content as doc 1 modulo case/whitespace → doc 1 must drop
    val existing = Seq((90L, "hello world")).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstExisting(incoming, existing, col("text"))
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // disjoint snapshot → everything survives
    val none = Dedup.dedupAgainstExisting(
      incoming, Seq((91L, "nothing shared")).toDF("doc_id", "text"), col("text"))
    assert(none.count() == 3)
  }

  test("pqTrain/pqAssign: deterministic codebooks, correct argmax codes, corrupt-dim drop") {
    import spark.implicits._
    // 4-dim vectors, m=2 → 2-dim subspaces with axis-aligned clusters:
    // the trained codebooks must separate them and every assignment is
    // the nearest (cosine) centroid
    val vecs = (0L until 40L).map { i =>
      val a = if (i % 2 == 0) Seq(1.0, 0.01 * i) else Seq(0.01 * i, 1.0)
      val b = if (i % 3 == 0) Seq(2.0, 0.02 * i) else Seq(0.02 * i, 2.0)
      (i, a ++ b)
    }
    val df = vecs.toDF("vec_id", "v")
    val cbs = Similarity.pqTrain(df, $"v", $"vec_id", m = 2, codes = 2, trainSample = 100)
    assert(cbs.size == 2 && cbs.forall(cb => cb.size == 2 && cb.forall(_.length == 2)))
    // determinism: input order/partitioning must not change the model
    val cbs2 = Similarity.pqTrain(
      df.repartition(7, $"vec_id"), $"v", $"vec_id", m = 2, codes = 2, trainSample = 100)
    assert(cbs.map(_.map(_.toSeq)) == cbs2.map(_.map(_.toSeq)))
    val codes = Similarity.pqAssign(df, $"v", $"vec_id", cbs)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(codes.size == 40 * 2, "one code per (vector, subspace)")
    def cos(a: Seq[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs.foreach { case (id, v) =>
      (0 until 2).foreach { s =>
        val sv = v.slice(s * 2, s * 2 + 2)
        val sims = cbs(s).map(c => cos(sv, c))
        val want = sims.indices.maxBy(i => (sims(i), -i))
        assert(codes((id, s)) == want, s"vec $id sub $s")
      }
    }
    // a wrong-dimension vector is dropped, not mis-coded
    val ragged = df.union(Seq((99L, Seq(1.0, 2.0))).toDF("vec_id", "v"))
    assert(Similarity.pqAssign(ragged, $"v", $"vec_id", cbs)
      .filter($"vec_id" === 99L).count() == 0)
  }

  test("pqAdcTopK: bit-exact vs local ADC recomputation; join-free plan; zero-norm query rejected") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map { i =>
      (i, Seq.fill(8)(rnd.nextGaussian()))
    }
    val df = vecs.toDF("vec_id", "v")
    val cbs = Similarity.pqTrain(df, $"v", $"vec_id", m = 2, codes = 4, trainSample = 100)
    val queries = vecs.take(3).map { case (id, v) => (id, v.toArray) }
    val got = Similarity.pqAdcTopK(df, $"v", $"vec_id", queries, cbs, k = 4)
    // plan shape: one corpus scan, LUT lookups in projection, bounded
    // top-k aggregation — no join, no window anywhere
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    // local recomputation: codes by per-sub argmax cosine (ties → lowest
    // code), ADC score with the same nested accumulation order
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }; d
    }
    def cosv(a: Seq[Double], b: Seq[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val localCodes = vecs.map { case (id, v) =>
      id -> (0 until 2).map { s =>
        val sv = v.slice(s * 4, s * 4 + 4)
        val sims = cbs(s).map(c => cosv(sv, c.toSeq))
        sims.indices.maxBy(i => (sims(i), -i))
      }
    }.toMap
    queries.foreach { case (qid, qv) =>
      val qn = math.sqrt(dot(qv.toSeq, qv.toSeq))
      val scored = vecs.filter(_._1 != qid).map { case (vid, _) =>
        val cs = localCodes(vid)
        val num = (0 until 2).map(s => dot(qv.slice(s * 4, s * 4 + 4).toSeq, cbs(s)(cs(s)).toSeq)).reduceLeft(_ + _)
        val den = qn * math.sqrt((0 until 2).map(s => dot(cbs(s)(cs(s)).toSeq, cbs(s)(cs(s)).toSeq)).reduceLeft(_ + _))
        (vid, if (den > 0) num / den else Double.NaN)
      }
      val want = scored.sortBy { case (vid, sc) =>
        (-(if (sc.isNaN) Double.NegativeInfinity else sc), vid)
      }.take(4)
      want.zipWithIndex.foreach { case ((vid, sc), i) =>
        val (gvid, gsc) = rows((qid, i + 1))
        assert(gvid == vid && gsc == sc, s"query $qid rank ${i + 1}")
      }
    }
    // zero-norm query vectors cannot rank anything — rejected loudly
    val err = intercept[IllegalArgumentException] {
      Similarity.pqAdcTopK(df, $"v", $"vec_id", Seq((5L, Array.fill(8)(0.0))), cbs, k = 2)
    }
    assert(err.getMessage.contains("zero-norm"))
  }

  test("ivfPqTopK: full-probe ≡ pqAdcTopK; probe soundness + exact ADC scores; join-free plan; guards") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 80L).map { i => (i, Seq.fill(8)(rnd.nextGaussian())) }
    val df = vecs.toDF("vec_id", "v")
    val cbs = Similarity.pqTrain(df, $"v", $"vec_id", m = 2, codes = 4, trainSample = 100)
    val cents = Similarity.coarseTrain(df, $"v", $"vec_id", nlist = 4, trainSample = 100)
    assert(cents.size == 4 && cents.forall(_.length == 8))
    // coarse training is partitioning-invariant like pqTrain
    val cents2 = Similarity.coarseTrain(
      df.repartition(7, $"vec_id"), $"v", $"vec_id", nlist = 4, trainSample = 100)
    assert(cents.map(_.toSeq) == cents2.map(_.toSeq))
    val queries = vecs.take(3).map { case (id, v) => (id, v.toArray) }

    // nprobe = nlist probes every cell → the IVF gate admits everything
    // and the result must equal plain ADC over the full corpus
    val full = Similarity.ivfPqTopK(df, $"v", $"vec_id", queries, cents, cbs, k = 4, nprobe = 4)
    val adc = Similarity.pqAdcTopK(df, $"v", $"vec_id", queries, cbs, k = 4)
    assert(full.collect().map(_.toSeq).toSet == adc.collect().map(_.toSeq).toSet)

    // nprobe < nlist: every emitted neighbor must live in a probed cell
    // and carry the exact ADC score; ranking must equal the local
    // recomputation restricted to probed cells
    val got = Similarity.ivfPqTopK(df, $"v", $"vec_id", queries, cents, cbs, k = 4, nprobe = 2)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }; d
    }
    def cosv(a: Seq[Double], b: Seq[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def argTop(v: Seq[Double], cs: Seq[Array[Double]], top: Int): Seq[Int] = {
      val sims = cs.map(c => { val s = cosv(v, c.toSeq); if (s.isNaN) Double.NegativeInfinity else s })
      sims.indices.sortBy(i => (-sims(i), i)).take(top).map(_ + 1)
    }
    val localCell = vecs.map { case (id, v) => id -> argTop(v, cents, 1).head }.toMap
    val localCodes = vecs.map { case (id, v) =>
      id -> (0 until 2).map { s =>
        val sv = v.slice(s * 4, s * 4 + 4)
        val sims = cbs(s).map(c => cosv(sv, c.toSeq))
        sims.indices.maxBy(i => (sims(i), -i))
      }
    }.toMap
    queries.foreach { case (qid, qv) =>
      val probed = argTop(qv.toSeq, cents, 2).toSet
      val qn = math.sqrt(dot(qv.toSeq, qv.toSeq))
      val scored = vecs
        .filter { case (vid, _) => vid != qid && probed.contains(localCell(vid)) }
        .map { case (vid, _) =>
          val cs = localCodes(vid)
          val num = (0 until 2).map(s => dot(qv.slice(s * 4, s * 4 + 4).toSeq, cbs(s)(cs(s)).toSeq)).reduceLeft(_ + _)
          val den = qn * math.sqrt((0 until 2).map(s => dot(cbs(s)(cs(s)).toSeq, cbs(s)(cs(s)).toSeq)).reduceLeft(_ + _))
          (vid, if (den > 0) num / den else Double.NaN)
        }
      val want = scored.sortBy { case (vid, sc) =>
        (-(if (sc.isNaN) Double.NegativeInfinity else sc), vid)
      }.take(4)
      assert(want.nonEmpty, s"query $qid probed cells are empty — fixture too degenerate")
      want.zipWithIndex.foreach { case ((vid, sc), i) =>
        val (gvid, gsc) = rows((qid, i + 1))
        assert(gvid == vid && gsc == sc, s"query $qid rank ${i + 1}")
      }
      // nothing emitted beyond the locally derived count
      assert(!rows.contains((qid, want.size + 1)) || want.size == 4)
    }

    // guards: wrong-dimension centroid, zero-norm query
    val badCent = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(df, $"v", $"vec_id", queries, Seq(Array(1.0, 2.0)), cbs, k = 2)
    }
    assert(badCent.getMessage.contains("coarse centroids"))
    val zq = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(df, $"v", $"vec_id", Seq((5L, Array.fill(8)(0.0))), cents, cbs, k = 2)
    }
    assert(zq.getMessage.contains("zero-norm"))
  }

  test("ivfPqResidualTopK: local replay parity; fidelity beats raw PQ; join-free plan; guards") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 80L).map { i => (i, Seq.fill(8)(rnd.nextGaussian())) }
    val df = vecs.toDF("vec_id", "v")
    val cents = Similarity.coarseTrain(df, $"v", $"vec_id", nlist = 4, trainSample = 100)
    val cbsRaw = Similarity.pqTrain(df, $"v", $"vec_id", m = 2, codes = 4, trainSample = 100)
    val cbsRes = Similarity.pqTrainResidual(
      df, $"v", $"vec_id", cents, m = 2, codes = 4, trainSample = 100)
    val queries = vecs.take(3).map { case (id, v) => (id, v.toArray) }

    val got = Similarity.ivfPqResidualTopK(
      df, $"v", $"vec_id", queries, cents, cbsRes, k = 4, nprobe = 4)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }; d
    }
    def cosv(a: Seq[Double], b: Seq[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def argTopCos(v: Seq[Double], cs: Seq[Array[Double]], top: Int): Seq[Int] = {
      val sims = cs.map(c => { val s = cosv(v, c.toSeq); if (s.isNaN) Double.NegativeInfinity else s })
      sims.indices.sortBy(i => (-sims(i), i)).take(top).map(_ + 1)
    }
    // the kernel's L2 decomposition, same float expression
    def l2d(a: Seq[Double], b: Seq[Double]): Double =
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    val localCell = vecs.map { case (id, v) => id -> argTopCos(v, cents, 1).head }.toMap
    def residual(v: Seq[Double], cell: Int): Seq[Double] =
      v.zip(cents(cell - 1).toSeq).map { case (x, y) => x - y }
    val localCodes = vecs.map { case (id, v) =>
      val r = residual(v, localCell(id))
      id -> (0 until 2).map { s =>
        val rs = r.slice(s * 4, s * 4 + 4)
        val ds = cbsRes(s).map(c => { val d = l2d(rs, c.toSeq); if (d.isNaN) Double.PositiveInfinity else d })
        ds.indices.minBy(i => (ds(i), i))
      }
    }.toMap
    // full-probe local replay: residual ADC score for every non-self vector
    queries.foreach { case (qid, qv) =>
      val qn = math.sqrt(dot(qv.toSeq, qv.toSeq))
      val scored = vecs.filter(_._1 != qid).map { case (vid, _) =>
        val cell = localCell(vid)
        val cs = localCodes(vid)
        val cent = cents(cell - 1).toSeq
        val qc = dot(qv.toSeq, cent)
        val num = (qc +: (0 until 2).map(s =>
          dot(qv.slice(s * 4, s * 4 + 4).toSeq, cbsRes(s)(cs(s)).toSeq))).reduceLeft(_ + _)
        val den2 = (0 until 2).map { s =>
          val csl = cent.slice(s * 4, s * 4 + 4)
          val cw = cbsRes(s)(cs(s)).toSeq
          dot(csl, csl) + 2.0 * dot(csl, cw) + dot(cw, cw)
        }.reduceLeft(_ + _)
        val den = qn * math.sqrt(den2)
        (vid, if (den > 0) num / den else Double.NaN)
      }
      val want = scored.sortBy { case (vid, sc) =>
        (-(if (sc.isNaN) Double.NegativeInfinity else sc), vid)
      }.take(4)
      want.zipWithIndex.foreach { case ((vid, sc), i) =>
        val (gvid, gsc) = rows((qid, i + 1))
        assert(gvid == vid && gsc == sc, s"query $qid rank ${i + 1}")
      }
    }

    // the fidelity claim residual encoding exists for: mean squared
    // reconstruction error strictly improves on raw-vector PQ with the
    // same bit budget (codebooks only span within-cell spread)
    val rawCodes = vecs.map { case (id, v) =>
      id -> (0 until 2).map { s =>
        val sv = v.slice(s * 4, s * 4 + 4)
        val sims = cbsRaw(s).map(c => cosv(sv, c.toSeq))
        sims.indices.maxBy(i => (sims(i), -i))
      }
    }.toMap
    def err2(v: Seq[Double], recon: Seq[Double]): Double =
      v.zip(recon).map { case (x, y) => (x - y) * (x - y) }.sum
    val rawErr = vecs.map { case (id, v) =>
      err2(v, (0 until 2).flatMap(s => cbsRaw(s)(rawCodes(id)(s)).toSeq))
    }.sum / vecs.size
    val resErr = vecs.map { case (id, v) =>
      val cent = cents(localCell(id) - 1).toSeq
      err2(v, (0 until 2).flatMap { s =>
        cent.slice(s * 4, s * 4 + 4).zip(cbsRes(s)(localCodes(id)(s)).toSeq)
          .map { case (a, b) => a + b }
      })
    }.sum / vecs.size
    info(f"mean squared reconstruction error: raw PQ $rawErr%.4f, residual PQ $resErr%.4f")
    assert(resErr < rawErr,
      f"residual encoding did not improve reconstruction ($resErr%.4f vs $rawErr%.4f)")

    // guards mirror ivfPqTopK's
    val badCent = intercept[IllegalArgumentException] {
      Similarity.ivfPqResidualTopK(df, $"v", $"vec_id", queries, Seq(Array(1.0, 2.0)), cbsRes, k = 2)
    }
    assert(badCent.getMessage.contains("coarse centroids"))
    val zq = intercept[IllegalArgumentException] {
      Similarity.ivfPqResidualTopK(
        df, $"v", $"vec_id", Seq((5L, Array.fill(8)(0.0))), cents, cbsRes, k = 2)
    }
    assert(zq.getMessage.contains("zero-norm"))
  }

  test("profile: one scan for all columns, exact stats, native-order extrema, nulls, guards") {
    import spark.implicits._
    val df = Seq(
      (9L, Some("b"), "xx"),
      (10L, None, "y"),
      (2L, Some("a"), "y")).toDF("id", "tag", "txt")
    val got = Profiling.profile(df, Seq("id", "tag", "txt"))
    // ONE pass: the plan scans the input exactly once (the naive
    // per-column loop would scan it three times)
    val scans = got.queryExecution.executedPlan.collect {
      case s if s.getClass.getSimpleName.contains("Scan") => s
    }
    assert(scans.size <= 1, s"expected a single input scan, got ${scans.size}")
    val rows = got.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5), r.getLong(6))).toMap
    // native-order min/max: id min is 2 and max is 10 — string order
    // would have said '10' < '2' < '9'
    assert(rows("id") == ((3L, 3L, 3L, "2", "10", 4L)), rows("id"))
    // nulls: count skips them, min/max ignore them, len_sum sums non-null
    assert(rows("tag") == ((3L, 2L, 2L, "a", "b", 2L)), rows("tag"))
    assert(rows("txt") == ((3L, 3L, 2L, "xx", "y", 4L)), rows("txt"))
    intercept[IllegalArgumentException] { Profiling.profile(df, Seq("nope")) }
    intercept[IllegalArgumentException] { Profiling.profile(df, Seq.empty) }
  }

  test("bpeTrain: hand-computed merges, LTR odd-run pairing, ties, guards") {
    import spark.implicits._
    // word counts: "aaa" ×2, "bb" ×2
    val df = Seq("aaa bb", "aaa", "bb").toDF("text")
    val got = TextAnalysis.bpeTrain(df, $"text", numMerges = 3, vocabCap = 100)
    // round 1: (a,a) count 4 (two per "aaa", ×2 words) beats (b,b)=2.
    // LTR on the odd run [a,a,a] pairs positions 1-2 → [aa, a].
    // round 2: (aa,a)=2 ties (b,b)=2 → lexicographically smaller pair
    // ("aa","a") wins. round 3: only (b,b)=2 remains.
    assert(got == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L), (3, "b", "b", 2L)), got)
    // one more merge than pairs exist → loud failure, not a silent stop
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(df, $"text", numMerges = 4, vocabCap = 100)
    }
    assert(ex.getMessage.contains("no adjacent pairs left"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(df, $"text", numMerges = 0)
    }
  }

  test("weightedKPerKey: local clock replay, weight monotonicity, determinism, guards") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, s"grp${i % 2}", s"content $i", 1.0 + (i % 7)))
    val df = rows.toDF("id", "grp", "txt", "w")
    val got = Sampling.weightedKPerKey(
      df, col("grp"), col("w"), col("txt"), col("id"), k = 5)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // local replay of the exponential clocks
    def clock(txt: String, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(txt.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967296.0
      math.log(u) / w
    }
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy { case (id, _, t, w) => (-clock(t, w), id) }.take(5).map(_._1)
    }.toSet
    assert(got == want, s"got $got want $want")
    assert(got.size == 10)
    // same u (identical hash content), heavier weight wins: ln(u) < 0,
    // dividing by a larger w moves the clock toward 0
    val tie = Seq((1L, "g", "same", 1.0), (2L, "g", "same", 50.0)).toDF("id", "grp", "txt", "w")
    val winner = Sampling.weightedKPerKey(
      tie, col("grp"), col("w"), col("txt"), col("id"), k = 1)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(winner == Seq(2L), s"heavier weight must win the shared clock, got $winner")
    // repartition invariance (append-stable, RNG-free)
    val got2 = Sampling.weightedKPerKey(
      df.repartition(7, col("id")), col("grp"), col("w"), col("txt"), col("id"), k = 5)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got2 == got)
    // zero/negative/null weights fail loudly
    val bad = Seq((1L, "g", "t", 0.0)).toDF("id", "grp", "txt", "w")
    val ex = intercept[Exception] {
      Sampling.weightedKPerKey(bad, col("grp"), col("w"), col("txt"), col("id"), 1).collect()
    }
    assert(ex.getMessage.contains("weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("weight")))
  }

  test("logisticTrain: matches a local trajectory replay, reduces log-loss, guards") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // lr sized for the unnormalized ~50-count feature rows: 0.5
    // demonstrably DIVERGES (loss 0.69 -> 9.7) — full-batch GD on
    // count features needs a small step
    val (buckets, steps, lr) = (64, 4, 0.05)
    val got = TextAnalysis.logisticTrain(
      docs, col("text"), col("doc_id") % 2, buckets, steps, lr).toMap

    // local replay of the identical recurrence (fold-order float drift
    // between the engine's partition sums and this sequential sum is
    // ~1e-14 over 4 steps)
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def bucketsOf(text: String): Seq[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      "[^a-z0-9]+".r.split(text.toLowerCase(java.util.Locale.ROOT)).toSeq
        .filter(_.nonEmpty)
        .map { w =>
          val hex = md.digest(w.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
          (java.lang.Long.parseLong(hex, 16) % buckets).toInt
        }
    }
    val feats = rows.map { case (id, t) => (bucketsOf(t), (id % 2).toDouble) }
    val n = feats.length
    var w = Array.fill(buckets)(0.0)
    def loss(wv: Array[Double]): Double = feats.map { case (bs, y) =>
      val s = bs.map(b => wv(b)).sum
      val p = 1.0 / (1.0 + math.exp(-s))
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }.sum / n
    val loss0 = loss(w)
    for (_ <- 1 to steps) {
      val g = Array.fill(buckets)(0.0)
      feats.foreach { case (bs, y) =>
        val s = bs.map(b => w(b)).sum
        val r = 1.0 / (1.0 + math.exp(-s)) - y
        bs.foreach(b => g(b) += r)
      }
      w = Array.tabulate(buckets)(i => w(i) - lr * g(i) / n)
    }
    (0 until buckets).foreach { b =>
      assert(math.abs(got(b) - w(b)) < 1e-9, s"bucket $b: ${got(b)} vs ${w(b)}")
    }
    val lossT = loss(Array.tabulate(buckets)(got(_)))
    info(f"log-loss: start $loss0%.4f -> trained $lossT%.4f")
    assert(lossT < loss0, "training must reduce log-loss on the training set")

    intercept[IllegalArgumentException] {
      TextAnalysis.logisticTrain(docs, col("text"), col("doc_id") % 2, buckets = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.logisticTrain(docs, col("text"), col("doc_id") % 2, steps = 0)
    }
    // non-0/1 labels fail loudly at execution
    val ex = intercept[Exception] {
      TextAnalysis.logisticTrain(docs, col("text"), col("doc_id"), buckets, 1, lr)
    }
    assert(ex.getMessage.contains("label") ||
      Option(ex.getCause).exists(_.getMessage.contains("label")))
  }

  test("bpeEncode: rank-ordered LTR apply, reproduces trainer state, guards") {
    import spark.implicits._
    val df = Seq("aaa bb", "aaa", "bb").toDF("text")
    val merges3 = TextAnalysis.bpeTrain(df, $"text", numMerges = 3, vocabCap = 100)
      .map(m => (m._2, m._3)) // [(a,a), (aa,a), (b,b)]
    def enc(text: String): Seq[String] =
      Seq(text).toDF("text")
        .select(graft.functions.GraftFunctions.bpeEncode(
          spark, TextAnalysis.tokens(col("text")), merges3).as("p"))
        .collect().head.getSeq[String](0)
    // training corpus words collapse to their final trainer state
    assert(enc("aaa bb") == Seq("aaa", "bb"))
    // unseen word, odd-run LTR at rank 1, then rank 2 finds nothing:
    // a-a-a-a -> [aa, aa] (NOT [aaa, a] — ranks apply in order)
    assert(enc("aaaa") == Seq("aa", "aa"))
    // rank 1 gives [aa, aa, a]; rank 2 (aa, a) then merges the tail
    assert(enc("aaaaa") == Seq("aa", "aaa"))
    // nothing applies
    assert(enc("ab ba") == Seq("a", "b", "b", "a"))
    // concatenation invariant on real text
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val both = docs.select(
      TextAnalysis.tokens(col("text")).as("t"),
      graft.functions.GraftFunctions.bpeEncode(
        spark, TextAnalysis.tokens(col("text")), merges3).as("p"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0).mkString == r.getSeq[String](1).mkString,
        "piece concatenation must reproduce the token stream")
    }
    // malformed merge rows fail loudly at the kernel
    graft.functions.GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode(array('ab'), array('nospace'))").collect()
    }
    assert(ex.getMessage.contains("left right") ||
      Option(ex.getCause).exists(_.getMessage.contains("left right")))
    intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.bpeEncode(spark, col("text"), Seq.empty)
    }
  }

  test("semanticPrune: within-cell exact pairs, keep-best survivor, singletons survive") {
    import spark.implicits._
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    // cell 1: {1, 2, 6} one near-dup group (pairwise cos > 0.99);
    // cell 2: {3, 4} a group; 5 routes to cell 1 (tie → lower cid) but
    // sits at 45° from everything → singleton
    val rows = Seq(
      (1L, Seq(1.0, 0.0), 1.0),
      (2L, Seq(0.9999, 0.01), 2.0),
      (6L, Seq(0.9998, 0.02), 2.0),
      (3L, Seq(0.0, 1.0), 5.0),
      (4L, Seq(0.01, 0.9999), 1.0),
      (5L, Seq(0.707, 0.707), 9.0))
    val df = rows.toDF("vec_id", "v", "q")
    val surv = Dedup.semanticPrune(df, $"v", $"vec_id", $"q", cents, threshold = 0.99)
    // the within-cell pair join must be an equi-join on cell id, never
    // a planner-degraded cross product
    val plan = surv.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = surv.collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(3), r.getLong(4)))).toMap
    surv.unpersist()
    // group {1,2,6}: max q = 2.0 tied between 2 and 6 → min id 2 wins;
    // cluster_id = min member id
    assert(got.keySet == Set(2L, 3L, 5L), s"survivors ${got.keySet}")
    assert(got(2L) == ((1, 1L, 3L)), s"got ${got(2L)}")  // cell 1, cluster 1, 3 members
    assert(got(3L) == ((2, 3L, 2L)), s"got ${got(3L)}")  // cell 2, cluster 3, 2 members
    assert(got(5L) == ((1, 5L, 1L)), s"got ${got(5L)}")  // singleton survives as itself
    // guards: ragged centroids rejected
    intercept[IllegalArgumentException] {
      Dedup.semanticPrune(df, $"v", $"vec_id", $"q", Seq(Array(1.0), Array(0.0, 1.0)), 0.9)
    }
  }

  test("ivfPqResidualTopK recall on clustered embeddings >= raw ivfPqTopK recall") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.coarseTrain(emb, $"embedding", $"vec_id", nlist = 8)
    val cbsRaw = Similarity.pqTrain(emb, $"embedding", $"vec_id", m = 4, codes = 16)
    val cbsRes = Similarity.pqTrainResidual(
      emb, $"embedding", $"vec_id", cents, m = 4, codes = 16)
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSet(Similarity.bruteForceTopK(
      emb, emb.filter($"vec_id" < 8), $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5))
    val raw = topSet(Similarity.ivfPqTopK(
      emb, $"embedding", $"vec_id", queries, cents, cbsRaw, k = 5, nprobe = 3))
    val res = topSet(Similarity.ivfPqResidualTopK(
      emb, $"embedding", $"vec_id", queries, cents, cbsRes, k = 5, nprobe = 3))
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.map { case (q, want) =>
        (want & got.getOrElse(q, Set.empty)).size.toDouble / want.size
      }.sum / exact.size
    val (rRaw, rRes) = (recall(raw), recall(res))
    info(f"recall@5 vs exact: raw $rRaw%.3f, residual $rRes%.3f")
    assert(rRes >= rRaw - 1e-9,
      f"residual recall $rRes%.3f fell below the raw-PQ floor $rRaw%.3f")
  }

  test("intervalOverlapJoin: exact theta-join parity, single emission, no cross product, loud guards") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // negative and positive endpoints, zero-length (point) intervals,
    // lengths crossing several bins at binWidth=7
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      val s = rnd.nextInt(400) - 200L
      (idBase + i, s, s + rnd.nextInt(40))
    }
    val ls = mk(150, 1000L)
    val rs = mk(120, 5000L)
    val l = ls.toDF("lid", "ls", "le")
    val r = rs.toDF("rid", "rs", "re")
    val got = TemporalJoins.intervalOverlapJoin(
      l, r, $"ls", $"le", $"rs", $"re",
      Seq("lid" -> $"lid"), Seq("rid" -> $"rid"), binWidth = 7)
    // equi-join on bins, not a planner-degraded cross product
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"), plan)
    val gotRows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly-once: the canonical-bin rule must not duplicate a pair
    // that shares several bins
    assert(gotRows.length == gotRows.distinct.length, "duplicated pairs")
    val want = for {
      (lid, s1, e1) <- ls
      (rid, s2, e2) <- rs
      if s1 <= e2 && s2 <= e1
    } yield (lid, rid, math.min(e1, e2) - math.max(s1, s2) + 1)
    assert(gotRows.toSet == want.toSet)
    assert(want.nonEmpty, "fixture produced no overlaps — not testing anything")

    // end < start fails loudly, not as silent non-overlap
    val bad = Seq((1L, 10L, 5L)).toDF("lid", "ls", "le")
    val e1 = intercept[Exception] {
      TemporalJoins.intervalOverlapJoin(bad, r, $"ls", $"le", $"rs", $"re",
        Seq("lid" -> $"lid"), Seq("rid" -> $"rid"), binWidth = 7).collect()
    }
    assert(e1.getMessage.contains("end < start"), e1.getMessage)
    // an interval spanning more bins than the cap fails loudly
    val huge = Seq((1L, 0L, 10000000L)).toDF("lid", "ls", "le")
    val e2 = intercept[Exception] {
      TemporalJoins.intervalOverlapJoin(huge, r, $"ls", $"le", $"rs", $"re",
        Seq("lid" -> $"lid"), Seq("rid" -> $"rid"), binWidth = 7,
        maxBinsPerInterval = 1000).collect()
    }
    assert(e2.getMessage.contains("bins of width"), e2.getMessage)
  }

  test("compactionPlan: exact sorted-next-fit bins, repartition-invariant, loud guards") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val files = (0L until 200L).map(i => (s"p${i % 5}", i, rnd.nextInt(5000).toLong))
    val df = files.toDF("p", "fid", "sz")
    val target = 8000L
    val got = Compaction.compactionPlan(df, $"p", $"fid", $"sz", target)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 200, "every file exactly once")
    files.groupBy(_._1).foreach { case (p, fs) =>
      var cum = 0L
      fs.sortBy { case (_, fid, sz) => (-sz, fid) }.foreach { case (_, fid, sz) =>
        assert(got((p, fid)) == ((sz, cum / target)), s"file $p/$fid")
        cum += sz
      }
    }
    // plan must not depend on input partitioning
    val got2 = Compaction.compactionPlan(df.repartition(13, $"fid"), $"p", $"fid", $"sz", target)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got2 == got)
    val eNeg = intercept[Exception] {
      Compaction.compactionPlan(Seq(("p", 1L, -5L)).toDF("p", "fid", "sz"),
        $"p", $"fid", $"sz", target).collect()
    }
    assert(eNeg.getMessage.contains("non-negative"), eNeg.getMessage)
    val eNull = intercept[Exception] {
      Compaction.compactionPlan(Seq(("p", Option.empty[Long], 5L)).toDF("p", "fid", "sz"),
        $"p", $"fid", $"sz", target).collect()
    }
    assert(eNull.getMessage.contains("file id"), eNull.getMessage)
  }

  test("upsertMerge: update/insert/delete/keep semantics, ambiguous batch and null key fail loudly") {
    import spark.implicits._
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (9L, "z", 90.0))
      .toDF("k", "name", "v")
    val chg = Seq(
      (2L, "b2", 21.0, false), // update
      (5L, "e", 50.0, false),  // insert
      (9L, "", 0.0, true))     // delete
      .toDF("k", "name", "v", "del")
    val out = Seq("k" -> col("k"), "name" -> col("name"), "v" -> col("v"))
    val got = Cdc.upsertMerge(snap, chg, col("k"), col("k"), col("del"), out, out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (5L, "e", 50.0)))
    val dup = chg.union(Seq((2L, "b3", 22.0, false)).toDF("k", "name", "v", "del"))
    val e1 = intercept[Exception] {
      Cdc.upsertMerge(snap, dup, col("k"), col("k"), col("del"), out, out).collect()
    }
    assert(e1.getMessage.contains("ambiguous"), e1.getMessage)
    val nullKey = Seq((Option.empty[Long], "x", 1.0, false)).toDF("k", "name", "v", "del")
    val e2 = intercept[Exception] {
      Cdc.upsertMerge(snap, nullKey, col("k"), col("k"), col("del"), out, out).collect()
    }
    assert(e2.getMessage.contains("null"), e2.getMessage)
  }

  test("scd2History: intervals chain per key, deletes close without emitting, dup version fails") {
    import spark.implicits._
    // out-of-order input rows — the window must sort, not trust order
    val log = Seq(
      (1L, 30L, "s3", false),
      (1L, 10L, "s1", false),
      (1L, 20L, "s2", false),
      (2L, 10L, "t1", false),
      (2L, 20L, "", true),   // tombstone closes t1, emits nothing
      (3L, 5L, "u1", false))
      .toDF("k", "v", "state", "del")
    val got = Cdc.scd2History(log, col("k"), col("v"), col("del"),
      Seq("state" -> col("state")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      (1L, "s1", 10L, Some(20L), false),
      (1L, "s2", 20L, Some(30L), false),
      (1L, "s3", 30L, None, true),
      (2L, "t1", 10L, Some(20L), false),
      (3L, "u1", 5L, None, true)))
    val dup = log.union(Seq((1L, 10L, "s1b", false)).toDF("k", "v", "state", "del"))
    val e = intercept[Exception] {
      Cdc.scd2History(dup, col("k"), col("v"), col("del"),
        Seq("state" -> col("state"))).collect()
    }
    assert(e.getMessage.contains("multiple changes"), e.getMessage)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Typed bounded top-k aggregator over (score, id) pairs, best-first by
  * (score desc, id asc). The buffer never exceeds k entries, so the
  * map-side partial aggregation reduces each partition to ≤ k rows per
  * group BEFORE the shuffle — ranking n scored rows moves O(k ×
  * partitions) rows instead of all n (the `row_number().over(Window)`
  * formulation it replaces shuffles and sorts the full scored set).
  */
private[operators] final case class TopKBuf(items: Seq[(Double, Long)])

private[operators] final class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  // NaN scores (zero vectors → 0/0 cosine) rank WORST, not randomly:
  // raw Double comparison is inconsistent under NaN and would let a
  // NaN candidate displace real neighbors nondeterministically
  private def rank(x: Double): Double = if (x.isNaN) Double.NegativeInfinity else x
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val ra = rank(a._1); val rb = rank(b._1)
    ra > rb || (ra == rb && a._2 < b._2)
  }
  // Both reduce and merge maintain the invariant that `items` is sorted
  // best-first, so reduce is a binary-search insert into a bounded array
  // (O(log k) compares + one O(k) copy) and merge is a linear merge scan
  // — not the O(k log k) re-sort per accepted row the first version
  // paid, which matters for k in the hundreds.
  override def zero: TopKBuf = TopKBuf(Seq.empty)
  override def reduce(buf: TopKBuf, x: (Double, Long)): TopKBuf = {
    val n = buf.items.size
    if (n >= k && better(buf.items.last, x)) buf
    else {
      val arr = buf.items.toArray
      // first index whose element x outranks (stable: ties keep arr order)
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(x, arr(mid))) hi = mid else lo = mid + 1
      }
      val outLen = math.min(n + 1, k)
      if (lo >= outLen) buf // x ranks below a full buffer's worst
      else {
        val out = new Array[(Double, Long)](outLen)
        System.arraycopy(arr, 0, out, 0, lo)
        out(lo) = x
        val rem = outLen - lo - 1
        if (rem > 0) System.arraycopy(arr, lo, out, lo + 1, rem)
        TopKBuf(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }
  }
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    if (a.items.isEmpty) b
    else if (b.items.isEmpty) a
    else {
      val x = a.items.toArray
      val y = b.items.toArray
      val outLen = math.min(x.length + y.length, k)
      val out = new Array[(Double, Long)](outLen)
      var i = 0
      var j = 0
      var o = 0
      while (o < outLen) {
        out(o) =
          if (j >= y.length || (i < x.length && better(x(i), y(j)))) { val v = x(i); i += 1; v }
          else { val v = y(j); j += 1; v }
        o += 1
      }
      TopKBuf(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
    }
  override def finish(r: TopKBuf): TopKBuf = r
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is broadcast, so the corpus is scanned exactly once
  *    with no shuffle of corpus vectors; per-partition top-k heaps would
  *    be the next refinement at extreme k.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign bits,
  *    queries probe only their own bucket (multi-probe by flipping one
  *    bit), then exact re-rank inside the candidate set. At 100 TB the
  *    bucket join replaces the full scan with a hash lookup per query.
  *
  * Hyperplanes are PSEUDO-RANDOM BUT DETERMINISTIC: component j of
  * hyperplane b is `sign(xxhash64(b, j))` — reproducible across runs and
  * engines with no stored model.
  */
/** Deterministic local k-means for the IVF coarse quantizer: kmeans++
  * style farthest-point seeding (first = sample order 0, next = argmax
  * of min cosine distance to chosen, first-index tie-break) + Lloyd
  * rounds with empty clusters keeping their previous centroid. Runs on
  * a BOUNDED sample on the driver — the model is nlist × dim doubles.
  */
private[operators] object LocalKMeans {

  // NaN-free: a zero vector scores similarity 0 to everything instead
  // of 0/0 = NaN, which would poison farthest-point seeding (NaN
  // distances never update minDist → the same point reselected forever)
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def train(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    // neutral wording: this trainer serves IVF coarse quantizers AND
    // PQ subspace codebooks (callers share trainSampleVectors' guard)
    require(sample.nonEmpty, "quantizer training sample is empty")
    val n = sample.length
    val kk = math.min(k, n)
    // farthest-point seeding
    val chosen = scala.collection.mutable.ArrayBuffer(sample(0))
    val minDist = Array.fill(n)(Double.MaxValue)
    while (chosen.size < kk) {
      var i = 0
      while (i < n) {
        val d = 1.0 - cosine(sample(i), chosen.last)
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
      var best = 0; var bestD = -1.0; i = 0
      while (i < n) {
        if (minDist(i) > bestD) { bestD = minDist(i); best = i }
        i += 1
      }
      chosen += sample(best)
    }
    var cents = chosen.toArray
    // Lloyd rounds (assign by max cosine, smaller cid on ties)
    val dim = sample(0).length
    for (_ <- 1 to iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var i = 0
      while (i < n) {
        var best = 0; var bestS = -2.0; var c = 0
        while (c < kk) {
          val s = cosine(sample(i), cents(c))
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += sample(i)(j); j += 1 }
        i += 1
      }
      cents = (0 until kk).map { c =>
        if (counts(c) == 0) cents(c)
        else {
          val m = new Array[Double](dim)
          var j = 0
          while (j < dim) { m(j) = sums(c)(j) / counts(c); j += 1 }
          m
        }
      }.toArray
    }
    cents
  }
}

/** Squared-L2 twin of [[LocalKMeans]] for RESIDUAL codebook training
  * (FAISS-style `by_residual` PQ): residuals cluster around the
  * origin, where cosine collapses (direction of a near-zero vector is
  * noise), so the residual metric is L2 — the same choice FAISS makes.
  * Same determinism contract: farthest-point seeding from sample(0),
  * fixed Lloyd rounds, argmin ties to the smaller centroid id, empty
  * clusters keep their previous centroid. Distances use the
  * `dot(a,a) - 2*dot(a,b) + dot(b,b)` decomposition with left-to-right
  * accumulation — the float expression a SQL oracle reproduces with
  * three `list_dot_product` calls.
  */
private[operators] object LocalKMeansL2 {

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var aa = 0.0; var ab = 0.0; var bb = 0.0; var i = 0
    while (i < a.length) {
      aa += a(i) * a(i); ab += a(i) * b(i); bb += b(i) * b(i); i += 1
    }
    val d = aa - 2.0 * ab + bb
    if (java.lang.Double.isNaN(d)) Double.PositiveInfinity else d
  }

  def train(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "quantizer training sample is empty")
    val n = sample.length
    val kk = math.min(k, n)
    val chosen = scala.collection.mutable.ArrayBuffer(sample(0))
    val minDist = Array.fill(n)(Double.MaxValue)
    while (chosen.size < kk) {
      var i = 0
      while (i < n) {
        val d = dist2(sample(i), chosen.last)
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
      var best = 0; var bestD = -1.0; i = 0
      while (i < n) {
        if (minDist(i) > bestD) { bestD = minDist(i); best = i }
        i += 1
      }
      chosen += sample(best)
    }
    var cents = chosen.toArray
    val dim = sample(0).length
    for (_ <- 1 to iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.PositiveInfinity; var c = 0
        while (c < kk) {
          val d = dist2(sample(i), cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += sample(i)(j); j += 1 }
        i += 1
      }
      cents = (0 until kk).map { c =>
        if (counts(c) == 0) cents(c)
        else {
          val m = new Array[Double](dim)
          var j = 0
          while (j < dim) { m(j) = sums(c)(j) / counts(c); j += 1 }
          m
        }
      }.toArray
    }
    cents
  }
}

object Similarity {

  /** The bounded deterministic training sample shared by every
    * quantizer trainer ([[ivfTopK]]'s coarse quantizer, [[pqTrain]],
    * [[coarseTrain]]): the `limit` smallest `xxhash64(id)` vectors (id,
    * then vector-hash tie-break), nulls dropped, then only the MODAL
    * dimension kept (count-majority, smaller-dim tie-break —
    * deterministic). One definition so every trainer selects
    * bit-identically.
    */
  private def trainSampleVectors(
      base: DataFrame, idCol: String, vecCol: String, limit: Int): Array[Array[Double]] = {
    val raw = base
      .withColumn("h", xxhash64(col(idCol)))
      // duplicate ids carrying DIFFERENT vectors would otherwise leave
      // the sample (and so centroids/codebooks) partition-dependent:
      // hashing the vector makes the order total up to identical
      // (id, vector) rows, which are interchangeable
      .orderBy(col("h"), col(idCol), xxhash64(col(vecCol))).limit(limit)
      .select(col(vecCol)).collect()
      .flatMap(r => Option(r.getSeq[Double](0)).map(_.toArray))
      .filter(_.nonEmpty)
    require(raw.nonEmpty, "quantizer training sample is empty (all-null/empty embeddings?)")
    val dim = raw.groupBy(_.length).maxBy { case (l, vs) => (vs.length, -l) }._1
    raw.filter(_.length == dim)
  }

  /** Coarse-quantizer training as a standalone step (the trainer
    * [[ivfTopK]] runs internally): bounded hash-selected sample →
    * deterministic kmeans++ + Lloyd → `nlist` × dim centroids,
    * returned driver-side so callers can ship them into plans as
    * literals AND emit them for independent verification — the
    * [[ivfPqTopK]] contract.
    */
  def coarseTrain(
      df: DataFrame,
      vec: Column,
      id: Column,
      nlist: Int = 16,
      iters: Int = 10,
      trainSample: Int = 4096): Seq[Array[Double]] = {
    require(nlist >= 1, s"coarseTrain needs nlist >= 1, got $nlist")
    val base = df
      .select(id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"))
      .filter(col("vec_id").isNotNull)
    LocalKMeans.train(trainSampleVectors(base, "vec_id", "v", trainSample), nlist, iters).toSeq
  }

  /** Rank `scored` (query_id, corpus_id, cosine) down to the top `k`
    * per query via [[TopKByScore]]: partial top-k heaps run map-side,
    * so the shuffle carries ≤ k rows per (partition, query) — never the
    * full scored set. Output and tie-break (cosine desc, corpus_id asc)
    * are identical to the `row_number` window it replaces.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val tk = udaf(new TopKByScore(k))
    scored
      // NULL cosines (ragged or null-element vectors — CosineSimilarity
      // nulls them out rather than scoring a corrupted vector) drop
      // from the candidate set here: the typed aggregator's
      // (Double, Long) input encoder would otherwise throw on the null.
      // Zero vectors stay: their NaN ranks worst inside the aggregator.
      .filter(col("cosine").isNotNull)
      .groupBy("query_id")
      .agg(tk(col("cosine"), col("corpus_id")).as("topk"))
      .select(col("query_id"), posexplode(col("topk.items")).as(Seq("p", "s")))
      .select(
        col("query_id"), (col("p") + 1).cast("int").as("rank"),
        col("s._2").as("corpus_id"), col("s._1").as("cosine"))
  }

  /** Cosine similarity of two double arrays — the codegen'd
    * [[graft.functions.CosineSimilarity]] expression (one fused loop per
    * row). Bit-identical to [[cosineHof]] and to the DuckDB oracle for
    * every pair with a nonzero divisor: all accumulate left-to-right in
    * doubles. ZERO-NORM pairs are the one documented divergence — the
    * kernel's Java division yields NaN (ranked worst by TopKByScore)
    * where the HOF's SQL division throws under ANSI mode (Spark 4
    * default) or nulls out under legacy mode; the operators use the
    * kernel exclusively, and the corrupt-inputs spec pins the NaN.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** Built-ins-only formulation (interpreted higher-order folds) — kept
    * as the reference implementation the native expression is asserted
    * bit-equal against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, x) => s + x))
    dot / (na * nb)
  }

  /** LSH bucket id from the sign pattern of `bits` deterministic
    * hyperplanes: bit b = [dot(v, h_b) >= 0] where h_b(j) = ±1 from
    * xxhash64(seed, b, j). Distinct `seed`s give independent tables.
    */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 0): Column = {
    val bitCols = (0 until bits).map { b =>
      val dot = aggregate(
        zip_with(
          v,
          transform(sequence(lit(0), size(v) - 1),
            j => when(xxhash64(lit(seed), lit(b), j) >= 0, 1.0).otherwise(-1.0)),
          (x, h) => x * h),
        lit(0.0), (s, x) => s + x)
      // !isnan: Spark SQL orders NaN above every number, so a bare
      // `dot >= 0` would set the bit for a NaN dot while the native
      // kernel's Java comparison leaves it clear — the bit-equality the
      // spec asserts requires NaN to mean "bit clear" on both paths
      // (null dot already falls through to 0 via the when)
      when(!isnan(dot) && dot >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Exact cosine top-k: for every query vector, the `k` most similar
    * corpus vectors (ties broken by corpus id — fully deterministic).
    * `excludeSelf` drops the corpus row whose id equals the query id —
    * correct when queries ARE corpus rows (the catalog queries); set it
    * false for an independent query table whose ids merely collide with
    * corpus ids, or the true nearest neighbor silently disappears.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      queryVec: Column,
      queryId: Column,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // null ids (or string ids that null through the long cast) DROP, on
    // both sides and in every top-k flavor: left in, they would crash
    // the typed top-k aggregator's non-nullable Long encoder when
    // excludeSelf = false yet be silently swallowed by the =!= filter
    // when it is true — one documented behavior beats two accidental
    // ones
    val c = corpus.select(corpusId.cast("long").as("corpus_id"), corpusVec.cast("array<double>").as("cv"))
      .filter(col("corpus_id").isNotNull)
    val q = queries.select(queryId.cast("long").as("query_id"), queryVec.cast("array<double>").as("qv"))
      .filter(col("query_id").isNotNull)
    val scored0 = c.crossJoin(broadcast(q))
      .select(
        col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("corpus_id")) else scored0
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: a deterministic k-means
    * coarse quantizer partitions the corpus into `nlist` cells; each
    * query probes its `nprobe` nearest cells and exact-reranks only
    * those members. The 100 TB story: the corpus is hash-partitioned by
    * cell id once, queries touch `nprobe/nlist` of the data, and the
    * centroid table (nlist × dim doubles) is a driver-side broadcast —
    * there is no all-pairs stage anywhere.
    *
    * The coarse quantizer trains DRIVER-SIDE on a bounded,
    * deterministically hash-selected sample (smallest xxhash64(id),
    * `trainSample` vectors — FAISS-style: the quantizer model is
    * nlist × dim doubles, and training it on a sample is standard
    * practice; the 100 TB corpus is never collected). kmeans++ seeding
    * + `iters` Lloyd rounds, all order-independent: the sample is
    * selected by hash, ties break by id, and local double math is
    * IEEE-deterministic.
    *
    * `excludeSelf` as in [[bruteForceTopK]]: set false for an
    * independent query table whose ids merely collide with corpus ids.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      queryVec: Column,
      queryId: Column,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 10,
      trainSample: Int = 4096,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // deliberately NOT cached: the projection is read twice (training
    // sample + cell assignment), but pinning a full copy of the corpus
    // vectors in storage memory for the session's lifetime is the wrong
    // trade at scale — two columnar scans are cheap, an unbounded
    // eternal cache is not (and repeated ivfTopK calls would stack one
    // copy per call)
    val base = corpus
      .select(corpusId.cast("long").as("corpus_id"), corpusVec.cast("array<double>").as("cv"))
      .filter(col("corpus_id").isNotNull) // null ids drop (see bruteForceTopK)

    // nearest `top` centroids per vector as a PURE MAP-SIDE expression:
    // the quantizer (nlist × dim doubles) rides into the plan as an
    // array literal and [[graft.functions.NearestCentroids]] computes
    // the argmax cells inside whole-stage codegen — the index build has
    // NO full-corpus exchange (the previous crossJoin(centroids) →
    // groupBy(id) formulation shuffled one (id, vector) row per corpus
    // row even after map-side partial aggregation). Ranking semantics
    // are unchanged: cosine desc, cid asc on ties, NaN ranks worst.
    def assignCells(df: DataFrame, idCol: String, vecCol: String, centroids: Column, top: Int) =
      df.select(col(idCol), col(vecCol),
        explode(graft.functions.GraftFunctions.nearestCentroids(col(vecCol), centroids, top))
          .as("cid"))

    // bounded training sample (hash-selected, id tie-break) → local
    // deterministic kmeans++ + Lloyd → tiny literal centroid table.
    // Null embeddings drop from the sample (the distributed paths
    // null-guard them too); ragged dimensions keep only the modal
    // length (count-majority, smaller-dim tie-break — deterministic),
    // since the quantizer's Lloyd sums need one dim and quantizer
    // QUALITY is all the sample affects
    val sample = trainSampleVectors(base, "corpus_id", "cv", trainSample)
    val dim = sample.head.length
    val cents = LocalKMeans.train(sample, nlist, iters)
    val centroids = typedLit(cents.map(_.toSeq).toSeq)

    // ragged/null corpus vectors drop at CELL-ASSIGNMENT time: a
    // non-modal-dim vector scores -Infinity against every centroid and
    // would deterministically land in cell 1 — at scale a corrupt
    // vector slice would pile into ONE hot cell for nothing (their
    // cosines are null and topKPerQuery filters them anyway, so the
    // result set is unchanged)
    val cells = assignCells(
      base.filter(size(col("cv")) === dim), "corpus_id", "cv", centroids, top = 1)
      .select(col("cid"), col("corpus_id"), col("cv"))
    val q = queries
      .select(queryId.cast("long").as("query_id"), queryVec.cast("array<double>").as("qv"))
      .filter(col("query_id").isNotNull)
    val probes = assignCells(q, "query_id", "qv", centroids, top = nprobe)
      .select(col("cid"), col("query_id"), col("qv"))
    // no dropDuplicates: top=1 puts each corpus row in exactly one
    // cell and a query's probe cids are distinct, so the cid join
    // yields each (query, corpus) pair at most once — deduping would
    // add a full exchange of the scored set for nothing
    val joined = cells.join(probes, "cid")
    val filtered =
      if (excludeSelf) joined.filter(col("query_id") =!= col("corpus_id")) else joined
    val scored = filtered
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Multi-table LSH approximate top-k: `tables` independent `bits`-bit
    * sign-hash tables (standard amplification — a true neighbor is
    * recalled if it collides in ANY table), candidates unioned across
    * tables, then exact cosine re-rank. Tune `bits` down / `tables` up
    * for recall, the reverse for speed; candidate volume per query is
    * ~`tables * n / 2^bits`. `excludeSelf` as in [[bruteForceTopK]]:
    * set false for an independent query table whose ids merely collide
    * with corpus ids.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      queryVec: Column,
      queryId: Column,
      k: Int,
      bits: Int = 6,
      tables: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // all tables' buckets in one generated pass (bit-equal to the
    // per-seed HOF hyperplaneBucket — asserted in spec); candidate
    // generation and dedup move only id pairs — vectors re-join by id
    // for scoring, so no embedding payload rides the bucket or dedup
    // exchanges
    // empty and null-element vectors land in bucket 0 of EVERY table by
    // kernel convention — at scale a corrupt slice would collide into
    // one hot bucket, tables-times amplified, then score to null and be
    // discarded anyway; drop them (and null ids, see bruteForceTopK)
    // before any bucket exists, like ivfTopK's modal-dim filter
    def wellFormed(v: Column): Column =
      size(v) > 0 && coalesce(!exists(v, x => x.isNull), lit(false))
    val cb = corpus.select(corpusId.cast("long").as("corpus_id"), corpusVec.cast("array<double>").as("cv"))
      .filter(col("corpus_id").isNotNull && wellFormed(col("cv")))
    val qb = queries.select(queryId.cast("long").as("query_id"), queryVec.cast("array<double>").as("qv"))
      .filter(col("query_id").isNotNull && wellFormed(col("qv")))
    def keyed(base: DataFrame, idCol: String, vecCol: String) =
      base.select(
        col(idCol),
        posexplode(graft.functions.GraftFunctions.hyperplaneBuckets(col(vecCol), bits, tables))
          .as(Seq("table", "bucket")))
    val joined = keyed(cb, "corpus_id", "cv")
      .join(keyed(qb, "query_id", "qv"), Seq("table", "bucket"))
    val candidates =
      (if (excludeSelf) joined.filter(col("query_id") =!= col("corpus_id")) else joined)
        .select(col("query_id"), col("corpus_id"))
        .dropDuplicates("query_id", "corpus_id")
    // no broadcast HINT on the query side: typical query sets are small
    // and AQE broadcasts them on its own, but a forced hint would OOM
    // the driver on a genuinely large query table
    val scored = candidates
      .join(cb, "corpus_id")
      .join(qb, "query_id")
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** All-corpus k-nearest-neighbor GRAPH — every vector is both query
    * and corpus ([[lshTopK]] with the corpus on both sides,
    * `excludeSelf`): the structure semantic clustering, graph-based
    * dedup (SemDeDup's neighbor lists), and diversity-aware selection
    * start from. Self-join candidate volume is the LSH-bucketed
    * ~`tables · n² / 2^bits` — the `bits`-vs-`tables` dial is the scale
    * lever (raise `bits` with corpus size to hold per-bucket occupancy
    * roughly constant; the multi-table union keeps recall). Per-node
    * result size is bounded by the [[TopKByScore]] aggregator — no
    * window over the scored set at any scale.
    */
  def knnGraph(
      df: DataFrame,
      vec: Column,
      id: Column,
      k: Int,
      bits: Int = 4,
      tables: Int = 16): DataFrame =
    lshTopK(df, df, vec, id, vec, id, k, bits, tables, excludeSelf = true)

  /** Johnson–Lindenstrauss RANDOM PROJECTION to `outDim` dimensions —
    * the cheap embedding-compression step before storage or coarse
    * search (Achlioptas 2003: a ±1 matrix preserves pairwise distances
    * within 1±ε for outDim = O(log n / ε²), no training pass needed —
    * the data-independent complement to q82's trained PQ). The matrix
    * derives from portable md5 bits (`md5("jl_<seed>_<k>_<j>") % 2`),
    * so an oracle re-derives every entry independently, and the
    * projection itself is the [[graft.functions.MatVecDots]] codegen
    * kernel — one fused left-to-right loop per row, bit-equal to
    * DuckDB's `list_dot_product`, ZERO shuffle at any corpus scale.
    *
    * Output: (vec_id, dim_idx, value) — one row per projected
    * component (scalar-only, gate-sortable). `value = dot(v, r_k) /
    * sqrt(outDim)`. Vectors whose length ≠ `inDim` (or with null
    * elements) project to null and emit NO rows — the kernel's
    * corrupt-input nulling.
    */
  def randomProject(
      df: DataFrame,
      vec: Column,
      id: Column,
      inDim: Int,
      outDim: Int,
      seed: Int = 7): DataFrame = {
    require(inDim >= 1 && outDim >= 1, s"dims must be >= 1, got $inDim -> $outDim")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = array((0 until outDim).map { k =>
      array((0 until inDim).map { j =>
        lit(if (md5Mod2(s"jl_${seed}_${k}_${j}")) 1.0 else -1.0)
      }: _*)
    }: _*)
    val scale = lit(math.sqrt(outDim.toDouble))
    df.select(
      id.cast("long").as("vec_id"),
      graft.functions.GraftFunctions.matVec(vec.cast("array<double>"), rows).as("proj"))
      .filter(col("vec_id").isNotNull)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim_idx", "dot")))
      .select(col("vec_id"), col("dim_idx").cast("int").as("dim_idx"),
        (col("dot") / scale).as("value"))
  }

  /** True iff the 32-bit md5 prefix of `s` is even — the portable
    * coin both [[randomProject]] and its oracle flip.
    */
  private def md5Mod2(s: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 2 == 0
  }

  /** Symmetric per-vector int8 quantization of an embedding column —
    * the storage/bandwidth prep for vector serving (4× smaller than
    * float32, 8× than float64). Returns struct(scale, qvec) where
    * `scale = max|x| / 127` and `qvec_i = floor(x_i * 127 / max|x| +
    * 0.5)` in [-127, 127] (dequantize: `x ≈ q * scale`).
    *
    * Rounding is DEFINED as `floor(v + 0.5)` — not the engine's
    * `round()` — because half-up vs half-away-from-zero differs
    * between engines and this expression is bit-portable everywhere.
    * Zero vectors quantize to all-zeros with scale 0; a null vector
    * yields null scale and qvec. Pure map-side array arithmetic, no
    * shuffle at any scale.
    */
  def quantizeInt8(vec: Column): Column = {
    val v = transform(vec, x => x.cast("double"))
    val maxabs = array_max(transform(v, x => abs(x)))
    val qvec = when(vec.isNull, lit(null))
      .when(maxabs === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => floor(x * lit(127.0) / maxabs + lit(0.5)).cast("int")))
    struct((maxabs / lit(127.0)).as("scale"), qvec.as("qvec"))
  }

  /** Per-DIMENSION scalar quantization training (FAISS
    * `ScalarQuantizer` QT_8bit shape): one corpus pass learns each
    * dimension's `[lo, hi]` range; [[sq8Codes]] then maps values to
    * byte codes `floor((x - lo) · 255 / (hi - lo) + 0.5)`. The
    * complement to [[quantizeInt8]]'s per-VECTOR scale: per-dim ranges
    * adapt to anisotropic embeddings (one wild dimension no longer
    * flattens every other dimension's resolution).
    *
    * Scale: the training pass is ONE partial-aggregable aggregation —
    * 2·dim min/max expressions map-side-combine to a single row, so
    * nothing but one 2·dim-double row ever reaches the driver (no
    * posexplode: exploding N·dim rows just to group them back by index
    * would shuffle the whole corpus). Ragged or null-element vectors
    * fail loudly — a dimension trained on half the corpus would
    * silently misquantize the rest.
    */
  def sq8Train(df: DataFrame, vec: Column): (Array[Double], Array[Double]) = {
    val v = df.select(transform(vec, _.cast("double")).as("v"))
      .filter(col("v").isNotNull)
    val head = v.select(size(col("v")).as("d")).limit(1).collect()
    require(head.nonEmpty, "sq8Train: no non-null vectors to train on")
    val dim = head(0).getInt(0)
    require(dim > 0, "sq8Train: zero-length vectors cannot train a quantizer")
    val aggs =
      Seq(min(size(col("v"))).as("dmin"), max(size(col("v"))).as("dmax")) ++
        (1 to dim).flatMap(i => Seq(
          min(element_at(col("v"), i)).as(s"lo$i"),
          max(element_at(col("v"), i)).as(s"hi$i"),
          // min/max silently SKIP nulls — without this count a
          // half-null dimension would train its range on the non-null
          // half and misquantize the rest, exactly the hazard the
          // ragged guard exists for
          sum(when(element_at(col("v"), i).isNull, 1L).otherwise(0L)).as(s"nn$i")))
    val row = v.agg(aggs.head, aggs.tail: _*).first()
    require(row.getInt(0) == dim && row.getInt(1) == dim,
      s"sq8Train: ragged vector lengths [${row.getInt(0)}, ${row.getInt(1)}] — " +
        s"all vectors must have the trained dimension $dim")
    val lo = Array.tabulate(dim) { i =>
      require(row.getLong(4 + 3 * i) == 0L,
        s"sq8Train: dimension $i has ${row.getLong(4 + 3 * i)} null element(s) — " +
          "a range trained on a subset would silently misquantize the rest")
      row.getDouble(2 + 3 * i)
    }
    val hi = Array.tabulate(dim)(i => row.getDouble(3 + 3 * i))
    (lo, hi)
  }

  /** Map-side SQ8 encoding against trained per-dim ranges: code_i =
    * `floor((x_i − lo_i) · 255 / (hi_i − lo_i) + 0.5)` (∈ [0, 255] for
    * in-range values by construction — no clamp, so the arithmetic
    * stays the exact expression a SQL oracle replays); a degenerate
    * dimension (hi = lo) codes 0. Rounding is floor(v + 0.5) for the
    * same cross-engine portability as [[quantizeInt8]]. Pure map-side:
    * ranges ride along as array literals, nothing shuffles.
    */
  def sq8Codes(vec: Column, lo: Array[Double], hi: Array[Double]): Column = {
    require(lo.length == hi.length && lo.nonEmpty,
      s"sq8Codes: lo/hi ranges must be equal-length and non-empty")
    val loL = typedLit(lo.toSeq)
    val hiL = typedLit(hi.toSeq)
    val v = transform(vec, x => x.cast("double"))
    when(vec.isNull, lit(null))
      .when(size(vec) =!= lit(lo.length), raise_error(concat(
        lit(s"sq8Codes: vector length "), size(vec).cast("string"),
        lit(s" != trained dimension ${lo.length}"))))
      .otherwise(
      zip_with(v, sequence(lit(0), lit(lo.length - 1)), (x, i) => {
        val l = element_at(loL, i + 1)
        val h = element_at(hiL, i + 1)
        when(h === l, lit(0))
          .otherwise(floor((x - l) * lit(255.0) / (h - l) + lit(0.5)).cast("int"))
      }))
  }

  /** Product-quantization codebook training (cosine metric — matching
    * this engine's ANN stack): the vector space splits into `m`
    * equal-width subspaces, each getting its own `codes`-centroid
    * codebook trained by the same bounded hash-sample + deterministic
    * k-means as the IVF coarse quantizer. Returns
    * `codebooks(sub)(code) = centroid` with every subspace codebook
    * padded/derived from the sample's MODAL dimension, which must be
    * divisible by `m`.
    *
    * PQ is the vector-compression step past [[quantizeInt8]]: m codes
    * of log2(codes) bits replace the full vector (64-dim float64 at
    * m=4, codes=16 → 2 bytes/vector, 256×), which is what makes a
    * 100 TB embedding corpus servable from memory.
    */
  def pqTrain(
      df: DataFrame,
      vec: Column,
      id: Column,
      m: Int = 4,
      codes: Int = 16,
      iters: Int = 10,
      trainSample: Int = 4096): Seq[Seq[Array[Double]]] = {
    require(m >= 1, s"pqTrain needs m >= 1 subspaces, got $m")
    require(codes >= 2, s"pqTrain needs >= 2 codes per subspace, got $codes")
    val base = df
      .select(id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"))
      .filter(col("vec_id").isNotNull)
    val sample = trainSampleVectors(base, "vec_id", "v", trainSample)
    val dim = sample.head.length
    require(dim % m == 0,
      s"PQ: modal dimension $dim is not divisible by m=$m subspaces")
    val subdim = dim / m
    (0 until m).map { s =>
      val sub = sample.map(_.slice(s * subdim, (s + 1) * subdim))
      LocalKMeans.train(sub, codes, iters).toSeq
    }
  }

  /** Map-side PQ code assignment: `(vec_id, sub, code)` per vector and
    * subspace, `code` = the subspace codebook's nearest centroid by
    * cosine (ties → lowest code, the [[graft.functions.NearestCentroids]]
    * rule). The codebooks ride into the plan as array literals, so
    * encoding is pure whole-stage codegen — zero shuffle at any corpus
    * scale. Vectors whose length differs from the trained dimension are
    * dropped (same corrupt-input policy as the IVF cell assignment).
    */
  def pqAssign(
      df: DataFrame,
      vec: Column,
      id: Column,
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty PQ codebooks")
    val subdim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subdim)),
      "PQ codebooks must share one subspace dimension")
    val m = codebooks.size
    val dim = subdim * m
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val base = df
      .select(id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"))
      .filter(col("vec_id").isNotNull && size(col("v")) === dim)
    val codeCols = (0 until m).map { s =>
      val sv = slice(col("v"), s * subdim + 1, subdim)
      val cb = typedLit(codebooks(s).map(_.toSeq))
      // NearestCentroids emits 1-based positions; PQ codes are 0-based
      struct(lit(s).as("sub"),
        (element_at(graft.functions.GraftFunctions.nearestCentroids(spark, sv, cb, 1), 1)
          - lit(1)).as("code"))
    }
    base.select(col("vec_id"), explode(array(codeCols: _*)).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.code").as("code"))
  }

  /** [[pqAssign]] without the explode: `(vec_id, codes array<int>)`, one
    * row per vector with its m 0-based codes in subspace order — the
    * layout [[pqAdcTopK]] scans. Same map-side zero-shuffle plan and
    * same corrupt-dim drop.
    */
  def pqCodesArray(
      df: DataFrame,
      vec: Column,
      id: Column,
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty PQ codebooks")
    val subdim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subdim)),
      "PQ codebooks must share one subspace dimension")
    val m = codebooks.size
    val dim = subdim * m
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val base = df
      .select(id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"))
      .filter(col("vec_id").isNotNull && size(col("v")) === dim)
    val codeCols = (0 until m).map { s =>
      val sv = slice(col("v"), s * subdim + 1, subdim)
      val cb = typedLit(codebooks(s).map(_.toSeq))
      // NearestCentroids emits 1-based positions; PQ codes are 0-based
      element_at(graft.functions.GraftFunctions.nearestCentroids(spark, sv, cb, 1), 1) - lit(1)
    }
    base.select(col("vec_id"), array(codeCols: _*).as("codes"))
  }

  // driver-side dot/norm helpers for the ADC lookup tables — SAME
  // left-to-right double accumulation as the CosineSimilarity kernel and
  // DuckDB's list_dot_product, so LUT entries are bit-equal to what
  // either engine would compute from the raw arrays
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** PQ ADC (asymmetric distance computation) top-k: every corpus
    * vector is represented ONLY by its m codes; per query, the
    * approximate cosine is
    * `sum_s dot(q_s, c_{s,code_s}) / (|q| * sqrt(sum_s |c_{s,code_s}|^2))`
    * — the query side stays exact (asymmetric), the corpus side is its
    * quantized reconstruction.
    *
    * The 100 TB story: all per-(query, sub, code) dot products and the
    * per-(sub, code) squared norms are precomputed DRIVER-SIDE into
    * tiny lookup tables (Q × m × codes doubles) that ride into the plan
    * as array literals, so scoring is pure `element_at` arithmetic
    * inside whole-stage codegen over one corpus scan — no join, no
    * corpus shuffle; only the bounded per-partition top-k partials
    * (≤ Q × k rows each) move, exactly like [[bruteForceTopK]]'s
    * aggregation. This is the FAISS IVFADC scoring loop re-expressed as
    * a Catalyst plan.
    *
    * Ranking matches the rest of the ANN stack: score desc, corpus id
    * asc on ties, NaN (zero-norm query or all-zero reconstruction)
    * ranks worst. Queries with zero or mismatched-dimension vectors are
    * rejected driver-side — an all-NaN ranking for them would be noise
    * presented as neighbors.
    */
  def pqAdcTopK(
      corpus: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      queries: Seq[(Long, Array[Double])],
      codebooks: Seq[Seq[Array[Double]]],
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty PQ codebooks")
    val subdim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subdim)),
      "PQ codebooks must share one subspace dimension")
    val m = codebooks.size
    val dim = subdim * m
    require(queries.nonEmpty, "pqAdcTopK needs at least one query")
    queries.foreach { case (qid, qv) =>
      require(qv != null && qv.length == dim,
        s"query $qid: vector dimension ${Option(qv).map(_.length).orNull} != trained $dim")
      require(dotSeq(qv, qv) > 0.0, s"query $qid: zero-norm vector cannot rank neighbors")
    }
    // per-(sub, code) squared reconstruction norms — shared across queries
    val norm2: Seq[Seq[Double]] = codebooks.map(_.map(c => dotSeq(c, c)).toSeq)
    val coded = pqCodesArray(corpus, corpusVec, corpusId, codebooks)
    val codeAt = (s: Int) => element_at(col("codes"), s + 1) + lit(1) // 1-based for element_at
    val den2 = (0 until m)
      .map(s => element_at(typedLit(norm2(s)), codeAt(s)))
      .reduceLeft(_ + _)
    val perQuery = queries.map { case (qid, qv) =>
      val qnorm = math.sqrt(dotSeq(qv, qv))
      val lut: Seq[Seq[Double]] = (0 until m).map { s =>
        val qs = qv.slice(s * subdim, (s + 1) * subdim)
        codebooks(s).map(c => dotSeq(qs, c)).toSeq
      }
      val num = (0 until m)
        .map(s => element_at(typedLit(lut(s)), codeAt(s)))
        .reduceLeft(_ + _)
      // guarded division: ANSI mode (Spark 4 default) throws on /0 —
      // an all-zero reconstruction scores NaN and ranks worst instead
      val den = lit(qnorm) * sqrt(den2)
      struct(lit(qid).as("query_id"),
        when(den > 0.0, num / den).otherwise(lit(Double.NaN)).as("score"))
    }
    val scored0 = coded
      .select(col("vec_id").as("corpus_id"), explode(array(perQuery: _*)).as("e"))
      .select(col("e.query_id").as("query_id"), col("corpus_id"), col("e.score").as("cosine"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("corpus_id")) else scored0
    topKPerQuery(scored, k).withColumnRenamed("cosine", "score")
  }

  /** Driver-side twin of [[graft.functions.CentroidKernels.nearestCentroids]]
    * for the bounded query set: same one-loop cosine accumulation, same
    * NaN/dimension-mismatch → worst ranking, same repeated-argmax
    * selection with ties toward the smaller centroid id, same 1-based
    * cell ids — so a query's probe list is exactly what the kernel
    * would emit for its vector.
    */
  private def nearestCellsLocal(
      v: Array[Double], cents: Seq[Array[Double]], top: Int): Seq[Int] = {
    val sims = cents.map { c =>
      if (c == null || c.length != v.length) Double.NegativeInfinity
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) {
          dot += v(i) * c(i); na += v(i) * v(i); nb += c(i) * c(i); i += 1
        }
        val s = dot / (math.sqrt(na) * math.sqrt(nb))
        if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      }
    }
    val used = new Array[Boolean](cents.size)
    (0 until math.min(top, cents.size)).map { _ =>
      var best = -1; var bestS = Double.NegativeInfinity
      var c = 0
      while (c < cents.size) {
        if (!used(c) && (best == -1 || sims(c) > bestS)) { best = c; bestS = sims(c) }
        c += 1
      }
      used(best) = true
      best + 1
    }
  }

  /** IVF-PQ top-k (FAISS IVFADC, `by_residual=false` flavor, as one
    * Catalyst scan): the coarse quantizer routes every corpus vector to
    * a cell map-side ([[graft.functions.NearestCentroids]] over the
    * centroid literal), rows whose cell no query probes are DROPPED
    * before any PQ work, and survivors are scored by the same
    * per-query ADC lookup tables as [[pqAdcTopK]] — gated per query on
    * `cell ∈ probes(query)`.
    *
    * The 100 TB story composes both halves: the corpus is touched in
    * ONE scan with no join and no corpus shuffle (cell id, codes,
    * scores are all codegen'd literal arithmetic), the cell filter
    * discards `1 - nprobe/nlist` of it before the m argmax code
    * assignments run, and only bounded per-partition top-k partials
    * move. Raw-vector PQ (not residual) keeps every score independently
    * re-derivable from (centroids, codebooks) alone — the oracle
    * recomputes routing, codes, and every ADC score from the emitted
    * model with no access to this engine's intermediates.
    *
    * Ranking: score desc, corpus id asc, NaN worst ([[pqAdcTopK]]).
    * Zero-norm or wrong-dimension query vectors are rejected loudly;
    * wrong-LENGTH corpus vectors drop as in [[pqCodesArray]]. A
    * trained-length corpus vector with null/NaN elements is RETAINED:
    * every cosine is NaN → -inf, so the all-ties argmax routes it
    * deterministically to cell 1 and code 0 per subspace, and it gets
    * a plausible ADC score — the oracle mirrors exactly that tie rule
    * (NULL cos sorts last, ties to the smallest id), so parity holds
    * by construction. Callers wanting such rows gone must filter
    * element-level corruption upstream.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      queries: Seq[(Long, Array[Double])],
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]],
      k: Int,
      nprobe: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty PQ codebooks")
    val subdim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subdim)),
      "PQ codebooks must share one subspace dimension")
    val m = codebooks.size
    val dim = subdim * m
    require(centroids.nonEmpty, "ivfPqTopK needs at least one coarse centroid")
    require(centroids.forall(c => c != null && c.length == dim),
      s"coarse centroids must have the PQ dimension $dim")
    require(nprobe >= 1, s"ivfPqTopK needs nprobe >= 1, got $nprobe")
    require(queries.nonEmpty, "ivfPqTopK needs at least one query")
    queries.foreach { case (qid, qv) =>
      require(qv != null && qv.length == dim,
        s"query $qid: vector dimension ${Option(qv).map(_.length).orNull} != trained $dim")
      require(dotSeq(qv, qv) > 0.0, s"query $qid: zero-norm vector cannot rank neighbors")
    }
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)

    val probes: Map[Long, Seq[Int]] = queries.map { case (qid, qv) =>
      qid -> nearestCellsLocal(qv, centroids, nprobe)
    }.toMap
    // cells at least one query probes — the map-side IVF prune; sorted
    // for a deterministic isin literal list
    val probedUnion = probes.values.flatten.toSeq.distinct.sorted

    val base = corpus
      .select(corpusId.cast("long").as("corpus_id"), corpusVec.cast("array<double>").as("v"))
      .filter(col("corpus_id").isNotNull && size(col("v")) === dim)
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    val withCell = base
      .withColumn("cell",
        element_at(graft.functions.GraftFunctions.nearestCentroids(spark, col("v"), centLit, 1), 1))
      .filter(col("cell").isin(probedUnion.map(Integer.valueOf): _*))
    // PQ codes only for rows that survived routing — same argmax rule
    // and 0-based codes as pqCodesArray
    val codeCols = (0 until m).map { s =>
      val sv = slice(col("v"), s * subdim + 1, subdim)
      val cb = typedLit(codebooks(s).map(_.toSeq))
      element_at(graft.functions.GraftFunctions.nearestCentroids(spark, sv, cb, 1), 1) - lit(1)
    }
    val coded = withCell.select(
      col("corpus_id"), col("cell"), array(codeCols: _*).as("codes"))

    val norm2: Seq[Seq[Double]] = codebooks.map(_.map(c => dotSeq(c, c)).toSeq)
    val codeAt = (s: Int) => element_at(col("codes"), s + 1) + lit(1)
    val den2 = (0 until m)
      .map(s => element_at(typedLit(norm2(s)), codeAt(s)))
      .reduceLeft(_ + _)
    val perQuery = queries.map { case (qid, qv) =>
      val qnorm = math.sqrt(dotSeq(qv, qv))
      val lut: Seq[Seq[Double]] = (0 until m).map { s =>
        val qs = qv.slice(s * subdim, (s + 1) * subdim)
        codebooks(s).map(c => dotSeq(qs, c)).toSeq
      }
      val num = (0 until m)
        .map(s => element_at(typedLit(lut(s)), codeAt(s)))
        .reduceLeft(_ + _)
      val den = lit(qnorm) * sqrt(den2)
      // the per-query probe gate: a corpus row scores for THIS query
      // only if its cell is probed — null otherwise, dropped below
      when(col("cell").isin(probes(qid).map(Integer.valueOf): _*),
        struct(lit(qid).as("query_id"),
          when(den > 0.0, num / den).otherwise(lit(Double.NaN)).as("score")))
    }
    val scored0 = coded
      .select(col("corpus_id"),
        explode(filter(array(perQuery: _*), e => e.isNotNull)).as("e"))
      .select(col("e.query_id").as("query_id"), col("corpus_id"), col("e.score").as("cosine"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("corpus_id")) else scored0
    topKPerQuery(scored, k).withColumnRenamed("cosine", "score")
  }

  /** Residual PQ codebook training (FAISS `by_residual=true`, the
    * library default): each sample vector routes to its coarse cell
    * (cosine — the SAME routing the search uses), the residual
    * `v - centroid(cell)` is what gets quantized, and the per-subspace
    * codebooks train with L2 k-means ([[LocalKMeansL2]]) because
    * residuals cluster around the origin where cosine is undefined
    * noise. Residual encoding is the fidelity step past raw-vector PQ
    * ([[pqTrain]]): the codebooks only need to cover the within-cell
    * spread instead of the whole space, so the same bit budget buys a
    * finer reconstruction.
    */
  def pqTrainResidual(
      df: DataFrame,
      vec: Column,
      id: Column,
      centroids: Seq[Array[Double]],
      m: Int = 4,
      codes: Int = 16,
      iters: Int = 10,
      trainSample: Int = 4096): Seq[Seq[Array[Double]]] = {
    require(m >= 1, s"pqTrainResidual needs m >= 1 subspaces, got $m")
    require(codes >= 2, s"pqTrainResidual needs >= 2 codes per subspace, got $codes")
    require(centroids.nonEmpty, "pqTrainResidual needs coarse centroids")
    val dim = centroids.head.length
    require(centroids.forall(c => c != null && c.length == dim),
      "coarse centroids must share one dimension")
    require(dim % m == 0,
      s"PQ: coarse dimension $dim is not divisible by m=$m subspaces")
    val base = df
      .select(id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"))
      .filter(col("vec_id").isNotNull)
    val sample = trainSampleVectors(base, "vec_id", "v", trainSample)
      .filter(_.length == dim)
    require(sample.nonEmpty,
      s"quantizer training sample is empty at the coarse dimension $dim")
    val residuals = sample.map { v =>
      val cell = nearestCellsLocal(v, centroids, 1).head // 1-based
      val c = centroids(cell - 1)
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = v(i) - c(i); i += 1 }
      r
    }
    val subdim = dim / m
    (0 until m).map { s =>
      val sub = residuals.map(_.slice(s * subdim, (s + 1) * subdim))
      LocalKMeansL2.train(sub, codes, iters).toSeq
    }
  }

  /** IVF-PQ top-k with RESIDUAL encoding (FAISS IVFADC,
    * `by_residual=true` — the FAISS default; [[ivfPqTopK]] is the
    * `false` flavor): corpus vectors route to coarse cells exactly as
    * in [[ivfPqTopK]], but the PQ codes quantize the residual
    * `v - centroid(cell)` per subspace (squared-L2 assignment,
    * [[graft.functions.CentroidKernels.nearestCentroidsL2]]), and ADC
    * scores the reconstruction `centroid(cell) + codeword`:
    *
    *   cos(q, u) = (dot(q, cent_c) + Σ_s dot(q_s, cw_s))
    *             / (|q| · sqrt(Σ_s (|cent_c_s|² + 2·dot(cent_c_s, cw_s) + |cw_s|²)))
    *
    * Everything per-(query, cell, code) precomputes DRIVER-SIDE into
    * literal lookup tables (Q×nlist + Q×m×codes + m×nlist×codes
    * doubles), so the plan is STILL one corpus scan with zero joins
    * and zero corpus shuffle — routing prunes unprobed cells before
    * any PQ work, scoring is `element_at` arithmetic in whole-stage
    * codegen, and only bounded top-k partials move. Every float
    * expression (dots left-to-right, `a - 2*b + c`, `a + 2*b + c`,
    * left-nested Σ) matches what a SQL oracle writes with
    * `list_dot_product`, so cells, codes, and scores re-derive
    * bit-for-bit from the emitted (centroids, codebooks) model alone.
    *
    * Ranking and corrupt-input policy are [[ivfPqTopK]]'s: score desc,
    * corpus id asc, NaN worst; zero-norm/wrong-dimension queries
    * rejected loudly; wrong-length corpus vectors drop; trained-length
    * vectors with null elements are retained and deterministically
    * routed (cell 1, and L2's all-+inf tie → code 0 per subspace).
    */
  def ivfPqResidualTopK(
      corpus: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      queries: Seq[(Long, Array[Double])],
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]],
      k: Int,
      nprobe: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty PQ codebooks")
    val subdim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subdim)),
      "PQ codebooks must share one subspace dimension")
    val m = codebooks.size
    val dim = subdim * m
    require(centroids.nonEmpty, "ivfPqResidualTopK needs at least one coarse centroid")
    require(centroids.forall(c => c != null && c.length == dim),
      s"coarse centroids must have the PQ dimension $dim")
    require(nprobe >= 1, s"ivfPqResidualTopK needs nprobe >= 1, got $nprobe")
    require(queries.nonEmpty, "ivfPqResidualTopK needs at least one query")
    queries.foreach { case (qid, qv) =>
      require(qv != null && qv.length == dim,
        s"query $qid: vector dimension ${Option(qv).map(_.length).orNull} != trained $dim")
      require(dotSeq(qv, qv) > 0.0, s"query $qid: zero-norm vector cannot rank neighbors")
    }
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)

    val probes: Map[Long, Seq[Int]] = queries.map { case (qid, qv) =>
      qid -> nearestCellsLocal(qv, centroids, nprobe)
    }.toMap
    val probedUnion = probes.values.flatten.toSeq.distinct.sorted

    val base = corpus
      .select(corpusId.cast("long").as("corpus_id"), corpusVec.cast("array<double>").as("v"))
      .filter(col("corpus_id").isNotNull && size(col("v")) === dim)
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    val withCell = base
      .withColumn("cell",
        element_at(graft.functions.GraftFunctions.nearestCentroids(spark, col("v"), centLit, 1), 1))
      .filter(col("cell").isin(probedUnion.map(Integer.valueOf): _*))
    // residual codes for survivors only: r_s = v_s - cent(cell)_s
    // elementwise (zip_with — codegen), then the L2 argmin kernel
    val centOfCell = element_at(centLit, col("cell"))
    val codeCols = (0 until m).map { s =>
      val sv = slice(col("v"), s * subdim + 1, subdim)
      val cs = slice(centOfCell, s * subdim + 1, subdim)
      val rs = zip_with(sv, cs, (x, y) => x - y)
      val cb = typedLit(codebooks(s).map(_.toSeq))
      element_at(graft.functions.GraftFunctions.nearestCentroidsL2(spark, rs, cb, 1), 1) - lit(1)
    }
    val coded = withCell.select(
      col("corpus_id"), col("cell"), array(codeCols: _*).as("codes"))

    // |cent_c_s|² + 2·dot(cent_c_s, cw) + |cw|² per (sub, cell, code) —
    // the reconstruction's per-subspace squared norm, cell-dependent
    // because the codeword rides on top of the cell centroid
    val normTerm: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      centroids.map { cent =>
        val cs = cent.slice(s * subdim, (s + 1) * subdim)
        codebooks(s).map(cw => dotSeq(cs, cs) + 2.0 * dotSeq(cs, cw) + dotSeq(cw, cw)).toSeq
      }.toSeq
    }
    val codeAt = (s: Int) => element_at(col("codes"), s + 1) + lit(1)
    val den2 = (0 until m)
      .map(s => element_at(element_at(typedLit(normTerm(s)), col("cell")), codeAt(s)))
      .reduceLeft(_ + _)
    val perQuery = queries.map { case (qid, qv) =>
      val qnorm = math.sqrt(dotSeq(qv, qv))
      val qCent: Seq[Double] = centroids.map(c => dotSeq(qv, c))
      val lut: Seq[Seq[Double]] = (0 until m).map { s =>
        val qs = qv.slice(s * subdim, (s + 1) * subdim)
        codebooks(s).map(cw => dotSeq(qs, cw)).toSeq
      }
      val num = (element_at(typedLit(qCent), col("cell")) +:
        (0 until m).map(s => element_at(typedLit(lut(s)), codeAt(s))))
        .reduceLeft(_ + _)
      val den = lit(qnorm) * sqrt(den2)
      when(col("cell").isin(probes(qid).map(Integer.valueOf): _*),
        struct(lit(qid).as("query_id"),
          when(den > 0.0, num / den).otherwise(lit(Double.NaN)).as("score")))
    }
    val scored0 = coded
      .select(col("corpus_id"),
        explode(filter(array(perQuery: _*), e => e.isNotNull)).as("e"))
      .select(col("e.query_id").as("query_id"), col("corpus_id"), col("e.score").as("cosine"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("corpus_id")) else scored0
    topKPerQuery(scored, k).withColumnRenamed("cosine", "score")
  }

  /** EMBEDDING-TRUNCATION RECALL@k — the Matryoshka audit: how much of
    * the full-dimension exact top-k survives when vectors are cut to
    * their first `dims` coordinates? The decision metric behind
    * "can we ship the 256-dim prefix instead of the 1024-dim vector"
    * (MRL, Kusupati et al. 2022): both sides run the same exact
    * [[bruteForceTopK]] (one corpus scan each, broadcast query set,
    * bounded top-k aggregators — no shuffle of the corpus), and
    * recall is the per-query overlap of the two id sets.
    *
    * Exact integers + one pinned division — hash-exact (the cosine
    * SCORES stay internal; only memberships compare, so float
    * tolerance never enters). n_full < k for tiny corpora is handled:
    * recall divides by the attained set size, not k.
    *
    * Output per query: (query_id, n_full, n_common, recall).
    */
  def truncationRecall(
      corpus: DataFrame,
      queries: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      queryVec: Column,
      queryId: Column,
      k: Int,
      dims: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(k >= 1, s"k must be >= 1, got $k")
    val full = bruteForceTopK(
      corpus, queries, corpusVec, corpusId, queryVec, queryId, k, excludeSelf)
    val trunc = bruteForceTopK(
      corpus, queries,
      slice(corpusVec.cast("array<double>"), 1, dims), corpusId,
      slice(queryVec.cast("array<double>"), 1, dims), queryId, k, excludeSelf)
    val f = full.select(col("query_id"), col("corpus_id"))
    val t = trunc.select(col("query_id").as("tq"), col("corpus_id").as("tc"))
    f.join(t, col("query_id") === col("tq") && col("corpus_id") === col("tc"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_full"),
        sum(when(col("tq").isNotNull, 1L).otherwise(0L)).as("n_common"))
      .select(col("query_id"), col("n_full"), col("n_common"),
        (col("n_common").cast("double") / col("n_full").cast("double"))
          .as("recall"))
  }

  /** DIVERGENCE FRONTIER over quantized embeddings (the MAUVE recipe,
    * Pillutla et al. 2021, with a deterministic quantizer) — the
    * distribution-level eval for generated corpora that pointwise
    * metrics (BLEU/ROUGE/WER score ONE pair) cannot express: compare
    * the P side (e.g. model samples) against the Q side (e.g. human
    * text) as DISTRIBUTIONS over embedding-space cells, reporting
    * both KL(P ∥ R_λ) (quality: P puts mass where Q has none) and
    * KL(Q ∥ R_λ) (coverage: Q regions P never reaches) against the
    * mixtures R_λ = λP + (1−λ)Q across a λ grid — the frontier's two
    * arms, which a single symmetric divergence (q367 JS = the λ = ½
    * point) collapses.
    *
    * Determinism contract: the quantizer anchors are the `anchors`
    * LOWEST-id embeddings (a fixed choice both engines can re-derive;
    * MAUVE's k-means quantizer would need its own convergence
    * certificate), assignment is the L2 kernel's exact dot-product
    * decomposition (`dot(v,v) − 2·dot(v,c) + dot(c,c)`, ties to the
    * lower anchor — bit-replayable via three `list_dot_product`s, the
    * q88 discipline), λ = j/`lambdaDen` are exact dyadic rationals,
    * and each KL is a pinned fold over the ≤ `anchors` cells in cell
    * order. Cell counts are exact integers (hash-portable); the KL
    * doubles carry ln and gate at 1e-9.
    *
    * Scale shape: one kernel pass assigns cells map-side (anchors
    * ride as a literal), one partial-aggregable (cell, side) count,
    * and everything after runs on ≤ anchors rows. Output: one row per
    * λ — (lam_num, lam_den, n_p, n_q, n_cells, kl_p, kl_q).
    */
  def divergenceFrontier(
      df: DataFrame,
      vecId: Column,
      vec: Column,
      sideIsP: Column,
      anchors: Int = 16,
      lambdaDen: Int = 8): DataFrame = {
    require(anchors >= 2 && anchors <= 256,
      s"anchors must be in [2, 256], got $anchors")
    require(lambdaDen >= 2 && lambdaDen <= 64,
      s"lambdaDen must be in [2, 64], got $lambdaDen")
    val spark = df.sparkSession
    val idG = when(vecId.isNull, raise_error(lit(
      "divergenceFrontier: vec id must be non-null"))).otherwise(vecId.cast("long"))
    val pG = when(sideIsP.cast("boolean").isNull, raise_error(lit(
      "divergenceFrontier: side flag must be a non-null boolean")))
      .otherwise(sideIsP.cast("boolean"))
    val base = df.select(idG.as("id"), vec.cast("array<double>").as("v"),
      pG.as("is_p"))
    // bounded: exactly `anchors` rows by the limit
    val anchorRows = base.orderBy(col("id")).limit(anchors)
      .select(col("v")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    require(anchorRows.size >= 2,
      s"divergenceFrontier: need at least 2 embeddings, got ${anchorRows.size}")
    val centLit = typedLit(anchorRows)
    val hist = base
      .select(col("is_p"),
        element_at(graft.functions.GraftFunctions.nearestCentroidsL2(
          spark, col("v"), centLit, 1), 1).as("cell"))
      .groupBy(col("cell")).agg(
        sum(when(col("is_p"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("is_p"), 0L).otherwise(1L)).as("cq"))
    val tot = hist.agg(
      sum(col("cp")).as("np"), sum(col("cq")).as("nq"),
      count(lit(1)).as("ncells"))
    // bounded: ≤ anchors cells
    val cellsArr = hist.agg(
      sort_array(collect_list(struct(col("cell"), col("cp"), col("cq"))))
        .as("cs"))
    val guardedNp = when(col("np") === 0L || col("nq") === 0L,
      raise_error(lit("divergenceFrontier: one side is empty — the " +
        "frontier is undefined; check the side predicate")))
      .otherwise(col("np"))
    val grid = cellsArr.crossJoin(broadcast(tot))
      .select(col("cs"), guardedNp.as("np"), col("nq"), col("ncells"),
        explode(sequence(lit(1), lit(lambdaDen - 1))).as("j"))
    val lam = col("j").cast("double") / lit(lambdaDen.toDouble)
    def klFold(own: String, other: String, ownN: Column, otherN: Column,
        ownLam: Column, otherLam: Column): Column =
      aggregate(col("cs"), lit(0.0), (acc, c) => {
        val po = c.getField(own).cast("double") / ownN.cast("double")
        val qo = c.getField(other).cast("double") / otherN.cast("double")
        acc + when(c.getField(own) > 0L,
          po * log(po / (ownLam * po + otherLam * qo))).otherwise(lit(0.0))
      })
    grid.select(
      col("j").cast("long").as("lam_num"),
      lit(lambdaDen.toLong).as("lam_den"),
      col("np").as("n_p"), col("nq").as("n_q"),
      col("ncells").as("n_cells"),
      klFold("cp", "cq", col("np"), col("nq"), lam, lit(1.0) - lam).as("kl_p"),
      klFold("cq", "cp", col("nq"), col("np"), lit(1.0) - lam, lam).as("kl_q"))
      .orderBy(col("lam_num"))
  }
}

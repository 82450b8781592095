package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines — exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design notes (the 100 TB story):
  *  - exact dedup is ONE hash-partitioned aggregation on a 16-byte key —
  *    the only shuffle moves (hash, id), never document text;
  *  - pair generation is always blocked (shared shingle / LSH band /
  *    hyperplane bucket) — never an O(n²) cross join; hot blocks are
  *    capped (`maxBlockSize`) the way production MinHash pipelines drop
  *    stop-shingles, keeping worst-case pair counts bounded;
  *  - candidate verification re-joins compact per-doc features by id, so
  *    verification cost is proportional to candidate count, not corpus
  *    size.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per normalized-content hash. */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(TextAnalysis.fingerprint(text).as("fp"), id.cast("long").as("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-n-gram shingle sets per doc. */
  private def shingleSets(df: DataFrame, text: Column, id: Column, n: Int): DataFrame =
    df.select(id.cast("long").as("doc_id"), TextAnalysis.shingles(text, n).as("sh"))

  /** Exact n-gram Jaccard near-dup pairs via shared-shingle blocking:
    * explode → drop shingles shared by more than `maxBlockSize` docs
    * (stop-shingles contribute pairs quadratically but evidence
    * marginally) → pair-count common shingles → filter by true Jaccard.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      n: Int,
      threshold: Double,
      maxBlockSize: Int = 1000): DataFrame = {
    val sets = shingleSets(df, text, id, n).cache()
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val posting = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val blocked = posting
      .withColumn("block_n", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("block_n") <= maxBlockSize)
      .drop("block_n")
    val common = blocked.as("a")
      .join(blocked.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "sh_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sh_a") + col("sh_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min of xxhash64(seed, shingle) over the doc's shingle set.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed => aggregate(
        sh,
        lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(seed, s))))

  /** MinHash+LSH near-dup pairs: signatures → band buckets → candidate
    * pairs from same-bucket collisions → exact Jaccard verification.
    * `numHashes = bands * rowsPerBand`.
    */
  def minhashLshPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      n: Int,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBlockSize: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sets = shingleSets(df, text, id, n)
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .cache()
    // band hash = xxhash64 over the band's signature slice
    val banded = sets.select(
      col("doc_id"), col("sh"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("band", "bucket")))
    val buckets = banded
      .withColumn("block_n", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("block_n") <= maxBlockSize)
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the doc's token multiset: sign of the per-bit
    * sum of token-hash bits (±1). Pure expressions — bit loop unrolled
    * as an array transform.
    */
  def simhash(text: Column): Column = {
    val tokenHashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    // one pass over the token hashes: fold into a 64-wide bit-sum array
    val bitSums = aggregate(
      tokenHashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(
        acc,
        sequence(lit(0), lit(63)),
        (a, i) => a + call_function("getbit", h, i) * 2 - 1))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)), (s, i) =>
        when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`,
    * blocked on 16-bit bands (a pair within distance k must collide on
    * at least one of 4 bands for k ≤ 3 — pigeonhole).
    */
  def simhashPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      maxHamming: Int = 3,
      maxBlockSize: Int = 10000): DataFrame = {
    val sigs = df.select(id.cast("long").as("doc_id"), simhash(text).as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(
        array((0 until 4).map(b =>
          shiftright(col("sig"), b * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "bucket")))
    val blocked = banded
      .withColumn("block_n", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("block_n") <= maxBlockSize)
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-dup pairs: cosine ≥ threshold. Blocked by an LSH
    * bucket when `lshBits > 0` (sign bits of deterministic pseudo-random
    * hyperplanes — see [[Similarity.hyperplaneBucket]]); `lshBits = 0`
    * compares all pairs (only for modest corpora / oracle checks).
    */
  def embeddingCosinePairs(
      df: DataFrame,
      vec: Column,
      id: Column,
      threshold: Double,
      lshBits: Int = 0): DataFrame = {
    val base = df.select(
      id.cast("long").as("vec_id"),
      vec.cast("array<double>").as("v"))
    val keyed =
      if (lshBits > 0) base.withColumn("bucket", Similarity.hyperplaneBucket(col("v"), lshBits))
      else base.withColumn("bucket", lit(0))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}

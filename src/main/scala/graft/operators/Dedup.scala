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
  *    stop-shingles, keeping worst-case pair EXPANSION bounded. The
  *    block member lists themselves materialize via collect_list before
  *    the cap filter — one array per key, fine up to millions of docs
  *    per key; a corpus where a single shingle/bucket spans 10⁸+ docs
  *    would want a bounded-collect aggregator there (the TopKByScore
  *    pattern) before this cap;
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

  /** Distinct word-n-gram shingle sets per doc. Tokens are materialized
    * in their own projection so the shingle lambdas never re-tokenize.
    * Public so callers running several dedup flavors over one corpus
    * (the exact-Jaccard and MinHash queries both start here) can compute
    * and cache the projection once.
    */
  def shingleSets(df: DataFrame, text: Column, id: Column, n: Int): DataFrame = {
    // owning session, not .active: the tokenizer kernel must resolve on
    // the session that will analyze THIS frame — the only operator
    // entry that previously relied on build-time .active registration
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(id.cast("long").as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      .select(col("doc_id"), TextAnalysis.shinglesFromTokens(col("toks"), n).as("sh"))
  }

  /** Hashed shingle sets per doc — (doc_id, hs: array<long>, n_sh) —
    * via the native [[graft.functions.HashedShingles]] kernel: tokens →
    * distinct xxh64 shingle hashes in one generated pass, no shingle
    * strings materialized. Bit-equal to hashing [[shingleSets]] with
    * `xxhash64` (asserted in spec), just without the string stage.
    */
  def hashedShingleSets(df: DataFrame, text: Column, id: Column, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // owning session, not .active
    df.select(id.cast("long").as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      .select(col("doc_id"), graft.functions.GraftFunctions.shingles(col("toks"), n).as("hs"))
      .withColumn("n_sh", size(col("hs")))
  }

  /** All (a, b) pairs (a < b element-wise) from an ALREADY SORTED block
    * member array — pair generation INSIDE the block, as a pure array
    * expression: no self-join, and blocks of size 1 (the vast majority
    * of shingles) are dropped before any pair exists. Block size is
    * capped upstream, so the expansion is bounded at maxBlockSize²/2
    * per block. Callers must materialize `sort_array(...)` in its OWN
    * projection first: higher-order lambdas re-evaluate non-attribute
    * subtrees per iteration, so an inline sort would re-sort the block
    * for every i.
    */
  private def pairsWithinSorted(sorted: Column): Column =
    flatten(transform(
      sequence(lit(0), size(sorted) - 2),
      i => transform(
        slice(sorted, i + 2, size(sorted) - i - 1),
        b => struct(element_at(sorted, i + 1).as("id_a"), b.as("id_b")))))

  /** Exact n-gram Jaccard near-dup pairs via PREFIX FILTERING (All-Pairs
    * / PPJoin family, public literature): order each doc's shingles by
    * global document frequency (rarest first, hash tie-break) and keep
    * only the first `|d| - ceil(t·|d|) + 1` as its candidate-generating
    * prefix. Prefix-filtering guarantee: any pair with Jaccard ≥ t has
    * overlap ≥ ceil(t·max(|a|,|b|)), so the two prefixes must share a
    * shingle — blocking on prefix shingles is COMPLETE (and the DuckDB
    * oracle verifies that against an unblocked all-pairs computation).
    * Candidates are then verified with exact Jaccard on the hashed sets.
    *
    * The 100 TB story vs naive shared-shingle blocking: pair expansion
    * happens only inside prefix-shingle blocks, and prefixes favor RARE
    * shingles — hot stop-shingles sit in the suffix of nearly every doc
    * and generate no pairs at all, so worst-case pair volume drops from
    * Σ(hot-block²) to Σ(rare-block²) without giving up exactness.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      n: Int,
      threshold: Double,
      maxBlockSize: Int = 100000): DataFrame =
    ngramJaccardPairsFromSets(shingleSets(df, text, id, n), threshold, maxBlockSize)

  /** [[ngramJaccardPairs]] over pre-built (doc_id, sh) string shingle
    * sets — hashes them once and delegates (8-byte longs flow through
    * every stage; collisions ~n²/2^65; hashed-set Jaccard == string-set
    * Jaccard).
    */
  def ngramJaccardPairsFromSets(
      sets: DataFrame,
      threshold: Double,
      maxBlockSize: Int = 100000): DataFrame =
    ngramJaccardPairsFromHashed(
      sets.select(
        col("doc_id"),
        sort_array(transform(col("sh"), s => xxhash64(s))).as("hs"),
        size(col("sh")).as("n_sh")),
      threshold, maxBlockSize)

  /** [[ngramJaccardPairs]] over pre-hashed (doc_id, hs, n_sh) sets.
    *
    * PRECONDITION: `hs` must be sorted ASCENDING with distinct elements
    * (what `sort_array(transform(sh, xxhash64))` over a distinct shingle
    * set produces — the [[ngramJaccardPairsFromSets]] path guarantees
    * it). Verification uses a sorted-merge overlap scan; the kernel
    * detects descents and throws rather than silently undercounting
    * overlaps and dropping pairs.
    */
  def ngramJaccardPairsFromHashed(
      hashed: DataFrame,
      threshold: Double,
      maxBlockSize: Int = 100000): DataFrame = {
    graft.functions.GraftFunctions.register(hashed.sparkSession)
    // global doc frequency per shingle: a count aggregate, NOT a
    // collect_list block build — count partially aggregates map-side,
    // so the exchange carries ~one row per distinct shingle per
    // partition instead of every posting, and the df table it produces
    // is small enough for AQE to broadcast the join back onto the
    // postings (no second full-posting exchange; at fleet scale AQE
    // falls back to a shuffle join on h, which is what the collect_list
    // formulation paid anyway)
    val postings = hashed.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("h"))
    val dfs = postings.groupBy("h").agg(count(lit(1)).as("df"))
    val prefixLen = (col("n_sh") - ceil(col("n_sh") * threshold) + 1).cast("int")
    // pos = the shingle's rank in the doc's rarest-first order (0-based)
    // — carried into the blocks for PPJoin's positional filter. Ranking
    // is a row_number window (one Tungsten sort exchange on doc_id),
    // not a collect_list + array_sort + posexplode round-trip: no
    // per-doc struct arrays ever materialize, and the sort runs on
    // UnsafeRows inside the window operator.
    //
    // df = 1 postings are dropped BEFORE the window exchange (round
    // 15, guide §2.3 shuffle fewer bytes): a singleton posting can
    // never share a block with anything, and for mostly-unique shingle
    // vocabularies (natural text) singletons are the BULK of the
    // postings — the previous shape shuffled and window-sorted all of
    // them by doc_id just to discard them after ranking. The rank over
    // ALL of the doc's shingles (which the positional bound needs) is
    // reconstructed exactly: the order is (df, h) ascending and df = 1
    // is the minimum possible df, so every dropped singleton ranks
    // STRICTLY BEFORE every kept (df ≥ 2) posting —
    //   pos = n_singletons + rank_among_kept − 1
    //       = (n_sh − cnt2) + row_number − 1,
    // with cnt2 = the doc's kept-posting count (an unordered window
    // count over the same doc_id partitioning — no extra exchange).
    // The inner join against the df ≥ 2 slice of the frequency table
    // is what performs the drop, map-side under the broadcast.
    val prefixes = postings
      .join(dfs.filter(col("df") >= 2), "h")
      .withColumn("cnt2",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("pos",
        (col("n_sh") - col("cnt2") +
          row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))) - 1)
          .cast("int")) // cnt2 is a long count; the ppjoin kernel takes int pos
      .filter(col("pos") < prefixLen)
      .select(col("doc_id"), col("n_sh"), col("pos"), col("h"))
    // candidate pairs from prefix-shingle blocks (in-block expansion,
    // no self-join); cap is a safety valve only — prefixes are rare
    // shingles, so blocks stay small by construction. Positional
    // filter (PPJoin): for the EARLIEST shared prefix shingle, every
    // common shingle sits at rank ≥ pos in both docs, so overlap ≤
    // 1 + min(n_a-pos_a-1, n_b-pos_b-1); Jaccard ≥ t needs overlap ≥
    // t/(1+t)·(n_a+n_b). Later co-occurrences of a pair may be
    // rejected wrongly, but the earliest one always passes, and any
    // single pass keeps the pair (dedup below) — completeness holds
    // (and the unblocked oracle checks it). The filter runs INSIDE the
    // expansion lambda, before any pair struct exists: at low
    // thresholds most in-block pairs fail it, so evaluating it per
    // (a, b) probe — an int compare against array elements already in
    // memory — keeps the rejected pairs out of the flatten buffer and
    // the dropDuplicates exchange entirely, and the surviving rows
    // carry bare 16-byte id pairs (sizes re-derive from the sets at
    // verify time). The classic LENGTH filter (min(n_a,n_b) ≥
    // t·max(n_a,n_b)) is deliberately absent: it is SUBSUMED — if
    // min < t·max then min < t·(min+max)/(1+t), and the positional
    // bound's LHS is ≤ 1 + min(n_a-1, n_b-1) = min, so every pair the
    // length filter would reject already fails the positional filter
    // (they coincide at pos_a = pos_b = 0; positional is strictly
    // stronger elsewhere).
    val tFrac = threshold / (1.0 + threshold)
    // in-block expansion + positional filter as ONE fused native loop
    // (graft_ppjoin_expand) — the nested transform/filter HOF chain it
    // replaces was interpreted per (a, b) probe and dominated q25's
    // profile; the kernel evaluates the identical int/double bound and
    // the q25 completeness oracle (vs the unblocked all-pairs join)
    // gates any divergence
    val candidates = prefixes.groupBy("h")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh"), col("pos")))).as("ms"))
      .filter(size(col("ms")).between(2, maxBlockSize))
      .select(explode(
        graft.functions.GraftFunctions.ppjoinExpand(col("ms"), tFrac)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    // exact verification on the hashed sets: overlap by merge scan
    // (arrays are sorted) — no per-pair hash set, no intersect array;
    // c / (|a| + |b| - c) is the same integer division as
    // |intersect| / |union|, bit-for-bit.
    // Candidate DEDUP RUNS AFTER VERIFICATION, not before: a pair can
    // be emitted by several prefix blocks (a few % here), but shuffling
    // ALL candidates just to dedup them costs a full exchange of the
    // 99%+ that verification is about to reject anyway — verifying the
    // few duplicates twice is map-side-cheap (the verify joins multiply
    // only the duplicated rows), and the dedup exchange then carries
    // only true near-dup pairs (candidates × jaccard-survival-rate,
    // ~0.1% at gate scale; the same ratio geometry holds at 100 TB).
    // Duplicate candidates verify to IDENTICAL rows, so dropDuplicates
    // on the pair key loses nothing.
    candidates
      .join(hashed.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("c", graft.functions.GraftFunctions.sortedOverlap(col("hs_a"), col("hs_b")))
      .withColumn("jaccard",
        col("c").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram CONTAINMENT pairs — the ASYMMETRIC sibling of
    * [[ngramJaccardPairsFromHashed]]: ordered pairs (src → dst) with
    * |src ∩ dst| / |src| ≥ tNum/tDen — the quote/subset detector
    * (a short doc wholly embedded in a long one has tiny Jaccard but
    * containment ≈ 1, which resemblance dedup never sees).
    *
    * The threshold is an EXACT RATIONAL: required overlap
    * α(src) = ⌈t·|src|⌉ in pure int64 (`(tNum·n + tDen − 1) div
    * tDen`), and the verify keeps a pair iff `overlap·tDen ≥
    * tNum·|src|` — integer compares, no float threshold band.
    *
    * COMPLETE candidate generation, the GENERALIZED containment
    * prefix-filter guarantee (Xiao et al.'s suffix-count argument,
    * instantiated at i = 2): with shingles in global rarest-first
    * (df, h) order, a qualifying pair shares at least i shingles
    * between src's EXTENDED prefix (its first |src| − α + i) and
    * dst's full posting list — only α − i common shingles fit in the
    * remaining suffix. Blocking joins src extended-prefix postings
    * (i = 2: one rank wider than the classic prefix) against full
    * postings, so pair volume is Σ_h |prefix(h)|·df(h): the
    * hot-shingle term is LINEAR in df (hot shingles almost never
    * make a rarest-first prefix), not the df² of naive shared-shingle
    * blocking.
    *
    * The per-pair AGGREGATE then prunes before any verify join runs:
    * with s_1 < s_2 the two globally-smallest shared shingles of a
    * qualifying pair, (a) both sit in the extended prefix (prefix
    * membership is monotone in src rank), (b) s_j leaves ≥ α − j + 1
    * common shingles at-or-after it in dst, so both survive the
    * RELAXED per-row dst bound |dst| − pos_dst ≥ α − 1 — hence the
    * group sees c ≥ 2 rows (c ≥ 1 suffices when α ≤ 1); and (c) s_1
    * itself sits in the CLASSIC prefix and satisfies the STRONG dst
    * bound |dst| − pos_dst ≥ α, so requiring one such witness row
    * per group is also complete. At a moderate threshold the c ≥ 2
    * count rejects the ~95 % of prefix-collision pairs that share
    * exactly one rare shingle, collapsing the verify-join volume ~20×
    * (sf1: 66.5M → 3.2M candidate pairs, verify 15.4 s → 1.0 s) while
    * the group-by replaces the old distinct() exchange at the same
    * shuffle volume. df = 1 prefix shingles drop (nothing to share).
    * Verification is the same sorted-merge overlap scan; the oracle
    * checks completeness against an unblocked all-pairs join.
    *
    * Output: (id_src, id_dst, overlap, n_src, containment).
    */
  def containmentPairsFromHashed(
      hashed: DataFrame,
      tNum: Long,
      tDen: Long): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"threshold must satisfy 0 < tNum/tDen <= 1, got $tNum/$tDen")
    graft.functions.GraftFunctions.register(hashed.sparkSession)
    val postings = hashed.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("h"))
    val dfs = postings.groupBy("h").agg(count(lit(1)).as("df"))
    // df = 1 postings drop BEFORE the window exchange (round 15, same
    // derivation as [[ngramJaccardPairsFromHashed]]): singletons are
    // the bulk of natural-text postings, rank strictly FIRST under the
    // (df, h) ascending order (df = 1 is the minimum), and can never
    // share a block — so the full-corpus rank is reconstructed as
    // pos = (n_sh − cnt2) + rank_among_kept − 1 without ever shuffling
    // the singletons into the window sort.
    val ranked = postings
      .join(dfs.filter(col("df") >= 2), "h")
      .withColumn("cnt2",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("pos",
        (col("n_sh") - col("cnt2") +
          row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))) - 1)
          .cast("int"))
    // every threshold compare is the cross-multiplied integer form:
    // x ≥ ⌈tNum·n/tDen⌉  ⟺  x·tDen ≥ tNum·n for integer x — no
    // division, no float, no ceil. Adding k to the integer LHS shifts
    // the bound by k: x ≥ α − k  ⟺  (x + k)·tDen ≥ tNum·n.
    val prefixSide = ranked
      // EXTENDED prefix (i = 2): pos ≤ n − α + 1
      //   ⟺  (n − pos + 1)·tDen ≥ tNum·n
      .filter((col("n_sh") - col("pos") + 1) * tDen >= lit(tNum) * col("n_sh"))
      .select(col("doc_id").as("id_src"), col("n_sh").as("n_src"),
        // classic-prefix membership folded to one bit — pos itself
        // never ships through the join or the pair exchange
        ((col("n_sh") - col("pos")) * tDen >= lit(tNum) * col("n_sh")).as("pc"),
        col("h"))
    val fullSide = ranked
      .select(col("doc_id").as("id_dst"), col("n_sh").as("n_dst"),
        col("pos").as("pos_dst"), col("h"))
    val candidates = prefixSide.join(fullSide, "h")
      .filter(col("id_src") =!= col("id_dst"))
      // RELAXED dst positional bound (keeps s_1 AND s_2 countable):
      // overlap ≤ n_dst − pos_dst must reach α − 1
      .filter((col("n_dst") - col("pos_dst") + 1) * tDen >= lit(tNum) * col("n_src"))
      // one exchange on the pair key — same volume the old distinct()
      // paid, but the aggregate carries the prune inputs with it
      // (three small buffers: a count, a max-bit, a first-bit).
      // The exchange runs at 4× the session shuffle parallelism: the
      // pair grain carries Σ|prefix(h)|·df(h) rows into ~that many
      // groups (map-side combine is near-useless at ~1.15 rows/group),
      // so at the session default the per-task final hash map sits in
      // spill territory (sf1: 70M groups / 32 tasks ≈ 106 MB/task —
      // A/B min-of-3: 6.8 s at 4× vs 10.3 s at 1×). Over-partitioning
      // is self-correcting: AQE coalesces the extra partitions away
      // whenever the candidate volume is small.
      .repartition(
        hashed.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
          .toInt * 4,
        col("id_src"), col("id_dst"))
      .groupBy(col("id_src"), col("id_dst"))
      .agg(
        count(lit(1)).as("c"),
        // witness: a row in the CLASSIC prefix passing the STRONG dst
        // bound — s_1 of a qualifying pair always is one
        max(when(col("pc") &&
          (col("n_dst") - col("pos_dst")) * tDen >= lit(tNum) * col("n_src"),
          1).otherwise(0)).as("w"),
        // α ≤ 1 (single shared shingle qualifies): per-src constant
        first(lit(tNum) * col("n_src") <= lit(tDen)).as("small"))
      .filter(col("w") === 1 && (col("c") >= 2L || col("small")))
      .select(col("id_src"), col("id_dst"))
    candidates
      .join(hashed.select(col("doc_id").as("id_src"), col("hs").as("hs_a")), "id_src")
      .join(hashed.select(col("doc_id").as("id_dst"), col("hs").as("hs_b")), "id_dst")
      .withColumn("overlap",
        graft.functions.GraftFunctions.sortedOverlap(col("hs_a"), col("hs_b")))
      .filter(col("overlap") * lit(tDen) >= lit(tNum) * size(col("hs_a")))
      .select(col("id_src"), col("id_dst"),
        col("overlap").cast("long").as("overlap"),
        size(col("hs_a")).cast("long").as("n_src"),
        (col("overlap").cast("double") / size(col("hs_a")).cast("double"))
          .as("containment"))
  }

  /** MinHash signature via the native [[graft.functions.MinHashSignature]]
    * kernel: each shingle hashed once, k functions derived by integer
    * re-mixing (universal hashing) — vs k interpreted string hashes per
    * shingle in an HOF formulation.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    graft.functions.GraftFunctions.minhash(sh, numHashes)

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
      maxBlockSize: Int = 1000): DataFrame =
    minhashLshPairsFromSets(shingleSets(df, text, id, n), threshold,
      bands, rowsPerBand, maxBlockSize)

  /** [[minhashLshPairs]] over pre-built (doc_id, sh) string shingle
    * sets — hashes once and delegates.
    */
  def minhashLshPairsFromSets(
      rawSets: DataFrame,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBlockSize: Int = 1000): DataFrame =
    minhashLshPairsFromHashed(
      rawSets.select(
        col("doc_id"),
        sort_array(transform(col("sh"), s => xxhash64(s))).as("hs")),
      threshold, bands, rowsPerBand, maxBlockSize)

  /** [[minhashLshPairs]] over pre-hashed (doc_id, hs) sets. Signatures
    * derive from the hashes by integer re-mixing
    * ([[graft.functions.MinHashFromHashes]]) — bit-equal to the string
    * path, which hashes each shingle to exactly these longs first.
    * Verification compares the hashed sets directly (8-byte longs, same
    * Jaccard modulo ~n²/2^65 collisions) — array_intersect on strings
    * would dominate the verify stage.
    *
    * PRECONDITION: `hs` must be sorted ASCENDING with distinct elements
    * (see [[ngramJaccardPairsFromHashed]] — same contract, same
    * descent-detecting verify kernel).
    */
  def minhashLshPairsFromHashed(
      hashed: DataFrame,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBlockSize: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(hashed.sparkSession)
    // the signature projection is consumed by ONE consumer (the banding
    // path), and verification re-joins the CALLER's `hashed` frame — so
    // nothing here needs a .cache(): the minhash kernel runs once, the
    // verify branches prune down to (doc_id, hs), and no pinned storage
    // outlives the query (the round-3 version cached a (doc_id, sh,
    // sig) copy of the corpus for the session's lifetime per call).
    // Callers running several dedup flavors over one corpus cache the
    // shared [[hashedShingleSets]] projection themselves.
    val banded = bandProjection(hashed, bands, rowsPerBand)
    val candidates = banded.groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBlockSize))
      .select(explode(pairsWithinSorted(col("ids"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verify candidates with EXACT jaccard (re-join compact shingle sets)
    candidates
      .join(hashed.select(col("doc_id").as("id_a"), col("hs").as("sh_a")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("hs").as("sh_b")), "id_b")
      .withColumn("c", graft.functions.GraftFunctions.sortedOverlap(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("c").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** The LSH BAND INDEX of a pre-hashed corpus: one (doc_id, band,
    * bucket) row per band — the table a production pipeline PERSISTS
    * so each ingest batch pays only its own banding plus a bucket
    * join, never a corpus re-scan.
    */
  def bandProjection(hashed: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    graft.functions.GraftFunctions.register(hashed.sparkSession)
    val numHashes = bands * rowsPerBand
    hashed
      .filter(size(col("hs")) > 0)
      .select(
        col("doc_id"),
        graft.functions.GraftFunctions.minhashFromHashes(col("hs"), numHashes).as("sig"))
      // band hash = xxhash64 over the band's signature slice
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(b, concat_ws(",",
              slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
          .as(Seq("band", "bucket")))
  }

  /** INCREMENTAL near-dup detection — an ingest batch against an
    * existing corpus (plus within-batch pairs), the daily-dedup
    * production shape: band the batch, touch ONLY the corpus-index
    * buckets the batch collides with (semi-join prune), emit verified
    * pairs where at least one side is new. The corpus never
    * re-pairs against itself — incremental cost is proportional to
    * the batch and its collision neighborhoods, not the corpus.
    * `oldHashed`/`newHashed` must have disjoint doc_ids (same
    * sorted-distinct `hs` contract as [[minhashLshPairsFromHashed]]).
    */
  def minhashLshPairsIncremental(
      oldHashed: DataFrame,
      newHashed: DataFrame,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBlockSize: Int = 1000): DataFrame = {
    val bandedNew = bandProjection(newHashed, bands, rowsPerBand)
    val bandedAll = bandProjection(oldHashed, bands, rowsPerBand)
      .withColumn("is_new", lit(false))
      .unionByName(bandedNew.withColumn("is_new", lit(true)))
    val touched = bandedNew.select("band", "bucket").distinct()
    val candidates = bandedAll
      .join(touched, Seq("band", "bucket"), "left_semi")
      .groupBy("band", "bucket")
      .agg(
        sort_array(collect_list(when(col("is_new"), col("doc_id")))).as("new_ids"),
        sort_array(collect_list(col("doc_id"))).as("all_ids"))
      .filter(size(col("all_ids")).between(2, maxBlockSize) && size(col("new_ids")) > 0)
      .select(explode(col("new_ids")).as("n"), col("all_ids"))
      .select(col("n"), explode(col("all_ids")).as("o"))
      .filter(col("n") =!= col("o"))
      .select(least(col("n"), col("o")).as("id_a"),
        greatest(col("n"), col("o")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val hashed = oldHashed.unionByName(newHashed)
    candidates
      .join(hashed.select(col("doc_id").as("id_a"), col("hs").as("sh_a")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("hs").as("sh_b")), "id_b")
      .withColumn("c", graft.functions.GraftFunctions.sortedOverlap(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("c").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the doc's token multiset: sign of the per-bit
    * sum of token-hash bits (±1), computed by the native
    * [[graft.functions.SimHash64]] kernel in one generated pass.
    */
  def simhash(text: Column): Column =
    graft.functions.GraftFunctions.simhash(TextAnalysis.tokens(text))

  /** Disjoint band (offset, width) layout covering `totalBits` bits with
    * `maxHamming + 1` bands — pigeonhole: a pair within Hamming distance
    * k differs in ≤ k bits, so at least one of k+1 disjoint bands is
    * untouched and the pair collides there. Banding is therefore
    * COMPLETE at the configured radius (the round-1 fixed 4×16 layout
    * was only complete for k ≤ 3).
    */
  private def bandLayout(totalBits: Int, maxHamming: Int): Seq[(Int, Int)] = {
    val bands = maxHamming + 1
    require(bands <= totalBits, s"maxHamming $maxHamming needs $bands bands > $totalBits bits")
    val base = totalBits / bands
    val extra = totalBits % bands // first `extra` bands get one more bit
    val widths = (0 until bands).map(b => base + (if (b < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** Band-bucket columns for a signature: bucket_b = the band's bit
    * slice (mask AFTER shift so a 64-bit band and the sign bit are
    * handled; slices of a positive <64-bit sig never see the sign).
    */
  private def bandBuckets(sig: Column, layout: Seq[(Int, Int)]): Seq[Column] =
    layout.map { case (off, w) =>
      val shifted = if (off == 0) sig else shiftright(sig, off)
      if (w >= 64) shifted else shifted.bitwiseAND((1L << w) - 1L)
    }

  /** Pairs (a < b) from banded signatures with Hamming ≤ maxHamming:
    * posexplode band buckets → block per (band, bucket) → in-block pair
    * expansion with the exact Hamming distance computed INSIDE the
    * expansion (a signature is one 8-byte long, so blocks carry it
    * alongside the id and verification costs one xor+popcount per
    * candidate — no re-join, and the failing pairs are filtered before
    * the dedup exchange). The round-3 version re-joined a CACHED
    * signature frame twice instead: two shuffle joins plus a pinned
    * corpus-sized cache per call, for payloads this plan carries in 16
    * bytes. (Fat payloads — shingle sets, embeddings — still re-join by
    * id; only scalar signatures ride the blocks.)
    */
  private def bandedHammingPairs(
      sigs: DataFrame, // (doc_id, sig)
      totalBits: Int,
      maxHamming: Int,
      maxBlockSize: Int): DataFrame = {
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array(bandBuckets(col("sig"), bandLayout(totalBits, maxHamming)): _*))
        .as(Seq("band", "bucket")))
    banded.groupBy("band", "bucket")
      // struct sorts by leading field → doc_id order, so id_a < id_b
      // holds exactly as with bare-id blocks (ids are distinct within a
      // block; the sig field never decides the order)
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ms"))
      .filter(size(col("ms")).between(2, maxBlockSize))
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ms")) - 2),
        i => {
          val a = element_at(col("ms"), i + 1)
          transform(
            slice(col("ms"), i + 2, size(col("ms")) - i - 1),
            b => struct(
              a.getField("doc_id").as("id_a"),
              b.getField("doc_id").as("id_b"),
              bit_count(a.getField("sig").bitwiseXOR(b.getField("sig"))).as("hamming")))
        }))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Banded Hamming-radius pairs over CALLER-SUPPLIED 64-bit
    * signatures — the [[simhashPairs]] engine with the signature step
    * factored out, so any 64-bit perceptual/locality hash (image
    * aHash, audio fingerprint) reuses the pigeonhole-complete band
    * blocking instead of an all-pairs comparison. `sigs` must be
    * (id: long, sig: long) with distinct ids.
    */
  def hammingPairs64(
      sigs: DataFrame,
      id: Column,
      sig: Column,
      maxHamming: Int,
      maxBlockSize: Int = 10000): DataFrame =
    bandedHammingPairs(
      sigs.select(id.cast("long").as("doc_id"), sig.cast("long").as("sig")),
      totalBits = 64, maxHamming = maxHamming, maxBlockSize = maxBlockSize)

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` over
    * the 64-bit xxhash64-kernel signature, blocked on `maxHamming + 1`
    * disjoint bands (complete at the radius — see [[bandLayout]]).
    */
  def simhashPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      maxHamming: Int = 3,
      maxBlockSize: Int = 10000): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // no cache: the signature projection has exactly one consumer now
    // that verification happens inside the block expansion
    val sigs = df.select(id.cast("long").as("doc_id"), simhash(text).as("sig"))
    bandedHammingPairs(sigs, totalBits = 64, maxHamming = maxHamming, maxBlockSize = maxBlockSize)
  }

  /** Per-bit ±1 sums (length 60) of the portable token hashes — the
    * SimHash accumulator. Token hash = first 15 md5 hex chars (60 bits):
    * unlike the xxhash64 kernel, md5 + integer shifts are reproducible
    * in any engine, so the DuckDB oracle recomputes the full signature
    * bit-for-bit (q27). Kept separate from [[portableSimhashFromAcc]] so
    * callers materialize the accumulator once in its own projection.
    */
  def portableSimhashAcc(toks: Column): Column = {
    val hs = transform(toks, t =>
      conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long"))
    aggregate(
      hs,
      array_repeat(lit(0L), 60),
      (acc, h) =>
        zip_with(
          acc,
          array((0 until 60).map(i =>
            shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1): _*),
          (a, x) => a + x))
  }

  /** Fold the ±1 sums into the 60-bit signature: bit i set iff sum ≥ 0
    * (ties set the bit — mirrored exactly in the oracle SQL).
    */
  def portableSimhashFromAcc(acc: Column): Column =
    (0 until 60).map(i =>
      when(element_at(acc, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)

  /** SimHash near-dup pairs over the PORTABLE 60-bit md5 signature —
    * the cross-engine-verifiable variant (q27's oracle recomputes the
    * identical signatures in DuckDB). Signatures come from the native
    * [[graft.functions.PortableSimHash60]] kernel (one pass; bit-equal
    * to the [[portableSimhashAcc]]/[[portableSimhashFromAcc]] Column
    * formulation, asserted in spec). Same banded blocking as
    * [[simhashPairs]]; complete at `maxHamming` by pigeonhole.
    */
  def simhashPairsPortable(
      df: DataFrame,
      text: Column,
      id: Column,
      maxHamming: Int = 6,
      maxBlockSize: Int = 10000): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // no cache: single consumer, as in [[simhashPairs]]
    val sigs = df
      .select(id.cast("long").as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      .select(col("doc_id"), graft.functions.GraftFunctions.simhash60(col("toks")).as("sig"))
    bandedHammingPairs(sigs, totalBits = 60, maxHamming = maxHamming, maxBlockSize = maxBlockSize)
  }

  /** Resolve near-dup PAIRS into clusters: connected components by
    * min-label propagation PLUS pointer jumping (each round a doc
    * first adopts the smallest neighbor label, then jumps to its
    * label's label) — the hop distance covered doubles per round, so
    * convergence is genuinely O(log diameter), not O(diameter):
    * a 1000-doc chain resolves in ~10 rounds. Non-convergence at
    * `maxIter` THROWS rather than returning silently wrong clusters.
    * Returns (doc_id, cluster_id) where cluster_id = min doc_id of
    * the component — the canonical survivor.
    *
    * The RETURNED frame is cached (it holds the converged labels; an
    * uncached return would replay every iteration on first use) —
    * `.unpersist()` it when done. All loop-internal caches are
    * released before return.
    *
    * SIZE-GATED LOCAL FAST PATH (the broadcast-join trade, applied to
    * components): each distributed round costs several fixed shuffle
    * stages, so on a pair set that fits comfortably on the driver the
    * loop is pure scheduling latency — measured 7.5 s for 163k pairs
    * where a local union-find is milliseconds. A bounded LIMIT probe
    * (≤ `localPairCap`+1 rows, ~16 B each — the same order as a
    * broadcast threshold) decides: under the cap, collect the pairs
    * and resolve components with path-compressed union-find on the
    * driver; at or over it, run the distributed pointer-jumping loop
    * unchanged. Identical output either way: cluster_id = min member.
    */
  def clusters(
      pairs: DataFrame,
      maxIter: Int = 30,
      localPairCap: Int = 4000000): DataFrame = {
    val spark = pairs.sparkSession
    // the probe STREAMS: toLocalIterator holds one InternalRow batch at
    // a time and the union-find state is a primitive open-addressing
    // long→long map (~17 B/node at load 0.5) — collecting boxed Rows
    // plus a boxed-Long HashMap was ~100 B/pair, ~10× the budget the
    // cap sizing assumes, a driver-OOM risk at the 4M default on small
    // driver heaps
    val probeIt = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .limit(localPairCap + 1).toLocalIterator()
    val parent = new LongLongUnionFind()
    var probed = 0
    while (probeIt.hasNext && probed <= localPairCap) {
      val r = probeIt.next()
      parent.union(r.getLong(0), r.getLong(1))
      probed += 1
    }
    if (probed <= localPairCap) {
      // roots are already component minima: unions always point the
      // larger root at the smaller, so find() lands on the min id
      val rows = parent.entries.map { case (n, _) => (n, parent.find(n)) }
      val out = spark.createDataFrame(rows).toDF("doc_id", "cluster_id").cache()
      out.count()
      return out
    }
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    // labels live as an EAGER LOCAL CHECKPOINT, and each round rebuilds
    // the plan from the materialized leaf — so the logical plan is
    // CONSTANT-SIZE across rounds. Chaining cached Datasets instead
    // grows the lineage ~4× per round (the pointer-jump self-join
    // references the previous round twice), and the exponential plan
    // makes analysis + cache-naming cost explode after ~8 rounds: a
    // long-diameter graph would hang the DRIVER on plan bookkeeping
    // long before any executor did real work. The checkpoint (round
    // 15) replaces a persisted `df.rdd` + `createDataFrame(rdd,
    // schema)` rebuild, which paid an InternalRow→Row deserialization
    // on cache write and a Row→InternalRow conversion on EVERY scan of
    // the labels — several per round — every round (guide §1.4's
    // df.rdd warning). localCheckpoint stores the UnsafeRows directly
    // (MEMORY_AND_DISK, same spill-don't-evict level as before).
    val seed = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id"))
    var labels = seed.localCheckpoint(true)
    // Convergence probe: labels are pointwise MONOTONE non-increasing
    // (every update is a `least` against the current value) over a
    // constant doc_id set, so "no label changed" ⟺ "sum(cluster_id)
    // unchanged" — one exact decimal(38) aggregation over the new
    // checkpoint (map-side partials, no shuffle of substance) instead
    // of the previous rounds' labels⋈next equality join + filter +
    // limit probe, which paid a full shuffle of both label sets every
    // round (guide §2.4: remove shuffles outright).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("neighbor_min"))
      // hop is deliberately NOT cached even though the pointer-jump
      // self-join reads it twice: labels is already a persisted RDD
      // scan, and the duplicated propagate-join subtrees canonicalize
      // identically, so ReuseExchange dedups their shuffles inside one
      // physical plan — measured on a 40-chain, caching hop ADDS ~40%
      // tasks (cache fill + InMemoryRelation scans) for zero avoided
      // work (134 tasks uncached vs 188 cached; the hygiene spec pins
      // the uncached plan's task budget)
      val hop = labels
        .join(propagated, labels("doc_id") === propagated("src"), "left")
        .select(
          col("doc_id"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"))
      // pointer jump: cluster_id := label(cluster_id) — doubles the
      // distance covered per round (the min label is always itself a
      // member, so the lookup never misses)
      val next = hop.as("h")
        .join(hop.select(col("doc_id").as("jid"), col("cluster_id").as("jlabel")).as("j"),
          col("h.cluster_id") === col("j.jid"), "left")
        .select(
          col("h.doc_id").as("doc_id"),
          least(col("h.cluster_id"), coalesce(col("jlabel"), col("h.cluster_id")))
            .as("cluster_id"))
      // LAZY checkpoint: the sum probe below is a full pass over every
      // partition, so it both materializes the checkpoint and answers
      // convergence in ONE job (the eager form would pay a separate
      // count() action first)
      val nextCk = next.localCheckpoint(false)
      val nextSum = labelSum(nextCk)
      PartitionedCheckpoint.release(labels)
      labels = nextCk
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    edges.unpersist()
    if (!converged) {
      PartitionedCheckpoint.release(labels)
      throw new IllegalStateException(
        s"Dedup.clusters did not converge in $maxIter rounds — component diameter " +
          s"exceeds 2^$maxIter; raise maxIter")
    }
    // hand the caller a normally cached Dataset (releasable with
    // .unpersist() per the documented contract), then drop the
    // checkpoint blocks (the cache is materialized first and its
    // MEMORY_AND_DISK level spills rather than evicts, so nothing ever
    // needs the truncated lineage again)
    val out = labels.select(col("doc_id"), col("cluster_id")).cache()
    out.count()
    PartitionedCheckpoint.release(labels)
    out
  }

  /** Collapse near-duplicate clusters to ONE survivor each — the step
    * that turns pair detection into an actual deduplicated corpus.
    * Resolves `pairs` into connected components via [[clusters]], then
    * keeps, per component, the row with the highest `quality` (ties →
    * smallest id); documents in no pair are their own component and
    * always survive. Returns the surviving `docs` rows plus
    * `cluster_id` (the component's min id) and `n_members` (component
    * size, 1 for singletons).
    *
    * Survivor selection is a map-side-partial `max(struct(quality,
    * -id))` aggregation, not a per-cluster window — a pathological
    * mega-cluster (every doc a near-dup of one template) combines
    * partially on the map side instead of funnelling through one
    * window reducer. `quality` must be non-null (null structs would
    * rank engine-specifically); NaN quality ranks ABOVE all finite
    * values in both Spark and DuckDB struct/sort orderings.
    *
    * Same storage contract as [[clusters]]: the RETURNED frame is
    * cached (the label loop's result is folded in; an uncached return
    * would replay it) — `.unpersist()` it when done. All internal
    * caches are released before return.
    */
  def keepBestPerCluster(
      docs: DataFrame,
      pairs: DataFrame,
      id: Column,
      quality: Column): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val iC = s"__kb_id_$tag"; val qC = s"__kb_q_$tag"
    val bC = s"__kb_best_$tag"; val cC = s"__kb_cl_$tag"
    Seq("cluster_id", "n_members").foreach(c =>
      require(!docs.columns.contains(c),
        s"keepBestPerCluster adds a '$c' column but the input already has one — rename it first"))
    val labels = clusters(pairs)
    // a null (or null-casting) id would make cluster_id null and the
    // survivors join silently EAT the row — breaking "docs in no pair
    // always survive"; fail loudly instead
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "keepBestPerCluster: id is null or not castable to long — every doc " +
        "needs a non-null integral id (string ids: hash or map them first)")))
      .otherwise(id.cast("long"))
    val base = docs.withColumn(iC, guardedId).withColumn(qC, quality)
    val withCl = base
      .join(labels.select(col("doc_id").as(iC + "_l"), col("cluster_id").as(cC)),
        col(iC) === col(iC + "_l"), "left")
      .withColumn("cluster_id", coalesce(col(cC), col(iC)))
      .drop(iC + "_l", cC)
    // negating the id turns (max quality, min id) into one struct max —
    // partial-aggregable, unlike a row_number window
    val best = withCl.groupBy(col("cluster_id")).agg(
      max(struct(col(qC).as("q"), (lit(0L) - col(iC)).as("negid"))).as("b"),
      count(lit(1)).as("n_members"))
      .select(col("cluster_id").as(cC), (lit(0L) - col("b.negid")).as(bC), col("n_members"))
    val survivors = withCl
      .join(best, col("cluster_id") === col(cC) && col(iC) === col(bC))
      .select((docs.columns.map(col) :+ col("cluster_id") :+ col("n_members")): _*)
      .cache()
    survivors.count() // materialize so the labels cache can release NOW
    labels.unpersist()
    survivors
  }

  /** EXACT SUBSTRING dedup: remove every duplicated run of `k`+ tokens
    * from the corpus — the span-level dedup step (public literature:
    * "Deduplicating Training Data Makes Language Models Better", Lee
    * et al. 2022) that document-level dedup cannot do: boilerplate
    * headers, license blocks, and templated passages repeat across
    * otherwise-distinct documents. A position is removed when some
    * corpus-duplicated k-gram covers it; with `keepFirst` the globally
    * first occurrence of each k-gram (min (doc, pos)) is exempt from
    * being a removal START — NOTE this protects per-gram, not
    * per-passage: the first occurrence's positions can still be
    * covered by a DIFFERENT duplicated gram overlapping it, so a
    * passage whose first copy sits inside other duplicated context may
    * survive nowhere intact (coverage-based removal is how the
    * published formulation behaves too).
    *
    * Returns one row per input doc: (doc_id, clean_text, n_kept,
    * n_removed). `clean_text` is the SURVIVING TOKENS rejoined with
    * single spaces — token-level dedup is inherently lossy about
    * punctuation/casing (same contract as every tokenizer-based op
    * here).
    *
    * The 100 TB story — this is the hashed-posting formulation, not a
    * suffix array (a distributed suffix array sorts the entire corpus
    * several times; postings move each token a bounded number of
    * times): (1) one aggregation over 16-byte md5 gram keys computes
    * BOTH the duplicate filter and the first-occurrence witness
    * map-side-partially — a mega-hot gram (the whole point: duplicated
    * boilerplate) partial-aggregates instead of flooding one reducer;
    * (2) duplicated starts expand to ≤ k covered positions each,
    * deduped by (doc, pos); (3) one groupBy(doc) reassembles survivors.
    * Three corpus-order shuffles total, each on compact keys — the
    * inherent cost of a global rewrite. md5 (not xxhash64) keys keep
    * the grouping portable and collision-negligible at corpus scale.
    */
  def dedupSpans(
      df: DataFrame,
      text: Column,
      id: Column,
      k: Int,
      minCount: Int = 2,
      keepFirst: Boolean = true): DataFrame = {
    require(k >= 2, s"span length k must be >= 2 tokens, got $k")
    require(minCount >= 2, s"minCount < 2 would mark every k-gram duplicated, got $minCount")
    // null-casting ids would all collapse into one doc_id=null group
    // and merge unrelated documents' tokens — refuse per row
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "dedupSpans: id is null or not castable to long — every doc needs a " +
        "non-null integral id (string ids: hash or map them first)")))
      .otherwise(id.cast("long"))
    val base = df.select(
      guardedId.as("doc_id"),
      coalesce(TextAnalysis.tokens(text), array()).as("toks"))
    // unhex: group/join on the 16 raw md5 bytes, not the 32-char hex
    // string — halves the dominant (one row per token) shuffle key
    val occ = base
      .select(col("doc_id"),
        posexplode(TextAnalysis.ngramsFromTokens(col("toks"), k)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), unhex(md5(col("gram").cast("binary"))).as("gh"))
    // one partial-aggregable pass: duplicate count + first-occurrence
    // witness per gram (a struct-min, not a per-gram window — hot
    // grams combine map-side)
    val gramStats = occ.groupBy(col("gh")).agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("cnt") >= minCount)
      .select(col("gh"), col("first.doc_id").as("f_doc"), col("first.pos").as("f_pos"))
    val starts = occ.join(gramStats, "gh")
      .filter(if (keepFirst) !(col("doc_id") === col("f_doc") && col("pos") === col("f_pos"))
              else lit(true))
      .select(col("doc_id"), col("pos"))
    val covered = starts
      .select(col("doc_id").as("c_doc"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("cpos"))
      .distinct()
    val kept = base
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .join(covered, col("doc_id") === col("c_doc") && col("pos") === col("cpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("ps"))
      .select(col("doc_id").as("k_doc"),
        concat_ws(" ", transform(col("ps"), p => p.getField("tok"))).as("clean_text"),
        size(col("ps")).cast("long").as("n_kept"))
    base.join(kept, col("doc_id") === col("k_doc"), "left")
      .select(
        col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (size(col("toks")).cast("long") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Eval-set DECONTAMINATION: drop every corpus document sharing at
    * least `minOverlap` word-n-gram shingles with any document of
    * `evalSet` — the benchmark-leakage removal step of an LLM data
    * pipeline. Returns the SURVIVING corpus rows.
    *
    * The 100 TB story: the eval set is small (benchmarks are KBs–MBs),
    * so its distinct shingle-hash table broadcasts; contaminated ids
    * come from one map-side join + an id aggregation, and the corpus
    * itself moves only through the final LEFT ANTI join on id — no
    * corpus-by-shingle shuffle, no pair expansion.
    */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      text: Column,
      id: Column,
      n: Int = 3,
      minOverlap: Int = 1): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // the id keeps its RAW type throughout (no long cast): a string id
    // cast to long would be NULL, the anti-join would never match, and
    // every contaminated document would silently survive — failing OPEN
    // on exactly the leak this operator removes
    def shingleRows(df: DataFrame) = df
      .select(id.as("__decon_id"), TextAnalysis.tokens(text).as("toks"))
      .select(col("__decon_id"),
        explode(graft.functions.GraftFunctions.shingles(col("toks"), n)).as("h"))
    val evalShingles = shingleRows(evalSet).select(col("h")).distinct()
    val contaminated = shingleRows(corpus)
      .join(broadcast(evalShingles), "h")
      .groupBy("__decon_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
      .select(col("__decon_id"))
    corpus.join(contaminated, id === col("__decon_id"), "left_anti")
  }

  /** EMBEDDING-space eval-set decontamination — the semantic
    * counterpart of [[decontaminate]]: drop every corpus row whose
    * embedding has cosine ≥ `minCosine` against ANY eval-set embedding
    * (paraphrased benchmark leakage that shares no n-gram still sits
    * next to its source in embedding space — the standard second
    * decontamination pass in public LLM data pipelines). Returns the
    * SURVIVING corpus rows.
    *
    * The 100 TB story mirrors [[decontaminate]]: the eval side is
    * small, so its vectors broadcast and the scoring is a map-side
    * broadcast nested-loop pass over the corpus (the codegen'd cosine
    * kernel, k·|eval| flops per row, zero corpus shuffle); flagged ids
    * are few — bounded by the corpus rows semantically adjacent to a
    * SMALL eval set at a high τ — and flow back through one explicitly
    * broadcast LEFT ANTI join on the raw-typed id (string ids can't
    * fail open through a silent long cast). The hint matters: Catalyst
    * cannot size-estimate through the cross join (its row estimate is
    * |corpus|·|eval|), so without it the anti-join would plan as a
    * corpus-wide sort-merge. A flagged set too large to broadcast
    * fails loudly at the 8 GB broadcast ceiling — the signal that τ is
    * set so low the operator would be discarding a meaningful fraction
    * of the corpus, which is a configuration error, not a dedup.
    *
    * Zero-norm corpus vectors score NaN against everything; Spark SQL
    * predicates rank NaN above every number, so `cos >= τ` alone would
    * flag every degenerate vector as contaminated against ANY eval set
    * — the explicit `!isnan` guard keeps them (they carry no semantic
    * similarity to anything).
    */
  def embeddingDecontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      vec: Column,
      id: Column,
      minCosine: Double): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine must be in (0, 1], got $minCosine")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val evalVecs = evalSet.select(vec.cast("array<double>").as("__ed_ev"))
    val cos = Similarity.cosine(col("__ed_v"), col("__ed_ev"))
    val contaminated = corpus
      .select(id.as("__ed_id"), vec.cast("array<double>").as("__ed_v"))
      .crossJoin(broadcast(evalVecs))
      .where(!isnan(cos) && cos >= minCosine)
      .select(col("__ed_id"))
      .distinct()
    corpus.join(broadcast(contaminated), id === col("__ed_id"), "left_anti")
  }

  /** Incremental-ingest exact dedup: drop every `incoming` row whose
    * normalized-content fingerprint already exists in `existing` — the
    * re-crawl step of a continuously ingested corpus (today's crawl
    * arrives, everything already in yesterday's snapshot is discarded
    * before any further processing). Returns the SURVIVING incoming
    * rows. `text` must resolve on both frames.
    *
    * The 100 TB story: both sides reduce to 16-byte binary fingerprint
    * keys before any data moves — the existing side ships (fp) only,
    * distinct'd with map-side partials, and the LEFT ANTI join
    * shuffles compact keys, not documents. The snapshot side is NOT
    * assumed broadcastable (yesterday's corpus is as big as today's);
    * this is the one dedup flavor whose shuffle is unavoidable, and it
    * moves the minimum bytes that semantics allow.
    */
  def dedupAgainstExisting(
      incoming: DataFrame,
      existing: DataFrame,
      text: Column): DataFrame = {
    val fp = unhex(TextAnalysis.fingerprint(text))
    incoming.join(
      existing.select(fp.as("__dae_fp")).distinct(),
      fp === col("__dae_fp"), "left_anti")
  }

  /** Deterministic train/validation/test assignment by content hash —
    * the split survives re-runs, re-partitioning, and incremental
    * appends (a row's split never depends on what else is in the
    * corpus). Buckets by the last hex digit of the md5 fingerprint:
    * 16 buckets split `testBuckets` test / `valBuckets` validation /
    * rest train.
    */
  def splitAssign(text: Column, testBuckets: Int = 2, valBuckets: Int = 1): Column = {
    val bucket = substring(TextAnalysis.fingerprint(text), 32, 1)
    val hexDigits = "0123456789abcdef"
    val test = hexDigits.take(testBuckets).map(_.toString)
    val valid = hexDigits.slice(testBuckets, testBuckets + valBuckets).map(_.toString)
    when(bucket.isin(test: _*), "test")
      .when(bucket.isin(valid: _*), "validation")
      .otherwise("train")
  }

  /** Embedding near-dup pairs: cosine ≥ threshold. Blocked by
    * multi-table hyperplane LSH when `lshBits > 0` (sign bits of
    * deterministic pseudo-random hyperplanes, `tables` independent
    * tables unioned — standard amplification: a pair is recalled if it
    * collides in ANY table). The join shuffles on (table, bucket) — no
    * unbucketed self-join anywhere; candidate volume per table is
    * ~n²/2^lshBits, so grow `lshBits` with log₂(n) at scale.
    *
    * The DEFAULT is bucketed (16 bits × 32 tables — recall >0.9 with
    * ~0.05% random-pair admission at realistic thresholds, see below).
    * `lshBits = 0` compares ALL pairs — an O(n²) plan that exists for
    * exact oracle baselines on modest corpora and must be requested
    * EXPLICITLY; it is never the silent default.
    *
    * Parameter guidance: sign-LSH selectivity tracks how far the
    * per-bit collision probability 1 − θ/π sits above ½. At realistic
    * near-dup thresholds (cosine ≥ 0.8, p ≈ 0.8) a 16-bit × 32-table
    * config recalls >0.9 while admitting ~0.05% of random pairs; at
    * weak thresholds (≈0.35, p ≈ 0.61) ANY config with high recall
    * admits a large fraction of all pairs — the physics of the sketch,
    * not the plan. The implementation keeps that regime affordable by
    * moving only 16-byte id pairs through the candidate shuffle.
    */
  def embeddingCosinePairs(
      df: DataFrame,
      vec: Column,
      id: Column,
      threshold: Double,
      lshBits: Int = 16,
      tables: Int = 32): DataFrame = {
    require(lshBits >= 0 && lshBits <= 63, s"lshBits must be in [0, 63], got $lshBits")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df.select(
      id.cast("long").as("vec_id"),
      vec.cast("array<double>").as("v"))
    // candidate generation and dedup move ONLY 16-byte id pairs — the
    // vectors re-join by id afterward, so the bucket-join shuffle and
    // the dropDuplicates exchange never carry embedding payloads
    val keyed =
      if (lshBits > 0)
        base.select(
          col("vec_id"),
          posexplode(graft.functions.GraftFunctions.hyperplaneBuckets(col("v"), lshBits, tables))
            .as(Seq("table", "bucket")))
      else
        base.select(col("vec_id"), lit(0).as("table"), lit(0L).as("bucket"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(base.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(base.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style SEMANTIC pruning (public literature: Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): cluster the embedding space with a
    * coarse quantizer, find near-duplicate pairs EXACTLY but only
    * WITHIN each cluster, resolve connected components, and keep one
    * best-quality survivor per semantic group. Complementary to
    * [[embeddingCosinePairs]]'s LSH buckets: the cluster scope makes
    * within-group comparison exact (no sketch recall loss) while the
    * quantizer bounds the quadratic blowup.
    *
    * Scale shape: cell assignment is map-side (centroid literal +
    * codegen kernel — zero shuffle); the pair join shuffles the corpus
    * ONCE on cell id with quadratic work confined inside each cell —
    * the SemDeDup contract is that `nlist` grows with corpus size
    * (cells of ~√N keep total pair work ~N^1.5, the published
    * regime); components resolve by pointer jumping (O(log diameter)
    * rounds, [[clusters]]); the survivor rule is the
    * partial-aggregable struct-max of [[keepBestPerCluster]], no
    * per-group window. Wrong-dimension vectors drop (the corrupt-input
    * policy of the ANN stack); null ids fail loudly inside
    * [[keepBestPerCluster]].
    *
    * Returns one row PER SURVIVOR: (vec_id, cell, q, cluster_id,
    * n_members); docs in no near-dup pair survive as their own
    * singleton cluster. The returned frame is CACHED (the
    * [[keepBestPerCluster]] contract) — the caller owns the
    * `.unpersist()`.
    */
  def semanticPrune(
      df: DataFrame,
      vec: Column,
      id: Column,
      quality: Column,
      centroids: Seq[Array[Double]],
      threshold: Double): DataFrame = {
    require(centroids.nonEmpty, "semanticPrune needs at least one centroid")
    val dim = centroids.head.length
    require(centroids.forall(c => c != null && c.length == dim),
      "semanticPrune centroids must share one dimension")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val centLit = typedLit(centroids.map(_.toSeq).toSeq)
    val withCell = df
      .select(id.cast("long").as("vec_id"), vec.cast("array<double>").as("v"),
        quality.cast("double").as("q"))
      .filter(col("vec_id").isNotNull && size(col("v")) === dim)
      .withColumn("cell",
        element_at(graft.functions.GraftFunctions.nearestCentroids(spark, col("v"), centLit, 1), 1))
    // exact within-cell pairs: ONE shuffle on cell id; NaN cosines
    // (zero vectors) fail the >= and pair with nothing
    val pairs = withCell.select(col("cell"), col("vec_id").as("id_a"), col("v").as("va"))
      .join(withCell.select(col("cell"), col("vec_id").as("id_b"), col("v").as("vb")), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
    keepBestPerCluster(
      withCell.select(col("vec_id"), col("cell"), col("q")),
      pairs, col("vec_id"), col("q"))
  }

  /** SOURCE-OVERLAP MATRIX — pairwise shingle containment between
    * corpus SOURCES, the provenance-level audit behind every
    * "did crawl B re-scrape crawl A?" / cross-source contamination
    * question (the doc-level siblings are [[containmentPairsFromHashed]]
    * and [[ngramJaccardPairs]]). For every source pair: the exact
    * count of shared distinct shingles, each side's distinct-shingle
    * vocabulary size, and the Jaccard |A∩B| / |A∪B|.
    *
    * Input is [[hashedShingleSets]] output (doc_id, hs) plus a
    * (doc_id, source) tag table. Shingles collapse to DISTINCT
    * (source, hash) first — the matrix never touches documents again
    * — and the pair count is a self-equi-join on the hash, so the
    * expansion per shingle is (#sources containing it)², bounded by
    * S² with S the source count (sources are crawls/datasets by
    * contract — tens, not millions). The deduped posting table is
    * localCheckpointed once for its three consumers (the q161
    * exchange-reuse lesson). Counts are exact; Jaccard is one pinned
    * double division.
    *
    * Output per co-occurring pair (src_a < src_b):
    * (src_a, src_b, n_a, n_b, intersection, jaccard).
    */
  def sourceOverlapFromHashed(hashed: DataFrame, tags: DataFrame): DataFrame = {
    val post = hashed
      .select(col("doc_id").as("hd"), explode(col("hs")).as("h"))
      .join(tags.select(col("doc_id").as("td"), col("source")),
        col("hd") === col("td"))
      .select(col("source"), col("h")).distinct()
      .localCheckpoint(true)
    val per = post.groupBy(col("source")).agg(count(lit(1)).as("nsh"))
    val pairs = post.select(col("source").as("src_a"), col("h").as("ha"))
      .join(post.select(col("source").as("src_b"), col("h").as("hb")),
        col("ha") === col("hb") && col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("intersection"))
    pairs
      .join(broadcast(per.select(col("source").as("pa"), col("nsh").as("n_a"))),
        col("src_a") === col("pa"))
      .join(broadcast(per.select(col("source").as("pb"), col("nsh").as("n_b"))),
        col("src_b") === col("pb"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("intersection"),
        (col("intersection").cast("double") /
          (col("n_a") + col("n_b") - col("intersection")).cast("double"))
          .as("jaccard"))
  }
}

/** Driver-side path-halving union-find over PRIMITIVE long ids: open
  * addressing with linear probing, power-of-two capacity, load ≤ 0.5.
  * Union points the larger root at the smaller, so every root is its
  * component's minimum id. ~17 B per distinct node (two long arrays at
  * half load) vs ~100 B for a boxed HashMap entry — the local fast
  * path in [[Dedup.clusters]] budgets its pair cap on this.
  */
private[operators] final class LongLongUnionFind(initialCapacity: Int = 1 << 16) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity - 1)) << 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  private def slot(k: Long): Int = {
    // Stafford mix13 finalizer — well-distributed for sequential ids
    var h = k
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt & (cap - 1)
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val oc = cap
    cap <<= 1
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    var i = 0
    while (i < oc) {
      if (ou(i)) {
        var s = slot(ok(i))
        while (used(s)) s = (s + 1) & (cap - 1)
        keys(s) = ok(i); vals(s) = ov(i); used(s) = true
      }
      i += 1
    }
  }

  /** parent(k), inserting k as its own root on first sight. */
  private def getOrInsert(k: Long): Long = {
    var s = slot(k)
    while (used(s)) {
      if (keys(s) == k) return vals(s)
      s = (s + 1) & (cap - 1)
    }
    keys(s) = k; vals(s) = k; used(s) = true
    n += 1
    if (n * 2 > cap) grow()
    k
  }

  private def put(k: Long, v: Long): Unit = {
    var s = slot(k)
    while (used(s) && keys(s) != k) s = (s + 1) & (cap - 1)
    if (!used(s)) { keys(s) = k; used(s) = true; n += 1 }
    vals(s) = v
    if (n * 2 > cap) grow()
  }

  def find(x0: Long): Long = {
    var x = x0
    var p = getOrInsert(x)
    while (p != x) { // path-halve toward the root
      val gp = getOrInsert(p)
      put(x, gp)
      x = gp
      p = getOrInsert(x)
    }
    x
  }

  def union(a: Long, b: Long): Unit = {
    val ra = find(a)
    val rb = find(b)
    if (ra != rb) put(math.max(ra, rb), math.min(ra, rb))
  }

  /** All (node, parent) entries — call [[find]] per node for roots. */
  def entries: Seq[(Long, Long)] = {
    val b = Seq.newBuilder[(Long, Long)]
    var i = 0
    while (i < cap) {
      if (used(i)) b += ((keys(i), vals(i)))
      i += 1
    }
    b.result()
  }
}

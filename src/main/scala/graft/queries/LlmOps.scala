package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Driver-contract queries for the LLM-training-data operator families
  * (dedup, similarity search, text analysis, multimodal) over the
  * `documents` / `embeddings` testdata. Every query carries an oracle:
  * deterministic ops mirror the Spark expression trees op-for-op (same
  * int arithmetic, same left-to-right double folds) so results
  * hash-match bit-for-bit; q27 uses a PORTABLE md5-based SimHash the
  * oracle recomputes independently; the remaining hash-family ops
  * (xxhash64-seeded MinHash/LSH/IVF candidate steps) use soundness +
  * recall oracles — DuckDB recomputes the exact metric for every
  * emitted row (dropping any false positive → red) and requires recall
  * ≥ a floor vs the exact baseline; ScalaTest additionally asserts
  * recall on the operator APIs.
  */
object LlmOps {

  // DuckDB token expression mirroring TextAnalysis.tokens on this
  // (ASCII) corpus.
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  private def sqlStopHits(words: Seq[String]) =
    s"len(list_filter($sqlToks, t -> list_contains(${words.mkString("['", "','", "']")}, t)))"

  // Shared CTE chain producing `exact` = ALL (id_a < id_b, jaccard)
  // pairs with 3-gram Jaccard >= 0.3 over `from` (a table or CTE with
  // doc_id, text) — deliberately UNBLOCKED (every shared-shingle pair
  // is scored), so comparing it against the Spark result verifies the
  // prefix-filtered blocking in Dedup.ngramJaccardPairs is complete,
  // not just sound. Used by q25 (direct compare), q26 (soundness
  // join), q34 (connected components), q42 (curation pipeline).
  private[queries] def sqlExactJaccardCteFrom(from: String): String =
    s"""toks AS (SELECT doc_id, $sqlToks AS t FROM $from),
       |sh AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(t) >= 3
       |    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
       |    ELSE [array_to_string(t, ' ')] END) AS sh FROM toks),
       |post AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |exact AS (SELECT id_a, id_b,
       |  CAST(c AS DOUBLE) / CAST(len(sa.sh) + len(sb.sh) - c AS DOUBLE) AS jaccard
       |  FROM cand
       |  JOIN sh sa ON id_a = sa.doc_id
       |  JOIN sh sb ON id_b = sb.doc_id
       |  WHERE CAST(c AS DOUBLE) / CAST(len(sa.sh) + len(sb.sh) - c AS DOUBLE) >= 0.3)""".stripMargin

  // q25/q26/q34 all start from the same tokenize→hashed-shingle
  // projection (native HashedShingles kernel — no shingle strings) —
  // computed once per (session, sf-dir) and cached DELIBERATELY for
  // the session's lifetime: the gate runs many queries over the same
  // corpus in one session, and this is the one cross-query cache that
  // pays for itself. The handle lives in the SESSION's temp-view
  // registry, not a static map: it dies with the session, so no
  // external structure pins sessions or cached RDDs (a WeakHashMap
  // keyed by session would be defeated by the DataFrame value
  // referencing its session). Long-lived sessions that are done with a
  // corpus call [[evictSharedShingleCaches]] to release the storage.
  private[queries] def sharedShingleSets(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    // full md5 of the dir in the view name — a truncated hash could
    // collide across dirs within one session and serve the wrong corpus
    val view = "graft_shingle_sets_" + java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    synchronized {
      if (!s.catalog.tableExists(view)) {
        import s.implicits._
        Dedup.hashedShingleSets(Tables.documents(s, d), $"text", $"doc_id", n = 3)
          .cache()
          .createOrReplaceTempView(view)
      }
    }
    s.table(view)
  }

  /** Materialize a result derived from an operator-cached frame, then
    * release the cache — the contract for operators ([[Dedup.clusters]],
    * [[Dedup.keepBestPerCluster]]) whose returned frame is cached with
    * the caller owning the unpersist. `localCheckpoint(eager = true)`
    * materializes the derived result on the EXECUTORS and truncates its
    * lineage, so the input cache can be released without the result
    * ever funnelling through driver memory (a `collect` here would cap
    * the operator at driver heap — exactly the anti-pattern the 100 TB
    * design forbids). The checkpointed blocks are reclaimed by the
    * ContextCleaner once the returned frame is unreferenced.
    */
  private def materializeThenRelease(
      s: org.apache.spark.sql.SparkSession,
      cached: org.apache.spark.sql.DataFrame)(
      derive: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    try derive(cached).localCheckpoint(true)
    finally cached.unpersist()

  /** Eviction hook for the per-(session, dir) shared shingle caches:
    * unpersists and drops every shared-shingle view registered in this
    * session. Safe to call at any time — the next query that needs the
    * projection rebuilds it.
    */
  def evictSharedShingleCaches(s: org.apache.spark.sql.SparkSession): Unit =
    // bounded: the session's temp-view catalog, a handful of names
    s.catalog.listTables().collect()
      .filter(t => t.name.startsWith("graft_shingle_sets_") && t.isTemporary)
      .foreach { t =>
        s.table(t.name).unpersist()
        s.catalog.dropTempView(t.name)
      }

  // DuckDB recomputation of Dedup.portableSimhashAcc/FromAcc: 60-bit
  // md5-based SimHash, one CASE term per bit (generated). Identical
  // tie handling (sum >= 0 sets the bit) and identical token hash
  // (first 15 md5 hex chars as a 60-bit integer).
  private val sqlPortableSimhash = (0 until 60).map { i =>
    s"CASE WHEN coalesce(list_sum(list_transform(hs, h -> ((h >> $i) & 1)*2 - 1)), 0) >= 0" +
      s" THEN (1::BIGINT << $i) ELSE 0::BIGINT END"
  }.mkString(" + ")

  // Exact cosine scoring of the ANN query set (vec_id < 10) — shared by
  // the q30/q38 soundness oracles.
  private val sqlAnnScoredCte =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |scored AS (SELECT query_id, e.vec_id AS corpus_id,
      |    list_dot_product(qv, v)
      |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
      |  FROM e CROSS JOIN q WHERE e.vec_id <> query_id)""".stripMargin

  /** Soundness + recall oracle for approximate top-k (q30/q38): every
    * emitted (query, corpus) pair must carry the TRUE cosine (DuckDB
    * recomputes and the join drops any mismatch → row-count red), ranks
    * are recomputed from the emitted set with the same tie-break, and
    * the emitted set must recall ≥ `recallFloor` of the exact top-k
    * (else the WHERE empties the oracle → red). The approximate part
    * (which candidates LSH/IVF surfaces) is xxhash64-seeded and has no
    * DuckDB twin — recall floors vs the exact baseline are additionally
    * asserted in ScalaTest.
    */
  private def annSoundnessOracle(outName: String, k: Int, recallFloor: Double): String =
    s"""WITH $sqlAnnScoredCte,
       |exact_topk AS (SELECT query_id, corpus_id FROM (
       |    SELECT query_id, corpus_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
       |    FROM scored) WHERE rank <= $k),
       |emitted AS (SELECT * FROM read_parquet('{{OUT}}/$outName/*.parquet')),
       |joined AS (SELECT m.query_id, m.corpus_id, s.cosine
       |  FROM emitted m JOIN scored s ON m.query_id = s.query_id AND m.corpus_id = s.corpus_id
       |    AND abs(m.cosine - s.cosine) < 1e-9),
       |-- ok = recall floor reached AND no query over-emits past k (an
       |-- over-emitting top-k would otherwise self-ratify: its ranks are
       |-- recomputed from the emitted set itself); when NOT ok the oracle
       |-- returns a POISON row instead of an empty set, so a completely
       |-- empty Spark result can never be vacuously green
       |flag AS (SELECT (
       |    (SELECT count(*) FROM emitted m
       |       JOIN exact_topk t ON m.query_id = t.query_id AND m.corpus_id = t.corpus_id)
       |      >= $recallFloor * (SELECT count(*) FROM exact_topk)
       |    AND (SELECT coalesce(max(c), 0) FROM
       |           (SELECT count(*) AS c FROM emitted GROUP BY query_id)) <= $k
       |  ) AS ok)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS INT) AS rank,
       |  corpus_id, cosine
       |FROM joined
       |WHERE (SELECT ok FROM flag)
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS query_id, CAST(-1 AS INT) AS rank,
       |  CAST(-1 AS BIGINT) AS corpus_id, CAST(-999 AS DOUBLE) AS cosine
       |WHERE NOT (SELECT ok FROM flag)
       |ORDER BY query_id, rank""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- text analysis -------------------------------------------------
    Q(
      "q20_text_tokens",
      (s, d) => {
        import s.implicits._
        // tokens materialize ONCE in their own projection — the HOF
        // consumers are CodegenFallback, so an inline tokenize subtree
        // would re-run per use (and per lambda iteration)
        Tables.documents(s, d)
          .select($"doc_id", $"text", TextAnalysis.tokens($"text").as("toks"))
          .select(
            $"doc_id",
            size($"toks").as("n_tokens"),
            length($"text").as("n_chars"),
            TextAnalysis.subwordCountFromTokens($"toks").as("n_subwords"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
              |  len($sqlToks) AS n_tokens,
              |  length(text) AS n_chars,
              |  CAST(coalesce(list_sum(list_transform($sqlToks, t -> greatest(1, CAST(ceil(strlen(t) / 4.0) AS BIGINT)))), 0) AS BIGINT) AS n_subwords
              |FROM documents ORDER BY doc_id""".stripMargin),
      bench = true),

    Q(
      "q21_text_quality",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", $"text", TextAnalysis.tokens($"text").as("toks"))
          .select(
            $"doc_id",
            size($"toks").as("n_tokens"),
            TextAnalysis.punctCount($"text").as("n_punct"),
            TextAnalysis.stopwordCountFromTokens($"toks").as("n_stop"),
            TextAnalysis.meanWordLengthFromTokens($"toks").as("mean_word_len"),
            TextAnalysis.qualityScoreFromTokens($"text", $"toks").as("quality"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, $sqlToks AS toks,
              |  length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS n_punct,
              |  ${sqlStopHits(TextAnalysis.stopwordsEn)} AS n_stop
              |  FROM documents)
              |SELECT doc_id, len(toks) AS n_tokens, n_punct, n_stop,
              |  CASE WHEN len(toks) > 0
              |    THEN CAST(list_sum(list_transform(toks, x -> strlen(x))) AS DOUBLE) / len(toks)
              |    ELSE 0.0 END AS mean_word_len,
              |  (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
              |   + (1.0 - least(n_punct / greatest(CAST(len(toks) AS DOUBLE), 1.0), 1.0))
              |   + least(CAST(n_stop AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0) * 5.0, 1.0)
              |  ) / 3.0 AS quality
              |FROM t ORDER BY doc_id""".stripMargin)),

    Q(
      "q22_text_langid",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", $"text", TextAnalysis.tokens($"text").as("toks"))
          .select(
            $"doc_id",
            TextAnalysis.langIdFromTokens($"text", $"toks").as("lang_pred"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |  length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS n_cjk,
              |  ${sqlStopHits(TextAnalysis.stopwordsEn)} AS en,
              |  ${sqlStopHits(TextAnalysis.stopwordsDe)} AS de,
              |  ${sqlStopHits(TextAnalysis.stopwordsFr)} AS fr,
              |  ${sqlStopHits(TextAnalysis.stopwordsEs)} AS es
              |  FROM documents)
              |SELECT doc_id,
              |  CASE WHEN n_cjk > 0 THEN 'zh'
              |       WHEN en >= de AND en >= fr AND en >= es THEN 'en'
              |       WHEN de >= fr AND de >= es THEN 'de'
              |       WHEN fr >= es THEN 'fr'
              |       ELSE 'es' END AS lang_pred
              |FROM t ORDER BY doc_id""".stripMargin)),

    Q(
      "q23_text_fingerprint",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(
          $"doc_id",
          TextAnalysis.fingerprint($"text").as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- dedup ---------------------------------------------------------
    Q(
      "q24_dedup_exact",
      (s, d) => {
        import s.implicits._
        Dedup.exact(Tables.documents(s, d), $"text", $"doc_id")
          .orderBy($"fp")
      },
      Some("""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
             |  min(doc_id) AS survivor_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin),
      bench = true),

    Q(
      "q25_dedup_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        Dedup.ngramJaccardPairsFromHashed(sharedShingleSets(s, d), threshold = 0.3)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH ${sqlExactJaccardCteFrom("documents")}
              |SELECT id_a, id_b, jaccard FROM exact
              |ORDER BY id_a, id_b""".stripMargin),
      bench = true),

    // Soundness + recall oracle: the LSH candidate step is xxhash64-
    // banded (no DuckDB twin), but every SURVIVING pair carries an
    // exact Jaccard — the oracle recomputes it independently and joins
    // the emitted pairs against the exact pair set (any false positive
    // or wrong Jaccard drops a row → count mismatch → red), and the
    // WHERE requires recall ≥ 0.9 of the exact q25 pairs (else the
    // oracle returns zero rows → red).
    Q(
      "q26_dedup_minhash_lsh",
      (s, d) => {
        import s.implicits._
        Dedup.minhashLshPairsFromHashed(sharedShingleSets(s, d), threshold = 0.3)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH ${sqlExactJaccardCteFrom("documents")},
              |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q26_dedup_minhash_lsh/*.parquet')),
              |flag AS (SELECT
              |  ((SELECT count(*) FROM emitted) >= 0.9 * (SELECT count(*) FROM exact)) AS ok)
              |SELECT e.id_a, e.id_b, x.jaccard
              |FROM emitted e JOIN exact x ON e.id_a = x.id_a AND e.id_b = x.id_b
              |  AND abs(e.jaccard - x.jaccard) < 1e-9
              |WHERE (SELECT ok FROM flag)
              |UNION ALL
              |-- poison row on recall failure: an EMPTY Spark result must
              |-- mismatch, not match an empty oracle
              |SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b,
              |  CAST(-999 AS DOUBLE) AS jaccard
              |WHERE NOT (SELECT ok FROM flag)
              |ORDER BY id_a, id_b""".stripMargin),
      bench = true),

    // Full independent oracle: the portable 60-bit md5 SimHash is
    // recomputed bit-for-bit in DuckDB and ALL pairs within Hamming 6
    // are derived by brute force there — banding completeness (7
    // disjoint bands for radius 6) is therefore verified, not assumed.
    Q(
      "q27_dedup_simhash",
      (s, d) => {
        import s.implicits._
        Dedup.simhashPairsPortable(Tables.documents(s, d), $"text", $"doc_id", maxHamming = 6)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
              |hs AS (SELECT doc_id,
              |  list_transform(t, s -> CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT)) AS hs
              |  FROM toks),
              |sig AS (SELECT doc_id, ($sqlPortableSimhash) AS sig FROM hs)
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |  bit_count(xor(a.sig, b.sig)) AS hamming
              |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.sig, b.sig)) <= 6
              |ORDER BY id_a, id_b""".stripMargin)),

    // Bucketed multi-table LSH plan (no unbucketed self-join) with a
    // soundness + recall oracle: DuckDB recomputes the exact all-pairs
    // cosine set; every emitted pair must match it bit-for-bit, and the
    // emitted count must reach ≥ 0.9 of the exact pairs.
    Q(
      "q28_dedup_embedding",
      (s, d) => {
        import s.implicits._
        Dedup.embeddingCosinePairs(Tables.embeddings(s, d), $"embedding", $"vec_id",
          threshold = 0.35, lshBits = 4, tables = 32)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |exact AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  list_dot_product(a.v, b.v)
             |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.v, b.v)
             |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35),
             |emitted AS (SELECT * FROM read_parquet('{{OUT}}/q28_dedup_embedding/*.parquet')),
             |flag AS (SELECT
             |  ((SELECT count(*) FROM emitted) >= 0.9 * (SELECT count(*) FROM exact)) AS ok)
             |SELECT m.id_a, m.id_b, x.cosine
             |FROM emitted m JOIN exact x ON m.id_a = x.id_a AND m.id_b = x.id_b
             |  AND abs(m.cosine - x.cosine) < 1e-9
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |-- poison row on recall failure: an EMPTY Spark result must
             |-- mismatch, not match an empty oracle
             |SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b,
             |  CAST(-999 AS DOUBLE) AS cosine
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- near-dup cluster resolution: pairs → connected components →
    // canonical survivor per cluster. Oracle: transitive closure by
    // recursive CTE over the same exact pair set, min reachable id per
    // node — a fully independent reimplementation of the label-
    // propagation loop.
    Q(
      "q34_dedup_clusters",
      (s, d) => {
        import s.implicits._
        val pairs = Dedup.ngramJaccardPairsFromHashed(sharedShingleSets(s, d), threshold = 0.3)
        materializeThenRelease(s, Dedup.clusters(pairs))(identity).orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE ${sqlExactJaccardCteFrom("documents")},
              |edges AS (SELECT id_a AS src, id_b AS dst FROM exact
              |  UNION SELECT id_b, id_a FROM exact),
              |reach(doc_id, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id)
              |SELECT doc_id, min(r) AS cluster_id FROM reach
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- deterministic train/val/test split by content hash.
    Q(
      "q35_train_test_split",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", Dedup.splitAssign($"text").as("split"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN substring(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 32, 1) IN ('0','1') THEN 'test'
             |       WHEN substring(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 32, 1) = '2' THEN 'validation'
             |       ELSE 'train' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- similarity search --------------------------------------------
    Q(
      "q29_ann_brute_topk",
      (s, d) => {
        import s.implicits._
        val corpus = Tables.embeddings(s, d)
        val queries = corpus.filter($"vec_id" < 10)
        Similarity.bruteForceTopK(corpus, queries,
          $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5)
          .orderBy($"query_id", $"rank")
      },
      // exact top-k: the shared scoring CTE (also the base of the
      // q30/q38 soundness oracles) ranked per query — one definition of
      // the exact cosine, not a drifting copy
      Some(s"""WITH $sqlAnnScoredCte
              |SELECT query_id, rank, corpus_id, cosine FROM (
              |  SELECT *,
              |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS INT) AS rank
              |  FROM scored)
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      bench = true),

    Q(
      "q30_ann_lsh_topk",
      (s, d) => {
        import s.implicits._
        val corpus = Tables.embeddings(s, d)
        val queries = corpus.filter($"vec_id" < 10)
        // 4-bit × 32-table amplification: this corpus's true neighbors
        // sit at cosine 0.35-0.5 where per-bit collision ≈ 0.62-0.65,
        // so recall@5 ≈ 1-(1-p⁴)³² ≈ 0.99; 6×8 (round 1) recalled 0.34
        Similarity.lshTopK(corpus, queries,
          $"embedding", $"vec_id", $"embedding", $"vec_id", k = 5, bits = 4, tables = 32)
          .orderBy($"query_id", $"rank")
      },
      Some(annSoundnessOracle("q30_ann_lsh_topk", k = 5, recallFloor = 0.8))),

    Q(
      "q38_ann_ivf_topk",
      (s, d) => {
        import s.implicits._
        val corpus = Tables.embeddings(s, d)
        val queries = corpus.filter($"vec_id" < 10)
        Similarity.ivfTopK(corpus, queries,
          $"embedding", $"vec_id", $"embedding", $"vec_id",
          k = 5, nlist = 16, nprobe = 4)
          .orderBy($"query_id", $"rank")
      },
      // floor 0.45: observed recall@5 = 0.66 at nprobe/nlist = 25%
      // scanned (kmeans++-seeded quantizer); generous margin
      Some(annSoundnessOracle("q38_ann_ivf_topk", k = 5, recallFloor = 0.45))),

    // ---- multimodal ----------------------------------------------------
    Q(
      "q31_mm_metadata",
      (s, d) => {
        import s.implicits._
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text", "text/plain")
          .select($"media_id", $"byte_len", sha2($"media", 256).as("sha"))
          .orderBy($"media_id")
      },
      Some("""SELECT doc_id AS media_id, strlen(text)::BIGINT AS byte_len,
             |  sha256(text) AS sha
             |FROM documents ORDER BY media_id""".stripMargin)),

    // ---- skew mitigation: salted two-phase aggregation over the hot
    // event_type keys — result equals the plain GROUP BY (the oracle).
    Q(
      "q33_skew_salted_agg",
      (s, d) => {
        import s.implicits._
        graft.operators.Skew.saltedAggregate(
          Tables.events(s, d),
          keys = Seq("event_type"),
          partialAggs = Seq(
            count(lit(1)).as("pn"),
            sum($"value".cast("decimal(18,6)")).as("pt")),
          finalAggs = Seq(
            sum($"pn").as("n"),
            sum($"pt").cast("decimal(18,6)").cast("double").as("total_value")),
          salts = 16)
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS total_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- end-to-end curation pipeline: quality filter → language
    // filter → exact dedup (min-id survivor) → near-dup
    // canonicalization (drop non-canonical cluster members) → split
    // assignment. The operators composed exactly as a training-data
    // pipeline would chain them; the oracle recomputes the ENTIRE
    // chain independently in DuckDB (quality/langid expressions,
    // md5-fingerprint dedup, unblocked Jaccard pairs + recursive-CTE
    // connected components, hash-bucket split).
    Q(
      "q42_curation_pipeline",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val scored = docs
          .select($"doc_id", $"text", TextAnalysis.tokens($"text").as("toks"))
          .select(
            $"doc_id", $"text",
            size($"toks").as("n_tokens"),
            TextAnalysis.qualityScoreFromTokens($"text", $"toks").as("quality"),
            TextAnalysis.langIdFromTokens($"text", $"toks").as("lang_pred"))
        val kept = scored.filter($"quality" >= 0.5 && $"lang_pred" === "en")
        val surv = Dedup.exact(kept, $"text", $"doc_id")
          .select($"survivor_id".as("doc_id"))
        val ek = kept.join(surv, "doc_id")
        val pairs = Dedup.ngramJaccardPairsFromHashed(
          Dedup.hashedShingleSets(ek, $"text", $"doc_id", n = 3), threshold = 0.3)
        val nonCanonical = materializeThenRelease(s, Dedup.clusters(pairs))(
          _.filter($"cluster_id" =!= $"doc_id").select("doc_id"))
        ek.join(nonCanonical, Seq("doc_id"), "left_anti")
          .select($"doc_id", $"n_tokens", $"quality", $"lang_pred",
            Dedup.splitAssign($"text").as("split"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE s0 AS (SELECT doc_id, text, $sqlToks AS tk,
              |   length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS n_punct,
              |   ${sqlStopHits(TextAnalysis.stopwordsEn)} AS en,
              |   ${sqlStopHits(TextAnalysis.stopwordsDe)} AS de,
              |   ${sqlStopHits(TextAnalysis.stopwordsFr)} AS fr,
              |   ${sqlStopHits(TextAnalysis.stopwordsEs)} AS es,
              |   length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS n_cjk,
              |   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
              |  FROM documents),
              |scored AS (SELECT doc_id, text, len(tk) AS n_tokens,
              |   (least(CAST(length(text) AS DOUBLE)/500.0, 1.0)
              |    + (1.0 - least(n_punct / greatest(CAST(len(tk) AS DOUBLE), 1.0), 1.0))
              |    + least(CAST(en AS DOUBLE) / greatest(CAST(len(tk) AS DOUBLE), 1.0) * 5.0, 1.0)
              |   ) / 3.0 AS quality,
              |   CASE WHEN n_cjk > 0 THEN 'zh'
              |        WHEN en >= de AND en >= fr AND en >= es THEN 'en'
              |        WHEN de >= fr AND de >= es THEN 'de'
              |        WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_pred,
              |   fp, substring(fp, 32, 1) AS bucket
              |  FROM s0),
              |kept AS (SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'),
              |surv AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY fp),
              |ek AS (SELECT k.* FROM kept k JOIN surv USING (doc_id)),
              |${sqlExactJaccardCteFrom("ek")},
              |edges AS (SELECT id_a AS src, id_b AS dst FROM exact
              |  UNION SELECT id_b, id_a FROM exact),
              |reach(doc_id, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id),
              |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
              |SELECT ek.doc_id, n_tokens, quality, lang_pred,
              |  CASE WHEN bucket IN ('0','1') THEN 'test'
              |       WHEN bucket = '2' THEN 'validation'
              |       ELSE 'train' END AS split
              |FROM ek LEFT JOIN cl ON ek.doc_id = cl.doc_id
              |WHERE cl.cluster_id IS NULL OR cl.cluster_id = ek.doc_id
              |ORDER BY ek.doc_id""".stripMargin)),

    Q(
      "q32_mm_frames",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text", "text/plain")
        Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
          .select($"media_id", $"frame_no", $"frame_bytes")
          .orderBy($"media_id", $"frame_no")
      },
      Some("""SELECT media_id, frame_no,
             |  least(32, byte_len - frame_no * 32)::BIGINT AS frame_bytes
             |FROM (
             |  SELECT doc_id AS media_id, strlen(text)::BIGINT AS byte_len,
             |    unnest(range(0, greatest(CAST(ceil(strlen(text) / 32.0) AS BIGINT), 1))) AS frame_no
             |  FROM documents)
             |WHERE frame_no % 2 = 0
             |ORDER BY media_id, frame_no""".stripMargin)),

    // ---- STREAMING exact dedup: the dedup family's streaming variant.
    // A real micro-batch run (file-stream source → fingerprint →
    // dropDuplicates state → memory sink, AvailableNow) whose emitted
    // set — the distinct content fingerprints — is deterministic
    // regardless of arrival order, so the DuckDB oracle is a plain
    // DISTINCT over the same normalization. Production streams bound
    // the state with dropDuplicatesWithinWatermark; an end-of-stream
    // batch gate exercises the unbounded variant.
    Q(
      "q44_streaming_dedup",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.Trigger
        // staging + checkpoint on RAM-backed scratch ([[Scratch]]): the
        // stream's checkpoint fsyncs must not be hostage to a slow disk.
        // Input and checkpoint are SIBLINGS — the checkpoint must never
        // sit where the file-stream source lists input
        val scratch = Scratch.tempDir("q44_docs")
        val dir = scratch.resolve("input")
        java.nio.file.Files.createDirectory(dir)
        try {
          val schema = s.read.parquet(s"$d/documents.parquet").schema
          // file- AND directory-shaped tables (see stageTableLinks —
          // a directory symlink yields zero input files)
          Scratch.stageTableLinks(dir,
            java.nio.file.Paths.get(s"$d/documents.parquet").toAbsolutePath)
          val name = "q44_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
          // the memory-sink view drops in a finally: a failed/timed-out
          // stream must not leak its collected rows into the session
          // for the session's lifetime
          try {
            val q = s.readStream.schema(schema).parquet(dir.toString)
              .select(TextAnalysis.fingerprint($"text").as("fp"))
              .dropDuplicates("fp")
              .writeStream.outputMode("append")
              .format("memory").queryName(name)
              .option("checkpointLocation", scratch.resolve("_ckpt").toString)
              .trigger(Trigger.AvailableNow())
              .start()
            try require(q.awaitTermination(600000),
              "q44 stream did not terminate within 600s — refusing a partial result")
            finally q.stop()
            // one eager localCheckpoint decouples the result from the
            // temp view dropped in the finally — no driver-side row
            // copy (the q191 discipline)
            s.table(name).localCheckpoint(true).orderBy($"fp")
          } finally s.catalog.dropTempView(name)
        } finally Scratch.deleteRecursively(scratch)
      },
      Some("""SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents ORDER BY fp""".stripMargin)),

    // ---- document chunking: long docs → overlapping token windows
    // (model-context-sized training examples). window=50, overlap=10 →
    // stride 40; the oracle recomputes every window by list arithmetic.
    Q(
      "q46_doc_chunking",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
          .select($"doc_id",
            posexplode(TextAnalysis.chunkTokens($"toks", window = 50, overlap = 10))
              .as(Seq("chunk_no", "chunk")))
          .select(
            $"doc_id", $"chunk_no",
            size($"chunk").as("n_chunk_tokens"),
            concat_ws(" ", $"chunk").as("chunk_text"))
          .orderBy($"doc_id", $"chunk_no")
      },
      // coalesce mirrors chunkTokens' null-token handling: a null text
      // yields one empty chunk on BOTH sides (n_chunk_tokens=0,
      // chunk_text=''), not a null-propagated disagreement
      Some(s"""WITH t AS (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents),
              |c AS (SELECT doc_id, tk,
              |    unnest(range(0, greatest(CAST(ceil((len(tk) - 10) / 40.0) AS BIGINT), 1))) AS chunk_no
              |  FROM t)
              |SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
              |  CAST(len(list_slice(tk, chunk_no*40 + 1, chunk_no*40 + 50)) AS INT) AS n_chunk_tokens,
              |  coalesce(array_to_string(list_slice(tk, chunk_no*40 + 1, chunk_no*40 + 50), ' '), '')
              |    AS chunk_text
              |FROM c ORDER BY doc_id, chunk_no""".stripMargin)),

    // ---- deterministic stratified sampling: per-language data-mixing
    // rates (downsample overrepresented en to 30%, keep all zh, 60%
    // elsewhere) as a pure content-hash filter — no RNG, append-stable,
    // recomputed exactly by the oracle.
    Q(
      "q47_stratified_sample",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .filter(graft.operators.Sampling.stratifiedKeep(
            $"lang", $"text", Map("en" -> 30, "zh" -> 100), defaultRate = 60))
          .select($"doc_id", $"lang", $"source")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang, source FROM documents
             |WHERE CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 100 <
             |  CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 100 ELSE 60 END
             |ORDER BY doc_id""".stripMargin)),

    // ---- token-budget mixing: cap each source at 500 tokens, best
    // quality first (deterministic tie-break by doc_id) — the step that
    // turns a mixing recipe into concrete rows. The first doc crossing
    // the budget is kept (budget-inclusive), so a stratum never
    // vanishes because its best doc is large. Two-phase plan: quality
    // buckets decide almost every row map-side, and only the boundary
    // bucket runs an exact window (see Sampling.tokenBudgetCap); the
    // oracle recomputes the ranking and running totals exactly with a
    // single global window, so it also re-proves the equivalence.
    Q(
      "q48_token_budget_mix",
      (s, d) => {
        import s.implicits._
        val scored = Tables.documents(s, d)
          .select($"doc_id", $"source", $"text", TextAnalysis.tokens($"text").as("toks"))
          .select($"doc_id", $"source", $"text",
            size($"toks").cast("long").as("n_tokens"),
            TextAnalysis.qualityScoreFromTokens($"text", $"toks").as("quality"))
        graft.operators.Sampling.tokenBudgetCap(
          scored, $"source", $"n_tokens", $"quality", $"doc_id", tokenBudget = 500L)
          .select($"doc_id", $"source", $"n_tokens", $"quality")
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, text, $sqlToks AS tk,
              |   length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS n_punct,
              |   ${sqlStopHits(TextAnalysis.stopwordsEn)} AS n_stop
              |  FROM documents),
              |scored AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
              |   (least(CAST(length(text) AS DOUBLE)/500.0, 1.0)
              |    + (1.0 - least(n_punct / greatest(CAST(len(tk) AS DOUBLE), 1.0), 1.0))
              |    + least(CAST(n_stop AS DOUBLE) / greatest(CAST(len(tk) AS DOUBLE), 1.0) * 5.0, 1.0)
              |   ) / 3.0 AS quality
              |  FROM t),
              |cum AS (SELECT *, sum(n_tokens) OVER (
              |    PARTITION BY source ORDER BY quality DESC, doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum_tokens
              |  FROM scored)
              |SELECT doc_id, source, n_tokens, quality FROM cum
              |WHERE cum_tokens - n_tokens < 500
              |ORDER BY doc_id""".stripMargin)),

    // ---- eval-set decontamination: drop corpus docs sharing ≥3
    // 3-gram shingles with the "benchmark" slice (source='src0') —
    // benchmark-leakage removal. Eval shingles broadcast (benchmarks
    // are tiny); the corpus moves only through a left-anti join on id.
    // The oracle recomputes the shared-shingle counts exactly.
    Q(
      "q49_decontaminate",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        Dedup.decontaminate(
          corpus = docs.filter($"source" =!= "src0"),
          evalSet = docs.filter($"source" === "src0"),
          $"text", $"doc_id", n = 3, minOverlap = 3)
          .select($"doc_id", $"source")
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $sqlToks AS t FROM documents),
              |sh AS (SELECT doc_id, source, list_distinct(CASE WHEN len(t) >= 3
              |    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
              |    ELSE [array_to_string(t, ' ')] END) AS sh FROM toks),
              |ev AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE source = 'src0'),
              |corp AS (SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE source <> 'src0'),
              |bad AS (SELECT doc_id FROM corp JOIN ev USING (shingle)
              |  GROUP BY doc_id HAVING count(*) >= 3)
              |SELECT d.doc_id, d.source FROM documents d
              |WHERE d.source <> 'src0' AND d.doc_id NOT IN (SELECT doc_id FROM bad)
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- WATERMARKED streaming dedup: the bounded-state production
    // variant q44's comment promises. Every event is duplicated (Δt=0
    // between copies, so every duplicate pair sits inside the 10-minute
    // watermark and is GUARANTEED to collapse — see StreamingDedup),
    // staged as time-range files processed in event-time order, and
    // deduped on (user_id, event_type, minute bucket) — a key no wider
    // than the watermark, so the emitted set is exactly DISTINCT(keys)
    // and the oracle recomputes it with a plain GROUP BY. State is
    // evicted as the watermark advances (asserted via state-store
    // metrics in StreamingDedupSpec — not expressible in SQL).
    Q(
      "q50_streaming_dedup_watermark",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.Trigger
        // staging + checkpoint on RAM-backed scratch ([[Scratch]]): four
        // micro-batches × shuffle-partition state stores is metadata-
        // heavy checkpoint traffic that a slow disk turns into minutes
        val scratch = Scratch.tempDir("q50_events")
        val dir = scratch.resolve("input").toFile
        dir.mkdirs()
        try {
          // Tables.events handles the TIMESTAMP(NANOS) parquet (nanos →
          // µs conversion); the re-staged files below are plain µs
          val ev = Tables.events(s, d).select($"ts", $"user_id", $"event_type")
          val staged = ev.union(ev) // exact duplicate of every event
          staged.repartitionByRange(4, $"ts").sortWithinPartitions($"ts")
            .write.mode("overwrite").parquet(dir.toString)
          // ascending mod times pin file processing order to time-range
          // order — a later-range file processed first would advance the
          // watermark and drop earlier files' rows as late
          val parts = dir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
          val base = (System.currentTimeMillis() / 1000L) * 1000L - 3600000L
          parts.zipWithIndex.foreach { case (f, i) =>
            // the ascending mod times ARE the ordering invariant — a
            // filesystem that silently refuses them would scramble batch
            // order and drop rows as late; fail loudly instead
            require(f.setLastModified(base + i * 2000L),
              s"could not set modification time on $f — staging order not guaranteed")
          }
          val name = "q50_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
          try {
            val q = s.readStream.schema(staged.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(dir.toString)
              .withColumn("minute", date_trunc("minute", $"ts"))
              .transform(df => graft.streaming.StreamingDedup.withinWatermark(
                df, eventTime = "ts", delay = "10 minutes",
                keys = Seq("user_id", "event_type", "minute")))
              .select($"user_id", $"event_type", $"minute")
              .writeStream.outputMode("append")
              .format("memory").queryName(name)
              .option("checkpointLocation", scratch.resolve("_ckpt").toString)
              .trigger(Trigger.AvailableNow())
              .start()
            try require(q.awaitTermination(600000),
              "q50 stream did not terminate within 600s — refusing a partial result")
            finally q.stop()
            // one eager localCheckpoint decouples the result from the
            // temp view dropped in the finally — no driver-side row
            // copy (the q191 discipline)
            s.table(name).localCheckpoint(true)
              .orderBy($"user_id", $"event_type", $"minute")
          } finally s.catalog.dropTempView(name)
        } finally Scratch.deleteRecursively(scratch)
      },
      Some("""SELECT user_id, event_type, date_trunc('minute', ts) AS minute
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY user_id, event_type, minute""".stripMargin)),

    // ---- repetition-based quality filtering: the Gopher/MassiveText
    // repetition signals (duplicate n-gram fraction, top-token share)
    // that catch boilerplate, keyword stuffing, and degenerate
    // generations which the q21 composite score misses. Exact integer
    // counts then one double division — the oracle reproduces every
    // value bit-for-bit and re-derives the keep flag.
    Q(
      "q51_repetition_quality",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
          .select(
            $"doc_id",
            TextAnalysis.dupNgramFraction($"toks", 2).as("dup_2gram_frac"),
            TextAnalysis.dupNgramFraction($"toks", 3).as("dup_3gram_frac"),
            TextAnalysis.topTokenShare($"toks").as("top_token_share"))
          .withColumn("keep",
            $"dup_2gram_frac" < 0.05 && $"dup_3gram_frac" < 0.02 &&
              $"top_token_share" < 0.1)
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents),
              |g AS (SELECT doc_id, tk,
              |  CASE WHEN len(tk) >= 2
              |    THEN [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
              |    ELSE [] END AS g2,
              |  CASE WHEN len(tk) >= 3
              |    THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
              |    ELSE [] END AS g3
              | FROM t),
              |m AS (SELECT doc_id,
              |  CASE WHEN len(g2) > 0
              |    THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
              |    ELSE 0.0 END AS dup_2gram_frac,
              |  CASE WHEN len(g3) > 0
              |    THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
              |    ELSE 0.0 END AS dup_3gram_frac,
              |  CASE WHEN len(tk) > 0
              |    THEN CAST(list_max(list_transform(list_distinct(tk),
              |           x -> len(list_filter(tk, y -> y = x)))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
              |    ELSE 0.0 END AS top_token_share
              | FROM g)
              |SELECT doc_id, dup_2gram_frac, dup_3gram_frac, top_token_share,
              |  (dup_2gram_frac < 0.05 AND dup_3gram_frac < 0.02 AND top_token_share < 0.1) AS keep
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- PII redaction: emails / IPv4s / phone-shaped numbers →
    // typed placeholders, plus per-class counts over the original
    // text — the pre-training privacy scrub. The corpus has no natural
    // PII, so the query stages deterministic PII-bearing text derived
    // from (source, doc_id) for 2/3 of the docs (the other third
    // exercises the no-match path); the oracle rebuilds the identical
    // staged text and applies the same RE2-compatible patterns in the
    // same order.
    Q(
      "q52_pii_redaction",
      (s, d) => {
        import s.implicits._
        val staged = Tables.documents(s, d).select(
          $"doc_id",
          when($"doc_id" % 3 === 0, $"text")
            .otherwise(concat(
              $"text", lit(" contact "), $"source", lit("."),
              $"doc_id".cast("string"), lit("@example.com from 10.0."),
              ($"doc_id" % 256).cast("string"), lit("."),
              (($"doc_id" * 7) % 256).cast("string"), lit(" tel 555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
            .as("text"))
        val Seq(nEmail, nIp, nPhone) = TextAnalysis.piiCounts($"text")
        staged.select(
          $"doc_id",
          TextAnalysis.redactPii($"text").as("clean_text"),
          nEmail.cast("long").as("n_email"),
          nIp.cast("long").as("n_ip"),
          nPhone.cast("long").as("n_phone"))
          .orderBy($"doc_id")
      },
      Some("""WITH staged AS (SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN text
             |       ELSE text || ' contact ' || source || '.' || doc_id ||
             |            '@example.com from 10.0.' || (doc_id % 256) || '.' ||
             |            ((doc_id * 7) % 256) || ' tel 555-' ||
             |            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |  END AS text
             | FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             |    '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS clean_text,
             |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             |  len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ip,
             |  len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{4}\b')) AS n_phone
             |FROM staged ORDER BY doc_id""".stripMargin)),

    // ---- deterministic corpus shuffle + sharding: every doc gets a
    // content-hash shard (output file) and rank within it — the
    // "shuffle before training" step, reproducible across engines and
    // re-runs because there is no RNG anywhere. The oracle recomputes
    // shard and rank from the same md5 ordering.
    Q(
      "q53_shuffle_shard",
      (s, d) => {
        import s.implicits._
        graft.operators.Sampling.shuffleShard(
          Tables.documents(s, d).select($"doc_id", $"text"),
          hashOn = $"text", id = $"doc_id", numShards = 8)
          .select($"doc_id", $"shard", $"pos".cast("long").as("pos"))
          .orderBy($"shard", $"pos")
      },
      Some("""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
             |s AS (SELECT doc_id,
             |  CAST(('0x' || substring(hx, 1, 8)) AS BIGINT) % 8 AS shard,
             |  row_number() OVER (
             |    PARTITION BY CAST(('0x' || substring(hx, 1, 8)) AS BIGINT) % 8
             |    ORDER BY hx, doc_id) AS pos
             | FROM h)
             |SELECT doc_id, shard, pos FROM s ORDER BY shard, pos""".stripMargin)),

    // ---- cluster canonicalization: near-dup pairs → connected
    // components → keep ONE survivor per component (longest doc,
    // ties → smallest id) — the step that turns pair detection into an
    // actual deduplicated corpus. Oracle: the q34 transitive-closure
    // CTE plus an independent window formulation of the survivor rule
    // (the Spark side uses a partial-aggregable struct-max instead of
    // a window — the oracle equivalence re-proves they agree).
    Q(
      "q54_dedup_keep_best",
      (s, d) => {
        import s.implicits._
        val pairs = Dedup.ngramJaccardPairsFromHashed(sharedShingleSets(s, d), threshold = 0.3)
        materializeThenRelease(s, Dedup.keepBestPerCluster(
          Tables.documents(s, d), pairs, $"doc_id", $"n_chars".cast("double")))(
          _.select($"doc_id", $"cluster_id", $"n_members"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE ${sqlExactJaccardCteFrom("documents")},
              |edges AS (SELECT id_a AS src, id_b AS dst FROM exact
              |  UNION SELECT id_b, id_a FROM exact),
              |reach(doc_id, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id),
              |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
              |all_docs AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
              |    d.n_chars
              |  FROM documents d LEFT JOIN lab l USING (doc_id)),
              |ranked AS (SELECT *,
              |    row_number() OVER (PARTITION BY cluster_id
              |      ORDER BY n_chars DESC, doc_id) AS rn,
              |    count(*) OVER (PARTITION BY cluster_id) AS n_members
              |  FROM all_docs)
              |SELECT doc_id, cluster_id, n_members FROM ranked
              |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ---- exact substring dedup (Lee et al. 2022 style): remove every
    // duplicated 15-token span, keeping the globally first occurrence —
    // the span-level dedup document-level ops can't do. The Spark side
    // finds the first occurrence with a partial-aggregable struct-min;
    // the oracle re-derives it with an independent per-gram window
    // (rn > 1) and rebuilds every cleaned document token-by-token.
    Q(
      "q55_dedup_spans",
      (s, d) => {
        import s.implicits._
        Dedup.dedupSpans(Tables.documents(s, d), $"text", $"doc_id", k = 15)
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents),
              |g AS (SELECT doc_id, unnest(range(1, len(tk) - 13)) AS i, tk FROM t
              |  WHERE len(tk) >= 15),
              |o AS (SELECT doc_id, i - 1 AS pos,
              |    md5(array_to_string(tk[i:i+14], ' ')) AS gh FROM g),
              |r AS (SELECT doc_id, pos,
              |    count(*) OVER (PARTITION BY gh) AS cnt,
              |    row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
              |  FROM o),
              |starts AS (SELECT doc_id, pos FROM r WHERE cnt >= 2 AND rn > 1),
              |cov AS (SELECT DISTINCT doc_id, pos + u AS cpos
              |  FROM starts, unnest(range(0, 15)) AS r2(u)),
              |p AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS i, tk FROM t),
              |kept AS (SELECT p.doc_id, p.i - 1 AS pos, p.tk[p.i] AS tok FROM p
              |  WHERE NOT EXISTS (SELECT 1 FROM cov
              |    WHERE cov.doc_id = p.doc_id AND cov.cpos = p.i - 1)),
              |cl AS (SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
              |    count(*) AS n_kept FROM kept GROUP BY doc_id)
              |SELECT t.doc_id, coalesce(cl.clean_text, '') AS clean_text,
              |  CAST(coalesce(cl.n_kept, 0) AS BIGINT) AS n_kept,
              |  CAST(len(t.tk) - coalesce(cl.n_kept, 0) AS BIGINT) AS n_removed
              |FROM t LEFT JOIN cl USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // ---- corpus vocabulary statistics: top tokens by occurrence with
    // document frequency — the tokenizer-training / stopword-diagnosis
    // view of the corpus. Partial-aggregable groupBy + bounded top-k.
    Q(
      "q56_token_vocab",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("token"))
          .groupBy($"token")
          .agg(count(lit(1)).as("n_occurrences"), countDistinct($"doc_id").as("n_docs"))
          .orderBy($"n_occurrences".desc, $"token")
          .limit(30)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS token FROM documents)
              |SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
              |FROM tok GROUP BY token
              |ORDER BY n_occurrences DESC, token LIMIT 30""".stripMargin)),

    // ---- BM25 relevance ranking: retrieval-targeted data selection
    // ("the docs most about spark/merge/window"). Corpus stats (N,
    // total length, per-term dfs) are integer sums — exact and
    // portable — but the score contains ln(), and ln() libraries are
    // not guaranteed bit-identical across engines (JVM intrinsic vs
    // libm). So the oracle is the q45/q61-style TOLERANCE gate: DuckDB
    // recomputes every score its own way and admits the emitted rows
    // only if (a) every emitted score agrees within 1e-9, (b) the
    // emitted ids are distinct and form a true top-K (no outside doc
    // scores more than 1e-9 above the worst emitted), and (c) the
    // emitted order equals the recomputed (score desc, doc_id) order —
    // poison row otherwise. Adjacent docs either share the identical
    // (tf…, len) stat tuple (both engines then fold to exactly equal
    // doubles and tie-break by id the same way) or differ by far more
    // than the tolerance, so the order check cannot flap on ulps.
    Q(
      "q57_bm25_rank",
      (s, d) => {
        import s.implicits._
        TextAnalysis.bm25Rank(
          Tables.documents(s, d), $"text", $"doc_id",
          terms = Seq("spark", "merge", "window"), topK = 20)
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q57_bm25_rank/*.parquet')),
              |t AS (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents),
              |st AS (SELECT count(*) AS n, sum(len(tk)) AS totlen,
              |    sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END) AS df0,
              |    sum(CASE WHEN list_contains(tk, 'merge') THEN 1 ELSE 0 END) AS df1,
              |    sum(CASE WHEN list_contains(tk, 'window') THEN 1 ELSE 0 END) AS df2
              |  FROM t),
              |sc AS (SELECT doc_id,
              |    ln((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
              |      * (CAST(len(list_filter(tk, x -> x = 'spark')) AS DOUBLE) * (1.2 + 1.0))
              |      / (CAST(len(list_filter(tk, x -> x = 'spark')) AS DOUBLE)
              |         + 1.2 * (0.25 + 0.75 * CAST(len(tk) AS DOUBLE) / (CAST(totlen AS DOUBLE) / CAST(n AS DOUBLE))))
              |    + ln((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
              |      * (CAST(len(list_filter(tk, x -> x = 'merge')) AS DOUBLE) * (1.2 + 1.0))
              |      / (CAST(len(list_filter(tk, x -> x = 'merge')) AS DOUBLE)
              |         + 1.2 * (0.25 + 0.75 * CAST(len(tk) AS DOUBLE) / (CAST(totlen AS DOUBLE) / CAST(n AS DOUBLE))))
              |    + ln((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
              |      * (CAST(len(list_filter(tk, x -> x = 'window')) AS DOUBLE) * (1.2 + 1.0))
              |      / (CAST(len(list_filter(tk, x -> x = 'window')) AS DOUBLE)
              |         + 1.2 * (0.25 + 0.75 * CAST(len(tk) AS DOUBLE) / (CAST(totlen AS DOUBLE) / CAST(n AS DOUBLE))))
              |    AS score
              |  FROM t, st),
              |worst AS (SELECT min(sc.score) AS w FROM sc
              |  WHERE sc.doc_id IN (SELECT doc_id FROM emitted)),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted)
              |      = least(20, (SELECT count(*) FROM t))
              |    AND (SELECT count(DISTINCT doc_id) FROM emitted)
              |      = (SELECT count(*) FROM emitted)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e
              |      WHERE e.doc_id NOT IN (SELECT doc_id FROM sc))
              |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN sc USING (doc_id)
              |      WHERE abs(e.score - sc.score) > 1e-9)
              |    AND NOT EXISTS (SELECT 1 FROM sc
              |      WHERE sc.doc_id NOT IN (SELECT doc_id FROM emitted)
              |        AND sc.score > (SELECT w FROM worst) + 1e-9)
              |    AND NOT EXISTS (SELECT 1 FROM (
              |        SELECT row_number() OVER (ORDER BY e.score DESC, e.doc_id) AS re,
              |               row_number() OVER (ORDER BY sc.score DESC, sc.doc_id) AS rx
              |        FROM emitted e JOIN sc USING (doc_id))
              |      WHERE re <> rx)
              |  ) AS ok)
              |SELECT doc_id, score FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
              |  WHERE NOT (SELECT ok FROM flag)
              |ORDER BY doc_id""".stripMargin)),

    // ---- int8 embedding quantization: per-vector symmetric scale +
    // quantized values — vector-serving prep. Rounding is floor(v+0.5)
    // by definition (engine round() semantics differ on halves), so
    // the oracle reproduces every element exactly. The quantized
    // vector is EXPLODED to one (vec_id, idx, qval) row per element:
    // the driver's compare lexsorts raw result columns, which only
    // works on scalar types (an array column crashes it — see the
    // scalar-schema guard in graft.Verify).
    Q(
      "q58_embedding_quantize",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .select($"vec_id", Similarity.quantizeInt8($"embedding").as("q"))
          .select($"vec_id", $"q.scale".as("scale"),
            posexplode($"q.qvec").as(Seq("idx", "qval")))
          .orderBy($"vec_id", $"idx")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
             |q AS (SELECT vec_id, maxabs / 127.0 AS scale,
             |    CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0)
             |         ELSE list_transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS INT)) END AS qvec
             |  FROM m)
             |SELECT vec_id, scale, CAST(generate_subscripts(qvec, 1) - 1 AS INT) AS idx,
             |  unnest(qvec) AS qval
             |FROM q ORDER BY vec_id, idx""".stripMargin)),

    // ---- sequence packing: docs → fixed-capacity training bins
    // (cap 256 tokens), first-fit-decreasing inside content-hash
    // shards. Deterministic end to end, so the oracle replays the
    // sequential fill exactly with a recursive CTE.
    Q(
      "q59_sequence_pack",
      (s, d) => {
        import s.implicits._
        val sized = Tables.documents(s, d).select(
          $"doc_id",
          size(coalesce(TextAnalysis.tokens($"text"), array())).cast("long").as("n_tokens"))
        graft.operators.Sampling.packChunks(
          sized, $"doc_id", $"n_tokens", binCapacity = 256, numShards = 4)
          .select($"id".as("doc_id"), $"shard", $"bin")
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id,
              |    CAST(len(coalesce($sqlToks, [])) AS BIGINT) AS sz,
              |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS shard
              |  FROM documents),
              |r AS (SELECT doc_id, sz, shard,
              |    row_number() OVER (PARTITION BY shard ORDER BY sz DESC, doc_id) AS rn FROM t),
              |pack AS (
              |  SELECT shard, rn, doc_id, sz, 0 AS bin, sz AS used FROM r WHERE rn = 1
              |  UNION ALL
              |  SELECT r.shard, r.rn, r.doc_id, r.sz,
              |    CASE WHEN p.used + r.sz > 256 THEN p.bin + 1 ELSE p.bin END,
              |    CASE WHEN p.used + r.sz > 256 THEN r.sz ELSE p.used + r.sz END
              |  FROM pack p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
              |SELECT doc_id, shard, bin FROM pack ORDER BY doc_id""".stripMargin)),

    // ---- temperature-flattened mixture sampling: rate_s = min(1,
    // 0.3·sqrt(n_max/n_s)) per language — big languages downsample to
    // the base rate, rare ones boost toward parity. Rates derive from
    // exact integer counts and sqrt (IEEE correctly-rounded), so the
    // oracle recomputes the identical rates and the identical keep set.
    Q(
      "q60_temperature_mix",
      (s, d) => {
        import s.implicits._
        graft.operators.Sampling.temperatureSample(
          Tables.documents(s, d).select($"doc_id", $"lang", $"text"),
          stratum = $"lang", hashOn = $"text", baseRate = 0.3, alpha = 0.5)
          .select($"doc_id", $"lang")
          .orderBy($"doc_id")
      },
      // IS NOT DISTINCT FROM mirrors the operator's null-safe stratum
      // join: a null-lang row gets a rate (counts group nulls too)
      // instead of silently vanishing from the oracle only
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
             |m AS (SELECT max(n) AS mx FROM c),
             |r AS (SELECT lang AS rlang,
             |    least(1.0, 0.3 * sqrt(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE))) AS rate
             |  FROM c, m)
             |SELECT d.doc_id, d.lang FROM documents d
             |LEFT JOIN r ON d.lang IS NOT DISTINCT FROM r.rlang
             |WHERE CAST(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS DOUBLE)
             |      < rate * 4294967296.0
             |ORDER BY doc_id""".stripMargin)),

    // ---- unigram-LM perplexity-proxy scoring: mean token
    // log-probability under the corpus unigram model (top-64k vocab,
    // 1/total OOV floor). The Spark fold is array-ordered and
    // deterministic; summation order and ln() libraries differ across
    // engines, so the oracle is the q45-style tolerance gate: DuckDB
    // recomputes every score its own way, admits the emitted rows only
    // if every score agrees within 1e-9 (and counts/nulls match
    // exactly), and emits a poison row otherwise.
    Q(
      "q61_unigram_logprob",
      (s, d) => {
        import s.implicits._
        TextAnalysis.unigramLogProb(Tables.documents(s, d), $"text", $"doc_id")
          .orderBy($"doc_id")
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q61_unigram_logprob/*.parquet')),
              |tok AS (SELECT doc_id, unnest(coalesce($sqlToks, [])) AS token FROM documents),
              |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
              |tot AS (SELECT sum(c) AS total FROM cnt),
              |voc AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 65536),
              |sc AS (SELECT t.doc_id, count(*) AS n,
              |    sum(ln(CAST(coalesce(v.c, 1) AS DOUBLE) / (SELECT total FROM tot))) AS lp
              |  FROM tok t LEFT JOIN voc v USING (token) GROUP BY t.doc_id),
              |expect AS (SELECT d.doc_id,
              |    CAST(coalesce(sc.n, 0) AS BIGINT) AS n,
              |    CASE WHEN coalesce(sc.n, 0) > 0 THEN sc.lp / sc.n END AS mean_lp
              |  FROM documents d LEFT JOIN sc USING (doc_id)),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
              |    -- count equality alone is foolable by a duplicated
              |    -- doc_id masking a missing doc: require the emitted
              |    -- ids to be DISTINCT and the id sets equal both ways
              |    AND (SELECT count(DISTINCT doc_id) FROM emitted)
              |      = (SELECT count(*) FROM emitted)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x USING (doc_id)
              |      WHERE e.n_tokens <> x.n
              |         OR (e.logprob IS NULL) <> (x.mean_lp IS NULL)
              |         OR abs(coalesce(e.logprob, 0) - coalesce(x.mean_lp, 0)) > 1e-9)
              |    AND NOT EXISTS (SELECT 1 FROM emitted e
              |      WHERE e.doc_id NOT IN (SELECT doc_id FROM expect))
              |    AND NOT EXISTS (SELECT 1 FROM expect x
              |      WHERE x.doc_id NOT IN (SELECT doc_id FROM emitted))
              |  ) AS ok)
              |SELECT doc_id, n_tokens, logprob FROM emitted
              |WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)
              |ORDER BY doc_id""".stripMargin)),

    // ---- embedding-space decontamination: the semantic second pass
    // after q49's n-gram pass — drop corpus vectors with cosine ≥ τ
    // against any eval vector. Both engines compute the identical
    // double formula over the identical floats (the q29/q30 precedent),
    // so the oracle is an exact recomputation, threshold included.
    Q(
      "q62_embedding_decontaminate",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        graft.operators.Dedup.embeddingDecontaminate(
          corpus = e.filter($"vec_id" >= 10),
          evalSet = e.filter($"vec_id" < 10),
          vec = $"embedding", id = $"vec_id", minCosine = 0.35)
          .select($"vec_id", $"label")
          .orderBy($"vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |ev AS (SELECT v AS q FROM e WHERE vec_id < 10),
             |c AS (SELECT vec_id, label, v FROM e WHERE vec_id >= 10),
             |sc AS (SELECT c.vec_id,
             |    list_dot_product(v, q)
             |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q))) AS cos
             |  FROM c CROSS JOIN ev),
             |bad AS (SELECT DISTINCT vec_id FROM sc
             |  WHERE NOT isnan(cos) AND cos >= 0.35)
             |SELECT vec_id, label FROM c
             |WHERE vec_id NOT IN (SELECT vec_id FROM bad)
             |ORDER BY vec_id""".stripMargin)),

    // ---- hashed bag-of-words linear scoring (fastText-style quality
    // classifier shape). Weights are dyadic rationals, so the sum is
    // exact and order-free — the oracle recomputes every score
    // bit-for-bit with plain integer arithmetic.
    Q(
      "q63_hashed_linear_score",
      (s, d) => {
        import s.implicits._
        TextAnalysis.hashedLinearScore(
          Tables.documents(s, d), $"text", $"doc_id", buckets = 65536)
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents)
              |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
              |  coalesce(list_sum(list_transform(tk, x ->
              |    CAST((CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 65536)
              |         * 40503 % 1048576 AS DOUBLE) / 1048576.0 - 0.5)), 0.0) AS score
              |FROM t ORDER BY doc_id""".stripMargin)),

    // ---- BPE-style adjacent-pair statistics: the count table a
    // tokenizer-training run starts from. Exact integer counts with a
    // deterministic tie-break, so the compare is a straight hash match.
    Q(
      "q64_token_pair_counts",
      (s, d) => {
        import s.implicits._
        TextAnalysis.tokenPairCounts(Tables.documents(s, d), $"text", topN = 100)
      },
      Some(s"""WITH t AS (SELECT coalesce($sqlToks, []) AS tk FROM documents),
              |pr AS (SELECT unnest(
              |    [struct_pack(a := tk[i], b := tk[i+1]) for i in range(1, len(tk))]) AS p
              |  FROM t)
              |SELECT p.a AS first, p.b AS second, count(*) AS n_occurrences
              |FROM pr GROUP BY 1, 2
              |ORDER BY n_occurrences DESC, first, second LIMIT 100""".stripMargin)),

    // ---- incremental-ingest dedup: today's crawl (the full corpus)
    // against yesterday's snapshot (every doc_id ≡ 0 mod 7) — snapshot
    // members are exact-text matches of themselves, so they and only
    // they drop. Exercises the operator's cross-corpus anti-join with a
    // genuinely non-empty removal set.
    Q(
      "q65_incremental_dedup",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.dedupAgainstExisting(
          incoming = docs,
          existing = docs.filter($"doc_id" % 7 === 0),
          text = $"text")
          .select($"doc_id", $"source")
          .orderBy($"doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
             |  FROM documents),
             |old AS (SELECT DISTINCT f FROM fp WHERE doc_id % 7 = 0)
             |SELECT d.doc_id, d.source FROM documents d JOIN fp USING (doc_id)
             |WHERE fp.f NOT IN (SELECT f FROM old)
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- SemDeDup-style semantic pruning (Abbas et al. 2023):
    // embedding space clustered by the coarse quantizer, near-dup
    // pairs found EXACTLY but only within each cluster, connected
    // components resolved, one best-quality survivor kept per
    // semantic group (quality = label here; ties → lowest id).
    // Output = survivors + the centroid model as scalar (dim_idx,
    // value) rows so the oracle re-derives the ENTIRE path from the
    // emitted model alone: every cell (argmax cosine), every
    // within-cell pair (exact cosine ≥ τ), the transitive closure
    // (recursive CTE, q34/q54 precedent), and the survivor rule
    // (independent window formulation of the struct-max).
    Q(
      "q91_semantic_prune",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        // the SemDeDup contract (semanticPrune's scale doc): nlist
        // grows ~√N so within-cell pair work stays ~N^1.5 — a pinned
        // nlist=8 made the sf1 replica pay 8×(N/8)² ≈ 156M cosines
        // (sf1 stress 39 s → the √N grid cuts it ~10×). The oracle
        // re-derives the whole path from the EMITTED centroid model,
        // so the grid size is free to scale with the corpus.
        val nlist = math.max(8,
          math.ceil(math.sqrt(emb.count().toDouble)).toInt)
        val cents = Similarity.coarseTrain(emb, $"embedding", $"vec_id", nlist = nlist)
        val surv = materializeThenRelease(s, graft.operators.Dedup.semanticPrune(
          emb, $"embedding", $"vec_id", $"label".cast("double"), cents, threshold = 0.35))(
          _.select($"vec_id", $"cell", $"cluster_id", $"n_members"))
          .select($"vec_id", $"cell", $"cluster_id", $"n_members",
            lit(-1).as("dim_idx"), lit(0.0).as("value"))
        val centRows = for {
          (c, i) <- cents.zipWithIndex
          (x, dIdx) <- c.toSeq.zipWithIndex
        } yield (-1L, i + 1, -1L, -1L, dIdx, x)
        s.createDataFrame(centRows)
          .toDF("vec_id", "cell", "cluster_id", "n_members", "dim_idx", "value")
          .unionByName(surv)
          .orderBy($"vec_id", $"cell", $"dim_idx")
      },
      Some("""WITH RECURSIVE
             |outp AS (SELECT * FROM read_parquet('{{OUT}}/q91_semantic_prune/*.parquet')),
             |cent AS MATERIALIZED (SELECT cell AS cid, list(value ORDER BY dim_idx) AS centroid
             |  FROM outp WHERE vec_id = -1 GROUP BY cell),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, CAST(label AS DOUBLE) AS q
             |  FROM embeddings WHERE vec_id IS NOT NULL AND len(embedding) = 64),
             |csc AS (SELECT e.vec_id, cent.cid,
             |    list_dot_product(v, cent.centroid)
             |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cent.centroid, cent.centroid))) AS cos
             |  FROM e CROSS JOIN cent),
             |cells AS MATERIALIZED (SELECT vec_id, cid FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |        cid ASC) AS rn
             |    FROM csc) WHERE rn = 1),
             |pc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    list_dot_product(a.v, b.v)
             |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
             |  FROM (SELECT e.vec_id, e.v, cells.cid FROM e JOIN cells USING (vec_id)) a
             |  JOIN (SELECT e.vec_id, e.v, cells.cid FROM e JOIN cells USING (vec_id)) b
             |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
             |-- NaN guard: DuckDB orders NaN ABOVE all numbers, so a bare
             |-- cos >= t would ADMIT zero-vector pairs the engine's Java
             |-- comparison rejects
             |pairs AS MATERIALIZED (SELECT id_a, id_b FROM pc
             |  WHERE NOT isnan(cos) AND cos >= 0.35),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(vec_id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT g.src, r.r FROM edges g JOIN reach r ON g.dst = r.vec_id),
             |lab AS (SELECT vec_id, min(r) AS cluster_id FROM reach GROUP BY vec_id),
             |allv AS (SELECT e.vec_id, cells.cid AS cell, e.q,
             |    coalesce(l.cluster_id, e.vec_id) AS cluster_id
             |  FROM e JOIN cells USING (vec_id) LEFT JOIN lab l USING (vec_id)),
             |ranked AS (SELECT *,
             |    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, vec_id) AS rn,
             |    count(*) OVER (PARTITION BY cluster_id) AS n_members
             |  FROM allv)
             |SELECT vec_id, cell, cluster_id, n_members,
             |  CAST(-1 AS INT) AS dim_idx, 0.0 AS value
             |FROM ranked WHERE rn = 1
             |UNION ALL
             |SELECT vec_id, cell, cluster_id, n_members, dim_idx, value
             |FROM outp WHERE vec_id = -1
             |ORDER BY vec_id, cell, dim_idx""".stripMargin)),

    // ---- BPE merge-table training (Sennrich et al. 2016): 8 rounds
    // of most-frequent-adjacent-pair merging over the 2000 most
    // frequent word types (count-weighted), left-to-right
    // non-overlapping application, ties to the lexicographically
    // smallest pair. The oracle replays EVERY round: pair census by
    // list comprehension, best pair by the same (n DESC, l, r) order,
    // and the LTR merge walk as a recursive CTE per round — rank,
    // pair, and count must all match exactly.
    Q(
      "q93_bpe_train",
      (s, d) => {
        import s.implicits._
        val merges = TextAnalysis.bpeTrain(
          Tables.documents(s, d), $"text", numMerges = 8, vocabCap = 2000)
        s.createDataFrame(merges)
          .toDF("rank", "left_sym", "right_sym", "pair_count")
          .orderBy($"rank")
      },
      Some(bpeOracle(numMerges = 8, vocabCap = 2000))),

    // ---- BPE tokenizer APPLY (the q93 merge table driving the
    // graft_bpe_encode kernel): every corpus token segments through
    // the 8 trained merges in rank order, left-to-right non-overlap
    // per rank — Sennrich's apply_bpe processing order. One flattened
    // (doc_id, idx, piece) row per emitted piece. The oracle replays
    // TRAINING (the q93 CTEs) and then the full APPLY: each DISTINCT
    // corpus word walks all 8 recursive-CTE merge rounds, occurrences
    // rejoin by word, and per-doc piece indices rebuild through a
    // running window over token positions.
    Q(
      "q95_bpe_encode",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val merges = TextAnalysis.bpeTrain(docs, $"text", numMerges = 8, vocabCap = 2000)
        docs.select($"doc_id",
          posexplode(graft.functions.GraftFunctions.bpeEncode(
            s, coalesce(TextAnalysis.tokens($"text"), array()),
            merges.map(m => (m._2, m._3)))).as(Seq("idx", "piece")))
          .orderBy($"doc_id", $"idx")
      },
      Some(bpeEncodeOracle(numMerges = 8, vocabCap = 2000))),

    // ---- in-engine logistic-regression TRAINING (the trainer behind
    // q63's hashed-BoW scorer): 5 full-batch gradient steps, hashed
    // bucket-count features, label = doc_id parity. Each step is one
    // corpus pass with the weight vector as an array literal; only the
    // 256-slot gradient returns to the driver. Gradient sums fold in
    // partition order and sigmoid uses libm exp — neither bit-portable
    // — so the oracle replays the ENTIRE 5-step trajectory and admits
    // the emitted weights within 1e-6 per slot (q57's tolerance
    // pattern), poison row otherwise.
    Q(
      "q96_logistic_train",
      (s, d) => {
        import s.implicits._
        val weights = TextAnalysis.logisticTrain(
          Tables.documents(s, d), $"text", $"doc_id" % 2,
          buckets = 256, steps = 5, lr = 0.05)
        s.createDataFrame(weights).toDF("bucket", "weight")
          .orderBy($"bucket")
      },
      Some(logisticOracle(buckets = 256, steps = 5, lr = 0.05))),

    // ---- weighted sampling without replacement (Efraimidis-Spirakis
    // exponential clocks): 10 docs per source, selection probability
    // proportional to n_chars, deterministic u from md5(text). ln()
    // is not bit-portable, so the oracle recomputes every clock and
    // admits the emitted set only if it is a TRUE per-source top-k
    // within 1e-9 (q57's pattern): exact per-source counts, distinct
    // ids, and no non-emitted doc beating the worst emitted clock by
    // more than the tolerance. Poison row otherwise.
    Q(
      "q97_weighted_sample",
      (s, d) => {
        import s.implicits._
        graft.operators.Sampling.weightedKPerKey(
          Tables.documents(s, d),
          key = $"source", weight = $"n_chars", hashOn = $"text",
          id = $"doc_id", k = 10)
          .select($"doc_id", $"source")
          .orderBy($"doc_id")
      },
      Some("""WITH ky AS (SELECT doc_id, source,
             |    ln((CAST(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS DOUBLE) + 1.0)
             |       / 4294967296.0) / CAST(n_chars AS DOUBLE) AS clock
             |  FROM documents),
             |emitted AS (SELECT doc_id, source
             |  FROM read_parquet('{{OUT}}/q97_weighted_sample/*.parquet')),
             |-- IS NOT DISTINCT FROM: the engine groups NULL sources as
             |-- their own key, so a plain equi-join would drop legitimate
             |-- NULL-source winners and false-poison the gate
             |ek AS (SELECT e.doc_id, e.source, ky.clock FROM emitted e
             |  JOIN ky ON ky.doc_id = e.doc_id
             |         AND ky.source IS NOT DISTINCT FROM e.source),
             |want AS (SELECT source, least(count(*), 10) AS n FROM ky GROUP BY source),
             |gotn AS (SELECT source, count(*) AS n, count(DISTINCT doc_id) AS nd,
             |    min(clock) AS worst FROM ek GROUP BY source),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM ek)
             |    AND NOT EXISTS (SELECT 1 FROM want w LEFT JOIN gotn g
             |        ON g.source IS NOT DISTINCT FROM w.source
             |      WHERE (g.n IS NULL AND w.n > 0) OR g.n <> w.n OR g.nd <> w.n)
             |    AND NOT EXISTS (SELECT 1 FROM gotn g WHERE NOT EXISTS
             |      (SELECT 1 FROM want w WHERE w.source IS NOT DISTINCT FROM g.source))
             |    AND NOT EXISTS (SELECT 1 FROM ky k JOIN gotn g
             |        ON g.source IS NOT DISTINCT FROM k.source
             |      WHERE k.doc_id NOT IN (SELECT doc_id FROM ek)
             |        AND k.clock > g.worst + 1e-9)
             |  ) AS ok)
             |SELECT doc_id, source FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), 'POISON' WHERE NOT (SELECT ok FROM flag)
             |ORDER BY doc_id""".stripMargin))
  )

  /** q93's oracle: `numMerges` unrolled BPE rounds. Each round k has
    * four CTEs — pair census `p{k}` (struct comprehension over the
    * symbol lists), best pair `b{k}` (the engine's exact (n DESC, l,
    * r) order), a RECURSIVE left-to-right merge walk `s{k}` (a
    * `replace()` formulation would diverge on odd runs: [a,a,a] must
    * pair positions 1-2, not whatever a string scan resumes on), and
    * the re-assembled vocab `w{k}`. MATERIALIZED where a CTE is read
    * twice (DuckDB inlines plain CTEs — the q89 lesson).
    */
  private def bpeOracle(numMerges: Int, vocabCap: Int): String = {
    val finalSelect = (1 to numMerges).map { k =>
      s"SELECT $k AS rank, l AS left_sym, r AS right_sym, CAST(n AS BIGINT) AS pair_count FROM b$k"
    }.mkString("\nUNION ALL\n")
    "WITH RECURSIVE " + bpeTrainCtes(numMerges, vocabCap).mkString(",\n") +
      "\n" + finalSelect + "\nORDER BY rank"
  }

  /** The shared training replay: w0 (capped char-split vocab), then
    * per round k the pair census p{k}, best pair b{k} (the engine's
    * exact (n DESC, l, r) order), the recursive LTR merge walk s{k},
    * and the re-assembled vocab w{k}. Used by both the q93 train
    * oracle and the q95 apply oracle.
    */
  private def bpeTrainCtes(numMerges: Int, vocabCap: Int): Seq[String] = {
    val header =
      s"""w0 AS MATERIALIZED (
         |  SELECT [w[i:i] for i in range(1, len(w)+1)] AS sl, cnt FROM (
         |    SELECT w, count(*) AS cnt FROM (SELECT unnest($sqlToks) AS w FROM documents)
         |    GROUP BY w ORDER BY cnt DESC, w LIMIT $vocabCap))""".stripMargin
    val steps = (1 to numMerges).map { k =>
      s"""p$k AS (SELECT pr.a AS l, pr.b AS r, sum(cnt) AS n FROM (
         |    SELECT unnest([struct_pack(a := sl[i], b := sl[i+1]) for i in range(1, len(sl))]) AS pr, cnt
         |    FROM w${k - 1}) GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
         |s$k(sl, cnt, i, out) AS (
         |  SELECT sl, cnt, 1, CAST([] AS VARCHAR[]) FROM w${k - 1}
         |  UNION ALL
         |  SELECT sl, cnt,
         |    CASE WHEN i < len(sl) AND sl[i] = (SELECT l FROM b$k) AND sl[i+1] = (SELECT r FROM b$k)
         |         THEN i + 2 ELSE i + 1 END,
         |    list_append(out,
         |      CASE WHEN i < len(sl) AND sl[i] = (SELECT l FROM b$k) AND sl[i+1] = (SELECT r FROM b$k)
         |           THEN sl[i] || sl[i+1] ELSE sl[i] END)
         |  FROM s$k WHERE i <= len(sl)),
         |w$k AS MATERIALIZED (SELECT out AS sl, cnt FROM s$k WHERE i = len(sl) + 1)""".stripMargin
    }
    header +: steps
  }

  /** q95's oracle: the full training replay, then the APPLY — every
    * DISTINCT corpus word walks the same recursive LTR rounds against
    * b1..bN (duplicate occurrences rejoin by word afterward: the walk
    * cost is per word TYPE, not token), and per-doc flattened piece
    * indices rebuild via a running length sum over token positions.
    */
  private def bpeEncodeOracle(numMerges: Int, vocabCap: Int): String = {
    val applySteps = (1 to numMerges).map { k =>
      s"""e$k(w, sl, i, out) AS (
         |  SELECT w, sl, 1, CAST([] AS VARCHAR[]) FROM a${k - 1}
         |  UNION ALL
         |  SELECT w, sl,
         |    CASE WHEN i < len(sl) AND sl[i] = (SELECT l FROM b$k) AND sl[i+1] = (SELECT r FROM b$k)
         |         THEN i + 2 ELSE i + 1 END,
         |    list_append(out,
         |      CASE WHEN i < len(sl) AND sl[i] = (SELECT l FROM b$k) AND sl[i+1] = (SELECT r FROM b$k)
         |           THEN sl[i] || sl[i+1] ELSE sl[i] END)
         |  FROM e$k WHERE i <= len(sl)),
         |a$k AS MATERIALIZED (SELECT w, out AS sl FROM e$k WHERE i = len(sl) + 1)""".stripMargin
    }
    val applyHeader =
      s"""tok AS MATERIALIZED (SELECT doc_id,
         |    generate_subscripts(tk, 1) - 1 AS tpos, unnest(tk) AS w
         |  FROM (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents)),
         |a0 AS MATERIALIZED (SELECT w, [w[i:i] for i in range(1, len(w)+1)] AS sl
         |  FROM (SELECT DISTINCT w FROM tok))""".stripMargin
    val finalSelect =
      s"""SELECT doc_id, CAST(off + gs - 1 AS INT) AS idx, piece FROM (
         |  SELECT doc_id, off, generate_subscripts(pieces, 1) AS gs, unnest(pieces) AS piece
         |  FROM (SELECT t.doc_id, t.tpos, a.sl AS pieces,
         |      sum(len(a.sl)) OVER (PARTITION BY t.doc_id ORDER BY t.tpos
         |        ROWS UNBOUNDED PRECEDING) - len(a.sl) AS off
         |    FROM tok t JOIN a$numMerges a ON a.w = t.w))
         |ORDER BY doc_id, idx""".stripMargin
    "WITH RECURSIVE " +
      (bpeTrainCtes(numMerges, vocabCap) ++ Seq(applyHeader) ++ applySteps).mkString(",\n") +
      "\n" + finalSelect
  }

  /** q96's oracle: replay the full gradient-descent trajectory — per
    * step one scoring pass (weight list cross-joined in), a gradient
    * aggregate per bucket, and the updated weight list rebuilt via
    * `list(wi ORDER BY i)` over a range/LEFT JOIN — then admit the
    * emitted weights only if every slot agrees within 1e-6 (float
    * gradient sums fold in partition order on the engine side;
    * sigmoid's exp differs in ulps across libms).
    */
  private def logisticOracle(buckets: Int, steps: Int, lr: Double): String = {
    val header = Seq(
      s"""tb AS MATERIALIZED (SELECT doc_id,
         |    list_transform(coalesce($sqlToks, []), x ->
         |      CAST(CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % $buckets AS INT)) AS bs,
         |    CAST(doc_id % 2 AS DOUBLE) AS y
         |  FROM documents)""".stripMargin,
      "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tb)",
      s"w0 AS (SELECT list(CAST(0.0 AS DOUBLE)) AS w FROM range(0, $buckets))")
    val stepCtes = (1 to steps).flatMap { k =>
      val p = s"w${k - 1}"
      Seq(
        s"""g$k AS MATERIALIZED (SELECT b, sum(r) AS g FROM (
           |    SELECT unnest(bs) AS b, 1.0/(1.0+exp(-s)) - y AS r FROM (
           |      SELECT doc_id, y, bs,
           |        coalesce(list_sum(list_transform(bs, b -> $p.w[b+1])), 0.0) AS s
           |      FROM tb, $p)) GROUP BY b)""".stripMargin,
        s"""w$k AS MATERIALIZED (SELECT list(wi ORDER BY i) AS w FROM (
           |    SELECT t.i AS i, $p.w[t.i+1] - $lr * coalesce(g$k.g, 0.0) / (SELECT n FROM nn) AS wi
           |    FROM range(0, $buckets) t(i) CROSS JOIN $p LEFT JOIN g$k ON g$k.b = t.i))""".stripMargin)
    }
    val gate =
      s"""emitted AS (SELECT bucket, weight FROM read_parquet('{{OUT}}/q96_logistic_train/*.parquet')),
         |flag AS (SELECT (
         |    (SELECT count(*) FROM emitted) = $buckets
         |    AND (SELECT count(DISTINCT bucket) FROM emitted) = $buckets
         |    AND NOT EXISTS (SELECT 1 FROM emitted e
         |      WHERE e.bucket < 0 OR e.bucket >= $buckets
         |         OR abs(e.weight - (SELECT w FROM w$steps)[e.bucket + 1]) > 1e-6)
         |  ) AS ok)
         |SELECT bucket, weight FROM emitted WHERE (SELECT ok FROM flag)
         |UNION ALL
         |SELECT CAST(-1 AS INT), CAST(-999 AS DOUBLE) WHERE NOT (SELECT ok FROM flag)
         |ORDER BY bucket""".stripMargin
    "WITH " + (header ++ stepCtes :+ gate).mkString(",\n")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenizing,
  * quality scoring, language ID, fingerprinting. All pure `Column`
  * expressions (codegen'd, no UDFs) so they run map-side at any scale —
  * a 100 TB corpus needs zero shuffles for any of these.
  */
object TextAnalysis {

  /** Lowercased unicode-word tokens; empty tokens dropped. Uses the
    * native [[graft.functions.TokenizeWords]] expression (single
    * code-point scan, codegen) — [[tokensHof]] is the built-ins-only
    * reference formulation it is asserted equal to.
    */
  def tokens(text: Column): Column =
    graft.functions.GraftFunctions.tokenize(text)

  /** Built-ins-only tokenizer (regex split + interpreted HOF filter).
    * `\p{Nd}` (decimal digits), not `\p{N}`: the native kernel's
    * `Character.isLetterOrDigit` admits letters + Nd only, and a wider
    * regex here would break the asserted bit-equality on letter-like
    * numerics (Ⅻ, ², ⅓ are Nl/No — both formulations now split on
    * them).
    */
  def tokensHof(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{Nd}]+"), t => length(t) > 0)

  /** Whitespace-delimited token count (the cheap pre-tokenizer count). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + extra units for every 4
    * chars of long words (a common pre-LLM sizing heuristic; real BPE
    * needs the tokenizer's merges file).
    */
  def subwordCountEstimate(text: Column): Column =
    subwordCountFromTokens(tokens(text))

  /** [[subwordCountEstimate]] over an already materialized token array
    * — hot paths project [[tokens]] once (HOF lambdas re-evaluate an
    * inline tokenize subtree per iteration).
    */
  def subwordCountFromTokens(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / lit(4.0)).cast("long")))

  // Public top stopwords per language (frequency lists are public
  // knowledge; a handful per language is enough for a coarse signal).
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val stopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf")
  val stopwordsFr: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans")
  val stopwordsEs: Seq[String] = Seq("el", "los", "las", "y", "es", "un", "una", "que", "por", "con")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** CJK character count (zh signal — script detection beats stopwords
    * for unsegmented languages).
    */
  def cjkCharCount(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** Coarse n-gram/stopword language ID over {en,de,fr,es,zh}: script
    * check first, then stopword-hit argmax with a fixed tie-break order.
    * Convenience form — tokenizes inline FOUR times (one per stopword
    * list; the HOF hit counters are CodegenFallback, so no
    * common-subexpression elimination applies). Hot paths project
    * [[tokens]] once and call [[langIdFromTokens]].
    */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(text))

  /** [[langId]] over an already materialized token array column. */
  def langIdFromTokens(text: Column, toks: Column): Column = {
    val en = hitCount(toks, stopwordsEn)
    val de = hitCount(toks, stopwordsDe)
    val fr = hitCount(toks, stopwordsFr)
    val es = hitCount(toks, stopwordsEs)
    when(cjkCharCount(text) > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Quality metrics (counts and exact ratios — deterministic doubles). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))

  def stopwordCount(text: Column): Column = stopwordCountFromTokens(tokens(text))

  def stopwordCountFromTokens(toks: Column): Column = hitCount(toks, stopwordsEn)

  def meanWordLength(text: Column): Column = meanWordLengthFromTokens(tokens(text))

  def meanWordLengthFromTokens(t: Column): Column =
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
      .otherwise(lit(0.0))

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation density and a healthy stopword ratio (C4-style
    * heuristics from public corpus-cleaning literature). Convenience
    * form (tokenizes inline twice) — hot paths use
    * [[qualityScoreFromTokens]].
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, tokens(text))

  /** [[qualityScore]] over an already materialized token array. */
  def qualityScoreFromTokens(text: Column, t: Column): Column = {
    val n = length(text).cast("double")
    val toks = size(t).cast("double")
    val lenScore = least(n / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctCount(text) / greatest(toks, lit(1.0)), lit(1.0))
    val stopScore = least(
      stopwordCountFromTokens(t).cast("double") / greatest(toks, lit(1.0)) * 5.0, lit(1.0))
    (lenScore + punctScore + stopScore) / lit(3.0)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** 64-bit rolling-hash-style fingerprint (xxhash64 of the normalized
    * text; cheap integer key for joins/sketches).
    */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Word n-gram shingles (distinct) from an ALREADY MATERIALIZED token
    * array column. Take tokens from a previous projection — higher-order
    * functions are interpreted (CodegenFallback), and an inline `tokens`
    * subtree would re-run the regex split on every lambda iteration.
    */
  def shinglesFromTokens(t: Column, n: Int): Column =
    array_distinct(
      when(size(t) >= n,
        transform(
          sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", t))))

  /** Word n-gram shingles of a text column (convenience; for hot paths
    * project [[tokens]] first and use [[shinglesFromTokens]]).
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** Word n-grams WITH multiplicity (repetition analysis needs the
    * duplicates that [[shinglesFromTokens]] deliberately collapses).
    * Docs with fewer than `n` tokens have no n-grams → empty array,
    * null token arrays → empty array. Same HOF caveat as
    * [[shinglesFromTokens]]: pass an already materialized token column.
    */
  def ngramsFromTokens(t: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = coalesce(t, array())
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of n-gram occurrences that are repeats of an earlier
    * occurrence — the Gopher/MassiveText-style repetition signal
    * (boilerplate, keyword stuffing, degenerate generations all score
    * high). `(total - distinct) / total`, 0.0 for docs with no n-grams.
    * Pure map-side array arithmetic; exact integer counts then one
    * double division, so an oracle reproduces it bit-for-bit.
    */
  def dupNgramFraction(t: Column, n: Int): Column = {
    val ng = ngramsFromTokens(t, n)
    val total = size(ng)
    when(total > 0,
      (total - size(array_distinct(ng))).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Share of the document owned by its single most frequent token —
    * the other half of the repetition story (a doc that is one word
    * over and over has dupNgramFraction ~1 AND topTokenShare ~1).
    * O(distinct × n) per row via nested HOFs — fine for natural-text
    * token counts; 0.0 for empty/null token arrays.
    */
  def topTokenShare(t: Column): Column = {
    val toks = coalesce(t, array())
    when(size(toks) > 0,
      array_max(transform(array_distinct(toks),
        x => size(filter(toks, y => y === x)))).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** PII patterns redacted by [[redactPii]], in application order.
    * Deliberately RE2-compatible (no backrefs, no lookaround) so the
    * same pattern strings run under Java regex here and RE2-family
    * engines elsewhere — a redaction pass must behave identically in
    * every engine that touches the corpus.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "<EMAIL>" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "<IP>" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "<PHONE>" -> "\\b[0-9]{3}-[0-9]{4}\\b")

  /** Redact emails, IPv4 addresses, and phone-shaped numbers to typed
    * placeholder tokens — the pre-training privacy scrub. Order is
    * load-bearing: emails first (an address can embed digit runs),
    * then IPs (dotted digit quads would otherwise be split by the
    * phone pattern), then phones. One chained regexp_replace per
    * pattern, map-side, no shuffle at any scale.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (token, pattern)) =>
      regexp_replace(acc, pattern, token)
    }

  /** Per-pattern PII match counts over the ORIGINAL text (counting
    * after a prior pattern's redaction would undercount overlapping
    * classes). Returns (email, ip, phone) count columns.
    */
  def piiCounts(text: Column): Seq[Column] =
    piiPatterns.map { case (_, pattern) => regexp_count(text, lit(pattern)) }

  /** Unigram-LM log-probability scoring — the perplexity-proxy quality
    * signal (public literature: KenLM-style LM filtering, e.g. CCNet):
    * score each document by the mean log-probability of its tokens
    * under the CORPUS unigram distribution. Low scores flag
    * gibberish/rare-token text; empty docs score null. Returns
    * (doc_id, n_tokens, logprob).
    *
    * The 100 TB story: token counts are ONE partial-aggregable pass
    * (persisted for its two bounded driver actions, released before
    * return); the model is the top-`vocabSize` slice — collected once
    * (the same bounded-collect class as IVF's training sample) and
    * re-broadcast as a tiny frame, so the per-token probability lookup
    * is a broadcast HASH join, not a linear scan of a literal map.
    * The per-doc sum then folds the (pos, lnp) pairs in POSITION
    * order — deterministic per engine, bit-identical to a left-to-
    * right fold over the token array; ln() libraries differ across
    * engines, so cross-engine oracles compare within 1e-9.
    * Out-of-vocab tokens get the floor probability 1/total (count-1
    * smoothing); vocab selection breaks count ties by token, so every
    * engine derives the identical model.
    *
    * Returns ONE ROW PER DISTINCT id: the id IS the document identity,
    * so multiple input rows sharing an id score as one merged document
    * (n_tokens and logprob both cover the union — they can never mix
    * per-row and per-group views). Null/non-castable ids throw.
    */
  def unigramLogProb(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      id: Column,
      vocabSize: Int = 65536): org.apache.spark.sql.DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val spark = df.sparkSession
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "unigramLogProb: id is null or not castable to long — every doc needs a " +
        "non-null integral id"))).otherwise(id.cast("long"))
    val base = df.select(
      guardedId.as("doc_id"),
      coalesce(tokens(text), array()).as("toks"))
    val counts = base.select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (total, vocab) = try {
      val t = Option(counts.agg(sum(col("c"))).first().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val v = counts.orderBy(col("c").desc, col("token")).limit(vocabSize).collect()
      (t, v)
    } finally counts.unpersist()
    val oovP = 1.0 / total.toDouble // +Inf only when total=0, where no token exists to score
    import spark.implicits._
    val vocabDf = vocab.toSeq
      .map(r => (r.getString(0), r.getLong(1).toDouble / total.toDouble))
      .toDF("token", "p")
    // posexplode_outer keeps empty docs as a (null, null) row, so ONE
    // grouped pass yields n_tokens AND the ordered fold — no join back
    // to base, no third tokenize of the corpus
    val scoredTok = base
      .select(col("doc_id"), posexplode_outer(col("toks")).as(Seq("pos", "token")))
      .join(broadcast(vocabDf), Seq("token"), "left")
      .select(col("doc_id"), col("pos"), log(coalesce(col("p"), lit(oovP))).as("lnp"))
    scoredTok.groupBy(col("doc_id"))
      .agg(
        count(col("pos")).as("n_tokens"),
        sort_array(collect_list(struct(col("pos"), col("lnp")))).as("ps"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        when(col("n_tokens") > 0,
          aggregate(col("ps"), lit(0.0), (acc, e) => acc + e.getField("lnp"))
            / col("n_tokens").cast("double"))
          .otherwise(lit(null).cast("double")).as("logprob"))
  }

  /** Interpolated BIGRAM-LM log-probability scoring — the
    * context-aware step past [[unigramLogProb]] (public literature:
    * Jelinek-Mercer interpolation; CCNet/Gopher-style LM quality
    * filtering). Each adjacent token pair (w1, w2) scores
    * `ln(λ·P(w2|w1) + (1−λ)·P(w2))`; a document's score is the mean
    * over its pairs. Word-salad text (plausible tokens, implausible
    * transitions) scores low where a unigram model cannot tell — the
    * signal that makes this worth the extra counting pass.
    *
    * Model, pinned for cross-engine re-derivation:
    *   - unigram model = [[unigramLogProb]]'s exactly: top-`vocabSize`
    *     tokens by (count DESC, token), OOV floor 1/total;
    *   - bigram table = top-`bigramSize` pairs by (count DESC, w1,
    *     w2); P(w2|w1) = c(w1,w2)/c(w1) when the pair is tabled AND w1
    *     is in-vocab (its exact count is then known), else 0 — the
    *     interpolation's unigram leg keeps every probability strictly
    *     positive;
    *   - λ must be an exact dyadic rational (default 0.75) so λ and
    *     1−λ are the same doubles in every engine.
    *
    * The 100 TB story: TWO corpus passes total — the tokenized corpus
    * caches once and feeds both model censuses (unigram + pair counts,
    * each partial-aggregable), then the returned scoring plan
    * re-tokenizes once at materialization; both models are bounded
    * top-K slices (the q56/q61 bounded-collect class) re-broadcast as
    * tiny frames,
    * so scoring is map-side pair expansion + broadcast hash lookups —
    * the corpus shuffles only to group its own (doc, pos) pairs back,
    * and the per-doc fold runs in position order (deterministic; ln()
    * is not bit-portable, so oracles compare within 1e-9).
    *
    * Returns one row per distinct id: (doc_id, n_pairs, logprob);
    * docs with < 2 tokens have 0 pairs and a null score.
    */
  def bigramLogProb(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      id: Column,
      vocabSize: Int = 65536,
      bigramSize: Int = 65536,
      lambda: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(bigramSize >= 1, s"bigramSize must be >= 1, got $bigramSize")
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0, 1), got $lambda")
    require(lambda * 4096.0 == math.rint(lambda * 4096.0),
      s"lambda must be an exact dyadic rational (k/4096) so 1-lambda is the " +
        s"same double in every engine, got $lambda")
    val spark = df.sparkSession
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "bigramLogProb: id is null or not castable to long — every doc needs a " +
        "non-null integral id"))).otherwise(id.cast("long"))
    // cached across the TWO model censuses (unigram counts, bigram
    // counts) so the corpus tokenizes once for model building; the
    // unpersist before return means the SCORING plan re-tokenizes once
    // more at materialization — two total corpus passes, vs three when
    // each census re-derived the tokens itself
    val base = df.select(
      guardedId.as("doc_id"),
      coalesce(tokens(text), array()).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (pos, w1, w2) per adjacent pair; posexplode_outer keeps pairless
    // docs as a null row so ONE grouped pass emits their 0/null too
    val pairs = base.select(
      col("doc_id"),
      explode_outer(when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2), i => struct(
          i.as("pos"),
          element_at(col("toks"), i + 1).as("w1"),
          element_at(col("toks"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<pos:int,w1:string,w2:string>>")))
        .as("pr"))
      .select(col("doc_id"), col("pr.pos").as("pos"),
        col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val uniCnt = base.select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (total, vocab, bigrams) = try {
      val (t, v) = try {
        val t0 = Option(uniCnt.agg(sum(col("c"))).first().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        (t0, uniCnt.orderBy(col("c").desc, col("token")).limit(vocabSize).collect())
      } finally uniCnt.unpersist()
      val b = pairs.filter(col("w1").isNotNull)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        .orderBy(col("cb").desc, col("w1"), col("w2")).limit(bigramSize).collect()
      (t, v, b)
    } finally base.unpersist()
    import spark.implicits._
    val vocabDf = vocab.toSeq.map(r => (r.getString(0), r.getLong(1)))
      .toDF("token", "c")
    val bvocDf = bigrams.toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toDF("w1", "w2", "cb")
    val scored = pairs
      .join(broadcast(bvocDf), Seq("w1", "w2"), "left")
      .join(broadcast(vocabDf.select(col("token").as("w1"), col("c").as("c1"))),
        Seq("w1"), "left")
      .join(broadcast(vocabDf.select(col("token").as("w2"), col("c").as("c2"))),
        Seq("w2"), "left")
      .select(col("doc_id"), col("pos"), log(
        lit(lambda) * when(col("cb").isNotNull && col("c1").isNotNull,
          col("cb").cast("double") / col("c1").cast("double")).otherwise(lit(0.0))
          + lit(1.0 - lambda) *
            (coalesce(col("c2"), lit(1L)).cast("double") / lit(total.toDouble)))
        .as("lnp"))
    scored.groupBy(col("doc_id"))
      .agg(
        count(col("pos")).as("n_pairs"),
        sort_array(collect_list(struct(col("pos"), col("lnp")))).as("ps"))
      .select(
        col("doc_id"),
        col("n_pairs"),
        when(col("n_pairs") > 0,
          aggregate(col("ps"), lit(0.0), (acc, e) => acc + e.getField("lnp"))
            / col("n_pairs").cast("double"))
          .otherwise(lit(null).cast("double")).as("logprob"))
  }

  /** PMI COLLOCATIONS — adjacent-pair pointwise mutual information
    * (Church & Hanks 1990; Manning & Schütze ch. 5), the phrase-mining
    * statistic behind word2phrase-style multiword-token discovery:
    * `PMI(w1, w2) = ln(c12 · N / (c1 · c2))` over the corpus's
    * adjacent-pair table, where N is the total pair count and c1/c2
    * are the pair table's left/right marginals (self-contained in the
    * pair counts, so an oracle re-derives everything from one census).
    * Rare-pair noise is floored by `minCount`; returns the `topK`
    * rows by (pmi DESC, w1, w2).
    *
    * Scale: ONE partial-aggregable pair census (q64's shape); the
    * marginals and PMI compute on the pair-TYPE table (vocab², far
    * smaller than the corpus), and the top-K is a bounded TakeOrdered,
    * not a full sort. ln() is not bit-portable — oracles admit scores
    * within 1e-9 and check true-top-K membership (the q57 pattern).
    */
  def pmiCollocations(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      minCount: Long = 5L,
      topK: Int = 50): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toksCol = coalesce(tokens(text), array())
    val pairs = df.select(toksCol.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("toks")) - 2), i => struct(
        element_at(col("toks"), i + 1).as("w1"),
        element_at(col("toks"), i + 2).as("w2")))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    // eager localCheckpoint, not persist/unpersist: the pair census is
    // reused FOUR times (N, both marginals, the scored filter) and the
    // last three live in the RETURNED lazy plan — an unpersist-before-
    // return would silently recompute the census per use
    val pc = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val n = Option(pc.agg(sum(col("c12"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    require(n > 0, "pmiCollocations: corpus has no adjacent token pairs")
    val m1 = pc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val m2 = pc.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    pc.filter(col("c12") >= minCount)
      .join(m1, Seq("w1")).join(m2, Seq("w2"))
      .select(col("w1"), col("w2"), col("c12").as("n_pair"),
        log(col("c12").cast("double") * lit(n.toDouble)
          / (col("c1").cast("double") * col("c2").cast("double"))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** BM25 relevance ranking of the corpus against a FIXED term list —
    * retrieval-targeted data selection ("find the docs most about X"),
    * scored with the classic Okapi BM25 formula (public IR
    * literature). Returns the `topK` (doc_id, score) rows, score
    * descending, ties broken by id.
    *
    * The 100 TB story: corpus statistics (N, total length, per-term
    * document frequencies) are ONE partial-aggregable pass producing a
    * single broadcast row — integer sums, so they are exact and
    * engine-portable. Scoring is then map-side: each doc folds its
    * fixed term list in declaration order (a deterministic double
    * fold, so an oracle reproduces scores bit-for-bit), and the global
    * top-K is a bounded TakeOrdered, not a full sort materialization.
    */
  def bm25Rank(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      id: Column,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "bm25Rank needs at least one query term")
    require(terms.size <= 32, s"term list is a fixed fold (${terms.size} terms); cap is 32")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // terms compare against TOKENIZER output — a capitalized or
    // punctuated term would silently score 0 everywhere and return a
    // plausible-looking but meaningless ranking. Validate with the
    // REAL tokenizer (one token, unchanged), not a re-implementation
    // of its alphabet: supplementary-plane letters pass, case/punct
    // variants fail, and the check can never drift from the kernel
    terms.foreach { t =>
      val toks = graft.functions.TokenizeWords.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      require(toks.numElements() == 1 && toks.getUTF8String(0).toString == t,
        s"bm25Rank terms must be tokenizer-normal (what TokenizeWords emits: " +
          s"lowercase, no punctuation/whitespace): '$t' would match no token")
    }
    // same loud-failure contract as the sibling operators
    // (unigramLogProb, keepBestPerCluster …): a null or non-castable id
    // must throw, not silently rank as a null doc_id row
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "bm25Rank: id is null or not castable to long — every doc needs a " +
        "non-null integral id"))).otherwise(id.cast("long"))
    val base = df.select(guardedId.as("doc_id"),
      coalesce(tokens(text), array()).as("toks"))
    val aggCols = count(lit(1)).as("n") +:
      sum(size(col("toks")).cast("long")).as("totlen") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val len = size(col("toks")).cast("double")
    val avglen = col("totlen").cast("double") / col("n").cast("double")
    // fixed declaration-order fold keeps the double sum deterministic.
    // NB the scala-side constant folds (`1.0 - b`, `k1 + 1.0`) happen
    // BEFORE the values become Columns — an oracle mirrors the folded
    // constants, not the symbolic formula
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), x => x === t)).cast("double")
      val idf = log(
        (col("n").cast("double") - col(s"df_$i").cast("double") + 0.5) /
          (col(s"df_$i").cast("double") + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * len / avglen))
    }.reduce(_ + _)
    scored.select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Split a token array into OVERLAPPING training windows — the
    * document-chunking step that turns long documents into
    * model-context-sized examples: windows of `window` tokens starting
    * every `window - overlap` tokens, final partial window kept, at
    * least one (possibly empty) chunk per doc so no document silently
    * vanishes — including a NULL token array (null text), which chunks
    * like an empty doc instead of null-propagating into zero rows after
    * posexplode. Pure array expression over an already materialized
    * token column (map-side at any scale; same HOF caveat as
    * [[shinglesFromTokens]]).
    */
  def chunkTokens(toks: Column, window: Int, overlap: Int): Column = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window), got $overlap for window $window")
    val stride = window - overlap
    val t = coalesce(toks, array())
    transform(
      sequence(
        lit(0),
        greatest(
          ceil((size(t) - lit(overlap)).cast("double") / stride).cast("int") - 1,
          lit(0))),
      i => slice(t, i * stride + 1, lit(window)))
  }

  /** Adjacent-token pair counts — the corpus statistic BPE-style
    * tokenizer training starts from (count every neighboring symbol
    * pair, merge the most frequent; public literature: Sennrich et al.
    * 2016). Returns the `topN` (first, second, n_occurrences) rows,
    * count descending, ties broken lexically — a deterministic merge
    * candidate list.
    *
    * The 100 TB story: pair extraction is a pure map-side array
    * expression (no per-token shuffle — docs explode directly into
    * pairs), the count is one partial-aggregable groupBy on the pair,
    * and the global top-N is a bounded TakeOrdered via `orderBy +
    * limit`, never a full sort materialization.
    */
  def tokenPairCounts(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      topN: Int = 100): org.apache.spark.sql.DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val t = coalesce(tokens(text), array())
    val pairs = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("first"), element_at(t, i + 2).as("second"))))
      .otherwise(array().cast("array<struct<first:string,second:string>>"))
    df.select(explode(pairs).as("p"))
      .select(col("p.first").as("first"), col("p.second").as("second"))
      .groupBy(col("first"), col("second"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("first"), col("second"))
      .limit(topN)
  }

  /** BPE merge-table TRAINING (public literature: Sennrich et al.
    * 2016, "Neural Machine Translation of Rare Words with Subword
    * Units") — the iterative step past [[tokenPairCounts]]'s single
    * pair census: `numMerges` rounds of (count adjacent symbol pairs
    * weighted by word frequency → merge the most frequent pair
    * everywhere, left-to-right non-overlapping). Returns the merge
    * table `(rank, left, right, pair_count)` — with the wordpiece
    * kernel (q74) covering tokenizer APPLY, this covers tokenizer
    * TRAIN.
    *
    * The 100 TB story is the industrial BPE-trainer shape
    * (word-level): the HEAVY pass is the exact word count over the
    * corpus — one partial-aggregable shuffle — after which training
    * runs on the `vocabCap` most frequent word TYPES (count-desc,
    * word-asc tie-break; the q56/q61 bounded-collect precedent: top
    * word types carry almost all token mass, and the cap bounds
    * driver memory regardless of corpus size). The merge loop itself
    * is O(numMerges × vocab chars) driver-side arithmetic — exactly
    * where reference tokenizer trainers run it.
    *
    * Semantics pinned for the oracle: no end-of-word marker (merges
    * never cross word boundaries); merge application scans LEFT TO
    * RIGHT without overlap (a run [a,a,a] under pair (a,a) becomes
    * [aa, a]); pair ties break to the lexicographically smallest
    * (left, right) — tokens are ASCII so JVM and SQL collations
    * agree. Every round is re-derivable by SQL: the oracle replays
    * all `numMerges` rounds with recursive-CTE LTR walks and must
    * reproduce rank, pair, and count exactly.
    */
  def bpeTrain(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      numMerges: Int,
      vocabCap: Int = 2000): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, s"bpeTrain needs numMerges >= 1, got $numMerges")
    require(vocabCap >= 1, s"bpeTrain needs vocabCap >= 1, got $vocabCap")
    val words = df.select(explode(coalesce(tokens(text), array())).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(words.nonEmpty, "bpeTrain: empty vocabulary (no tokens in corpus)")
    // split by CODE POINT, not UTF-16 char: the apply kernel
    // (BpeKernels.encode) and the SQL oracle's per-character slicing
    // both see code points — a supplementary-plane letter split into
    // surrogate halves here would train merges the apply side can
    // never match
    def codePoints(w: String): Array[String] = {
      val b = Array.newBuilder[String]
      var p = 0
      while (p < w.length) {
        val n = Character.charCount(w.codePointAt(p))
        b += w.substring(p, p + n)
        p += n
      }
      b.result()
    }
    var vocab: Array[(Array[String], Long)] =
      words.map { case (w, c) => (codePoints(w), c) }
    (1 to numMerges).map { k =>
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (sl, c) =>
        var i = 0
        while (i < sl.length - 1) {
          val key = (sl(i), sl(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      require(counts.nonEmpty,
        s"bpeTrain: no adjacent pairs left at merge $k — every word is a " +
          s"single symbol; request fewer merges")
      val ((l, r), n) = counts.minBy { case ((a, b), m) => (-m, a, b) }
      vocab = vocab.map { case (sl, c) =>
        val out = Array.newBuilder[String]
        var i = 0
        while (i < sl.length) {
          if (i < sl.length - 1 && sl(i) == l && sl(i + 1) == r) {
            out += (sl(i) + sl(i + 1)); i += 2
          } else { out += sl(i); i += 1 }
        }
        (out.result(), c)
      }
      (k, l, r, n)
    }
  }

  /** Hashed bag-of-words linear scoring — the fastText-style quality/
    * domain classifier shape used throughout LLM data curation (public
    * literature: Joulin et al. 2016; quality-classifier filtering in
    * GPT-3/LLaMA data papers): hash each token into one of `buckets`
    * feature slots, score = sum of the slot weights. The weights here
    * derive deterministically from the slot id (a splitmix-style
    * integer mix scaled to [-0.5, 0.5)) — the SCORING ENGINE is the
    * deliverable; swap in trained weights by joining a weight table on
    * the same bucket id.
    *
    * Engine-portability is designed in, not hoped for: bucket ids come
    * from the first 8 md5 hex chars (portable everywhere, unlike
    * xxhash64 seeds), and every weight is a dyadic rational k/2^20 −
    * 0.5, so double summation is EXACT (each term has 20 fractional
    * bits; any realistic doc keeps the sum far inside 53-bit
    * precision) — the fold needs no ordering, stays associative, and
    * any engine reproduces the score bit-for-bit.
    *
    * Fully map-side: one row in, one row out, zero shuffles at any
    * scale. Returns (doc_id, n_tokens, score). Null/non-castable ids
    * throw (same contract as the sibling scorers).
    */
  def hashedLinearScore(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      id: Column,
      buckets: Int = 65536): org.apache.spark.sql.DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "hashedLinearScore: id is null or not castable to long — every doc needs " +
        "a non-null integral id"))).otherwise(id.cast("long"))
    def weight(tok: Column): Column = {
      // 32-bit value from the md5 prefix, folded to a bucket, mixed to
      // a dyadic weight. All integer ops (conv returns the digits of a
      // 32-bit value — no overflow anywhere), one exact division.
      val b = pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))
      pmod(b * lit(40503L), lit(1048576L)).cast("double") / lit(1048576.0) - lit(0.5)
    }
    df.select(
      guardedId.as("doc_id"),
      coalesce(tokens(text), array()).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0.0), (acc, t) => acc + weight(t)).as("score"))
  }

  /** In-engine logistic-regression TRAINING for the hashed
    * bag-of-words classifier [[hashedLinearScore]] applies: `steps`
    * full-batch gradient-descent rounds over binary-cross-entropy,
    * features = per-token md5 bucket counts (the same portable bucket
    * id as the scorer), labels = any 0/1 column.
    *
    * The 100 TB story is the right split of work: each gradient step
    * is ONE corpus pass — the current weight vector rides into the
    * plan as an array literal, per-doc scores fold map-side
    * (`aggregate` over the bucket array), and the gradient is one
    * partial-aggregable `groupBy(bucket)` over at most `buckets`
    * groups; only the `buckets`-sized gradient returns to the driver
    * (bounded regardless of corpus size, the q56/q61 collect
    * precedent). This is exactly how reference distributed LR trainers
    * shape the computation (weights broadcast, gradients tree-reduced).
    *
    * Determinism note: the gradient is a float sum folded in partition
    * order, and sigmoid uses libm `exp` — neither is bit-portable, so
    * the q96 oracle replays the full trajectory and accepts weights
    * within 1e-6 (q57's tolerance precedent). Returns
    * `(bucket, weight)` for all `buckets` slots after `steps` rounds
    * from the zero vector with learning rate `lr` (gradient averaged
    * over ALL rows, token-less docs included — their residual simply
    * touches no bucket).
    */
  def logisticTrain(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      label: Column,
      buckets: Int = 256,
      steps: Int = 5,
      lr: Double = 0.05): Seq[(Int, Double)] = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(lr > 0.0, s"lr must be > 0, got $lr")
    val bucketOf = (t: Column) =>
      pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(buckets.toLong)).cast("int")
    val guardedY = when(label.cast("double").isNull || !label.cast("double").isin(0.0, 1.0),
      raise_error(lit("logisticTrain: label must be 0 or 1 and non-null")))
      .otherwise(label.cast("double"))
    val base = df.select(
      transform(coalesce(tokens(text), array()), bucketOf).as("bs"),
      guardedY.as("y"))
      .cache()
    val n = base.count()
    require(n > 0, "logisticTrain: empty input")
    try {
      var w = Array.fill(buckets)(0.0)
      for (_ <- 1 to steps) {
        val wLit = typedLit(w.toSeq)
        val grads = base
          .withColumn("score",
            aggregate(col("bs"), lit(0.0), (acc, b) => acc + element_at(wLit, b + 1)))
          .withColumn("r", lit(1.0) / (lit(1.0) + exp(-col("score"))) - col("y"))
          .select(explode(col("bs")).as("b"), col("r"))
          .groupBy("b").agg(sum(col("r")).as("g"))
          .collect()
        val g = new Array[Double](buckets)
        grads.foreach(r => g(r.getInt(0)) = r.getDouble(1))
        w = Array.tabulate(buckets)(i => w(i) - lr * g(i) / n)
      }
      w.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    } finally { base.unpersist(); () }
  }

  /** Greedy longest-match subword segmentation over [[tokens]] — the
    * "tokenizer apply" step (wordpiece-style): each word splits into
    * the longest `vocab` pieces matching at each position,
    * single-character fallback. Map-side native expression
    * ([[graft.functions.WordpieceEncode]]); the vocab ships as an
    * array literal compiled once per executor.
    */
  def wordpieces(text: Column, vocab: Seq[String]): Column = {
    require(vocab.nonEmpty, "wordpieces needs a non-empty vocab")
    graft.functions.GraftFunctions.wordpiece(tokens(text), vocab)
  }

  /** C4/RefinedWeb-style boilerplate-line removal: any line (exact
    * `\n`-split segment) occurring at least `minOccurrences` times
    * across the whole corpus is removed from EVERY document it appears
    * in (cookie banners, nav menus, subscribe prompts). Returns one row
    * per input doc: (doc_id, clean_text, n_removed) — docs whose every
    * line is boilerplate survive with empty text, so the operator never
    * changes corpus membership (chain a length filter after it for
    * that).
    *
    * Scale shape: TWO corpus passes, the lower bound without caching —
    * one shuffle of lines to count frequencies (count partially
    * aggregates map-side), then one pass that left-joins the exploded
    * lines against the banned set (small by nature — boilerplate is
    * the head of the frequency distribution — so AQE broadcasts it)
    * and reassembles with a single groupBy(doc_id): kept text, total
    * and removed counts all come out of that one aggregate, so no
    * third scan or post-join is needed. Line text is matched EXACTLY
    * (byte-equal after split); pre-normalize whitespace upstream if
    * fuzzier matching is wanted.
    */
  def removeDuplicatedLines(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      id: Column,
      minOccurrences: Int = 2): org.apache.spark.sql.DataFrame = {
    require(minOccurrences >= 2,
      s"minOccurrences must be >= 2 (1 would remove every line), got $minOccurrences")
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "removeDuplicatedLines: id is null or not castable to long — every doc needs " +
        "a non-null integral id"))).otherwise(id.cast("long"))
    val base = df.select(guardedId.as("doc_id"), coalesce(text, lit("")).as("__text"))
    // limit -1: trailing empty segments are real lines (a doc ending in
    // \n has a final empty line that must count like any other)
    val lines = base.select(
      col("doc_id"),
      posexplode(split(col("__text"), "\n", -1)).as(Seq("__pos", "__line")))
    val banned = lines.groupBy(col("__line"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minOccurrences)
      .select(col("__line"), lit(true).as("__banned"))
    // collect_list skips nulls, so the when() drops banned lines from
    // the rebuild while count/sum still see every line — one aggregate
    // produces text + both counts, and every doc has ≥ 1 line so no
    // doc can vanish from the groupBy
    lines.join(banned, Seq("__line"), "left")
      .groupBy(col("doc_id")).agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(col("__banned").isNull, struct(col("__pos"), col("__line"))))),
            x => x.getField("__line"))).as("clean_text"),
        sum(when(col("__banned").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_removed"))
  }

  /** Inverted-index posting-list statistics — the aggregate shape of
    * index construction: per term, document frequency (df), collection
    * frequency (cf), the maximum within-document tf, and the top
    * document by (tf desc, doc_id asc). This is the index BUILD
    * measured by its verifiable aggregate — the posting lists
    * themselves are the (term, doc, tf) intermediate this derives
    * from, and q57's BM25 consumes the same statistics.
    *
    * Scale: one (term, doc) tf aggregation, one (term) rollup whose
    * argmax is a partial-aggregable struct-max — no windows. Exact
    * integers end to end; `minDf` bounds the output like every vocab
    * floor in this engine (map-side filter, not a top-k).
    */
  def postingStats(
      df: DataFrame, text: Column, id: Column, minDf: Int): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val perDoc = df
      .select(id.cast("long").as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    perDoc.groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        max(col("tf")).as("max_tf"),
        max(struct(col("tf").as("t"), (-col("doc_id")).as("nd"))).as("__m"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"), col("max_tf"),
        (-col("__m.nd")).as("top_doc_id"))
  }

  /** RAKE keyword scores (Rose et al. 2010) — the stopword-delimited
    * co-occurrence ranking that needs no model: tokens split into
    * PHRASES at stopword boundaries; a word's degree is the summed
    * length of every phrase it occurs in (self included), its
    * frequency the occurrence count, and score = deg/freq favors
    * words that travel in long multi-word phrases.
    *
    * Scale shape: the only window is the per-document
    * phrase-boundary prefix count (a task owns one doc's token list
    * — bounded by doc length), then everything is plain
    * partial-aggregable groupBys on (doc, phrase) and word. Exact
    * integers + one pinned division per word — hash-exact in any
    * engine. Output: (word, freq, deg, score) per non-stopword word.
    */
  def rakeScores(
      df: DataFrame,
      docId: Column,
      text: Column,
      stopwords: Seq[String] = stopwordsEn): DataFrame = {
    require(stopwords.nonEmpty, "rakeScores: stopword list is empty")
    val toks = df.select(docId.as("doc"), posexplode(tokens(text))
      .as(Seq("idx", "w")))
    val stop = col("w").isin(stopwords: _*)
    val wDoc = Window.partitionBy(col("doc")).orderBy(col("idx").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phrased = toks
      .withColumn("ph", sum(when(stop, 1L).otherwise(0L)).over(wDoc))
      .filter(!stop)
    val phraseLen = phrased.groupBy(col("doc"), col("ph"))
      .agg(count(lit(1)).as("plen"))
    phrased.join(phraseLen, Seq("doc", "ph"))
      .groupBy(col("w").as("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("score",
        col("deg").cast("double") / col("freq").cast("double"))
  }

  /** VOCABULARY GROWTH CURVE (Heaps-law view) — how many NEW distinct
    * tokens each slab of the corpus contributes, in doc-id order: the
    * diminishing-returns audit of corpus expansion ("does the next
    * billion docs still buy vocabulary?"). Each token reduces to its
    * FIRST document (one partial-aggregable min), first-docs bucket
    * into fixed `bucketDocs`-wide id slabs, and the cumulative curve
    * is a window over the ≤ corpus/bucketDocs bucket rows — never the
    * tokens. All-integer output — hash-exact. Docs with null ids
    * drop (no position on the axis); docs with no tokens still count
    * toward `n_docs`. Output per bucket:
    * (bucket, n_docs, new_tokens, vocab_cum).
    */
  def vocabularyGrowth(
      df: DataFrame,
      id: Column,
      text: Column,
      bucketDocs: Int): DataFrame = {
    require(bucketDocs >= 1, s"bucketDocs must be >= 1, got $bucketDocs")
    val base = df.select(id.cast("long").as("doc_id"), text.as("text"))
      .filter(col("doc_id").isNotNull)
    val firsts = base
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
      .select(expr(s"fd div $bucketDocs").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_tokens"))
    val docs = base
      .select(expr(s"doc_id div $bucketDocs").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val wCum = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(firsts, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("vocab_cum", sum(col("new_tokens")).over(wCum))
  }

  /** WINNOWING FINGERPRINTS (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003 — the MOSS algorithm): the guaranteed-coverage document
    * fingerprint for plagiarism / near-copy detection. Token k-grams
    * hash portably (md5 first 15 hex chars as a 60-bit integer — the
    * [[Dedup]] portable-SimHash token convention, so any engine
    * re-derives identical values); every window of `window`
    * consecutive k-gram hashes SELECTS its minimum, rightmost on
    * ties; the distinct selected (position, hash) pairs are the
    * document's fingerprints. Guarantee: any shared token run of
    * length ≥ k + window − 1 between two documents shares at least
    * one selected fingerprint — matching on fingerprints has NO
    * false negatives at that match length, with ~2/(window+1)
    * density instead of every-position storage.
    *
    * Scale shape: gram construction and hashing are per-row
    * projections; the window min is one per-doc window (ordered by
    * position, frame = the trailing `window` rows), expressed as a
    * lexicographic struct MIN of (hash, −pos) so the rightmost-tie
    * rule needs no second pass. Documents shorter than k tokens have
    * no k-gram and emit nothing; a document with fewer grams than
    * `window` selects the minimum of what exists (the one partial
    * window). All-integer output — hash-exact.
    *
    * Output: (doc_id, pos, fp) — pos is the 1-based k-gram position
    * of each selected fingerprint.
    */
  def winnowingFingerprints(
      df: DataFrame,
      text: Column,
      id: Column,
      k: Int = 5,
      window: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(window >= 1, s"window must be >= 1, got $window")
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "winnowingFingerprints: id is null or not castable to long")))
      .otherwise(id.cast("long"))
    val grams = df
      .select(guardedId.as("doc_id"), coalesce(tokens(text), array()).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("toks")) - lit(k - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
          .as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val wFrame = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(-(window - 1), 0)
    val wAll = Window.partitionBy(col("doc_id"))
    grams
      .withColumn("m", count(lit(1)).over(wAll))
      // struct MIN of (h, -pos): smallest hash, rightmost position on
      // ties — the robust-winnowing selection rule in one aggregate
      .withColumn("pick",
        min(struct(col("h").as("h"), (-col("pos")).as("np"))).over(wFrame))
      // full windows end at pos >= window; a doc with m < window grams
      // has exactly one (partial) window, ending at its last gram
      .filter(col("pos") >= window || col("pos") === col("m"))
      .select(col("doc_id"), (-col("pick.np")).as("pos"), col("pick.h").as("fp"))
      .distinct()
  }

  /** FLESCH READING EASE per document — the classic readability
    * screen (Flesch 1948), with the standard computable proxies:
    * words = [[tokens]] count, sentences = runs of `.!?` (min 1),
    * syllables = vowel GROUPS in the lowercased text (the common
    * dictionary-free approximation):
    *
    *   flesch = 206.835 − 1.015·(W/S) − 84.6·(Y/W).
    *
    * Pure per-row map (regex counting via replace-then-measure — both
    * engines share the character-class semantics used here), exact
    * integer counts, one pinned double chain — hash-exact. Output:
    * (doc_id, words, sentences, syllables, flesch) — flesch null for
    * wordless docs.
    */
  def readability(df: DataFrame, text: Column, id: Column): DataFrame = {
    val t = coalesce(text, lit(""))
    val words = size(tokens(t))
    val sentRuns = regexp_replace(t, "[.!?]+", ".")
    val sentences = greatest(lit(1),
      (length(sentRuns) - length(regexp_replace(sentRuns, "\\.", "")))
        .cast("int"))
    val vg = regexp_replace(lower(t), "[aeiou]+", "V")
    val syllables =
      (length(vg) - length(regexp_replace(vg, "V", ""))).cast("int")
    val wD = words.cast("double")
    val sD = sentences.cast("double")
    val yD = syllables.cast("double")
    df.select(id.as("doc_id"), words.as("words"),
      sentences.as("sentences"), syllables.as("syllables"),
      when(words > 0,
        lit(206.835) - lit(1.015) * (wD / sD) - lit(84.6) * (yD / wD))
        .otherwise(lit(null).cast("double")).as("flesch"))
  }

  /** UNIGRAM KL DIVERGENCE between two corpus slices — the
    * distribution-shift audit of a data mix ("how far is the new
    * source's token distribution from the base corpus?"): with add-1
    * smoothing over the JOINT vocabulary (deterministic, no zero
    * terms),
    *
    *   p(w) = (c_A(w)+1)/(N_A+V),  q(w) = (c_B(w)+1)/(N_B+V),
    *   KL(A‖B) = Σ_w p·ln(p/q)   (and the B‖A mirror).
    *
    * Scale shape: ONE token-explode pass reduces to per-token counts
    * for both slices simultaneously (partial-aggregable), totals ride
    * a broadcast, and the term sum folds over the VOCABULARY — never
    * the corpus — in pinned token order through a window, with a loud
    * `maxVocab` guard on the unpartitioned frame. Counts are exact
    * integers; each term is one ln (libm — oracles gate the KL
    * columns at 1e-9, counts hash exactly).
    *
    * Output: one row (n_a, n_b, vocab, kl_ab, kl_ba).
    */
  def unigramKlDivergence(
      df: DataFrame,
      text: Column,
      inSliceA: Column,
      maxVocab: Long = 5000000L): DataFrame = {
    val aG = when(inSliceA.cast("boolean").isNull, raise_error(lit(
      "unigramKlDivergence: the slice flag must be a non-null boolean")))
      .otherwise(inSliceA.cast("boolean"))
    val counts = df.select(aG.as("ina"), explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(
        sum(when(col("ina"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("ina"), 0L).otherwise(1L)).as("cb"))
    val totals = counts.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val wCum = Window.orderBy(col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = (col("ca") + 1L).cast("double") / (col("na") + col("v")).cast("double")
    val q = (col("cb") + 1L).cast("double") / (col("nb") + col("v")).cast("double")
    val folded = counts.crossJoin(broadcast(totals))
      // the guard rides ca (consumed by both window sums) — the
      // vocabulary axis must stay bounded, never corpus-sized
      .withColumn("ca", when(col("v") > maxVocab, raise_error(lit(
        s"unigramKlDivergence: vocabulary exceeds $maxVocab tokens — " +
          "filter or hash-bucket the vocabulary first")))
        .otherwise(col("ca")))
      .withColumn("kl_ab", sum(p * log(p / q)).over(wCum))
      .withColumn("kl_ba", sum(q * log(q / p)).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("tok").desc)))
      .filter(col("rn") === 1)
    folded.select(col("na").as("n_a"), col("nb").as("n_b"),
      col("v").as("vocab"), col("kl_ab"), col("kl_ba"))
  }

  /** JENSEN–SHANNON DIVERGENCE between two corpus slices — the
    * SYMMETRIC, bounded (≤ ln 2) sibling of
    * [[unigramKlDivergence]]: with the same add-1-smoothed p, q over
    * the joint vocabulary and the mixture m = (p+q)/2,
    *
    *   JSD = ½ Σ_w p·ln(p/m) + ½ Σ_w q·ln(q/m).
    *
    * Symmetry and boundedness make it the drift METRIC of choice for
    * dashboards and thresholds (KL explodes on vocabulary one slice
    * barely touches; JSD saturates). Identical scale shape to the KL:
    * one token-explode pass, vocabulary-bounded pinned fold, loud
    * `maxVocab` guard. Output: one row (n_a, n_b, vocab, jsd).
    */
  def jensenShannon(
      df: DataFrame,
      text: Column,
      inSliceA: Column,
      maxVocab: Long = 5000000L): DataFrame = {
    val aG = when(inSliceA.cast("boolean").isNull, raise_error(lit(
      "jensenShannon: the slice flag must be a non-null boolean")))
      .otherwise(inSliceA.cast("boolean"))
    val counts = df.select(aG.as("ina"), explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(
        sum(when(col("ina"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("ina"), 0L).otherwise(1L)).as("cb"))
    val totals = counts.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val wCum = Window.orderBy(col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = (col("ca") + 1L).cast("double") / (col("na") + col("v")).cast("double")
    val q = (col("cb") + 1L).cast("double") / (col("nb") + col("v")).cast("double")
    val m = (p + q) / lit(2.0)
    val folded = counts.crossJoin(broadcast(totals))
      .withColumn("ca", when(col("v") > maxVocab, raise_error(lit(
        s"jensenShannon: vocabulary exceeds $maxVocab tokens — " +
          "filter or hash-bucket the vocabulary first")))
        .otherwise(col("ca")))
      .withColumn("jsd",
        sum(lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m)).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("tok").desc)))
      .filter(col("rn") === 1)
    folded.select(col("na").as("n_a"), col("nb").as("n_b"),
      col("v").as("vocab"), col("jsd"))
  }

  /** VOCABULARY COVERAGE — Chao1 richness + Good–Turing unseen mass:
    * the "how much vocabulary have we NOT crawled yet" audit of a
    * training corpus. From the token frequency spectrum's first two
    * cells (f1 = singletons, f2 = doubletons),
    *
    *   chao1    = S + f1·(f1−1) / (2·(f2+1))      (Chao 1984,
    *              bias-corrected form — defined even when f2 = 0),
    *   p0       = f1 / N                           (Good 1953),
    *   coverage = 1 − p0,
    *
    * chao1 lower-bounds the true vocabulary size and p0 estimates the
    * probability the NEXT token is unseen — the two numbers that say
    * whether more crawling buys new vocabulary or re-buys the head.
    *
    * Scale shape: one token-explode pass to per-token counts
    * (partial-aggregable), then one aggregation over the VOCABULARY
    * axis to a single row — no windows, no collects, no corpus-sized
    * frame anywhere. N, S, f1, f2 are exact integers; chao1 is one
    * division of exact integers plus one addition, p0 one division,
    * coverage one subtraction — every float correctly rounded from
    * exact operands in a pinned order, so the whole row hash-matches.
    * Output: one row (n_tokens, vocab, f1, f2, chao1, gt_unseen_mass,
    * coverage).
    */
  /** GOPHER REPETITION FILTER, part 1 — "fraction of characters in
    * the most frequent n-gram" (Rae et al. 2021, Table A1; the
    * MassiveText quality rule reused by most open curation
    * pipelines): per document and per n, the share of the document's
    * characters claimed by its single most repeated word n-gram,
    *
    *   frac = top_count · top_chars / total_chars,
    *
    * where chars count the tokenizer-normal text (token characters
    * plus single joining spaces; total = Σ len(tok) + (n_toks − 1)).
    * Ties on count break to the lexicographically GREATEST n-gram
    * (one max-struct aggregation — deterministic, oracle-replayable).
    * Documents with fewer than n tokens emit a null fraction.
    *
    * Scale shape: per n (a constant ≤ |ns| fan-out), one
    * posexplode → (doc, n-gram) count aggregation → one max-struct
    * per doc — all partial-aggregable, grouped by doc_id, nothing
    * corpus-wide. Counts and lengths are exact integers; frac is ONE
    * double division — hash-exact. Output: (doc_id, n, top_count,
    * top_chars, total_chars, frac), one row per (doc, n).
    */
  def topNgramCharFraction(
      df: DataFrame,
      id: Column,
      text: Column,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 16),
      s"ns must be within [1, 16], got $ns")
    val base = df.select(
      when(id.isNull, raise_error(lit(
        "topNgramCharFraction: doc id must be non-null")))
        .otherwise(id).as("doc_id"),
      tokens(text).as("toks"))
      .withColumn("total_chars",
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)) +
          greatest(size(col("toks")) - 1, lit(0)).cast("long"))
    val perN = ns.map { n =>
      val grams = base
        .select(col("doc_id"), col("total_chars"),
          explode(when(size(col("toks")) >= n,
            transform(sequence(lit(1), size(col("toks")) - lit(n - 1)),
              i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))).as("g"))
      val counts = grams.groupBy(col("doc_id"), col("total_chars"), col("g"))
        .agg(count(lit(1)).as("c"))
      counts.groupBy(col("doc_id"), col("total_chars"))
        .agg(max(struct(col("c").as("c"), col("g").as("g"))).as("top"))
        .select(col("doc_id"), lit(n).as("n"),
          col("top.c").as("top_count"),
          length(col("top.g")).cast("long").as("top_chars"),
          col("total_chars"),
          ((col("top.c") * length(col("top.g"))).cast("double") /
            col("total_chars").cast("double")).as("frac"))
    }
    val present = perN.reduce(_.unionByName(_))
    // docs with < n tokens (or no tokens at all) re-enter with nulls
    val docs = base.select(col("doc_id"), col("total_chars"))
    val frame = ns.map(n => docs.select(col("doc_id"), lit(n).as("n"),
      col("total_chars").as("tc"))).reduce(_.unionByName(_))
    frame.join(present, Seq("doc_id", "n"), "left")
      .select(col("doc_id"), col("n"),
        col("top_count"), col("top_chars"),
        col("tc").as("total_chars"), col("frac"))
  }

  /** GOPHER REPETITION FILTER, part 2 — "fraction of characters in
    * duplicated n-grams" (Rae et al. 2021): per document and per n,
    * the share of TOKEN characters covered by at least one occurrence
    * of an n-gram that appears more than once in the document — the
    * repetition signal that catches boilerplate loops and degenerate
    * generations the top-1 rule misses. Coverage is the UNION of
    * token positions under duplicated n-grams (overlapping
    * occurrences count once), weighted by token length; totals count
    * token characters only (spaces excluded — documented, the oracle
    * replays the same convention).
    *
    * Scale shape: per n, one posexplode → duplicated-(doc, n-gram)
    * detection (count > 1) → position-range explode (constant ≤ n per
    * occurrence) → distinct covered index → one sum against the
    * (doc, idx, len) table. Everything groups by doc_id, nothing
    * corpus-wide; counts exact, frac ONE division — hash-exact.
    * Output: (doc_id, n, covered_chars, total_chars, frac) with
    * frac = 0 when nothing repeats and null when the doc has no
    * tokens.
    */
  def duplicatedNgramCharFraction(
      df: DataFrame,
      id: Column,
      text: Column,
      ns: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 2 && n <= 16),
      s"ns must be within [2, 16], got $ns")
    val base = df.select(
      when(id.isNull, raise_error(lit(
        "duplicatedNgramCharFraction: doc id must be non-null")))
        .otherwise(id).as("doc_id"),
      tokens(text).as("toks"))
    val lens = base.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("idx", "tok")))
      .select(col("doc_id"), col("idx"), length(col("tok")).cast("long").as("len"))
    val totals = base.select(col("doc_id"),
      aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("total_chars"))
    val perN = ns.map { n =>
      // the n-gram string itself is the identity (NOT a 64-bit hash:
      // a collision would merge distinct n-grams and no SQL oracle
      // could replay it); the group is per-doc, so the string keys
      // stay doc-bounded
      val occ = base
        .select(col("doc_id"),
          posexplode(when(size(col("toks")) >= n,
            transform(sequence(lit(1), size(col("toks")) - lit(n - 1)),
              i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))).as(Seq("pos", "g")))
      // duplicated-gram keys carry NO position list: collecting every
      // occurrence position into one collect_list buffer per (doc, g)
      // builds an m-length array in a single aggregation row for a
      // degenerate doc (one token repeated m times) — memory pressure
      // in an otherwise streaming pipeline. Join the occurrence frame
      // back to the keys instead (exactly what the q383 DuckDB oracle
      // does with o$n JOIN d$n); both sides shuffle on (doc_id, g), so
      // the join adds no new exchange grain.
      val dupKeys = occ.groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1L)
        .select(col("doc_id"), col("g"))
      val covered = occ.join(dupKeys, Seq("doc_id", "g"))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("idx"))
        .distinct()
        .join(lens, Seq("doc_id", "idx"))
        .groupBy(col("doc_id"))
        .agg(sum(col("len")).as("covered_chars"))
      totals
        .join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"), lit(n).as("n"),
          when(col("total_chars") > 0L, coalesce(col("covered_chars"), lit(0L)))
            .otherwise(lit(null).cast("long")).as("covered_chars"),
          col("total_chars"),
          when(col("total_chars") > 0L,
            coalesce(col("covered_chars"), lit(0L)).cast("double") /
              col("total_chars").cast("double"))
            .otherwise(lit(null).cast("double")).as("frac"))
    }
    perN.reduce(_.unionByName(_))
  }

  def vocabularyCoverage(df: DataFrame, text: Column): DataFrame = {
    val counts = df.select(explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val spectrum = counts.agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("s"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
    spectrum.select(
      when(col("n").isNull, raise_error(lit(
        "vocabularyCoverage: empty corpus — no tokens to profile")))
        .otherwise(col("n")).as("n_tokens"),
      col("s").as("vocab"),
      col("f1"), col("f2"),
      (col("s").cast("double") +
        (col("f1") * (col("f1") - 1L)).cast("double") /
          (lit(2L) * (col("f2") + 1L)).cast("double")).as("chao1"),
      (col("f1").cast("double") / col("n").cast("double")).as("gt_unseen_mass"),
      (lit(1.0) - col("f1").cast("double") / col("n").cast("double")).as("coverage"))
  }

  /** BLEU (Papineni et al., ACL 2002) — single-reference corpus eval:
    * per (candidate, reference) pair, the clipped n-gram precisions
    * p_n = Σ_g min(count_cand(g), count_ref(g)) / (len_c − n + 1) for
    * n = 1..`maxN`, the brevity penalty BP = min(1, e^(1 − r/c)), and
    * BLEU = BP · exp((1/maxN)·Σ ln p_n) — 0 whenever any p_n is 0
    * (unsmoothed, the reference definition). The standard quality gate
    * for generated-vs-reference text in a training-data pipeline.
    *
    * Scale shape: n-gram counts group by (pair, n, gram) — everything
    * is pair-bounded and partial-aggregable, the clip join runs on the
    * same (pair, n, gram) grain both sides were just grouped on, and
    * nothing is corpus-wide. Gram identity is the STRING (no hashing —
    * a collision would silently merge counts and no oracle could
    * replay it). Match counts are exact integers; bp/bleu are the only
    * floats (exp/ln — certificate-gated at 1e-9, the q366 pattern).
    *
    * Pair ids must be UNIQUE: a duplicated id would merge two pairs'
    * gram counts into one corrupt score.
    *
    * Output: (pid, c_len, r_len, m1..m`maxN` exact clipped matches,
    * bp, bleu); pairs with an empty candidate score 0.
    */
  def bleuScore(
      pairs: DataFrame,
      pairId: Column,
      cand: Column,
      ref: Column,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val base = pairs.select(
      when(pairId.isNull, raise_error(lit(
        "bleuScore: pair id must be non-null")))
        .otherwise(pairId).as("pid"),
      tokens(cand).as("ct"), tokens(ref).as("rt"))
      .withColumn("c_len", size(col("ct")).cast("long"))
      .withColumn("r_len", size(col("rt")).cast("long"))
    def grams(tcol: String): DataFrame = (1 to maxN).map { n =>
      base.select(col("pid"), lit(n).as("n"),
        explode(when(size(col(tcol)) >= n,
          transform(sequence(lit(1), size(col(tcol)) - lit(n - 1)),
            i => concat_ws(" ", slice(col(tcol), i, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("g"))
    }.reduce(_ unionByName _)
    val cg = grams("ct").groupBy("pid", "n", "g").agg(count(lit(1)).as("cc"))
    val rg = grams("rt").groupBy("pid", "n", "g").agg(count(lit(1)).as("rc"))
    val m = cg.join(rg, Seq("pid", "n", "g"))
      .groupBy("pid", "n")
      .agg(sum(least(col("cc"), col("rc"))).as("mm"))
    val mWide = m.groupBy("pid").agg(
      (1 to maxN).map(n =>
        sum(when(col("n") === n, col("mm")).otherwise(0L)).as(s"m$n")).head,
      (1 to maxN).map(n =>
        sum(when(col("n") === n, col("mm")).otherwise(0L)).as(s"m$n")).tail: _*)
    val joined = base.select("pid", "c_len", "r_len")
      .join(mWide, Seq("pid"), "left")
    val withT = (1 to maxN).foldLeft(joined) { (df, n) =>
      df.withColumn(s"m$n", coalesce(col(s"m$n"), lit(0L)))
        .withColumn(s"t$n", greatest(col("c_len") - lit(n - 1), lit(0L)))
    }
    val anyZero = (1 to maxN)
      .map(n => col(s"m$n") === 0L || col(s"t$n") === 0L)
      .reduce(_ || _)
    val lnSum = (1 to maxN)
      .map(n => log(col(s"m$n").cast("double") / col(s"t$n").cast("double")))
      .reduce(_ + _)
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("r_len").cast("double") / col("c_len").cast("double")))
    withT.select(
      Seq(col("pid"), col("c_len"), col("r_len")) ++
        (1 to maxN).map(n => col(s"m$n")) ++ Seq(
        when(col("c_len") === 0L, lit(0.0)).otherwise(bp).as("bp"),
        when(anyZero, lit(0.0))
          .otherwise(bp * exp(lnSum * lit(1.0 / maxN))).as("bleu")): _*)
  }

  /** chrF (Popović, WMT 2015) — the character-n-gram F-score, the MT
    * eval metric robust to tokenization and morphology where [[
    * bleuScore]] is word-exact: over whitespace-stripped lowercase
    * text, per n = 1..`maxN` the clipped char-n-gram matches m_n give
    * precision P_n = m_n/(len_c − n + 1) and recall R_n =
    * m_n/(len_r − n + 1); P and R average the per-n values (an n with
    * an empty gram set contributes 0 — documented convention, the
    * oracle replays it) and chrF_β = (1+β²)·P·R/(β²·P + R), β = 2
    * (recall-weighted, the standard). Both sides are truncated to the
    * first `maxChars` stripped characters so the char-grain explode
    * stays bounded per pair — documented cap, replayed by the oracle.
    *
    * Same (pair, n, gram) count-join-clip grain as [[bleuScore]];
    * match counts exact, P/R/chrF the only floats (pure arithmetic —
    * no libm at all, but averaged divisions keep it certificate-gated).
    *
    * Output: (pid, c_chars, r_chars, m1..m`maxN`, p_avg, r_avg, chrf).
    */
  def chrF(
      pairs: DataFrame,
      pairId: Column,
      cand: Column,
      ref: Column,
      maxN: Int = 6,
      maxChars: Int = 200): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    require(maxChars >= maxN && maxChars <= 4096,
      s"maxChars must be in [maxN, 4096], got $maxChars")
    def stripped(c: Column): Column =
      substring(regexp_replace(lower(coalesce(c, lit(""))), "\\s+", ""),
        1, maxChars)
    val base = pairs.select(
      when(pairId.isNull, raise_error(lit(
        "chrF: pair id must be non-null")))
        .otherwise(pairId).as("pid"),
      stripped(cand).as("cs"), stripped(ref).as("rs"))
      .withColumn("c_chars", length(col("cs")).cast("long"))
      .withColumn("r_chars", length(col("rs")).cast("long"))
    def grams(scol: String): DataFrame = (1 to maxN).map { n =>
      base.select(col("pid"), lit(n).as("n"),
        explode(when(length(col(scol)) >= n,
          transform(sequence(lit(1), length(col(scol)) - lit(n - 1)),
            i => col(scol).substr(i, lit(n))))
          .otherwise(array().cast("array<string>"))).as("g"))
    }.reduce(_ unionByName _)
    val cg = grams("cs").groupBy("pid", "n", "g").agg(count(lit(1)).as("cc"))
    val rg = grams("rs").groupBy("pid", "n", "g").agg(count(lit(1)).as("rc"))
    val m = cg.join(rg, Seq("pid", "n", "g"))
      .groupBy("pid", "n")
      .agg(sum(least(col("cc"), col("rc"))).as("mm"))
    val mWide = m.groupBy("pid").agg(
      (1 to maxN).map(n =>
        sum(when(col("n") === n, col("mm")).otherwise(0L)).as(s"m$n")).head,
      (1 to maxN).map(n =>
        sum(when(col("n") === n, col("mm")).otherwise(0L)).as(s"m$n")).tail: _*)
    val joined = base.select("pid", "c_chars", "r_chars")
      .join(mWide, Seq("pid"), "left")
    val withM = (1 to maxN).foldLeft(joined) { (df, n) =>
      df.withColumn(s"m$n", coalesce(col(s"m$n"), lit(0L)))
    }
    def avgOver(lenCol: String): Column =
      (1 to maxN).map { n =>
        val t = greatest(col(lenCol) - lit(n - 1), lit(0L))
        when(t > 0L, col(s"m$n").cast("double") / t.cast("double"))
          .otherwise(lit(0.0))
      }.reduce(_ + _) * lit(1.0 / maxN)
    val beta2 = 4.0
    withM
      .withColumn("p_avg", avgOver("c_chars"))
      .withColumn("r_avg", avgOver("r_chars"))
      .select(
        Seq(col("pid"), col("c_chars"), col("r_chars")) ++
          (1 to maxN).map(n => col(s"m$n")) ++ Seq(
          col("p_avg"), col("r_avg"),
          when(col("p_avg") + col("r_avg") > 0.0,
            lit(1.0 + beta2) * col("p_avg") * col("r_avg") /
              (lit(beta2) * col("p_avg") + col("r_avg")))
            .otherwise(lit(0.0)).as("chrf")): _*)
  }

  /** ROUGE-L (Lin, 2004) — the longest-common-subsequence F-measure,
    * the summarization-eval complement to [[bleuScore]]'s contiguous
    * n-grams: LCS credits in-order but GAPPED overlap, so it rewards
    * sentence-level structure without requiring adjacency. Per pair,
    * P = LCS/len_c, R = LCS/len_r, F = 2PR/(P+R) (β = 1, the
    * convention of the reference rouge-score implementation).
    *
    * Both token sequences are truncated to the first `maxTokens`
    * tokens (documented cap, replayed by the oracle): LCS is O(m·n)
    * per pair and an uncapped degenerate document would make one row
    * quadratically expensive. The DP itself is the native
    * [[graft.functions.TokenLcs]] codegen kernel — one tight int loop
    * per pair, zero shuffles beyond the caller's pairing; LCS length
    * is an exact integer, P/R/F three guarded divisions.
    *
    * Output: (pid, c_len, r_len, lcs, p, r, f) with c_len/r_len the
    * CAPPED scored lengths.
    */
  def rougeL(
      pairs: DataFrame,
      pairId: Column,
      cand: Column,
      ref: Column,
      maxTokens: Int = 128): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 1024,
      s"maxTokens must be in [1, 1024], got $maxTokens")
    val base = pairs.select(
      when(pairId.isNull, raise_error(lit(
        "rougeL: pair id must be non-null")))
        .otherwise(pairId).as("pid"),
      slice(tokens(cand), 1, maxTokens).as("ct"),
      slice(tokens(ref), 1, maxTokens).as("rt"))
    val scored = base.select(
      col("pid"),
      size(col("ct")).cast("long").as("c_len"),
      size(col("rt")).cast("long").as("r_len"),
      graft.functions.GraftFunctions.tokenLcs(col("ct"), col("rt"))
        .cast("long").as("lcs"))
    scored.select(
      col("pid"), col("c_len"), col("r_len"), col("lcs"),
      when(col("c_len") > 0L,
        col("lcs").cast("double") / col("c_len").cast("double"))
        .otherwise(lit(0.0)).as("p"),
      when(col("r_len") > 0L,
        col("lcs").cast("double") / col("r_len").cast("double"))
        .otherwise(lit(0.0)).as("r"),
      when(col("lcs") > 0L,
        lit(2.0) * (col("lcs").cast("double") / col("c_len").cast("double")) *
          (col("lcs").cast("double") / col("r_len").cast("double")) /
          ((col("lcs").cast("double") / col("c_len").cast("double")) +
            (col("lcs").cast("double") / col("r_len").cast("double"))))
        .otherwise(lit(0.0)).as("f"))
  }

  /** WORD ERROR RATE (the ASR/translation eval workhorse) — the
    * token-level Levenshtein distance between hypothesis and
    * reference, normalized by reference length: WER = (S+I+D)/N. The
    * completion of the eval family next to [[bleuScore]] (contiguous
    * overlap), [[chrF]] (character overlap) and [[rougeL]] (gapped
    * in-order overlap): WER is the only one that PENALIZES
    * out-of-order content, because alignment is sequential.
    *
    * Both token sequences are truncated to the first `maxTokens`
    * tokens (documented cap, replayed by the oracle): the DP is
    * O(m·n) per pair and an uncapped degenerate document would make
    * one row quadratically expensive. The DP is the native
    * [[graft.functions.TokenEditDistance]] codegen kernel — one tight
    * int loop per pair, zero shuffles beyond the caller's pairing.
    * The distance is an exact integer; WER is one guarded pinned
    * division (null when the capped reference is empty and the
    * hypothesis is not — 0/0 scores 0 by convention, d/0 is
    * undefined). Note WER can exceed 1 (insertions against a short
    * reference) — that is the statistic, not clamped.
    *
    * Output: (pid, h_len, r_len, dist, wer) with h_len/r_len the
    * CAPPED scored lengths.
    */
  def wordErrorRate(
      pairs: DataFrame,
      pairId: Column,
      hyp: Column,
      ref: Column,
      maxTokens: Int = 128): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 1024,
      s"maxTokens must be in [1, 1024], got $maxTokens")
    val base = pairs.select(
      when(pairId.isNull, raise_error(lit(
        "wordErrorRate: pair id must be non-null")))
        .otherwise(pairId).as("pid"),
      slice(tokens(hyp), 1, maxTokens).as("ht"),
      slice(tokens(ref), 1, maxTokens).as("rt"))
    val scored = base.select(
      col("pid"),
      size(col("ht")).cast("long").as("h_len"),
      size(col("rt")).cast("long").as("r_len"),
      graft.functions.GraftFunctions.tokenLev(col("ht"), col("rt"))
        .cast("long").as("dist"))
    scored.select(
      col("pid"), col("h_len"), col("r_len"), col("dist"),
      when(col("r_len") > 0L,
        col("dist").cast("double") / col("r_len").cast("double"))
        .when(col("dist") === 0L, lit(0.0))
        .otherwise(lit(null).cast("double")).as("wer"))
  }

  /** ZIPF RANK–FREQUENCY FIT — the corpus-health audit: OLS of
    * ln(freq) on ln(rank) over the top-`topK` vocabulary (rank by
    * count desc, token asc). Natural text sits near slope ≈ −1
    * (Zipf 1949); strong deviation flags synthetic, boilerplate, or
    * degenerate corpora before they poison a training mix. The fit is
    * head-only BY DESIGN (the tail bends away from the power law and
    * its ranks dominate an unweighted fit), and `topK` bounds every
    * non-distributed step: token counts are a corpus-wide group-by,
    * the head is a TakeOrdered top-K (per-partition top-K, never a
    * global sort), and the OLS sums fold over ONE ≤ topK-long sorted
    * array in pinned rank order — bit-replayable by a list_reduce
    * oracle, Σ-terms at 1e-9 (ln is the only libm call).
    *
    * Output: one row (n_ranks, top_count, slope, intercept, r2).
    */
  def zipfFit(df: DataFrame, text: Column, topK: Int = 4096): DataFrame = {
    require(topK >= 2 && topK <= 65536, s"topK must be in [2, 65536], got $topK")
    val counts = df.select(explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("tok").asc).limit(topK)
    // bounded: ≤ topK elements by the limit just above
    val arr = top.agg(sort_array(collect_list(
      struct((lit(Long.MaxValue) - col("c")).as("nc"), col("tok").as("tok"),
        col("c").as("c")))).as("a"))
    val xy = arr.select(col("a"),
      transform(sequence(lit(1), size(col("a"))), i => struct(
        log(i.cast("double")).as("x"),
        log(element_at(col("a"), i).getField("c").cast("double")).as("y")))
        .as("xs"))
    val folded = xy.select(
      size(col("a")).cast("long").as("n_ranks"),
      element_at(col("a"), 1).getField("c").as("top_count"),
      element_at(col("a"), size(col("a"))).getField("c").as("last_count"),
      aggregate(col("xs"), struct(lit(0.0).as("sx"), lit(0.0).as("sy"),
        lit(0.0).as("sxx"), lit(0.0).as("sxy"), lit(0.0).as("syy")),
        (acc, p) => struct(
          (acc.getField("sx") + p.getField("x")).as("sx"),
          (acc.getField("sy") + p.getField("y")).as("sy"),
          (acc.getField("sxx") + p.getField("x") * p.getField("x")).as("sxx"),
          (acc.getField("sxy") + p.getField("x") * p.getField("y")).as("sxy"),
          (acc.getField("syy") + p.getField("y") * p.getField("y")).as("syy")))
        .as("s"))
    // Both OLS denominators are guarded LOUDLY on exact-integer
    // conditions (never on the float residual, which is not exactly 0
    // under rounding): n < 2 zeroes the x-variance (ranks are distinct,
    // so n ≥ 2 makes it strictly positive), and an all-equal head
    // (top_count == last_count) zeroes the y-variance — a corpus whose
    // whole top-K appears with one frequency has no rank–frequency law
    // to fit, and non-ANSI mode would otherwise return Infinity/NaN.
    val guarded = when(col("n_ranks") < 2L, raise_error(lit(
      "zipfFit: need at least 2 distinct tokens")))
      .when(col("top_count") === col("last_count"), raise_error(lit(
        "zipfFit: degenerate spectrum — every head token has the same " +
          "count; no rank-frequency law to fit")))
      .otherwise(col("n_ranks"))
    val covXY = guarded * col("s.sxy") - col("s.sx") * col("s.sy")
    val varX = guarded * col("s.sxx") - col("s.sx") * col("s.sx")
    val varY = guarded * col("s.syy") - col("s.sy") * col("s.sy")
    folded.select(
      col("n_ranks"),
      col("top_count"),
      (covXY / varX).as("slope"),
      ((col("s.sy") - covXY / varX * col("s.sx")) / col("n_ranks"))
        .as("intercept"),
      ((covXY * covXY) / (varX * varY)).as("r2"))
  }

  /** HEAPS' LAW FIT — the vocabulary-GROWTH corpus-health audit
    * beside [[zipfFit]]'s frequency spectrum: V(N) ≈ k·N^β (Heaps
    * 1978), natural text sits near β ≈ 0.4–0.6; β near 1 flags
    * boilerplate-free synthetic noise (every doc brings new tokens),
    * β near 0 flags template spam (no doc brings anything new). The
    * fit is OLS of ln V on ln N over `checkpoints` cumulative
    * prefixes of the corpus in doc-id order.
    *
    * Scale shape: checkpoint c covers doc ids ≤ ⌈maxId·c/C⌉ — each
    * doc maps to its first covering checkpoint with one exact integer
    * expression, so cumulative token counts N_c are ONE
    * partial-aggregable pass, and cumulative vocabulary V_c needs no
    * per-checkpoint distinct: a token is new exactly at its MINIMUM
    * doc id, so V_c = #{tokens: first_doc ≤ thr_c} is a second
    * group-by (token → min doc) plus a C-row prefix sum. Nothing
    * rescans the corpus per checkpoint; the windows run over ≤ C
    * post-aggregation rows. Checkpoints that received no documents
    * are dropped (their cumulative point would duplicate the previous
    * one and double-weight it in the fit); the ln/OLS fold runs in
    * pinned checkpoint order over the ≤ C survivors — the q388
    * replay discipline (Σ-terms at 1e-9, ln is the only libm call).
    *
    * Output: one row (n_points, n_tokens, n_vocab, beta, ln_k, r2)
    * with n_tokens/n_vocab the full-corpus totals and k = e^ln_k.
    */
  def heapsFit(
      df: DataFrame,
      docId: Column,
      text: Column,
      checkpoints: Int = 16): DataFrame = {
    require(checkpoints >= 2 && checkpoints <= 256,
      s"checkpoints must be in [2, 256], got $checkpoints")
    val C = checkpoints
    val idL = docId.cast("long")
    val idG = when(idL.isNull || idL < 0L, raise_error(lit(
      "heapsFit: doc id must be a non-null non-negative integer")))
      .when(idL > 1000000000000000L, raise_error(lit(
        "heapsFit: doc ids beyond 1e15 overflow the exact checkpoint " +
          "arithmetic — densify the id space first")))
      .otherwise(idL)
    val base = df.select(idG.as("id"), tokens(text).as("toks"))
      .localCheckpoint(true)
    val mx = base.agg(greatest(max(col("id")), lit(1L)).as("mid"))
    // first covering checkpoint: smallest c with id ≤ mid·c/C, i.e.
    // ⌈id·C/mid⌉ clamped to [1, C] — exact long arithmetic (`div`)
    def fi(id: String): Column =
      least(greatest(expr(s"($id * $C + mid - 1) div mid"), lit(1L)), lit(C.toLong))
    val perDoc = base.crossJoin(broadcast(mx))
      .select(fi("id").as("c"), size(col("toks")).cast("long").as("tc"))
      .groupBy(col("c")).agg(count(lit(1)).as("dn"), sum(col("tc")).as("tn"))
    val firstDoc = base.select(explode(col("toks")).as("tok"), col("id"))
      .groupBy(col("tok")).agg(min(col("id")).as("fd"))
      .crossJoin(broadcast(mx))
      .select(fi("fd").as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("vn"))
    val wCum = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤ C rows post-aggregation: the single-partition window is bounded
    val cum = perDoc.join(firstDoc, Seq("c"), "left")
      .select(col("c"), col("dn"),
        sum(col("tn")).over(wCum).as("nc"),
        sum(coalesce(col("vn"), lit(0L))).over(wCum).as("vc"))
      .filter(col("dn") > 0L && col("nc") > 0L && col("vc") > 0L)
    // bounded: ≤ C checkpoint rows by construction
    val arr = cum.agg(
      sort_array(collect_list(struct(col("c"), col("nc"), col("vc")))).as("a"))
    val xy = arr.select(col("a"),
      transform(col("a"), p => struct(
        log(p.getField("nc").cast("double")).as("x"),
        log(p.getField("vc").cast("double")).as("y"))).as("xs"))
    val folded = xy.select(
      size(col("a")).cast("long").as("n_points"),
      element_at(col("a"), size(col("a"))).getField("nc").as("n_tokens"),
      element_at(col("a"), size(col("a"))).getField("vc").as("n_vocab"),
      element_at(col("a"), 1).getField("nc").as("first_n"),
      aggregate(col("xs"), struct(lit(0.0).as("sx"), lit(0.0).as("sy"),
        lit(0.0).as("sxx"), lit(0.0).as("sxy"), lit(0.0).as("syy")),
        (acc, p) => struct(
          (acc.getField("sx") + p.getField("x")).as("sx"),
          (acc.getField("sy") + p.getField("y")).as("sy"),
          (acc.getField("sxx") + p.getField("x") * p.getField("x")).as("sxx"),
          (acc.getField("sxy") + p.getField("x") * p.getField("y")).as("sxy"),
          (acc.getField("syy") + p.getField("y") * p.getField("y")).as("syy")))
        .as("s"))
    // loud exact-integer guards (the zipfFit discipline): < 2 points
    // zeroes var(x) only when ln N collapses — distinct checkpoints
    // have strictly increasing N, so n ≥ 2 suffices; an all-one-doc
    // corpus (first_n == n_tokens) puts every point at the same N
    val guarded = when(col("n_points") < 2L, raise_error(lit(
      "heapsFit: need at least 2 non-empty checkpoints to fit growth")))
      .when(col("first_n") === col("n_tokens"), raise_error(lit(
        "heapsFit: all tokens land in the first checkpoint — no growth " +
          "axis to fit; raise `checkpoints` or densify doc ids")))
      .otherwise(col("n_points"))
    val covXY = guarded * col("s.sxy") - col("s.sx") * col("s.sy")
    val varX = guarded * col("s.sxx") - col("s.sx") * col("s.sx")
    val varY = guarded * col("s.syy") - col("s.sy") * col("s.sy")
    folded.select(
      col("n_points"), col("n_tokens"), col("n_vocab"),
      (covXY / varX).as("beta"),
      ((col("s.sy") - covXY / varX * col("s.sx")) / col("n_points"))
        .as("ln_k"),
      when(varY > 0.0, (covXY * covXY) / (varX * varY)).as("r2"))
  }
}

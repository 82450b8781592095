package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, TemporalJoins, TextAnalysis}

/** Driver-contract queries for the round-5 operator additions:
  * temporal joins (as-of, bounded range) over the `events` table and
  * the corpus-hygiene pair (boilerplate-line removal, per-domain cap)
  * over `documents`. Deterministic op-for-op oracles throughout —
  * the temporal joins emit epoch-µs longs (not raw timestamps) so the
  * compare never rides on timestamp-precision coercion, and unmatched
  * as-of probes carry sentinel values plus an explicit `matched` flag
  * so no nullable-int column reaches the pandas normalizer.
  */
object Curation2 {

  // DuckDB mirror of TextAnalysis.tokens on this ASCII corpus (same
  // expression as LlmOps.sqlToks; duplicated string, single idiom).
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  private val sqlQuality =
    """(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
      | + (1.0 - least(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g'))
      |     / greatest(CAST(len(toks) AS DOUBLE), 1.0), 1.0))
      | + least(CAST(len(list_filter(toks, t -> list_contains(
      |     ['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
      |     / greatest(CAST(len(toks) AS DOUBLE), 1.0) * 5.0, 1.0)
      |) / 3.0""".stripMargin

  /** Fixed subword vocabulary for q74 — multi-char pieces that overlap
    * the corpus vocabulary in interesting ways (prefix/suffix pairs,
    * nested pieces like tab/table) so greedy-longest-match genuinely
    * differs from any shorter-match segmentation.
    */
  val wordpieceVocab: Seq[String] = Seq(
    "table", "tab", "le", "val", "ue", "scan", "cust", "omer", "win", "dow",
    "str", "eam", "qu", "ery", "ord", "er", "lin", "sp", "ark", "agg",
    "row", "key", "ha", "sh", "part")

  val all: Seq[Q] = Seq(

    // ---- as-of join: for every 'error' event, the newest 'click' by
    // the same user at-or-before it (ties on ts → highest event_id).
    // The plan is ONE shuffle of (errors ∪ clicks) on user_id + a
    // per-user running `last` — no per-probe subquery, no self-join;
    // the oracle states the same semantics as a correlated LATERAL
    // top-1, the formulation a 100× corpus could NOT run.
    Q(
      "q66_asof_join",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        val probe = e.filter($"event_type" === "error")
        val ref = e.filter($"event_type" === "click")
        TemporalJoins.asofJoin(
          probe, ref,
          probeKey = $"user_id", probeTime = $"ts",
          refKey = $"user_id", refTime = $"ts",
          probeOut = Seq(
            "event_id" -> $"event_id",
            "user_id" -> $"user_id",
            "t_us" -> unix_micros($"ts")),
          refOut = Seq(
            "click_event_id" -> $"event_id",
            "click_t_us" -> unix_micros($"ts"),
            "click_value" -> $"value"),
          refOrder = $"event_id")
          .select(
            col("event_id"), col("user_id"), col("t_us"),
            col("click_event_id").isNotNull.as("matched"),
            coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
            coalesce(col("click_t_us"), lit(-1L)).as("click_t_us"),
            coalesce(col("click_value"), lit(0.0)).as("click_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             |    value, event_type FROM events),
             |p AS (SELECT * FROM e WHERE event_type = 'error'),
             |r AS (SELECT * FROM e WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, p.t AS t_us,
             |  m.click_event_id IS NOT NULL AS matched,
             |  coalesce(m.click_event_id, -1) AS click_event_id,
             |  coalesce(m.click_t_us, -1) AS click_t_us,
             |  coalesce(m.click_value, 0.0) AS click_value
             |FROM p LEFT JOIN LATERAL (
             |  SELECT r.event_id AS click_event_id, r.t AS click_t_us,
             |    r.value AS click_value
             |  FROM r WHERE r.user_id = p.user_id AND r.t <= p.t
             |  ORDER BY r.t DESC, r.event_id DESC LIMIT 1
             |) m ON TRUE
             |ORDER BY event_id""".stripMargin)),

    // ---- bounded range join: every (error, click) pair of the same
    // user within ±3600 s. Tolerance-sized time bins turn the
    // inequality into an equi-join on (user, bin): the oracle's plain
    // theta join is the O(n²)-per-user plan this replaces.
    Q(
      "q67_range_join",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d)
        TemporalJoins.rangeJoinPairs(
          e.filter($"event_type" === "error"),
          e.filter($"event_type" === "click"),
          leftKey = $"user_id", leftTime = $"ts",
          rightKey = $"user_id", rightTime = $"ts",
          toleranceSeconds = 3600L,
          leftOut = Seq(
            "error_event_id" -> $"event_id",
            "user_id" -> $"user_id"),
          rightOut = Seq("click_event_id" -> $"event_id"))
          .orderBy(col("error_event_id"), col("click_event_id"))
      },
      Some("""SELECT a.event_id AS error_event_id, a.user_id,
             |  b.event_id AS click_event_id,
             |  (epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)))
             |    / 1000000.0 AS delta_seconds
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id
             | AND a.event_type = 'error' AND b.event_type = 'click'
             | AND abs(epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)))
             |       <= 3600000000
             |ORDER BY error_event_id, click_event_id""".stripMargin)),

    // ---- C4/RefinedWeb boilerplate-line removal. The corpus has no
    // newlines, so the query stages multi-line docs deterministically:
    // 8-token lines from each doc's own tokens, a "subscribe" line on
    // 2/3 of docs and a "copyright" header on every 5th — the operator
    // must remove exactly the lines whose corpus-wide count reaches 3
    // (the injected boilerplate, plus any organically repeated token
    // window), everywhere they occur.
    Q(
      "q68_line_dedup",
      (s, d) => {
        import s.implicits._
        val toksC = coalesce(TextAnalysis.tokens($"text"), array())
        val nL = ceil(size(toksC) / lit(8.0)).cast("int")
        val linesC = when(size(toksC) === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), nL - 1),
            i => concat_ws(" ", slice(toksC, i * 8 + 1, lit(8)))))
        val withSub = when($"doc_id" % 3 =!= 0,
          concat(linesC, array(lit("subscribe to our newsletter today"))))
          .otherwise(linesC)
        val withHdr = when($"doc_id" % 5 === 0,
          concat(array(lit("copyright 2024 example corp")), withSub))
          .otherwise(withSub)
        val staged = Tables.documents(s, d)
          .select($"doc_id", concat_ws("\n", withHdr).as("text"))
        TextAnalysis.removeDuplicatedLines(staged, $"text", $"doc_id", minOccurrences = 3)
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents),
              |l0 AS (SELECT doc_id, CASE WHEN len(tk) = 0 THEN []
              |  ELSE [array_to_string(tk[(i-1)*8+1:(i-1)*8+8], ' ')
              |        for i in range(1, CAST(ceil(len(tk) / 8.0) AS BIGINT) + 1)]
              |  END AS ls FROM t),
              |l1 AS (SELECT doc_id, CASE WHEN doc_id % 3 <> 0
              |  THEN list_append(ls, 'subscribe to our newsletter today') ELSE ls END AS ls
              |  FROM l0),
              |l2 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
              |  THEN list_prepend('copyright 2024 example corp', ls) ELSE ls END AS ls
              |  FROM l1),
              |sp AS (SELECT doc_id,
              |  string_split(coalesce(array_to_string(ls, chr(10)), ''), chr(10)) AS ls
              |  FROM l2),
              |e AS (SELECT doc_id, unnest(ls) AS line FROM sp),
              |b AS (SELECT line FROM e GROUP BY line HAVING count(*) >= 3),
              |bl AS (SELECT coalesce(list(line), []) AS b FROM b)
              |SELECT doc_id,
              |  -- coalesce: DuckDB's array_to_string on an EMPTY list
              |  -- is NULL, but a doc whose every line is boilerplate
              |  -- must survive with clean_text = '' (the operator
              |  -- contract; first bitten at sf0.1 where 9 docs fully
              |  -- empty — sf0.01 never empties a doc)
              |  coalesce(array_to_string(list_filter(ls, x ->
              |    NOT list_contains(bl.b, x)), chr(10)), '') AS clean_text,
              |  CAST(len(ls) - len(list_filter(ls, x ->
              |    NOT list_contains(bl.b, x))) AS BIGINT) AS n_removed
              |FROM sp CROSS JOIN bl ORDER BY doc_id""".stripMargin)),

    // ---- per-domain cap: at most 10 docs per source, best quality
    // first. The bounded top-k aggregator ships ≤ k candidates per
    // (partition, source) — the oracle's row_number window (full
    // per-source sort) is the plan it replaces.
    Q(
      "q69_per_domain_cap",
      (s, d) => {
        import s.implicits._
        // tokens materialized ONCE per row — qualityScore(text) would
        // re-run the tokenizer inside each sub-score of the expression
        // tree (measured 2–4 s vs 1.3 s at sf0.1)
        val scored = Tables.documents(s, d)
          .withColumn("__toks", TextAnalysis.tokens($"text"))
        Sampling.capPerKey(
          scored,
          key = $"source",
          score = TextAnalysis.qualityScoreFromTokens($"text", $"__toks"),
          id = $"doc_id",
          k = 10)
          .drop("__toks")
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, lang, source, n_chars, $sqlToks AS toks
              |  FROM documents),
              |q AS (SELECT doc_id, text, lang, source, n_chars,
              |  $sqlQuality AS quality FROM t),
              |r AS (SELECT *, row_number() OVER (
              |  PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rn FROM q)
              |SELECT doc_id, text, lang, source, n_chars
              |FROM r WHERE rn <= 10 ORDER BY doc_id""".stripMargin)),

    // ---- mergeable HLL sketch STATES: per-(day, type) binary sketches
    // union-merged into per-type distinct-user estimates — the
    // incremental-analytics pattern (pre-aggregate daily, merge any
    // window later without touching raw data; a 100 TB history rolls up
    // from KB-sized states). Tolerance oracle à la q45: lgConfigK=12 →
    // rsd ≈ 1.6%, gated at 10% with symmetric membership checks.
    Q(
      "q70_hll_merge_rollup",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .groupBy(to_date($"ts").as("day"), $"event_type")
          .agg(hll_sketch_agg($"user_id", lit(12)).as("sketch"))
        daily.groupBy($"event_type")
          .agg(hll_sketch_estimate(hll_union_agg($"sketch", lit(false))).as("est_users"))
          .orderBy($"event_type")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q70_hll_merge_rollup/*.parquet')),
             |exact AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS u
             |  FROM events GROUP BY 1),
             |j AS (SELECT e.event_type, e.est_users, x.u
             |  FROM emitted e JOIN exact x USING (event_type)),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM exact)
             |    AND (SELECT count(DISTINCT event_type) FROM emitted)
             |      = (SELECT count(*) FROM exact)
             |    AND (SELECT count(*) FROM j) = (SELECT count(*) FROM exact)
             |    AND NOT EXISTS (SELECT 1 FROM j
             |      WHERE abs(est_users - u) > greatest(0.1 * u, 1))
             |  ) AS ok)
             |SELECT event_type, est_users FROM emitted WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON' AS event_type, CAST(-1 AS BIGINT) AS est_users
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- Misra-Gries heavy hitters over the token stream: ≤ k
    // counters per partial buffer, mergeable (PODS'12 reduction), no
    // full-vocabulary shuffle — vs q56's exact groupBy. Estimates are
    // partitioning-dependent; the GUARANTEES are not, and the oracle
    // gates exactly them: underestimate-only, error ≤ N/(k+1), and
    // every token with true count > N/(k+1) present.
    Q(
      "q71_heavy_hitters",
      (s, d) => {
        import s.implicits._
        graft.operators.Sketches.heavyHitters(
          Tables.documents(s, d)
            .select(explode(TextAnalysis.tokens($"text")).as("token")),
          $"token", k = 64)
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q71_heavy_hitters/*.parquet')),
              |tok AS (SELECT unnest($sqlToks) AS token FROM documents),
              |exact AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
              |bound AS (SELECT CAST(floor(n / 65.0) AS BIGINT) AS b FROM n),
              |j AS (SELECT e.token, e.est_count, x.c
              |  FROM emitted e LEFT JOIN exact x USING (token)),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) <= 64
              |    AND (SELECT count(DISTINCT token) FROM emitted)
              |      = (SELECT count(*) FROM emitted)
              |    AND NOT EXISTS (SELECT 1 FROM j
              |      WHERE c IS NULL OR est_count > c OR c - est_count > (SELECT b FROM bound))
              |    AND NOT EXISTS (SELECT 1 FROM exact
              |      WHERE c > (SELECT b FROM bound)
              |        AND token NOT IN (SELECT token FROM emitted))
              |  ) AS ok)
              |SELECT token, est_count FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT 'POISON' AS token, CAST(-1 AS BIGINT) AS est_count
              |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- deterministic weighted interleave: virtual time
    // vt = hash-uniform / weight; sorting by vt gives every training
    // prefix each source in proportion to its weight — stride
    // scheduling with no RNG and no windows (vt is map-side; the sort
    // is the one global op a training-order materialization needs).
    Q(
      "q72_curriculum_interleave",
      (s, d) => {
        import s.implicits._
        val vt = Sampling.interleaveByWeight(
          $"source", $"text",
          weights = Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 0.5),
          defaultWeight = 1.0)
        Tables.documents(s, d)
          .select($"doc_id", $"source", vt.as("vt"))
          .orderBy($"vt", $"doc_id")
      },
      Some("""SELECT doc_id, source,
             |  (CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) / 4294967296.0)
             |    / (CASE source WHEN 'src0' THEN 4.0 WHEN 'src1' THEN 2.0
             |        WHEN 'src2' THEN 0.5 ELSE 1.0 END) AS vt
             |FROM documents ORDER BY vt, doc_id""".stripMargin)),

    // ---- exact per-source percentile-rank calibration WITHOUT a
    // per-source window sort: equal-width score buckets + prefix
    // counts decide every row's lower-bucket rank map-side, and the
    // exact rank window runs only inside (source, bucket) slices —
    // keys × buckets partitions, never a stratum on one reducer. The
    // oracle's percent_rank window is the single-reducer plan this
    // replaces; values match it exactly (min-rank ties, (r−1)/(n−1)).
    Q(
      "q73_percentile_rank",
      (s, d) => {
        import s.implicits._
        val scored = Tables.documents(s, d)
          .withColumn("__toks", TextAnalysis.tokens($"text"))
          .withColumn("quality",
            TextAnalysis.qualityScoreFromTokens($"text", $"__toks"))
          .select($"doc_id", $"source", $"quality")
        Sampling.percentileRank(scored, $"source", $"quality", "pct_rank")
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, source, $sqlToks AS toks FROM documents),
              |q AS (SELECT doc_id, source, $sqlQuality AS quality FROM t)
              |SELECT doc_id, source, quality,
              |  percent_rank() OVER (PARTITION BY source ORDER BY quality) AS pct_rank
              |FROM q ORDER BY doc_id""".stripMargin)),

    // ---- tokenizer APPLY: greedy longest-match subword segmentation
    // (wordpiece-style) with a fixed piece vocabulary — the native
    // map-side kernel vs the oracle's from-first-principles replay
    // (max-match length per (word, position), then a recursive-CTE
    // greedy walk). Character fallback keeps the encoding total.
    Q(
      "q74_wordpiece_encode",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .withColumn("pieces",
            TextAnalysis.wordpieces($"text", Curation2.wordpieceVocab))
          .select(
            $"doc_id",
            size($"pieces").cast("long").as("n_pieces"),
            concat_ws(" ", $"pieces").as("encoded"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, coalesce($sqlToks, []) AS tk FROM documents),
              |w AS (SELECT DISTINCT unnest(tk) AS word FROM t),
              |v AS (SELECT unnest(${wordpieceVocab.mkString("['", "','", "']")}) AS piece),
              |pos AS (SELECT word, unnest(range(1, strlen(word) + 1)) AS p FROM w),
              |m AS (SELECT pos.word, pos.p, coalesce(
              |    (SELECT max(strlen(piece)) FROM v
              |     WHERE substr(pos.word, pos.p, strlen(piece)) = piece), 1) AS ml
              |  FROM pos),
              |walk AS (
              |  SELECT word, 1 AS p FROM w WHERE strlen(word) > 0
              |  UNION ALL
              |  SELECT walk.word, walk.p + m.ml AS p
              |  FROM walk JOIN m ON walk.word = m.word AND walk.p = m.p
              |  WHERE walk.p + m.ml <= strlen(walk.word)
              |),
              |pieces AS (SELECT walk.word, walk.p, substr(walk.word, walk.p, m.ml) AS piece
              |  FROM walk JOIN m ON walk.word = m.word AND walk.p = m.p),
              |wp AS (SELECT word, list(piece ORDER BY p) AS pl FROM pieces GROUP BY word),
              |dt AS (SELECT doc_id, generate_subscripts(tk, 1) AS ti, unnest(tk) AS word
              |  FROM t),
              |j AS (SELECT dt.doc_id, dt.ti, wp.pl FROM dt JOIN wp USING (word)),
              |agg AS (SELECT doc_id, flatten(list(pl ORDER BY ti)) AS pieces
              |  FROM j GROUP BY doc_id)
              |SELECT t.doc_id, CAST(coalesce(len(a.pieces), 0) AS BIGINT) AS n_pieces,
              |  coalesce(array_to_string(a.pieces, ' '), '') AS encoded
              |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // ---- point-in-interval lookup join: order totals banded into
    // power-of-2 price intervals (exact doubles on every engine). The
    // operator resolves each fact map-side via the codegen'd binary
    // search over the interval literal — zero join, zero shuffle; the
    // oracle is the O(facts × intervals) BETWEEN join it replaces.
    // Bands deliberately start at 1024 so the cheapest orders fall in
    // NO interval (null-label path exercised at oracle scale).
    Q(
      "q75_interval_lookup",
      (s, d) => {
        import s.implicits._
        val bands = (10 to 19).map(k =>
          (math.pow(2.0, k), math.pow(2.0, k + 1), s"band_$k"))
        val dims = s.createDataFrame(bands).toDF("lo", "hi", "band")
        graft.operators.IntervalLookup.lookupInterval(
          Tables.orders(s, d), dims,
          value = $"o_totalprice",
          lo = $"lo", hi = $"hi", label = $"band",
          outCol = "price_band")
          .select($"o_orderkey", $"o_totalprice", $"price_band")
          .orderBy($"o_orderkey")
      },
      Some("""WITH bands AS (
             |  SELECT CAST(pow(2.0, k) AS DOUBLE) AS lo,
             |    CAST(pow(2.0, k + 1) AS DOUBLE) AS hi,
             |    'band_' || CAST(k AS VARCHAR) AS band
             |  FROM (SELECT unnest(range(10, 20)) AS k))
             |SELECT o.o_orderkey, o.o_totalprice, b.band AS price_band
             |FROM orders o LEFT JOIN bands b
             |  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
             |ORDER BY o_orderkey""".stripMargin)),
  )

}

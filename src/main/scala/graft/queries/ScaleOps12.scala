package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 queries: phonetic (Soundex) vocabulary indexing and
  * blocking, the depth-2 FastSS fuzzy join, Monge–Elkan hybrid
  * scoring, Jensen–Shannon corpus drift, the RNG-free paired
  * permutation test, and consistent-hashing ring placement.
  */
object ScaleOps12 {

  /** DuckDB replay of the native tokenizer (the ScaleOps10 idiom —
    * ascii corpus, so the regex and the unicode kernel agree). */
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** The combined token vocabulary both phonetic queries run over:
    * part-name tokens ∪ document tokens, lowercase-alpha only, with
    * corpus frequency. Scale-stable: the vocabulary is bounded by the
    * generators' word lists, not the row count.
    */
  private def vocab(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.part(s, d)
      .select(explode(split($"p_name", " ")).as("tok"))
      .unionByName(Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("tok")))
      .filter($"tok".rlike("^[a-z]+$"))
      .groupBy($"tok").agg(count(lit(1)).as("df"))
  }

  /** Shared oracle CTE chain: the combined vocabulary (`al`), then an
    * exact character-fold replay of Spark's NARA-variant Soundex into
    * CTE `code` = (tok, df, code). The fold state is "acc|last": H/W
    * (digit 7) leave the state untouched, vowels (digit 0) only reset
    * `last`, other digits append when they differ from `last` and the
    * code is still under 4 chars — verified against Spark's builtin on
    * the classic discriminators (ASHCRAFT → A261, TYMCZAK → T522,
    * PFISTER → P236, HASHHASH → H220).
    */
  private val sqlSoundex =
    """ptoks AS (SELECT unnest(string_split(p_name, ' ')) AS tok
      |  FROM part WHERE p_name IS NOT NULL),
      |dtoks AS (SELECT unnest(string_split(text, ' ')) AS tok
      |  FROM documents WHERE text IS NOT NULL),
      |al AS MATERIALIZED (SELECT tok, count(*) AS df FROM (
      |    SELECT tok FROM ptoks UNION ALL SELECT tok FROM dtoks)
      |  WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY 1),
      |dig AS (SELECT tok, df, list_transform(string_split(tok, ''), c ->
      |    CASE WHEN c IN ('a','e','i','o','u','y') THEN '0'
      |         WHEN c IN ('b','f','p','v') THEN '1'
      |         WHEN c IN ('c','g','j','k','q','s','x','z') THEN '2'
      |         WHEN c IN ('d','t') THEN '3'
      |         WHEN c = 'l' THEN '4'
      |         WHEN c IN ('m','n') THEN '5'
      |         WHEN c = 'r' THEN '6'
      |         ELSE '7' END) AS digs
      |  FROM al),
      |code AS MATERIALIZED (SELECT tok, df,
      |    rpad(split_part(list_reduce(
      |      list_prepend(upper(substr(tok, 1, 1)) || '|' || digs[1],
      |                   list_slice(digs, 2, len(digs))),
      |      (s, c) -> CASE WHEN c = '7' THEN s
      |        ELSE concat(
      |          CASE WHEN c <> '0' AND c <> split_part(s, '|', 2)
      |                    AND len(split_part(s, '|', 1)) < 4
      |               THEN split_part(s, '|', 1) || c
      |               ELSE split_part(s, '|', 1) END, '|', c) END),
      |      '|', 1), 4, '0') AS code
      |  FROM dig)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- q363: SOUNDEX VOCABULARY INDEX — every corpus token's NARA
    // Soundex code with its frequency and phonetic-block size. The
    // oracle re-derives the code per token with a character fold
    // (list_reduce state machine), so every vocabulary entry
    // cross-checks Spark's builtin bit-for-bit. Hash-exact.
    Q(
      "q363_soundex_codes",
      (s, d) => {
        import s.implicits._
        val toks = vocab(s, d)
        val coded = toks.withColumn("code", soundex($"tok"))
        val blk = coded.groupBy($"code").agg(count(lit(1)).as("block_n"))
        coded.join(broadcast(blk), Seq("code"))
          .select($"tok", $"code", $"df", $"block_n")
          .orderBy($"tok")
      },
      Some(s"""WITH $sqlSoundex,
              |blk AS (SELECT code, count(*) AS block_n FROM code GROUP BY 1)
              |SELECT tok, code.code, df, block_n
              |FROM code JOIN blk ON code.code = blk.code
              |ORDER BY tok""".stripMargin)),

    // ---- q364: PHONETIC BLOCKING PAIRS — same-sounding token pairs
    // from [[graft.operators.RecordLinkage.phoneticPairs]] (the
    // merge/purge second blocking key): candidates share a Soundex
    // block, never all-pairs, block sizes guarded. Hash-exact.
    Q(
      "q364_phonetic_pairs",
      (s, d) => {
        import s.implicits._
        graft.operators.RecordLinkage.phoneticPairs(
          vocab(s, d), $"tok", $"tok", maxBlockSize = 1000)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH $sqlSoundex,
              |blk AS (SELECT code, count(*) AS block_n FROM code GROUP BY 1)
              |SELECT a.tok AS id_a, b.tok AS id_b, a.code, blk.block_n
              |FROM code a JOIN code b ON a.code = b.code AND a.tok < b.tok
              |JOIN blk ON a.code = blk.code
              |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q365: EXACT fuzzy self-join at edit distance ≤ 2 — the
    // depth-2 FastSS generalization ([[graft.operators.FuzzyJoin
    // .edPairs]]): transpositions and double edits q109's ED≤1 misses.
    // The oracle is the O(n²) brute-force levenshtein join the
    // blocking replaces — hash-equality proves depth-2 blocking
    // complete AND sound (the q109/q25 unblocked-oracle discipline).
    // The mod-7 slice keeps the brute oracle quadratic-in-2k rows,
    // not 15k — the Spark side would handle the full table; the
    // ORACLE is the bottleneck.
    Q(
      "q365_fuzzy_ed2_join",
      (s, d) => {
        import s.implicits._
        graft.operators.FuzzyJoin.edPairs(
          Tables.customer(s, d).filter($"c_custkey" % 7 === 0),
          $"c_custkey", $"c_name", k = 2)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH c AS MATERIALIZED (SELECT c_custkey AS id, c_name AS s
             |  FROM customer WHERE c_custkey % 7 = 0)
             |SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.s, b.s) AS dist
             |FROM c a JOIN c b ON a.id < b.id
             |WHERE levenshtein(a.s, b.s) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q366: MONGE–ELKAN hybrid similarity over blocked part
    // pairs ([[graft.operators.RecordLinkage.mongeElkan]]): per-token
    // best Jaro–Winkler match, averaged — both asymmetric directions.
    // Blocking = (brand, type, size) equality, pair volume
    // ~n²/#blocks. The oracle replays the identical left-to-right
    // token fold with DuckDB's own jaro_winkler_similarity (the q236
    // kernel-parity precedent) and gates both scores at 1e-9 with a
    // poison row.
    Q(
      "q366_monge_elkan",
      (s, d) => {
        import s.implicits._
        val parts = Tables.part(s, d)
          .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size")
          .localCheckpoint(true)
        val g = parts.select($"p_partkey".as("k"), $"p_brand".as("br"),
          $"p_type".as("ct"), $"p_size".as("sz"))
        val prs = g.as("a").join(g.as("b"),
            col("a.br") === col("b.br") && col("a.ct") === col("b.ct") &&
              col("a.sz") === col("b.sz") && col("a.k") < col("b.k"))
          .select(col("a.k").as("id_a"), col("b.k").as("id_b"))
        graft.operators.RecordLinkage.mongeElkan(
          parts, $"p_partkey", $"p_name", prs)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q366_monge_elkan/*.parquet')),
             |lt AS MATERIALIZED (SELECT p_partkey AS id,
             |    list_filter(string_split(p_name, ' '), x -> x <> '') AS t
             |  FROM part),
             |prs AS MATERIALIZED (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
             |  FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
             |    AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey),
             |expect AS MATERIALIZED (SELECT id_a, id_b,
             |    list_reduce(list_transform(ta.t, t ->
             |      list_max(list_transform(tb.t, u -> jaro_winkler_similarity(t, u)))),
             |      (x, y) -> x + y) / len(ta.t) AS me_ab,
             |    list_reduce(list_transform(tb.t, t ->
             |      list_max(list_transform(ta.t, u -> jaro_winkler_similarity(t, u)))),
             |      (x, y) -> x + y) / len(tb.t) AS me_ba
             |  FROM prs JOIN lt ta ON prs.id_a = ta.id JOIN lt tb ON prs.id_b = tb.id),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x
             |      ON e.id_a = x.id_a AND e.id_b = x.id_b
             |      WHERE abs(e.me_ab - x.me_ab) > 1e-9 OR abs(e.me_ba - x.me_ba) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE NOT EXISTS (SELECT 1 FROM expect x
             |        WHERE x.id_a = e.id_a AND x.id_b = e.id_b))
             |  ) AS ok)
             |SELECT id_a, id_b, me_ab, me_ba FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q367: JENSEN–SHANNON DIVERGENCE between the English slice
    // and the rest of the corpus ([[graft.operators.TextAnalysis
    // .jensenShannon]]) — the symmetric, ln(2)-bounded drift metric
    // beside q337's KL. Counts exact; the jsd fold replays in the
    // identical pinned token order, gated at 1e-9 (certificate).
    Q(
      "q367_jensen_shannon",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.jensenShannon(
          Tables.documents(s, d), $"text",
          coalesce($"lang" === "en", lit(false)))
      },
      Some(s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q367_jensen_shannon/*.parquet')),
              |toks AS (SELECT coalesce(lang = 'en', false) AS ina,
              |    unnest($sqlToks) AS tok FROM documents),
              |counts AS (SELECT tok,
              |    sum(CASE WHEN ina THEN 1 ELSE 0 END) AS ca,
              |    sum(CASE WHEN ina THEN 0 ELSE 1 END) AS cb
              |  FROM toks GROUP BY 1),
              |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v FROM counts),
              |folded AS (SELECT na, nb, v,
              |    sum(0.5 * (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
              |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
              |          / ((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)
              |              + CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)) / 2.0))
              |      + 0.5 * (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
              |      * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
              |          / ((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)
              |              + CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)) / 2.0))) OVER wc AS jsd,
              |    row_number() OVER (ORDER BY tok DESC) AS rn
              |  FROM counts CROSS JOIN tot
              |  WINDOW wc AS (ORDER BY tok ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              |x AS (SELECT na AS n_a, nb AS n_b, v AS vocab, jsd FROM folded WHERE rn = 1),
              |flag AS (SELECT (
              |    (SELECT count(*) FROM emitted) = 1
              |    AND NOT EXISTS (SELECT 1 FROM emitted e, x
              |      WHERE e.n_a <> x.n_a OR e.n_b <> x.n_b OR e.vocab <> x.vocab
              |         OR abs(e.jsd - x.jsd) > 1e-9)
              |  ) AS ok)
              |SELECT * FROM emitted WHERE (SELECT ok FROM flag)
              |UNION ALL
              |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
              |  CAST(-999 AS DOUBLE)
              |WHERE NOT (SELECT ok FROM flag)""".stripMargin)),

    // ---- q368: PAIRED PERMUTATION TEST — does purchase value differ
    // from view value within user? ([[graft.operators.Resample
    // .pairedPermutationTest]]): B = 64 deterministic md5 sign flips
    // of each user's exact paired cent difference sample the exact
    // permutation null; every statistic is integer arithmetic and the
    // one division is pinned, so the oracle replays the signs and
    // hash-matches bit-for-bit.
    Q(
      "q368_paired_permutation",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"value".isNotNull &&
            $"event_type".isin("purchase", "view"))
          .select($"user_id",
            $"event_type", round($"value" * 100).cast("long").as("cents"))
        val per = ev.groupBy($"user_id").agg(
          sum(when($"event_type" === "purchase", $"cents").otherwise(0L)).as("pc"),
          sum(when($"event_type" === "view", $"cents").otherwise(0L)).as("vc"),
          max(when($"event_type" === "purchase", 1).otherwise(0)).as("hasp"),
          max(when($"event_type" === "view", 1).otherwise(0)).as("hasv"))
          .filter($"hasp" === 1 && $"hasv" === 1)
          .select($"user_id", ($"pc" - $"vc").as("d"))
        graft.operators.Resample.pairedPermutationTest(
          per, $"user_id", $"d", b = 64)
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events
             |  WHERE user_id IS NOT NULL AND value IS NOT NULL
             |    AND event_type IN ('purchase', 'view')),
             |per AS MATERIALIZED (SELECT user_id,
             |    sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
             |      - sum(CASE WHEN event_type = 'view' THEN cents ELSE 0 END) AS d
             |  FROM ev GROUP BY user_id
             |  HAVING bool_or(event_type = 'purchase') AND bool_or(event_type = 'view')),
             |reps AS (SELECT unnest(range(0, 64)) AS b),
             |t AS MATERIALIZED (SELECT b, sum(CASE
             |      WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)
             |          || ':' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) < 2147483648
             |      THEN d ELSE -d END) AS tb
             |  FROM per CROSS JOIN reps GROUP BY b),
             |obs AS (SELECT count(*) AS n_pairs, sum(d) AS t_obs FROM per),
             |ex AS (SELECT sum(CASE WHEN abs(tb) >= (SELECT abs(t_obs) FROM obs)
             |    THEN 1 ELSE 0 END) AS n_extreme FROM t)
             |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
             |  CAST(t_obs AS BIGINT) AS t_obs,
             |  CAST(64 AS BIGINT) AS b_reps,
             |  CAST(n_extreme AS BIGINT) AS n_extreme,
             |  CAST(n_extreme + 1 AS DOUBLE) / 65.0 AS p_value
             |FROM obs, ex""".stripMargin)),

    // ---- q369: CONSISTENT-HASHING RING RESHARD (Karger et al. 1997)
    // — q359's reshard audit replayed on the ring
    // ([[graft.operators.ConsistentHash]], 8 shards × 16 vnodes,
    // then s3 removed): per shard n_before / n_after / moved_in; only
    // s3's keys move, spreading over its arcs' successors. The oracle
    // re-derives every ring point and successor with DuckDB's own
    // md5. Hash-exact.
    Q(
      "q369_consistent_hash_reshard",
      (s, d) => {
        import s.implicits._
        val shards = (0 until 8).map(i => s"s$i")
        val placed = graft.operators.ConsistentHash.assign(
          graft.operators.ConsistentHash.assign(
            Tables.documents(s, d).select($"doc_id"),
            $"doc_id", shards, 16, "sb"),
          $"doc_id", shards.filterNot(_ == "s3"), 16, "sa")
          .localCheckpoint(true)
        val nb = placed.groupBy($"sb".as("shard"))
          .agg(count(lit(1)).as("n_before"))
        val na = placed.groupBy($"sa".as("shard")).agg(
          count(lit(1)).as("n_after"),
          sum(when($"sb" === "s3", 1L).otherwise(0L)).as("moved_in"))
        nb.join(na, Seq("shard"), "full_outer")
          .select($"shard",
            coalesce($"n_before", lit(0L)).as("n_before"),
            coalesce($"n_after", lit(0L)).as("n_after"),
            coalesce($"moved_in", lit(0L)).as("moved_in"))
          .orderBy($"shard")
      },
      Some("""WITH sh AS (SELECT unnest(['s0','s1','s2','s3','s4','s5','s6','s7']) AS s),
             |vn AS (SELECT unnest(range(0, 16)) AS v),
             |r AS MATERIALIZED (SELECT md5(s || '#' || CAST(v AS VARCHAR)) AS h, s
             |  FROM sh CROSS JOIN vn),
             |k AS MATERIALIZED (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk
             |  FROM documents),
             |ab AS (SELECT k.doc_id,
             |    min(CASE WHEN r.h >= k.hk THEN r.h END) AS m1, min(r.h) AS m0
             |  FROM k CROSS JOIN r GROUP BY 1),
             |pb AS (SELECT ab.doc_id, r.s AS sb
             |  FROM ab JOIN r ON r.h = coalesce(ab.m1, ab.m0)),
             |aa AS (SELECT k.doc_id,
             |    min(CASE WHEN r.h >= k.hk THEN r.h END) AS m1, min(r.h) AS m0
             |  FROM k CROSS JOIN r WHERE r.s <> 's3' GROUP BY 1),
             |pa AS (SELECT aa.doc_id, r.s AS sa
             |  FROM aa JOIN r ON r.h = coalesce(aa.m1, aa.m0)),
             |placed AS (SELECT pb.doc_id, pb.sb, pa.sa FROM pb JOIN pa USING (doc_id)),
             |nb AS (SELECT sb AS shard, count(*) AS n_before FROM placed GROUP BY 1),
             |na AS (SELECT sa AS shard, count(*) AS n_after,
             |    sum(CASE WHEN sb = 's3' THEN 1 ELSE 0 END) AS moved_in
             |  FROM placed GROUP BY 1)
             |SELECT coalesce(nb.shard, na.shard) AS shard,
             |  CAST(coalesce(n_before, 0) AS BIGINT) AS n_before,
             |  CAST(coalesce(n_after, 0) AS BIGINT) AS n_after,
             |  CAST(coalesce(moved_in, 0) AS BIGINT) AS moved_in
             |FROM nb FULL OUTER JOIN na ON nb.shard = na.shard
             |ORDER BY shard""".stripMargin)),

    // ---- q370: IPF / RAKING (Deming & Stephan 1940) — reweight the
    // mod-3 customer sample so its (nation, segment) margins match the
    // FULL table's ([[graft.operators.Raking.rakeWeights]], 4 rounds).
    // The oracle unrolls all 8 scaling steps as MATERIALIZED CTEs
    // replaying the identical (t/m)-then-multiply op order; counts and
    // keys hash-exact, weights gated at 1e-9 with a poison row (the
    // q89 fixed-iteration contract).
    Q(
      "q370_raking_ipf",
      (s, d) => {
        import s.implicits._
        val full = Tables.customer(s, d)
        val sample = full.filter($"c_custkey" % 3 === 0)
          .select($"c_nationkey".cast("string").as("r"), $"c_mktsegment".as("c"))
        val tr = full.groupBy($"c_nationkey".cast("string").as("row_key"))
          .agg(count(lit(1)).as("target"))
        val tc = full.groupBy($"c_mktsegment".as("col_key"))
          .agg(count(lit(1)).as("target"))
        graft.operators.Raking.rakeWeights(
          sample, $"r", $"c", tr, tc, rounds = 4)
          .orderBy($"row_key", $"col_key")
      },
      Some {
        val rounds = (1 to 4).map { k =>
          val prev = if (k == 1) "c0" else s"c${k - 1}"
          s"""mr$k AS (SELECT row_key, sum(w) AS m FROM $prev GROUP BY 1),
             |r$k AS MATERIALIZED (SELECT c.row_key, c.col_key, c.n_sample,
             |    c.w * (tr.t / mr$k.m) AS w
             |  FROM $prev c JOIN mr$k USING (row_key) JOIN tr USING (row_key)),
             |mc$k AS (SELECT col_key, sum(w) AS m FROM r$k GROUP BY 1),
             |c$k AS MATERIALIZED (SELECT c.row_key, c.col_key, c.n_sample,
             |    c.w * (tc.t / mc$k.m) AS w
             |  FROM r$k c JOIN mc$k USING (col_key) JOIN tc USING (col_key))""".stripMargin
        }.mkString(",\n")
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q370_raking_ipf/*.parquet')),
           |c0 AS MATERIALIZED (SELECT CAST(c_nationkey AS VARCHAR) AS row_key,
           |    c_mktsegment AS col_key, count(*) AS n_sample,
           |    CAST(count(*) AS DOUBLE) AS w
           |  FROM customer WHERE c_custkey % 3 = 0 GROUP BY 1, 2),
           |tr AS MATERIALIZED (SELECT CAST(c_nationkey AS VARCHAR) AS row_key,
           |    CAST(count(*) AS DOUBLE) AS t FROM customer GROUP BY 1),
           |tc AS MATERIALIZED (SELECT c_mktsegment AS col_key,
           |    CAST(count(*) AS DOUBLE) AS t FROM customer GROUP BY 1),
           |$rounds,
           |x AS (SELECT row_key, col_key, n_sample, w AS weight FROM c4),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM x)
           |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN x
           |      ON e.row_key = x.row_key AND e.col_key = x.col_key
           |      WHERE e.n_sample <> x.n_sample
           |         OR abs(e.weight - x.weight) > 1e-9 * greatest(abs(x.weight), 1))
           |    AND NOT EXISTS (SELECT 1 FROM emitted e
           |      WHERE NOT EXISTS (SELECT 1 FROM x
           |        WHERE x.row_key = e.row_key AND x.col_key = e.col_key))
           |  ) AS ok)
           |SELECT row_key, col_key, n_sample, weight FROM emitted
           |WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT 'POISON', 'POISON', CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)
           |ORDER BY row_key, col_key""".stripMargin
      }),

    // ---- q371: SINKHORN ENTROPIC OPTIMAL TRANSPORT (Cuturi 2013) —
    // the regularized distribution distance beside q362's exact EMD:
    // BUILDING-segment balance-band histogram vs the rest, ε = 1/2,
    // 10 scaling rounds ([[graft.operators.KsTest.sinkhornDistance]]).
    // The oracle unrolls every round with bin-ordered list_reduce
    // folds replaying the identical op order; counts exact, cost
    // 1e-9 relative (exp is the only libm call), poison row.
    Q(
      "q371_sinkhorn_ot",
      (s, d) => {
        import s.implicits._
        graft.operators.KsTest.sinkhornDistance(
          Tables.customer(s, d),
          expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000"),
          $"c_mktsegment" === "BUILDING",
          epsNum = 1L, epsDen = 2L, rounds = 10)
      },
      Some {
        val kfn = "exp(-CAST(abs(%s - %s) AS DOUBLE) * CAST(2 AS DOUBLE))"
        val rounds = (1 to 10).map { k =>
          s"""u$k AS MATERIALIZED (SELECT h.bin AS bin,
             |    h.a / list_reduce(list(${kfn.format("h.bin", "w.bin")} * w.v
             |      ORDER BY w.bin), (x, y) -> x + y) AS u
             |  FROM h CROSS JOIN v${k - 1} w GROUP BY h.bin, h.a),
             |v$k AS MATERIALIZED (SELECT h2.bin AS bin,
             |    h2.b / list_reduce(list(${kfn.format("u.bin", "h2.bin")} * u.u
             |      ORDER BY u.bin), (x, y) -> x + y) AS v
             |  FROM h h2 CROSS JOIN u$k u GROUP BY h2.bin, h2.b)""".stripMargin
        }.mkString(",\n")
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q371_sinkhorn_ot/*.parquet')),
           |hist AS MATERIALIZED (SELECT
           |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS bin,
           |    sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS ca,
           |    sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END) AS cb
           |  FROM customer GROUP BY 1),
           |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS nbins FROM hist),
           |h AS MATERIALIZED (SELECT bin,
           |    CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS a,
           |    CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS b
           |  FROM hist CROSS JOIN tot),
           |v0 AS (SELECT bin, CAST(1 AS DOUBLE) AS v FROM h),
           |$rounds,
           |cost AS (SELECT list_reduce(list(
           |      u.u * ${kfn.format("u.bin", "v.bin")} * v.v
           |        * CAST(abs(u.bin - v.bin) AS DOUBLE)
           |      ORDER BY u.bin, v.bin), (x, y) -> x + y) AS c
           |  FROM u10 u CROSS JOIN v10 v),
           |x AS (SELECT na AS n_a, nb AS n_b, nbins AS bins, c AS ot_cost
           |  FROM tot CROSS JOIN cost),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = 1
           |    AND NOT EXISTS (SELECT 1 FROM emitted e, x
           |      WHERE e.n_a <> x.n_a OR e.n_b <> x.n_b OR e.bins <> x.bins
           |         OR abs(e.ot_cost - x.ot_cost) > 1e-9 * greatest(abs(x.ot_cost), 1))
           |  ) AS ok)
           |SELECT * FROM emitted WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)""".stripMargin
      }),

    // ---- q372: FLEISS' KAPPA — multi-rater agreement over each
    // user's first four event types (items = users with ≥ 4 events,
    // n = 4 "ratings" each, categories = the five event types;
    // [[graft.operators.Experiment.fleissKappa]]). κ cross-multiplies
    // to an exact rational; every float is one pinned division of two
    // exact integers, the exact numerator/denominator ride along as
    // string digests — hash-exact (DuckDB replays in HUGEINT).
    Q(
      "q372_fleiss_kappa",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull && $"event_type".isNotNull)
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val ranked = ev.select($"user_id", $"event_type",
          row_number().over(w).as("rn"))
        val eligible = ranked.filter($"rn" === 4).select($"user_id")
        val ratings = ranked.filter($"rn" <= 4)
          .join(eligible, Seq("user_id"), "left_semi")
        graft.operators.Experiment.fleissKappa(
          ratings, $"user_id", $"event_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
             |f4 AS MATERIALIZED (SELECT user_id, event_type FROM ev
             |  WHERE rn <= 4 AND user_id IN (SELECT user_id FROM ev WHERE rn = 4)),
             |cells AS (SELECT user_id, event_type, count(*) AS c FROM f4 GROUP BY 1, 2),
             |it AS (SELECT user_id, sum(c) AS ni, sum(c * c) AS si FROM cells GROUP BY 1),
             |top AS (SELECT count(*) AS nn, sum(si) AS sumsi FROM it),
             |cat AS (SELECT sum(tc * tc) AS sumtc2 FROM (
             |    SELECT sum(c) AS tc FROM cells GROUP BY event_type)),
             |k AS (SELECT CAST(nn AS HUGEINT) AS nn,
             |    CAST(sumsi AS HUGEINT) - CAST(nn AS HUGEINT) * 4 AS a,
             |    CAST(nn AS HUGEINT) * 4 * 3 AS b,
             |    (CAST(nn AS HUGEINT) * 4) * (CAST(nn AS HUGEINT) * 4) AS d,
             |    CAST(sumtc2 AS HUGEINT) AS c2
             |  FROM top, cat)
             |SELECT CAST(nn AS BIGINT) AS n_items, CAST(4 AS BIGINT) AS n_ratings,
             |  CAST(a AS DOUBLE) / CAST(b AS DOUBLE) AS p_bar,
             |  CAST(c2 AS DOUBLE) / CAST(d AS DOUBLE) AS p_e,
             |  CASE WHEN b * (d - c2) > 0
             |    THEN CAST(a * d - c2 * b AS DOUBLE) / CAST(b * (d - c2) AS DOUBLE)
             |  END AS kappa,
             |  CAST(a * d - c2 * b AS VARCHAR) AS kappa_num,
             |  CAST(b * (d - c2) AS VARCHAR) AS kappa_den
             |FROM k""".stripMargin)),

    // ---- q373: MAXIMUM MEAN DISCREPANCY (Gretton et al. 2012) — the
    // kernel-mean member completing the drift family (q141 KS
    // sup-gap, q362 Wasserstein integral, q371 Sinkhorn regularized,
    // q367 Jensen–Shannon): AUTOMOBILE-segment balance-band histogram
    // vs the rest, RBF σ = 2 ([[graft.operators.KsTest
    // .mmdTwoSample]]). −1/(2σ²) = −1/8 is exact dyadic in both
    // engines; the oracle replays the three kernel sums as
    // (i,j)-ordered list_reduce folds over the same histogram, counts
    // exact, mmd2 at 1e-9 relative (exp is the only libm call),
    // poison row.
    Q(
      "q373_mmd_two_sample",
      (s, d) => {
        import s.implicits._
        graft.operators.KsTest.mmdTwoSample(
          Tables.customer(s, d),
          expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000"),
          $"c_mktsegment" === "AUTOMOBILE",
          sigmaNum = 2L, sigmaDen = 1L)
      },
      Some {
        val kfn = "exp(CAST((%s - %s) * (%s - %s) AS DOUBLE) * " +
          "(CAST(-1 AS DOUBLE) / CAST(8 AS DOUBLE)))"
        def kf(x: String, y: String) = kfn.format(x, y, x, y)
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q373_mmd_two_sample/*.parquet')),
           |hist AS MATERIALIZED (SELECT
           |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS bin,
           |    sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS ca,
           |    sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 0 ELSE 1 END) AS cb
           |  FROM customer GROUP BY 1),
           |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS nbins FROM hist),
           |h AS MATERIALIZED (SELECT bin,
           |    CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS a,
           |    CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS b
           |  FROM hist CROSS JOIN tot),
           |sums AS (SELECT
           |    list_reduce(list(i.a * j.a * ${kf("i.bin", "j.bin")}
           |      ORDER BY i.bin, j.bin), (x, y) -> x + y) AS saa,
           |    list_reduce(list(i.b * j.b * ${kf("i.bin", "j.bin")}
           |      ORDER BY i.bin, j.bin), (x, y) -> x + y) AS sbb,
           |    list_reduce(list(i.a * j.b * ${kf("i.bin", "j.bin")}
           |      ORDER BY i.bin, j.bin), (x, y) -> x + y) AS sab
           |  FROM h i CROSS JOIN h j),
           |x AS (SELECT na AS n_a, nb AS n_b, nbins AS bins,
           |    saa + sbb - 2 * sab AS mmd2
           |  FROM tot CROSS JOIN sums),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = 1
           |    AND NOT EXISTS (SELECT 1 FROM emitted e, x
           |      WHERE e.n_a <> x.n_a OR e.n_b <> x.n_b OR e.bins <> x.bins
           |         OR abs(e.mmd2 - x.mmd2) > 1e-9 * greatest(abs(x.mmd2), 1))
           |  ) AS ok)
           |SELECT * FROM emitted WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)""".stripMargin
      }))
}

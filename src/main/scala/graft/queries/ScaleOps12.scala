package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 queries: phonetic (Soundex) vocabulary indexing and
  * blocking — the second merge/purge blocking key alongside round-11's
  * sorted-neighborhood ([[graft.operators.RecordLinkage]]).
  */
object ScaleOps12 {

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
              |ORDER BY id_a, id_b""".stripMargin)))
}

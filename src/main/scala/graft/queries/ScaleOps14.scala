package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 queries: the generated-text eval pair BLEU / chrF (clipped
  * n-gram precision with brevity penalty; character-n-gram F-score)
  * and the Zipf rank–frequency corpus-health fit.
  */
object ScaleOps14 {

  /** DuckDB replay of the native tokenizer over the ascii corpus
    * (the ScaleOps10/12/13 idiom). */
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared adjacent-doc pairing for the eval metrics: candidate =
    * doc d, reference = doc d+1 (inner join — the corpus' duplicate
    * templates make a natural mix of near-1 and near-0 scores). */
  private val sqlPairs =
    s"""dt AS MATERIALIZED (SELECT doc_id, $sqlToks AS t, text FROM documents),
       |pr AS MATERIALIZED (SELECT a.doc_id AS pid, a.t AS ct, b.t AS rt,
       |    a.text AS ctext, b.text AS rtext
       |  FROM dt a JOIN dt b ON b.doc_id = a.doc_id + 1)""".stripMargin

  /** Per-n clipped-match CTEs over token lists ct/rt in `pr`:
    * m$n(pid, m) = Σ_g min(count_cand(g), count_ref(g)). */
  private def sqlTokenMatches(n: Int): String =
    s"""cg$n AS (SELECT pid, g, count(*) AS cc FROM (SELECT pid,
       |    unnest([array_to_string(ct[i:i+${n - 1}], ' ')
       |      for i in range(1, len(ct) - ${n - 2})]) AS g FROM pr) GROUP BY 1, 2),
       |rg$n AS (SELECT pid, g, count(*) AS rc FROM (SELECT pid,
       |    unnest([array_to_string(rt[i:i+${n - 1}], ' ')
       |      for i in range(1, len(rt) - ${n - 2})]) AS g FROM pr) GROUP BY 1, 2),
       |mm$n AS (SELECT cg$n.pid, sum(least(cc, rc)) AS m
       |  FROM cg$n JOIN rg$n ON cg$n.pid = rg$n.pid AND cg$n.g = rg$n.g
       |  GROUP BY 1)""".stripMargin

  /** Per-n clipped-match CTEs over stripped char strings cs/rs. */
  private def sqlCharMatches(n: Int): String =
    s"""cg$n AS (SELECT pid, g, count(*) AS cc FROM (SELECT pid,
       |    unnest([substring(cs, i, $n)
       |      for i in range(1, len(cs) - ${n - 2})]) AS g FROM ps) GROUP BY 1, 2),
       |rg$n AS (SELECT pid, g, count(*) AS rc FROM (SELECT pid,
       |    unnest([substring(rs, i, $n)
       |      for i in range(1, len(rs) - ${n - 2})]) AS g FROM ps) GROUP BY 1, 2),
       |mm$n AS (SELECT cg$n.pid, sum(least(cc, rc)) AS m
       |  FROM cg$n JOIN rg$n ON cg$n.pid = rg$n.pid AND cg$n.g = rg$n.g
       |  GROUP BY 1)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- q386: BLEU (Papineni et al. 2002) over adjacent-doc pairs
    // ([[graft.operators.TextAnalysis.bleuScore]]): clipped n-gram
    // precisions n=1..4, brevity penalty, unsmoothed geometric mean —
    // the standard generated-vs-reference gate. Clipped match counts
    // are exact integers (hash-exact); bp/bleu are the only floats
    // (exp/ln), certificate-gated at 1e-9 with a poison row.
    Q(
      "q386_bleu",
      (s, d) => {
        import s.implicits._
        val doc = Tables.documents(s, d)
        val pairs = doc.as("a").join(doc.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.doc_id").as("pid"),
            col("a.text").as("cand"), col("b.text").as("ref"))
        graft.operators.TextAnalysis.bleuScore(
          pairs, $"pid", $"cand", $"ref", maxN = 4)
          .orderBy($"pid")
      },
      Some {
        val matches = (1 to 4).map(sqlTokenMatches).mkString(",\n")
        val anyZero = (1 to 4).map(n =>
          s"coalesce(mm$n.m, 0) = 0 OR greatest(len(ct) - ${n - 1}, 0) = 0")
          .mkString(" OR ")
        val lnSum = (1 to 4).map(n =>
          s"ln(CAST(coalesce(mm$n.m, 0) AS DOUBLE) / " +
            s"CAST(greatest(len(ct) - ${n - 1}, 0) AS DOUBLE))")
          .mkString(" + ")
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q386_bleu/*.parquet')),
           |$sqlPairs,
           |$matches,
           |expect AS MATERIALIZED (SELECT pr.pid,
           |    CAST(len(ct) AS BIGINT) AS c_len, CAST(len(rt) AS BIGINT) AS r_len,
           |    ${(1 to 4).map(n => s"CAST(coalesce(mm$n.m, 0) AS BIGINT) AS m$n").mkString(", ")},
           |    CASE WHEN len(ct) = 0 THEN 0.0
           |      WHEN len(ct) >= len(rt) THEN 1.0
           |      ELSE exp(1.0 - CAST(len(rt) AS DOUBLE) / CAST(len(ct) AS DOUBLE))
           |    END AS bp,
           |    CASE WHEN $anyZero THEN 0.0
           |      ELSE (CASE WHEN len(ct) >= len(rt) THEN 1.0
           |        ELSE exp(1.0 - CAST(len(rt) AS DOUBLE) / CAST(len(ct) AS DOUBLE)) END)
           |        * exp(($lnSum) * 0.25)
           |    END AS bleu
           |  FROM pr
           |  ${(1 to 4).map(n => s"LEFT JOIN mm$n ON pr.pid = mm$n.pid").mkString("\n  ")}),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect)
           |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON e.pid = x.pid
           |      WHERE e.c_len <> x.c_len OR e.r_len <> x.r_len
           |        ${(1 to 4).map(n => s"OR e.m$n <> x.m$n").mkString(" ")}
           |        OR abs(e.bp - x.bp) > 1e-9 OR abs(e.bleu - x.bleu) > 1e-9)
           |    AND NOT EXISTS (SELECT 1 FROM emitted e
           |      WHERE NOT EXISTS (SELECT 1 FROM expect x WHERE x.pid = e.pid))
           |  ) AS ok)
           |SELECT pid, c_len, r_len, m1, m2, m3, m4, bp, bleu FROM emitted
           |WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)
           |ORDER BY pid""".stripMargin
      }),

    // ---- q387: chrF (Popović 2015) over the same adjacent-doc pairs
    // ([[graft.operators.TextAnalysis.chrF]]): character n-grams
    // n=1..6 over whitespace-stripped lowercase prefixes (maxChars =
    // 200, documented cap), recall-weighted F with β = 2. Match
    // counts exact; p/r/chrf certificate-gated at 1e-9.
    Q(
      "q387_chrf",
      (s, d) => {
        import s.implicits._
        val doc = Tables.documents(s, d)
        val pairs = doc.as("a").join(doc.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.doc_id").as("pid"),
            col("a.text").as("cand"), col("b.text").as("ref"))
        graft.operators.TextAnalysis.chrF(
          pairs, $"pid", $"cand", $"ref", maxN = 6, maxChars = 200)
          .orderBy($"pid")
      },
      Some {
        val matches = (1 to 6).map(sqlCharMatches).mkString(",\n")
        def avgOver(len: String) = (1 to 6).map(n =>
          s"(CASE WHEN greatest($len - ${n - 1}, 0) > 0 THEN " +
            s"CAST(coalesce(mm$n.m, 0) AS DOUBLE) / " +
            s"CAST(greatest($len - ${n - 1}, 0) AS DOUBLE) ELSE 0.0 END)")
          .mkString(" + ")
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q387_chrf/*.parquet')),
           |$sqlPairs,
           |ps AS MATERIALIZED (SELECT pid,
           |    substring(regexp_replace(lower(coalesce(ctext, '')), '\\s+', '', 'g'), 1, 200) AS cs,
           |    substring(regexp_replace(lower(coalesce(rtext, '')), '\\s+', '', 'g'), 1, 200) AS rs
           |  FROM pr),
           |$matches,
           |expect AS MATERIALIZED (SELECT ps.pid,
           |    CAST(len(cs) AS BIGINT) AS c_chars, CAST(len(rs) AS BIGINT) AS r_chars,
           |    ${(1 to 6).map(n => s"CAST(coalesce(mm$n.m, 0) AS BIGINT) AS m$n").mkString(", ")},
           |    (${avgOver("len(cs)")}) * (CAST(1 AS DOUBLE) / 6) AS p_avg,
           |    (${avgOver("len(rs)")}) * (CAST(1 AS DOUBLE) / 6) AS r_avg
           |  FROM ps
           |  ${(1 to 6).map(n => s"LEFT JOIN mm$n ON ps.pid = mm$n.pid").mkString("\n  ")}),
           |expect2 AS (SELECT *,
           |    CASE WHEN p_avg + r_avg > 0.0
           |      THEN 5.0 * p_avg * r_avg / (4.0 * p_avg + r_avg)
           |      ELSE 0.0 END AS chrf
           |  FROM expect),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM expect2)
           |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect2 x ON e.pid = x.pid
           |      WHERE e.c_chars <> x.c_chars OR e.r_chars <> x.r_chars
           |        ${(1 to 6).map(n => s"OR e.m$n <> x.m$n").mkString(" ")}
           |        OR abs(e.p_avg - x.p_avg) > 1e-9 OR abs(e.r_avg - x.r_avg) > 1e-9
           |        OR abs(e.chrf - x.chrf) > 1e-9)
           |    AND NOT EXISTS (SELECT 1 FROM emitted e
           |      WHERE NOT EXISTS (SELECT 1 FROM expect2 x WHERE x.pid = e.pid))
           |  ) AS ok)
           |SELECT pid, c_chars, r_chars, m1, m2, m3, m4, m5, m6, p_avg, r_avg, chrf
           |FROM emitted WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)
           |ORDER BY pid""".stripMargin
      }),

    // ---- q388: ZIPF RANK–FREQUENCY FIT over the corpus vocabulary
    // ([[graft.operators.TextAnalysis.zipfFit]]): OLS of ln(freq) on
    // ln(rank) over the top-4096 head (rank = count desc, token asc;
    // TakeOrdered top-K, never a global sort). n_ranks/top_count
    // exact; slope/intercept/r2 replayed by an identically-ordered
    // list_reduce fold, certificate-gated at 1e-9.
    Q(
      "q388_zipf_fit",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.zipfFit(
          Tables.documents(s, d), $"text", topK = 4096)
      },
      Some {
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q388_zipf_fit/*.parquet')),
           |cnt AS MATERIALIZED (SELECT tok, count(*) AS c FROM (
           |    SELECT unnest($sqlToks) AS tok FROM documents) GROUP BY 1),
           |top AS MATERIALIZED (SELECT tok, c,
           |    row_number() OVER (ORDER BY c DESC, tok) AS rnk
           |  FROM cnt ORDER BY c DESC, tok LIMIT 4096),
           |xs AS (SELECT count(*) AS n,
           |    max(CASE WHEN rnk = 1 THEN c END) AS topc,
           |    list([ln(CAST(rnk AS DOUBLE)), ln(CAST(c AS DOUBLE))]
           |      ORDER BY rnk) AS l
           |  FROM top),
           |folded AS (SELECT n, topc,
           |    list_reduce(
           |      list_prepend([0.0, 0.0, 0.0, 0.0, 0.0],
           |        list_transform(l, p ->
           |          [p[1], p[2], p[1] * p[1], p[1] * p[2], p[2] * p[2]])),
           |      (a, b) -> [a[1] + b[1], a[2] + b[2], a[3] + b[3],
           |        a[4] + b[4], a[5] + b[5]]) AS s
           |  FROM xs),
           |expect AS (SELECT
           |    CAST(n AS BIGINT) AS n_ranks, CAST(topc AS BIGINT) AS top_count,
           |    (n * s[4] - s[1] * s[2]) / (n * s[3] - s[1] * s[1]) AS slope,
           |    (s[2] - (n * s[4] - s[1] * s[2]) / (n * s[3] - s[1] * s[1]) * s[1]) / n
           |      AS intercept,
           |    ((n * s[4] - s[1] * s[2]) * (n * s[4] - s[1] * s[2])) /
           |      ((n * s[3] - s[1] * s[1]) * (n * s[5] - s[2] * s[2])) AS r2
           |  FROM folded),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = 1
           |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON true
           |      WHERE e.n_ranks <> x.n_ranks OR e.top_count <> x.top_count
           |        OR abs(e.slope - x.slope) > 1e-9 * greatest(abs(x.slope), 1)
           |        OR abs(e.intercept - x.intercept) > 1e-9 * greatest(abs(x.intercept), 1)
           |        OR abs(e.r2 - x.r2) > 1e-9)
           |  ) AS ok)
           |SELECT n_ranks, top_count, slope, intercept, r2 FROM emitted
           |WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)""".stripMargin
      }),

    // ---- q389: ROUGE-L over the adjacent-doc pairs ([[graft
    // .operators.TextAnalysis.rougeL]]): LCS F-measure via the native
    // graft_lcs DP kernel, sequences capped at 128 tokens (documented,
    // oracle replays the cap). LCS is an exact integer and P/R/F are
    // pinned division chains of exact integers — the oracle replays
    // the identical two-row DP with a recursive CTE + list_reduce row
    // fold, fully hash-exact.
    Q(
      "q389_rouge_l",
      (s, d) => {
        import s.implicits._
        val doc = Tables.documents(s, d)
        val pairs = doc.as("a").join(doc.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.doc_id").as("pid"),
            col("a.text").as("cand"), col("b.text").as("ref"))
        graft.operators.TextAnalysis.rougeL(
          pairs, $"pid", $"cand", $"ref", maxTokens = 128)
          .orderBy($"pid")
      },
      Some {
        s"""WITH RECURSIVE
           |dt AS MATERIALIZED (SELECT doc_id, $sqlToks AS t FROM documents),
           |pr AS MATERIALIZED (SELECT a.doc_id AS pid,
           |    a.t[1:128] AS ct, b.t[1:128] AS rt
           |  FROM dt a JOIN dt b ON b.doc_id = a.doc_id + 1),
           |dp AS (
           |  SELECT pid, ct, rt, 0 AS i,
           |    list_transform(range(0, len(rt) + 1), x -> 0) AS row
           |  FROM pr
           |  UNION ALL
           |  SELECT pid, ct, rt, i + 1,
           |    list_reduce(
           |      list_prepend([0],
           |        list_transform(range(1, len(rt) + 1), j ->
           |          [CASE WHEN ct[i + 1] = rt[j] THEN 1 ELSE 0 END,
           |           row[j] + 1, row[j + 1]])),
           |      (acc, e) -> list_append(acc,
           |        CASE WHEN e[1] = 1 THEN e[2]
           |          ELSE greatest(e[3], acc[len(acc)]) END)) AS row
           |  FROM dp WHERE i < len(ct)),
           |fin AS (SELECT pid, CAST(len(ct) AS BIGINT) AS c_len,
           |    CAST(len(rt) AS BIGINT) AS r_len,
           |    CAST(row[len(rt) + 1] AS BIGINT) AS lcs
           |  FROM dp WHERE i = len(ct))
           |SELECT pid, c_len, r_len, lcs,
           |  CASE WHEN c_len > 0 THEN CAST(lcs AS DOUBLE) / CAST(c_len AS DOUBLE)
           |    ELSE 0.0 END AS p,
           |  CASE WHEN r_len > 0 THEN CAST(lcs AS DOUBLE) / CAST(r_len AS DOUBLE)
           |    ELSE 0.0 END AS r,
           |  CASE WHEN lcs > 0 THEN
           |    2.0 * (CAST(lcs AS DOUBLE) / CAST(c_len AS DOUBLE))
           |      * (CAST(lcs AS DOUBLE) / CAST(r_len AS DOUBLE))
           |      / ((CAST(lcs AS DOUBLE) / CAST(c_len AS DOUBLE))
           |        + (CAST(lcs AS DOUBLE) / CAST(r_len AS DOUBLE)))
           |    ELSE 0.0 END AS f
           |FROM fin ORDER BY pid""".stripMargin
      }))
}

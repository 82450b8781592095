package graft.queries

import org.apache.spark.sql.functions._

/** Round-14b queries: Krippendorff's alpha (the unequal-ratings
  * agreement Fleiss can't express), token-level WER, Cliff's delta
  * ordinal effect size, and the Page–Hinkley running-mean drift
  * detector.
  */
object ScaleOps15 {

  /** DuckDB replay of the native tokenizer over the ascii corpus
    * (the ScaleOps10/12/13/14 idiom). */
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  val all: Seq[Q] = Seq(

    // ---- q390: KRIPPENDORFF'S ALPHA — agreement over each user's
    // first UP-TO-four event types, units with ≥ 2 events kept with
    // their own m_u (exactly the unequal-ratings design Fleiss' q372
    // must exclude; [[graft.operators.Experiment.krippendorffAlpha]]).
    // α cross-multiplies to an exact rational via the fixed
    // lcm(1..15) = 360360 scaling of the per-unit 1/(m_u−1) weights;
    // every float is one pinned division of exact integers and the
    // exact num/den ride as string digests — hash-exact (DuckDB
    // replays in HUGEINT; casts above 2⁵³ route through VARCHAR for
    // the documented correctly-rounded strtod path).
    Q(
      "q390_krippendorff_alpha",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter($"user_id".isNotNull && $"ts".isNotNull && $"event_type".isNotNull)
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val ratings = ev.select($"user_id", $"event_type",
          row_number().over(w).as("rn"))
          .filter($"rn" <= 4)
        graft.operators.Experiment.krippendorffAlpha(
          ratings, $"user_id", $"event_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events
             |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
             |cells AS MATERIALIZED (SELECT user_id, event_type, count(*) AS c
             |  FROM ev WHERE rn <= 4 GROUP BY 1, 2),
             |items AS MATERIALIZED (SELECT user_id, sum(c) AS m, sum(c * c) AS s2
             |  FROM cells GROUP BY 1),
             |elig AS MATERIALIZED (SELECT * FROM items WHERE m >= 2),
             |top AS (SELECT count(*) AS n_items,
             |    CAST(sum(m) AS HUGEINT) AS n,
             |    CAST(sum((360360 // (m - 1)) * (m * m - s2)) AS HUGEINT) AS wl
             |  FROM elig),
             |cat AS (SELECT count(*) AS ncats,
             |    CAST(sum(tc * tc) AS HUGEINT) AS sumtc2
             |  FROM (SELECT sum(c) AS tc FROM cells
             |    WHERE user_id IN (SELECT user_id FROM elig)
             |    GROUP BY event_type)),
             |k AS (SELECT n_items, n, wl, ncats,
             |    n * n - sumtc2 AS spread,
             |    360360 * (n * n - sumtc2) AS den,
             |    360360 * (n * n - sumtc2) - (n - 1) * wl AS num
             |  FROM top, cat)
             |SELECT CAST(n_items AS BIGINT) AS n_units,
             |  CAST(n AS BIGINT) AS n_values,
             |  CAST(ncats AS BIGINT) AS n_categories,
             |  CAST(wl AS DOUBLE) / CAST(360360 * n AS DOUBLE) AS d_o,
             |  CAST(CAST(spread AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(n * (n - 1) AS VARCHAR) AS DOUBLE) AS d_e,
             |  CASE WHEN den > 0 THEN
             |    CAST(CAST(num AS VARCHAR) AS DOUBLE)
             |      / CAST(CAST(den AS VARCHAR) AS DOUBLE) END AS alpha,
             |  CAST(num AS VARCHAR) AS alpha_num,
             |  CAST(den AS VARCHAR) AS alpha_den
             |FROM k""".stripMargin)),

    // ---- q391: WORD ERROR RATE over the adjacent-doc pairs
    // ([[graft.operators.TextAnalysis.wordErrorRate]]): token-level
    // Levenshtein via the native graft_tok_lev DP kernel, sequences
    // capped at 128 tokens (documented, oracle replays the cap). The
    // distance is an exact integer and WER one guarded pinned
    // division — the oracle replays the identical two-row DP with a
    // recursive CTE + list_reduce row fold (q389's geometry with the
    // edit recurrence), fully hash-exact.
    Q(
      "q391_wer",
      (s, d) => {
        import s.implicits._
        val doc = Tables.documents(s, d)
        val pairs = doc.as("a").join(doc.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.doc_id").as("pid"),
            col("a.text").as("hyp"), col("b.text").as("ref"))
        graft.operators.TextAnalysis.wordErrorRate(
          pairs, $"pid", $"hyp", $"ref", maxTokens = 128)
          .orderBy($"pid")
      },
      Some {
        s"""WITH RECURSIVE
           |dt AS MATERIALIZED (SELECT doc_id, $sqlToks AS t FROM documents),
           |pr AS MATERIALIZED (SELECT a.doc_id AS pid,
           |    a.t[1:128] AS ht, b.t[1:128] AS rt
           |  FROM dt a JOIN dt b ON b.doc_id = a.doc_id + 1),
           |dp AS (
           |  SELECT pid, ht, rt, 0 AS i,
           |    list_transform(range(0, len(rt) + 1), x -> x) AS row
           |  FROM pr
           |  UNION ALL
           |  SELECT pid, ht, rt, i + 1,
           |    list_reduce(
           |      list_prepend([i + 1],
           |        list_transform(range(1, len(rt) + 1), j ->
           |          [CASE WHEN ht[i + 1] = rt[j] THEN 0 ELSE 1 END,
           |           row[j], row[j + 1]])),
           |      (acc, e) -> list_append(acc,
           |        least(e[2] + e[1], e[3] + 1, acc[len(acc)] + 1))) AS row
           |  FROM dp WHERE i < len(ht)),
           |fin AS (SELECT pid, CAST(len(ht) AS BIGINT) AS h_len,
           |    CAST(len(rt) AS BIGINT) AS r_len,
           |    CAST(row[len(rt) + 1] AS BIGINT) AS dist
           |  FROM dp WHERE i = len(ht))
           |SELECT pid, h_len, r_len, dist,
           |  CASE WHEN r_len > 0 THEN CAST(dist AS DOUBLE) / CAST(r_len AS DOUBLE)
           |    WHEN dist = 0 THEN 0.0 END AS wer
           |FROM fin ORDER BY pid""".stripMargin
      }),

    // ---- q392: CLIFF'S DELTA per nation — the ordinal effect size of
    // the AUTOMOBILE segment's account balances vs the rest
    // ([[graft.operators.RankStats.cliffsDelta]]): δ and its Romano
    // magnitude band derive from EXACT integers riding the bucketed
    // midrank geometry (no pair ever materializes); the oracle replays
    // doubled midranks as 2·(#less) + c + 1 per distinct-value cell in
    // HUGEINT — hash-exact including the band labels.
    Q(
      "q392_cliffs_delta",
      (s, d) => {
        import s.implicits._
        graft.operators.RankStats.cliffsDelta(
          Tables.customer(s, d),
          $"c_nationkey", $"c_acctbal",
          ($"c_mktsegment" === "AUTOMOBILE").cast("long"))
          .orderBy($"k")
      },
      Some("""WITH cells AS (SELECT c_nationkey AS k, c_acctbal AS v,
             |    count(*) AS c,
             |    sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS p
             |  FROM customer GROUP BY 1, 2),
             |mr AS (SELECT k, v, c, p,
             |    2 * (sum(c) OVER (PARTITION BY k ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS cl2
             |  FROM cells),
             |st AS (SELECT k,
             |    CAST(sum(c) AS HUGEINT) AS n,
             |    CAST(sum(p) AS HUGEINT) AS n1,
             |    CAST(sum(p * (coalesce(cl2, 0) + c + 1)) AS HUGEINT) AS r1x2
             |  FROM mr GROUP BY 1),
             |x AS (SELECT k, n1, n - n1 AS n0,
             |    r1x2 - n1 * (n1 + 1) - n1 * (n - n1) AS num,
             |    n1 * (n - n1) AS den
             |  FROM st)
             |SELECT k, CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
             |  CASE WHEN n1 > 0 AND n0 > 0 THEN
             |    CAST(CAST(num AS VARCHAR) AS DOUBLE)
             |      / CAST(CAST(den AS VARCHAR) AS DOUBLE) END AS delta,
             |  CASE WHEN n1 > 0 AND n0 > 0 THEN CAST(num AS VARCHAR) END AS delta_num,
             |  CASE WHEN n1 > 0 AND n0 > 0 THEN CAST(den AS VARCHAR) END AS delta_den,
             |  CASE WHEN n1 > 0 AND n0 > 0 THEN
             |    CASE WHEN abs(num) * 1000 < den * 147 THEN 'negligible'
             |      WHEN abs(num) * 1000 < den * 330 THEN 'small'
             |      WHEN abs(num) * 1000 < den * 474 THEN 'medium'
             |      ELSE 'large' END END AS magnitude
             |FROM x ORDER BY k""".stripMargin)),

    // ---- q393: PAGE–HINKLEY drift alarms per event type over the
    // daily value series ([[graft.operators.TimeSeries.pageHinkley]],
    // δ = 1, λ = 100): the running-mean changepoint next to q145's
    // retrospective CUSUM. Daily totals and their prefixes are exact
    // decimals, μ̂ is one pinned division per day, and the m_t
    // accumulation is SEQUENTIAL in day order — the oracle folds the
    // identical terms left-to-right per prefix (list_reduce over the
    // calendar-bounded day list, O(days²) per key by design), so
    // alarm day, alarm PH and the peak replay hash-exact.
    Q(
      "q393_page_hinkley",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
        graft.operators.TimeSeries.pageHinkley(
          ev, $"event_type",
          floor(unix_micros($"ts").cast("double") / 86400000000.0).cast("long"),
          $"value", delta = 1.0, lambda = 100.0)
          .orderBy($"k")
      },
      Some("""WITH daily AS (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS p,
             |    sum(CAST(value AS DECIMAL(18,6))) AS x
             |  FROM events
             |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |terms AS (SELECT k, p,
             |    CAST(x AS DOUBLE)
             |      - CAST(sum(x) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)
             |      - 1.0 AS term,
             |    row_number() OVER (PARTITION BY k ORDER BY p) AS t
             |  FROM daily
             |  WINDOW w AS (PARTITION BY k ORDER BY p
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |lst AS (SELECT k, list(term ORDER BY p) AS l FROM terms GROUP BY 1),
             |m AS (SELECT terms.k, p, t,
             |    list_reduce(l[1:t], (a, b) -> a + b) AS m
             |  FROM terms JOIN lst ON terms.k = lst.k),
             |ph AS (SELECT k, p, t,
             |    m - min(m) OVER (PARTITION BY k ORDER BY p
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
             |  FROM m),
             |tot AS (SELECT k, count(*) AS n_periods, max(ph) AS ph_max
             |  FROM ph GROUP BY 1),
             |alarm AS (SELECT k, min(p) AS alarm_period,
             |    min_by(ph, p) AS alarm_ph
             |  FROM ph WHERE ph > 100.0 GROUP BY 1)
             |SELECT tot.k, CAST(n_periods AS BIGINT) AS n_periods, ph_max,
             |  alarm_period, alarm_ph
             |FROM tot LEFT JOIN alarm ON tot.k = alarm.k
             |ORDER BY tot.k""".stripMargin)),

    // ---- q394: HEAPS' LAW FIT — vocabulary growth V(N) ≈ k·N^β over
    // 16 cumulative doc-id checkpoints ([[graft.operators.TextAnalysis
    // .heapsFit]]), the growth companion to q388's Zipf spectrum.
    // Token totals and first-occurrence vocabulary counts are exact
    // integers (two partial-aggregable passes, ≤ 16-row windows); the
    // ln/OLS fold replays via an identically-ordered list_reduce,
    // certificate-gated at 1e-9 with a poison row.
    Q(
      "q394_heaps_fit",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.heapsFit(
          Tables.documents(s, d).filter($"doc_id".isNotNull),
          $"doc_id", $"text", checkpoints = 16)
      },
      Some {
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q394_heaps_fit/*.parquet')),
           |dt AS MATERIALIZED (SELECT doc_id, $sqlToks AS t FROM documents
           |  WHERE doc_id IS NOT NULL),
           |mx AS (SELECT greatest(max(doc_id), 1) AS mid FROM dt),
           |pd AS (SELECT least(greatest((doc_id * 16 + mid - 1) // mid, 1), 16) AS c,
           |    count(*) AS dn, sum(len(t)) AS tn
           |  FROM dt CROSS JOIN mx GROUP BY 1),
           |fd AS (SELECT least(greatest((fdoc * 16 + mid - 1) // mid, 1), 16) AS c,
           |    count(*) AS vn
           |  FROM (SELECT min(doc_id) AS fdoc FROM (
           |      SELECT doc_id, unnest(t) AS tok FROM dt) GROUP BY tok)
           |  CROSS JOIN mx GROUP BY 1),
           |cum AS (SELECT pd.c, dn,
           |    sum(tn) OVER w AS nc, sum(coalesce(vn, 0)) OVER w AS vc
           |  FROM pd LEFT JOIN fd ON pd.c = fd.c
           |  WINDOW w AS (ORDER BY pd.c
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |pts AS (SELECT c, nc, vc FROM cum
           |  WHERE dn > 0 AND nc > 0 AND vc > 0),
           |xs AS (SELECT count(*) AS n, max(nc) AS ntok, max(vc) AS nvoc,
           |    list([ln(CAST(nc AS DOUBLE)), ln(CAST(vc AS DOUBLE))]
           |      ORDER BY c) AS l
           |  FROM pts),
           |folded AS (SELECT n, ntok, nvoc,
           |    list_reduce(
           |      list_prepend([0.0, 0.0, 0.0, 0.0, 0.0],
           |        list_transform(l, p ->
           |          [p[1], p[2], p[1] * p[1], p[1] * p[2], p[2] * p[2]])),
           |      (a, b) -> [a[1] + b[1], a[2] + b[2], a[3] + b[3],
           |        a[4] + b[4], a[5] + b[5]]) AS s
           |  FROM xs),
           |expect AS (SELECT
           |    CAST(n AS BIGINT) AS n_points, CAST(ntok AS BIGINT) AS n_tokens,
           |    CAST(nvoc AS BIGINT) AS n_vocab,
           |    (n * s[4] - s[1] * s[2]) / (n * s[3] - s[1] * s[1]) AS beta,
           |    (s[2] - (n * s[4] - s[1] * s[2]) / (n * s[3] - s[1] * s[1]) * s[1]) / n
           |      AS ln_k,
           |    ((n * s[4] - s[1] * s[2]) * (n * s[4] - s[1] * s[2])) /
           |      ((n * s[3] - s[1] * s[1]) * (n * s[5] - s[2] * s[2])) AS r2
           |  FROM folded),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = 1
           |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x ON true
           |      WHERE e.n_points <> x.n_points OR e.n_tokens <> x.n_tokens
           |        OR e.n_vocab <> x.n_vocab
           |        OR abs(e.beta - x.beta) > 1e-9 * greatest(abs(x.beta), 1)
           |        OR abs(e.ln_k - x.ln_k) > 1e-9 * greatest(abs(x.ln_k), 1)
           |        OR abs(e.r2 - x.r2) > 1e-9)
           |  ) AS ok)
           |SELECT n_points, n_tokens, n_vocab, beta, ln_k, r2 FROM emitted
           |WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)""".stripMargin
      }),

    // ---- q395: DIVERGENCE FRONTIER (MAUVE recipe with a
    // deterministic quantizer) — even-vs-odd vec_id halves of the
    // embedding corpus as P and Q ([[graft.operators.Similarity
    // .divergenceFrontier]], 16 lowest-id anchors, λ = j/8): both
    // frontier arms KL(P∥R_λ) / KL(Q∥R_λ) per λ. Anchor choice and
    // the L2 cell assignment replay bit-for-bit (the q88
    // list_dot_product decomposition discipline); cell counts are
    // exact; the KL folds run in pinned cell order and gate at 1e-9
    // with a poison row.
    Q(
      "q395_divergence_frontier",
      (s, d) => {
        import s.implicits._
        graft.operators.Similarity.divergenceFrontier(
          Tables.embeddings(s, d)
            .filter($"vec_id".isNotNull && size($"embedding") === 64),
          $"vec_id", $"embedding", $"vec_id" % 2 === 0,
          anchors = 16, lambdaDen = 8)
      },
      Some {
        def kl(own: String, otherCnt: String, ownN: String, otherN: String,
            ownLam: String, otherLam: String): String =
          s"""list_reduce(list_prepend(0.0,
             |      list(CASE WHEN $own > 0 THEN
             |          (CAST($own AS DOUBLE) / CAST($ownN AS DOUBLE))
             |          * ln((CAST($own AS DOUBLE) / CAST($ownN AS DOUBLE))
             |            / ($ownLam * (CAST($own AS DOUBLE) / CAST($ownN AS DOUBLE))
             |               + $otherLam * (CAST($otherCnt AS DOUBLE) / CAST($otherN AS DOUBLE))))
             |        ELSE 0.0 END ORDER BY cell)),
             |      (a, b) -> a + b)""".stripMargin
        val lamP = "(CAST(j AS DOUBLE) / 8.0)"
        val lamQ = "(1.0 - CAST(j AS DOUBLE) / 8.0)"
        s"""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q395_divergence_frontier/*.parquet')),
           |e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings WHERE vec_id IS NOT NULL AND len(embedding) = 64),
           |anch AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) AS cid, v
           |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
           |dd AS (SELECT e.vec_id, anch.cid,
           |    list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, anch.v)
           |      + list_dot_product(anch.v, anch.v) AS dist
           |  FROM e CROSS JOIN anch),
           |cells AS MATERIALIZED (SELECT vec_id, cid FROM (
           |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY (CASE WHEN isnan(dist) THEN 1.7976931348623157e308
           |        ELSE dist END) ASC, cid ASC) AS rn
           |    FROM dd) WHERE rn = 1),
           |hist AS MATERIALIZED (SELECT cid AS cell,
           |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS cp,
           |    sum(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END) AS cq
           |  FROM cells GROUP BY 1),
           |tot AS (SELECT sum(cp) AS np, sum(cq) AS nq, count(*) AS ncells
           |  FROM hist),
           |kl AS (SELECT j,
           |    ${kl("cp", "cq", "np", "nq", lamP, lamQ)} AS klp,
           |    ${kl("cq", "cp", "nq", "np", lamQ, lamP)} AS klq
           |  FROM hist CROSS JOIN tot
           |  CROSS JOIN (SELECT unnest(range(1, 8)) AS j)
           |  GROUP BY j, np, nq),
           |expect AS (SELECT CAST(j AS BIGINT) AS lam_num,
           |    CAST(8 AS BIGINT) AS lam_den,
           |    CAST(np AS BIGINT) AS n_p, CAST(nq AS BIGINT) AS n_q,
           |    CAST(ncells AS BIGINT) AS n_cells, klp, klq
           |  FROM kl CROSS JOIN tot),
           |flag AS (SELECT (
           |    (SELECT count(*) FROM emitted) = 7
           |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN expect x
           |      ON e.lam_num = x.lam_num
           |      WHERE e.lam_den <> x.lam_den OR e.n_p <> x.n_p
           |        OR e.n_q <> x.n_q OR e.n_cells <> x.n_cells
           |        OR abs(e.kl_p - x.klp) > 1e-9 * greatest(abs(x.klp), 1)
           |        OR abs(e.kl_q - x.klq) > 1e-9 * greatest(abs(x.klq), 1))
           |    AND NOT EXISTS (SELECT 1 FROM emitted e
           |      WHERE NOT EXISTS (SELECT 1 FROM expect x
           |        WHERE x.lam_num = e.lam_num))
           |  ) AS ok)
           |SELECT lam_num, lam_den, n_p, n_q, n_cells, kl_p, kl_q
           |FROM emitted WHERE (SELECT ok FROM flag)
           |UNION ALL
           |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           |  CAST(-999 AS DOUBLE), CAST(-999 AS DOUBLE)
           |WHERE NOT (SELECT ok FROM flag)
           |ORDER BY lam_num""".stripMargin
      }))
}

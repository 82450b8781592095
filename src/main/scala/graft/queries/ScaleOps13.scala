package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 queries: the two quadratic members completing the
  * two-sample drift family (Cramér–von Mises and 1-D energy
  * distance), the Chao1/Good–Turing vocabulary-coverage audit, and
  * Goodman–Kruskal γ / Somers' D ordinal association.
  */
object ScaleOps13 {

  /** DuckDB replay of the native tokenizer over the ascii corpus
    * (the ScaleOps10/12 idiom). */
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared oracle CTE chain for the merged-support drift pair: the
    * exact per-distinct-value counts over event values in cents split
    * at 2024-01-16 (the q362 frame), inclusive cumulative counts in
    * value order, and side totals. All integers — HUGEINT downstream
    * products stay exact; doubles are produced ONLY via VARCHAR casts
    * (DuckDB's direct HUGEINT→DOUBLE cast is off by an ulp above
    * 2⁶⁴; the string path is correctly rounded, matching the JVM's
    * BigDecimal/BigInteger conversions bit-for-bit).
    */
  private val sqlCdf =
    """base AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    (ts < TIMESTAMP '2024-01-16') AS r
      |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      |pv AS MATERIALIZED (SELECT v,
      |    sum(CASE WHEN r THEN 1 ELSE 0 END) AS c1,
      |    sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS c2
      |  FROM base GROUP BY v),
      |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c2) AS BIGINT) AS n2,
      |    CAST(count(*) AS BIGINT) AS ns FROM pv),
      |cum AS (SELECT v, c1, c2,
      |    sum(c1) OVER w AS cc1, sum(c2) OVER w AS cc2,
      |    lag(v) OVER (ORDER BY v) AS pvv
      |  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW))""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- q374: TWO-SAMPLE CRAMÉR–VON MISES (Anderson 1962) — the
    // rank-weighted quadratic member of the drift family on the q362
    // frame: where q141's KS takes the WORST CDF gap and q362's W₁
    // integrates the gap over the value axis, T sums the SQUARED gap
    // over the pooled sample itself, so it is distribution-free under
    // H₀ and blind to any monotone rescaling. The pooled sum
    // collapses to Σ_v (c1+c2)·(cc1·m − cc2·n)² — exact decimal,
    // hashed as a string — and T is ONE double division of two
    // correctly-rounded exact integers. Fully hash-exact.
    Q(
      "q374_cramer_von_mises",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"value".isNotNull && $"ts".isNotNull)
        graft.operators.KsTest.cramerVonMises(
          ev, round($"value" * 100).cast("long"),
          $"ts" < lit("2024-01-16").cast("timestamp"), buckets = 256)
      },
      Some(s"""WITH $sqlCdf,
             |dd AS (SELECT c1, c2,
             |    CAST(cc1 AS HUGEINT) * (SELECT n2 FROM tot)
             |      - CAST(cc2 AS HUGEINT) * (SELECT n1 FROM tot) AS d
             |  FROM cum),
             |num AS (SELECT coalesce(sum(CAST(c1 + c2 AS HUGEINT) * d * d),
             |    CAST(0 AS HUGEINT)) AS tn FROM dd)
             |SELECT tot.n1 AS n_ref, tot.n2 AS n_cur, tot.ns AS n_support,
             |  CAST(tn AS VARCHAR) AS t_num,
             |  CAST(CAST(tn AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(CAST(tot.n1 AS HUGEINT) * tot.n2
             |        * (tot.n1 + tot.n2) * (tot.n1 + tot.n2) AS VARCHAR) AS DOUBLE) AS t
             |FROM num, tot""".stripMargin)),

    // ---- q375: 1-D ENERGY DISTANCE (Székely & Rizzo 2004) — the
    // value-axis-weighted quadratic: in one dimension
    // E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| reduces exactly to
    // 2·∫(F−G)² dx, so it rides q362's interval decomposition with
    // the gap SQUARED (large displacements dominate quadratically
    // where W₁ weighs them linearly and q374 ignores the axis).
    // Exact decimal numerator, one pinned division, one EXACT
    // power-of-two scaling — hash-exact.
    Q(
      "q375_energy_distance",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"value".isNotNull && $"ts".isNotNull)
        graft.operators.KsTest.energyDistance1D(
          ev, round($"value" * 100).cast("long"),
          $"ts" < lit("2024-01-16").cast("timestamp"), buckets = 256)
      },
      Some(s"""WITH $sqlCdf,
             |dd AS (SELECT v, pvv,
             |    CAST(cc1 - c1 AS HUGEINT) * (SELECT n2 FROM tot)
             |      - CAST(cc2 - c2 AS HUGEINT) * (SELECT n1 FROM tot) AS d
             |  FROM cum),
             |num AS (SELECT coalesce(sum(d * d * CAST(v - pvv AS HUGEINT)),
             |    CAST(0 AS HUGEINT)) AS en
             |  FROM dd WHERE pvv IS NOT NULL)
             |SELECT tot.n1 AS n_ref, tot.n2 AS n_cur, tot.ns AS n_support,
             |  CAST(en AS VARCHAR) AS e_num,
             |  2.0 * (CAST(CAST(en AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(CAST(tot.n1 AS HUGEINT) * tot.n2 * tot.n1 * tot.n2
             |        AS VARCHAR) AS DOUBLE)) AS energy
             |FROM num, tot""".stripMargin)),

    // ---- q376: VOCABULARY COVERAGE — Chao1 richness + Good–Turing
    // unseen mass over the document corpus
    // ([[graft.operators.TextAnalysis.vocabularyCoverage]]): does
    // more crawling buy new vocabulary or re-buy the head? N, S, f1,
    // f2 are exact integers off one token pass; chao1 / p0 / coverage
    // are pinned sequences of correctly-rounded ops on exact
    // operands — hash-exact.
    Q(
      "q376_vocab_coverage",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.vocabularyCoverage(
          Tables.documents(s, d), $"text")
      },
      Some(s"""WITH toks AS (SELECT unnest($sqlToks) AS tok FROM documents),
             |cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
             |sp AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             |    CAST(count(*) AS BIGINT) AS s,
             |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
             |  FROM cnt)
             |SELECT n AS n_tokens, s AS vocab, f1, f2,
             |  CAST(s AS DOUBLE)
             |    + CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
             |  CAST(f1 AS DOUBLE) / CAST(n AS DOUBLE) AS gt_unseen_mass,
             |  1.0 - CAST(f1 AS DOUBLE) / CAST(n AS DOUBLE) AS coverage
             |FROM sp""".stripMargin)),

    // ---- q377: ORDINAL ASSOCIATION — Goodman–Kruskal γ and both
    // Somers' D asymmetries between each event type's daily volume
    // and daily value ([[graft.operators.TimeSeries
    // .ordinalAssociationDaily]]): q252's concordance counts under
    // the three OTHER tie treatments (γ drops ties; D_y|x forgives
    // predictor ties — the 2·AUC−1 companion; D_x|y mirrors). Exact
    // integer C/D/ties over the bounded per-key period pairs; each
    // statistic ONE pinned division — hash-exact.
    Q(
      "q377_ordinal_association",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.ordinalAssociationDaily(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    count(*) AS x,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, count(*) AS n, count(*) * (count(*) - 1) // 2 AS n0
             |  FROM o GROUP BY k),
             |pr AS (SELECT a.k,
             |    CAST(sign(CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS cx,
             |    CAST(sign(CAST(b.y AS DECIMAL(19,6)) - CAST(a.y AS DECIMAL(19,6))) AS BIGINT) AS cy
             |  FROM o a JOIN o b ON a.k = b.k AND a.period < b.period),
             |st AS (SELECT k,
             |    sum(CASE WHEN cx * cy > 0 THEN 1 ELSE 0 END) AS conc,
             |    sum(CASE WHEN cx * cy < 0 THEN 1 ELSE 0 END) AS disc,
             |    sum(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS tx,
             |    sum(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS ty
             |  FROM pr GROUP BY k),
             |j AS (SELECT sp.k, sp.n, sp.n0,
             |    CAST(coalesce(st.conc, 0) AS BIGINT) AS conc,
             |    CAST(coalesce(st.disc, 0) AS BIGINT) AS disc,
             |    CAST(coalesce(st.tx, 0) AS BIGINT) AS tx,
             |    CAST(coalesce(st.ty, 0) AS BIGINT) AS ty
             |  FROM sp LEFT JOIN st ON sp.k = st.k)
             |SELECT k AS key, n AS n_periods,
             |  conc AS concordant, disc AS discordant,
             |  tx AS ties_x, ty AS ties_y,
             |  CASE WHEN CAST(conc + disc AS DOUBLE) > 0
             |    THEN CAST(conc - disc AS DOUBLE) / CAST(conc + disc AS DOUBLE)
             |  END AS gamma,
             |  CASE WHEN CAST(n0 - tx AS DOUBLE) > 0
             |    THEN CAST(conc - disc AS DOUBLE) / CAST(n0 - tx AS DOUBLE)
             |  END AS somers_d_yx,
             |  CASE WHEN CAST(n0 - ty AS DOUBLE) > 0
             |    THEN CAST(conc - disc AS DOUBLE) / CAST(n0 - ty AS DOUBLE)
             |  END AS somers_d_xy
             |FROM j ORDER BY key""".stripMargin)))

  val all2: Seq[Q] = Seq(

    // ---- q378: HOEFFDING'S D — general (non-monotone) dependence
    // between each event type's daily volume and value
    // ([[graft.operators.TimeSeries.hoeffdingsDDaily]]): the test
    // that moves on a U-shaped relation q252's τ-b and q377's γ read
    // as zero. Mid-ranks ×2 and Q ×4 make every Hollander–Wolfe sum
    // an exact ×16-scaled integer (string digest); D is ONE double
    // division of exact integers — hash-exact.
    Q(
      "q378_hoeffding_d",
      (s, d) => {
        import s.implicits._
        graft.operators.TimeSeries.hoeffdingsDDaily(
          Tables.events(s, d),
          $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    count(*) AS x,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS (SELECT k, count(*) AS n FROM o GROUP BY k),
             |pi AS MATERIALIZED (SELECT a.k, a.period,
             |    sum(CASE WHEN b.x < a.x THEN 2 WHEN b.x = a.x THEN 1 ELSE 0 END) + 2 AS r2,
             |    sum(CASE WHEN b.y < a.y THEN 2 WHEN b.y = a.y THEN 1 ELSE 0 END) + 2 AS s2,
             |    sum(CAST(CASE WHEN b.x < a.x THEN 2 WHEN b.x = a.x THEN 1 ELSE 0 END
             |          * CASE WHEN b.y < a.y THEN 2 WHEN b.y = a.y THEN 1 ELSE 0 END
             |        AS BIGINT)) + 4 AS q4
             |  FROM o a JOIN o b ON a.k = b.k AND a.period <> b.period
             |  GROUP BY a.k, a.period),
             |sums AS (SELECT k,
             |    sum(CAST(q4 - 4 AS HUGEINT) * (q4 - 8)) AS d1_16,
             |    sum(CAST(r2 - 2 AS HUGEINT) * (r2 - 4) * (s2 - 2) * (s2 - 4)) AS d2_16,
             |    sum(CAST(r2 - 4 AS HUGEINT) * (s2 - 4) * (q4 - 4)) AS d3_16
             |  FROM pi GROUP BY k),
             |fin AS (SELECT sp.k, sp.n,
             |    CAST(sp.n - 2 AS HUGEINT) * (sp.n - 3) * d1_16
             |      + d2_16 - 2 * CAST(sp.n - 2 AS HUGEINT) * d3_16 AS num16,
             |    CAST(16 AS HUGEINT) * sp.n * (sp.n - 1) * (sp.n - 2)
             |      * (sp.n - 3) * (sp.n - 4) AS den16
             |  FROM sp LEFT JOIN sums ON sp.k = sums.k)
             |SELECT k AS key, n AS n_periods,
             |  CASE WHEN n >= 5 THEN CAST(num16 AS VARCHAR) END AS d_num16,
             |  CASE WHEN n >= 5 THEN
             |    CAST(CAST(30 * num16 AS VARCHAR) AS DOUBLE)
             |      / CAST(CAST(den16 AS VARCHAR) AS DOUBLE)
             |  END AS hoeffding_d
             |FROM fin ORDER BY key""".stripMargin)),

    // ---- q379: TWO-SAMPLE ANDERSON–DARLING (Scholz–Stephens 1987,
    // midrank A²akN) — the tail-weighted member of the drift family
    // on dollar bins of the q362 frame: 1/(H(1−H)) up-weights tail
    // mass shifts that q374's equal-rank weighting dilutes. Exact
    // integer midrank cumulatives; each term one division of
    // correctly-rounded exact operands; the fold replays in pinned
    // bin order (list_reduce on the oracle side) — hash-exact.
    Q(
      "q379_anderson_darling",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"value".isNotNull && $"ts".isNotNull)
        graft.operators.KsTest.andersonDarlingTwoSample(
          ev, floor($"value").cast("long"),
          $"ts" < lit("2024-01-16").cast("timestamp"))
      },
      Some("""WITH base AS (SELECT CAST(floor(value) AS BIGINT) AS v,
             |    (ts < TIMESTAMP '2024-01-16') AS r
             |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
             |h AS MATERIALIZED (SELECT v,
             |    sum(CASE WHEN r THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS c2
             |  FROM base GROUP BY v),
             |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c2) AS BIGINT) AS n2,
             |    CAST(count(*) AS BIGINT) AS nb,
             |    CAST(sum(c1) + sum(c2) AS BIGINT) AS nn FROM h),
             |cum AS (SELECT v, c1, c2, c1 + c2 AS l,
             |    2 * sum(c1 + c2) OVER w - (c1 + c2) AS b2,
             |    2 * sum(c1) OVER w - c1 AS m2a,
             |    2 * sum(c2) OVER w - c2 AS m2b
             |  FROM h WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW)),
             |terms AS (SELECT v,
             |    CAST(CAST(CAST(l AS HUGEINT)
             |        * (CAST(m2a AS HUGEINT) * tot.nn - CAST(b2 AS HUGEINT) * tot.n1)
             |        * (CAST(m2a AS HUGEINT) * tot.nn - CAST(b2 AS HUGEINT) * tot.n1)
             |      AS VARCHAR) AS DOUBLE)
             |      / CAST(b2 * (2 * tot.nn - b2) - tot.nn * l AS DOUBLE) AS ta,
             |    CAST(CAST(CAST(l AS HUGEINT)
             |        * (CAST(m2b AS HUGEINT) * tot.nn - CAST(b2 AS HUGEINT) * tot.n2)
             |        * (CAST(m2b AS HUGEINT) * tot.nn - CAST(b2 AS HUGEINT) * tot.n2)
             |      AS VARCHAR) AS DOUBLE)
             |      / CAST(b2 * (2 * tot.nn - b2) - tot.nn * l AS DOUBLE) AS tb
             |  FROM cum, tot),
             |folded AS (SELECT
             |    list_reduce(list_prepend(0.0, list(ta ORDER BY v)),
             |      (s, t) -> s + t) AS sa,
             |    list_reduce(list_prepend(0.0, list(tb ORDER BY v)),
             |      (s, t) -> s + t) AS sb
             |  FROM terms)
             |SELECT tot.n1 AS n_ref, tot.n2 AS n_cur, tot.nb AS bins,
             |  (sa / CAST(tot.n1 AS DOUBLE) + sb / CAST(tot.n2 AS DOUBLE))
             |    * CAST(tot.nn - 1 AS DOUBLE) / CAST(tot.nn * tot.nn AS DOUBLE) AS a2_akn
             |FROM folded, tot""".stripMargin)),

    // ---- q380: KUIPER'S TWO-SAMPLE TEST — V = D⁺ + D⁻ on the q362
    // cents frame: both directed CDF exceedances, so both tails count
    // equally where q141's KS is median-centric. Exact integer
    // directed suprema (string digests), ONE pinned division —
    // hash-exact.
    Q(
      "q380_kuiper",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"value".isNotNull && $"ts".isNotNull)
        graft.operators.KsTest.kuiperTwoSample(
          ev, round($"value" * 100).cast("long"),
          $"ts" < lit("2024-01-16").cast("timestamp"), buckets = 256)
      },
      Some(s"""WITH $sqlCdf,
             |sup AS (SELECT
             |    greatest(max(CAST(cc1 AS HUGEINT) * (SELECT n2 FROM tot)
             |      - CAST(cc2 AS HUGEINT) * (SELECT n1 FROM tot)),
             |      CAST(0 AS HUGEINT)) AS dp,
             |    greatest(max(CAST(cc2 AS HUGEINT) * (SELECT n1 FROM tot)
             |      - CAST(cc1 AS HUGEINT) * (SELECT n2 FROM tot)),
             |      CAST(0 AS HUGEINT)) AS dm
             |  FROM cum)
             |SELECT tot.n1 AS n_ref, tot.n2 AS n_cur, tot.ns AS n_support,
             |  CAST(dp AS VARCHAR) AS dplus_num,
             |  CAST(dm AS VARCHAR) AS dminus_num,
             |  CAST(CAST(dp + dm AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(CAST(tot.n1 AS HUGEINT) * tot.n2 AS VARCHAR) AS DOUBLE) AS v
             |FROM sup, tot""".stripMargin)),

    // ---- q381: DISTANCE CORRELATION (Székely et al. 2007) — the
    // dependence coefficient that is zero IFF independent, between
    // each event type's daily volume and daily cents total
    // ([[graft.operators.TimeSeries.distanceCorrelationDaily]]).
    // The double-centered distance sums ride as exact ×n⁶ integer
    // digests (the scale cancels in the ratio), and dCor itself is a
    // pinned chain of correctly-rounded IEEE ops (casts, one multiply,
    // two sqrt, one division) — hash-exact including the float.
    Q(
      "q381_distance_correlation",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"value".isNotNull && $"ts".isNotNull)
        graft.operators.TimeSeries.distanceCorrelationDaily(
          ev, $"event_type", $"ts", $"value", periodSeconds = 86400L)
          .orderBy($"key")
      },
      Some("""WITH o AS MATERIALIZED (SELECT event_type AS k,
             |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS period,
             |    count(*) AS x,
             |    sum(CAST(round(value * 100) AS BIGINT)) AS y
             |  FROM events
             |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
             |  GROUP BY 1, 2),
             |sp AS MATERIALIZED (SELECT k, count(*) AS n FROM o GROUP BY k),
             |pr AS MATERIALIZED (SELECT a.k, a.period AS p1, b.period AS p2,
             |    abs(a.x - b.x) AS aij, abs(a.y - b.y) AS bij
             |  FROM o a JOIN o b ON a.k = b.k),
             |rs AS MATERIALIZED (SELECT k, p1,
             |    sum(CAST(aij AS HUGEINT)) AS ra, sum(CAST(bij AS HUGEINT)) AS rb
             |  FROM pr GROUP BY 1, 2),
             |tt AS (SELECT k, sum(ra) AS ta, sum(rb) AS tb FROM rs GROUP BY 1),
             |ctr AS (SELECT pr.k,
             |    CAST(sp.n AS HUGEINT) * sp.n * aij
             |      - CAST(sp.n AS HUGEINT) * ri.ra
             |      - CAST(sp.n AS HUGEINT) * rj.ra + tt.ta AS apj,
             |    CAST(sp.n AS HUGEINT) * sp.n * bij
             |      - CAST(sp.n AS HUGEINT) * ri.rb
             |      - CAST(sp.n AS HUGEINT) * rj.rb + tt.tb AS bpj
             |  FROM pr
             |  JOIN rs ri ON pr.k = ri.k AND pr.p1 = ri.p1
             |  JOIN rs rj ON pr.k = rj.k AND pr.p2 = rj.p1
             |  JOIN tt ON pr.k = tt.k
             |  JOIN sp ON pr.k = sp.k),
             |sm AS (SELECT k, sum(apj * bpj) AS sab,
             |    sum(apj * apj) AS saa, sum(bpj * bpj) AS sbb
             |  FROM ctr GROUP BY k)
             |SELECT sp.k AS key, sp.n AS n_periods,
             |  CAST(sab AS VARCHAR) AS dcov2_num,
             |  CAST(saa AS VARCHAR) AS dvarx_num,
             |  CAST(sbb AS VARCHAR) AS dvary_num,
             |  CASE WHEN saa > 0 AND sbb > 0 THEN
             |    sqrt(CAST(CAST(sab AS VARCHAR) AS DOUBLE)
             |      / sqrt(CAST(CAST(saa AS VARCHAR) AS DOUBLE)
             |           * CAST(CAST(sbb AS VARCHAR) AS DOUBLE)))
             |  END AS dcor
             |FROM sp LEFT JOIN sm ON sp.k = sm.k
             |ORDER BY key""".stripMargin)))

  /** Oracle CTE: tokenized docs with the joined-text char total
    * (token chars + single spaces). */
  private val sqlTl =
    s"""tl AS MATERIALIZED (SELECT doc_id, $sqlToks AS t FROM documents
       |  WHERE text IS NOT NULL),
       |tc AS MATERIALIZED (SELECT doc_id, t,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(t, x -> CAST(len(x) AS BIGINT))), (a, b) -> a + b)
       |      + greatest(len(t) - 1, 0) AS total_chars
       |  FROM tl)""".stripMargin

  val all3: Seq[Q] = Seq(

    // ---- q382: GOPHER TOP-N-GRAM CHARACTER FRACTION (Rae et al.
    // 2021, Table A1) — per doc and n ∈ {2,3,4}, the share of
    // characters claimed by the most repeated word n-gram: the
    // MassiveText quality rule that catches "the best the best the
    // best" degeneracy. Ties break to the lexicographically greatest
    // n-gram (max-struct ≡ ORDER BY c DESC, g DESC). Exact counts,
    // ONE division — hash-exact.
    Q(
      "q382_top_ngram_fraction",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.topNgramCharFraction(
          Tables.documents(s, d).filter($"text".isNotNull),
          $"doc_id", $"text", ns = Seq(2, 3, 4))
          .orderBy($"doc_id", $"n")
      },
      Some {
        val perN = (2 to 4).map { n =>
          s"""o$n AS (SELECT doc_id, total_chars,
             |    array_to_string(list_slice(t, i, i + ${n - 1}), ' ') AS g
             |  FROM tc, unnest(range(1, len(t) - ${n - 2})) AS u(i)),
             |c$n AS (SELECT doc_id, total_chars, g, count(*) AS c
             |  FROM o$n GROUP BY 1, 2, 3),
             |t$n AS (SELECT doc_id, total_chars, g, c,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY c DESC, g DESC) AS rn
             |  FROM c$n)""".stripMargin
        }.mkString(",\n")
        val unions = (2 to 4).map { n =>
          s"""SELECT tc.doc_id, $n AS n, t$n.c AS top_count,
             |  CAST(len(t$n.g) AS BIGINT) AS top_chars,
             |  tc.total_chars,
             |  CAST(t$n.c * len(t$n.g) AS DOUBLE)
             |    / CAST(tc.total_chars AS DOUBLE) AS frac
             |FROM tc LEFT JOIN t$n ON tc.doc_id = t$n.doc_id AND t$n.rn = 1""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"WITH $sqlTl,\n$perN\n$unions\nORDER BY doc_id, n"
      }),

    // ---- q383: GOPHER DUPLICATED-N-GRAM CHARACTER FRACTION (Rae et
    // al. 2021) — per doc and n ∈ {2..10} (the canonical 5–10 plus
    // 2–4, which this corpus actually repeats at gate scale), the share of token
    // characters covered by the UNION of all n-grams occurring more
    // than once: the boilerplate-loop detector the top-1 rule misses.
    // Coverage unions token positions (overlaps count once), weighted
    // by token length; exact integers, ONE division — hash-exact.
    Q(
      "q383_dup_ngram_fraction",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.duplicatedNgramCharFraction(
          Tables.documents(s, d).filter($"text".isNotNull),
          $"doc_id", $"text", ns = (2 to 10))
          .orderBy($"doc_id", $"n")
      },
      Some {
        val perN = (2 to 10).map { n =>
          s"""o$n AS MATERIALIZED (SELECT doc_id, i AS pos,
             |    array_to_string(list_slice(t, i + 1, i + $n), ' ') AS g
             |  FROM tl, unnest(range(0, len(t) - ${n - 1})) AS u(i)),
             |d$n AS (SELECT doc_id, g FROM o$n
             |  GROUP BY doc_id, g HAVING count(*) > 1),
             |v$n AS (SELECT DISTINCT o.doc_id, w.i AS idx
             |  FROM o$n o JOIN d$n USING (doc_id, g),
             |    unnest(range(o.pos, o.pos + $n)) AS w(i)),
             |s$n AS (SELECT v.doc_id, sum(l.l) AS covered
             |  FROM v$n v JOIN lens l ON v.doc_id = l.doc_id AND v.idx = l.idx
             |  GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        val unions = (2 to 10).map { n =>
          s"""SELECT tt.doc_id, $n AS n,
             |  CASE WHEN tt.total > 0
             |    THEN CAST(coalesce(s$n.covered, 0) AS BIGINT) END AS covered_chars,
             |  tt.total AS total_chars,
             |  CASE WHEN tt.total > 0 THEN
             |    CAST(coalesce(s$n.covered, 0) AS DOUBLE) / CAST(tt.total AS DOUBLE)
             |  END AS frac
             |FROM tt LEFT JOIN s$n ON tt.doc_id = s$n.doc_id""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH tl AS MATERIALIZED (SELECT doc_id, $sqlToks AS t FROM documents
           |  WHERE text IS NOT NULL),
           |lens AS MATERIALIZED (SELECT doc_id, i AS idx,
           |    CAST(len(t[i + 1]) AS BIGINT) AS l
           |  FROM tl, unnest(range(0, len(t))) AS u(i)),
           |tt AS MATERIALIZED (SELECT doc_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(t, x -> CAST(len(x) AS BIGINT))), (a, b) -> a + b)
           |      AS total
           |  FROM tl),
           |$perN
           |$unions
           |ORDER BY doc_id, n""".stripMargin
      }))

  val all4: Seq[Q] = Seq(

    // ---- q384: NEIGHBORHOOD FUNCTION via KMV sketches (HyperANF,
    // Boldi–Rosa–Vigna 2011, on the deterministic md5-60bit KMV) —
    // per node, |ball(v, t)| estimates for t ∈ {0,1,2} on the q227
    // supplier–part graph: the O(rounds·E·k) alternative to all-pairs
    // BFS. KMV union IS ball union and every hash is
    // engine-portable, so the oracle replays BOTH rounds of sketch
    // merging exactly: unsaturated balls are EXACT sizes, saturated
    // ones hash-match the k-th minimum (integer digest) and the one
    // pinned estimator division. Fully hash-exact.
    Q(
      "q384_neighborhood_function",
      (s, d) => {
        import s.implicits._
        val e = Tables.lineitem(s, d).select(
          ($"l_suppkey" * 2).as("sa"), ($"l_partkey" * 2 + 1).as("pb"))
        graft.operators.Graph.neighborhoodFunction(
          e, $"sa", $"pb", rounds = 2, k = 32)
          .orderBy($"node", $"t")
      },
      Some {
        val h60 = graft.operators.KmvSketch.hash60Sql("v")
        val est = graft.operators.KmvSketch.estimateSql("hs", 32)
        s"""WITH e0 AS (SELECT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
           |  FROM lineitem),
           |canon AS MATERIALIZED (SELECT DISTINCT least(a, b) AS src,
           |    greatest(a, b) AS dst FROM e0 WHERE a <> b),
           |sym AS MATERIALIZED (SELECT src, dst FROM canon
           |  UNION ALL SELECT dst, src FROM canon),
           |nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym),
           |adj AS MATERIALIZED (SELECT src AS w, dst AS u FROM sym
           |  UNION ALL SELECT v, v FROM nodes),
           |s0 AS MATERIALIZED (SELECT v, [$h60] AS hs FROM nodes),
           |s1 AS MATERIALIZED (SELECT a.w AS v,
           |    list_slice(list_sort(list_distinct(flatten(list(p.hs)))), 1, 32) AS hs
           |  FROM adj a JOIN s0 p ON a.u = p.v GROUP BY a.w),
           |s2 AS MATERIALIZED (SELECT a.w AS v,
           |    list_slice(list_sort(list_distinct(flatten(list(p.hs)))), 1, 32) AS hs
           |  FROM adj a JOIN s1 p ON a.u = p.v GROUP BY a.w),
           |un AS (SELECT v, 0 AS t, hs FROM s0
           |  UNION ALL SELECT v, 1, hs FROM s1
           |  UNION ALL SELECT v, 2, hs FROM s2)
           |SELECT v AS node, t, CAST(len(hs) AS BIGINT) AS n_hashes,
           |  CASE WHEN len(hs) >= 32 THEN hs[32] END AS kth_hash,
           |  $est AS ball_est
           |FROM un ORDER BY node, t""".stripMargin
      }),

    // ---- q385: SIMPLIFIED SILHOUETTE (Hruschka et al. 2004) — the
    // internal clustering-quality audit over the embedding corpus
    // ([[graft.operators.Clustering.simplifiedSilhouette]]): per
    // point, (b−a)/max(a,b) against the content-addressed k=8
    // centroid seeds (q169's convention). Every distance is the
    // replayable dot-product decomposition, sqrt is IEEE-exact, the
    // score a pinned 3-op chain — hash-exact per row.
    Q(
      "q385_silhouette",
      (s, d) => {
        import s.implicits._
        graft.operators.Clustering.simplifiedSilhouette(
          Tables.embeddings(s, d), $"embedding", $"vec_id", k = 8, dim = 64)
          .orderBy($"vec_id")
      },
      Some {
        val h60 = graft.operators.KmvSketch.hash60Sql("vec_id")
        s"""WITH e AS MATERIALIZED (SELECT vec_id,
           |    CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings
           |  WHERE vec_id IS NOT NULL AND len(embedding) = 64
           |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x))) = 0),
           |sd AS MATERIALIZED (SELECT v,
           |    row_number() OVER (ORDER BY $h60, vec_id) AS cid
           |  FROM e QUALIFY cid <= 8),
           |d AS MATERIALIZED (SELECT e.vec_id, sd.cid,
           |    greatest(list_dot_product(e.v, e.v)
           |      - 2.0 * list_dot_product(e.v, sd.v)
           |      + list_dot_product(sd.v, sd.v), 0.0) AS d2
           |  FROM e CROSS JOIN sd),
           |assign AS (SELECT vec_id, cid AS cluster, d2 AS a2 FROM (
           |    SELECT vec_id, cid, d2,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
           |    FROM d) WHERE rn = 1),
           |bb AS (SELECT d.vec_id, min(d.d2) AS b2
           |  FROM d JOIN assign ON d.vec_id = assign.vec_id
           |  WHERE d.cid <> assign.cluster GROUP BY d.vec_id)
           |SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster,
           |  sqrt(a.a2) AS d_own, sqrt(bb.b2) AS d_other,
           |  CASE WHEN greatest(sqrt(a.a2), sqrt(bb.b2)) > 0
           |    THEN (sqrt(bb.b2) - sqrt(a.a2))
           |      / greatest(sqrt(a.a2), sqrt(bb.b2))
           |    ELSE 0.0 END AS silhouette
           |FROM assign a JOIN bb ON a.vec_id = bb.vec_id
           |ORDER BY a.vec_id""".stripMargin
      }))
}

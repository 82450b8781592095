package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B experimentation statistics. Assignment is CONTENT-ADDRESSED —
  * the portable 60-bit md5 hash of the subject key modulo the arm
  * count ([[Sampling]] convention) — so arms are stable across runs,
  * engines, and reprocessing; no RNG, no assignment table to join.
  */
object Experiment {

  /** Two-proportion z-test between hash-assigned arms A (bucket 0)
    * and B (bucket 1): one row
    * (n_a, conv_a, n_b, conv_b, p_a, p_b, z) with the pooled-variance
    * statistic
    *
    *   z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))
    *
    * Every input to the formula is an exact integer count and every
    * operation (divisions, sqrt) is correctly rounded and applied in
    * a pinned order, so the z statistic is bit-reproducible by any
    * engine — no tolerance needed. Degenerate pooled rates (p̂ = 0 or
    * 1, or an empty arm) emit NULL z rather than ±∞.
    *
    * `converted` marks a subject-level success; `df` must already be
    * one row per subject (the caller owns the subject reduction —
    * conversion is a property of the subject, not of event rows).
    */
  def twoProportionZ(
      df: DataFrame,
      subject: Column,
      converted: Column): DataFrame = {
    val base = df
      .filter(subject.isNotNull)
      .select(
        (pmod(KmvSketch.hash60(subject), lit(2)) === 0).as("arm_a"),
        when(converted.cast("boolean").isNull,
          raise_error(lit("twoProportionZ: converted flag must be non-null")))
          .otherwise(converted.cast("boolean")).as("c"))
    val agg = base.agg(
      sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm_a") && col("c"), 1L).otherwise(0L)).as("conv_a"),
      sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("arm_a") && col("c"), 1L).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    agg.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0, pa).as("p_a"),
      when(col("n_b") > 0, pb).as("p_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && pp > 0.0 && pp < 1.0,
        (pa - pb) / se).as("z"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013): the
    * experiment metric is adjusted by its pre-period covariate,
    * ŷᵢ = yᵢ − θ(xᵢ − x̄) with θ = cov(x,y)/var(x) pooled across arms
    * — the industry-standard way to shrink A/B confidence intervals
    * without changing the point estimate's expectation.
    *
    * Exactness discipline: `metric` and `covariate` must be exact
    * integers (pre-scale money to cents — the q112/q114 precedent).
    * All five sufficient statistics (n, Σx, Σy, Σxy, Σx²) accumulate
    * in decimal(38,0) — one partial-aggregable pass, no float sums —
    * then each CASTS ONCE to double (correctly-rounded integer
    * conversions in every engine) and θ and the per-arm adjusted
    * means are pinned chains of double ops, so the output
    * hash-matches a DuckDB oracle with no tolerance.
    *
    * Output: one row per arm value —
    * (arm, n, mean_y, mean_x, theta, adj_mean); theta is the pooled
    * value repeated per row. A constant covariate (var(x) = 0) yields
    * null theta/adj_mean; arms and values must be non-null (raises).
    */
  def cuped(
      df: DataFrame,
      arm: Column,
      metric: Column,
      covariate: Column): DataFrame = {
    def longGuard(c: Column, what: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"cuped: $what must be a non-null integer"))).otherwise(c.cast("long"))
    val base = df.select(
      when(arm.isNull, raise_error(lit("cuped: arm must be non-null")))
        .otherwise(arm).as("arm"),
      longGuard(metric, "metric").as("y"),
      longGuard(covariate, "covariate").as("x"))
    val d19 = "decimal(19,0)"
    def s38(c: Column) = sum(c).cast("decimal(38,0)")
    val perArm = base.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      s38(col("y").cast(d19)).as("sy"),
      s38(col("x").cast(d19)).as("sx"),
      s38(col("x").cast(d19) * col("y").cast(d19)).as("sxy"),
      s38(col("x").cast(d19) * col("x").cast(d19)).as("sxx"))
    val pooled = perArm.agg(
      sum(col("n")).as("gn"),
      s38(col("sy")).as("gsy"), s38(col("sx")).as("gsx"),
      s38(col("sxy")).as("gsxy"), s38(col("sxx")).as("gsxx"))
    def dbl(name: String) = col(name).cast("double")
    val thetaNum = dbl("gn") * dbl("gsxy") - dbl("gsx") * dbl("gsy")
    val thetaDen = dbl("gn") * dbl("gsxx") - dbl("gsx") * dbl("gsx")
    val withTheta = pooled.select(
      when(thetaDen > 0.0, thetaNum / thetaDen)
        .otherwise(lit(null).cast("double")).as("theta"),
      (dbl("gsx") / dbl("gn")).as("gmx"))
    val meanY = dbl("sy") / dbl("n")
    val meanX = dbl("sx") / dbl("n")
    perArm.crossJoin(broadcast(withTheta)).select(
      col("arm"), col("n"),
      meanY.as("mean_y"),
      meanX.as("mean_x"),
      col("theta"),
      (meanY - col("theta") * (meanX - col("gmx"))).as("adj_mean"))
  }

  /** DIFFERENCE-IN-DIFFERENCES — the 2×2 natural-experiment
    * estimator: did = (m̄_treated,post − m̄_treated,pre) −
    * (m̄_control,post − m̄_control,pre). Each cell mean is one double
    * division of exact integer sums (outcome must be an exact
    * integer, cents-scaled), so the estimate is pinned-order double
    * arithmetic — hash-exact. Output: one row
    * (n00, n01, n10, n11, m00, m01, m10, m11, did) with cell ij =
    * (treated=i, post=j); any empty cell nulls `did` (the contrast is
    * undefined, not zero).
    */
  def diffInDiff(
      df: DataFrame,
      treated: Column,
      post: Column,
      outcome: Column): DataFrame = {
    def flag(c: Column, what: String): Column =
      when(c.cast("boolean").isNull, raise_error(lit(
        s"diffInDiff: $what must be a non-null boolean")))
        .otherwise(c.cast("boolean"))
    val base = df.select(
      flag(treated, "treated").as("tr"), flag(post, "post").as("po"),
      when(outcome.cast("long").isNull, raise_error(lit(
        "diffInDiff: outcome must be a non-null integer")))
        .otherwise(outcome.cast("long")).as("y"))
    def cellN(t: Boolean, p: Boolean) =
      sum(when(col("tr") === t && col("po") === p, 1L).otherwise(0L))
    def cellS(t: Boolean, p: Boolean) =
      sum(when(col("tr") === t && col("po") === p, col("y").cast("decimal(19,0)"))
        .otherwise(lit(0L).cast("decimal(19,0)"))).cast("decimal(38,0)")
    val agg = base.agg(
      cellN(false, false).as("n00"), cellN(false, true).as("n01"),
      cellN(true, false).as("n10"), cellN(true, true).as("n11"),
      cellS(false, false).as("s00"), cellS(false, true).as("s01"),
      cellS(true, false).as("s10"), cellS(true, true).as("s11"))
    def m(ij: String) = col(s"s$ij").cast("double") / col(s"n$ij").cast("double")
    agg.select(
      col("n00"), col("n01"), col("n10"), col("n11"),
      when(col("n00") > 0, m("00")).as("m00"),
      when(col("n01") > 0, m("01")).as("m01"),
      when(col("n10") > 0, m("10")).as("m10"),
      when(col("n11") > 0, m("11")).as("m11"),
      when(col("n00") > 0 && col("n01") > 0 && col("n10") > 0 && col("n11") > 0,
        (m("11") - m("10")) - (m("01") - m("00"))).as("did"))
  }

  /** COHEN'S KAPPA — chance-corrected agreement between two
    * categorical raters (label-quality audits, annotator QA, model
    * vs heuristic consistency): κ = (p_o − p_e)/(1 − p_e) with
    * observed agreement p_o = agree/N and chance agreement
    * p_e = Σ_k row_k·col_k / N². One reduction to the contingency
    * cells, marginals joined per category (full outer — a category
    * one rater never uses contributes 0), products in decimal(38,0);
    * κ is a pinned chain of divisions on exactly-cast statistics —
    * hash-exact. Null ratings raise. Output: one row
    * (n, agree, po, pe, kappa) — kappa null when p_e = 1 (both
    * raters constant; the correction is undefined).
    */
  def cohenKappa(
      df: DataFrame,
      rater1: Column,
      rater2: Column): DataFrame = {
    def guard(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"cohenKappa: $what rating must be non-null")))
        .otherwise(c.cast("string"))
    val cells = df.select(guard(rater1, "first").as("a"),
      guard(rater2, "second").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val totals = cells.agg(
      sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
    val rows = cells.groupBy(col("a")).agg(sum(col("c")).as("ra"))
    val cols = cells.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val pe = rows.join(cols, col("a") === col("b"), "full_outer")
      .agg(sum(coalesce(col("ra"), lit(0L)).cast("decimal(19,0)")
        * coalesce(col("cb"), lit(0L)).cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("pe_num"))
    val nD = col("n").cast("double")
    val po = col("agree").cast("double") / nD
    val peD = col("pe_num").cast("double") / (nD * nD)
    totals.crossJoin(broadcast(pe)).select(
      col("n"), col("agree"),
      po.as("po"), peD.as("pe"),
      when(peD < 1.0, (po - peD) / (lit(1.0) - peD)).as("kappa"))
  }

  /** FLEISS' KAPPA (Fleiss 1971) — chance-corrected agreement for n
    * RATERS per item (the multi-rater generalization beside
    * [[cohenKappa]]'s two): with n_ic = ratings of item i in category
    * c, per-item agreement P_i = (Σ_c n_ic² − n)/(n(n−1)), mean
    * observed agreement P̄ = A/B and chance agreement
    * P_e = Σ_c p_c² = C/D are EXACT integer ratios
    * (A = Σ_i(Σ_c n_ic² − n), B = Nn(n−1), C = Σ_c T_c², D = (Nn)²),
    * so κ = (P̄ − P_e)/(1 − P_e) cross-multiplies to the exact
    * rational (A·D − C·B)/(B·(D − C)) — every emitted float is ONE
    * pinned division of two exact decimals, hash-portable.
    *
    * The label-quality audit for annotation pipelines: every item
    * must carry the SAME number of ratings n ≥ 2 (Fleiss' design —
    * unequal counts raise loudly; subsample to a common n first).
    * One row per RATING in; one partial-aggregable (item, category)
    * reduction; the category and item marginals are
    * cardinality-sized. Items beyond 10⁸ would push the
    * cross-multiplied products past decimal(38) — guarded loudly.
    *
    * Output: one row (n_items, n_ratings, p_bar, p_e, kappa,
    * kappa_num, kappa_den) — kappa null when P_e = 1 (every rating
    * in one category; the statistic is undefined).
    */
  def fleissKappa(
      df: DataFrame,
      item: Column,
      category: Column): DataFrame = {
    def guard(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"fleissKappa: $what must be non-null")))
        .otherwise(c.cast("string"))
    val cells = df.select(guard(item, "item id").as("it"),
      guard(category, "category").as("cat"))
      .groupBy(col("it"), col("cat")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val items = cells.groupBy(col("it")).agg(
      sum(col("c")).as("ni"),
      sum(col("c") * col("c")).as("si"))
    val top = items.agg(
      min(col("ni")).as("nmin"), max(col("ni")).as("nmax"),
      count(lit(1)).as("nItems"),
      sum(col("si").cast("decimal(19,0)")).cast("decimal(38,0)").as("sumSi"))
    val catAgg = cells.groupBy(col("cat")).agg(sum(col("c")).as("tc"))
      .agg(sum(col("tc").cast("decimal(19,0)") * col("tc").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("sumTc2"))
    val joined = top.crossJoin(broadcast(catAgg))
    val n = when(col("nmin") =!= col("nmax"), raise_error(concat(
      lit("fleissKappa: unequal ratings per item ("), col("nmin"),
      lit(" vs "), col("nmax"),
      lit(") — Fleiss' design needs a common n; subsample first"))))
      .when(col("nmin") < 2L, raise_error(lit(
        "fleissKappa: every item needs at least 2 ratings")))
      .otherwise(col("nmax"))
    val nItems = when(col("nItems") === 0L, raise_error(lit(
      "fleissKappa: empty input — agreement over zero items is undefined")))
      .when(col("nItems") > 100000000L, raise_error(lit(
      "fleissKappa: more than 1e8 items would overflow the exact " +
        "decimal(38) kappa arithmetic — sample the items first")))
      .when(col("nmax") > 64L, raise_error(lit(
        "fleissKappa: more than 64 ratings per item overflows the " +
          "exact arithmetic bounds — subsample the raters")))
      .otherwise(col("nItems"))
    val staged = joined.select(
      nItems.cast("decimal(9,0)").as("nn"),
      n.cast("decimal(2,0)").as("n"),
      col("sumSi"), col("sumTc2"))
    val bb = (col("nn") * col("n") * (col("n") - 1)).cast("decimal(12,0)")
    val dd = ((col("nn") * col("n")).cast("decimal(11,0)") *
      (col("nn") * col("n")).cast("decimal(11,0)")).cast("decimal(20,0)")
    val aa = (col("sumSi") - (col("nn") * col("n")).cast("decimal(38,0)"))
      .cast("decimal(12,0)")
    val cc = col("sumTc2").cast("decimal(20,0)")
    val out = staged.select(
      col("nn").cast("long").as("n_items"),
      col("n").cast("long").as("n_ratings"),
      (aa.cast("double") / bb.cast("double")).as("p_bar"),
      (cc.cast("double") / dd.cast("double")).as("p_e"),
      (aa * dd - cc * bb).cast("decimal(38,0)").as("knum"),
      (bb * (dd - cc)).cast("decimal(38,0)").as("kden"))
    out.select(
      col("n_items"), col("n_ratings"), col("p_bar"), col("p_e"),
      when(col("kden") > 0,
        col("knum").cast("double") / col("kden").cast("double")).as("kappa"),
      col("knum").cast("string").as("kappa_num"),
      col("kden").cast("string").as("kappa_den"))
  }

  /** KRIPPENDORFF'S ALPHA (nominal; Krippendorff 1970/2004) — the
    * chance-corrected agreement that [[fleissKappa]] cannot compute:
    * UNEQUAL ratings per unit and missing data are first-class. Units
    * with fewer than 2 ratings are EXCLUDED (Krippendorff's own
    * semantics — they contribute no pairable values), everything else
    * participates with its own m_u.
    *
    * With n_uc = ratings of unit u in category c, m_u = Σ_c n_uc,
    * n = Σ_u m_u (pairable values), and n_c = Σ_u n_uc:
    *
    *   D_o = (1/n) · Σ_u Σ_c n_uc(m_u − n_uc)/(m_u − 1)
    *   D_e = (n² − Σ_c n_c²) / (n(n−1))
    *   α   = 1 − D_o/D_e
    *         = 1 − (n−1)·W / (n² − Σ_c n_c²),   W = Σ_u u_w/(m_u−1)
    *
    * The ONLY non-integer in the algebra is the per-unit 1/(m_u−1)
    * weight. m_u is guarded ≤ 16, so scaling W by the FIXED constant
    * L = lcm(1..15) = 360360 makes WL = Σ_m (L/(m−1))·T_m an exact
    * integer (T_m = Σ_{u: m_u = m} (m² − Σ_c n_uc²) groups the ≤ 15
    * distinct m values — a 15-row fold, never the corpus), and α
    * cross-multiplies to the exact rational
    *
    *   α = [L·(n² − Σn_c²) − (n−1)·WL] / [L·(n² − Σn_c²)]
    *
    * — every emitted float is ONE pinned division of two exact
    * decimals, hash-portable; the exact numerator/denominator ride
    * along as string digests. Bounds (all guarded loudly): units
    * ≤ 10⁸ and m_u ≤ 16 keep the cross-multiplied products under
    * decimal(38) — [(n−1)·WL ≤ (16·10⁸)²·L ≈ 10²⁴].
    *
    * One row per RATING in; one partial-aggregable (unit, category)
    * reduction; unit and category marginals are cardinality-sized.
    * Output: one row (n_units, n_values, n_categories, d_o, d_e,
    * alpha, alpha_num, alpha_den) — alpha null when D_e = 0 (every
    * rating in one category; the statistic is undefined).
    */
  def krippendorffAlpha(
      df: DataFrame,
      unit: Column,
      category: Column): DataFrame = {
    def guard(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"krippendorffAlpha: $what must be non-null")))
        .otherwise(c.cast("string"))
    val L = 360360L // lcm(1..15): m_u - 1 always divides it exactly
    val cells = df.select(guard(unit, "unit id").as("it"),
      guard(category, "category").as("cat"))
      .groupBy(col("it"), col("cat")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val items = cells.groupBy(col("it")).agg(
      sum(col("c")).as("m"),
      sum(col("c") * col("c")).as("s2"))
    // Krippendorff semantics: single-rating units carry no pairable
    // values — dropped, not raised
    val eligible = items.filter(col("m") >= 2L)
    val mG = when(col("m") > 16L, raise_error(lit(
      "krippendorffAlpha: more than 16 ratings on one unit overflows " +
        "the exact lcm-scaled arithmetic — subsample the raters")))
      .otherwise(col("m"))
    // ≤ 15 rows: one per distinct ratings-count m
    val byM = eligible.select(mG.as("m"),
      (col("m") * col("m") - col("s2")).as("u"))
      .groupBy(col("m")).agg(
        count(lit(1)).as("cnt"),
        sum(col("u").cast("decimal(12,0)")).cast("decimal(14,0)").as("tu"))
    val top = byM.agg(
      sum(col("cnt")).as("nItems"),
      sum(col("m").cast("decimal(10,0)") * col("cnt").cast("decimal(10,0)"))
        .cast("decimal(10,0)").as("n"),
      sum((lit(L).cast("decimal(6,0)") / col("m").cast("decimal(6,0)")
        .minus(lit(1))).cast("decimal(6,0)") * col("tu"))
        .cast("decimal(20,0)").as("wl"))
    val catAgg = cells
      .join(eligible.select(col("it")), Seq("it"), "left_semi")
      .groupBy(col("cat")).agg(sum(col("c")).as("tc"))
      .agg(count(lit(1)).as("nCats"),
        sum(col("tc").cast("decimal(10,0)") * col("tc").cast("decimal(10,0)"))
          .cast("decimal(20,0)").as("sumTc2"))
    val joined = top.crossJoin(broadcast(catAgg))
    val nItems = when(col("nItems").isNull || col("nItems") === 0L,
      raise_error(lit(
        "krippendorffAlpha: no unit has 2+ ratings — nothing is pairable")))
      .when(col("nItems") > 100000000L, raise_error(lit(
        "krippendorffAlpha: more than 1e8 units would overflow the exact " +
          "decimal(38) arithmetic — sample the units first")))
      .otherwise(col("nItems"))
    val staged = joined.select(
      nItems.as("n_units"), col("n"), col("wl"), col("nCats"), col("sumTc2"))
    // n² − Σn_c² (exact; 0 iff a single category was ever used)
    val spread = (col("n").cast("decimal(20,0)") * col("n").cast("decimal(20,0)")
      - col("sumTc2")).cast("decimal(21,0)")
    val den = (spread * lit(L).cast("decimal(6,0)")).cast("decimal(27,0)")
    val num = (den - ((col("n") - 1).cast("decimal(10,0)") * col("wl"))
      .cast("decimal(30,0)")).cast("decimal(31,0)")
    staged.select(
      col("n_units"),
      col("n").cast("long").as("n_values"),
      col("nCats").as("n_categories"),
      // D_o = WL / (L·n); D_e = spread / (n(n−1)) — one pinned
      // division of exact decimals each
      (col("wl").cast("double") /
        (lit(L).cast("decimal(6,0)") * col("n")).cast("decimal(16,0)")
          .cast("double")).as("d_o"),
      (spread.cast("double") /
        (col("n").cast("decimal(10,0)") * (col("n") - 1).cast("decimal(10,0)"))
          .cast("decimal(20,0)").cast("double")).as("d_e"),
      when(den > 0, num.cast("double") / den.cast("double")).as("alpha"),
      num.cast("string").as("alpha_num"),
      den.cast("string").as("alpha_den"))
  }

  /** McNEMAR'S TEST — paired binary outcomes (the same subjects
    * before/after an intervention): only the DISCORDANT cells carry
    * information, χ² = (b − c)²/(b + c) with b = 0→1 flips and
    * c = 1→0 flips (df = 1). One partial-aggregable reduction; the
    * statistic is a single pinned double division of exact integer
    * counts — hash-exact. `df` must be one row per subject; both
    * flags non-null (raises). Output: one row
    * (n00, n01, n10, n11, chi2) — chi2 null when b + c = 0 (no
    * discordance, the test is undefined).
    */
  def mcnemar(
      df: DataFrame,
      pre: Column,
      post: Column): DataFrame = {
    def flag(c: Column, what: String): Column =
      when(c.cast("boolean").isNull, raise_error(lit(
        s"mcnemar: $what must be a non-null boolean")))
        .otherwise(c.cast("boolean"))
    val base = df.select(flag(pre, "pre").as("a"), flag(post, "post").as("b"))
    def cell(a: Boolean, b: Boolean) =
      sum(when(col("a") === a && col("b") === b, 1L).otherwise(0L))
    val agg = base.agg(
      cell(a = false, b = false).as("n00"), cell(a = false, b = true).as("n01"),
      cell(a = true, b = false).as("n10"), cell(a = true, b = true).as("n11"))
    val b = col("n01").cast("double")
    val c = col("n10").cast("double")
    agg.select(
      col("n00"), col("n01"), col("n10"), col("n11"),
      when(col("n01") + col("n10") > 0L,
        (b - c) * (b - c) / (b + c))
        .otherwise(lit(null).cast("double")).as("chi2"))
  }

  private val twoP53 = 9007199254740992L // 2^53: exact-double ceiling

  private def exactDbl(c: Column, op: String, what: String): Column =
    when(c > lit(twoP53), raise_error(lit(
      s"$op: $what exceeds 2^53 — double cast would round; " +
        "rescale the value or shrink the key grain"))).otherwise(c)
      .cast("double")

  /** ONE-WAY ANOVA F per key — the parametric K-sample location test
    * (the K-group sibling of [[welchTTest]]'s two arms; Fisher 1925):
    * within each `key`, does mean(`value`) differ across `group`s?
    *
    *   SSB = Σ_g S_g²/n_g − S²/N,   SSW = Σv² − Σ_g S_g²/n_g,
    *   F = (SSB/(K−1)) / (SSW/(N−K)).
    *
    * `value` must be integer-valued (cents/quantities — the caller
    * owns the scaling), so every aggregate (S_g, S, Σv²) is an EXACT
    * decimal. Σ_g S_g²/n_g mixes per-group divisions, so each group
    * contributes one pinned double term and the terms accumulate
    * through a window in group order over the ≤K-row-per-key term
    * table (ordered float accumulation is bit-stable across engines)
    * — F is hash-exact. Decimal→double casts are guarded LOUDLY at
    * 2⁵³ (Σv² is the binding one: |v| ≤ 10³ supports ~9×10⁹ rows per
    * key; rescale coarser to go bigger).
    *
    * `group` must be a non-null integral ordinal. Output per key:
    * (k, n, n_groups, ssb, ssw, f) — f null when K < 2, N ≤ K, or
    * SSW = 0 (all within-group values tied).
    */
  def anovaF(
      df: DataFrame,
      key: Column,
      group: Column,
      value: Column): DataFrame = {
    val gL = group.cast("long")
    val gG = when(gL.isNull, raise_error(lit(
      "anovaF: group must be a non-null integer"))).otherwise(gL)
    val vL = value.cast("long")
    val vG = when(vL.isNull, raise_error(lit(
      "anovaF: value must be a non-null integer"))).otherwise(vL)
    val base = df.select(key.as("k"), gG.as("g"), vG.as("v"))
    val d19 = "decimal(19,0)"
    val perGroup = base.groupBy(col("k"), col("g")).agg(
      count(lit(1)).as("ng"),
      sum(col("v").cast(d19)).cast("decimal(38,0)").as("sg"),
      sum(col("v").cast(d19) * col("v").cast(d19)).cast("decimal(38,0)")
        .as("qg"))
    val sgD = exactDbl(abs(col("sg")), "anovaF", "a group sum")
    val term = sgD * sgD / col("ng").cast("double")
    val wCum = Window.partitionBy(col("k")).orderBy(col("g").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"))
    val folded = perGroup
      .withColumn("t", term)
      .withColumn("tsum", sum(col("t")).over(wCum))
      .withColumn("n", sum(col("ng")).over(wAll))
      .withColumn("s", sum(col("sg")).over(wAll))
      .withColumn("q2", sum(col("qg")).over(wAll))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("g").asc)))
      .withColumn("gcnt", count(lit(1)).over(wAll))
      .filter(col("rn") === col("gcnt"))
    val nD = col("n").cast("double")
    val sD = exactDbl(abs(col("s")), "anovaF", "the grand sum")
    val qD = exactDbl(col("q2"), "anovaF", "the sum of squares")
    val ssb = col("tsum") - sD * sD / nD
    val ssw = qD - col("tsum")
    val kD = col("gcnt").cast("double")
    folded.select(
      col("k"), col("n"), col("gcnt").as("n_groups"),
      ssb.as("ssb"), ssw.as("ssw"),
      when(col("gcnt") >= 2L && col("n") > col("gcnt") && ssw > 0.0,
        (ssb / (kD - lit(1.0))) / (ssw / (nD - kD)))
        .otherwise(lit(null).cast("double")).as("f"))
  }

  /** WILSON SCORE INTERVAL per group (Wilson 1927) — the
    * well-behaved binomial proportion CI (never escapes [0, 1],
    * sane at p̂ ∈ {0, 1} where the Wald interval collapses):
    *
    *   (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).
    *
    * Exact integer counts; the whole interval is one pinned chain of
    * correctly-rounded double ops (√ is IEEE-exact), so it
    * hash-matches — `z` must be passed as the same literal both
    * engines parse to the identical double (1.96 is). Output per
    * group: (g, n, positives, rate, ci_low, ci_high) — null CI for
    * empty groups.
    */
  def wilsonInterval(
      df: DataFrame,
      group: Column,
      positive: Column,
      z: Double = 1.96): DataFrame = {
    require(z > 0.0, s"z must be > 0, got $z")
    val flag = when(positive.cast("boolean").isNull, raise_error(lit(
      "wilsonInterval: positive must be a non-null boolean")))
      .otherwise(positive.cast("boolean"))
    val per = df.select(group.as("g"), flag.cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val nD = col("n").cast("double")
    val pD = col("p").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val centre = pD + z2 / (lit(2.0) * nD)
    val half = lit(z) * sqrt(pD * (lit(1.0) - pD) / nD +
      z2 / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + z2 / nD
    per.select(col("g"), col("n"), col("p").as("positives"),
      when(col("n") > 0L, pD).otherwise(lit(null).cast("double")).as("rate"),
      when(col("n") > 0L, (centre - half) / denom)
        .otherwise(lit(null).cast("double")).as("ci_low"),
      when(col("n") > 0L, (centre + half) / denom)
        .otherwise(lit(null).cast("double")).as("ci_high"))
  }

  /** DIRECTLY STANDARDIZED RATES (the demographer's mix adjustment —
    * Fleiss 1981): each group's positive rate re-weighted to the
    * GLOBAL stratum mix, so groups with different compositions
    * compare on equal footing:
    *
    *   crude_g = P_g/N_g,   std_g = Σ_s (N_s/N) · (p_{g,s}/n_{g,s}).
    *
    * Strata a group never observed contribute nothing; `coverage_w`
    * reports the weight mass actually covered (1 = fully comparable).
    * Exact integer cells; per-stratum terms are pinned doubles folded
    * over the ≤ #strata-row window in stratum order (tiny frame —
    * bit-stable). Output per group: (g, n, positives, crude_rate,
    * std_rate, coverage_w).
    */
  def standardizedRates(
      df: DataFrame,
      group: Column,
      stratum: Column,
      positive: Column): DataFrame = {
    val flag = when(positive.cast("boolean").isNull, raise_error(lit(
      "standardizedRates: positive must be a non-null boolean")))
      .otherwise(positive.cast("boolean"))
    val sG = when(stratum.cast("long").isNull, raise_error(lit(
      "standardizedRates: stratum must be a non-null integer")))
      .otherwise(stratum.cast("long"))
    val base = df.select(group.as("g"), sG.as("s"), flag.cast("long").as("y"))
    val cells = base.groupBy(col("g"), col("s"))
      .agg(count(lit(1)).as("ngs"), sum(col("y")).as("pgs"))
    val mix = base.groupBy(col("s")).agg(count(lit(1)).as("ns"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("nTot"))))
      .select(col("s").as("ms"),
        (col("ns").cast("double") / col("nTot").cast("double")).as("w"))
    val term = col("w") *
      (col("pgs").cast("double") / col("ngs").cast("double"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    cells.join(broadcast(mix), col("s") === col("ms"))
      .withColumn("stdRun", sum(term).over(wCum))
      .withColumn("covRun", sum(col("w")).over(wCum))
      .withColumn("n", sum(col("ngs")).over(wAll))
      .withColumn("p", sum(col("pgs")).over(wAll))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("s").asc)))
      .withColumn("scnt", count(lit(1)).over(wAll))
      .filter(col("rn") === col("scnt"))
      .select(col("g"), col("n"), col("p").as("positives"),
        (col("p").cast("double") / col("n").cast("double")).as("crude_rate"),
        col("stdRun").as("std_rate"),
        col("covRun").as("coverage_w"))
  }

  /** COCHRAN'S Q TEST (Cochran 1950) — the binary repeated-measures
    * omnibus ([[RankStats.friedman]]'s 0/1 sibling, [[mcnemar]]'s
    * K-treatment generalization): with one success flag per
    * (block, treatment) over complete blocks,
    *
    *   Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²)
    *
    * (C_j treatment totals, R_i block totals, T grand total) — every
    * statistic an EXACT decimal, one pinned final division —
    * hash-exact. Blocks missing any treatment are dropped; duplicate
    * cells raise. Output per key: (k, n_blocks, k_treatments, q_num,
    * q_den, q_stat) with the exact integer numerator/denominator as
    * digests; q_stat null when the denominator is 0 (all-constant
    * blocks).
    */
  def cochranQ(
      df: DataFrame,
      key: Column,
      block: Column,
      treatment: Column,
      outcome: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"cochranQ: $name must be a non-null integer"))).otherwise(c.cast("long"))
    val flag = when(outcome.cast("boolean").isNull, raise_error(lit(
      "cochranQ: outcome must be a non-null boolean")))
      .otherwise(outcome.cast("boolean"))
    val base = df.select(key.as("k"), g(block, "block").as("b"),
      g(treatment, "treatment").as("t"), flag.cast("long").as("y"))
    val cells0 = base.groupBy(col("k"), col("b"), col("t"))
      .agg(max(col("y")).as("ym"), count(lit(1)).as("cnt"))
    val cells = cells0.select(col("k"), col("b"), col("t"),
      when(col("cnt") > 1L, raise_error(lit(
        "cochranQ: more than one row per (key, block, treatment)")))
        .otherwise(col("ym")).as("y"))
    val kTreat = cells.groupBy(col("k"))
      .agg(countDistinct(col("t")).as("kk"))
    val perBlock = cells.groupBy(col("k"), col("b"))
      .agg(count(lit(1)).as("bt"), sum(col("y")).as("r"))
    val complete = perBlock.join(kTreat, Seq("k"))
      .filter(col("bt") === col("kk"))
      .select(col("k").as("ck"), col("b").as("cb"), col("r"), col("kk"))
    val kept = cells.join(
      complete.select(col("ck"), col("cb")),
      col("k") === col("ck") && col("b") === col("cb"))
    val d19 = "decimal(19,0)"
    val colTotals = kept.groupBy(col("k"), col("t"))
      .agg(sum(col("y")).as("cj"))
    val byK = colTotals.groupBy(col("k")).agg(
      count(lit(1)).as("ktr"),
      sum(col("cj").cast(d19)).cast("decimal(38,0)").as("tt"),
      sum(col("cj").cast(d19) * col("cj").cast(d19))
        .cast("decimal(38,0)").as("sc2"))
    val rowsK = complete.groupBy(col("ck")).agg(
      count(lit(1)).as("nb"),
      sum(col("r").cast(d19) * col("r").cast(d19))
        .cast("decimal(38,0)").as("sr2"))
    // VALUE guards keep every intermediate under 38 digits (k ≤ 9999,
    // T ≤ 10¹⁵, ΣC² ≤ 10²⁹ ⇒ |qNum| ≤ ~10³⁷), so Spark's silent
    // precision clamp on the TYPE can never bite the value — the
    // friedman width discipline, enforced at runtime instead of by
    // intermediate casts
    val kG = when(col("ktr") > 9999L, raise_error(lit(
      "cochranQ: more than 9999 treatments"))).otherwise(col("ktr"))
    val kD = kG.cast("decimal(4,0)")
    val ttc = when(col("tt") > lit(1000000000000000L).cast("decimal(38,0)"),
      raise_error(lit("cochranQ: the grand total exceeds 10^15")))
      .otherwise(col("tt").cast("decimal(16,0)"))
    val sc2c = when(col("sc2") > lit(BigDecimal("1e29")).cast("decimal(38,0)"),
      raise_error(lit("cochranQ: the squared column-total sum exceeds 10^29")))
      .otherwise(col("sc2").cast("decimal(30,0)"))
    val qNum = ((kD - 1) * (kD * sc2c - ttc * ttc)).cast("decimal(38,0)")
    val qDen = (kD * ttc - col("sr2").cast("decimal(30,0)"))
      .cast("decimal(38,0)")
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"cochranQ: |$what| exceeds 2^53"))).otherwise(c).cast("double")
    byK.join(rowsK, col("k") === col("ck"))
      .select(col("k"), col("nb").as("n_blocks"),
        col("ktr").as("k_treatments"),
        qNum.cast("string").as("q_num"),
        qDen.cast("string").as("q_den"),
        when(qDen > 0, e(qNum, "the Q numerator") / e(qDen, "the Q denominator"))
          .otherwise(lit(null).cast("double")).as("q_stat"))
  }

  /** COVARIATE BALANCE (standardized mean differences) between two
    * hash-assigned arms — the pre-analysis audit every experiment
    * readout should lead with (Austin 2009 flags |SMD| > 0.1 as
    * imbalance): per covariate,
    *
    *   SMD = (m̄₁ − m̄₀) / √((s₁² + s₀²)/2)
    *
    * with the unbiased per-arm variances. One aggregation pass for
    * ALL covariates; each covariate must be integer-valued (caller
    * owns scaling — Σx² stays under 2⁵³, guarded LOUDLY), so means
    * and variances are pinned doubles of exact decimal sums —
    * hash-exact. Output per covariate: (covariate, n_a, n_b, mean_a,
    * mean_b, smd) — smd null when both variances are 0.
    */
  def covariateBalance(
      df: DataFrame,
      armB: Column,
      covariates: Seq[(String, Column)]): DataFrame = {
    require(covariates.nonEmpty, "covariateBalance: need >= 1 covariate")
    val flag = when(armB.cast("boolean").isNull, raise_error(lit(
      "covariateBalance: armB must be a non-null boolean")))
      .otherwise(armB.cast("boolean"))
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"covariateBalance: $name must be a non-null integer")))
        .otherwise(c.cast("long"))
    val base = df.select(
      flag.as("arm") +: covariates.map { case (n, c) => g(c, n).as(n) }: _*)
    val d19 = "decimal(19,0)"
    def s38(c: Column) = sum(c).cast("decimal(38,0)")
    def side(b: Boolean, c: Column) = when(col("arm") === b, c).otherwise(0L)
    val aggs = covariates.flatMap { case (n, _) =>
      Seq(
        s38(side(b = false, col(n)).cast(d19)).as(s"sa_$n"),
        s38((side(b = false, col(n)).cast(d19)
          * side(b = false, col(n)).cast(d19))).as(s"qa_$n"),
        s38(side(b = true, col(n)).cast(d19)).as(s"sb_$n"),
        s38((side(b = true, col(n)).cast(d19)
          * side(b = true, col(n)).cast(d19))).as(s"qb_$n"))
    } ++ Seq(
      sum(when(!col("arm"), 1L).otherwise(0L)).as("na"),
      sum(when(col("arm"), 1L).otherwise(0L)).as("nb"))
    val wide = base.agg(aggs.head, aggs.tail: _*)
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"covariateBalance: |$what| exceeds 2^53 — rescale the covariate")))
        .otherwise(c).cast("double")
    val points = covariates.map { case (n, _) =>
      val naD = col("na").cast("double")
      val nbD = col("nb").cast("double")
      val ma = e(col(s"sa_$n"), s"sa_$n") / naD
      val mb = e(col(s"sb_$n"), s"sb_$n") / nbD
      val va = (naD * e(col(s"qa_$n"), s"qa_$n") -
        e(col(s"sa_$n"), s"sa_$n") * e(col(s"sa_$n"), s"sa_$n")) /
        (naD * (naD - lit(1.0)))
      val vb = (nbD * e(col(s"qb_$n"), s"qb_$n") -
        e(col(s"sb_$n"), s"sb_$n") * e(col(s"sb_$n"), s"sb_$n")) /
        (nbD * (nbD - lit(1.0)))
      val pool = (va + vb) / lit(2.0)
      struct(
        lit(n).as("covariate"),
        col("na").as("n_a"), col("nb").as("n_b"),
        when(col("na") > 0L, ma).otherwise(lit(null).cast("double"))
          .as("mean_a"),
        when(col("nb") > 0L, mb).otherwise(lit(null).cast("double"))
          .as("mean_b"),
        when(col("na") > 1L && col("nb") > 1L && pool > 0.0,
          (mb - ma) / sqrt(pool)).otherwise(lit(null).cast("double"))
          .as("smd"))
    }
    wide.select(explode(array(points: _*)).as("p"))
      .select(col("p.covariate"), col("p.n_a"), col("p.n_b"),
        col("p.mean_a"), col("p.mean_b"), col("p.smd"))
  }

  /** DISPARATE-IMPACT AUDIT (four-fifths rule, EEOC 1978 codification
    * of Griggs): each group's positive-outcome rate against the
    * highest-rate group, flagging ratios below `num`/`den` (defaults
    * 4/5). The reference group is the rate argmax, ties broken by the
    * smaller group label — deterministic in both engines because
    * rates are pinned doubles of exact integers. The FLAG itself
    * never touches a float: p_g/n_g < (num/den)·p_r/n_r is evaluated
    * as den·p_g·n_r < num·p_r·n_g in exact decimals, so boundary
    * cases cannot flap on rounding.
    *
    * Output per group: (g, n, positives, rate, ref_group, ratio,
    * below_threshold) — ratio/flag null when the reference rate is 0
    * (every group at zero).
    */
  def disparateImpact(
      df: DataFrame,
      group: Column,
      positive: Column,
      num: Int = 4,
      den: Int = 5): DataFrame = {
    require(num >= 1 && den > num, s"need 1 <= num < den, got $num/$den")
    val flag = when(positive.cast("boolean").isNull, raise_error(lit(
      "disparateImpact: positive must be a non-null boolean")))
      .otherwise(positive.cast("boolean"))
    val per = df.select(group.as("g"), flag.cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
      .withColumn("rate", col("p").cast("double") / col("n").cast("double"))
    // argmax via TakeOrdered (no single-partition window exchange)
    val ref = per
      .orderBy(col("rate").desc, col("g").asc).limit(1)
      .select(col("g").as("ref_group"), col("p").as("pr"), col("n").as("nr"))
    val d19 = "decimal(19,0)"
    per.crossJoin(broadcast(ref))
      .select(col("g"), col("n"), col("p").as("positives"), col("rate"),
        col("ref_group"),
        when(col("pr") > 0L,
          (col("p").cast("double") * col("nr").cast("double")) /
            (col("pr").cast("double") * col("n").cast("double")))
          .otherwise(lit(null).cast("double")).as("ratio"),
        when(col("pr") > 0L,
          // count×count first (19+19 = exactly 38 digits), then the
          // tiny factor — values stay far under 38 digits for any
          // int64 counts, and a DuckDB oracle mirrors in HUGEINT
          (col("p").cast(d19) * col("nr").cast(d19))
            * lit(den.toLong).cast("decimal(2,0)")
            < (col("pr").cast(d19) * col("n").cast(d19))
              * lit(num.toLong).cast("decimal(2,0)"))
          .otherwise(lit(null).cast("boolean")).as("below_threshold"))
  }

  /** BROWN–FORSYTHE per key — the robust K-sample EQUALITY-OF-SPREAD
    * test (Brown & Forsythe 1974): [[anovaF]] applied to absolute
    * deviations from each group's MEDIAN. Medians come from the
    * two-crossing order-statistic geometry over each (key, group)'s
    * distinct-value cells (windows run over cells, never rows — no
    * per-group sort of the data); the DOUBLED median x_lo + x_hi is
    * integral for integer `value`, so the doubled deviation
    * z = |2v − med2| stays exact and the downstream ANOVA chain is
    * hash-exact. SSB/SSW are reported on the doubled-deviation scale
    * (×4 the raw scale); F is scale-invariant so it needs no
    * adjustment.
    *
    * Same contracts as [[anovaF]]. Output per key:
    * (k, n, n_groups, ssb, ssw, f).
    */
  def brownForsythe(
      df: DataFrame,
      key: Column,
      group: Column,
      value: Column): DataFrame = {
    val gL = group.cast("long")
    val gG = when(gL.isNull, raise_error(lit(
      "brownForsythe: group must be a non-null integer"))).otherwise(gL)
    val vL = value.cast("long")
    val vG = when(vL.isNull, raise_error(lit(
      "brownForsythe: value must be a non-null integer"))).otherwise(vL)
    val base = df.select(key.as("k"), gG.as("g"), vG.as("v"))
    val cells = base.groupBy(col("k"), col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("k"), col("g")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"), col("g"))
    val cum = cells
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("ng", sum(col("c")).over(wAll))
    // median order statistics: ranks ⌊(n+1)/2⌋ and ⌊n/2⌋+1 (equal for
    // odd n); med2 = x_lo + x_hi is the doubled interpolated median.
    // Column `/` is TRUE division (a double) — floor() it back to the
    // integer rank (exact for counts below 2⁵²).
    val klo = floor((col("ng") + 1L) / lit(2L)).cast("long")
    val khi = floor(col("ng") / lit(2L)).cast("long") + lit(1L)
    val med = cum.groupBy(col("k"), col("g")).agg(
      min(when(col("cum") >= klo, col("v"))).as("xlo"),
      min(when(col("cum") >= khi, col("v"))).as("xhi"))
      .select(col("k").as("mk"), col("g").as("mg"),
        (col("xlo") + col("xhi")).as("med2"))
    val dev = base
      .join(med, col("k") === col("mk") && col("g") === col("mg"))
      .select(col("k"), col("g"),
        abs(lit(2L) * col("v") - col("med2")).as("z2"))
    anovaF(dev, col("k"), col("g"), col("z2"))
  }

  /** COCHRAN–ARMITAGE TREND TEST (Cochran 1954, Armitage 1955) — is
    * a binomial rate MONOTONE in an ordered dose score? The dedicated
    * dose-response test (exposure tiers, price rungs, severity
    * grades) that a χ² independence test wastes power on. With group
    * scores s, trials n, successes r, N = Σn, R = Σr:
    *
    *   T' = N·Σsr − R·Σsn  (exact int),
    *   z  = T'·√N / √( R(N−R)·(N·Σs²n − (Σsn)²) ).
    *
    * ONE aggregation pass to five integer sufficient statistics;
    * every float is a correctly-rounded chain from exact ints under
    * 2^53 guards — hash-exact. Scores must be exact integers (the
    * ordinal contract); the exact T'/variance numerators ride out as
    * decimal strings for the audit trail. z is null when the
    * variance numerator is 0 (all one outcome, or one dose level).
    *
    * Output: one row (n, successes, k_doses, t_num, v_num, z).
    */
  def cochranArmitage(
      df: DataFrame,
      dose: Column,
      success: Column): DataFrame = {
    val sG = when(dose.cast("long").isNull, raise_error(lit(
      "cochranArmitage: dose score must be a non-null integer")))
      .otherwise(dose.cast("long"))
    val cG = when(success.cast("boolean").isNull, raise_error(lit(
      "cochranArmitage: success must be a non-null boolean")))
      .otherwise(success.cast("boolean"))
    val d19 = "decimal(19,0)"
    val base = df.select(sG.as("s"), cG.as("c"))
    val agg = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("c"), 1L).otherwise(0L)).as("r"),
      countDistinct(col("s")).as("k"),
      sum(col("s").cast(d19)).cast("decimal(38,0)").as("sn"),
      sum(when(col("c"), col("s")).otherwise(0L).cast(d19))
        .cast("decimal(38,0)").as("sr"),
      // decimal×decimal: a long×long product wraps silently past
      // ±3.04e9 and the wrapped sum can land UNDER the 2^53 guard
      sum(col("s").cast(d19) * col("s").cast(d19))
        .cast("decimal(38,0)").as("ssn"))
    val nD = col("n").cast("decimal(19,0)")
    val rD = col("r").cast("decimal(19,0)")
    val tNum = (nD * col("sr") - rD * col("sn")).cast("decimal(38,0)")
    // variance positivity = BOTH factors positive (no decimal product
    // — a (38,0)×(38,0) would silently reduce scale, the q112 lesson)
    val rq = (rD * (nD - rD)).cast("decimal(38,0)")
    val sq = (nD * col("ssn") - col("sn") * col("sn")).cast("decimal(38,0)")
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"cochranArmitage: |$what| exceeds 2^53 — rescale the scores")))
        .otherwise(c).cast("double")
    agg.select(
      col("n"), col("r").as("successes"), col("k").as("k_doses"),
      tNum.cast("string").as("t_num"),
      sq.cast("string").as("v_num"),
      when(rq > 0 && sq > 0,
        e(tNum, "the trend numerator") * sqrt(col("n").cast("double")) /
          sqrt(e(rq, "R(N-R)") * e(sq, "the score variance numerator")))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** INTRACLASS CORRELATION ICC(1,1) — one-way random-effects
    * reliability (Shrout & Fleiss 1979): how much of the variance in
    * repeated measurements is BETWEEN groups rather than within?
    * The rater-agreement / measurement-repeatability staple. From
    * the one-way ANOVA decomposition with unequal group sizes
    * (k groups, N rows, n₀ = (N − Σn_g²/N)/(k−1)):
    *
    *   ICC = (MSB − MSW) / (MSB + (n₀ − 1)·MSW).
    *
    * Per-group exact integer moments (n, Σx, Σx²) reduce in one
    * partial-aggregable pass; the k-row group table folds through a
    * window in pinned group order (bounded by `maxGroups`, the loud
    * [[Survival]] axis discipline) so every double sum is
    * order-pinned — hash-exact. Output: one row
    * (k, n, ssb, ssw, msb, msw, n0, icc) — icc null when the
    * denominator is 0 (k < 2, N = k, or zero variance).
    */
  def intraclassCorrelation(
      df: DataFrame,
      group: Column,
      value: Column,
      maxGroups: Long = 1000000L): DataFrame = {
    val vG = when(value.cast("long").isNull, raise_error(lit(
      "intraclassCorrelation: value must be a non-null integer")))
      .otherwise(value.cast("long"))
    val gG = when(group.isNull, raise_error(lit(
      "intraclassCorrelation: group must be non-null"))).otherwise(group)
    val d19 = "decimal(19,0)"
    val per = df.select(gG.as("g"), vG.as("v"))
      .groupBy(col("g")).agg(
        count(lit(1)).as("ng"),
        sum(col("v").cast(d19)).cast("decimal(38,0)").as("sx"),
        sum(col("v").cast(d19) * col("v").cast(d19)).cast("decimal(38,0)").as("sxx"))
    val tot = per.agg(
      count(lit(1)).as("k"), sum(col("ng")).as("nn"),
      sum(col("sx")).cast("decimal(38,0)").as("gx"),
      sum(col("sxx")).cast("decimal(38,0)").as("gxx"),
      // group sizes are counts — a long n_g² wraps past 3.04e9 rows
      // per group, so widen like every other product moment
      sum(col("ng").cast("decimal(19,0)") * col("ng").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("sn2"))
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"intraclassCorrelation: |$what| exceeds 2^53 — rescale the value")))
        .otherwise(c).cast("double")
    val wCum = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-group term Sx²/n is one pinned division; the k-row fold is
    // a window in group order (guarded), never data-sized
    val folded = per.crossJoin(broadcast(tot))
      .select(col("g"),
        when(col("k") > maxGroups, raise_error(lit(
          s"intraclassCorrelation: more than $maxGroups groups — the " +
            "group axis must stay bounded"))).otherwise(col("sx")).as("sx"),
        col("ng"), col("sxx"), col("k"), col("nn"), col("gx"), col("gxx"),
        col("sn2"))
      .withColumn("bsum", sum(
        e(col("sx"), "a group's value sum") * e(col("sx"), "a group's value sum")
          / col("ng").cast("double")).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("g").desc)))
      .filter(col("rn") === 1)
    val nD = col("nn").cast("double")
    val kD = col("k").cast("double")
    val grand = e(col("gx"), "the grand sum")
    val ssb = col("bsum") - grand * grand / nD
    val ssw = e(col("gxx"), "the grand square sum") - col("bsum")
    val msb = ssb / (kD - lit(1.0))
    val msw = ssw / (nD - kD)
    val n0 = (nD - e(col("sn2"), "the Σn_g² term") / nD) / (kD - lit(1.0))
    val den = msb + (n0 - lit(1.0)) * msw
    folded.select(
      col("k"), col("nn").as("n"),
      ssb.as("ssb"), ssw.as("ssw"),
      when(col("k") > 1L, msb).as("msb"),
      when(col("nn") > col("k"), msw).as("msw"),
      when(col("k") > 1L, n0).as("n0"),
      when(col("k") > 1L && col("nn") > col("k") && den > 0.0,
        (msb - msw) / den).as("icc"))
  }

  /** ONE-SAMPLE BINOMIAL SPRT MONITOR (Wald 1945) — the sequential
    * test a launch-gating platform runs on a conversion stream: per
    * time period, the cumulative log-likelihood ratio of H1: p = p1
    * against H0: p = p0,
    *
    *   LLR_t = Σ_{u ≤ t} [ c_u·ln(p1/p0) + (n_u − c_u)·ln(q1/q0) ],
    *
    * crossing A = ln((1−β)/α) accepts H1, crossing B = ln(β/(1−α))
    * accepts H0, in between the test CONTINUES — with Wald's
    * guarantee that type-I/II error stay ≤ α/β no matter when you
    * peek (the peeking-safe alternative to repeated z-tests).
    *
    * All rates are EXACT RATIONALS (pNum/pDen, α = aNum/aDen, β =
    * bNum/bDen); counts are exact integers; the per-period terms are
    * integer × ln(constant) and the cumulation is a window sum in
    * pinned period order. ln is libm — oracles gate the float
    * columns at tolerance and re-derive decisions from their own
    * LLR (the certificate pattern). The period axis is bounded by
    * the calendar, guarded by `maxPeriods` (the [[Survival]]
    * duration-axis discipline).
    *
    * Output per period: (period, n, conversions, llr_cum, decision)
    * with decision ∈ 'accept_h1' | 'accept_h0' | 'continue' — the
    * decision at each PEEK POINT (SPRT semantics stop at the first
    * non-continue; downstream rows report what the monitor would
    * show if it kept running).
    */
  def sprtMonitor(
      df: DataFrame,
      ts: Column,
      converted: Column,
      p0Num: Long, p0Den: Long,
      p1Num: Long, p1Den: Long,
      aNum: Long = 1L, aDen: Long = 20L,
      bNum: Long = 1L, bDen: Long = 20L,
      periodSeconds: Long = 86400L,
      maxPeriods: Long = 1000000L): DataFrame = {
    require(p0Num > 0 && p0Num < p0Den, s"p0 must be in (0,1), got $p0Num/$p0Den")
    require(p1Num > 0 && p1Num < p1Den, s"p1 must be in (0,1), got $p1Num/$p1Den")
    require(p0Num * p1Den != p1Num * p0Den, "p0 and p1 must differ")
    require(aNum > 0 && aNum < aDen && bNum > 0 && bNum < bDen,
      "alpha and beta must be in (0,1)")
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val cG = when(converted.cast("boolean").isNull, raise_error(lit(
      "sprtMonitor: converted must be a non-null boolean")))
      .otherwise(converted.cast("boolean"))
    val p = periodSeconds * 1000000L
    // a null timestamp is a contract violation, not a droppable row:
    // silently excluded events would skew per-period counts and the
    // cumulative LLR with no signal (callers that WANT to drop nulls
    // pre-filter, as q344 does)
    val tsG = when(ts.cast("timestamp").isNull, raise_error(lit(
      "sprtMonitor: ts must be a non-null timestamp")))
      .otherwise(ts.cast("timestamp"))
    val cells = df.select(
      floor(unix_micros(tsG) / lit(p)).cast("long").as("period"),
      cG.as("c"))
      .groupBy(col("period")).agg(
        count(lit(1)).as("n"),
        sum(when(col("c"), 1L).otherwise(0L)).as("conversions"))
    val totals = cells.agg(count(lit(1)).as("__k"))
    // the four ln constants: exact-rational arguments, one libm call
    // each, identical in-engine on both sides of the gate
    val lnPos = log(lit(p1Num.toDouble * p0Den.toDouble) /
      lit(p0Num.toDouble * p1Den.toDouble))
    val lnNeg = log(lit((p1Den - p1Num).toDouble * p0Den.toDouble) /
      lit((p0Den - p0Num).toDouble * p1Den.toDouble))
    val lnA = log(lit((bDen - bNum).toDouble * aDen.toDouble) /
      lit(bDen.toDouble * aNum.toDouble))
    val lnB = log(lit(bNum.toDouble * aDen.toDouble) /
      lit(bDen.toDouble * (aDen - aNum).toDouble))
    val wCum = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(totals))
      .select(col("period"),
        when(col("__k") > maxPeriods, raise_error(lit(
          s"sprtMonitor: more than $maxPeriods periods — wrong " +
            "periodSeconds or corrupt timestamps"))).otherwise(col("n")).as("n"),
        col("conversions"))
      .withColumn("llr_cum", sum(
        col("conversions").cast("double") * lnPos +
          (col("n") - col("conversions")).cast("double") * lnNeg).over(wCum))
      .withColumn("decision",
        when(col("llr_cum") >= lnA, lit("accept_h1"))
          .when(col("llr_cum") <= lnB, lit("accept_h0"))
          .otherwise(lit("continue")))
  }

  /** HOLM–BONFERRONI step-down FWER control (Holm 1979) — the
    * family-wise sibling of [[benjaminiHochberg]]: with m hypotheses
    * sorted by p ascending, reject rank i while p_(i) ≤ α/(m−i+1)
    * and STOP at the first failure (step-down: everything after a
    * failure survives, even if its own compare would pass). Controls
    * the probability of ANY false rejection — the correction for
    * "these 50 guardrail metrics must all be real" launches, where
    * BH's false-discovery RATE is too weak.
    *
    * Same geometry and exactness as [[benjaminiHochberg]]: the
    * compare is `p·(m−rank+1)·alphaDen ≤ alphaNum` with α an exact
    * rational and p the only float (identical in any engine —
    * hash-exact); ties break by unique test id; the rank window is
    * guarded by `maxTests`.
    *
    * Output per test: (test_id, p, rank, rejected).
    */
  def holmBonferroni(
      df: DataFrame,
      testId: Column,
      p: Column,
      alphaNum: Long,
      alphaDen: Long,
      maxTests: Long = 10000000L): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha must satisfy 0 < alphaNum/alphaDen <= 1, got $alphaNum/$alphaDen")
    val pD = p.cast("double")
    val pG = when(pD.isNull || pD < 0.0 || pD > 1.0, raise_error(lit(
      "holmBonferroni: p must be a non-null double in [0, 1]")))
      .otherwise(pD)
    val idG = when(testId.isNull, raise_error(lit(
      "holmBonferroni: test id must be non-null"))).otherwise(testId)
    val base = df.select(idG.as("test_id"), pG.as("p"))
    val total = base.agg(count(lit(1)).as("m"))
    val ranked = base.crossJoin(broadcast(total))
      .select(col("test_id"),
        when(col("m") > maxTests, raise_error(lit(
          s"holmBonferroni: more than $maxTests hypotheses — this is a " +
            "per-experiment correction, not a corpus scan")))
          .otherwise(col("p")).as("p"),
        col("m"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("p").asc, col("test_id").asc))
          .cast("long"))
      .withColumn("flag",
        col("p") * (col("m") - col("rank") + 1L).cast("double")
          * lit(alphaDen.toDouble) <= lit(alphaNum.toDouble))
      .localCheckpoint(true) // the first failure + the output read this
    val firstFail = ranked.agg(min(when(!col("flag"), col("rank"))).as("ff"))
    val out = ranked.crossJoin(broadcast(firstFail))
      .select(col("test_id"), col("p"), col("rank"),
        (col("ff").isNull || col("rank") < col("ff")).as("rejected"))
      .localCheckpoint(true) // eager before releasing the rank frame
    ranked.unpersist()
    out
  }

  /** MANTEL–HAENSZEL STRATIFIED ODDS RATIO + COCHRAN–MH χ² (Mantel &
    * Haenszel 1959) — the confounder-adjusted association between a
    * binary exposure and a binary outcome, pooled across strata
    * WITHOUT assuming equal stratum sizes (epidemiology's workhorse;
    * the categorical cousin of CUPED's "adjust before you compare").
    * Per stratum i with 2×2 cells (a=E∩O, b=E∩Ō, c=Ē∩O, d=Ē∩Ō),
    * n_i = a+b+c+d:
    *
    *   OR_MH = Σ(a_i·d_i/n_i) / Σ(b_i·c_i/n_i),
    *   χ²_CMH = [Σ a_i − Σ (a_i+b_i)(a_i+c_i)/n_i]²
    *          / Σ (a_i+b_i)(c_i+d_i)(a_i+c_i)(b_i+d_i) / (n_i²(n_i−1)),
    *
    * (uncorrected). ONE pass to per-stratum integer cells; the
    * stratum-axis folds are pinned windows (guarded by `maxStrata`)
    * of correctly-rounded per-stratum terms — hash-exact against an
    * identically-ordered replay; oracles that recompute with plain
    * aggregates gate at relative tolerance instead.
    *
    * Output: one row (k_strata, n, sum_a, or_mh, chi2_cmh) — or_mh
    * null when Σbc/n = 0, χ² null when the variance sum is 0;
    * single-row strata contribute nothing to the variance (n−1 = 0
    * guard skips them, the standard convention).
    */
  def mantelHaenszel(
      df: DataFrame,
      stratum: Column,
      exposed: Column,
      outcome: Column,
      maxStrata: Long = 1000000L): DataFrame = {
    def flag(c: Column, what: String): Column =
      when(c.cast("boolean").isNull, raise_error(lit(
        s"mantelHaenszel: $what must be a non-null boolean")))
        .otherwise(c.cast("boolean"))
    val base = df.select(
      when(stratum.isNull, raise_error(lit(
        "mantelHaenszel: stratum must be non-null"))).otherwise(stratum).as("s"),
      flag(exposed, "exposed").as("e"), flag(outcome, "outcome").as("o"))
    val cells = base.groupBy(col("s")).agg(
      sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
      sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("d"))
    val tot = cells.agg(count(lit(1)).as("k"),
      sum(col("a") + col("b") + col("c") + col("d")).as("nn"),
      sum(col("a")).as("sa"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val aD = col("a").cast("double"); val bD = col("b").cast("double")
    val cD = col("c").cast("double"); val dD = col("d").cast("double")
    val wCum = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = cells.crossJoin(broadcast(tot))
      .select(col("s"),
        when(col("k") > maxStrata, raise_error(lit(
          s"mantelHaenszel: more than $maxStrata strata"))).otherwise(col("a"))
          .as("a"),
        col("b"), col("c"), col("d"), col("k"), col("nn"), col("sa"))
      .withColumn("ad_cum", sum(when(n > 0.0, aD * dD / n)
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("bc_cum", sum(when(n > 0.0, bD * cD / n)
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("ea_cum", sum(when(n > 0.0, (aD + bD) * (aD + cD) / n)
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("va_cum", sum(when(n > 1.0,
        (aD + bD) * (cD + dD) * (aD + cD) * (bD + dD) / (n * n * (n - lit(1.0))))
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("s").desc)))
      .filter(col("rn") === 1)
    folded.select(
      col("k").as("k_strata"), col("nn").as("n"), col("sa").as("sum_a"),
      when(col("bc_cum") > 0.0, col("ad_cum") / col("bc_cum"))
        .otherwise(lit(null).cast("double")).as("or_mh"),
      when(col("va_cum") > 0.0,
        (col("sa").cast("double") - col("ea_cum"))
          * (col("sa").cast("double") - col("ea_cum")) / col("va_cum"))
        .otherwise(lit(null).cast("double")).as("chi2_cmh"))
  }

  /** TUKEY HSD PAIRWISE CONTRASTS (Tukey 1949) — after a significant
    * one-way ANOVA, WHICH group pairs differ? For every unordered
    * group pair the studentized-range statistic
    *
    *   q_ij = |m_i − m_j| / √( MSW/2 · (1/n_i + 1/n_j) )
    *
    * (the Tukey–Kramer unequal-n form; compare against the
    * studentized-range quantile downstream — the statistic, not a
    * table lookup, is the data-layer deliverable). Per-group exact
    * integer moments reduce in one pass; MSW comes from the same
    * guarded pinned fold as [[bartlettTest]]; the k² pair expansion
    * is a self-join of the K-ROW GROUP TABLE (guarded ≤ maxGroups —
    * pairs of groups, never of rows). Every statistic is a pinned
    * chain — hash-exact.
    *
    * Output per pair (group_a < group_b by string order):
    * (group_a, group_b, n_a, n_b, mean_a, mean_b, diff, q_stat) —
    * q_stat null when MSW = 0.
    */
  def tukeyHsd(
      df: DataFrame,
      group: Column,
      value: Column,
      maxGroups: Long = 10000L): DataFrame = {
    val vG = when(value.cast("long").isNull, raise_error(lit(
      "tukeyHsd: value must be a non-null integer")))
      .otherwise(value.cast("long"))
    val gG = when(group.cast("string").isNull, raise_error(lit(
      "tukeyHsd: group must be non-null"))).otherwise(group.cast("string"))
    val d19 = "decimal(19,0)"
    val per = df.select(gG.as("g"), vG.as("v"))
      .groupBy(col("g")).agg(
        count(lit(1)).as("ng"),
        sum(col("v").cast(d19)).cast("decimal(38,0)").as("sx"),
        sum(col("v").cast(d19) * col("v").cast(d19)).cast("decimal(38,0)").as("sxx"))
    val tot = per.agg(count(lit(1)).as("k"), sum(col("ng")).as("nn"))
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"tukeyHsd: |$what| exceeds 2^53 — rescale the value")))
        .otherwise(c).cast("double")
    val nD = col("ng").cast("double")
    // within-group sum of squares, exact numerator over one division
    val sswTerm = (nD * e(col("sxx"), "a group's square sum") -
      e(col("sx"), "a group's value sum") * e(col("sx"), "a group's value sum")) / nD
    val wCum = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val msw = per.crossJoin(broadcast(tot))
      .select(col("g"),
        when(col("k") > maxGroups, raise_error(lit(
          s"tukeyHsd: more than $maxGroups groups — k² pairs need a " +
            "bounded group axis"))).otherwise(col("ng")).as("ng"),
        col("sx"), col("sxx"), col("k"), col("nn"))
      .withColumn("ssw_cum", sum(sswTerm).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("g").desc)))
      .filter(col("rn") === 1)
      .select((col("ssw_cum") /
        (col("nn") - col("k")).cast("double")).as("msw"))
    val a = per.select(col("g").as("group_a"), col("ng").as("n_a"),
      col("sx").as("sxa"))
    val b = per.select(col("g").as("group_b"), col("ng").as("n_b"),
      col("sx").as("sxb"))
    val ma = e(col("sxa"), "a group's value sum") / col("n_a").cast("double")
    val mb = e(col("sxb"), "a group's value sum") / col("n_b").cast("double")
    val se = sqrt(col("msw") / lit(2.0) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    a.join(b, col("group_a") < col("group_b"))
      .crossJoin(broadcast(msw))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        ma.as("mean_a"), mb.as("mean_b"),
        (ma - mb).as("diff"),
        when(col("msw") > 0.0, abs(ma - mb) / se)
          .otherwise(lit(null).cast("double")).as("q_stat"))
  }

  /** BARTLETT'S TEST of variance homogeneity (Bartlett 1937) — are
    * the K group variances equal? The ln-based sibling of the
    * (already rank-robust) Brown–Forsythe:
    *
    *   T = [ (N−k)·ln(Sp²) − Σ(n_i−1)·ln(s_i²) ] / C,
    *   C = 1 + ( Σ 1/(n_i−1) − 1/(N−k) ) / (3(k−1)),
    *
    * with s_i² the unbiased group variances and Sp² their pooled
    * value. Per-group exact integer moments reduce in one pass; the
    * k-row fold is a pinned window in group order (guarded — the
    * [[intraclassCorrelation]] discipline). Each term is one ln
    * (libm), so oracles gate T at tolerance while counts hash.
    * Groups with n_i < 2 or zero variance raise (their ln is
    * undefined — filter or merge them upstream).
    *
    * Output: one row (k, n, pooled_var, t_stat).
    */
  def bartlettTest(
      df: DataFrame,
      group: Column,
      value: Column,
      maxGroups: Long = 1000000L): DataFrame = {
    val vG = when(value.cast("long").isNull, raise_error(lit(
      "bartlettTest: value must be a non-null integer")))
      .otherwise(value.cast("long"))
    val gG = when(group.isNull, raise_error(lit(
      "bartlettTest: group must be non-null"))).otherwise(group)
    val d19 = "decimal(19,0)"
    val per = df.select(gG.as("g"), vG.as("v"))
      .groupBy(col("g")).agg(
        count(lit(1)).as("ng"),
        sum(col("v").cast(d19)).cast("decimal(38,0)").as("sx"),
        sum(col("v").cast(d19) * col("v").cast(d19)).cast("decimal(38,0)").as("sxx"))
    val tot = per.agg(count(lit(1)).as("k"), sum(col("ng")).as("nn"))
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"bartlettTest: |$what| exceeds 2^53 — rescale the value")))
        .otherwise(c).cast("double")
    val nD = col("ng").cast("double")
    // unbiased group variance from exact moments, loudly guarded
    val varI = (nD * e(col("sxx"), "a group's square sum") -
      e(col("sx"), "a group's value sum") * e(col("sx"), "a group's value sum")) /
      (nD * (nD - lit(1.0)))
    val varG = when(col("ng") < 2L, raise_error(lit(
      "bartlettTest: a group has fewer than 2 rows — merge or filter it")))
      .otherwise(when(varI <= 0.0, raise_error(lit(
        "bartlettTest: a group has zero variance — its ln is undefined")))
        .otherwise(varI))
    val wCum = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = per.crossJoin(broadcast(tot))
      .select(col("g"), col("ng"), col("sx"), col("sxx"),
        when(col("k") > maxGroups, raise_error(lit(
          s"bartlettTest: more than $maxGroups groups"))).otherwise(col("k"))
          .as("k"),
        col("nn"))
      .withColumn("ssw_cum",
        sum((col("ng") - 1L).cast("double") * varG).over(wCum))
      .withColumn("lnsum_cum",
        sum((col("ng") - 1L).cast("double") * log(varG)).over(wCum))
      .withColumn("inv_cum",
        sum(lit(1.0) / (col("ng") - 1L).cast("double")).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("g").desc)))
      .filter(col("rn") === 1)
    val kD = col("k").cast("double")
    val nnD = col("nn").cast("double")
    val pooled = col("ssw_cum") / (nnD - kD)
    val c = lit(1.0) +
      (col("inv_cum") - lit(1.0) / (nnD - kD)) / (lit(3.0) * (kD - lit(1.0)))
    folded.select(
      col("k"), col("nn").as("n"),
      pooled.as("pooled_var"),
      when(col("k") > 1L,
        ((nnD - kD) * log(pooled) - col("lnsum_cum")) / c)
        .otherwise(lit(null).cast("double")).as("t_stat"))
  }

  /** BENJAMINI–HOCHBERG step-up FDR control (Benjamini & Hochberg
    * 1995) over a p-value table — the multiple-testing correction a
    * thousand-metric experimentation platform runs after every batch
    * of tests: with m hypotheses sorted by p ascending, reject
    * exactly ranks 1..k* where k* = max{k : p_(k) ≤ k·α/m}.
    *
    * α = alphaNum/alphaDen is an exact rational; the step-up compare
    * is `p·m·alphaDen ≤ rank·alphaNum` — the p column is the only
    * float and arrives identical in any engine, so the decision (and
    * the whole output) is hash-exact. Ties in p break by test id
    * (ids must be unique — BH is rank-based, so determinism requires
    * a total order). The rank window is unpartitioned BY DESIGN —
    * hypothesis tables are experiment-scale, enforced by the loud
    * `maxTests` guard (the [[Survival]] duration-axis discipline),
    * never corpus-scale.
    *
    * Output per test: (test_id, p, rank, rejected) — the step-up
    * shape means rejected rows are exactly ranks ≤ k*, including any
    * whose own compare failed.
    */
  def benjaminiHochberg(
      df: DataFrame,
      testId: Column,
      p: Column,
      alphaNum: Long,
      alphaDen: Long,
      maxTests: Long = 10000000L): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha must satisfy 0 < alphaNum/alphaDen <= 1, got $alphaNum/$alphaDen")
    val pD = p.cast("double")
    val pG = when(pD.isNull || pD < 0.0 || pD > 1.0, raise_error(lit(
      "benjaminiHochberg: p must be a non-null double in [0, 1]")))
      .otherwise(pD)
    val idG = when(testId.isNull, raise_error(lit(
      "benjaminiHochberg: test id must be non-null"))).otherwise(testId)
    val base = df.select(idG.as("test_id"), pG.as("p"))
    val total = base.agg(count(lit(1)).as("m"))
    val ranked = base.crossJoin(broadcast(total))
      // the guard rides p (consumed by the rank window's sort input)
      .select(col("test_id"),
        when(col("m") > maxTests, raise_error(lit(
          s"benjaminiHochberg: more than $maxTests hypotheses — this is " +
            "a per-experiment correction, not a corpus scan")))
          .otherwise(col("p")).as("p"),
        col("m"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("p").asc, col("test_id").asc))
          .cast("long"))
      .withColumn("flag",
        col("p") * col("m").cast("double") * lit(alphaDen.toDouble)
          <= col("rank").cast("double") * lit(alphaNum.toDouble))
      .localCheckpoint(true) // k* + the output both read this
    val kmax = ranked.agg(max(when(col("flag"), col("rank"))).as("kmax"))
    val out = ranked.crossJoin(broadcast(kmax))
      .select(col("test_id"), col("p"), col("rank"),
        (col("kmax").isNotNull && col("rank") <= col("kmax")).as("rejected"))
      .localCheckpoint(true) // eager before releasing the rank frame
    ranked.unpersist()
    out
  }
}

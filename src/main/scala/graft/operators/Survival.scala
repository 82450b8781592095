package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis: the Kaplan–Meier product-limit estimator over
  * right-censored durations — churn/retention's canonical statistic
  * (what fraction of subjects "survive" past each duration, with
  * still-active subjects contributing to risk sets but never to
  * deaths).
  *
  * Scale shape: subject durations reduce per-subject (one shuffle on
  * the subject key), then collapse to ONE ROW PER DISTINCT DURATION
  * — a time axis bounded by the observation window, not the corpus —
  * so the cumulative window that turns hazards into the survival
  * curve runs over days, not subjects. A billion users with a 90-day
  * window is a 90-row window frame.
  */
object Survival {

  /** Kaplan–Meier curve from per-subject (duration, event) rows:
    * one output row per distinct duration —
    * (duration, n_risk, n_death, n_censored, survival) with
    *
    *   S(t) = Π_{u ≤ t} (1 − d_u / n_u)
    *
    * `eventOccurred` true = the terminal event was observed (death /
    * churn); false = right-censored at that duration (subject still
    * alive when observation ended — it leaves the risk set AFTER its
    * duration, the standard KM convention). Null durations/flags and
    * negative durations fail loudly — silently dropping subjects
    * would bias every risk set. Hazard factors are exact rationals of
    * integer counts; the cumulative product is exp∘Σ∘ln (the one
    * libm step — oracles verify to tolerance, the q113 ln precedent).
    */
  /** Shared risk-table build: (t, n_death, n_censored, n_risk), one
    * row per distinct duration.
    */
  private def riskTable(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column,
      op: String): DataFrame = {
    val base = df.select(
      when(duration.cast("long").isNull || duration.cast("long") < 0,
        raise_error(lit(s"$op: duration must be a non-negative integer")))
        .otherwise(duration.cast("long")).as("t"),
      when(eventOccurred.cast("boolean").isNull,
        raise_error(lit(s"$op: event flag must be non-null")))
        .otherwise(eventOccurred.cast("boolean")).as("ev"))
    val byT = base.groupBy(col("t")).agg(
      sum(when(col("ev"), 1L).otherwise(0L)).as("n_death"),
      sum(when(col("ev"), 0L).otherwise(1L)).as("n_censored"))
    val total = byT.agg(
      sum(col("n_death") + col("n_censored")).as("__n"),
      count(lit(1)).as("__k"))
    // time axis only: the window frame is bounded by distinct
    // durations (the observation window), never by subject count.
    // ENFORCED, not assumed: a continuous-grain duration column
    // (microseconds instead of days) would silently single-reducer
    // the corpus — raise loudly instead (the maxCells discipline).
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byT.crossJoin(broadcast(total))
      // the guard rides n_death (consumed by the window sum) so it
      // fires before the unpartitioned frame does any real work
      .select(col("t"),
        durationAxisGuard(op, col("__k"), col("n_death")).as("n_death"),
        col("n_censored"), col("__n"))
      .withColumn("n_risk",
        col("__n") - coalesce(sum(col("n_death") + col("n_censored")).over(wPrev), lit(0L)))
  }

  /** Distinct-duration ceiling for the unpartitioned time-axis
    * windows: 1M rows is a trivially small window frame, and any real
    * observation window (days/weeks over years) sits orders of
    * magnitude below it. Above it the duration column is almost
    * certainly continuous-grain — a modeling error, not a scale need.
    */
  private val maxDistinctDurations = 1000000L

  /** Guard expression riding a payload column consumed by the first
    * window over the time axis: raises when the axis has more than
    * [[maxDistinctDurations]] rows, passes the payload through
    * otherwise (the categoricalAssociation maxCells discipline).
    */
  private def durationAxisGuard(op: String, k: Column, payload: Column): Column =
    when(k > maxDistinctDurations, raise_error(lit(
      s"$op: more than $maxDistinctDurations distinct durations — " +
        "the time axis must be observation-window-bounded; " +
        "coarsen the duration grain (e.g. days, not microseconds)")))
      .otherwise(payload)

  def kaplanMeier(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column): DataFrame = {
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskTable(df, duration, eventOccurred, "kaplanMeier")
      .withColumn("__f",
        lit(1.0) - col("n_death").cast("double") / col("n_risk").cast("double"))
      // a duration where EVERYONE at risk dies zeroes the curve; it
      // must not route through ln (Spark's log(0) is NULL, which a sum
      // would silently skip — turning extinction into survival)
      .withColumn("__hit0",
        max(when(col("n_death") > 0 && col("__f") === 0.0, 1).otherwise(0)).over(wCum))
      .withColumn("survival",
        when(col("__hit0") === 1, lit(0.0)).otherwise(
          exp(sum(when(col("n_death") > 0, log(col("__f"))).otherwise(lit(0.0)))
            .over(wCum))))
      .select("t", "n_risk", "n_death", "n_censored", "survival")
  }

  /** KAPLAN–MEIER WITH GREENWOOD CONFIDENCE BANDS — [[kaplanMeier]]
    * plus the classic variance estimate (Greenwood 1926)
    *
    *   Var[S(t)] = S(t)² · Σ_{u ≤ t, d_u > 0} d_u / (n_u·(n_u − d_u))
    *
    * and the linear z-interval [S ∓ z·se] clipped to [0, 1] (the
    * plain Wald band; at extinction S = 0 forces se = 0, so the band
    * collapses to [0, 0] with no division hazard — the d = n term is
    * excluded from the running sum exactly there). Same bounded
    * time-axis geometry as [[kaplanMeier]]: every cumulation is a
    * window running sum over distinct durations in pinned t-order;
    * survival and the bands route through exp∘Σ∘ln once (oracles
    * gate the float columns at 1e-9, counts hash exactly).
    *
    * Output per distinct duration: (t, n_risk, n_death, n_censored,
    * survival, greenwood_var, ci_lo, ci_hi).
    */
  def kaplanMeierGreenwood(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column,
      z: Double = 1.96): DataFrame = {
    require(z > 0.0, s"z must be positive, got $z")
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = kaplanMeier(df, duration, eventOccurred)
    curve
      .withColumn("greenwood_var",
        (col("survival") * col("survival")) *
          sum(when(col("n_death") > 0 && col("n_death") < col("n_risk"),
            col("n_death").cast("double") /
              (col("n_risk").cast("double") *
                (col("n_risk") - col("n_death")).cast("double")))
            .otherwise(lit(0.0))).over(wCum))
      .withColumn("__se", sqrt(col("greenwood_var")))
      .withColumn("ci_lo", greatest(lit(0.0), col("survival") - lit(z) * col("__se")))
      .withColumn("ci_hi", least(lit(1.0), col("survival") + lit(z) * col("__se")))
      .select("t", "n_risk", "n_death", "n_censored", "survival",
        "greenwood_var", "ci_lo", "ci_hi")
  }

  /** COX SCORE TEST at β = 0 for a SINGLE numeric covariate (the
    * partial-likelihood score test, Cox 1972, Breslow ties): does the
    * covariate shift the hazard? With x̄_t the at-risk covariate mean
    * at event time t,
    *
    *   U = Σ_t (Sx_deaths(t) − d_t·x̄_t),
    *   I = Σ_t d_t·(Sxx_t/n_t − x̄_t²),      z = U/√I,
    *
    * the K-group-free generalization of the two-group log-rank (a
    * binary x reproduces it up to the hypergeometric tie
    * correction). Same geometry as [[logRank]]: per-duration integer
    * moment cells (d, Sx of deaths, and suffix sums n, Sx, Sxx of
    * the risk set via the prefix-window complement), each term one
    * correctly-rounded double chain, both cumulations window sums in
    * pinned t-order — hash-exact, no libm. Covariates must be exact
    * integers; 2^53 moment guards raise loudly.
    *
    * Output: one row (n, n_events, u_score, information, z) — z null
    * when the information is 0 (constant covariate).
    */
  def coxScoreTest(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column,
      covariate: Column): DataFrame = {
    val xL = covariate.cast("long")
    val xG = when(xL.isNull, raise_error(lit(
      "coxScoreTest: covariate must be a non-null integer"))).otherwise(xL)
    val base = df.select(
      when(duration.cast("long").isNull || duration.cast("long") < 0,
        raise_error(lit("coxScoreTest: duration must be a non-negative integer")))
        .otherwise(duration.cast("long")).as("t"),
      when(eventOccurred.cast("boolean").isNull,
        raise_error(lit("coxScoreTest: event flag must be non-null")))
        .otherwise(eventOccurred.cast("boolean")).as("ev"),
      xG.as("x"))
    // covariate moments in decimal: a plain long sum past 2^63 wraps
    // silently and a wrapped value can PASS the 2^53 eD guard,
    // producing a wrong U/I/z with no error (the x² per-row product
    // additionally wraps at |x| ≳ 3.04e9 before any sum)
    val d19 = "decimal(19,0)"
    val byT = base.groupBy(col("t")).agg(
      count(lit(1)).as("leave"),
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
      sum(when(col("ev"), col("x")).otherwise(0L).cast(d19))
        .cast("decimal(38,0)").as("sxd"),
      sum(col("x").cast(d19)).cast("decimal(38,0)").as("sx"),
      sum(col("x").cast(d19) * col("x").cast(d19))
        .cast("decimal(38,0)").as("sxx"))
    val totals = byT.agg(
      sum(col("leave")).as("n_total"),
      sum(col("d")).as("ev_total"),
      sum(col("sx")).cast("decimal(38,0)").as("sx_total"),
      sum(col("sxx")).cast("decimal(38,0)").as("sxx_total"),
      count(lit(1)).as("__k"))
    val twoP53 = 9007199254740992L
    def eD(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"coxScoreTest: |$what| exceeds 2^53 — rescale the covariate")))
        .otherwise(c).cast("double")
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // risk-set moments at t = totals minus everything that left before t
    val risk = byT.crossJoin(broadcast(totals))
      .withColumn("d",
        durationAxisGuard("coxScoreTest", col("__k"), col("d")))
      .withColumn("n_t", col("n_total")
        - coalesce(sum(col("leave")).over(wPrev), lit(0L)))
      .withColumn("sx_t", col("sx_total")
        - coalesce(sum(col("sx")).over(wPrev), lit(0L)))
      .withColumn("sxx_t", col("sxx_total")
        - coalesce(sum(col("sxx")).over(wPrev), lit(0L)))
    val xbar = eD(col("sx_t"), "the at-risk x sum") / col("n_t").cast("double")
    val scored = risk
      .withColumn("u_cum", sum(when(col("d") > 0L,
        eD(col("sxd"), "the deaths' x sum") - col("d").cast("double") * xbar)
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("i_cum", sum(when(col("d") > 0L,
        col("d").cast("double") *
          (eD(col("sxx_t"), "the at-risk x² sum") / col("n_t").cast("double")
            - xbar * xbar))
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("t").desc)))
      .filter(col("rn") === 1)
    scored.select(
      col("n_total").as("n"),
      col("ev_total").as("n_events"),
      col("u_cum").as("u_score"),
      col("i_cum").as("information"),
      when(col("i_cum") > 0.0, col("u_cum") / sqrt(col("i_cum")))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** NELSON-AALEN cumulative hazard — [[kaplanMeier]]'s additive
    * sibling (Nelson 1972, Aalen 1978): H(t) = Σ_{u≤t} d_u/n_u, with
    * the standard variance estimate Σ d_u/n_u². Unlike KM's
    * exp∘Σ∘ln product there is NO libm step — each term is one
    * correctly-rounded division of exact integers and the cumulative
    * is a WINDOW running sum, whose additions happen in pinned
    * t-order in every engine — so the whole curve hash-matches
    * exactly. Same risk-table geometry (one row per distinct
    * duration). Output: (t, n_risk, n_death, n_censored, hazard,
    * hazard_var).
    */
  def nelsonAalen(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column): DataFrame = {
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nD = col("n_risk").cast("double")
    riskTable(df, duration, eventOccurred, "nelsonAalen")
      .withColumn("hazard",
        sum(when(col("n_death") > 0, col("n_death").cast("double") / nD)
          .otherwise(lit(0.0))).over(wCum))
      .withColumn("hazard_var",
        sum(when(col("n_death") > 0,
          col("n_death").cast("double") / (nD * nD))
          .otherwise(lit(0.0))).over(wCum))
      .select("t", "n_risk", "n_death", "n_censored", "hazard", "hazard_var")
  }

  /** RESTRICTED MEAN SURVIVAL TIME (Irwin 1949; the modern
    * hazard-ratio alternative, Royston & Parmar 2013) — the area
    * under the Kaplan–Meier curve up to a clinical horizon τ:
    * "expected survival time within the first τ periods", the
    * summary that stays meaningful when proportional hazards fail.
    *
    *   RMST(τ) = ∫₀^τ S(t) dt
    *           = Σ_i S(t_{i-1})·(min(t_i, τ) − t_{i-1}) + S(t_last)·(τ − t_last)⁺
    *
    * over the step curve (S = 1 before the first distinct duration).
    * Same bounded time-axis geometry as [[kaplanMeier]]: one lag +
    * one cumulative window over distinct durations ≤ τ. The curve is
    * exp∘Σ∘ln, so oracles gate the float columns at tolerance
    * (counts hash). Output: one row (tau, n, n_events_le_tau, rmst).
    */
  def restrictedMeanSurvival(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column,
      tau: Long): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val curve = kaplanMeier(df, duration, eventOccurred)
    val wLag = Window.orderBy(col("t"))
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = curve
      .withColumn("prev_t", coalesce(lag(col("t"), 1).over(wLag), lit(0L)))
      .withColumn("prev_s", coalesce(lag(col("survival"), 1).over(wLag), lit(1.0)))
      // keep every segment STARTING inside the horizon; clamp its end
      // to τ (the first distinct duration past τ still owns [prev_t, τ])
      .filter(col("prev_t") < tau)
      .withColumn("seg",
        col("prev_s") * (least(col("t"), lit(tau)) - col("prev_t")).cast("double"))
      .withColumn("area_cum", sum(col("seg")).over(wCum))
      .withColumn("ev_cum",
        sum(when(col("t") <= tau, col("n_death")).otherwise(0L)).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("t").desc)))
      .filter(col("rn") === 1)
    val total = df.agg(count(lit(1)).as("n"))
    // tail: S(t_last) holds from the last in-horizon duration to τ
    within.crossJoin(broadcast(total)).select(
      lit(tau).as("tau"), col("n"),
      col("ev_cum").as("n_events_le_tau"),
      (col("area_cum") +
        when(col("t") < tau,
          col("survival") * (lit(tau) - col("t")).cast("double"))
          .otherwise(lit(0.0))).as("rmst"))
  }

  /** TWO-GROUP LOG-RANK TEST (Mantel 1966, Peto & Peto 1972) — does
    * group 1's survival curve differ from group 0's? The standard
    * censoring-aware comparison: at each distinct event time t with
    * d_t total deaths, group 1's expected share is E₁(t) = d_t·n₁t/n_t
    * under H₀ (deaths distributed proportionally to the at-risk
    * split), with hypergeometric variance
    * V(t) = d_t·n₁t·n₀t·(n_t−d_t) / (n_t²·(n_t−1)); the statistic is
    * Z = (O₁−E₁)/√V with O₁ = Σ d₁t and E₁, V time-summed.
    *
    * Scale shape: same ONE-ROW-PER-DISTINCT-DURATION geometry as
    * [[kaplanMeier]] — subjects reduce to per-(t, group) counts in one
    * partial-aggregable pass, both groups' risk sets prefix-sum over
    * the bounded time axis, and the E/V accumulations are WINDOW
    * running sums in pinned t-order (cross-engine bit-stable; the
    * [[nelsonAalen]] precedent) — never a groupBy float sum. Every
    * per-time term is a pinned chain of correctly-rounded double ops
    * on exact integer counts, and √ is IEEE-exact, so the whole
    * output hash-matches a DuckDB oracle with NO tolerance.
    *
    * `group` must be 0/1 (non-null); null durations/flags raise as in
    * the curve estimators. Output is ONE row:
    * (n1, n0, o1, e1, v, z, chi2) — z/chi2 null when V = 0 (a
    * degenerate axis: one group empty or no deaths).
    */
  def logRank(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column,
      group: Column): DataFrame = {
    val gL = group.cast("long")
    val gG = when(gL.isNull || (gL =!= 0L && gL =!= 1L), raise_error(lit(
      "logRank: group must be 0 or 1"))).otherwise(gL)
    val base = df.select(
      when(duration.cast("long").isNull || duration.cast("long") < 0,
        raise_error(lit("logRank: duration must be a non-negative integer")))
        .otherwise(duration.cast("long")).as("t"),
      when(eventOccurred.cast("boolean").isNull,
        raise_error(lit("logRank: event flag must be non-null")))
        .otherwise(eventOccurred.cast("boolean")).as("ev"),
      gG.as("g"))
    val byT = base.groupBy(col("t")).agg(
      sum(when(col("ev") && col("g") === 1L, 1L).otherwise(0L)).as("d1"),
      sum(when(col("ev") && col("g") === 0L, 1L).otherwise(0L)).as("d0"),
      sum(when(!col("ev") && col("g") === 1L, 1L).otherwise(0L)).as("c1"),
      sum(when(!col("ev") && col("g") === 0L, 1L).otherwise(0L)).as("c0"))
    val totals = byT.agg(
      sum(col("d1") + col("c1")).as("tot1"),
      sum(col("d0") + col("c0")).as("tot0"),
      count(lit(1)).as("__k"))
    // time axis only: every window below is bounded by distinct
    // durations (the observation window), never by subject count —
    // enforced by the guard below, not assumed
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT.crossJoin(broadcast(totals))
      .withColumn("d1", durationAxisGuard("logRank", col("__k"), col("d1")))
      .withColumn("n1", col("tot1")
        - coalesce(sum(col("d1") + col("c1")).over(wPrev), lit(0L)))
      .withColumn("n0", col("tot0")
        - coalesce(sum(col("d0") + col("c0")).over(wPrev), lit(0L)))
      .withColumn("nt", col("n1") + col("n0"))
      .withColumn("dt", col("d1") + col("d0"))
    val dtD = col("dt").cast("double")
    val n1D = col("n1").cast("double")
    val n0D = col("n0").cast("double")
    val ntD = col("nt").cast("double")
    val curve = risk
      .withColumn("o1c", sum(col("d1")).over(wCum))
      .withColumn("e1c", sum(when(col("dt") > 0L, dtD * n1D / ntD)
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("vc", sum(when(col("dt") > 0L && col("nt") > 1L,
        dtD * n1D * n0D * (ntD - dtD) / (ntD * ntD * (ntD - lit(1.0))))
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("t").desc)))
      .filter(col("rn") === 1)
    curve.select(
      col("tot1").as("n1"),
      col("tot0").as("n0"),
      col("o1c").as("o1"),
      col("e1c").as("e1"),
      col("vc").as("v"),
      when(col("vc") > 0.0,
        (col("o1c").cast("double") - col("e1c")) / sqrt(col("vc")))
        .otherwise(lit(null).cast("double")).as("z"),
      when(col("vc") > 0.0,
        (col("o1c").cast("double") - col("e1c"))
          * (col("o1c").cast("double") - col("e1c")) / col("vc"))
        .otherwise(lit(null).cast("double")).as("chi2"))
  }

  /** AALEN–JOHANSEN CUMULATIVE INCIDENCE for TWO COMPETING RISKS
    * (Aalen & Johansen 1978) — when subjects can fail from either of
    * two causes, the per-cause probability of failing by time t:
    *
    *   CIF_k(t) = Σ_{s ≤ t} S(s−) · d_k(s)/n(s),
    *   S(s−) = Π_{u < s} (1 − d(u)/n(u)),  d = d₁ + d₂,
    *
    * the quantity 1 − KM_k systematically OVERESTIMATES under
    * competing risks (the classic misuse this estimator exists to
    * fix). Same bounded geometry as [[kaplanMeier]]: one row per
    * distinct duration, suffix risk sets and both cumulations as
    * window sums in pinned t-order. The survival prefix is exp∘Σ∘ln —
    * float — so oracles gate the float columns at 1e-9 (exact integer
    * counts hash); the [[nelsonAalen]]-style all-window formulation
    * keeps everything one pass over the time axis.
    *
    * `cause` must be 0 (censored), 1, or 2 — raises otherwise.
    * Output per duration with ≥ 1 event:
    * (t, n_risk, d1, d2, s_minus, cif1, cif2).
    */
  def aalenJohansen(
      df: DataFrame,
      duration: Column,
      cause: Column): DataFrame = {
    val tG = when(duration.cast("long").isNull || duration.cast("long") < 0L,
      raise_error(lit("aalenJohansen: duration must be a non-null " +
        "non-negative integer"))).otherwise(duration.cast("long"))
    val kG = when(cause.cast("long").isNull ||
      cause.cast("long") < 0L || cause.cast("long") > 2L,
      raise_error(lit("aalenJohansen: cause must be 0 (censored), 1, or 2")))
      .otherwise(cause.cast("long"))
    val base = df.select(tG.as("t"), kG.as("k"))
    val cells = base.groupBy(col("t")).agg(
      count(lit(1)).as("leave"),
      sum(when(col("k") === 1L, 1L).otherwise(0L)).as("d1"),
      sum(when(col("k") === 2L, 1L).otherwise(0L)).as("d2"))
    val wPrefixExcl = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n_total = Σ leave (every subject leaves at exactly one t), so
    // one aggregate over the small cells table yields both the total
    // and the axis-cardinality guard input — no second base scan
    val withTotal = cells.crossJoin(broadcast(
      cells.agg(sum(col("leave")).as("n_total"), count(lit(1)).as("__k"))))
    val staged = withTotal
      .withColumn("leave",
        durationAxisGuard("aalenJohansen", col("__k"), col("leave")))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leave")).over(wPrefixExcl), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      // d = n_risk only at the final time (everyone at risk leaves;
      // no later row consumes the term) — guarded so DuckDB's ln(0),
      // which THROWS, never evaluates in an oracle replay
      .withColumn("lnterm",
        when(col("d") > 0L && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("s_minus",
        exp(coalesce(sum(col("lnterm")).over(wPrefixExcl), lit(0.0))))
      .withColumn("cif1", sum(
        col("s_minus") * (col("d1").cast("double") / col("n_risk").cast("double")))
        .over(wCum))
      .withColumn("cif2", sum(
        col("s_minus") * (col("d2").cast("double") / col("n_risk").cast("double")))
        .over(wCum))
    staged.filter(col("d") > 0L)
      .select(col("t"), col("n_risk"), col("d1"), col("d2"),
        col("s_minus"), col("cif1"), col("cif2"))
  }

  /** MEAN CUMULATIVE FUNCTION for RECURRENT events (Nelson 1988) —
    * [[nelsonAalen]]'s sibling when a subject can experience the
    * event repeatedly (repeat purchases, repeat failures, support
    * reopens): MCF(t) = Σ_{s ≤ t} d(s)/n(s), the expected cumulative
    * events per subject by time t, with n(s) = subjects AT RISK
    * (entered on or before s).
    *
    * Entry rows define each subject's risk start (its earliest
    * entry); event rows count only on/after the subject's entry —
    * events from never-entered subjects are ignored. Same bounded
    * geometry as the curve estimators: everything reduces to per-day
    * cells, the risk-set prefix and the MCF are window running sums
    * in pinned day order over the CALENDAR-BOUNDED axis, and each
    * day's d/n is one correctly-rounded division of exact integers —
    * hash-exact, no tolerance.
    *
    * Output per day with ≥ 1 counted event:
    * (day, n_at_risk, n_events, mcf).
    */
  def meanCumulativeFunction(
      df: DataFrame,
      subject: Column,
      ts: Column,
      isEntry: Column,
      isEvent: Column,
      periodSeconds: Long = 86400L): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    def flag(c: Column, name: String): Column =
      when(c.cast("boolean").isNull, raise_error(lit(
        s"meanCumulativeFunction: $name must be a non-null boolean")))
        .otherwise(c.cast("boolean"))
    val p = periodSeconds * 1000000L
    val base = df.select(subject.as("s"),
      floor(unix_micros(ts.cast("timestamp")) / lit(p)).cast("long").as("day"),
      flag(isEntry, "isEntry").as("en"), flag(isEvent, "isEvent").as("ev"))
      .filter(col("s").isNotNull && col("day").isNotNull)
    val entries = base.filter(col("en")).groupBy(col("s"))
      .agg(min(col("day")).as("eday"))
    val counted = base.filter(col("ev"))
      .join(entries.select(col("s").as("es"), col("eday")),
        col("s") === col("es") && col("day") >= col("eday"))
      .groupBy(col("day")).agg(count(lit(1)).as("d"))
    val entryCells = entries.groupBy(col("eday")).agg(count(lit(1)).as("e"))
    // day axis = event days ∪ entry days, so the risk prefix is
    // available at every event day; bounded by the calendar
    val axis = counted.select(col("day"))
      .union(entryCells.select(col("eday"))).distinct()
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dense = axis
      .join(entryCells, col("day") === col("eday"), "left")
      .join(counted.select(col("day").as("dd"), col("d")),
        col("day") === col("dd"), "left")
      .crossJoin(broadcast(axis.agg(count(lit(1)).as("__k"))))
      .select(col("day"),
        durationAxisGuard("meanCumulativeFunction", col("__k"),
          coalesce(col("e"), lit(0L))).as("e"),
        coalesce(col("d"), lit(0L)).as("d"))
      .withColumn("n_at_risk", sum(col("e")).over(wCum))
      .withColumn("mcf",
        sum(when(col("d") > 0L && col("n_at_risk") > 0L,
          col("d").cast("double") / col("n_at_risk").cast("double"))
          .otherwise(lit(0.0))).over(wCum))
    dense.filter(col("d") > 0L)
      .select(col("day"), col("n_at_risk"), col("d").as("n_events"),
        col("mcf"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series preparation: aggregate an event log to one
  * row per (key, period) and FILL THE GAPS — every period in the key's
  * observed [first, last] range gets a row, missing periods marked and
  * valued by the chosen interpolation. The resample/asfreq step every
  * downstream window model assumes (and, for training pipelines, the
  * densification before sequence models see the series).
  *
  * Fill modes:
  *   - `zero`: absent periods carry 0.0 — the correct reading when the
  *     value is an additive flow (nothing happened → nothing summed);
  *   - `locf`: last observation carried forward — the correct reading
  *     when the value is a level/state sample.
  *
  * Period ids are the same provably-exact
  * `floor(unix_micros / period)` arithmetic as `Funnel.retention`.
  *
  * Scale: the observed aggregation is ONE partial-aggregable pass
  * (events collapse map-side to key-periods); the dense grid
  * `sequence(first, last)` explodes per KEY — output rows are period
  * counts, not event counts; the LOCF window partitions by key over
  * that bounded per-key grid (days, not events — contrast the q48
  * lesson where the window spanned a whole stratum's rows). The grid
  * length is guarded (`maxPeriodsPerKey`) so one corrupt timestamp
  * cannot explode a key into a billion-row sequence.
  */
object TimeSeries {

  /** Shared first stage of every operator here: one partial-aggregable
    * pass from raw events to exact DECIMAL period sums, one row per
    * (key, period). Null keys, timestamps AND values drop — an event
    * that measures nothing must not mint an observed period whose sum
    * is null (it would read as a gap-filled row despite real events,
    * and a leading one would defeat gapFill's LOCF seed invariant).
    * Period ids are `floor(unix_micros / period)` — see [[Funnel.retention]]
    * for the exactness argument; oracles must replay floor(double
    * division), NOT DuckDB's `//` (truncates toward zero, diverging on
    * negative epochs).
    */
  private def perPeriodSums(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long): DataFrame = {
    val p = periodSeconds * 1000000L
    events
      .select(key.as("k"), ts.as("ts"), value.cast("decimal(18,6)").as("v"))
      .filter(col("k").isNotNull && col("ts").isNotNull && col("v").isNotNull)
      .select(col("k"), floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"),
        col("v"))
      .groupBy(col("k"), col("period"))
      .agg(sum(col("v")).as("psum"))
  }

  def gapFill(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      fillMode: String = "zero",
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(fillMode == "zero" || fillMode == "locf",
      s"fillMode must be 'zero' or 'locf', got '$fillMode'")
    require(maxPeriodsPerKey >= 1, s"maxPeriodsPerKey must be >= 1, got $maxPeriodsPerKey")
    val observed = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").cast("double").as("vsum"))
    val spans = observed.groupBy(col("k"))
      .agg(min(col("period")).as("p0"), max(col("period")).as("p1"))
      .select(col("k"),
        when(col("p1") - col("p0") + 1 > maxPeriodsPerKey, raise_error(concat(
          lit(s"gapFill: key "), col("k").cast("string"),
          lit(s" spans more than $maxPeriodsPerKey periods — corrupt timestamp " +
            "or wrong periodSeconds?"))))
          .otherwise(col("p0")).as("p0"),
        col("p1"))
    val grid = spans.select(col("k"),
      explode(sequence(col("p0"), col("p1"))).as("period"))
    val joined = grid.join(observed, Seq("k", "period"), "left")
      .withColumn("filled", col("vsum").isNull)
    val valued = fillMode match {
      case "zero" => joined.withColumn("value", coalesce(col("vsum"), lit(0.0)))
      case "locf" =>
        val w = Window.partitionBy(col("k")).orderBy(col("period"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // the first period of every key is observed by construction
        // (the span starts at the first observation), so LOCF never
        // sees a leading null
        joined.withColumn("value", last(col("vsum"), ignoreNulls = true).over(w))
    }
    valued.select(col("k").as("key"), col("period"), col("value"), col("filled"))
  }

  /** Per-key EXPONENTIAL MOVING AVERAGE — the classic smoother
    * `ema_t = α·v_t + (1−α)·ema_{t−1}` (seeded with the first
    * observation) over each key's period-sum series, returning the
    * final smoothed level per key. Inherently sequential per key, so
    * it folds a COLLECTED per-key series in period order — bounded by
    * the key's period span (days, not events), the same per-key
    * geometry as [[gapFill]]'s LOCF window. Gaps are not filled here:
    * compose with [[gapFill]] first when grid density matters.
    *
    * `alpha` must be an exact dyadic rational (k/4096) so α and 1−α
    * are the same doubles in every engine; the fold order is pinned
    * (period-ascending), but the decimal→double cast of the period
    * sums is double-rounded engine-specifically (the q114 lesson), so
    * cross-engine oracles compare within 1e-9.
    */
  def ema(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      alpha: Double = 0.25): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1), got $alpha")
    require(alpha * 4096.0 == math.rint(alpha * 4096.0),
      s"alpha must be an exact dyadic rational (k/4096) so 1-alpha is the " +
        s"same double in every engine, got $alpha")
    val perPeriod = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").cast("double").as("vd"))
    perPeriod.groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_periods"),
        max(col("period")).as("last_period"),
        sort_array(collect_list(struct(col("period"), col("vd")))).as("series"))
      .select(
        col("k").as("key"),
        col("n_periods"),
        col("last_period"),
        aggregate(
          slice(col("series"), lit(2), size(col("series")) - 1),
          element_at(col("series"), 1).getField("vd"),
          (acc, e) => acc * lit(1.0 - alpha) + e.getField("vd") * lit(alpha))
          .as("ema"))
  }

  /** Per-key HOLT LINEAR TREND (double exponential smoothing) over
    * daily period sums — [[ema]] plus an explicit trend component, the
    * capacity-forecasting workhorse:
    *
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * seeded l₁ = x₁, b₁ = 0; returns the final (level, trend) and the
    * one-step-ahead forecast level + trend. The fold runs inside ONE
    * `aggregate` higher-order function over each key's sorted period
    * array (bounded by the calendar, exactly like [[ema]] — no
    * windows, no driver state); the accumulator is a 2-element double
    * array so the recurrence stays a single codegen'd expression.
    * α and β must be dyadic (k/4096) so `1−α`/`1−β` are the same
    * doubles in every engine (the [[ema]] contract); oracles replay
    * the identical op order and compare within 1e-9 (the decimal
    * period sums double-round engine-specifically at the cast — the
    * q119 precedent).
    */
  def holtLinear(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      alpha: Double = 0.25,
      beta: Double = 0.125): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    for ((nm, x) <- Seq("alpha" -> alpha, "beta" -> beta)) {
      require(x > 0.0 && x < 1.0, s"$nm must be in (0, 1), got $x")
      require(x * 4096.0 == math.rint(x * 4096.0),
        s"$nm must be an exact dyadic rational (k/4096), got $x")
    }
    val perPeriod = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").cast("double").as("vd"))
    def step(acc: Column, e: Column): Column = {
      val l = acc.getItem(0)
      val b = acc.getItem(1)
      val x = e.getField("vd")
      val nl = lit(alpha) * x + lit(1.0 - alpha) * (l + b)
      // nl repeated verbatim in the trend update: a fold lambda cannot
      // bind intermediates, and the identical expression yields the
      // identical double
      array(nl, lit(beta) * (nl - l) + lit(1.0 - beta) * b)
    }
    perPeriod.groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_periods"),
        max(col("period")).as("last_period"),
        sort_array(collect_list(struct(col("period"), col("vd")))).as("series"))
      .select(
        col("k").as("key"),
        col("n_periods"),
        col("last_period"),
        aggregate(
          slice(col("series"), lit(2), size(col("series")) - 1),
          array(element_at(col("series"), 1).getField("vd"), lit(0.0)),
          step).as("__st"))
      .select(col("key"), col("n_periods"), col("last_period"),
        col("__st").getItem(0).as("level"),
        col("__st").getItem(1).as("trend"),
        (col("__st").getItem(0) + col("__st").getItem(1)).as("forecast_next"))
  }

  /** Per-key HOLT-WINTERS additive seasonal smoothing — [[holtLinear]]
    * plus a length-`m` seasonal component (triple exponential
    * smoothing, Winters 1960), the weekly-rhythm-aware forecaster:
    *
    *   l_t = α·(x_t − c_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   c_t = γ·(x_t − l_t) + (1−γ)·c_{t−m}
    *
    * seeded l₁ = x₁, b₁ = 0, c_{≤1} = 0 (the explicit
    * deterministic init — textbook variants differ here, so the
    * recurrence above IS the contract). Runs over the DENSE
    * zero-filled grid from [[gapFill]] — season position is
    * calendar-true; a gap would otherwise silently rotate the
    * seasonal register. Returns the final level/trend, the seasonal
    * factor the next period will use, and the one-step-ahead forecast
    * l + b + c_{t+1−m}.
    *
    * The fold is ONE `aggregate` HOF per key over the sorted period
    * array (bounded by `maxPeriodsPerKey` via gapFill's guard); the
    * accumulator is a (2+m)-element double array rotated each step —
    * head is the factor the CURRENT step consumes, the fresh factor
    * appends at the tail. α/β/γ must be dyadic (k/4096) and the fold
    * order is pinned; oracles replay the identical op order
    * (list_reduce) and compare within 1e-9.
    */
  def holtWinters(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      m: Int = 7,
      alpha: Double = 0.25,
      beta: Double = 0.125,
      gamma: Double = 0.25,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(m >= 2, s"season length m must be >= 2, got $m")
    for ((nm, x) <- Seq("alpha" -> alpha, "beta" -> beta, "gamma" -> gamma)) {
      require(x > 0.0 && x < 1.0, s"$nm must be in (0, 1), got $x")
      require(x * 4096.0 == math.rint(x * 4096.0),
        s"$nm must be an exact dyadic rational (k/4096), got $x")
    }
    val grid = gapFill(events, key, ts, value, periodSeconds, "zero", maxPeriodsPerKey)
    def step(acc: Column, e: Column): Column = {
      val l = acc.getItem(0)
      val b = acc.getItem(1)
      val c = acc.getItem(2)
      val x = e.getField("vd")
      // nl repeated verbatim in the trend and seasonal updates — a
      // fold lambda cannot bind intermediates; the identical
      // expression yields the identical double
      val nl = lit(alpha) * (x - c) + lit(1.0 - alpha) * (l + b)
      concat(
        array(nl, lit(beta) * (nl - l) + lit(1.0 - beta) * b),
        slice(acc, 4, m - 1),
        array(lit(gamma) * (x - nl) + lit(1.0 - gamma) * c))
    }
    grid.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_periods"),
        max(col("period")).as("last_period"),
        sort_array(collect_list(struct(col("period"), col("value").as("vd"))))
          .as("series"))
      .select(
        col("key"),
        col("n_periods"),
        col("last_period"),
        aggregate(
          slice(col("series"), lit(2), size(col("series")) - 1),
          concat(
            array(element_at(col("series"), 1).getField("vd"), lit(0.0)),
            array_repeat(lit(0.0), m)),
          step).as("__st"))
      .select(col("key"), col("n_periods"), col("last_period"),
        col("__st").getItem(0).as("level"),
        col("__st").getItem(1).as("trend"),
        col("__st").getItem(2).as("season_next"),
        (col("__st").getItem(0) + col("__st").getItem(1) + col("__st").getItem(2))
          .as("forecast_next"))
  }

  /** Per-key THEIL-SEN robust slope — the median of all pairwise
    * slopes `(y_j − y_i)/(x_j − x_i)` over each key's period-sum
    * series (Theil 1950 / Sen 1968): the robust-trend complement to
    * [[linearTrend]]'s OLS exactly as MAD complements the z-score —
    * up to ~29% of the points can be arbitrary outliers without
    * moving the estimate, where a single wild day drags an OLS line.
    *
    * Scale: the pair expansion is per-KEY over the period series —
    * O(span²) pairs per key, bounded by `maxPeriodsPerKey` (a 365-day
    * year is ~66k pairs; a corrupt timestamp would explode it, so the
    * guard fails loudly first). The expansion is a self-equi-join on
    * the key, both sides the (key, period) sums — co-partitioned, no
    * corpus-scale shuffle. Slopes divide exact decimal differences in
    * doubles; the median is the same interpolated percentile as
    * [[Profiling.madOutliers]], so oracles compare within 1e-9.
    */
  def theilSenSlope(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 10000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(maxPeriodsPerKey >= 2, s"maxPeriodsPerKey must be >= 2, got $maxPeriodsPerKey")
    val perPeriod = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").cast("double").as("y"))
    val spans = perPeriod.groupBy(col("k"))
      .agg(count(lit(1)).as("n_periods"))
      .select(col("k"),
        when(col("n_periods") > maxPeriodsPerKey, raise_error(concat(
          lit(s"theilSenSlope: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods — the O(span²) pair " +
            "expansion needs a coarser period or a pre-filter"))))
          .otherwise(col("n_periods")).as("n_periods"))
    val a = perPeriod.select(col("k"), col("period").as("p1"), col("y").as("y1"))
    val b = perPeriod.select(col("k"), col("period").as("p2"), col("y").as("y2"))
    val slopes = a.join(b, Seq("k")).filter(col("p1") < col("p2"))
      .select(col("k"),
        ((col("y2") - col("y1"))
          / (col("p2") - col("p1")).cast("double")).as("slope"))
    slopes.groupBy(col("k"))
      .agg(percentile(col("slope"), lit(0.5)).as("ts_slope"))
      .join(spans, Seq("k"), "right")
      .select(col("k").as("key"), col("n_periods"), col("ts_slope"))
  }

  /** Per-key AUTOCORRELATION FUNCTION at the given lags — the
    * seasonality/persistence diagnostic: r_k = Σ(x_t−x̄)(x_{t+k}−x̄)
    * / Σ(x_t−x̄)², computed over the DENSE zero-filled daily grid
    * (lag positions are calendar-true; on the raw observed series a
    * gap would silently compare non-adjacent days).
    *
    * All sufficient statistics (n, Σx, Σx², and per lag: pair count,
    * Σx·y, head/tail sums) accumulate EXACTLY — over the series
    * values pre-scaled to INTEGER micro-units (×10⁶, scale-0
    * decimals), because a scale-12 product sum cast to double is
    * double-rounded engine-specifically (the q114 ulp) while an
    * integer-valued decimal→double cast is correctly rounded
    * everywhere; the ×10⁶ factors cancel in the r_k ratio. The lag
    * pairing is a `lead` window per key over the bounded period grid
    * (days, not events — the [[gapFill]] geometry), and the closed
    * form runs in pinned-order doubles, so oracles hash-match.
    * Constant series (zero variance) emit null. Output: one row per
    * (key, lag): key, lag, n_pairs, acf.
    */
  def autocorrelation(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      lags: Seq[Int],
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must all be >= 1, got $lags")
    require(lags.distinct == lags, s"lags must be distinct, got $lags")
    val grid = gapFill(events, key, ts, value, periodSeconds, "zero", maxPeriodsPerKey)
      .select(col("key").as("k"), col("period"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("decimal(19,0)").as("x"))
    val w = Window.partitionBy(col("k")).orderBy(col("period"))
    val withLeads = lags.foldLeft(grid) { (df, l) =>
      df.withColumn(s"y$l", lead(col("x"), l).over(w))
    }
    val lagAggs = lags.flatMap { l =>
      val y = col(s"y$l")
      Seq(
        count(y).as(s"nk$l"),
        sum(col("x") * y).as(s"p$l"),
        sum(when(y.isNotNull, col("x"))).as(s"h$l"),
        sum(y).as(s"t$l"))
    }
    val allAggs = Seq(
      count(lit(1)).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("q")) ++ lagAggs
    val stats = withLeads.groupBy(col("k")).agg(allAggs.head, allAggs.tail: _*)
    val sD = col("s").cast("double")
    val nD = col("n").cast("double")
    val xb = sD / nD
    val den = col("q").cast("double") - sD * xb
    val perLag = lags.map { l =>
      val acf = (col(s"p$l").cast("double") - xb * coalesce(col(s"h$l"), lit(0))
        .cast("double") - xb * coalesce(col(s"t$l"), lit(0)).cast("double")
        + col(s"nk$l").cast("double") * xb * xb) / den
      struct(lit(l).as("lag"), col(s"nk$l").as("n_pairs"),
        when(den > 0.0 && col(s"nk$l") > 0L, acf)
          .otherwise(lit(null).cast("double")).as("acf"))
    }
    stats.select(col("k").as("key"), explode(array(perLag: _*)).as("e"))
      .select(col("key"), col("e.lag"), col("e.n_pairs"), col("e.acf"))
  }

  /** Per-key MANN-KENDALL trend test (Mann 1945, Kendall 1975) — the
    * nonparametric "is there a monotonic trend" significance test
    * that [[theilSenSlope]] estimates the magnitude of: S = Σ_{i<j}
    * sign(x_j − x_i) over the OBSERVED period-sum series (same
    * geometry and `maxPeriodsPerKey` guard as Theil-Sen — the pair
    * expansion is per key over periods, never events), tie-corrected
    * variance (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, and the
    * continuity-corrected z. S and the tie sums are exact integers;
    * z is pinned-order doubles; n < 2 or zero variance emit null z.
    * Output: key, n_periods, s_stat, z.
    */
  def mannKendall(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 10000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(maxPeriodsPerKey >= 2, s"maxPeriodsPerKey must be >= 2, got $maxPeriodsPerKey")
    val perPeriod = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").as("y"))
    val spans = perPeriod.groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"),
        when(col("n") > maxPeriodsPerKey, raise_error(concat(
          lit("mannKendall: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods — the O(span²) pair " +
            "expansion needs a coarser period or a pre-filter"))))
          .otherwise(col("n")).as("n"))
    val a = perPeriod.select(col("k"), col("period").as("p1"), col("y").as("y1"))
    val b = perPeriod.select(col("k"), col("period").as("p2"), col("y").as("y2"))
    val sSum = a.join(b, Seq("k")).filter(col("p1") < col("p2"))
      .groupBy(col("k"))
      .agg(sum(signum(col("y2") - col("y1")).cast("long")).as("s_stat"))
    val tieSum = perPeriod.groupBy(col("k"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"))
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)).as("ties"))
    val joined = spans
      .join(sSum, Seq("k"), "left")
      .join(tieSum, Seq("k"), "left")
      .select(col("k"), col("n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"), col("ties"))
    val nL = col("n")
    val varS =
      (nL * (nL - 1L) * (lit(2L) * nL + 5L) - col("ties")).cast("double") / lit(18.0)
    val sD = col("s_stat").cast("double")
    val z = when(col("s_stat") > 0L, (sD - lit(1.0)) / sqrt(varS))
      .when(col("s_stat") < 0L, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    joined.select(col("k").as("key"), col("n").as("n_periods"), col("s_stat"),
      when(nL >= 2L && varS > 0.0, z).otherwise(lit(null).cast("double")).as("z"))
  }

  /** Per-key ADDITIVE SEASONAL DECOMPOSITION (STL-lite) — the classic
    * two-step: remove a CENTERED MOVING-AVERAGE trend (window
    * `2h+1` days over the zero-filled dense grid; edges where the
    * full window doesn't exist are excluded, the textbook rule), then
    * average the detrended series per weekday (epoch-day mod 7 — the
    * q183 calendar-free discipline) into the seasonal INDEX. Exactness:
    * the detrended value is kept ×(2h+1) in decimal (d = (2h+1)·x −
    * Σwindow — no 1/(2h+1) rational ever materializes), so the per-
    * weekday mean is ONE pinned double division of exact decimal sums
    * — hash-exact oracles. Output: (key, weekday, n_days, seasonal),
    * 7 bounded rows per key.
    */
  def seasonalIndex(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      halfWindow: Int = 3,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val span = 2 * halfWindow + 1
    val grid = gapFill(events, key, ts, value, periodSeconds, "zero", maxPeriodsPerKey)
      .select(col("key").as("k"), col("period"),
        col("value").cast("decimal(18,6)").as("x"))
    val w = Window.partitionBy(col("k")).orderBy(col("period"))
      .rowsBetween(-halfWindow, halfWindow)
    // the grid is dense, so a full frame ⇔ count == span
    val det = grid
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === span)
      .select(col("k"), pmod(col("period"), lit(7L)).as("weekday"),
        (col("x") * span - col("s")).as("d"))
    det.groupBy(col("k"), col("weekday"))
      .agg(count(lit(1)).as("n_days"), sum(col("d")).as("sd"))
      .select(col("k").as("key"), col("weekday"), col("n_days"),
        (col("sd").cast("double") /
          (lit(span.toDouble) * col("n_days").cast("double"))).as("seasonal"))
  }

  /** Per-key WALD-WOLFOWITZ RUNS TEST around the series mean — "is
    * the sequence of above/below-average days random, or does it
    * clump?" (momentum/oscillation diagnostic; the mean-based variant
    * so the reference level is exact). The at-or-above indicator
    * compares n·x_t ≥ Σx in EXACT decimal arithmetic (no division —
    * values exactly at the mean count as above, by contract); the run
    * count is one lag window over the bounded per-key period grid
    * (zero-filled, calendar-true). R, n₁, n₀ are exact integers; the
    * normal-approximation z (μ = 2n₁n₀/n + 1, σ² = 2n₁n₀(2n₁n₀−n)
    * /(n²(n−1))) is pinned-order doubles. One-sided series (all above
    * or all below) emit null z. Output: key, n_periods, n_above,
    * runs, z.
    */
  def runsTest(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    val grid = gapFill(events, key, ts, value, periodSeconds, "zero", maxPeriodsPerKey)
      .select(col("key").as("k"), col("period"),
        col("value").cast("decimal(18,6)").as("x"))
    val sums = grid.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .select(col("k").as("sk"), col("n"), col("s"))
    val w = Window.partitionBy(col("k")).orderBy(col("period"))
    val signed = grid.join(sums, col("k") === col("sk"))
      // n·x ≥ Σx  ⇔  x ≥ mean, with no division: decimal-exact in
      // every engine (DuckDB needs the (19,6) cast before the product
      // — mirrored in oracles)
      .withColumn("above",
        (col("x") * col("n").cast("decimal(12,0)") >= col("s")).cast("int"))
      .withColumn("flip",
        when(lag(col("above"), 1).over(w).isNull, 0)
          .when(lag(col("above"), 1).over(w) =!= col("above"), 1)
          .otherwise(0))
    val st = signed.groupBy(col("k")).agg(
      max(col("n")).as("n"),
      sum(col("above")).cast("long").as("n1"),
      (sum(col("flip")) + 1L).cast("long").as("runs"))
    val nD = col("n").cast("double")
    val n1D = col("n1").cast("double")
    val n0D = (col("n") - col("n1")).cast("double")
    val two = lit(2.0) * n1D * n0D
    val mu = two / nD + lit(1.0)
    val varR = two * (two - nD) / (nD * nD * (nD - lit(1.0)))
    st.select(col("k").as("key"), col("n").as("n_periods"), col("n1").as("n_above"),
      col("runs"),
      when(col("n1") > 0L && col("n") - col("n1") > 0L && col("n") >= 2L && varR > 0.0,
        (col("runs").cast("double") - mu) / sqrt(varR))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** Per-key BINARY-SEGMENTATION changepoints (depth 2 — up to three
    * splits) over the dense daily series: the multi-changepoint
    * extension of q124's single-shift CUSUM. The split criterion at
    * position t of a segment of length n' with prefix sum c'(t) and
    * total T' is the EXACT INTEGER evidence |n'·c'(t) − t·T'| —
    * proportional to the balanced mean-shift statistic, chosen over
    * the normalized CUSUM so the argmax is integer arithmetic with a
    * deterministic tie rule (smallest t) instead of a float ranking;
    * values pre-scale to ×10⁶ micro-units (the q232 discipline) so
    * prefix sums stay scale-0 decimals. Level 1 picks each key's best
    * split of the whole series; level 2 re-runs the rule inside each
    * resulting segment. Everything is per-key windows over the
    * bounded period grid plus tiny joins — no driver loops. Output:
    * (key, level, seg_start, seg_len, split_pos, evidence) — one
    * level-1 row and up to two level-2 rows per key (segments of
    * length < 2 produce no split; split_pos counts 1-based positions
    * from the series start, the split being BETWEEN split_pos and
    * split_pos+1).
    */
  def binarySegmentation(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    val grid = gapFill(events, key, ts, value, periodSeconds, "zero", maxPeriodsPerKey)
      .select(col("key").as("k"), col("period"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("decimal(19,0)").as("x"))
    val w = Window.partitionBy(col("k")).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wk = Window.partitionBy(col("k"))
    val pre = grid.select(col("k"),
      (row_number().over(Window.partitionBy(col("k")).orderBy(col("period"))))
        .cast("long").as("t"),
      sum(col("x")).over(w).as("c"))
      .withColumn("n", max(col("t")).over(wk))
      .withColumn("total", max(col("c")).over(wk))
      .localCheckpoint(true) // level 1 + two level-2 passes read this
    def bestSplit(df: DataFrame, segStart: Column, segLen: Column,
        cBefore: Column, segTotal: Column): DataFrame = {
      // local position p = t − segStart + 1 in [1, segLen − 1];
      // evidence = |segLen·(c − cBefore) − p·segTotal| — exact
      // decimal, with operands pinned to (12,0)·(25,0) so the
      // product type stays within precision 38 in BOTH engines
      // (DuckDB raises past 38 — the q112 lesson; the (25,0)
      // envelope covers micro-unit prefix sums to 10²⁵)
      val p = col("t") - segStart + 1L
      val ev = abs(
        segLen.cast("decimal(12,0)") * (col("c") - cBefore).cast("decimal(25,0)")
          - p.cast("decimal(12,0)") * segTotal.cast("decimal(25,0)"))
      df.filter(p >= 1L && p <= segLen - 1L)
        .select(col("k"), segStart.as("seg_start"), segLen.as("seg_len"),
          struct(ev.as("ev"), (-col("t")).as("negt")).as("cand"))
        .groupBy(col("k"), col("seg_start"), col("seg_len"))
        .agg(max(col("cand")).as("m"))
        .select(col("k"), col("seg_start"), col("seg_len"),
          (-col("m.negt")).as("split_pos"),
          col("m.ev").cast("double").as("evidence"))
    }
    val l1 = bestSplit(pre, lit(1L), col("n"), lit(0).cast("decimal(38,0)"),
      col("total"))
    // level 2: join the level-1 split back; left segment [1, s],
    // right segment [s+1, n]
    val s1 = l1.select(col("k").as("sk"), col("split_pos").as("s1"))
    val withS = pre.join(s1, col("k") === col("sk"))
      .withColumn("cAtS", max(when(col("t") === col("s1"), col("c"))).over(wk))
    val left = bestSplit(withS, lit(1L), col("s1"),
      lit(0).cast("decimal(38,0)"), col("cAtS"))
    val right = bestSplit(withS, col("s1") + 1L, col("n") - col("s1"),
      col("cAtS"), col("total") - col("cAtS"))
    l1.select(col("k").as("key"), lit(1).as("level"), col("seg_start"),
      col("seg_len"), col("split_pos"), col("evidence"))
      .unionByName(left.select(col("k").as("key"), lit(2).as("level"),
        col("seg_start"), col("seg_len"), col("split_pos"), col("evidence")))
      .unionByName(right.select(col("k").as("key"), lit(2).as("level"),
        col("seg_start"), col("seg_len"), col("split_pos"), col("evidence")))
  }

  /** Per-key KENDALL τ-b rank correlation between each key's daily
    * VOLUME and daily VALUE (count vs sum per period) — the rank
    * member of the correlation family (Pearson q120/q238 measure
    * linearity; τ-b asks only "do they move together", robust to any
    * monotone transform): τb = (P − Q) / √((n₀−n₁)(n₀−n₂)) over
    * concordant/discordant period pairs, ties counted per axis
    * directly from the pairs. Same bounded per-key O(span²) pair
    * geometry as [[theilSenSlope]]/[[qnScale]]; P, Q, tie counts and
    * n₀ are exact integers; the closed form is pinned doubles —
    * hash-exact. Keys with zero usable variance emit null. Output:
    * (key, n_periods, concordant, discordant, tau_b).
    */
  def kendallTauDaily(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 10000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val p = periodSeconds * 1000000L
    val per = events
      .select(key.as("k"), ts.as("ts"), value.cast("decimal(18,6)").as("v"))
      .filter(col("k").isNotNull && col("ts").isNotNull && col("v").isNotNull)
      .select(col("k"), floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"),
        col("v"))
      .groupBy(col("k"), col("period"))
      .agg(count(lit(1)).as("x"), sum(col("v")).as("y"))
    val spans = per.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .select(col("k"),
        when(col("n") > maxPeriodsPerKey, raise_error(concat(
          lit("kendallTauDaily: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods — the O(span²) pair " +
            "expansion needs a coarser period or a pre-filter"))))
          .otherwise(col("n")).as("n"))
    val a = per.select(col("k"), col("period").as("p1"),
      col("x").as("x1"), col("y").as("y1"))
    val b = per.select(col("k"), col("period").as("p2"),
      col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, Seq("k")).filter(col("p1") < col("p2"))
      .select(col("k"),
        signum((col("x2") - col("x1")).cast("double")).cast("long").as("cx"),
        signum(col("y2") - col("y1")).cast("long").as("cy"))
    val st = pairs.groupBy(col("k")).agg(
      sum(when(col("cx") * col("cy") > 0L, 1L).otherwise(0L)).as("conc"),
      sum(when(col("cx") * col("cy") < 0L, 1L).otherwise(0L)).as("disc"),
      sum(when(col("cx") === 0L, 1L).otherwise(0L)).as("tx"),
      sum(when(col("cy") === 0L, 1L).otherwise(0L)).as("ty"))
    val joined = spans.join(st, Seq("k"), "left")
      .select(col("k"), col("n"),
        coalesce(col("conc"), lit(0L)).as("conc"),
        coalesce(col("disc"), lit(0L)).as("disc"),
        coalesce(col("tx"), lit(0L)).as("tx"),
        coalesce(col("ty"), lit(0L)).as("ty"))
    // `div`, not `/`: long/long `/` detours through a double
    val n0 = expr("n * (n - 1) div 2")
    val d1 = (n0 - col("tx")).cast("double")
    val d2 = (n0 - col("ty")).cast("double")
    joined.select(col("k").as("key"), col("n").as("n_periods"),
      col("conc").as("concordant"), col("disc").as("discordant"),
      when(d1 > 0.0 && d2 > 0.0,
        (col("conc") - col("disc")).cast("double") / sqrt(d1 * d2))
        .otherwise(lit(null).cast("double")).as("tau_b"))
  }

  /** Per-key ORDINAL ASSOCIATION — Goodman–Kruskal γ (1954) and both
    * Somers' D asymmetries (1962) between each key's daily VOLUME and
    * daily VALUE, from the same concordance counts as
    * [[kendallTauDaily]]'s τ-b but with the three OTHER tie
    * treatments the analyst picks between:
    *
    *   γ      = (C − D) / (C + D)          — ties excluded entirely
    *                                          (the ordinal analyst's
    *                                          headline number),
    *   D_y|x  = (C − D) / (n₀ − T_x)       — y dependent: ties on the
    *                                          PREDICTOR don't count
    *                                          against it (the
    *                                          rank-regression /
    *                                          AUC-companion form:
    *                                          D_y|x = 2·AUC − 1 for a
    *                                          binary y),
    *   D_x|y  = (C − D) / (n₀ − T_y)       — the mirror.
    *
    * Identical bounded per-key O(span²) pair geometry and guard as
    * [[kendallTauDaily]]; C, D, tie counts and n₀ are exact integers;
    * each statistic is ONE double division of exact integers —
    * hash-exact. Degenerate denominators emit null. Output: (key,
    * n_periods, concordant, discordant, ties_x, ties_y, gamma,
    * somers_d_yx, somers_d_xy).
    */
  def ordinalAssociationDaily(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 10000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val p = periodSeconds * 1000000L
    val per = events
      .select(key.as("k"), ts.as("ts"), value.cast("decimal(18,6)").as("v"))
      .filter(col("k").isNotNull && col("ts").isNotNull && col("v").isNotNull)
      .select(col("k"), floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"),
        col("v"))
      .groupBy(col("k"), col("period"))
      .agg(count(lit(1)).as("x"), sum(col("v")).as("y"))
    val spans = per.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .select(col("k"),
        when(col("n") > maxPeriodsPerKey, raise_error(concat(
          lit("ordinalAssociationDaily: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods — the O(span²) pair " +
            "expansion needs a coarser period or a pre-filter"))))
          .otherwise(col("n")).as("n"))
    val a = per.select(col("k"), col("period").as("p1"),
      col("x").as("x1"), col("y").as("y1"))
    val b = per.select(col("k"), col("period").as("p2"),
      col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, Seq("k")).filter(col("p1") < col("p2"))
      .select(col("k"),
        signum((col("x2") - col("x1")).cast("double")).cast("long").as("cx"),
        signum(col("y2") - col("y1")).cast("long").as("cy"))
    val st = pairs.groupBy(col("k")).agg(
      sum(when(col("cx") * col("cy") > 0L, 1L).otherwise(0L)).as("conc"),
      sum(when(col("cx") * col("cy") < 0L, 1L).otherwise(0L)).as("disc"),
      sum(when(col("cx") === 0L, 1L).otherwise(0L)).as("tx"),
      sum(when(col("cy") === 0L, 1L).otherwise(0L)).as("ty"))
    val joined = spans.join(st, Seq("k"), "left")
      .select(col("k"), col("n"),
        coalesce(col("conc"), lit(0L)).as("conc"),
        coalesce(col("disc"), lit(0L)).as("disc"),
        coalesce(col("tx"), lit(0L)).as("tx"),
        coalesce(col("ty"), lit(0L)).as("ty"))
    // `div`, not `/`: long/long `/` detours through a double
    val n0 = expr("n * (n - 1) div 2")
    val cd = (col("conc") - col("disc")).cast("double")
    def ratio(den: Column): Column =
      when(den.cast("double") > 0.0, cd / den.cast("double"))
        .otherwise(lit(null).cast("double"))
    joined.select(col("k").as("key"), col("n").as("n_periods"),
      col("conc").as("concordant"), col("disc").as("discordant"),
      col("tx").as("ties_x"), col("ty").as("ties_y"),
      ratio(col("conc") + col("disc")).as("gamma"),
      ratio(n0 - col("tx")).as("somers_d_yx"),
      ratio(n0 - col("ty")).as("somers_d_xy"))
  }

  /** Per-key HOEFFDING'S D (Hoeffding, Ann. Math. Statist. 1948)
    * between each key's daily VOLUME and daily VALUE — the
    * nonparametric test of GENERAL dependence: where τ-b/γ/ρ can
    * read exactly zero on a perfect U-shaped relation (monotone-up
    * cancels monotone-down), D measures the integrated squared gap
    * between the joint distribution and the product of its margins,
    * so ANY dependence moves it. The Hollander–Wolfe mid-rank form
    * with ties:
    *
    *   D = 30 · [(n−2)(n−3)·D1 + D2 − 2(n−2)·D3]
    *          / [n(n−1)(n−2)(n−3)(n−4)],
    *   D1 = Σᵢ (Qᵢ−1)(Qᵢ−2),
    *   D2 = Σᵢ (Rᵢ−1)(Rᵢ−2)(Sᵢ−1)(Sᵢ−2),
    *   D3 = Σᵢ (Rᵢ−2)(Sᵢ−2)(Qᵢ−1),
    *
    * where Rᵢ, Sᵢ are the mid-ranks of xᵢ, yᵢ and Qᵢ counts points
    * strictly below i in BOTH coordinates (+1 for i itself; ties
    * weigh ½ per tied axis, ¼ both — the Hmisc::hoeffd convention).
    * D ∈ [−0.5, 1] with 1 at exact (possibly non-monotone injective)
    * dependence.
    *
    * Exactness: mid-ranks are half-integers and Qᵢ quarter-integers,
    * so R2 = 2R, S2 = 2S, Q4 = 4Q are exact integers off the pair
    * counts, and the three sums scale uniformly by 16:
    * 16·D1 = Σ(Q4−4)(Q4−8), 16·D2 = Σ(R2−2)(R2−4)(S2−2)(S2−4),
    * 16·D3 = Σ(R2−4)(S2−4)(Q4−4). The ×16 numerator rides as an
    * exact decimal string digest and D is ONE double division of two
    * correctly-rounded exact integers — hash-exact. Same bounded
    * per-key O(span²) pair geometry and guard as [[kendallTauDaily]]
    * (both (i,j) orientations — the φ kernel is asymmetric). Keys
    * with n < 5 emit null (the normalizer vanishes). Output: (key,
    * n_periods, d_num16, hoeffding_d).
    */
  def hoeffdingsDDaily(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 10000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val p = periodSeconds * 1000000L
    val per = events
      .select(key.as("k"), ts.as("ts"), value.cast("decimal(18,6)").as("v"))
      .filter(col("k").isNotNull && col("ts").isNotNull && col("v").isNotNull)
      .select(col("k"), floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"),
        col("v"))
      .groupBy(col("k"), col("period"))
      .agg(count(lit(1)).as("x"), sum(col("v")).as("y"))
    val spans = per.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .select(col("k"),
        when(col("n") > maxPeriodsPerKey, raise_error(concat(
          lit("hoeffdingsDDaily: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods — the O(span²) pair " +
            "expansion needs a coarser period or a pre-filter"))))
          .otherwise(col("n")).as("n"))
    val a = per.select(col("k"), col("period").as("p1"),
      col("x").as("x1"), col("y").as("y1"))
    val b = per.select(col("k"), col("period").as("p2"),
      col("x").as("x2"), col("y").as("y2"))
    // φ from i's (= p1's) perspective over ALL j ≠ i: 2·c(xᵢ−xⱼ)
    val cx2 = when(col("x2") < col("x1"), 2L)
      .when(col("x2") === col("x1"), 1L).otherwise(0L)
    val cy2 = when(col("y2") < col("y1"), 2L)
      .when(col("y2") === col("y1"), 1L).otherwise(0L)
    val perI = a.join(b, Seq("k")).filter(col("p1") =!= col("p2"))
      .select(col("k"), col("p1"), cx2.as("cx2"), cy2.as("cy2"))
      .groupBy(col("k"), col("p1"))
      .agg((sum(col("cx2")) + 2L).as("r2"),
        (sum(col("cy2")) + 2L).as("s2"),
        (sum(col("cx2") * col("cy2")) + 4L).as("q4"))
    val d9 = "decimal(9,0)"
    val d38 = "decimal(38,0)"
    val sums = perI.groupBy(col("k")).agg(
      sum(((col("q4") - 4L).cast(d9) * (col("q4") - 8L).cast(d9)).cast(d38))
        .as("d1_16"),
      sum(((col("r2") - 2L).cast(d9) * (col("r2") - 4L).cast(d9) *
        (col("s2") - 2L).cast(d9) * (col("s2") - 4L).cast(d9)).cast(d38))
        .as("d2_16"),
      sum(((col("r2") - 4L).cast(d9) * (col("s2") - 4L).cast(d9) *
        (col("q4") - 4L).cast(d9)).cast(d38)).as("d3_16"))
    val joined = spans.join(sums, Seq("k"), "left")
    val nD = col("n").cast(d9)
    val num16 = ((nD - 2L) * (nD - 3L)).cast(d38) * col("d1_16") +
      col("d2_16") - (lit(2L).cast(d9) * (nD - 2L)).cast(d38) * col("d3_16")
    val den16 = (nD * (nD - 1L)).cast(d38) *
      ((nD - 2L) * (nD - 3L)).cast(d38) * (nD - 4L).cast(d38) * lit(16L).cast(d38)
    joined.select(col("k").as("key"), col("n").as("n_periods"),
      when(col("n") >= 5L, num16.cast("string"))
        .otherwise(lit(null).cast("string")).as("d_num16"),
      when(col("n") >= 5L,
        (lit(30L).cast(d38) * num16).cast("double") / den16.cast("double"))
        .otherwise(lit(null).cast("double")).as("hoeffding_d"))
  }

  /** Per-key DISTANCE CORRELATION (Székely, Rizzo & Bakirov, Ann.
    * Statist. 2007) between each key's daily VOLUME and daily VALUE —
    * the modern dependence coefficient with the property the whole
    * classical family lacks: dCor = 0 IFF the two series are
    * independent (Pearson needs linearity, τ/γ/ρ monotonicity,
    * [[hoeffdingsDDaily]] is a test statistic without a natural 0–1
    * scale). dCor reads from the double-centered pairwise distance
    * matrices:
    *
    *   A_ij = a_ij − ā_i − ā_j + ā,   a_ij = |x_i − x_j|  (B from y),
    *   dCov² = (1/n²)·Σ A_ij·B_ij,
    *   dCor  = √( dCov² / √(dVarX·dVarY) ).
    *
    * Exactness: x is the integer daily count and y the exact daily
    * CENTS total, so with everything scaled by n²,
    * A′_ij = n²·a_ij − n·ra_i − n·ra_j + Ta is an exact integer and
    * the three sums Σ A′B′, Σ A′², Σ B′² are exact decimal(38,0)
    * digests (the n⁶ scale cancels in the ratio). dCor is then a
    * pinned chain of correctly-rounded IEEE ops — two casts, one
    * multiply, two sqrt (sqrt is correctly rounded by IEEE 754), one
    * division — so even the float replays bit-for-bit. Same bounded
    * per-key O(span²) pair geometry as [[kendallTauDaily]], with a
    * tighter default guard (the full n² matrix ships A′ numerators ≤
    * 16·n⁶·a²ᵐᵃˣ — 2000 periods keeps them inside decimal(38)).
    * Degenerate variance (a constant series) emits null. Output:
    * (key, n_periods, dcov2_num, dvarx_num, dvary_num, dcor).
    */
  def distanceCorrelationDaily(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 2000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(maxPeriodsPerKey <= 20000,
      s"maxPeriodsPerKey above 20000 overflows the decimal(38) digests, got $maxPeriodsPerKey")
    val p = periodSeconds * 1000000L
    val per = events
      .select(key.as("k"), ts.as("ts"),
        when(value.isNull || ts.isNull, raise_error(lit(
          "distanceCorrelationDaily: value/ts must be non-null — filter first")))
          .otherwise(round(value * 100).cast("long")).as("cents"))
      .filter(col("k").isNotNull)
      .select(col("k"), floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"),
        col("cents"))
      .groupBy(col("k"), col("period"))
      .agg(count(lit(1)).as("x"), sum(col("cents")).as("y"))
    val spans = per.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .select(col("k"),
        when(col("n") > maxPeriodsPerKey, raise_error(concat(
          lit("distanceCorrelationDaily: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods — the O(span²) pair " +
            "matrix needs a coarser period or a pre-filter"))))
          .otherwise(col("n")).as("n"))
    val a = per.select(col("k"), col("period").as("p1"),
      col("x").as("x1"), col("y").as("y1"))
    val b = per.select(col("k"), col("period").as("p2"),
      col("x").as("x2"), col("y").as("y2"))
    // the FULL matrix incl. the zero diagonal — the V-statistic
    // double-centering needs every row/column mean
    val pairs = a.join(b, Seq("k"))
      .select(col("k"), col("p1"), col("p2"),
        abs(col("x1") - col("x2")).as("aij"),
        abs(col("y1") - col("y2")).as("bij"))
    val rsum = pairs.groupBy(col("k"), col("p1"))
      .agg(sum(col("aij")).as("ra"), sum(col("bij")).as("rb"))
    val tot = rsum.groupBy(col("k"))
      .agg(sum(col("ra")).as("ta"), sum(col("rb")).as("tb"))
    val rj = rsum.select(col("k"), col("p1").as("p2"),
      col("ra").as("raj"), col("rb").as("rbj"))
    val d38 = "decimal(38,0)"
    val joinedPairs = pairs
      .join(rsum, Seq("k", "p1"))
      .join(rj, Seq("k", "p2"))
      .join(tot, Seq("k"))
      .join(spans, Seq("k"))
    val nD = col("n").cast("decimal(9,0)")
    def centered(v: Column, ri: Column, rjc: Column, t: Column): Column =
      ((nD * nD).cast(d38) * v.cast(d38) -
        nD.cast(d38) * ri.cast(d38) - nD.cast(d38) * rjc.cast(d38) +
        t.cast(d38)).cast(d38)
    val ap = centered(col("aij"), col("ra"), col("raj"), col("ta"))
    val bp = centered(col("bij"), col("rb"), col("rbj"), col("tb"))
    val sums = joinedPairs.groupBy(col("k"), col("n")).agg(
      sum((ap * bp).cast(d38)).as("sab"),
      sum((ap * ap).cast(d38)).as("saa"),
      sum((bp * bp).cast(d38)).as("sbb"))
    val out = spans.join(sums, Seq("k", "n"), "left")
    val ok = col("saa") > 0L && col("sbb") > 0L
    out.select(col("k").as("key"), col("n").as("n_periods"),
      col("sab").cast("string").as("dcov2_num"),
      col("saa").cast("string").as("dvarx_num"),
      col("sbb").cast("string").as("dvary_num"),
      when(ok, sqrt(col("sab").cast("double") /
        sqrt(col("saa").cast("double") * col("sbb").cast("double"))))
        .otherwise(lit(null).cast("double")).as("dcor"))
  }

  /** Per-key Qn ROBUST SCALE (Rousseeuw & Croux 1993) — the k-th
    * smallest pairwise absolute difference with k = C(h, 2),
    * h = ⌊n/2⌋ + 1: a 50%-breakdown scale estimate that, unlike MAD,
    * needs no location estimate and stays efficient under asymmetry.
    * Emitted RAW (the literature's 2.2219·d_n consistency factor is
    * not a dyadic rational — callers multiply; the raw quartile is
    * the exact, hash-matchable quantity).
    *
    * Same geometry as [[theilSenSlope]]: the O(span²) pair expansion
    * runs per key over the PERIOD series (guarded by
    * `maxPeriodsPerKey`), differences stay exact decimal, and the
    * selection is an integer-rank crossing over each key's
    * distinct-difference cumulative ([[WeightedQuantile]] shape) —
    * no interpolation, the answer is an existing |difference|.
    * Output: (key, n_periods, qn_raw). Keys with < 2 periods emit
    * null.
    */
  def qnScale(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 10000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(maxPeriodsPerKey >= 2, s"maxPeriodsPerKey must be >= 2, got $maxPeriodsPerKey")
    val perPeriod = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").as("y"))
    val spans = perPeriod.groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"),
        when(col("n") > maxPeriodsPerKey, raise_error(concat(
          lit("qnScale: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods — the O(span²) pair " +
            "expansion needs a coarser period or a pre-filter"))))
          .otherwise(col("n")).as("n"))
    val a = perPeriod.select(col("k"), col("period").as("p1"), col("y").as("y1"))
    val b = perPeriod.select(col("k"), col("period").as("p2"), col("y").as("y2"))
    val diffs = a.join(b, Seq("k")).filter(col("p1") < col("p2"))
      .select(col("k"), abs(col("y2") - col("y1")).as("dv"))
    val perDiff = diffs.groupBy(col("k"), col("dv")).agg(count(lit(1)).as("c"))
    val wv = Window.partitionBy(col("k")).orderBy(col("dv"))
    val cum = perDiff.select(col("k"), col("dv"), sum(col("c")).over(wv).as("cum"))
    // h = n div 2 + 1; rank = h·(h−1)/2 — exact long arithmetic
    val ranks = spans.select(col("k").as("rk"), col("n"),
      expr("(n div 2 + 1) * (n div 2) div 2").as("rank"))
    val sel = cum.join(ranks, col("k") === col("rk") && col("cum") >= col("rank"))
      .filter(col("rank") > 0L)
      .groupBy(col("k")).agg(min(col("dv")).as("qn"))
    spans.join(sel, Seq("k"), "left")
      .select(col("k").as("key"), col("n").as("n_periods"),
        col("qn").cast("double").as("qn_raw"))
  }

  /** Per-key LINEAR TREND — ordinary-least-squares slope/intercept of
    * the (period, period-sum) series per key, the one-pass grouped
    * regression (`regr_slope` semantics) every metrics store needs.
    *
    * All sufficient statistics (n, Σp, Σpp, Σy, Σpy) accumulate in
    * DECIMAL/integer arithmetic — exact and order-free, so they are
    * bit-identical under any partitioning — and only the closed form
    * `(n·Σxy − Σx·Σy) / (n·Σxx − Σx²)` runs in pinned-order double
    * ops over the exactly-cast statistics. Periods re-base against
    * the key's own first period (x = period − min(period),
    * algebraically from the raw sums — no second pass), anchoring the
    * intercept at the series start. Keys with < 2 distinct periods
    * (zero x-variance) emit null slope/intercept rather than a
    * division by zero.
    *
    * Scale: one partial-aggregable pass to (key, period) sums, a
    * second over each key's periods — both collapse map-side; no
    * windows, no sorts. The final double division is the only
    * non-exact step, so cross-engine oracles compare within 1e-9.
    */
  def linearTrend(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    // the re-cast keeps y at (18,6): the y·period product below must
    // stay inside decimal(38) so BOTH engines keep it exact — an
    // un-narrowed sum type would push Spark past 38 and silently
    // truncate scale (breaking the bit-exact statistics claim)
    val perPeriod = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").cast("decimal(18,6)").as("y"))
    val stats = perPeriod.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      min(col("period")).as("p0"),
      sum(col("period")).as("sp"),
      sum(col("period") * col("period")).as("spp"),
      sum(col("y")).as("sy"),
      sum(col("y") * col("period").cast("decimal(10,0)")).as("spy"))
    // x = period − p0 re-bases EXACTLY from the raw sums:
    //   Σx  = Σp − n·p0          (long arithmetic, exact)
    //   Σxx = Σpp − 2·p0·Σp + n·p0²  (long, exact)
    //   Σxy = Σpy − p0·Σy
    // The integer parts stay in long arithmetic; the y-carrying stats
    // cast to double FIRST (exact while |value·10⁶| < 2^53 — document-
    // ed envelope) and the closed form then runs in pinned-order
    // DOUBLE ops, which both engines execute identically. Decimal
    // arithmetic past the sums is deliberately avoided: Spark caps
    // precision at 38 by silently reducing scale where DuckDB raises a
    // multiply-overflow error — the one place the engines' decimal
    // TYPE rules diverge even when every value is exactly
    // representable.
    val sx = (col("sp") - col("n") * col("p0")).cast("double")
    val sxx = (col("spp") - lit(2L) * col("p0") * col("sp")
      + col("n") * col("p0") * col("p0")).cast("double")
    val nD = col("n").cast("double")
    val syD = col("sy").cast("double")
    val sxy = col("spy").cast("double") - col("p0").cast("double") * syD
    val den = nD * sxx - sx * sx
    val num = nD * sxy - sx * syD
    stats.select(
      col("k").as("key"),
      col("n").as("n_periods"),
      when(den > 0.0, num / den).otherwise(lit(null).cast("double")).as("slope"),
      when(den > 0.0, (syD - (num / den) * sx) / nD)
        .otherwise(lit(null).cast("double")).as("intercept"))
  }

  /** MASE FORECAST BACKTEST (Hyndman & Koehler 2006) — the scale-free
    * forecast-accuracy audit: per key, the seasonal-naive forecast
    * (value `seasonLag` periods ago) is scored on the test periods
    * (≥ `splitPeriod`) against the in-sample one-step naive MAE on
    * the train periods, MASE = MAE_forecast / MAE_naive. MASE < 1
    * means the forecast beats last-period carry-forward — the
    * go/no-go gate before any fancier model ships.
    *
    * `valueCents` must be an exact integer (cents — raises on null);
    * both absolute-error sums accumulate in decimal(38,0), so MASE is
    * a pinned chain of two divisions on exactly-cast statistics —
    * hash-exact. Gaps need no densification: forecasts and naive
    * steps exist exactly where the lagged period exists (equi-joins
    * on the period axis, no window over raw rows). Output per key:
    * (key, n_test, n_naive, sae_forecast, sae_naive, mase) — mase
    * null when either side is empty or the naive error is zero.
    */
  def maseBacktest(
      events: DataFrame,
      key: Column,
      ts: Column,
      valueCents: Column,
      seasonLag: Int,
      splitPeriod: Long,
      periodSeconds: Long): DataFrame = {
    require(seasonLag >= 1, s"seasonLag must be >= 1, got $seasonLag")
    require(periodSeconds > 0, s"periodSeconds must be > 0, got $periodSeconds")
    val p = periodSeconds * 1000000L
    val vG = when(valueCents.cast("long").isNull, raise_error(lit(
      "maseBacktest: value must be a non-null integer")))
      .otherwise(valueCents.cast("long"))
    val perP = events
      .select(key.as("k"), ts.as("ts"), vG.as("v"))
      .filter(col("k").isNotNull && col("ts").isNotNull)
      .select(col("k"),
        floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"), col("v"))
      .groupBy(col("k"), col("period")).agg(sum(col("v")).as("v"))
      .localCheckpoint() // three self-references below
    def s38(c: Column) = sum(c.cast("decimal(19,0)")).cast("decimal(38,0)")
    val fc = perP.filter(col("period") >= splitPeriod)
      .join(perP.select(col("k").as("lk"),
        (col("period") + seasonLag).as("lp"), col("v").as("lv")),
        col("k") === col("lk") && col("period") === col("lp"))
      .groupBy(col("k")).agg(
        count(lit(1)).as("n_test"), s38(abs(col("v") - col("lv"))).as("sf"))
    val nv = perP.filter(col("period") < splitPeriod)
      .join(perP.select(col("k").as("nk"),
        (col("period") + 1).as("np"), col("v").as("nv")),
        col("k") === col("nk") && col("period") === col("np"))
      .filter(col("period") < splitPeriod)
      .groupBy(col("k")).agg(
        count(lit(1)).as("n_naive"), s38(abs(col("v") - col("nv"))).as("sn"))
    val out = fc.join(nv, Seq("k"), "full_outer")
      .select(col("k").as("key"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        coalesce(col("n_naive"), lit(0L)).as("n_naive"),
        coalesce(col("sf").cast("double"), lit(0.0)).as("sae_forecast"),
        coalesce(col("sn").cast("double"), lit(0.0)).as("sae_naive"),
        when(col("n_test") > 0L && col("n_naive") > 0L &&
          col("sn").cast("double") > 0.0,
          (col("sf").cast("double") / col("n_test").cast("double"))
            / (col("sn").cast("double") / col("n_naive").cast("double")))
          .as("mase"))
      .localCheckpoint(true)
    perP.unpersist()
    out
  }

  /** OHLC / VWAP BARS — the market-data resample: per (key, period
    * bucket) open/high/low/close prices, volume, and the
    * volume-weighted average price. The candlestick aggregation of
    * every trading mart, equally useful as "first/last/extreme value
    * per window" for any event stream.
    *
    * Scale + determinism: bucketing is pure integer arithmetic; the
    * open/close picks are row_number windows PARTITIONED BY (key,
    * bucket) with a FULLY PINNED order (ts, then price — duplicate
    * timestamps cannot flap across engines); everything else is
    * partial-aggregable min/max/sum. Prices are exact integer cents;
    * the vwap numerator accumulates in decimal(38,0), is
    * loudly-guarded back into int64 (exact), and the single division
    * is pinned — every output hash-matches any engine.
    *
    * Contract: ts/price/qty non-null (raises); qty ≥ 0.
    */
  def ohlcBars(
      df: DataFrame,
      key: Column,
      ts: Column,
      priceCents: Column,
      qty: Column,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds >= 1L,
      s"ohlcBars: periodSeconds must be >= 1, got $periodSeconds")
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"ohlcBars: $name must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val base = df.select(
      key.as("k"),
      g(unix_micros(ts.cast("timestamp")), "ts").as("us"),
      g(priceCents, "price").as("price"),
      when(qty.cast("long").isNull || qty.cast("long") < 0L,
        raise_error(lit("ohlcBars: qty must be non-null and >= 0")))
        .otherwise(qty.cast("long")).as("q"))
      .withColumn("b", floor(col("us").cast("double") /
        (periodSeconds * 1000000L).toDouble).cast("long"))
    val wOpen = Window.partitionBy(col("k"), col("b"))
      .orderBy(col("us").asc, col("price").asc)
    val wClose = Window.partitionBy(col("k"), col("b"))
      .orderBy(col("us").desc, col("price").desc)
    val d19 = "decimal(19,0)"
    val ranked = base
      .withColumn("rn_o", row_number().over(wOpen))
      .withColumn("rn_c", row_number().over(wClose))
    val agg = ranked.groupBy(col("k"), col("b")).agg(
      count(lit(1)).as("n_trades"),
      max(when(col("rn_o") === 1, col("price"))).as("open"),
      max(col("price")).as("high"),
      min(col("price")).as("low"),
      max(when(col("rn_c") === 1, col("price"))).as("close"),
      sum(col("q")).as("volume"),
      sum(col("price").cast(d19) * col("q").cast(d19))
        .cast("decimal(38,0)").as("pq"))
    // decimal → int64 is exact below the guard; int64 → double is the
    // IEEE round both engines share (the decimal→double path is NOT)
    val pqL = when(col("pq") > lit(Long.MaxValue).cast("decimal(38,0)"),
      raise_error(lit("ohlcBars: vwap numerator exceeds int64")))
      .otherwise(col("pq").cast("long"))
    agg.select(
      col("k"), col("b").as("bucket"), col("n_trades"),
      col("open"), col("high"), col("low"), col("close"), col("volume"),
      when(col("volume") > 0L,
        pqL.cast("double") / col("volume").cast("double"))
        .otherwise(lit(null).cast("double")).as("vwap"))
  }

  /** CROSTON'S METHOD for INTERMITTENT DEMAND (Croston 1972) — the
    * standard forecaster when most periods are zero (spare parts,
    * long-tail SKUs), where plain SES chases zeros: exponential
    * smoothing of the NONZERO demand sizes and, separately, of the
    * INTER-DEMAND intervals; the per-period forecast is size/interval.
    *
    * Contract (textbook variants differ — this recurrence IS the
    * contract): the state seeds at the first demand with size = d and
    * interval = periods elapsed since the series start (1 when the
    * series opens with a demand, which [[gapFill]] guarantees); each
    * later demand updates size += α(d − size),
    * interval += α(gap − interval); zero periods only lengthen the
    * running gap. α must be dyadic (k/4096) and the fold is ONE
    * `aggregate` HOF per key over the dense sorted period array
    * (bounded by `maxPeriodsPerKey`), in pinned order — an oracle
    * replaying the identical op order (list_reduce) is bit-equal when
    * demands are integers (exact doubles), so the result hash-matches.
    *
    * Output per key: (key, n_periods, n_demand, size, interval,
    * forecast = size/interval) — nulls when the key never had a
    * nonzero demand.
    */
  def croston(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      alpha: Double = 0.25,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1), got $alpha")
    require(alpha * 4096.0 == math.rint(alpha * 4096.0),
      s"alpha must be an exact dyadic rational (k/4096), got $alpha")
    val dense = gapFill(events, key, ts, value, periodSeconds,
      fillMode = "zero", maxPeriodsPerKey = maxPeriodsPerKey)
    // acc = [size, interval, sinceLastDemand, seenAnyDemand]
    def step(acc: Column, e: Column): Column = {
      val d = e.getField("value")
      val since1 = acc.getItem(2) + lit(1.0)
      val demand = d > lit(0.0)
      val first = acc.getItem(3) === lit(0.0)
      array(
        when(demand, when(first, d)
          .otherwise(acc.getItem(0) + lit(alpha) * (d - acc.getItem(0))))
          .otherwise(acc.getItem(0)),
        when(demand, when(first, since1)
          .otherwise(acc.getItem(1) + lit(alpha) * (since1 - acc.getItem(1))))
          .otherwise(acc.getItem(1)),
        when(demand, lit(0.0)).otherwise(since1),
        when(demand, lit(1.0)).otherwise(acc.getItem(3)))
    }
    dense.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_periods"),
        sum(when(col("value") > 0.0, 1L).otherwise(0L)).as("n_demand"),
        sort_array(collect_list(struct(col("period"), col("value"))))
          .as("series"))
      .select(col("key"), col("n_periods"), col("n_demand"),
        aggregate(col("series"),
          array(lit(0.0), lit(0.0), lit(0.0), lit(0.0)), step).as("__st"))
      .select(col("key"), col("n_periods"), col("n_demand"),
        when(col("n_demand") > 0L, col("__st").getItem(0))
          .otherwise(lit(null).cast("double")).as("size"),
        when(col("n_demand") > 0L, col("__st").getItem(1))
          .otherwise(lit(null).cast("double")).as("interval"),
        when(col("n_demand") > 0L && col("__st").getItem(1) > 0.0,
          col("__st").getItem(0) / col("__st").getItem(1))
          .otherwise(lit(null).cast("double")).as("forecast"))
  }

  /** MAXIMUM DRAWDOWN per key — the largest peak-to-trough decline of
    * a price path, the risk metric behind every equity-curve audit:
    * with the running maximum m_t = max(p_1..p_t) in (time, tiebreak)
    * order, drawdown_t = m_t − p_t and its fraction (m_t − p_t)/m_t;
    * the output is each key's worst of both.
    *
    * One cumulative-max window per key (integer max — exact, and the
    * sequential scan is inherent to the statistic) plus an
    * order-INDEPENDENT max aggregate: the per-row fraction is one
    * correctly-rounded double division of exact int64 cents, and max
    * over doubles is insensitive to partial-aggregation order, so the
    * result is hash-exact. A key's rows land on one task (the window
    * partition) — the key grain (instrument/series id) bounds it.
    *
    * `priceCents` must be a non-null, non-negative integer;
    * (`ts`, `tiebreak`) must order each key's rows uniquely or the
    * running max is undefined. Fraction rows with m_t = 0 (an
    * all-zero prefix) are skipped. Output per key:
    * (k, n, peak_cents, max_dd_cents, max_dd_frac).
    */
  def maxDrawdown(
      df: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      priceCents: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"maxDrawdown: $name must be non-null and long-castable")))
        .otherwise(c.cast("long"))
    val base = df.select(
      key.as("k"),
      g(unix_micros(ts.cast("timestamp")), "ts").as("us"),
      g(tiebreak, "tiebreak").as("tb"),
      when(priceCents.cast("long").isNull || priceCents.cast("long") < 0L,
        raise_error(lit("maxDrawdown: priceCents must be non-null and >= 0")))
        .otherwise(priceCents.cast("long")).as("p"))
    val w = Window.partitionBy(col("k")).orderBy(col("us").asc, col("tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("m", max(col("p")).over(w))
      .withColumn("dd", col("m") - col("p"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n"),
        max(col("p")).as("peak_cents"),
        max(col("dd")).as("max_dd_cents"),
        max(when(col("m") > 0L,
          col("dd").cast("double") / col("m").cast("double")))
          .as("max_dd_frac"))
  }

  /** SEASONAL MANN–KENDALL per key (Hirsch, Slack & Smith 1982) —
    * [[mannKendall]] applied WITHIN each season (weekday, month) and
    * combined, so a strong weekly rhythm cannot masquerade as (or
    * mask) a monotone trend: S = Σ_s S_s with
    * Var = Σ_s [n_s(n_s−1)(2n_s+5) − ties_s]/18, continuity-corrected
    * z. Pairs expand only within a season's sub-series (the per-key
    * span guard bounds the O(span²) work exactly as in the plain
    * test); S and the variance numerator stay exact integers — one
    * division by 18 and the z chain are the only doubles —
    * hash-exact. Output per key: (key, n_periods, s_stat, z).
    */
  def seasonalMannKendall(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long,
      seasonPeriods: Int,
      maxPeriodsPerKey: Int = 10000): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    require(seasonPeriods >= 2, s"seasonPeriods must be >= 2, got $seasonPeriods")
    require(maxPeriodsPerKey >= 2, s"maxPeriodsPerKey must be >= 2, got $maxPeriodsPerKey")
    val perPeriod = perPeriodSums(events, key, ts, value, periodSeconds)
      .select(col("k"), col("period"), col("psum").as("y"),
        pmod(col("period"), lit(seasonPeriods.toLong)).as("sea"))
    val spans = perPeriod.groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"),
        when(col("n") > maxPeriodsPerKey, raise_error(concat(
          lit("seasonalMannKendall: key "), col("k").cast("string"),
          lit(s" has more than $maxPeriodsPerKey periods"))))
          .otherwise(col("n")).as("n"))
    val a = perPeriod.select(col("k"), col("sea"),
      col("period").as("p1"), col("y").as("y1"))
    val b = perPeriod.select(col("k").as("bk"), col("sea").as("bsea"),
      col("period").as("p2"), col("y").as("y2"))
    val sSum = a.join(b,
      col("k") === col("bk") && col("sea") === col("bsea") &&
        col("p1") < col("p2"))
      .groupBy(col("k"))
      .agg(sum(signum(col("y2") - col("y1")).cast("long")).as("s_stat"))
    val perSeason = perPeriod.groupBy(col("k"), col("sea"))
      .agg(count(lit(1)).as("ns"))
    val tieSum = perPeriod.groupBy(col("k"), col("sea"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"), col("sea"))
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
        .as("ties"))
    val varNum = perSeason
      .join(tieSum, Seq("k", "sea"))
      .groupBy(col("k"))
      .agg(sum(col("ns") * (col("ns") - 1L) * (lit(2L) * col("ns") + 5L)
        - col("ties")).as("vnum"))
    val joined = spans
      .join(sSum, Seq("k"), "left")
      .join(varNum, Seq("k"), "left")
      .select(col("k"), col("n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        coalesce(col("vnum"), lit(0L)).as("vnum"))
    val varS = col("vnum").cast("double") / lit(18.0)
    val sD = col("s_stat").cast("double")
    val z = when(col("s_stat") > 0L, (sD - lit(1.0)) / sqrt(varS))
      .when(col("s_stat") < 0L, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    joined.select(col("k").as("key"), col("n").as("n_periods"),
      col("s_stat"),
      when(col("n") >= 2L && varS > 0.0, z)
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** FANO FACTOR (index of dispersion) per key — burstiness of an
    * event stream: variance/mean of per-period event counts over the
    * DENSE grid (zeros included via [[gapFill]]); 1 = Poisson-like,
    * > 1 = bursty, < 1 = regular. Counts are exact integers, the
    * variance comes from exact decimal sums, and the ratio is one
    * pinned chain — hash-exact. Output per key: (key, n_periods,
    * mean_count, var_count, fano) — fano null for a single period or
    * an all-constant grid with mean 0.
    */
  /** CROSS-CORRELATION FUNCTION between two keys' period-sum series
    * — the lead/lag detector ("do views lead purchases, and by how
    * many days?"): for each lag l ∈ [−maxLag, maxLag], the Pearson
    * correlation of x_t with y_{t+l} over the overlapping dense grid
    * of the two series.
    *
    * Both series gap-fill onto their shared calendar (zero-filled,
    * inner-joined on period); the 2·maxLag+1 shifted copies of y come
    * from lead/lag over ONE ordered pass of the zipped frame (the
    * frame is one series — calendar-bounded by the [[gapFill]]
    * guard, never event-sized), and each lag reduces to six exact
    * integer sufficient statistics in one aggregation. Every r is a
    * pinned chain of correctly-rounded doubles — hash-exact. Values
    * must be integer-valued (counts/cents).
    *
    * Output per lag: (lag, n, r) — r null when either side has zero
    * variance on the overlap; positive lag = x leads y by l periods.
    */
  def crossCorrelation(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      keyX: String,
      keyY: String,
      maxLag: Int,
      periodSeconds: Long = 86400L,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60,
      s"maxLag must be in [1, 60], got $maxLag")
    require(keyX != keyY, "keyX and keyY must differ")
    val dense = gapFill(
      events.filter(key.cast("string").isin(keyX, keyY)),
      key.cast("string"), ts, value, periodSeconds,
      fillMode = "zero", maxPeriodsPerKey = maxPeriodsPerKey)
      .select(col("key").as("k"), col("period").as("t"),
        when(col("value") =!= col("value").cast("long").cast("double"),
          raise_error(lit("crossCorrelation: value must be integer-valued")))
          .otherwise(col("value").cast("long")).as("y"))
    val zipped = dense.filter(col("k") === keyX)
      .select(col("t"), col("y").as("x"))
      .join(dense.filter(col("k") === keyY)
        .select(col("t").as("t2"), col("y").as("yv")),
        col("t") === col("t2"))
      .select(col("t"), col("x"), col("yv"))
    val wOrd = Window.orderBy(col("t"))
    val lags = (-maxLag to maxLag)
    val shifted = zipped.select(
      col("t") +: col("x") +:
        lags.map(l => lead(col("yv"), l).over(wOrd).as(s"y$l")): _*)
    val d19 = "decimal(19,0)"
    val aggs: Seq[Column] = lags.flatMap { l =>
      val y = col(s"y$l")
      val both = y.isNotNull
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"n$l"),
        sum(when(both, col("x").cast(d19)).otherwise(lit(0).cast(d19)))
          .cast("decimal(38,0)").as(s"sx$l"),
        sum(when(both, y.cast(d19)).otherwise(lit(0).cast(d19)))
          .cast("decimal(38,0)").as(s"sy$l"),
        // decimal×decimal: a long×long product wraps silently past
        // ±3.04e9 and the wrapped sum can pass the 2^53 guard
        sum(when(both, col("x").cast(d19) * y.cast(d19))
          .otherwise(lit(0).cast(d19)))
          .cast("decimal(38,0)").as(s"sxy$l"),
        sum(when(both, col("x").cast(d19) * col("x").cast(d19))
          .otherwise(lit(0).cast(d19)))
          .cast("decimal(38,0)").as(s"sxx$l"),
        sum(when(both, y.cast(d19) * y.cast(d19))
          .otherwise(lit(0).cast(d19)))
          .cast("decimal(38,0)").as(s"syy$l"))
    }
    val wide = shifted.agg(aggs.head, aggs.tail: _*)
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"crossCorrelation: |$what| exceeds 2^53 — rescale the value")))
        .otherwise(c).cast("double")
    val rows = lags.map { l =>
      val nD = col(s"n$l").cast("double")
      val cov = nD * e(col(s"sxy$l"), "an xy sum") -
        e(col(s"sx$l"), "an x sum") * e(col(s"sy$l"), "a y sum")
      val vx = nD * e(col(s"sxx$l"), "an x² sum") -
        e(col(s"sx$l"), "an x sum") * e(col(s"sx$l"), "an x sum")
      val vy = nD * e(col(s"syy$l"), "a y² sum") -
        e(col(s"sy$l"), "a y sum") * e(col(s"sy$l"), "a y sum")
      struct(
        lit(l.toLong).as("lag"),
        col(s"n$l").as("n"),
        when(col(s"n$l") > 1L && vx > 0.0 && vy > 0.0,
          cov / (sqrt(vx) * sqrt(vy)))
          .otherwise(lit(null).cast("double")).as("r"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.lag"), col("p.n"), col("p.r"))
  }

  /** SCHUSTER PERIODOGRAM at CANDIDATE PERIODS — spectral power of a
    * per-key period-sum series at each candidate cycle length p:
    *
    *   I(p) = (C_p² + S_p²) / n,
    *   C_p = Σ_t y_t·cos(2πt/p),  S_p = Σ_t y_t·sin(2πt/p),
    *
    * the "which seasonality is actually in this series" detector that
    * picks the season length [[seasonalDecompose]] consumes (Schuster
    * 1898; evaluating a fixed candidate set instead of the full FFT
    * grid keeps it one declarative pass — the usual shape when the
    * plausible cycles are known: 7, 14, 28, 365).
    *
    * Scale shape: the dense grid comes from [[gapFill]] (per-key
    * calendar-bounded, loud guard); each row fans out to the CONSTANT
    * |periods| candidate terms map-side; the C/S sums fold through
    * windows in pinned t-order per (key, period) — bounded frames,
    * deterministic order. cos/sin are libm (engine-specific ulps), so
    * oracles gate the float columns at tolerance while n stays exact.
    *
    * Output per (key, period): (key, period, n, c_sum, s_sum, power).
    */
  def periodogram(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      periods: Seq[Int],
      periodSeconds: Long = 86400L,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      s"periods must be >= 2, got $periods")
    require(periods.size <= 64,
      s"at most 64 candidate periods (got ${periods.size}) — this is a " +
        "candidate evaluation, not an FFT")
    val dense = gapFill(events, key, ts, value, periodSeconds,
      fillMode = "zero", maxPeriodsPerKey = maxPeriodsPerKey)
      .select(col("key").as("k"), col("period").as("t"),
        col("value").cast("double").as("y"))
    val fan = dense.select(col("k"), col("t"), col("y"),
      explode(array(periods.map(p => lit(p.toLong)): _*)).as("p"))
    val theta = lit(2.0 * math.Pi) * pmod(col("t"), col("p")).cast("double") /
      col("p").cast("double")
    val wCum = Window.partitionBy(col("k"), col("p")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"), col("p"))
    fan
      .withColumn("cc", sum(col("y") * cos(theta)).over(wCum))
      .withColumn("ss", sum(col("y") * sin(theta)).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k"), col("p")).orderBy(col("t").desc)))
      .filter(col("rn") === 1)
      .select(col("k").as("key"), col("p").as("period"), col("n"),
        col("cc").as("c_sum"), col("ss").as("s_sum"),
        ((col("cc") * col("cc") + col("ss") * col("ss"))
          / col("n").cast("double")).as("power"))
  }

  /** CLASSICAL ADDITIVE SEASONAL DECOMPOSITION — the moving-average
    * textbook split y = trend + seasonal + residual (the
    * decomposition every seasonal-adjustment pipeline starts from;
    * STL's ancestor): per key, values bucket to a dense
    * `periodSeconds` grid (zero-filled), trend is the centered
    * moving average over one season (`seasonLen` periods, must be
    * ODD so the window centers exactly), the seasonal index of each
    * phase is the mean detrended value RE-CENTERED so indices sum to
    * zero, and the residual is what remains.
    *
    * Exactness: the detrended value rides as the exact integer
    * numerator m·y − S (m = seasonLen, S the window sum), so the
    * seasonal index is ONE division of exact decimal sums; the
    * re-centering mean folds the ≤ m phase indices through a window
    * in pinned phase order. Every float chain is the same
    * correctly-rounded op sequence in any engine — hash-exact.
    *
    * All windows are PARTITIONED by key and bounded by the calendar
    * grid (`maxPeriodsPerKey` raises loudly — the [[gapFill]]
    * contract). Output per (key, period) with a full trend window:
    * (key, period, phase, y, trend, seasonal, residual).
    */
  def seasonalDecompose(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      seasonLen: Int,
      periodSeconds: Long = 86400L,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    require(seasonLen >= 3 && seasonLen % 2 == 1,
      s"seasonLen must be odd and >= 3, got $seasonLen")
    val m = seasonLen
    val h = m / 2
    val dense = gapFill(events, key, ts, value, periodSeconds,
      fillMode = "zero", maxPeriodsPerKey = maxPeriodsPerKey)
      .select(col("key").as("k"), col("period").as("p"),
        // integer contract: the exact-numerator algebra needs integer
        // period sums — a fractional value would truncate silently
        when(col("value") =!= col("value").cast("long").cast("double"),
          raise_error(lit("seasonalDecompose: value must be integer-" +
            "valued (cents, counts) — scale fractional units first")))
          .otherwise(col("value").cast("long")).as("y"))
    val twoP53 = 9007199254740992L
    val yG = when(abs(col("y")) * m > lit(twoP53), raise_error(lit(
      s"seasonalDecompose: |value|*$m exceeds 2^53 — rescale the value")))
      .otherwise(col("y"))
    val wTrend = Window.partitionBy(col("k")).orderBy(col("p"))
      .rowsBetween(-h, h)
    val trended = dense
      .withColumn("y", yG)
      .withColumn("s", sum(col("y")).over(wTrend))
      .withColumn("full", count(lit(1)).over(wTrend) === m.toLong)
      // exact integer numerator of the detrended value: m·y − S
      .withColumn("dnum", lit(m.toLong) * col("y") - col("s"))
      .withColumn("phase", pmod(col("p"), lit(m.toLong)))
    val phases = trended.filter(col("full"))
      .groupBy(col("k"), col("phase"))
      .agg(sum(col("dnum").cast("decimal(19,0)")).cast("decimal(38,0)").as("a"),
        count(lit(1)).as("ns"))
      .select(col("k"), col("phase"),
        when(abs(col("a")) > lit(twoP53), raise_error(lit(
          "seasonalDecompose: a phase's detrended sum exceeds 2^53")))
          .otherwise(col("a")).cast("double")
          ./(lit(m.toDouble) * col("ns").cast("double")).as("sraw"))
    // re-center: indices must sum to 0 — fold the ≤ m phase means in
    // pinned phase order (bounded window, never data-sized)
    val wPh = Window.partitionBy(col("k")).orderBy(col("phase"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val seasonal = phases
      .withColumn("smean", sum(col("sraw")).over(wPh) / count(lit(1)).over(wPh))
      .select(col("k").as("sk"), col("phase").as("sp"),
        (col("sraw") - col("smean")).as("seasonal"))
    trended.filter(col("full"))
      .join(seasonal, col("k") === col("sk") && col("phase") === col("sp"))
      .select(col("k").as("key"), col("p").as("period"), col("phase"),
        col("y"),
        (col("s").cast("double") / lit(m.toDouble)).as("trend"),
        col("seasonal"),
        (col("y").cast("double") - col("s").cast("double") / lit(m.toDouble)
          - col("seasonal")).as("residual"))
  }

  def fanoFactor(
      events: DataFrame,
      key: Column,
      ts: Column,
      periodSeconds: Long,
      maxPeriodsPerKey: Int = 100000): DataFrame = {
    val dense = gapFill(events, key, ts, lit(1.0), periodSeconds,
      fillMode = "zero", maxPeriodsPerKey = maxPeriodsPerKey)
      .select(col("key"), col("value").cast("long").as("c"))
    val d19 = "decimal(19,0)"
    val st = dense.groupBy(col("key")).agg(
      count(lit(1)).as("n_periods"),
      sum(col("c").cast(d19)).cast("decimal(38,0)").as("s"),
      sum(col("c").cast(d19) * col("c").cast(d19))
        .cast("decimal(38,0)").as("q"))
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"fanoFactor: |$what| exceeds 2^53"))).otherwise(c).cast("double")
    val nD = col("n_periods").cast("double")
    val mean = e(col("s"), "the count sum") / nD
    val varU = (nD * e(col("q"), "the squared-count sum") -
      e(col("s"), "the count sum") * e(col("s"), "the count sum")) /
      (nD * (nD - lit(1.0)))
    st.select(col("key"), col("n_periods"),
      mean.as("mean_count"),
      when(col("n_periods") > 1L, varU)
        .otherwise(lit(null).cast("double")).as("var_count"),
      when(col("n_periods") > 1L && mean > 0.0, varU / mean)
        .otherwise(lit(null).cast("double")).as("fano"))
  }

  /** PAGE–HINKLEY drift detector per key (Page 1954; the sequential
    * form Gama et al. 2014 popularized for data-stream monitoring) —
    * the RUNNING-MEAN member of the changepoint family: where the
    * CUSUM operator tests deviation from the series' OWN overall mean
    * (retrospective, needs the full series twice), Page–Hinkley
    * tracks deviation from the mean-so-far, so it is the one you can
    * run as data arrives:
    *
    *   m_t  = Σ_{i≤t} (x_i − μ̂_i − δ),   μ̂_i = (Σ_{j≤i} x_j)/i
    *   PH_t = m_t − min_{i≤t} m_i        (alarm when PH_t > λ)
    *
    * δ is the drift the detector tolerates, λ the alarm threshold
    * (both caller-set, an exact decimal contract). The value column
    * aggregates to one exact decimal per (key, period) first, prefix
    * sums run in decimal (order-free exact), μ̂_i is one pinned
    * division per row, and m_t accumulates the per-row double terms
    * SEQUENTIALLY in period order through the cumulative window —
    * ordered float accumulation is bit-stable across engines (the
    * Nelson–Aalen/Kruskal discipline), so alarm day, PH peak, and
    * every intermediate replay hash-exact; the oracle folds the same
    * terms left-to-right per prefix (O(n²) per key, bounded by the
    * CALENDAR, not the corpus). min-prefix and the > λ test are exact
    * on identical doubles.
    *
    * Output per key: (k, n_periods, ph_max, alarm_period, alarm_ph) —
    * alarm_* null when PH never crosses λ.
    */
  def pageHinkley(
      df: DataFrame,
      key: Column,
      period: Column,
      value: Column,
      delta: Double,
      lambda: Double): DataFrame = {
    require(delta >= 0.0 && !delta.isNaN && !delta.isInfinity,
      s"pageHinkley: delta must be finite and >= 0, got $delta")
    require(lambda > 0.0 && !lambda.isNaN && !lambda.isInfinity,
      s"pageHinkley: lambda must be finite and > 0, got $lambda")
    val pL = period.cast("long")
    val pG = when(pL.isNull, raise_error(lit(
      "pageHinkley: period must be a non-null integer"))).otherwise(pL)
    val vDec = value.cast("decimal(18,6)")
    val vG = when(vDec.isNull, raise_error(lit(
      "pageHinkley: value must be non-null and decimal-castable")))
      .otherwise(vDec)
    val per = df.select(key.as("k"), pG.as("p"), vG.as("v"))
      .groupBy(col("k"), col("p")).agg(sum(col("v")).as("x"))
    val wCum = Window.partitionBy(col("k")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"))
    // exact decimal prefix + count, then ONE pinned term per row; the
    // cumulative double sum over terms is sequential in period order
    val terms = per
      .withColumn("s", sum(col("x")).over(wCum))
      .withColumn("t", count(lit(1)).over(wCum))
      .withColumn("term",
        col("x").cast("double") -
          col("s").cast("double") / col("t").cast("double") -
          lit(delta))
    val m = terms.withColumn("m", sum(col("term")).over(wCum))
    val ph = m
      .withColumn("mmin", min(col("m")).over(wCum))
      .withColumn("ph", col("m") - col("mmin"))
    val flagged = ph
      .withColumn("n_periods", count(lit(1)).over(wAll))
      .withColumn("ph_max", max(col("ph")).over(wAll))
    val firstAlarm = flagged.filter(col("ph") > lambda)
      .groupBy(col("k")).agg(
        min(struct(col("p"), col("ph"))).as("fa"))
      .select(col("k").as("ak"),
        col("fa.p").as("alarm_period"), col("fa.ph").as("alarm_ph"))
    flagged.filter(col("t") === col("n_periods"))
      .select(col("k"), col("n_periods"), col("ph_max"))
      .join(firstAlarm, col("k") === col("ak"), "left")
      .select(col("k"), col("n_periods"), col("ph_max"),
        col("alarm_period"), col("alarm_ph"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-model evaluation beyond [[Profiling.reliabilityBins]]'
  * calibration view: the cumulative GAINS / LIFT table — "if I act on
  * the top 1/b of the ranking, what fraction of the positives do I
  * capture, and how much better than random is that?" — the
  * campaign-targeting / review-prioritization staple.
  *
  * NO GLOBAL SORT: bucket boundaries are the exact
  * `ceil(i·n/buckets)`-th smallest scores from
  * [[ExactQuantile.selectQuantiles]] (distributed selection), then
  * every row buckets map-side against the ≤ buckets−1 broadcast cut
  * values — a single-partition `ntile` window over 100 TB is exactly
  * the plan this avoids. `buckets` must be a power of two ≤ 256 so
  * every quantile fraction i/buckets is a dyadic rational, exact in
  * double — `ceil(q·n)` then agrees bit-for-bit with integer
  * arithmetic (the dyadic-weights discipline, q103/q119 precedent).
  *
  * Tie semantics: rows scoring EQUAL to a cut fall in the lower-score
  * bucket (`cut < s` strictly opens the next bucket); duplicate cut
  * values skip buckets on both the engine and oracle side
  * identically. Bucket 1 is the TOP of the ranking. `cum_lift` and
  * `cum_capture` are single double divisions of exact integer
  * products — bit-portable. A label column with zero positives is a
  * caller error and fails loudly.
  */
object ModelEval {

  def gainsTable(
      df: DataFrame,
      score: Column,
      label: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 256 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two in [2, 256], got $buckets " +
        "(i/buckets must be exact in double)")
    val base = df.select(score.cast("double").as("s"), label.cast("long").as("y"))
      .filter(col("s").isNotNull && !isnan(col("s")) && col("y").isNotNull)
    // ≤ buckets-1 doubles on the driver — bounded by construction
    // bounded: selectQuantiles emits one row per requested cut (< buckets)
    val cuts = ExactQuantile.selectQuantiles(
      base, col("s"), (1 until buckets).map(_.toDouble / buckets))
      .select("value").collect().map(_.getDouble(0)).sorted
    val ascBucket = cuts.map(c => when(col("s") > lit(c), 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    val agg = base
      .withColumn("bucket", lit(buckets) + 1 - ascBucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    // windows over the ≤ buckets-row AGGREGATE — bounded, not a
    // global window over the data
    val wc = Window.orderBy(col("bucket"))
    val wAll = wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg.select(
      col("bucket"), col("n"), col("pos"),
      sum(col("n")).over(wc).as("cum_n"),
      sum(col("pos")).over(wc).as("cum_pos"),
      sum(col("n")).over(wAll).as("total_n"),
      sum(col("pos")).over(wAll).as("total_pos"))
      .select(
        col("bucket"), col("n"), col("pos"), col("cum_n"), col("cum_pos"),
        when(col("total_pos") === 0L, raise_error(lit(
          "gainsTable: label column has zero positives")))
          .otherwise((col("cum_pos") * col("total_n")).cast("double") /
            (col("cum_n") * col("total_pos")))
          .as("cum_lift"),
        (col("cum_pos").cast("double") / col("total_pos")).as("cum_capture"))
  }

  /** ISOTONIC CALIBRATION over score bins — the monotone-regression
    * fit (Barlow et al. 1972; the sklearn `IsotonicRegression` step of
    * every probability-calibration pipeline), computed NOT by the
    * sequential pool-adjacent-violators stack but by the equivalent
    * MINIMAX characterization: fit_i = max_{j≤i} min_{k≥i}
    * weightedMean(y over bins j..k). Scores first reduce to
    * `bins` equal-width cells (one partial-aggregable pass: per-cell
    * count + positive count, exact integers); the minimax then runs
    * entirely on that ≤ bins-row frame — a (j ≤ i ≤ k) triple join of
    * a tiny aggregate, fully declarative, no driver loops, no
    * sequential state. Each candidate mean is ONE double division of
    * exact integers and the min/max pick among identical doubles, so
    * the result is bit-portable and the oracle hash-matches.
    *
    * Output per non-empty bin: (bin, n, pos, rate_raw, rate_iso) with
    * rate_iso non-decreasing in bin.
    */
  def isotonicBins(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 256, s"bins must be in [2, 256], got $bins")
    val sD = score.cast("double")
    val yL = label.cast("long")
    val yG = when(yL.isNull || (yL =!= 0L && yL =!= 1L), raise_error(lit(
      "isotonicBins: label must be 0 or 1"))).otherwise(yL)
    val base = df.filter(sD.isNotNull && !isnan(sD))
      .select(sD.as("s"), yG.as("y"))
    val span = base.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
    // per-endpoint division, NOT (s - lo) / (hi - lo) * bins: a score
    // range wider than the largest finite double overflows the span
    // to +Infinity, the bin goes NaN→NULL, and the null cell silently
    // drops out of the minimax joins (bin >= jb is null-false) instead
    // of raising. |hi/bins| ≤ MaxValue/2 keeps every intermediate
    // finite (bins ≥ 2 by the require above).
    val width = col("hi") / bins - col("lo") / bins
    val binned = base.crossJoin(broadcast(span))
      .select(
        when(width === 0.0, lit(0)).otherwise(
          least(floor(col("s") / width - col("lo") / width)
            .cast("int"), lit(bins - 1))).as("bin"),
        col("y"))
    val cells = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .localCheckpoint(true) // three self-references below
    val j = cells.select(col("bin").as("jb"))
    val k = cells.select(col("bin").as("kb"))
    // segment sums y(j..k), w(j..k) from the cell frame — the frame is
    // ≤ bins rows, so the triple expansion is ≤ bins³ tiny rows
    val segs = j.crossJoin(k).filter(col("jb") <= col("kb"))
      .join(cells, col("bin") >= col("jb") && col("bin") <= col("kb"))
      .groupBy(col("jb"), col("kb"))
      .agg((sum(col("pos")).cast("double") / sum(col("n")).cast("double")).as("avg"))
    val i = cells.select(col("bin").as("ib"))
    val inner = i.join(segs, col("kb") >= col("ib"))
      .groupBy(col("ib"), col("jb")).agg(min(col("avg")).as("innerMin"))
      .filter(col("jb") <= col("ib"))
      .groupBy(col("ib")).agg(max(col("innerMin")).as("rate_iso"))
    cells.join(inner, col("bin") === col("ib"))
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double")).as("rate_raw"),
        col("rate_iso"))
  }

  /** EXPECTED CALIBRATION ERROR from integer micro-unit scores — the
    * one-number summary of [[graft.operators.Profiling.reliabilityBins]]:
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b| over equal-width score bins.
    * With scores in exact micro-units (p·10⁶ as a long), the usual
    * float-sum-over-bins collapses algebraically to
    * Σ_b |pos_b·10⁶ − Σscore_b| / (N·10⁶) — the numerator is ONE
    * EXACT INTEGER (decimal(38,0)) and the whole statistic is a
    * single pinned double division, so it hash-matches with no
    * tolerance (reliabilityBins' decimal(27,12) mean-prob casts need
    * the 1e-9 gate; this formulation needs nothing).
    *
    * Output: one row — (n, bins_used, gap_units, ece); `gap_units`
    * is the exact Σ|pos·10⁶ − Σs| in micro-units (decimal(38,0)).
    * Scores outside [0, 10⁶] or null labels raise.
    */
  def eceFromScores(
      df: DataFrame,
      scoreMicro: Column,
      label: Column,
      bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2, 100], got $bins")
    val sL = scoreMicro.cast("long")
    val sG = when(sL.isNull || sL < 0L || sL > 1000000L, raise_error(lit(
      "eceFromScores: score must be in [0, 1000000] micro-units")))
      .otherwise(sL)
    val yG = when(label.isNull, raise_error(lit(
      "eceFromScores: null label"))).otherwise(label.cast("boolean"))
    val perBin = df
      .select(sG.as("s"), yG.as("y"))
      .select(least(lit(bins - 1).cast("long"),
        expr(s"(s * $bins) div 1000000")).as("bin"), col("s"), col("y"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        sum(col("s").cast("decimal(19,0)")).cast("decimal(38,0)").as("ssum"))
    perBin.agg(
      sum(col("n")).as("n"),
      count(lit(1)).as("bins_used"),
      sum(abs(col("pos").cast("decimal(19,0)") * 1000000L
        - col("ssum"))).cast("decimal(38,0)").as("gap_units"))
      .select(col("n"), col("bins_used"), col("gap_units"),
        (col("gap_units").cast("double")
          / (col("n").cast("double") * lit(1000000.0))).as("ece"))
  }

  /** BRIER SCORE DECOMPOSITION (Murphy 1973) — the three-way account
    * of a probability forecaster's quality: over `bins` score bins,
    *
    *   REL = (1/N)·Σ_b n_b·(p̄_b − ō_b)²   (calibration — smaller better)
    *   RES = (1/N)·Σ_b n_b·(ō_b − ō)²     (discrimination — bigger better)
    *   UNC = ō·(1 − ō)                    (base-rate entropy)
    *
    * plus the exact raw Brier numerator Σ(s − y·10⁶)² in micro-unit²
    * as a decimal STRING digest (exact at any scale — the digest is
    * the hash-stable artifact; N·10¹² exceeds 2⁵³ long before the
    * sums stop being exact, so the raw mean is left to the reader).
    * Same micro-unit bin geometry as [[eceFromScores]]. REL/RES mix
    * per-bin divisions, so they are pinned doubles folded over the
    * ≤ `bins`-row aggregate — oracles gate them at 1e-9 (window float
    * sums reassociate in DuckDB past tiny frames).
    *
    * Output: (n, bins_used, brier_units, rel, res, unc).
    */
  def brierDecomposition(
      df: DataFrame,
      scoreMicro: Column,
      label: Column,
      bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2, 100], got $bins")
    val sL = scoreMicro.cast("long")
    val sG = when(sL.isNull || sL < 0L || sL > 1000000L, raise_error(lit(
      "brierDecomposition: score must be in [0, 1000000] micro-units")))
      .otherwise(sL)
    val yG = when(label.isNull, raise_error(lit(
      "brierDecomposition: null label"))).otherwise(label.cast("boolean"))
    val d19 = "decimal(19,0)"
    val perBin = df
      .select(sG.as("s"), yG.as("y"))
      .select(least(lit(bins - 1).cast("long"),
        expr(s"(s * $bins) div 1000000")).as("bin"), col("s"), col("y"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        sum(col("s").cast(d19)).cast("decimal(38,0)").as("ssum"),
        sum((col("s") - when(col("y"), 1000000L).otherwise(0L)).cast(d19)
          * (col("s") - when(col("y"), 1000000L).otherwise(0L)).cast(d19))
          .cast("decimal(38,0)").as("sq"))
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"brierDecomposition: |$what| exceeds 2^53")))
        .otherwise(c).cast("double")
    val wAll = Window.partitionBy()
    // the aggregate is ≤ bins rows — a single-partition frame over it
    // is the deliberately bounded kind
    val tot = perBin
      .withColumn("nT", sum(col("n")).over(wAll))
      .withColumn("pT", sum(col("pos")).over(wAll))
      .withColumn("bT", sum(col("sq")).over(wAll).cast("decimal(38,0)"))
      .withColumn("bu", count(lit(1)).over(wAll))
    val nD = col("nT").cast("double")
    val pD = col("pT").cast("double")
    val g = e(col("ssum") - col("pos").cast("decimal(19,0)") * 1000000L,
      "a bin gap")
    val relTerm = g * g / (col("n").cast("double") * lit(1.0e12))
    val resDev = col("pos").cast("double") -
      col("n").cast("double") * pD / nD
    val resTerm = resDev * resDev / col("n").cast("double")
    val wCum = Window.partitionBy().orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot
      .withColumn("relRun", sum(relTerm).over(wCum))
      .withColumn("resRun", sum(resTerm).over(wCum))
      .withColumn("rn", row_number().over(
        Window.partitionBy().orderBy(col("bin").asc)))
      .filter(col("rn") === col("bu"))
      .select(
        col("nT").as("n"), col("bu").as("bins_used"),
        col("bT").cast("string").as("brier_units"),
        (col("relRun") / nD).as("rel"),
        (col("resRun") / nD).as("res"),
        ((pD / nD) * (lit(1.0) - pD / nD)).as("unc"))
  }

  /** QINI CURVE — uplift-model audit (Radcliffe 2007): subjects
    * hash-split into treated/control arms, ranked by `score` into
    * equal-frequency buckets (bucket 1 = top), and per cumulative
    * depth the INCREMENTAL conversions vs the control baseline:
    * qini(b) = convT_cum − convC_cum·(nT_cum/nC_cum). Positive and
    * growing = the score finds persuadables; the random-targeting
    * diagonal is the reference.
    *
    * Same no-global-sort geometry as [[gainsTable]]: bucket cuts are
    * exact order statistics (driver holds ≤ buckets−1 doubles), rows
    * bucket map-side, the windows run over the ≤ buckets-row
    * aggregate. Counts exact; qini is a pinned double chain —
    * hash-exact. Output per bucket: (bucket, n_t, conv_t, n_c,
    * conv_c, cum_n_t, cum_conv_t, cum_n_c, cum_conv_c, qini) — qini
    * null while the cumulative control side is empty.
    */
  def qiniCurve(
      df: DataFrame,
      unit: Column,
      score: Column,
      converted: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 256 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two in [2, 256], got $buckets")
    val base = df.select(
      (pmod(KmvSketch.hash60(unit), lit(2L)) === 0L).as("t"),
      score.cast("double").as("s"),
      when(converted.cast("boolean").isNull, raise_error(lit(
        "qiniCurve: converted flag must be a non-null boolean")))
        .otherwise(converted.cast("boolean")).as("y"))
      .filter(col("s").isNotNull && !isnan(col("s")))
    // bounded: selectQuantiles emits one row per requested cut (< buckets)
    val cuts = ExactQuantile.selectQuantiles(
      base, col("s"), (1 until buckets).map(_.toDouble / buckets))
      .select("value").collect().map(_.getDouble(0)).sorted
    val ascBucket = cuts.map(c => when(col("s") > lit(c), 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    val agg = base
      .withColumn("bucket", lit(buckets) + 1 - ascBucket)
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("t") && col("y"), 1L).otherwise(0L)).as("conv_t"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(!col("t") && col("y"), 1L).otherwise(0L)).as("conv_c"))
    val wc = Window.orderBy(col("bucket"))
    val cum = agg.select(
      col("bucket"), col("n_t"), col("conv_t"), col("n_c"), col("conv_c"),
      sum(col("n_t")).over(wc).as("cum_n_t"),
      sum(col("conv_t")).over(wc).as("cum_conv_t"),
      sum(col("n_c")).over(wc).as("cum_n_c"),
      sum(col("conv_c")).over(wc).as("cum_conv_c"))
    cum.withColumn("qini",
      when(col("cum_n_c") > 0L,
        col("cum_conv_t").cast("double") - col("cum_conv_c").cast("double")
          * (col("cum_n_t").cast("double") / col("cum_n_c").cast("double"))))
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVALS (Vovk et al.; Lei et al.
    * 2018) — the distribution-free way to turn ANY point model into
    * calibrated intervals: subjects hash-split into train/calibrate/
    * test thirds (content-addressed, RNG-free), an OLS line fits on
    * train, q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest absolute calibration
    * residual, and ŷ ± q̂ covers ≥ 1−α of exchangeable test points.
    * The empirical test coverage is emitted so the guarantee is
    * AUDITED, not assumed.
    *
    * Exactness: x/y must be exact integers; OLS comes from
    * decimal(38,0) sufficient statistics cast once to double (the
    * [[Experiment.cuped]] discipline), residuals are pinned double
    * chains, the rank k is pure int64 (α = aNum/aDen cross-
    * multiplied), and q̂ is an exact order statistic via
    * [[ExactQuantile.selectKth]] — no global sort, and every output
    * hash-matches an oracle that replays the same arithmetic.
    *
    * Output: one row — (n_train, n_cal, n_test, slope, intercept, k,
    * qhat, covered, coverage). Degenerate fits (constant x on the
    * train split) raise.
    */
  def splitConformal(
      df: DataFrame,
      unit: Column,
      x: Column,
      y: Column,
      alphaNum: Long,
      alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must satisfy 0 < aNum/aDen < 1, got $alphaNum/$alphaDen")
    val spark = df.sparkSession
    import spark.implicits._
    def longGuard(c: Column, what: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"splitConformal: $what must be a non-null integer")))
        .otherwise(c.cast("long"))
    val base = df.select(
      pmod(KmvSketch.hash60(unit), lit(3L)).as("split"),
      longGuard(x, "x").as("x"), longGuard(y, "y").as("y"))
      .localCheckpoint()
    val d19 = "decimal(19,0)"
    def s38(c: Column) = sum(c).cast("decimal(38,0)")
    val tr = base.filter($"split" === 0L).agg(
      count(lit(1)).as("n"),
      s38($"x".cast(d19)).as("sx"), s38($"y".cast(d19)).as("sy"),
      s38($"x".cast(d19) * $"y".cast(d19)).as("sxy"),
      s38($"x".cast(d19) * $"x".cast(d19)).as("sxx")).collect()(0)
    val nTrain = tr.getLong(0)
    require(nTrain >= 2, s"splitConformal: train split has $nTrain rows")
    // decimal(38,0) → double is a correctly-rounded integer
    // conversion in every engine; the arithmetic below is the pinned
    // chain the oracle replays
    val gn = nTrain.toDouble
    val sx = tr.getDecimal(1).doubleValue
    val sy = tr.getDecimal(2).doubleValue
    val sxy = tr.getDecimal(3).doubleValue
    val sxx = tr.getDecimal(4).doubleValue
    val den = gn * sxx - sx * sx
    require(den > 0.0, "splitConformal: constant x on the train split")
    val slope = (gn * sxy - sx * sy) / den
    val icept = (sy - slope * sx) / gn
    def resid: Column =
      abs($"y".cast("double") - (lit(icept) + lit(slope) * $"x".cast("double")))
    val calib = base.filter($"split" === 1L).select(resid.as("r"))
    val nCal = calib.count()
    require(nCal >= 1, "splitConformal: empty calibration split")
    val k = math.min(nCal,
      ((nCal + 1L) * (alphaDen - alphaNum) + alphaDen - 1L) / alphaDen)
    val (_, sel) = ExactQuantile.selectKth(calib, $"r", Seq(k))
    val qhat = sel.head._2
    val test = base.filter($"split" === 2L).agg(
      count(lit(1)).as("n_test"),
      sum(when(resid <= qhat, 1L).otherwise(0L)).as("covered"))
    val out = test.select(
      lit(nTrain).as("n_train"), lit(nCal).as("n_cal"), $"n_test",
      lit(slope).as("slope"), lit(icept).as("intercept"),
      lit(k).as("k"), lit(qhat).as("qhat"), $"covered",
      when($"n_test" > 0L,
        $"covered".cast("double") / $"n_test".cast("double"))
        .otherwise(lit(null).cast("double")).as("coverage"))
      .localCheckpoint(true)
    base.unpersist()
    out
  }

  /** CONFUSION MATRIX — the classifier-evaluation census: one row per
    * observed (actual, predicted) cell with its count, the actual
    * class's row total, and the cell's share of that row (the
    * diagonal's share is per-class recall). Exact integer counts, one
    * pinned division — hash-exact; a composition anchor for any
    * categorical predictor (language ID, stump labels, churn flags).
    */
  def confusionMatrix(
      df: DataFrame,
      actual: Column,
      predicted: Column): DataFrame = {
    val base = df.select(actual.as("actual"), predicted.as("predicted"))
      .filter(col("actual").isNotNull && col("predicted").isNotNull)
    val cells = base.groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy(col("actual")).agg(sum(col("n")).as("row_total"))
      .select(col("actual").as("ra"), col("row_total"))
    cells.join(broadcast(rows), col("actual") === col("ra"))
      .select(col("actual"), col("predicted"), col("n"), col("row_total"),
        (col("n").cast("double") / col("row_total").cast("double"))
          .as("row_share"))
  }

  /** QUANTILE-FORECAST BACKTEST with exact PINBALL LOSS — fit the
    * per-group q = `num`/`den` empirical quantile on the training
    * half of a time split, score the evaluation half with the proper
    * scoring rule for quantiles,
    *
    *   L_q(y, f) = max(q·(y − f), (q − 1)·(y − f)),
    *
    * kept ×den so it is an exact INTEGER:
    * den·L = max(num·(y − f), (num − den)·(y − f)).
    *
    * The forecast is the exact ⌈q·n⌉-th train order statistic from
    * the two-crossing geometry over each group's distinct-value cells
    * (windows over cells, never rows); losses sum in decimal(38,0)
    * and travel as a STRING digest; the mean is one pinned double
    * division — hash-exact end to end. `value` must be a non-null
    * integer; groups with no train rows are dropped (no forecast to
    * score), groups with no eval rows emit n_eval = 0 and null mean.
    *
    * Output per group: (g, n_train, forecast, n_eval,
    * pinball_xden, mean_pinball).
    */
  def quantilePinballBacktest(
      df: DataFrame,
      group: Column,
      value: Column,
      isTrain: Column,
      num: Int,
      den: Int): DataFrame = {
    require(den >= 2 && num >= 1 && num < den,
      s"need 1 <= num < den, got $num/$den")
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"quantilePinballBacktest: $name must be a non-null integer")))
        .otherwise(c.cast("long"))
    val flag = when(isTrain.cast("boolean").isNull, raise_error(lit(
      "quantilePinballBacktest: isTrain must be a non-null boolean")))
      .otherwise(isTrain.cast("boolean"))
    val base = df.select(group.as("gk"), g(value, "value").as("v"),
      flag.as("tr"))
    val cells = base.filter(col("tr")).groupBy(col("gk"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("gk")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("gk"))
    val cum = cells
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    // ⌈num·n/den⌉ in exact integer arithmetic (Column `/` is true
    // division — floor() the double back; exact below 2⁵²)
    val k = floor((lit(num.toLong) * col("n") + (den - 1).toLong) /
      lit(den.toLong)).cast("long")
    val fc = cum.groupBy(col("gk")).agg(
      min(when(col("cum") >= k, col("v"))).as("f"),
      max(col("n")).as("n_train"))
      .select(col("gk").as("fk"), col("f"), col("n_train"))
    val d19 = "decimal(19,0)"
    val ev = base.filter(!col("tr"))
      .join(fc, col("gk") === col("fk"))
      .withColumn("lx",
        greatest(lit(num.toLong) * (col("v") - col("f")),
          lit((num - den).toLong) * (col("v") - col("f"))))
      .groupBy(col("gk"))
      .agg(count(lit(1)).as("n_eval"),
        sum(col("lx").cast(d19)).cast("decimal(38,0)").as("sx"))
      .select(col("gk").as("ek"), col("n_eval"), col("sx"))
    val twoP53 = 9007199254740992L
    fc.join(ev, col("fk") === col("ek"), "left")
      .select(
        col("fk").as("g"), col("n_train"), col("f").as("forecast"),
        coalesce(col("n_eval"), lit(0L)).as("n_eval"),
        coalesce(col("sx"), lit(0).cast("decimal(38,0)"))
          .cast("string").as("pinball_xden"),
        when(col("n_eval").isNotNull && col("n_eval") > 0L,
          when(col("sx") > lit(twoP53), raise_error(lit(
            "quantilePinballBacktest: loss sum exceeds 2^53")))
            .otherwise(col("sx")).cast("double") /
            (lit(den.toDouble) * col("n_eval").cast("double")))
          .otherwise(lit(null).cast("double")).as("mean_pinball"))
  }
}

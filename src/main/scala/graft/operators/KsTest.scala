package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov test — CONTINUOUS distribution drift
  * (the companion to q124's chi-square and q125's PSI, which are
  * categorical): D = sup_x |F_ref(x) − F_cur(x)| over the empirical
  * CDFs, evaluated exactly at every distinct sample value.
  *
  * Scale shape — the exact global cumulative is the q48/q73 two-phase
  * geometry, because a naive running sum over the global value order
  * funnels the corpus through ONE reducer:
  *   1. rows collapse to one row per DISTINCT value with per-side
  *      counts (partial-aggregable; ties must merge anyway — the CDF
  *      jumps once per distinct value);
  *   2. distinct values bucket by a monotone map of the value range;
  *      per-bucket side totals compute EXCLUSIVE prefix offsets on the
  *      driver (≤ `buckets` rows, the q61 bounded-collect class);
  *   3. the cumulative window runs per bucket (orderBy value), plus
  *      the bucket offset — never the whole corpus in one partition.
  * Everything is exact integer counts and exact divisions, so the
  * oracle hash-matches D bit-for-bit — a deterministic replay of a
  * statistical test.
  *
  * Output: ONE row — (n_ref, n_cur, d_stat, crit_05, drift) with
  * `crit_05 = 1.358·sqrt((n1+n2)/(n1·n2))` (the α = 0.05 asymptotic
  * critical value) and `drift = d_stat > crit_05`.
  */
object KsTest {

  def ksTwoSample(
      df: DataFrame,
      value: Column,
      isRef: Column,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    val base = df.select(
      when(value.cast("double").isNull, raise_error(lit(
        "ksTwoSample: value is null or not castable to double — filter first")))
        .otherwise(value.cast("double")).as("v"),
      when(isRef.cast("boolean").isNull, raise_error(lit(
        "ksTwoSample: isRef is null — every row needs a side")))
        .otherwise(isRef.cast("boolean")).as("r"))

    val perValue = base.groupBy("v").agg(
      sum(when(col("r"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("r"), 1L).otherwise(0L)).as("c2"))

    val bounds = perValue.agg(min("v"), max("v")).collect()(0)
    require(!bounds.isNullAt(0), "ksTwoSample: empty input")
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    // any monotone same-value-same-bucket map works (the Skyline
    // argument): prefix offsets + in-bucket order reconstruct the
    // exact global cumulative regardless of where boundaries rounded
    val span = if (hi > lo) hi - lo else 1.0
    val bucketCol = least(lit(buckets - 1).cast("long"),
      greatest(lit(0L), floor((col("v") - lit(lo)) * lit(buckets.toDouble) / lit(span)).cast("long")))
    val binned = perValue.withColumn("b", bucketCol)

    val totals = binned.groupBy("b")
      .agg(sum("c1").as("t1"), sum("c2").as("t2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n1 = totals.map(_._2).sum
    val n2 = totals.map(_._3).sum
    require(n1 >= 1 && n2 >= 1,
      s"ksTwoSample needs both samples non-empty, got n_ref=$n1 n_cur=$n2")
    // exclusive prefix offsets per bucket, shipped back as literals
    var a1 = 0L
    var a2 = 0L
    val offs = totals.map { case (b, t1, t2) =>
      val o = (b, a1, a2); a1 += t1; a2 += t2; o
    }
    def ladder(sel: ((Long, Long, Long)) => Long): Column =
      offs.foldLeft(lit(0L)) { (acc, o) => when(col("b") === o._1, lit(sel(o))).otherwise(acc) }

    val wCum = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = binned
      .withColumn("cc1", sum(col("c1")).over(wCum) + ladder(_._2))
      .withColumn("cc2", sum(col("c2")).over(wCum) + ladder(_._3))
      .select(abs(col("cc1").cast("double") / lit(n1.toDouble) -
        col("cc2").cast("double") / lit(n2.toDouble)).as("fd"))
      .agg(max("fd").as("d_stat"))

    // n1·n2 in DOUBLE — the long product overflows near n ~ 3e9 a side
    val crit = lit(1.358) * sqrt(lit((n1 + n2).toDouble) / lit(n1.toDouble * n2.toDouble))
    d.select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"), col("d_stat"),
      crit.as("crit_05"), (col("d_stat") > crit).as("drift"))
  }

  /** 1-D WASSERSTEIN (earth-mover) distance between two samples —
    * [[ksTwoSample]]'s integral sibling: where KS reports the WORST
    * CDF gap, W₁ reports the TOTAL transport cost,
    *
    *   W₁ = ∫ |F_ref(x) − F_cur(x)| dx
    *      = Σ_i |F_ref(x_i⁻) − F_cur(x_i⁻)| · (x_i − x_{i−1})
    *
    * over the merged distinct support x_1 < … < x_k — the drift
    * measure that SEES how far mass moved, not just that it moved
    * (a tiny shift of all mass and a large shift of little mass both
    * spike KS; W₁ ranks them correctly). Values must be EXACT
    * integers (scale prices to cents), so every term is exact:
    * |cumRef·n_cur − cumCur·n_ref| · gap in decimal(38,0), summed
    * exactly, ONE double division by n_ref·n_cur at the end — the
    * numerator hashes as a string and even the double matches
    * bit-for-bit cross-engine (two correctly-rounded operands, one
    * division).
    *
    * Scale shape: identical two-phase exact-cumulative geometry as
    * [[ksTwoSample]] (distinct-value collapse → ≤ `buckets` driver
    * rows for exclusive prefix offsets AND each bucket's predecessor
    * value → per-bucket windows). Output: one row
    * (n_ref, n_cur, n_support, w1_num, w1).
    */
  def wasserstein1D(
      df: DataFrame,
      value: Column,
      isRef: Column,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df.select(
      when(value.cast("long").isNull, raise_error(lit(
        "wasserstein1D: value must be a non-null integer — scale to cents first")))
        .otherwise(value.cast("long")).as("v"),
      when(isRef.cast("boolean").isNull, raise_error(lit(
        "wasserstein1D: isRef is null — every row needs a side")))
        .otherwise(isRef.cast("boolean")).as("r"))
    val perValue = base.groupBy("v").agg(
      sum(when(col("r"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("r"), 1L).otherwise(0L)).as("c2"))
    val bounds = perValue.agg(min("v"), max("v")).collect()(0)
    require(!bounds.isNullAt(0), "wasserstein1D: empty input")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1.0, hi.toDouble - lo.toDouble)
    // offset in DOUBLE, not long: `v - lo` in long arithmetic overflows
    // when the support spans more than Long.MaxValue (lo very negative,
    // hi very positive) — silent non-monotone bucket ids in non-ANSI
    // mode, runtime error under ANSI. Bucketing only needs a monotone
    // same-value-same-bucket map, so the double form is sufficient and
    // overflow-free (cumulatives stay exact per distinct value).
    val bucketCol = least(lit(buckets - 1).cast("long"),
      greatest(lit(0L),
        floor((col("v").cast("double") - lit(lo.toDouble)) * lit(buckets.toDouble) / lit(span))
          .cast("long")))
    val binned = perValue.withColumn("b", bucketCol)
    val stats = binned.groupBy("b")
      .agg(sum("c1").as("t1"), sum("c2").as("t2"), max("v").as("mx"),
        count(lit(1)).as("nv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val n1 = stats.map(_._2).sum
    val n2 = stats.map(_._3).sum
    require(n1 >= 1 && n2 >= 1,
      s"wasserstein1D needs both samples non-empty, got n_ref=$n1 n_cur=$n2")
    // per existing bucket: exclusive prefix counts + the PREDECESSOR
    // bucket's max value (the gap base for each bucket's first row;
    // the globally first support point has no predecessor and
    // contributes no interval)
    var a1 = 0L
    var a2 = 0L
    var prevMax: Option[Long] = None
    val offs = stats.map { case (b, t1, t2, mx, _) =>
      val o = (b, a1, a2, prevMax)
      a1 += t1; a2 += t2; prevMax = Some(mx)
      o
    }
    def ladder(sel: ((Long, Long, Long, Option[Long])) => Column): Column =
      offs.foldLeft(lit(null).cast("long")) { (acc, o) =>
        when(col("b") === o._1, sel(o)).otherwise(acc)
      }
    val wCum = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy("b").orderBy("v")
    val d19 = "decimal(19,0)"
    val terms = binned
      .withColumn("cc1", sum(col("c1")).over(wCum) + ladder(o => lit(o._2)))
      .withColumn("cc2", sum(col("c2")).over(wCum) + ladder(o => lit(o._3)))
      .withColumn("pv", coalesce(lag(col("v"), 1).over(wLag),
        ladder(o => o._4.map(lit(_)).getOrElse(lit(null).cast("long")))))
      .filter(col("pv").isNotNull)
      .select(
        (abs((col("cc1") - col("c1")).cast(d19) * lit(n2).cast(d19) -
          (col("cc2") - col("c2")).cast(d19) * lit(n1).cast(d19)) *
          (col("v") - col("pv")).cast(d19)).cast("decimal(38,0)").as("t"))
    val num = terms.agg(coalesce(sum(col("t")), lit(0).cast("decimal(38,0)"))
      .cast("decimal(38,0)").as("num"))
    num.select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      lit(stats.map(_._5).sum).as("n_support"),
      col("num").cast("string").as("w1_num"),
      (col("num").cast("double") / lit(n1.toDouble * n2.toDouble)).as("w1"))
  }

  /** SINKHORN ENTROPIC OPTIMAL TRANSPORT (Cuturi, NeurIPS 2013) —
    * the regularized companion to [[wasserstein1D]]'s exact EMD: over
    * binned histograms a, b with ground cost C_ij = |bin_i − bin_j|
    * and kernel K = exp(−C/ε), alternate the scaling iterations
    *
    *   u ← a / (K v),   v ← b / (Kᵀ u)
    *
    * for fixed rounds (deterministic, replayable — the convergence
    * trade every Sinkhorn deployment makes), and report the transport
    * cost ⟨diag(u) K diag(v), C⟩. After the closing v-step the plan's
    * COLUMN marginals equal b exactly (algebraic identity, any round
    * count); the row marginals converge with rounds, and AT
    * convergence the plan is feasible, so the entropy-smoothed cost
    * upper-bounds the exact binned 1-D Wasserstein and approaches it
    * as ε → 0 — properties the spec pins. An unconverged small-ε run
    * can undershoot the EMD (its row marginals are still off); pick
    * rounds for the ε in use, as every Sinkhorn deployment does.
    *
    * Scale shape: the corpus collapses to a ≤ `maxBins` histogram in
    * one partial-aggregable pass (the [[wasserstein1D]] contract);
    * the iterations run driver-side over that bounded model with
    * pinned left-to-right folds (bin-ascending), so every float op
    * is replayable — ε is an exact rational `epsNum/epsDen`, and the
    * only libm call is exp (oracles gate at 1e-9 relative).
    *
    * Output: one row (n_a, n_b, bins, ot_cost).
    */
  def sinkhornDistance(
      df: DataFrame,
      bin: Column,
      inSliceA: Column,
      epsNum: Long = 1L,
      epsDen: Long = 2L,
      rounds: Int = 10,
      maxBins: Int = 256): DataFrame = {
    require(epsNum > 0 && epsDen > 0, s"epsilon must be > 0, got $epsNum/$epsDen")
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    require(maxBins >= 2 && maxBins <= 4096, s"maxBins must be in [2, 4096], got $maxBins")
    val spark = df.sparkSession
    val base = df.select(
      when(bin.cast("long").isNull, raise_error(lit(
        "sinkhornDistance: bin must be a non-null integer")))
        .otherwise(bin.cast("long")).as("i"),
      when(inSliceA.cast("boolean").isNull, raise_error(lit(
        "sinkhornDistance: the slice flag must be a non-null boolean")))
        .otherwise(inSliceA.cast("boolean")).as("ina"))
    val hist = base.groupBy(col("i")).agg(
      sum(when(col("ina"), 1L).otherwise(0L)).as("ca"),
      sum(when(col("ina"), 0L).otherwise(1L)).as("cb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(hist.nonEmpty, "sinkhornDistance: empty input")
    require(hist.length <= maxBins,
      s"sinkhornDistance: ${hist.length} bins exceed maxBins=$maxBins — coarsen the bin")
    val na = hist.map(_._2).sum
    val nb = hist.map(_._3).sum
    require(na > 0 && nb > 0,
      s"sinkhornDistance: both slices need mass, got n_a=$na n_b=$nb")
    val bins = hist.map(_._1)
    val m = bins.length
    val a = hist.map(_._2.toDouble / na.toDouble)
    val b = hist.map(_._3.toDouble / nb.toDouble)
    val scale = epsDen.toDouble / epsNum.toDouble
    def k(i: Int, j: Int): Double =
      math.exp(-math.abs(bins(i) - bins(j)).toDouble * scale)
    val u = new Array[Double](m)
    val v = Array.fill(m)(1.0)
    for (_ <- 1 to rounds) {
      var i = 0
      while (i < m) {
        var s = 0.0
        var j = 0
        while (j < m) { s += k(i, j) * v(j); j += 1 }
        u(i) = a(i) / s
        i += 1
      }
      var j = 0
      while (j < m) {
        var s = 0.0
        var i2 = 0
        while (i2 < m) { s += k(i2, j) * u(i2); i2 += 1 }
        v(j) = b(j) / s
        j += 1
      }
    }
    // Kernel-underflow guard: for small ε or a wide bin spread,
    // exp(-|Δbin|/ε) underflows to 0.0, a row/column sum s hits 0, and
    // u(i)=a(i)/s or v(j)=b(j)/s turns infinite — ot_cost would then
    // be a silent NaN/Inf, against the suite's loud-failure contract.
    require(u.forall(x => !x.isNaN && !x.isInfinity) &&
      v.forall(x => !x.isNaN && !x.isInfinity),
      s"sinkhornDistance: scaling vector overflowed (kernel underflow at " +
        s"epsilon=$epsNum/$epsDen over bin spread ${bins.last - bins.head}) " +
        "— shrink the bin spread or raise epsilon")
    var cost = 0.0
    var i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        cost += u(i) * k(i, j) * v(j) * math.abs(bins(i) - bins(j)).toDouble
        j += 1
      }
      i += 1
    }
    import spark.implicits._
    Seq((na, nb, m.toLong, cost)).toDF("n_a", "n_b", "bins", "ot_cost")
  }

  /** MAXIMUM MEAN DISCREPANCY two-sample statistic (Gretton et al.
    * 2012, JMLR) — the kernel-mean member of the drift family beside
    * the KS sup-gap ([[ksTwoSample]]), the Wasserstein integral
    * ([[wasserstein1D]]), Sinkhorn's regularized OT
    * ([[sinkhornDistance]]) and Jensen–Shannon's divergence: the
    * squared RKHS distance between the two slices' kernel mean
    * embeddings,
    *
    *   MMD² = Σᵢⱼ aᵢaⱼK(i,j) + Σᵢⱼ bᵢbⱼK(i,j) − 2Σᵢⱼ aᵢbⱼK(i,j)
    *
    * over the RBF kernel K(i,j) = exp(−(binᵢ−binⱼ)²/(2σ²)) — the
    * biased V-statistic estimator, which is ‖μ_a − μ_b‖² ≥ 0 exactly
    * and detects ANY distribution difference (RBF is characteristic),
    * including equal-mean-different-shape drift the moment tests
    * miss.
    *
    * Scale shape — identical to [[sinkhornDistance]]: the corpus
    * collapses to one ≤ `maxBins` histogram in a single
    * partial-aggregable pass; the O(bins²) kernel sums run
    * driver-side over that bounded model with pinned bin-ascending
    * loops (i-major, j-minor), so every float op is replayable. σ is
    * an exact rational `sigmaNum/sigmaDen` and exp is the only libm
    * call — oracles gate at 1e-9 relative.
    *
    * Output: one row (n_a, n_b, bins, mmd2).
    */
  def mmdTwoSample(
      df: DataFrame,
      bin: Column,
      inSliceA: Column,
      sigmaNum: Long = 1L,
      sigmaDen: Long = 1L,
      maxBins: Int = 256): DataFrame = {
    require(sigmaNum > 0 && sigmaDen > 0,
      s"sigma must be > 0, got $sigmaNum/$sigmaDen")
    require(maxBins >= 2 && maxBins <= 4096,
      s"maxBins must be in [2, 4096], got $maxBins")
    val spark = df.sparkSession
    val base = df.select(
      when(bin.cast("long").isNull, raise_error(lit(
        "mmdTwoSample: bin must be a non-null integer")))
        .otherwise(bin.cast("long")).as("i"),
      when(inSliceA.cast("boolean").isNull, raise_error(lit(
        "mmdTwoSample: the slice flag must be a non-null boolean")))
        .otherwise(inSliceA.cast("boolean")).as("ina"))
    val hist = base.groupBy(col("i")).agg(
      sum(when(col("ina"), 1L).otherwise(0L)).as("ca"),
      sum(when(col("ina"), 0L).otherwise(1L)).as("cb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(hist.nonEmpty, "mmdTwoSample: empty input")
    require(hist.length <= maxBins,
      s"mmdTwoSample: ${hist.length} bins exceed maxBins=$maxBins — coarsen the bin")
    val na = hist.map(_._2).sum
    val nb = hist.map(_._3).sum
    require(na > 0 && nb > 0,
      s"mmdTwoSample: both slices need mass, got n_a=$na n_b=$nb")
    val bins = hist.map(_._1)
    val m = bins.length
    val a = hist.map(_._2.toDouble / na.toDouble)
    val b = hist.map(_._3.toDouble / nb.toDouble)
    // −1/(2σ²) as one pinned double from exact longs: (den²)/(2·num²)
    val negInvTwoSigma2 =
      -(sigmaDen.toDouble * sigmaDen.toDouble) /
        (2.0 * sigmaNum.toDouble * sigmaNum.toDouble)
    var saa = 0.0
    var sbb = 0.0
    var sab = 0.0
    var i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        val d = (bins(i) - bins(j)).toDouble
        val k = math.exp(d * d * negInvTwoSigma2)
        saa += a(i) * a(j) * k
        sbb += b(i) * b(j) * k
        sab += a(i) * b(j) * k
        j += 1
      }
      i += 1
    }
    val mmd2 = saa + sbb - 2.0 * sab
    // exp ∈ (0,1] and the weights are probabilities — a non-finite
    // result can only mean a broken kernel; keep the loud contract
    require(!mmd2.isNaN && !mmd2.isInfinity,
      s"mmdTwoSample: non-finite statistic (saa=$saa sbb=$sbb sab=$sab)")
    import spark.implicits._
    Seq((na, nb, m.toLong, mmd2)).toDF("n_a", "n_b", "bins", "mmd2")
  }

  /** The shared merged-support cumulative frame behind
    * [[cramerVonMises]] and [[energyDistance1D]] — the
    * [[ksTwoSample]]/[[wasserstein1D]] two-phase geometry over an
    * exact integer axis: one row per DISTINCT value `v` with per-side
    * counts (c1, c2), INCLUSIVE exact cumulatives (cc1, cc2), and the
    * predecessor support point `pv` (null at the global minimum).
    * Distinct values bucket by a monotone range map; per-bucket side
    * totals and predecessor maxima ship back as ≤ `buckets` driver
    * literals (the bounded-collect class), so the cumulative window
    * runs per bucket — never the corpus through one partition.
    */
  private final case class MergedCdf(
      frame: DataFrame, n1: Long, n2: Long, nSupport: Long,
      vLo: Long, vHi: Long)

  private def mergedCdf(
      df: DataFrame,
      value: Column,
      isRef: Column,
      buckets: Int,
      opName: String): MergedCdf = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df.select(
      when(value.cast("long").isNull, raise_error(lit(
        s"$opName: value must be a non-null integer — scale to cents first")))
        .otherwise(value.cast("long")).as("v"),
      when(isRef.cast("boolean").isNull, raise_error(lit(
        s"$opName: isRef is null — every row needs a side")))
        .otherwise(isRef.cast("boolean")).as("r"))
    val perValue = base.groupBy("v").agg(
      sum(when(col("r"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("r"), 1L).otherwise(0L)).as("c2"))
    val bounds = perValue.agg(min("v"), max("v")).collect()(0)
    require(!bounds.isNullAt(0), s"$opName: empty input")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1.0, hi.toDouble - lo.toDouble)
    // offset in DOUBLE, not long: `v - lo` in long arithmetic overflows
    // when the support spans more than Long.MaxValue (lo very negative,
    // hi very positive) — silent non-monotone bucket ids in non-ANSI
    // mode, runtime error under ANSI. Bucketing only needs a monotone
    // same-value-same-bucket map, so the double form is sufficient and
    // overflow-free (cumulatives stay exact per distinct value).
    val bucketCol = least(lit(buckets - 1).cast("long"),
      greatest(lit(0L),
        floor((col("v").cast("double") - lit(lo.toDouble)) * lit(buckets.toDouble) / lit(span))
          .cast("long")))
    val binned = perValue.withColumn("b", bucketCol)
    // bounded: ≤ `buckets` rows by construction (groupBy over the bucket id)
    val stats = binned.groupBy("b")
      .agg(sum("c1").as("t1"), sum("c2").as("t2"), max("v").as("mx"),
        count(lit(1)).as("nv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val n1 = stats.map(_._2).sum
    val n2 = stats.map(_._3).sum
    require(n1 >= 1 && n2 >= 1,
      s"$opName needs both samples non-empty, got n_ref=$n1 n_cur=$n2")
    var a1 = 0L
    var a2 = 0L
    var prevMax: Option[Long] = None
    val offs = stats.map { case (b, t1, t2, mx, _) =>
      val o = (b, a1, a2, prevMax)
      a1 += t1; a2 += t2; prevMax = Some(mx)
      o
    }
    // Per-bucket offsets ship as a TINY broadcast dimension joined on b
    // — not an O(buckets)-deep nested CaseWhen evaluated per row × three
    // columns (at buckets=256 that was ~768 when-branches in the plan:
    // correct, but heavy enough codegen to fall back to interpreted
    // mode). The broadcast adds no shuffle: the window below exchanges
    // on b either way.
    val spark = df.sparkSession
    import spark.implicits._
    val offsDf = offs.toSeq.toDF("b", "off1", "off2", "pmax")
    val wCum = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy("b").orderBy("v")
    val frame = binned.join(broadcast(offsDf), Seq("b"))
      .withColumn("cc1", sum(col("c1")).over(wCum) + col("off1"))
      .withColumn("cc2", sum(col("c2")).over(wCum) + col("off2"))
      .withColumn("pv", coalesce(lag(col("v"), 1).over(wLag), col("pmax")))
      .drop("off1", "off2", "pmax")
    MergedCdf(frame, n1, n2, stats.map(_._5).sum, lo, hi)
  }

  /** TWO-SAMPLE CRAMÉR–VON MISES criterion (Anderson, Ann. Math.
    * Statist. 1962) — the rank-weighted quadratic member of the drift
    * family: where KS reports the WORST CDF gap and W₁ integrates the
    * gap over the VALUE axis, T integrates the SQUARED gap over the
    * pooled sample itself,
    *
    *   T = (n·m)/N² · Σ_{k=1..N} (F_n(z_k) − G_m(z_k))²
    *
    * over all N = n+m pooled observations z_k (ties contribute their
    * multiplicity), so T is distribution-free under H₀ and
    * insensitive to any monotone rescaling of the axis — the
    * complement to [[energyDistance1D]], which weights the same
    * squared gap by VALUE distance instead.
    *
    * Every term is exact: with inclusive cumulatives (cc1, cc2) at a
    * distinct value carrying counts (c1, c2), the pooled sum collapses
    * to Σ_v (c1+c2)·(cc1·m − cc2·n)², an exact decimal(38,0), and
    *   T = t_num / (n·m·N²)
    * is ONE double division of two correctly-rounded exact integers —
    * fully hash-exact despite being a float statistic. Same two-phase
    * cumulative geometry as [[wasserstein1D]] (never the corpus in one
    * partition). Output: one row (n_ref, n_cur, n_support, t_num, t).
    *
    * Exactness ceiling (guarded, like distanceCorrelationDaily's
    * maxPeriodsPerKey note): t_num ≤ N·(n·m)² must fit decimal(38,0)
    * — beyond it ANSI mode fails loudly but NON-ANSI silently nulls
    * the overflowing term and `sum` drops it, corrupting t_num, so
    * the bound is enforced with a driver-side require. Worst case
    * (n = m = N/2, maximal ties) admits N up to ~7·10⁷ pooled rows
    * per comparison — drift tests run per feature/key, far below it.
    */
  def cramerVonMises(
      df: DataFrame,
      value: Column,
      isRef: Column,
      buckets: Int = 256): DataFrame = {
    val cdf = mergedCdf(df, value, isRef, buckets, "cramerVonMises")
    val (n1, n2) = (cdf.n1, cdf.n2)
    require(BigInt(n1 + n2) * (BigInt(n1) * BigInt(n2)).pow(2) <
        BigInt(10).pow(38),
      s"cramerVonMises: N*(n*m)^2 exceeds decimal(38,0) at n_ref=$n1 " +
        s"n_cur=$n2 — non-ANSI mode would silently null overflowing terms; " +
        "shard the comparison (e.g. per key) below ~7e7 pooled rows")
    val d19 = "decimal(19,0)"
    val dGap = (col("cc1").cast(d19) * lit(n2).cast(d19) -
      col("cc2").cast(d19) * lit(n1).cast(d19)).cast(d19)
    val terms = cdf.frame.select(
      ((col("c1") + col("c2")).cast(d19) * (dGap * dGap))
        .cast("decimal(38,0)").as("t"))
    val num = terms.agg(coalesce(sum(col("t")), lit(0).cast("decimal(38,0)"))
      .cast("decimal(38,0)").as("num"))
    // n·m·N² exact, then ONE correctly-rounded cast each side of the division
    val den = (BigInt(n1) * BigInt(n2) * BigInt(n1 + n2) * BigInt(n1 + n2)).toDouble
    num.select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      lit(cdf.nSupport).as("n_support"),
      col("num").cast("string").as("t_num"),
      (col("num").cast("double") / lit(den)).as("t"))
  }

  /** 1-D ENERGY DISTANCE (Székely & Rizzo 2004) — the
    * value-axis-weighted quadratic member of the drift family. In one
    * dimension the energy distance E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|
    * reduces exactly to twice the Cramér ℓ₂ integral,
    *
    *   E = 2 · ∫ (F(x) − G(x))² dx,
    *
    * so it shares [[wasserstein1D]]'s interval decomposition with the
    * gap SQUARED: large mass displacements dominate small jitter
    * quadratically (W₁ weighs them linearly, [[cramerVonMises]]
    * ignores the axis entirely). Values must be exact integers (scale
    * to cents): each interval term is (ec1·m − ec2·n)²·gap in exact
    * decimal(38,0) over the EXCLUSIVE cumulatives (the CDF is constant
    * on [prev, v)), and
    *   E = 2 · e_num / (n·m)²
    * is one double division of exact integers followed by an EXACT
    * power-of-two scaling — hash-exact. Output: one row
    * (n_ref, n_cur, n_support, e_num, energy).
    *
    * Exactness ceiling (guarded): e_num ≤ (n·m)²·span where span is
    * the integer value range — must fit decimal(38,0); non-ANSI mode
    * would silently null overflowing terms, so the bound is a
    * driver-side require. E.g. values in cents spanning 10⁹ admit
    * n·m up to ~3·10¹⁴ (n = m ≈ 1.7·10⁷ rows per side).
    */
  def energyDistance1D(
      df: DataFrame,
      value: Column,
      isRef: Column,
      buckets: Int = 256): DataFrame = {
    val cdf = mergedCdf(df, value, isRef, buckets, "energyDistance1D")
    val (n1, n2) = (cdf.n1, cdf.n2)
    require((BigInt(n1) * BigInt(n2)).pow(2) *
        (BigInt(cdf.vHi) - BigInt(cdf.vLo)).max(BigInt(1)) <
        BigInt(10).pow(38),
      s"energyDistance1D: (n*m)^2*span exceeds decimal(38,0) at " +
        s"n_ref=$n1 n_cur=$n2 span=${BigInt(cdf.vHi) - BigInt(cdf.vLo)} — " +
        "non-ANSI mode would silently null overflowing terms; shard the " +
        "comparison or coarsen the integer value scale")
    val d19 = "decimal(19,0)"
    val dGap = ((col("cc1") - col("c1")).cast(d19) * lit(n2).cast(d19) -
      (col("cc2") - col("c2")).cast(d19) * lit(n1).cast(d19)).cast(d19)
    val terms = cdf.frame
      .filter(col("pv").isNotNull)
      .select(((dGap * dGap) * (col("v") - col("pv")).cast(d19))
        .cast("decimal(38,0)").as("t"))
    val num = terms.agg(coalesce(sum(col("t")), lit(0).cast("decimal(38,0)"))
      .cast("decimal(38,0)").as("num"))
    val den = (BigInt(n1) * BigInt(n2) * BigInt(n1) * BigInt(n2)).toDouble
    num.select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      lit(cdf.nSupport).as("n_support"),
      col("num").cast("string").as("e_num"),
      (lit(2.0) * (col("num").cast("double") / lit(den))).as("energy"))
  }

  /** KUIPER'S TWO-SAMPLE TEST (Kuiper 1960) — the tail-balanced
    * sibling of [[ksTwoSample]]: V = D⁺ + D⁻, the sum of the largest
    * signed CDF exceedances in EACH direction, where KS takes only
    * the single largest |gap|. V weighs both tails equally (KS is
    * most sensitive near the median) and is invariant under cyclic
    * shifts of a circular axis — the drift test for hour-of-day /
    * day-of-week style wraparound variables.
    *
    * Everything is exact: D⁺ and D⁻ are maxima of the exact integers
    * ±(cc1·n₂ − cc2·n₁) over the merged support (clamped at 0: the
    * empirical gap function starts and ends at zero, so each
    * directed sup is ≥ 0), their sum is exact, and
    *   V = (dplus_num + dminus_num) / (n₁·n₂)
    * is ONE double division of exact integers — hash-exact. Same
    * two-phase cumulative geometry as [[wasserstein1D]]. Output: one
    * row (n_ref, n_cur, n_support, dplus_num, dminus_num, v).
    */
  def kuiperTwoSample(
      df: DataFrame,
      value: Column,
      isRef: Column,
      buckets: Int = 256): DataFrame = {
    val cdf = mergedCdf(df, value, isRef, buckets, "kuiperTwoSample")
    val (n1, n2) = (cdf.n1, cdf.n2)
    val d19 = "decimal(19,0)"
    val gap = col("cc1").cast(d19) * lit(n2).cast(d19) -
      col("cc2").cast(d19) * lit(n1).cast(d19)
    val sup = cdf.frame
      .select(gap.cast("decimal(38,0)").as("g"))
      .agg(greatest(max(col("g")), lit(0).cast("decimal(38,0)")).as("dp"),
        greatest(max(-col("g")), lit(0).cast("decimal(38,0)")).as("dm"))
    sup.select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      lit(cdf.nSupport).as("n_support"),
      col("dp").cast("string").as("dplus_num"),
      col("dm").cast("string").as("dminus_num"),
      ((col("dp") + col("dm")).cast("double") /
        lit((BigInt(n1) * BigInt(n2)).toDouble)).as("v"))
  }

  /** TWO-SAMPLE ANDERSON–DARLING statistic, tie-adjusted midrank
    * version A²akN (Scholz & Stephens, JASA 1987 — the k-sample
    * form at k = 2, the variant SciPy's `anderson_ksamp` computes):
    * the CDF-gap integral weighted by 1/(H(1−H)), which up-weights
    * the TAILS where [[cramerVonMises]] weighs all ranks equally —
    * the drift test that catches tail-mass shifts the body-centric
    * tests dilute. Under H₀ its mean is k − 1 = 1.
    *
    * Input is a pre-binned integer axis (the [[sinkhornDistance]] /
    * [[mmdTwoSample]] contract): the corpus collapses to one
    * ≤ `maxBins` histogram in a single partial-aggregable pass, and
    * A²akN of the binned distributions is computed EXACTLY from it.
    * With l_j the bin's pooled count, midrank cumulatives scaled ×2
    * (B2 = 2B_j − l_j, M2_ij = 2M_ij − l_ij — all exact integers),
    * each sample-i term is
    *
    *   l_j · X_ij² / D_j,   X_ij = N·M2_ij − n_i·B2_j,
    *                        D_j  = B2_j·(2N − B2_j) − N·l_j
    *
    * (the ×4 scalings cancel), and
    * A² = (S_a/n_a + S_b/n_b) · (N−1) / N². The term numerators are
    * exact decimals cast once (correctly rounded), D_j is an exact
    * long, each term is one division, the folds run in pinned
    * bin-ascending order over the ≤ maxBins frame, and the final
    * normalization is two more pinned ops on exact operands — so the
    * float statistic replays bit-for-bit. Degenerate D_j = 0
    * (single-bin input) raises. Output: one row
    * (n_ref, n_cur, bins, a2_akn).
    */
  def andersonDarlingTwoSample(
      df: DataFrame,
      bin: Column,
      isRef: Column,
      maxBins: Int = 4096): DataFrame = {
    require(maxBins >= 2 && maxBins <= 65536,
      s"maxBins must be in [2, 65536], got $maxBins")
    val base = df.select(
      when(bin.cast("long").isNull, raise_error(lit(
        "andersonDarlingTwoSample: bin must be a non-null integer")))
        .otherwise(bin.cast("long")).as("v"),
      when(isRef.cast("boolean").isNull, raise_error(lit(
        "andersonDarlingTwoSample: isRef is null — every row needs a side")))
        .otherwise(isRef.cast("boolean")).as("r"))
    val hist = base.groupBy("v").agg(
      sum(when(col("r"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("r"), 1L).otherwise(0L)).as("c2"))
    val totals = hist.agg(
      coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c2")), lit(0L)).as("n2"),
      count(lit(1)).as("nb")).collect()(0)
    val (n1, n2, nb) = (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    require(nb >= 1, "andersonDarlingTwoSample: empty input")
    require(n1 >= 1 && n2 >= 1,
      s"andersonDarlingTwoSample needs both samples non-empty, got n_ref=$n1 n_cur=$n2")
    require(nb <= maxBins,
      s"andersonDarlingTwoSample: $nb bins exceed maxBins=$maxBins — coarsen the bin")
    require(nb >= 2,
      "andersonDarlingTwoSample: single-bin input — the H(1−H) weight degenerates")
    val bigN = n1 + n2
    // ≤ maxBins rows by the guard above: the single-partition pinned
    // fold is over the AGGREGATED histogram, never the corpus
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d19 = "decimal(19,0)"
    def x(m2: Column, ni: Long): Column =
      (m2.cast(d19) * lit(bigN).cast(d19) -
        col("b2").cast(d19) * lit(ni).cast(d19)).cast(d19)
    def term(m2: Column, ni: Long): Column = {
      val xx = x(m2, ni)
      // divides by the GUARDED weight so a degenerate D_j raises on
      // whichever row carries it, not only at the frame's tail
      (col("l").cast(d19) * (xx * xx)).cast("decimal(38,0)").cast("double") /
        col("djg").cast("double")
    }
    val folded = hist.coalesce(1)
      .withColumn("l", col("c1") + col("c2"))
      .withColumn("b2", lit(2L) * sum(col("c1") + col("c2")).over(wCum) - col("l"))
      .withColumn("m2a", lit(2L) * sum(col("c1")).over(wCum) - col("c1"))
      .withColumn("m2b", lit(2L) * sum(col("c2")).over(wCum) - col("c2"))
      .withColumn("dj",
        col("b2") * (lit(2L * bigN) - col("b2")) - lit(bigN) * col("l"))
      .withColumn("djg", when(col("dj") <= 0L, raise_error(lit(
        "andersonDarlingTwoSample: degenerate H(1−H) weight — " +
          "all mass in one bin"))).otherwise(col("dj")))
      .withColumn("sa", sum(term(col("m2a"), n1)).over(wCum))
      .withColumn("sb", sum(term(col("m2b"), n2)).over(wCum))
      .withColumn("rn", row_number().over(Window.orderBy(col("v").desc)))
      .filter(col("rn") === 1)
    folded.select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"), lit(nb).as("bins"),
      ((col("sa") / lit(n1.toDouble) + col("sb") / lit(n2.toDouble)) *
        lit((bigN - 1).toDouble) / lit(bigN.toDouble * bigN.toDouble))
        .as("a2_akn"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RNG-free resampling: bootstrap uncertainty estimates whose
  * "randomness" is the portable md5 idiom ([[Sampling]] contract), so
  * re-executed tasks, re-ingested corpora, and other engines draw the
  * IDENTICAL resamples — reproducible error bars, the property actual
  * RNG bootstraps lose the moment a task retries.
  */
object Resample {

  /** Cumulative Poisson(1) CDF thresholds P(X ≤ k), k = 0..7, as
    * 17-digit double literals — the SAME strings appear in oracles as
    * `CAST('…' AS DOUBLE)`, so both engines compare against identical
    * bits. P(X ≤ 7) ≈ 1 − 10⁻⁵; the tail clamps to 8.
    */
  val poissonCdf: Seq[String] = Seq(
    "0.36787944117144233", "0.73575888234288467", "0.91969860292860584",
    "0.98101184312384623", "0.99634015317265632", "0.99940581518241835",
    "0.99991675885071209", "0.99998974937475262")

  /** POISSON BOOTSTRAP confidence interval for the per-group mean
    * (the streaming-friendly bootstrap: resample counts are
    * independent Poisson(1) per row instead of a multinomial over n —
    * Chamandy et al. 2012, "Estimating uncertainty for massive data
    * streams"): B deterministic resamples, each row's weight in
    * resample b drawn by inverting the Poisson CDF at the portable
    * uniform md5(id:b)/2³². One aggregation pass computes all B
    * weighted (sum, count) pairs map-side; the B resample means then
    * sort INSIDE one row (an array of B doubles — never a shuffle),
    * so the quantile bounds and the bootstrap SE are pure pinned
    * arithmetic — hash-exact.
    *
    * Scale shape: B×2 aggregation buffers per group (B ≤ 128
    * enforced), ONE exchange keyed on group, nothing else. The id
    * must be a unique STRING key per row (the md5 contract).
    *
    * Output per group: (group, n, mean, boot_se, boot_lo, boot_hi)
    * with lo/hi the ⌈B·α⌉-th / ⌈B·(1−α)⌉-th smallest resample means,
    * α = alphaNum/alphaDen.
    */
  def poissonBootstrapCI(
      df: DataFrame,
      group: Column,
      id: Column,
      value: Column,
      b: Int = 32,
      alphaNum: Long = 1L,
      alphaDen: Long = 40L): DataFrame = {
    require(b >= 8 && b <= 128, s"B must be in [8, 128], got $b")
    require(alphaNum > 0 && 2 * alphaNum < alphaDen,
      s"alpha must satisfy 0 < alphaNum/alphaDen < 1/2, got $alphaNum/$alphaDen")
    val loIdx = ((b * alphaNum + alphaDen - 1) / alphaDen).toInt.max(1)
    val hiIdx = b + 1 - loIdx
    val vL = value.cast("long")
    val vG = when(vL.isNull, raise_error(lit(
      "poissonBootstrapCI: value must be a non-null integer"))).otherwise(vL)
    val idG = when(id.cast("string").isNull, raise_error(lit(
      "poissonBootstrapCI: id must be a non-null string key")))
      .otherwise(id.cast("string"))
    def weight(bi: Int): Column = {
      val u = conv(substring(
        md5(concat(col("__id"), lit(s":$bi")).cast("binary")), 1, 8), 16, 10)
        .cast("long").cast("double") / lit(4294967296.0)
      // inverse CDF as a first-match-wins when-chain (thresholds
      // ascend, so the chain IS the quantile function)
      poissonCdf.zipWithIndex.tail.foldLeft(
        when(u < lit(poissonCdf.head.toDouble), lit(0L))) {
        case (acc, (t, k)) => acc.when(u < lit(t.toDouble), lit(k.toLong))
      }.otherwise(lit(8L))
    }
    // one pass: per-row weights fold into 2B aggregation buffers
    val base = df.select(group.as("group"), idG.as("__id"), vG.as("v"))
      .select(Seq(col("group"), col("v")) ++
        (0 until b).map(bi => weight(bi).as(s"w$bi")): _*)
    val d19 = "decimal(19,0)"
    val twoP53 = 9007199254740992L
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"),
        sum(col("v").cast(d19)).cast("decimal(38,0)").as("s0")) ++
        (0 until b).flatMap(bi => Seq(
          sum((col(s"w$bi") * col("v")).cast(d19)).cast("decimal(38,0)").as(s"ws$bi"),
          sum(col(s"w$bi")).as(s"wn$bi")))
    val wide = base.groupBy(col("group")).agg(aggs.head, aggs.tail: _*)
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"poissonBootstrapCI: |$what| exceeds 2^53 — rescale the value")))
        .otherwise(c).cast("double")
    // an all-zero resample (possible only for tiny groups) yields a
    // null mean; it drops from the sorted array and the quantile
    // indices clamp — documented small-n behavior
    val means = (0 until b).map(bi =>
      when(col(s"wn$bi") > 0L,
        e(col(s"ws$bi"), s"resample $bi's weighted sum")
          / col(s"wn$bi").cast("double")))
    val arr = array_compact(array(means: _*))
    val sortedM = sort_array(arr)
    val nb = size(sortedM)
    val meanOfMeans = aggregate(sortedM, lit(0.0), (a, x) => a + x) /
      nb.cast("double")
    val seSq = aggregate(sortedM, lit(0.0),
      (a, x) => a + (x - meanOfMeans) * (x - meanOfMeans)) /
      (nb - 1).cast("double")
    wide.select(col("group"), col("n"),
      (e(col("s0"), "the value sum") / col("n").cast("double")).as("mean"),
      when(nb > 1, sqrt(seSq)).as("boot_se"),
      element_at(sortedM, least(lit(loIdx), nb)).as("boot_lo"),
      element_at(sortedM, least(lit(hiIdx), nb)).as("boot_hi"))
  }

  /** PAIRED (sign-flip) PERMUTATION TEST (Fisher 1935; the
    * randomization test every A/B platform reaches for when normality
    * is off the table): under H₀ the sign of each paired difference
    * dᵢ is exchangeable, so T_b = Σᵢ sᵢ(b)·dᵢ over B deterministic
    * ±1 assignments samples the EXACT permutation null, and
    *
    *   p̂ = (1 + #{b : |T_b| ≥ |T_obs|}) / (B + 1)
    *
    * is the standard add-one Monte-Carlo estimate (Davison & Hinkley)
    * — conservative, never zero. Signs come from the portable md5
    * idiom ([[Sampling]] contract): sᵢ(b) = +1 iff the first 32 hash
    * bits of "id:b" land below 2³¹ — reproducible across engines,
    * retries, and re-ingestion, which a seeded RNG loses on the first
    * task retry.
    *
    * Everything is INTEGER arithmetic: differences are exact longs,
    * the B+1 sums fold in decimal(38,0) (no order dependence, no
    * float), the extreme-count comparison is exact, and the single
    * division is pinned — the whole output hash-matches an oracle.
    * Scale shape: ONE aggregation pass, B+1 buffers, one 1-row
    * result; the corpus never shuffles (the q343 geometry).
    *
    * Output: one row (n_pairs, t_obs, b_reps, n_extreme, p_value).
    */
  def pairedPermutationTest(
      df: DataFrame,
      id: Column,
      diff: Column,
      b: Int = 64): DataFrame = {
    require(b >= 8 && b <= 256, s"B must be in [8, 256], got $b")
    val dL = diff.cast("long")
    val dG = when(dL.isNull, raise_error(lit(
      "pairedPermutationTest: diff must be a non-null integer (scale to cents first)")))
      .otherwise(dL)
    val idG = when(id.cast("string").isNull, raise_error(lit(
      "pairedPermutationTest: id must be a non-null string key")))
      .otherwise(id.cast("string"))
    def sign(bi: Int): Column =
      when(conv(substring(
        md5(concat(col("__id"), lit(s":$bi")).cast("binary")), 1, 8), 16, 10)
        .cast("long") < lit(2147483648L), lit(1L)).otherwise(lit(-1L))
    val d19 = "decimal(19,0)"
    val base = df.select(idG.as("__id"), dG.as("d"))
      .select(col("d") +:
        (0 until b).map(bi => (sign(bi) * col("d")).as(s"t$bi")): _*)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"),
        sum(col("d").cast(d19)).cast("decimal(38,0)").as("t_obs")) ++
        (0 until b).map(bi =>
          sum(col(s"t$bi").cast(d19)).cast("decimal(38,0)").as(s"ts$bi"))
    val wide = base.agg(aggs.head, aggs.tail: _*)
    val nExtreme = (0 until b).map(bi =>
      when(abs(col(s"ts$bi")) >= abs(col("t_obs")), 1L).otherwise(0L))
      .reduce(_ + _)
    val twoP53 = 9007199254740992L
    val tObsL = when(abs(col("t_obs")) > lit(twoP53), raise_error(lit(
      "pairedPermutationTest: |t_obs| exceeds 2^53 — rescale the diff")))
      .otherwise(col("t_obs")).cast("long")
    wide.select(
      col("n").as("n_pairs"), tObsL.as("t_obs"),
      lit(b.toLong).as("b_reps"), nExtreme.as("n_extreme"),
      ((nExtreme + 1L).cast("double") / lit((b + 1).toDouble)).as("p_value"))
  }
}

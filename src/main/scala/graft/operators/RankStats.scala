package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact RANK-SUM statistics per group — the shared machinery behind
  * ROC-AUC and the Mann-Whitney U test, both of which are the same
  * quantity (AUC = U₁/(n₁·n₀), the probability a positive outranks a
  * negative, ties counted half — Hanley & McNeil 1982; Mann & Whitney
  * 1947).
  *
  * The statistic needs every row's MIDRANK (ties share the average
  * rank), which naively is a per-group global sort — `rank() OVER
  * (PARTITION BY g ORDER BY v)` puts an entire group's rows on one
  * reducer at 100 TB. Instead this reuses [[Sampling.percentileRank]]'s
  * two-phase geometry, one level coarser: rows first collapse to
  * DISTINCT (group, value) cells (one partial-aggregable pass — ties
  * never travel individually), cells land in `buckets` equal-width
  * bins of their group's [min, max] range, per-(group, bucket) cell
  * counts prefix-sum into exclusive lower-bucket offsets (a window
  * over ≤ `buckets` rows per group, never the data), and the exact
  * in-bucket cumulative runs only WITHIN each (group, bucket)
  * partition — each task owns ~cells/buckets cells, no reducer owns a
  * group. Midranks are bucket-invariant: bucketing is monotone in v
  * and equal values share a bucket, so the derived ranks are exactly
  * the global ones regardless of where the boundaries fall (no float
  * edge case can desync them — contrast the bin-id-predicate care
  * [[ExactQuantile]] needs, which this construction sidesteps).
  *
  * Everything stays EXACT integer/decimal arithmetic (doubled
  * midranks `2·r` dodge the .5 halves; the rank-sum and tie-cube
  * sums accumulate in decimal(38,0) so petabyte-scale groups cannot
  * overflow a long); the single double division per output statistic
  * is pinned-order, so DuckDB oracles hash-match bit-for-bit.
  *
  * Contract: `value` must be numeric, non-null and finite (NaN/±Inf
  * corrupt the bucket geometry — they raise instead); `label` must be
  * 0/1 (membership in the positive class / sample 1).
  */
object RankStats {

  /** Per-group exact rank-sum sufficient statistics over the distinct
    * value cells: n (rows), n1 (label-1 rows), r1x2 (2 × the sum of
    * sample-1 midranks, exact), ties (Σ t³−t over tie groups, the
    * variance-correction term). Columns: k, n, n1, r1x2, ties.
    */
  def rankSumStats(
      df: DataFrame,
      key: Column,
      value: Column,
      label: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val vD = value.cast("double")
    val vG = when(vD.isNull || isnan(vD) || vD === Double.PositiveInfinity ||
      vD === Double.NegativeInfinity, raise_error(lit(
      "rankSumStats: value must be non-null and finite"))).otherwise(vD)
    val yL = label.cast("long")
    val yG = when(yL.isNull || (yL =!= 0L && yL =!= 1L), raise_error(lit(
      "rankSumStats: label must be 0 or 1"))).otherwise(yL)
    val base = df.select(key.as("k"), vG.as("v"), yG.as("y"))
    // ties collapse here: one cell per distinct (group, value)
    val cells = base.groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val ranked = withMidranks(cells, buckets)
    val d12 = "decimal(12,0)"
    ranked.groupBy(col("k")).agg(
      sum(col("c")).as("n"),
      sum(col("p")).as("n1"),
      sum(col("p").cast("decimal(18,0)") * col("mr2").cast("decimal(18,0)"))
        .cast("decimal(38,0)").as("r1x2"),
      sum(col("c").cast(d12) * col("c").cast(d12) * col("c").cast(d12)
        - col("c").cast(d12)).cast("decimal(38,0)").as("ties"))
  }

  /** Per-group exact ROC-AUC of `score` against binary `label` —
    * ties-corrected (each positive/negative tie contributes ½), the
    * rank formula AUC = (R₁ − n₁(n₁+1)/2) / (n₁·n₀). Groups with an
    * empty class emit null (AUC undefined). Output: k, n_pos, n_neg,
    * auc.
    */
  def rocAuc(
      df: DataFrame,
      key: Column,
      score: Column,
      label: Column,
      buckets: Int = 1024): DataFrame = {
    val st = rankSumStats(df, key, score, label, buckets)
    val n1D = col("n1").cast("double")
    val n0D = (col("n") - col("n1")).cast("double")
    st.select(
      col("k"),
      col("n1").as("n_pos"),
      (col("n") - col("n1")).as("n_neg"),
      when(col("n1") > 0L && col("n") - col("n1") > 0L,
        (col("r1x2").cast("double") - n1D * (n1D + lit(1.0)))
          / (lit(2.0) * n1D * n0D))
        .otherwise(lit(null).cast("double")).as("auc"))
  }

  /** The bucketed midrank machinery shared by every rank statistic
    * here: cells (k, v, c, …extras) gain `mr2` = the DOUBLED global
    * midrank of value v within group k. Extras ride through
    * untouched. NOT (hi - lo) for the bucket span: a group's range
    * can exceed the largest finite double (lo near -MaxValue, hi near
    * +MaxValue), overflowing the span to +Infinity — (v-lo)/span·B
    * then goes NaN for large v, the int cast yields a NULL bucket
    * that sorts before bucket 0 in the prefix window, and the largest
    * values silently take the lowest midranks. Dividing each endpoint
    * first keeps every intermediate finite (|hi/B| ≤ MaxValue/B for
    * B ≥ 2); the geometry stays monotone in v with equal values
    * sharing a bucket, so the derived ranks are exactly the global
    * ones regardless of where the boundaries fall.
    */
  private def withMidranks(cells: DataFrame, buckets: Int): DataFrame = {
    val spans = cells.groupBy(col("k"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val withSpan = cells.join(spans, Seq("k"))
    val width = col("hi") / buckets - col("lo") / buckets
    val bucketed = withSpan.withColumn("b",
      if (buckets == 1) lit(0)
      else when(width === 0.0, lit(0)).otherwise(
        least(floor(col("v") / width - col("lo") / width)
          .cast("int"), lit(buckets - 1))))
    val counts = bucketed.groupBy(col("k"), col("b")).agg(sum(col("c")).as("cb"))
    val wPrefix = Window.partitionBy(col("k")).orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = counts
      .withColumn("e", sum(col("cb")).over(wPrefix) - col("cb"))
      .select(col("k").as("pk"), col("b").as("pb"), col("e"))
    val wIn = Window.partitionBy(col("k"), col("b")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(prefixes, col("k") === col("pk") && col("b") === col("pb"))
      .withColumn("cbin", sum(col("c")).over(wIn) - col("c"))
      // doubled midrank: 2·(exclusive count below) + t + 1 — integer
      .withColumn("mr2",
        lit(2L) * (col("e") + col("cbin")) + col("c") + lit(1L))
  }

  /** SPEARMAN RANK CORRELATION per group — Pearson on the DOUBLED
    * midranks of x and y (ties share average ranks, the standard ρ
    * with tie correction built in by construction). Both rank tables
    * come from the bucketed machinery above (no per-group global
    * sort); rows join their two midranks back by value and the six
    * sufficient statistics accumulate in decimal(38,0), so ρ is a
    * pinned chain of correctly-rounded ops on exact integers —
    * hash-exact where a float-ranked formulation never is. Survives
    * any monotone transform of either variable; the rank sibling of
    * [[Profiling.groupedCorr]] (Pearson) and `kendallTauDaily` (τ).
    *
    * Output per group: (k, n, rho) — null for degenerate groups
    * (n < 2 or either variable constant).
    */
  def spearman(
      df: DataFrame,
      key: Column,
      x: Column,
      y: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def fin(c: Column, what: String): Column = {
      val v = c.cast("double")
      when(v.isNull || isnan(v) || v === Double.PositiveInfinity ||
        v === Double.NegativeInfinity, raise_error(lit(
        s"spearman: $what must be non-null and finite"))).otherwise(v)
    }
    val base = df.select(key.as("k"), fin(x, "x").as("xv"), fin(y, "y").as("yv"))
    def rankTable(v: Column): DataFrame = withMidranks(
      base.select(col("k"), v.as("v")).groupBy(col("k"), col("v"))
        .agg(count(lit(1)).as("c")), buckets)
      .select(col("k"), col("v"), col("mr2"))
    val rx = rankTable(col("xv"))
      .select(col("k").as("xk"), col("v").as("xvv"), col("mr2").as("rx"))
    val ry = rankTable(col("yv"))
      .select(col("k").as("yk"), col("v").as("yvv"), col("mr2").as("ry"))
    val rowsRanked = base
      .join(rx, col("k") === col("xk") && col("xv") === col("xvv"))
      .join(ry, col("k") === col("yk") && col("yv") === col("yvv"))
    val d19 = "decimal(19,0)"
    def s38(c: Column) = sum(c).cast("decimal(38,0)")
    val stats = rowsRanked.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      s38(col("rx").cast(d19)).as("sx"),
      s38(col("ry").cast(d19)).as("sy"),
      s38(col("rx").cast(d19) * col("ry").cast(d19)).as("sxy"),
      s38(col("rx").cast(d19) * col("rx").cast(d19)).as("sxx"),
      s38(col("ry").cast(d19) * col("ry").cast(d19)).as("syy"))
    def dbl(n: String) = col(n).cast("double")
    val nD = col("n").cast("double")
    val vx = nD * dbl("sxx") - dbl("sx") * dbl("sx")
    val vy = nD * dbl("syy") - dbl("sy") * dbl("sy")
    val cov = nD * dbl("sxy") - dbl("sx") * dbl("sy")
    stats.select(col("k"), col("n"),
      when(col("n") > 1L && vx > 0.0 && vy > 0.0,
        cov / (sqrt(vx) * sqrt(vy)))
        .otherwise(lit(null).cast("double")).as("rho"))
  }

  /** JONCKHEERE–TERPSTRA pair table — the building block of the
    * ordered-alternative trend test (Jonckheere 1954; Terpstra 1952):
    * for every ordered pair of groups gi < gj, the Mann-Whitney count
    * U_ij = #{(a, b) : a ∈ gi, b ∈ gj, a < b} + ½·ties, doubled to
    * stay integral (`u2`). The J statistic is Σ u2/2 over pairs —
    * dose-response monotonicity across ordered segments.
    *
    * NO per-group sort and NO pair enumeration: rows collapse to
    * (group, value) cells, every group's cumulative-below-v counts
    * come from ONE window over the shared distinct-value axis, and
    * each pair's U reduces over cells — work is O(cells·K), never
    * O(n²). All integer arithmetic — hash-exact.
    *
    * `group` must be a non-null integral ordinal; `value` non-null
    * and finite (raises otherwise). Output per ordered pair:
    * (gi, gj, n_i, n_j, u2).
    */
  def jonckheerePairs(
      df: DataFrame,
      group: Column,
      value: Column): DataFrame = {
    val gL = group.cast("long")
    val gG = when(gL.isNull, raise_error(lit(
      "jonckheerePairs: group must be a non-null integer"))).otherwise(gL)
    val vD = value.cast("double")
    val vG = when(vD.isNull || isnan(vD) || vD === Double.PositiveInfinity ||
      vD === Double.NegativeInfinity, raise_error(lit(
      "jonckheerePairs: value must be non-null and finite"))).otherwise(vD)
    val cells = df.select(gG.as("g"), vG.as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    // cumulative strictly-below count per (group, value) on the SHARED
    // value axis: every group needs its mass below every other
    // group's values, so densify via the distinct-value frame first
    val axis = cells.select(col("v")).distinct()
    val dense = axis.join(cells.select(col("g")).distinct()).join(
      cells, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val wBelow = Window.partitionBy(col("g")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = dense
      .withColumn("below", coalesce(sum(col("c")).over(wBelow), lit(0L)))
    val totals = cells.groupBy(col("g")).agg(sum(col("c")).as("n"))
    // pair reduction: u2(i, j) = Σ_v c_j(v)·(2·below_i(v) + c_i(v))
    val left = cum.select(col("g").as("gi"), col("v"),
      col("c").as("ci"), col("below").as("bi"))
    val right = cum.select(col("g").as("gj"), col("v").as("vj"),
      col("c").as("cj"))
    val pairs = left.join(right, col("v") === col("vj") && col("gi") < col("gj"))
      .groupBy(col("gi"), col("gj"))
      // u2 is n_i·n_j-scale — decimal(38,0), not int64 (the Fifo
      // overflow lesson)
      .agg(sum(col("cj").cast("decimal(19,0)")
        * (lit(2L) * col("bi") + col("ci")).cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("u2"))
    pairs
      .join(totals.select(col("g").as("gi"), col("n").as("n_i")), Seq("gi"))
      .join(totals.select(col("g").as("gj"), col("n").as("n_j")), Seq("gj"))
      .select(col("gi"), col("gj"), col("n_i"), col("n_j"), col("u2"))
  }

  /** Per-group MANN-WHITNEY U test — the nonparametric two-sample
    * shift test ([[graft.operators.Experiment]]'s Welch t is its
    * parametric sibling): U₁ from sample-1 rank sums, the normal
    * approximation z with the standard TIE-CORRECTED variance
    * n₁n₀/12 · ((N+1) − Σ(t³−t)/(N(N−1))). Degenerate groups (an
    * empty sample, or every value tied so the variance is 0) emit
    * null z. Output: k, n1, n0, u1, z.
    */
  def mannWhitney(
      df: DataFrame,
      key: Column,
      value: Column,
      sample1: Column,
      buckets: Int = 1024): DataFrame = {
    val st = rankSumStats(df, key, value, sample1, buckets)
    val n1D = col("n1").cast("double")
    val n0D = (col("n") - col("n1")).cast("double")
    val nD = col("n").cast("double")
    val u1 = (col("r1x2").cast("double") - n1D * (n1D + lit(1.0))) / lit(2.0)
    val varU = n1D * n0D / lit(12.0) *
      ((nD + lit(1.0)) - col("ties").cast("double") / (nD * (nD - lit(1.0))))
    st.select(
      col("k"),
      col("n1"),
      (col("n") - col("n1")).as("n0"),
      when(col("n1") > 0L && col("n") - col("n1") > 0L, u1)
        .otherwise(lit(null).cast("double")).as("u1"),
      when(col("n1") > 0L && col("n") - col("n1") > 0L && varU > 0.0,
        (u1 - n1D * n0D / lit(2.0)) / sqrt(varU))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** CLIFF'S DELTA per key (Cliff 1993) — the ordinal EFFECT SIZE the
    * [[mannWhitney]] z only tests: δ = (#{x₁ > x₀} − #{x₁ < x₀}) /
    * (n₁·n₀), the probability a sample-1 value exceeds a sample-0
    * value minus the reverse. Non-parametric, tie-robust, bounded in
    * [−1, 1] — the standard companion report to a significant U test
    * (an A/B gate needs BOTH "is it real" and "is it big").
    *
    * No pair is ever materialized: from the exact doubled rank sum,
    * 2·U₁ = r1x2 − n₁(n₁+1) and gt − lt = 2·U₁ − n₁·n₀ (cross-side
    * ties cancel), so
    *
    *   δ = (r1x2 − n₁(n₁+1) − n₁·n₀) / (n₁·n₀)
    *
    * is a ratio of EXACT integers riding [[rankSumStats]]'s bucketed
    * midrank geometry — one pinned double division per key,
    * hash-portable, with the exact numerator/denominator as string
    * digests. The standard magnitude band (Romano et al. 2006:
    * negligible < 0.147 ≤ small < 0.33 ≤ medium < 0.474 ≤ large)
    * comes from exact integer comparisons (|num|·1000 vs
    * threshold·1000·den), so the label can never disagree with the
    * emitted δ by a rounding hair.
    *
    * Output per key: (k, n1, n0, delta, delta_num, delta_den,
    * magnitude) — delta/magnitude null when either sample is empty.
    */
  def cliffsDelta(
      df: DataFrame,
      key: Column,
      value: Column,
      sample1: Column,
      buckets: Int = 1024): DataFrame = {
    val st0 = rankSumStats(df, key, value, sample1, buckets)
    // 3e9 rows per key keeps every product (r1x2·1000 ≤ 2n²·1000)
    // comfortably inside decimal(38,0) — beyond that Spark's decimal
    // multiply would silently round and the band could lie
    val st = st0.withColumn("n", when(col("n") > 3000000000L,
      raise_error(lit("cliffsDelta: more than 3e9 rows in one key " +
        "overflows the exact band arithmetic — pre-aggregate to cells " +
        "or subsample"))).otherwise(col("n")))
    val d38 = "decimal(38,0)"
    val n1 = col("n1").cast("decimal(19,0)")
    val n0 = (col("n") - col("n1")).cast("decimal(19,0)")
    val num = (col("r1x2").cast(d38) - (n1 * (n1 + 1)).cast(d38) -
      (n1 * n0).cast(d38)).cast(d38)
    val den = (n1 * n0).cast(d38)
    val absNum = when(num < 0, -num).otherwise(num)
    val defined = col("n1") > 0L && col("n") - col("n1") > 0L
    st.select(
      col("k"),
      col("n1"),
      (col("n") - col("n1")).as("n0"),
      when(defined, num.cast("double") / den.cast("double")).as("delta"),
      when(defined, num.cast("string")).as("delta_num"),
      when(defined, den.cast("string")).as("delta_den"),
      when(defined,
        when(absNum * 1000 < den * 147, "negligible")
          .when(absNum * 1000 < den * 330, "small")
          .when(absNum * 1000 < den * 474, "medium")
          .otherwise("large")).as("magnitude"))
  }

  /** KRUSKAL–WALLIS H per key — the K-sample extension of
    * [[mannWhitney]] (Kruskal & Wallis 1952): do the `group`s of
    * `value` within each `key` share one location? Midranks are
    * POOLED across groups within a key (the bucketed machinery, no
    * per-key global sort), each group reduces to its exact doubled
    * rank sum r2_g in decimal(38,0), and
    *
    *   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1),  R_g = r2_g/2,
    *
    * with the tie correction H' = H / (1 − Σ(t³−t)/(N³−N)).
    *
    * Σ_g R_g²/n_g mixes per-group divisions, so it cannot stay in one
    * decimal; instead each group's term is ONE pinned double and the
    * sum accumulates through a window in group order over the
    * ≤K-row-per-key term table — ordered float accumulation is
    * bit-stable across engines (the Nelson–Aalen discipline), so H is
    * hash-exact. Exactness bound: r2_g ≤ 2N·n_g and Σ(t³−t) < N³ must
    * cast to double exactly, guarded LOUDLY at 2⁵³ (N ≲ 2×10⁶ per key
    * with arbitrary ties; far more when values are distinct) — a
    * statistic over more rows than that per key should pre-aggregate
    * to cells first.
    *
    * `group` must be a non-null integral ordinal; `value` non-null
    * finite. Output per key: (k, n, n_groups, h, h_adj) — h_adj null
    * when every value in the key is tied (correction denominator 0).
    */
  def kruskalWallis(
      df: DataFrame,
      key: Column,
      group: Column,
      value: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val gL = group.cast("long")
    val gG = when(gL.isNull, raise_error(lit(
      "kruskalWallis: group must be a non-null integer"))).otherwise(gL)
    val vD = value.cast("double")
    val vG = when(vD.isNull || isnan(vD) || vD === Double.PositiveInfinity ||
      vD === Double.NegativeInfinity, raise_error(lit(
      "kruskalWallis: value must be non-null and finite"))).otherwise(vD)
    val base = df.select(key.as("k"), gG.as("g"), vG.as("v"))
    // pooled midranks: ties collapse per (key, value) across groups
    val pooled = base.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
    val ranked = withMidranks(pooled, buckets)
      .select(col("k").as("rk"), col("v").as("rv"), col("mr2"))
    val gcells = base.groupBy(col("k"), col("g"), col("v"))
      .agg(count(lit(1)).as("cg"))
    val d12 = "decimal(12,0)"
    val twoP53 = 9007199254740992L // 2^53: largest power-of-two exact double
    def exactDbl(c: Column, what: String): Column =
      when(c > lit(twoP53), raise_error(lit(
        s"kruskalWallis: $what exceeds 2^53 — double cast would round; " +
          "pre-aggregate or shrink the key grain"))).otherwise(c)
        .cast("double")
    val perGroup = gcells
      .join(ranked, col("k") === col("rk") && col("v") === col("rv"))
      .groupBy(col("k"), col("g"))
      .agg(
        sum(col("cg")).as("ng"),
        sum(col("cg").cast("decimal(18,0)") * col("mr2").cast("decimal(18,0)"))
          .cast("decimal(38,0)").as("r2"))
    val term = exactDbl(col("r2"), "a group rank sum") *
      exactDbl(col("r2"), "a group rank sum") /
      (lit(4.0) * col("ng").cast("double"))
    val wCum = Window.partitionBy(col("k")).orderBy(col("g").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"))
    val sums = perGroup
      .withColumn("t", term)
      .withColumn("srun", sum(col("t")).over(wCum))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("g").asc)))
      .withColumn("gcnt", count(lit(1)).over(wAll))
      .filter(col("rn") === col("gcnt"))
      .select(col("k").as("sk"), col("srun").as("s"),
        col("gcnt").as("n_groups"))
    val perKey = pooled.groupBy(col("k")).agg(
      sum(col("c")).as("n"),
      sum(col("c").cast(d12) * col("c").cast(d12) * col("c").cast(d12)
        - col("c").cast(d12)).cast("decimal(38,0)").as("ties"))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + lit(1.0))) * col("s") -
      lit(3.0) * (nD + lit(1.0))
    val tieDen = lit(1.0) -
      exactDbl(col("ties"), "the tie-cube sum") / (nD * nD * nD - nD)
    perKey.join(sums, col("k") === col("sk"))
      .select(col("k"), col("n"), col("n_groups"),
        when(col("n") >= 2L, h).otherwise(lit(null).cast("double")).as("h"),
        when(col("n") >= 2L && tieDen > 0.0, h / tieDen)
          .otherwise(lit(null).cast("double")).as("h_adj"))
  }

  /** PER-GROUP GINI COEFFICIENT over non-negative integer amounts
    * (cents) — the inequality measure of every revenue/exposure
    * audit, computed EXACTLY from the bucketed midrank machinery
    * (no global sort): with doubled midranks mr2 = 2·r̄ᵢ,
    * G = (Σ vᵢ·mr2ᵢ − (n+1)·Σvᵢ) / (n·Σvᵢ) — the rank formula with
    * ties at their average rank.
    *
    * Everything accumulates in exact decimals; the final division is
    * the only double. The two big operands can exceed 2^53, and the
    * decimal→double cast is engine-specific at that size, so oracles
    * should compare `gini` at 1e-9 (numerator and denominator
    * re-derive exactly). Staying under decimal(38,0): per-cell
    * c·mr2 ≤ ~2n² must fit decimal(19,0) (n per group < 2×10⁹ —
    * beyond int64 row counts per group, not a real bound), and
    * v·(c·mr2) must fit 38 digits (v ≤ 10¹⁸/n² cents — petabyte-safe
    * for money).
    *
    * Output: (k, n, sum_cents, gini) — sum_cents a decimal STRING
    * digest (the gate cannot hash decimals); gini null when Σv = 0
    * or n < 2.
    */
  def giniCoefficient(
      df: DataFrame,
      key: Column,
      amountCents: Column,
      buckets: Int = 1024): DataFrame = {
    val vL = amountCents.cast("long")
    val vG = when(vL.isNull || vL < 0L, raise_error(lit(
      "giniCoefficient: amountCents must be non-null and >= 0")))
      .otherwise(vL)
    val cells = df.select(key.as("k"), vG.cast("double").as("v"))
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
    val ranked = withMidranks(cells, buckets)
    val d12 = "decimal(12,0)"
    val d19 = "decimal(19,0)"
    val st = ranked.groupBy(col("k")).agg(
      sum(col("c")).as("n"),
      sum(col("c").cast(d19) * col("v").cast(d19)).cast("decimal(38,0)")
        .as("sv"),
      sum((col("c").cast(d12) * col("mr2").cast(d12)).cast(d19)
        * col("v").cast(d19)).cast("decimal(38,0)").as("svr"))
    st.select(
      col("k"), col("n"),
      col("sv").cast("string").as("sum_cents"),
      when(col("n") >= 2L && col("sv") > 0,
        (col("svr").cast("double") -
          (col("n") + 1L).cast("double") * col("sv").cast("double"))
          / (col("n").cast("double") * col("sv").cast("double")))
        .otherwise(lit(null).cast("double")).as("gini"))
  }

  /** WILCOXON SIGNED-RANK per key — the paired one-sample location
    * test (Wilcoxon 1945), the within-subject sibling of
    * [[mannWhitney]]: for paired integer measurements (x, y), rank
    * the nonzero |y − x| with POOLED midranks (the bucketed
    * machinery — no per-key sort), W⁺ = Σ ranks of positive
    * differences, and the tie-corrected normal approximation
    *
    *   z = (W⁺ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48).
    *
    * Doubled rank sums stay in decimal(38,0); every double division
    * is pinned-order on exactly-cast integers (2⁵³ guards raise
    * LOUDLY) — hash-exact. Zero differences are dropped (the standard
    * treatment); `x`/`y` must be non-null integers. Output per key:
    * (k, n_pairs, n_nonzero, w_plus, z) — z null when no nonzero
    * pairs or zero variance (all |d| tied at one value... impossible
    * for n ≥ 1 unless every pair moved identically; guarded anyway).
    */
  def wilcoxonSignedRank(
      df: DataFrame,
      key: Column,
      x: Column,
      y: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"wilcoxonSignedRank: $name must be a non-null integer")))
        .otherwise(c.cast("long"))
    val base = df.select(key.as("k"), (g(y, "y") - g(x, "x")).as("d"))
    val nz = base.filter(col("d") =!= 0L)
      .select(col("k"), abs(col("d")).cast("double").as("v"),
        (col("d") > 0L).cast("long").as("pos"))
    val cells = nz.groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
    val ranked = withMidranks(cells, buckets)
    val d12 = "decimal(12,0)"
    val twoP53 = 9007199254740992L
    def exactDbl(c: Column, what: String): Column =
      when(c > lit(twoP53), raise_error(lit(
        s"wilcoxonSignedRank: $what exceeds 2^53 — double cast would " +
          "round; shrink the key grain"))).otherwise(c).cast("double")
    val st = ranked.groupBy(col("k")).agg(
      sum(col("c")).as("n"),
      sum(col("p").cast("decimal(18,0)") * col("mr2").cast("decimal(18,0)"))
        .cast("decimal(38,0)").as("w2p"),
      sum(col("c").cast(d12) * col("c").cast(d12) * col("c").cast(d12)
        - col("c").cast(d12)).cast("decimal(38,0)").as("ties"))
    val pairs = base.groupBy(col("k")).agg(count(lit(1)).as("n_pairs"))
    val nD = col("n").cast("double")
    val wp = exactDbl(col("w2p"), "the positive rank sum") / lit(2.0)
    val e = nD * (nD + lit(1.0)) / lit(4.0)
    val varw = nD * (nD + lit(1.0)) * (lit(2.0) * nD + lit(1.0)) / lit(24.0) -
      exactDbl(col("ties"), "the tie-cube sum") / lit(48.0)
    pairs.join(st.select(col("k").as("sk"), col("n"), col("w2p"), col("ties")),
      col("k") === col("sk"), "left")
      .select(
        col("k"), col("n_pairs"),
        coalesce(col("n"), lit(0L)).as("n_nonzero"),
        when(col("n").isNotNull, wp)
          .otherwise(lit(null).cast("double")).as("w_plus"),
        when(col("n").isNotNull && varw > 0.0, (wp - e) / sqrt(varw))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  /** FRIEDMAN TEST per key — the K-treatment repeated-measures rank
    * test (Friedman 1937), [[kruskalWallis]]'s within-BLOCK sibling:
    * each complete block (one value per treatment) ranks its K cells,
    * treatment rank sums R_t accumulate across blocks, and
    *
    *   χ² = 12/(B·K(K+1)) · Σ_t R_t² − 3B(K+1),
    *
    * tie-corrected by 1 − Σ_blocks Σ(t³−t) / (B·K(K²−1)).
    *
    * Ranking windows run over K-row BLOCK partitions (millions of
    * tiny independent partitions — embarrassingly parallel, never a
    * global sort), doubled midranks keep everything integral, and
    * Σ R_t² is an EXACT decimal because every treatment spans the
    * same B blocks (no per-group division — unlike KW, no float fold
    * is needed at all). Hash-exact; 2⁵³ guards raise loudly.
    *
    * `df` must have AT MOST one row per (key, block, treatment) —
    * duplicates raise. Blocks missing any of the key's treatments are
    * dropped (complete-design requirement). Output per key:
    * (k, n_blocks, k_treatments, chi2, chi2_adj) — chi2_adj null when
    * every block is fully tied.
    */
  def friedman(
      df: DataFrame,
      key: Column,
      block: Column,
      treatment: Column,
      value: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"friedman: $name must be a non-null integer"))).otherwise(c.cast("long"))
    val base = df.select(key.as("k"), g(block, "block").as("b"),
      g(treatment, "treatment").as("t"), g(value, "value").as("v"))
    val cells0 = base.groupBy(col("k"), col("b"), col("t"))
      .agg(max(col("v")).as("vm"), count(lit(1)).as("cnt"))
    val cells = cells0.select(col("k"), col("b"), col("t"),
      when(col("cnt") > 1L, raise_error(lit(
        "friedman: more than one row per (key, block, treatment) — " +
          "reduce cells first"))).otherwise(col("vm")).as("v"))
    // keep only complete blocks: every treatment the key has anywhere
    val kTreat = cells.groupBy(col("k"))
      .agg(countDistinct(col("t")).as("kk"))
    val perBlock = cells.groupBy(col("k"), col("b"))
      .agg(count(lit(1)).as("bt"))
    val complete = perBlock.join(kTreat, Seq("k"))
      .filter(col("bt") === col("kk"))
      .select(col("k").as("ck"), col("b").as("cb"), col("kk"))
    val kept = cells.join(complete,
      col("k") === col("ck") && col("b") === col("cb"))
    // within-block doubled midrank: 2·minrank + #equal − 1
    val wRank = Window.partitionBy(col("k"), col("b")).orderBy(col("v").asc)
    val wEq = Window.partitionBy(col("k"), col("b"), col("v"))
    val ranked = kept
      .withColumn("mr2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wEq) - lit(1L))
    val twoP53 = 9007199254740992L
    def exactDbl(c: Column, what: String): Column =
      when(c > lit(twoP53), raise_error(lit(
        s"friedman: $what exceeds 2^53 — double cast would round")))
        .otherwise(c).cast("double")
    val d18 = "decimal(18,0)"
    // rank sums stay within 18 digits (R_t ≤ 2BK ≤ 10¹⁸ up to 10¹⁷
    // blocks) so the square fits decimal(37,0) in BOTH engines —
    // 38×38 products raise in DuckDB and silently clamp in Spark
    val perTreat = ranked.groupBy(col("k"), col("t")).agg(
      sum(col("mr2").cast(d18)).cast("decimal(38,0)").as("r2raw"))
      .select(col("k"), col("t"),
        when(col("r2raw") > lit(999999999999999999L).cast("decimal(38,0)"),
          raise_error(lit("friedman: a rank sum exceeds 18 digits")))
          .otherwise(col("r2raw").cast(d18)).as("r2"))
    val s2 = perTreat.groupBy(col("k")).agg(
      sum(col("r2") * col("r2")).cast("decimal(38,0)").as("s2"),
      count(lit(1)).as("ktr"))
    val bCount = complete.groupBy(col("ck")).agg(
      count(lit(1)).as("nb"))
    val tieCells = ranked.groupBy(col("k"), col("b"), col("v"))
      .agg(count(lit(1)).as("c"))
    val d12 = "decimal(12,0)"
    val ties = tieCells.groupBy(col("k")).agg(
      sum(col("c").cast(d12) * col("c").cast(d12) * col("c").cast(d12)
        - col("c").cast(d12)).cast("decimal(38,0)").as("ties"))
    val bD = col("nb").cast("double")
    val kD = col("ktr").cast("double")
    val chi2 = lit(12.0) / (bD * kD * (kD + lit(1.0))) *
      (exactDbl(col("s2"), "the squared rank-sum total") / lit(4.0)) -
      lit(3.0) * bD * (kD + lit(1.0))
    val den = lit(1.0) - exactDbl(col("ties"), "the tie-cube sum") /
      (bD * kD * (kD * kD - lit(1.0)))
    s2.join(bCount, col("k") === col("ck"))
      .join(ties, Seq("k"))
      .select(col("k"), col("nb").as("n_blocks"),
        col("ktr").as("k_treatments"),
        when(col("ktr") >= 2L, chi2)
          .otherwise(lit(null).cast("double")).as("chi2"),
        when(col("ktr") >= 2L && den > 0.0, chi2 / den)
          .otherwise(lit(null).cast("double")).as("chi2_adj"))
  }

  /** PAGE'S TREND TEST per key (Page 1963) — [[friedman]]'s ORDERED
    * alternative: when treatments carry a natural order (dose levels,
    * priority tiers), L = Σ_j j·R_j weights each treatment's rank sum
    * by its ordinal, far more powerful than the omnibus χ² against a
    * monotone trend. Normal approximation
    *
    *   z = (L − B·k(k+1)²/4) / √(B·k²(k+1)(k²−1)/144)
    *
    * (the no-ties variance — conservative under ties, documented).
    * Same complete-block, K-row-partition ranking as [[friedman]];
    * L stays exact via doubled midranks in decimal. Treatments must
    * be the consecutive ordinals 1..K within each key (raises
    * otherwise). Output per key: (k, n_blocks, k_treatments, l_stat,
    * z) — z null when k < 2 or B = 0.
    */
  def pageTrend(
      df: DataFrame,
      key: Column,
      block: Column,
      treatment: Column,
      value: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"pageTrend: $name must be a non-null integer"))).otherwise(c.cast("long"))
    val base = df.select(key.as("k"), g(block, "block").as("b"),
      g(treatment, "treatment").as("t"), g(value, "value").as("v"))
    val cells0 = base.groupBy(col("k"), col("b"), col("t"))
      .agg(max(col("v")).as("vm"), count(lit(1)).as("cnt"))
    val cells = cells0.select(col("k"), col("b"), col("t"),
      when(col("cnt") > 1L, raise_error(lit(
        "pageTrend: more than one row per (key, block, treatment)")))
        .otherwise(col("vm")).as("v"))
    val kTreat = cells.groupBy(col("k")).agg(
      countDistinct(col("t")).as("kk"),
      min(col("t")).as("tmin"), max(col("t")).as("tmax"))
      .select(col("k"),
        when(col("tmin") =!= 1L || col("tmax") =!= col("kk"),
          raise_error(lit(
            "pageTrend: treatments must be the consecutive ordinals 1..K")))
          .otherwise(col("kk")).as("kk"))
    val perBlock = cells.groupBy(col("k"), col("b"))
      .agg(count(lit(1)).as("bt"))
    val complete = perBlock.join(kTreat, Seq("k"))
      .filter(col("bt") === col("kk"))
      .select(col("k").as("ck"), col("b").as("cb"), col("kk"))
    val kept = cells.join(complete,
      col("k") === col("ck") && col("b") === col("cb"))
    val wRank = Window.partitionBy(col("k"), col("b")).orderBy(col("v").asc)
    val wEq = Window.partitionBy(col("k"), col("b"), col("v"))
    val ranked = kept.withColumn("mr2",
      lit(2L) * rank().over(wRank) + count(lit(1)).over(wEq) - lit(1L))
    val d18 = "decimal(18,0)"
    // L2 = Σ_j j·R2_j — j ≤ k keeps the product narrow; rank sums
    // follow the friedman 18-digit discipline
    val byK = ranked.groupBy(col("k")).agg(
      sum(col("t").cast("decimal(6,0)") * col("mr2").cast(d18))
        .cast("decimal(38,0)").as("l2"),
      countDistinct(col("t")).as("ktr"))
    val bCount = complete.groupBy(col("ck")).agg(count(lit(1)).as("nb"))
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"pageTrend: |$what| exceeds 2^53"))).otherwise(c).cast("double")
    val bD = col("nb").cast("double")
    val kD = col("ktr").cast("double")
    val lD = e(col("l2"), "the weighted rank sum") / lit(2.0)
    val eL = bD * kD * (kD + lit(1.0)) * (kD + lit(1.0)) / lit(4.0)
    val vL = bD * kD * kD * (kD + lit(1.0)) *
      (kD * kD - lit(1.0)) / lit(144.0)
    byK.join(bCount, col("k") === col("ck"))
      .select(col("k"), col("nb").as("n_blocks"),
        col("ktr").as("k_treatments"),
        lD.as("l_stat"),
        when(col("ktr") >= 2L && col("nb") >= 1L && vL > 0.0,
          (lD - eL) / sqrt(vL))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  /** MOOD'S MEDIAN TEST per key — the coarse-but-robust K-sample
    * location test (Mood 1950; [[kruskalWallis]]'s blunt sibling,
    * preferred under gross outliers or ordinal-with-few-levels data):
    * classify every value against the key's POOLED median, then the
    * χ² of the group × {above, ≤} contingency table.
    *
    * The pooled DOUBLED median (x_lo + x_hi — integral for integer
    * values) comes from the two-crossing geometry over per-key
    * distinct-value cells; classification 2v > med2 is exact integer;
    * the χ² folds ≤K pinned per-group terms through a window in group
    * order (tiny frame — bit-stable). Hash-exact. `value` must be a
    * non-null integer. Output per key: (k, n, n_groups, n_above,
    * chi2) — chi2 null when every value sits on one side of the
    * median (A or B empty).
    */
  def moodMedianTest(
      df: DataFrame,
      key: Column,
      group: Column,
      value: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"moodMedianTest: $name must be a non-null integer")))
        .otherwise(c.cast("long"))
    val base = df.select(key.as("k"), g(group, "group").as("g"),
      g(value, "value").as("v"))
    val cells = base.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("k")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"))
    val cum = cells
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val klo = floor((col("n") + 1L) / lit(2L)).cast("long")
    val khi = floor(col("n") / lit(2L)).cast("long") + lit(1L)
    val med = cum.groupBy(col("k")).agg(
      (min(when(col("cum") >= klo, col("v"))) +
        min(when(col("cum") >= khi, col("v")))).as("med2"))
      .select(col("k").as("mk"), col("med2"))
    val perGroup = base
      .join(med, col("k") === col("mk"))
      .groupBy(col("k"), col("g"))
      .agg(
        sum(when(lit(2L) * col("v") > col("med2"), 1L).otherwise(0L)).as("a"),
        sum(when(lit(2L) * col("v") > col("med2"), 0L).otherwise(1L)).as("b"))
    val wG = Window.partitionBy(col("k")).orderBy(col("g").asc)
    val wKAll = Window.partitionBy(col("k"))
    val withMargins = perGroup
      .withColumn("bigA", sum(col("a")).over(wKAll))
      .withColumn("bigB", sum(col("b")).over(wKAll))
      .withColumn("ng", col("a") + col("b"))
      .withColumn("nTot", sum(col("a") + col("b")).over(wKAll))
    val nD = col("nTot").cast("double")
    val ea = col("ng").cast("double") * col("bigA").cast("double") / nD
    val eb = col("ng").cast("double") * col("bigB").cast("double") / nD
    val term =
      (col("a").cast("double") - ea) * (col("a").cast("double") - ea) / ea +
        (col("b").cast("double") - eb) * (col("b").cast("double") - eb) / eb
    withMargins
      .withColumn("trun", sum(
        when(col("bigA") > 0L && col("bigB") > 0L, term).otherwise(lit(0.0)))
        .over(wG.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(wG))
      .withColumn("gcnt", count(lit(1)).over(wKAll))
      .filter(col("rn") === col("gcnt"))
      .select(col("k"), col("nTot").as("n"), col("gcnt").as("n_groups"),
        col("bigA").as("n_above"),
        when(col("bigA") > 0L && col("bigB") > 0L, col("trun"))
          .otherwise(lit(null).cast("double")).as("chi2"))
  }

  /** LORENZ CURVE at `buckets` population cut points — the curve
    * behind [[giniCoefficient]]: at each rank rᵢ = ⌈i·n/B⌉, the share
    * of total amount held by the poorest rᵢ units. NO global sort:
    * the B cut VALUES come from [[ExactQuantile.selectKth]]'s
    * bin-id-predicate refinement (bounded driver state), and the
    * cumulative mass at an exact rank is order-independent even under
    * ties — every tied unit carries the same amount, so
    * cum(rᵢ) = Σ_{v<cᵢ} v + (rᵢ − #{v<cᵢ})·cᵢ — one conditional-sum
    * pass over the data evaluates all B points at once. All integer/
    * decimal arithmetic; `cum_cents` travels as the exact decimal
    * STRING digest, and the share divisions are pinned doubles
    * (exact casts below 2⁵³ total cents; past that the digests stay
    * exact and shares are 1-ulp-comparable).
    *
    * `amountCents` must be non-null and ≥ 0. Output per cut:
    * (bucket, rank, cut_cents, cum_cents, cum_share, pop_share).
    */
  def lorenzCurve(
      df: DataFrame,
      amountCents: Column,
      buckets: Int = 8): DataFrame = {
    require(buckets >= 2 && buckets <= 4096,
      s"buckets must be in [2, 4096], got $buckets")
    val vL = amountCents.cast("long")
    val vG = when(vL.isNull || vL < 0L, raise_error(lit(
      "lorenzCurve: amountCents must be non-null and >= 0"))).otherwise(vL)
    val base = df.select(vG.as("v")).localCheckpoint()
    val n = base.count()
    require(n > 0, "lorenzCurve: no rows")
    val ranks = (1 to buckets).map(i =>
      i -> ((i.toLong * n + buckets - 1) / buckets))
    val (_, cutsByRank) =
      ExactQuantile.selectKth(base, col("v"), ranks.map(_._2).distinct)
    val cutOf = cutsByRank.toMap
    val d19 = "decimal(19,0)"
    val belowAggs = ranks.flatMap { case (i, r) =>
      val c = lit(cutOf(r).toLong)
      Seq(
        sum(when(col("v") < c, col("v").cast(d19))
          .otherwise(lit(0).cast(d19))).cast("decimal(38,0)").as(s"sb_$i"),
        sum(when(col("v") < c, 1L).otherwise(0L)).as(s"cb_$i"))
    }
    val tot = sum(col("v").cast(d19)).cast("decimal(38,0)").as("tot")
    val wide = base.agg(tot, belowAggs: _*)
    val points = ranks.map { case (i, r) =>
      val cut = cutOf(r).toLong
      val cum = (col(s"sb_$i") +
        (lit(r) - col(s"cb_$i")).cast(d19) * lit(cut).cast(d19))
        .cast("decimal(38,0)")
      struct(
        lit(i).as("bucket"),
        lit(r).as("rank"),
        lit(cut).as("cut_cents"),
        cum.cast("string").as("cum_cents"),
        when(col("tot") > 0,
          cum.cast("double") / col("tot").cast("double"))
          .otherwise(lit(null).cast("double")).as("cum_share"),
        (lit(r).cast("double") / lit(n.toDouble)).as("pop_share"))
    }
    val out = wide
      .select(explode(array(points: _*)).as("p"))
      .select(col("p.bucket"), col("p.rank"), col("p.cut_cents"),
        col("p.cum_cents"), col("p.cum_share"), col("p.pop_share"))
      // eager: materialize the tiny result before releasing base, so
      // the unpersist actually frees blocks instead of being deferred
      // past the caller's first action (the maseBacktest discipline)
      .localCheckpoint(true)
    base.unpersist()
    out
  }

  /** TRIMMED + WINSORIZED MEAN per group — the robust location pair
    * (Tukey): drop (trimmed) or clamp (winsorized) the lowest and
    * highest ⌊n·trim⌋ values before averaging, with trim =
    * trimNum/trimDen an exact rational. The outlier-hardened mean a
    * metrics platform reports next to the raw one.
    *
    * One rank window PARTITIONED by group (in-group sort, bounded by
    * the group, never a global frame), then pure aggregation: the
    * winsorized sum needs no clamped re-scan — it is the closed form
    * trimmed_sum + cut·v_(cut+1) + cut·v_(n−cut), with the boundary
    * order statistics read off the same ranked pass via conditional
    * min/max. Exact decimal sums, one pinned division each —
    * hash-exact. Values must be exact integers (cents/counts).
    *
    * Output per group: (group, n, cut, trimmed_mean, winsorized_mean)
    * — both null when the trim empties the group (n ≤ 2·cut... which
    * cannot happen for trim < 1/2; enforced).
    */
  /** QUANTILE NORMALIZATION across groups (the bioinformatics
    * standard, Bolstad et al. 2003, the pragmatic ragged variant):
    * every group's rank-r value is replaced by the MEAN of rank-r
    * values across all groups — forcing identical per-group
    * distributions while preserving in-group order. The batch-effect
    * remover for "the same metric measured by K different
    * pipelines". Ragged tails (ranks missing from shorter groups)
    * average over the groups that have the rank.
    *
    * Ties within a group break by `id` (row_number — a deterministic
    * total order is the replayability contract). One rank window
    * PARTITIONED by group + one aggregation keyed by rank + one join
    * back — exchanges on group/rank only, no global frame. Exact
    * integer sums, one pinned division per rank — hash-exact.
    *
    * Output: (group, id, value, rank, normalized).
    */
  def quantileNormalize(
      df: DataFrame,
      group: Column,
      id: Column,
      value: Column): DataFrame = {
    val vL = value.cast("long")
    val vG = when(vL.isNull, raise_error(lit(
      "quantileNormalize: value must be a non-null integer"))).otherwise(vL)
    val idG = when(id.isNull, raise_error(lit(
      "quantileNormalize: id must be non-null"))).otherwise(id)
    val ranked = df.select(group.as("group"), idG.as("id"), vG.as("value"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("group"))
          .orderBy(col("value").asc, col("id").asc)).cast("long"))
    val d19 = "decimal(19,0)"
    val twoP53 = 9007199254740992L
    val perRank = ranked.groupBy(col("rank")).agg(
      sum(col("value").cast(d19)).cast("decimal(38,0)").as("s"),
      count(lit(1)).as("ng"))
      .select(col("rank").as("nr"),
        (when(abs(col("s")) > lit(twoP53), raise_error(lit(
          "quantileNormalize: a rank's value sum exceeds 2^53 — rescale")))
          .otherwise(col("s")).cast("double")
          / col("ng").cast("double")).as("normalized"))
    ranked.join(perRank, col("rank") === col("nr"))
      .select(col("group"), col("id"), col("value"), col("rank"),
        col("normalized"))
  }

  def trimmedMean(
      df: DataFrame,
      group: Column,
      value: Column,
      trimNum: Long,
      trimDen: Long): DataFrame = {
    require(trimNum >= 0 && 2 * trimNum < trimDen,
      s"trim must satisfy 0 <= trimNum/trimDen < 1/2, got $trimNum/$trimDen")
    val vL = value.cast("long")
    val vG = when(vL.isNull, raise_error(lit(
      "trimmedMean: value must be a non-null integer"))).otherwise(vL)
    val wRank = Window.partitionBy(col("g")).orderBy(col("v").asc)
    val ranked = df.select(group.as("g"), vG.as("v"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
    val d19 = "decimal(19,0)"
    val st = ranked.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .select(col("g").as("cg"), col("n"),
        expr(s"(n * $trimNum) div $trimDen").as("cut"))
    val agg = ranked.join(st, col("g") === col("cg"))
      .groupBy(col("g")).agg(
        first(col("n")).as("n"),
        first(col("cut")).as("cut"),
        sum(when(col("rank") > col("cut") && col("rank") <= col("n") - col("cut"),
          col("v").cast(d19)).otherwise(lit(0).cast(d19)))
          .cast("decimal(38,0)").as("tsum"),
        // boundary order statistics off the same ranked pass: v is
        // rank-monotone, so min over ranks ≥ cut+1 IS v_(cut+1)
        min(when(col("rank") >= col("cut") + 1L, col("v"))).as("vlo"),
        max(when(col("rank") <= col("n") - col("cut"), col("v"))).as("vhi"))
    val kept = (col("n") - col("cut") * 2L).cast("double")
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"trimmedMean: |$what| exceeds 2^53 — rescale the value")))
        .otherwise(c).cast("double")
    // the winsorized numerator tsum + cut·(v_lo + v_hi) is computed
    // EXACTLY in decimal and guarded as a whole: a double-side
    // cut×boundary add could lose integer exactness (breaking the
    // hash-exact contract) even when tsum itself is under 2^53
    val wnum = (col("tsum") +
      col("cut").cast(d19) * (col("vlo").cast(d19) + col("vhi").cast(d19)))
      .cast("decimal(38,0)")
    agg.select(col("g").as("group"), col("n"), col("cut"),
      (e(col("tsum"), "the trimmed sum") / kept).as("trimmed_mean"),
      (e(wnum, "the winsorized numerator") / col("n").cast("double"))
        .as("winsorized_mean"))
  }
}

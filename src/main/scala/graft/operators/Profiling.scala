package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANALYZE-style corpus profiling: per-column row/null counts,
  * approximate distinct (HLL++), native-order min/max, and total
  * rendered length, for any set of columns, in ONE aggregation pass.
  *
  * The 100 TB story: every statistic here is partial-aggregable, so
  * the whole profile is a single map-side-combined scan — one job, one
  * 1-row shuffle — regardless of how many columns are profiled (the
  * naive per-column loop is N full scans). The 1-row aggregate then
  * unpivots to long format through `stack` in the SAME plan; nothing
  * recomputes per output row. min/max run on the NATIVE column type
  * before rendering to string ('10' < '9' lexicographically — casting
  * first would corrupt numeric extrema).
  */
object Profiling {

  /** One row per profiled column:
    * (column, n_rows, n_nonnull, n_distinct, min_value, max_value,
    * len_sum). `n_distinct` is HLL++ with `rsd` relative error; all
    * other fields are exact. `len_sum` totals the length of the
    * string rendering (a storage-footprint proxy that is also
    * engine-portable for oracle checks).
    */
  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.016): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    // names are interpolated into the stack() SQL below — restrict to
    // plain identifiers rather than risk a silently mangled expression
    val unsafe = cols.filterNot(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
    require(unsafe.isEmpty,
      s"profile: column name(s) not plain identifiers (alias them first): ${unsafe.mkString(", ")}")
    def c(name: String): Column = col(name)
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: cols.flatMap { n =>
      Seq(
        count(c(n)).as(s"__cnt_$n"),
        approx_count_distinct(c(n), rsd).as(s"__dist_$n"),
        min(c(n)).cast("string").as(s"__min_$n"),
        max(c(n)).cast("string").as(s"__max_$n"),
        coalesce(sum(length(c(n).cast("string"))), lit(0L)).as(s"__len_$n"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { n =>
      s"'$n', __cnt_$n, __dist_$n, __min_$n, __max_$n, __len_$n"
    }.mkString(", ")
    one.select(
      expr(s"stack(${cols.size}, $stackArgs) " +
        "as (column, n_nonnull, n_distinct, min_value, max_value, len_sum)"),
      col("__rows").as("n_rows"))
      .select(col("column"), col("n_rows"), col("n_nonnull"), col("n_distinct"),
        col("min_value"), col("max_value"), col("len_sum"))
  }

  /** Grouped PEARSON CORRELATION — r(x, y) per group from the six
    * sufficient statistics (n, Σx, Σy, Σxy, Σxx, Σyy), every sum
    * accumulated in EXACT decimal arithmetic (order-free,
    * partitioning-independent) with the closed form
    * `(n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))` in
    * pinned-order doubles. Degenerate groups (n < 2 or zero variance
    * on either side) emit null. Same cross-engine caveat as
    * [[zscoreOutliers]]: decimal→double casts double-round, so
    * oracles compare within 1e-9.
    *
    * Scale: ONE partial-aggregable pass; the group table is the only
    * thing that ever shuffles.
    */
  def groupedCorr(
      df: DataFrame,
      group: Column,
      x: Column,
      y: Column): DataFrame = {
    val base = df.select(group.as("grp"),
      x.cast("decimal(18,6)").as("x"), y.cast("decimal(18,6)").as("y"))
      .filter(col("grp").isNotNull && col("x").isNotNull && col("y").isNotNull)
    val stats = base.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    val nD = col("n").cast("double")
    val varx = nD * col("sxx") - col("sx") * col("sx")
    val vary = nD * col("syy") - col("sy") * col("sy")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    stats.select(
      col("grp").as("group"),
      col("n"),
      when(col("n") > 1 && varx > 0.0 && vary > 0.0,
        cov / (sqrt(varx) * sqrt(vary)))
        .otherwise(lit(null).cast("double")).as("corr"))
  }

  /** FULL CORRELATION MATRIX over d numeric columns in ONE scan —
    * [[groupedCorr]] generalized to every pair: all d sums, d
    * self-products and d(d−1)/2 cross-products accumulate as exact
    * decimal sufficient statistics in a single partial-aggregable
    * aggregation (the width is schema-bounded — d(d+3)/2 + 1
    * accumulators — never data-bounded; contrast d separate
    * `corr()` scans). Rows with a null in ANY column drop
    * (listwise deletion, so the matrix is consistent — every pair
    * sees the same n). The closed form per pair is [[groupedCorr]]'s
    * pinned-double expression; degenerate pairs (zero variance or
    * n ≤ 1) emit null. Output: one row per unordered pair (i < j in
    * the given column order): (col_a, col_b, n, corr).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, s"correlationMatrix needs >= 2 columns, got ${cols.size}")
    require(cols.map(_._1).distinct.size == cols.size,
      s"column names must be distinct, got ${cols.map(_._1)}")
    val names = cols.map(_._1)
    def cc(n: String) = col(s"__cm_$n")
    val base = df
      .select(cols.map { case (n, c) => c.cast("decimal(18,6)").as(s"__cm_$n") }: _*)
      .filter(names.map(n => cc(n).isNotNull).reduce(_ && _))
    val sums = names.map(n => sum(cc(n)).cast("double").as(s"s_$n"))
    val prods = for {
      i <- names.indices; j <- i until names.size
    } yield sum(cc(names(i)) * cc(names(j))).cast("double")
      .as(s"p_${names(i)}__${names(j)}")
    val aggs = (count(lit(1)).as("n") +: sums) ++ prods
    val st = base.agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    def p(i: Int, j: Int) = col(s"p_${names(math.min(i, j))}__${names(math.max(i, j))}")
    def s(i: Int) = col(s"s_${names(i)}")
    val pairRows = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield {
      val vA = nD * p(i, i) - s(i) * s(i)
      val vB = nD * p(j, j) - s(j) * s(j)
      val cov = nD * p(i, j) - s(i) * s(j)
      struct(
        lit(names(i)).as("col_a"), lit(names(j)).as("col_b"), col("n").as("n"),
        when(col("n") > 1 && vA > 0.0 && vB > 0.0, cov / (sqrt(vA) * sqrt(vB)))
          .otherwise(lit(null).cast("double")).as("corr"))
    }
    st.select(explode(array(pairRows: _*)).as("e"))
      .select(col("e.col_a"), col("e.col_b"), col("e.n"), col("e.corr"))
  }

  /** CHI-SQUARE test of independence between two categorical columns
    * (Pearson 1900) — the data-quality / drift question "did the
    * label distribution change across cohorts?" as one aggregation:
    * χ² = Σ_cells (obs − exp)²/exp with exp = rowTotal·colTotal/N.
    * Returns ONE row: (n, n_a, n_b, dof, chi2).
    *
    * Scale: observed counts are ONE partial-aggregable pass; row and
    * column totals re-aggregate the CELL table (≤ |A|·|B| rows, not
    * the corpus) and broadcast back; the χ² sum folds the cell table.
    * Counts and totals are exact integers — only the final per-cell
    * division and sum are doubles, so cross-engine oracles compare
    * within 1e-9 (float sum order over ≤ |A|·|B| same-magnitude
    * terms is far inside that). Cells with exp = 0 cannot exist
    * (a row/col total is 0 only when no cell in it exists).
    */
  def chiSquare(
      df: DataFrame,
      a: Column,
      b: Column): DataFrame = {
    val base = df.select(a.cast("string").as("a"), b.cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val cells = base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val colT = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    cells.join(broadcast(rowT), Seq("a")).join(broadcast(colT), Seq("b"))
      .agg(
        sum(col("o")).as("n"),
        countDistinct(col("a")).as("n_a"),
        countDistinct(col("b")).as("n_b"),
        // Pearson's computational form: χ² = n·(Σ o²/(rₐ·c_b) − 1).
        // It needs only CELL-LOCAL values plus the global n from this
        // same aggregate — no second pass to inject n into per-cell
        // expected counts — and it holds over OBSERVED cells alone
        // (an o = 0 cell contributes 0 to Σ o²/e while Σ_all o = n
        // and Σ_all e = n absorb into the −1 term).
        sum(col("o").cast("double") * col("o").cast("double")
          / (col("ra").cast("double") * col("cb").cast("double"))).as("q"))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        (col("n").cast("double") * (col("q") - lit(1.0))).as("chi2"))
  }

  /** POPULATION STABILITY INDEX — the standard distribution-drift
    * metric between a reference and a current slice of one categorical
    * column: PSI = Σ_cat (p_cur − p_ref)·ln(p_cur/p_ref), reported
    * per-category so the drifting categories are visible, not just the
    * headline number (industry folklore: total ≥ 0.2 = significant
    * drift). The monitoring companion to [[chiSquare]]: χ² asks "are
    * these independent", PSI asks "how far did the distribution move".
    *
    * A category present on one side only makes PSI infinite — that IS
    * drift, but an arbitrary smoothing constant would silently change
    * every other term, so this fails loudly and lets the caller choose
    * a floor (or pre-filter) explicitly.
    *
    * Scale: ONE partial-aggregable pass builds both distributions
    * (conditional counts per category); everything after runs on the
    * category table. Counts are exact; p's and ln() are doubles —
    * oracles compare within 1e-9.
    */
  def psi(
      df: DataFrame,
      category: Column,
      isCurrent: Column): DataFrame = {
    val base = df.select(category.cast("string").as("cat"),
      isCurrent.cast("boolean").as("cur"))
      .filter(col("cat").isNotNull && col("cur").isNotNull)
    val cells = base.groupBy(col("cat")).agg(
      sum(when(!col("cur"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("cur"), 1L).otherwise(0L)).as("n_cur"))
    val tot = cells.agg(sum(col("n_ref")), sum(col("n_cur"))).first()
    require(!tot.isNullAt(0) && tot.getLong(0) > 0 && tot.getLong(1) > 0,
      "psi: both the reference and the current slice must be non-empty")
    val (tr, tc) = (tot.getLong(0), tot.getLong(1))
    cells.select(
      col("cat").as("category"),
      col("n_ref"),
      col("n_cur"),
      when(col("n_ref") === 0 || col("n_cur") === 0, raise_error(concat(
        lit("psi: category '"), col("cat"),
        lit("' is present on only one side — PSI is infinite; choose an " +
          "explicit floor or pre-filter instead of a silent smoothing"))))
        .otherwise(
          (col("n_cur").cast("double") / lit(tc.toDouble)
            - col("n_ref").cast("double") / lit(tr.toDouble))
            * log((col("n_cur").cast("double") / lit(tc.toDouble))
              / (col("n_ref").cast("double") / lit(tr.toDouble))))
        .as("psi_term"))
  }

  /** Grouped ROBUST outlier detection via MEDIAN ABSOLUTE DEVIATION —
    * the Iglewicz-Hoaglin modified z-score `0.6745·(v − med)/MAD`
    * with the classic 3.5 cutoff: immune to the outliers themselves
    * inflating the yardstick, which is exactly how [[zscoreOutliers]]'
    * mean/σ can be fooled (one huge spike widens σ until its
    * accomplices pass).
    *
    * `approxAccuracy = None` (default) uses EXACT percentiles —
    * sort-based aggregation whose buffer holds each group's values,
    * the right tool while groups fit an executor. At 100 TB group
    * sizes, pass `Some(accuracy)` to switch both medians to
    * `percentile_approx` (constant-memory t-digest, the q45 sketch
    * class) — same plan shape, bounded state, approximate cutoff.
    *
    * Two grouped passes by construction (the deviation median needs
    * the median first); both medians broadcast back so scoring is
    * map-side. Groups with MAD = 0 (over half the values at the
    * median) flag nothing. Interpolated medians are libm-free but not
    * cross-engine bit-stable — oracles use the ±ε membership band of
    * [[zscoreOutliers]].
    */
  def madOutliers(
      df: DataFrame,
      group: Column,
      id: Column,
      value: Column,
      threshold: Double = 3.5,
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    approxAccuracy.foreach(a => require(a >= 10, s"approxAccuracy must be >= 10, got $a"))
    def med(c: Column): Column = approxAccuracy match {
      case None => percentile(c, lit(0.5))
      case Some(a) => percentile_approx(c, lit(0.5), lit(a))
    }
    val base = df.select(group.as("grp"), id.as("id"), value.cast("double").as("v"))
      .filter(col("grp").isNotNull && col("v").isNotNull && !isnan(col("v")))
    val medians = base.groupBy(col("grp")).agg(med(col("v")).as("med"))
    val dev = base.join(broadcast(medians), Seq("grp"))
      .withColumn("ad", abs(col("v") - col("med")))
    val mads = dev.groupBy(col("grp")).agg(med(col("ad")).as("mad"))
    dev.join(broadcast(mads), Seq("grp"))
      .filter(col("mad") > 0.0)
      .select(col("grp").as("group"), col("id"), col("v").as("value"),
        (lit(0.6745) * (col("v") - col("med")) / col("mad")).as("rz"))
      .filter(abs(col("rz")) > lit(threshold))
  }

  /** Grouped Z-SCORE outlier detection — flag rows whose value sits
    * more than `threshold` population standard deviations from its
    * group's mean. The data-quality sentinel every ingest pipeline
    * runs (and, for training corpora, the metric-anomaly pre-filter).
    *
    * The statistics pass accumulates (n, Σv, Σv²) in EXACT decimal
    * arithmetic — order-free, partitioning-independent — and
    * μ = Σv/n, σ = sqrt(Σv²/n − μ²) then run in pinned-order double
    * ops. The scores are deterministic per engine, but NOT bit-equal
    * across engines: converting a high-scale decimal (Σv² carries
    * scale 12) to double is double-rounded (int → double, then ×10⁻ˢ)
    * in both Spark and DuckDB with implementations that can disagree
    * by one ulp — so cross-engine oracles compare z within a
    * tolerance and treat threshold membership with a ±ε margin.
    * Groups with σ = 0 or a single row flag nothing.
    *
    * Scale: one partial-aggregable stats pass (rows collapse map-side
    * to one triple per group); the per-group stats broadcast back and
    * scoring is map-side on the second scan — no window, no per-group
    * sort, and the corpus never shuffles.
    */
  def zscoreOutliers(
      df: DataFrame,
      group: Column,
      id: Column,
      value: Column,
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    val base = df.select(group.as("grp"), id.as("id"), value.cast("double").as("v"))
      .filter(col("grp").isNotNull && col("v").isNotNull && !isnan(col("v")))
    val stats = base
      .select(col("grp"), col("v").cast("decimal(18,6)").as("vd"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("vd")).cast("double").as("sv"),
        sum(col("vd") * col("vd")).cast("double").as("svv"))
      .select(col("grp"), col("n"),
        (col("sv") / col("n").cast("double")).as("mu"),
        sqrt(col("svv") / col("n").cast("double")
          - (col("sv") / col("n").cast("double"))
            * (col("sv") / col("n").cast("double"))).as("sigma"))
    base.join(broadcast(stats), Seq("grp"))
      .filter(col("n") > 1 && col("sigma") > 0.0)
      .select(col("grp").as("group"), col("id"), col("v").as("value"),
        ((col("v") - col("mu")) / col("sigma")).as("z"))
      .filter(abs(col("z")) > lit(threshold))
  }

  /** Benford's-law first-digit audit (forensic accounting's
    * fabricated-amounts test): the observed share of each leading
    * digit 1–9 of a FIXED-POINT amount column vs the Benford
    * expectation log10(1+1/d).
    *
    * Portability: the leading digit comes from the decimal STRING of
    * `round(value·10^scale)` — one correctly-rounded multiply and a
    * half-integer-free round, so every engine extracts the identical
    * digit (a log10-based extraction would hinge on libm accuracy at
    * power-of-ten boundaries); the expectations are literal constants,
    * not computed logs, for the same reason. Non-positive and null
    * amounts drop (Benford is defined on positive magnitudes), and so
    * do amounts at or above 10^(38−scale), whose fixed-point form
    * overflows decimal(38,0) to NULL — far beyond the ~2^53 range
    * where a double can even carry exact cents. ONE map-side-combined
    * 9-group aggregation — scan-bound at any scale.
    */
  def benfordFirstDigit(df: DataFrame, value: Column, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"scale must be in [0,6], got $scale")
    val v = value.cast("double")
    val base = df.filter(v.isNotNull && !isnan(v) && v > 0.0)
      .select(substring(
        round(v * math.pow(10, scale).toLong).cast("decimal(38,0)").cast("string"),
        1, 1).as("digit"))
      // an amount below half the fixed-point resolution rounds to 0 —
      // no leading digit at this scale
      .filter(col("digit") =!= "0")
    val counts = base.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    // log10(1+1/d), d=1..9 — literals, bit-identical in any engine
    val benford = Seq(
      "1" -> 0.3010299956639812, "2" -> 0.17609125905568124,
      "3" -> 0.12493873660829993, "4" -> 0.09691001300805642,
      "5" -> 0.07918124604762482, "6" -> 0.06694678963061322,
      "7" -> 0.05799194697768673, "8" -> 0.05115252244738129,
      "9" -> 0.04575749056067514)
    val expected = benford.tail.foldLeft(
      when(col("digit") === benford.head._1, lit(benford.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    counts
      .withColumn("expected_share", expected)
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("__t").cast("double")).as("share"),
        col("expected_share"),
        ((col("n").cast("double") / col("__t").cast("double")) - col("expected_share"))
          .as("deviation"))
  }

  /** Per-group Gini coefficient of a non-negative amount — the
    * inequality/concentration statistic (0 = perfectly even, →1 =
    * winner-takes-all) — via the rank formula on the ascending sort:
    *
    *   G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n
    *
    * Σᵢ i·x₍ᵢ₎ is invariant to permutations within tied values, so the
    * (value, id) rank tie-break only serves determinism of the plan,
    * never the result. Both sums accumulate EXACTLY in decimal (rank
    * cast to DECIMAL(19,0) forces int128 storage in engines that
    * would overflow int64 products) and the final expression is a
    * pinned-order double solve — the [[Regression.groupedOls2]]
    * portability contract. Negative amounts fail loudly (Gini is
    * undefined there; silently clamping would fabricate a statistic);
    * groups with Σx = 0 emit NULL.
    *
    * Scale: one shuffle on the group key; the per-group window is
    * bounded by group size, and the rank-weighted sums are the only
    * state — no pair expansion, no global sort.
    */
  def gini(df: DataFrame, group: Column, id: Column, value: Column): DataFrame = {
    val v = value.cast("double")
    val base = df
      .filter(group.isNotNull && v.isNotNull && !isnan(v))
      .select(group.as("grp"), id.as("id"),
        when(v < 0.0, raise_error(lit(
          "gini: negative amount — Gini is undefined on negative values")))
          .otherwise(v).cast("decimal(18,4)").as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("x"), col("id"))
    base
      .withColumn("i", row_number().over(w).cast("decimal(19,0)"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("i") * col("x")).cast("double").as("swx"))
      .select(col("grp").as("group"), col("n"),
        when(col("sx") > 0.0,
          lit(2.0) * col("swx") / (col("n").cast("double") * col("sx"))
            - (col("n").cast("double") + lit(1.0)) / col("n").cast("double"))
          .as("gini"))
  }

  /** Functional-dependency audit (the Metanome-style profiling
    * primitive): does `lhs → rhs` hold, and how badly is it violated?
    * One row: (fd, n_lhs, n_violating, max_rhs_per_lhs) — the number
    * of distinct LHS values, how many of them map to MORE than one
    * distinct RHS (each a violation of the dependency), and the worst
    * fan-out. Exact integers end to end.
    *
    * Scale: one exact-distinct aggregation keyed by lhs (map-side
    * combined) followed by a scalar rollup — no windows, no pair
    * expansion (the naive FD check joins the table to itself on lhs;
    * this never does). Null LHS rows are excluded (a dependency says
    * nothing about an absent determinant); null RHS counts as zero
    * distinct values for its lhs (count-distinct semantics), so an
    * all-null RHS group is NOT a violation.
    */
  def functionalDependency(
      df: DataFrame, name: String, lhs: Column, rhs: Column): DataFrame =
    df.filter(lhs.isNotNull)
      .groupBy(lhs.as("__l"))
      .agg(countDistinct(rhs).as("__d"))
      .agg(
        count(lit(1)).as("n_lhs"),
        sum(when(col("__d") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("__d")).as("max_rhs_per_lhs"))
      .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
        col("max_rhs_per_lhs"))

  /** Seasonality-adjusted volume anomalies: per (group, day) event
    * counts scored against a LEAVE-ONE-OUT day-of-week baseline — the
    * mean count over the same weekday's OTHER days. Leave-one-out
    * matters: a 5× spike must not inflate its own baseline. Days are
    * epoch-day integers (`floor(epoch/86400)`), weekday = day mod 7 —
    * calendar-library-free, so every engine buckets identically.
    *
    * Exactness: the baseline is one division of exact integers
    * ((sum − n)/(cnt − 1) — correctly rounded identically in any
    * IEEE engine) and the anomaly flags are PURE INTEGER comparisons
    * (n > 1.5·baseline ⇔ 2(cnt−1)n > 3(sum−n)), so the output
    * hash-matches with no tolerance. Days whose weekday has no other
    * observation carry a NULL baseline and false flags (nothing to
    * compare against — explicit, not silently dropped).
    *
    * Scale: one daily count aggregation, one tiny (group, weekday)
    * rollup broadcast back — the two-phase geometry; no windows.
    */
  def seasonalAnomaly(
      df: DataFrame, group: Column, ts: Column): DataFrame = {
    val day = floor(unix_timestamp(ts).cast("double") / 86400.0).cast("long")
    val daily = df
      .filter(group.isNotNull && ts.isNotNull)
      .select(group.as("grp"), day.as("day"))
      .groupBy(col("grp"), col("day")).agg(count(lit(1)).as("n"))
      .withColumn("dow", pmod(col("day"), lit(7L)))
    val dowStats = daily.groupBy(col("grp"), col("dow"))
      .agg(sum(col("n")).as("__s"), count(lit(1)).as("__c"))
    val rest = col("__s") - col("n")         // other same-weekday days' total
    val restN = col("__c") - lit(1L)         // their count
    daily
      .join(broadcast(dowStats), Seq("grp", "dow"))
      .select(
        col("grp").as("group"), col("day"), col("dow"), col("n"),
        when(restN > 0, rest.cast("double") / restN.cast("double")).as("baseline"),
        (restN > 0 && lit(2L) * restN * col("n") > lit(3L) * rest).as("is_high"),
        (restN > 0 && lit(2L) * restN * col("n") < rest).as("is_low"))
  }

  /** Order-invariant DATASET DIGEST — one row fingerprinting a
    * table's CONTENT for reproducibility audits and cross-environment
    * parity checks (did the rewrite/migration/repartition change any
    * row?): per row, the portable md5-based [[KmvSketch.hash60]] of
    * the canonical `|`-joined column rendering; the digest is the
    * EXACT decimal sum of those hashes plus count and min/max hash.
    * Addition is commutative, so the digest is independent of row
    * order, partitioning, and merge order — mergeable across shards
    * by construction — while any single changed row moves it.
    * decimal(38,0) holds ~10^19 rows of 2^60-bounded hashes without
    * overflow. Null columns render as an explicit `\N` sentinel
    * (distinct from the string "null" and from empty). Known caveat
    * (pinned by its spec): the canonical rendering is NOT injective —
    * a cell whose literal string value is `\N` renders identically to
    * a null cell (and `|` inside a value is indistinguishable from
    * the column separator), so editing a null cell to the literal
    * string `\N` does not move the digest. Acceptable for its purpose
    * (migration/repartition parity, where values don't mutate into
    * sentinel lookalikes); a byte-exact audit would escape `\` and
    * `|` in the rendering at ~2× string-build cost.
    *
    * ONE map-side-combined scalar aggregation — scan-bound at any
    * scale.
    */
  def datasetDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "datasetDigest: no columns")
    val canon = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("\\N"))): _*)
    val h = KmvSketch.hash60(canon)
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(h.cast("decimal(38,0)")).cast("string").as("digest"),
      min(h).as("min_hash"),
      max(h).as("max_hash"))
  }

  /** Per-column PROFILING SUMMARY — the data-catalog table: for each
    * requested column, its null count, EXACT distinct count, and
    * TYPED min/max (rendered as strings at the end so one output
    * schema fits every column type — comparison happens in the
    * column's own type, never lexicographically).
    *
    * ONE scan of the base table regardless of column count: all
    * profiles run as a single wide aggregation whose N exact
    * `countDistinct`s Catalyst rewrites (RewriteDistinctAggregates)
    * into an Expand — the internal unpivot: each input row fans out
    * to one slim (grouping-id, value) row per profiled column, is
    * partially aggregated map-side, and shuffles once. The 1-row wide
    * result is then reshaped driver-cheap (explode over an N-element
    * array literal) into the per-column catalog rows. Profiling a
    * 50-column 100 TB table is one scan + one shuffle of
    * partially-collapsed distinct groups — not 50 scans.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: no columns")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$i"),
          countDistinct(col(c)).as(s"_distinct_$i"),
          min(col(c)).cast("string").as(s"_min_$i"),
          max(col(c)).cast("string").as(s"_max_$i"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val packed = array(cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column"),
        col(s"_null_$i").as("n_null"),
        col(s"_distinct_$i").as("n_distinct"),
        col(s"_min_$i").as("min_value"),
        col(s"_max_$i").as("max_value"))
    }: _*)
    wide.select(col("n_rows"), explode(packed).as("p"))
      .select(col("p.column").as("column"), col("n_rows"),
        col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"),
        col("p.min_value").as("min_value"), col("p.max_value").as("max_value"))
  }

  /** Model-calibration RELIABILITY DIAGRAM (the per-bin view behind
    * expected calibration error): bucket predictions by probability,
    * compare each bucket's mean predicted probability to its observed
    * positive rate. `calibration_gap` > 0 means over-confident.
    *
    * Exactness: n and positives are exact integers and the observed
    * rate is one exact integer division; mean_prob sums the
    * probabilities in DECIMAL(27,12) (exact given the scale-12
    * rounding of each input, which both engines perform identically
    * on in-range doubles) and pays ONE decimal→double cast — the
    * q114 one-ulp hazard — so oracles compare mean_prob and the gap
    * within 1e-9 and hash-match everything else. Probabilities
    * outside [0, 1] fail loudly (a mis-scaled score silently
    * saturating into bin 0/last is exactly how calibration audits
    * lie); null labels fail loudly through a payload guard.
    */
  def reliabilityBins(
      df: DataFrame, prob: Column, label: Column, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2, 100], got $bins")
    val p0 = prob.cast("double")
    val p = when(p0.isNull || isnan(p0) || p0 < 0.0 || p0 > 1.0,
      raise_error(lit("reliabilityBins: probability outside [0, 1]")))
      .otherwise(p0)
    val bin = least(lit(bins - 1).cast("long"),
      floor(p * lit(bins)).cast("long"))
    df.select(
        bin.as("bin"), p.cast("decimal(27,12)").as("__p"),
        when(label.isNull, raise_error(lit("reliabilityBins: null label")))
          .otherwise(label).cast("boolean").as("__y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("positives"),
        sum(col("__p")).as("__sp"))
      .select(
        col("bin"), col("n"), col("positives"),
        (col("__sp").cast("double") / col("n").cast("double")).as("mean_prob"),
        (col("positives").cast("double") / col("n").cast("double")).as("rate"),
        ((col("__sp").cast("double") / col("n").cast("double")) -
          (col("positives").cast("double") / col("n").cast("double")))
          .as("calibration_gap"))
  }

  /** CRONBACH'S ALPHA — internal-consistency reliability of a
    * K-item scale (Cronbach 1951): α = K/(K−1)·(1 − Σᵢvarᵢ/var_total)
    * with var_total the variance of the per-subject item sum. The
    * psychometrics staple, and the data-quality question "do these K
    * redundant measurements actually measure one thing?".
    *
    * Exactness: items must be exact integers; with population
    * variances sharing the n² denominator the ratio collapses to
    * Σᵢ(n·Σxᵢ² − (Σxᵢ)²) / (n·ΣT² − (ΣT)²) — BOTH sides exact
    * decimal(38,0) from one aggregation pass, one pinned division,
    * one pinned α chain — hash-exact. Output: one row
    * (n, k_items, var_num, var_den, alpha) with the exact decimal
    * numerator/denominator; alpha null when the scale variance is 0.
    */
  def cronbachAlpha(
      df: DataFrame,
      items: Seq[(String, Column)]): DataFrame = {
    require(items.size >= 2, s"cronbachAlpha needs >= 2 items, got ${items.size}")
    val k = items.size
    def g(c: Column, what: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"cronbachAlpha: item $what must be a non-null integer")))
        .otherwise(c.cast("long"))
    val base = df.select(
      items.map { case (n, c) => g(c, n).as(s"__it_$n") } :+
        items.map { case (n, c) => g(c, n) }.reduce(_ + _).as("__tot"): _*)
    // decimal(19,0) sums: the (Σx)² products must stay within the
    // 38-digit cross-engine ceiling (DuckDB errors past it), so the
    // item sums are bounded at |Σx| < 10¹⁹ by contract
    val d19s = "decimal(19,0)"
    // the aggregated sum is decimal(29,0); guard loudly before the
    // narrowing cast — a silent NULL here would yield a silent null
    // alpha instead of the raise used by every other width guard
    val tenP19 = lit(BigDecimal("1" + "0" * 19)).cast("decimal(29,0)")
    def s28(c: Column) = {
      val wide = sum(c.cast(d19s))
      when(abs(wide) >= tenP19, raise_error(lit(
        "cronbachAlpha: |sum| >= 10^19 — the squared-sum product would " +
          "exceed the 38-digit cross-engine ceiling; rescale the items")))
        .otherwise(wide).cast(d19s)
    }
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      (items.flatMap { case (nm, _) =>
        Seq(s28(col(s"__it_$nm")).as(s"sx_$nm"),
          s28(col(s"__it_$nm") * col(s"__it_$nm")).as(s"sxx_$nm"))
      } ++ Seq(s28(col("__tot")).as("st"),
        s28(col("__tot") * col("__tot")).as("stt")))
    val one = base.agg(aggs.head, aggs.tail: _*)
    val nDec = col("n").cast("decimal(10,0)")
    def varNum(sx: Column, sxx: Column): Column =
      (nDec * sxx - sx * sx).cast("decimal(38,0)")
    val num = items.map { case (nm, _) =>
      varNum(col(s"sx_$nm"), col(s"sxx_$nm"))
    }.reduce(_ + _).cast("decimal(38,0)")
    val den = varNum(col("st"), col("stt"))
    val ratio = num.cast("double") / den.cast("double")
    one.select(
      col("n"), lit(k.toLong).as("k_items"),
      num.as("var_num"), den.as("var_den"),
      when(den > 0,
        lit(k.toDouble) * (lit(1.0) - ratio) / lit((k - 1).toDouble))
        .as("alpha"))
  }

  /** HERFINDAHL–HIRSCHMAN INDEX per group — market/portfolio
    * concentration: HHI = Σᵢ(wᵢ/W)², 1/n for perfect balance, 1.0
    * for a monopoly; (1 − HHI) is Simpson diversity. With integer
    * weights the shares collapse to Σwᵢ² / W² — two exact
    * decimal(38,0) aggregates, one pinned division — hash-exact.
    * One partial-aggregable pass to (group, entity) weights, one to
    * group statistics. Negative weights raise. Output per group:
    * (k, n_entities, hhi) — null when the group's total weight is 0.
    */
  def herfindahl(
      df: DataFrame,
      group: Column,
      entity: Column,
      weight: Column): DataFrame = {
    val wG = when(weight.cast("long").isNull || weight.cast("long") < 0L,
      raise_error(lit("herfindahl: weight must be a non-negative long")))
      .otherwise(weight.cast("long"))
    val per = df.select(group.as("k"), entity.as("e"), wG.as("w"))
      .filter(col("k").isNotNull && col("e").isNotNull)
      .groupBy(col("k"), col("e")).agg(sum(col("w")).as("w"))
    val d19 = "decimal(19,0)"
    per.groupBy(col("k")).agg(
      count(lit(1)).as("n_entities"),
      sum(col("w").cast(d19)).cast("decimal(38,0)").as("sw"),
      sum(col("w").cast(d19) * col("w").cast(d19))
        .cast("decimal(38,0)").as("sw2"))
      .select(col("k"), col("n_entities"),
        when(col("sw") > 0,
          col("sw2").cast("double")
            / (col("sw").cast("double") * col("sw").cast("double")))
          .as("hhi"))
  }

  /** GINI-IMPURITY FEATURE SCREEN — decision-stump feature ranking
    * against a binary target (the feature-selection pass before any
    * model ships; the Gini sibling of information gain WITHOUT the
    * non-portable ln): per categorical feature, the value-weighted
    * impurity Σ_v (n_v/N)·(1 − p_v² − q_v²) and the gain vs the root
    * impurity 2·P(N−P)/N².
    *
    * Determinism without a float-sum hazard: each value term reduces
    * to (n_v² − pos_v² − neg_v²)/(N·n_v) — a pinned double from
    * exact integers — and the per-feature total is a WINDOW running
    * sum in value order (cross-engine bit-stable, never a groupBy
    * float sum), so the ranking hash-matches. Value cardinality is
    * bounded by the features offered (categorical by contract; the
    * window runs per feature over its distinct values).
    *
    * Output per feature: (feature, n_values, gini_weighted,
    * gini_gain), gain ≥ 0 up to rounding. Null targets raise; null
    * feature values form their own category (missingness is signal).
    */
  def giniFeatureGain(
      df: DataFrame,
      target: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "giniFeatureGain: need at least one feature")
    val yG = when(target.cast("boolean").isNull, raise_error(lit(
      "giniFeatureGain: target must be a non-null boolean")))
      .otherwise(target.cast("boolean"))
    val melted = features.map { case (name, c) =>
      df.select(lit(name).as("feature"),
        coalesce(c.cast("string"), lit("__null__")).as("value"),
        yG.as("y"))
    }.reduce(_.unionByName(_))
    val cells = melted.groupBy(col("feature"), col("value"))
      .agg(count(lit(1)).as("nv"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pv"))
    val root = df.select(yG.as("y")).agg(
      count(lit(1)).as("nn"),
      sum(when(col("y"), 1L).otherwise(0L)).as("pp"))
    val nD = col("nn").cast("double")
    val pD = col("pp").cast("double")
    val nvD = col("nv").cast("double")
    val pvD = col("pv").cast("double")
    val qvD = (col("nv") - col("pv")).cast("double")
    val term = (nvD * nvD - pvD * pvD - qvD * qvD) / (nD * nvD)
    val wCum = Window.partitionBy(col("feature")).orderBy(col("value").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy(col("feature"))
      .orderBy(col("value").desc)
    cells.crossJoin(broadcast(root))
      .withColumn("gw", sum(term).over(wCum))
      .withColumn("nvals", count(lit(1)).over(
        Window.partitionBy(col("feature"))))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select(col("feature"),
        col("nvals").as("n_values"),
        col("gw").as("gini_weighted"),
        (lit(2.0) * pD * (nD - pD) / (nD * nD) - col("gw")).as("gini_gain"))
  }

  /** POWER-LAW TAIL EXPONENT — the continuous MLE of Clauset, Shalizi
    * & Newman 2009: α = 1 + n / Σ ln(xᵢ/xmin) over the tail
    * xᵢ ≥ xmin. The heavy-tail health check of every degree / token-
    * frequency / popularity distribution (α ≈ 2–3 is Zipf-like; a
    * drifting α flags corpus skew before it breaks partitioning).
    *
    * Scale + determinism: rows first collapse to DISTINCT INTEGER
    * value cells (one partial-aggregable pass — the data never sorts
    * globally); the ln terms then fold through an ORDERED running
    * window over the cells in value order, coalesced to one partition
    * — bounded because the cells of an integer distribution number at
    * most max(x), and guarded by `maxCells` (raises loudly beyond,
    * rather than silently melting a reducer). The single-partition
    * fold pins the double-sum order so an oracle can replay it
    * term-for-term; ln itself is libm-dependent, so gate at 1e-9
    * rather than hash-matching. Output one row: (n_tail, x_min,
    * ln_sum, alpha) — alpha null when every tail value equals xmin.
    *
    * Contract: x must be a non-null positive integer; xmin ≥ 1.
    */
  def powerLawAlpha(
      df: DataFrame,
      x: Column,
      xmin: Long,
      maxCells: Int = 1000000): DataFrame = {
    require(xmin >= 1L, s"powerLawAlpha: xmin must be >= 1, got $xmin")
    val xL = x.cast("long")
    val xG = when(xL.isNull || xL <= 0L, raise_error(lit(
      "powerLawAlpha: x must be non-null and positive"))).otherwise(xL)
    val cells = df.select(xG.as("x")).filter(col("x") >= xmin)
      .groupBy(col("x")).agg(count(lit(1)).as("c"))
      .coalesce(1)
    val wCum = Window.orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val capGuard = when(
      count(lit(1)).over(Window.partitionBy(lit(1))) > maxCells.toLong,
      raise_error(lit(s"powerLawAlpha: more than $maxCells distinct " +
        "value cells — not an integer-like distribution")))
    val folded = cells
      .withColumn("lns", sum(
        when(capGuard.isNull,
          col("c").cast("double") *
            log(col("x").cast("double") / lit(xmin.toDouble))))
        .over(wCum))
      .withColumn("cum_n", sum(col("c")).over(wCum))
    folded.agg(
      max(struct(col("x"), col("lns"), col("cum_n"))).as("fin"))
      .select(
        col("fin.cum_n").as("n_tail"),
        lit(xmin).as("x_min"),
        col("fin.lns").as("ln_sum"),
        when(col("fin.lns") > 0.0,
          lit(1.0) + col("fin.cum_n").cast("double") / col("fin.lns"))
          .otherwise(lit(null).cast("double")).as("alpha"))
  }

  /** CATEGORICAL ASSOCIATION between two columns — the dependence
    * screen of every feature audit: Pearson χ² over the FULL r×c
    * contingency grid (zero cells contribute their expectation),
    * Cramér's V = √(χ²/(n·min(r−1, c−1))), and mutual information
    * I(A;B) = Σ (cᵢⱼ/n)·ln(n·cᵢⱼ/(rᵢ·cⱼ)) in nats over the occupied
    * cells.
    *
    * Scale + determinism: rows collapse once to contingency cells
    * (partial-aggregable — the data never shuffles by row); margins
    * and the full grid live on the r×c cell table, which the
    * `maxCells` guard keeps bounded (raises loudly on a
    * non-categorical column). The per-cell double terms then fold in
    * ONE pinned (a, b) order on a single partition, so an oracle can
    * replay the sum term-for-term; ln is libm-dependent — gate at
    * 1e-9. Output one row: (n, n_rows, n_cols, chi2, cramers_v, mi)
    * — cramers_v null when min(r−1, c−1) = 0.
    *
    * Contract: nulls in either column raise (filter first — a null
    * category is a modeling decision, not a default).
    */
  def categoricalAssociation(
      df: DataFrame,
      a: Column,
      b: Column,
      maxCells: Int = 100000): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.isNull, raise_error(lit(
        s"categoricalAssociation: $name must be non-null")))
        .otherwise(c.cast("string"))
    // margins + grid below read the cell table thrice; bounded: it is
    // the contingency aggregate (≤ maxCells, guarded loudly) — tagged
    // so the PlanGuard bounded-frame proof survives the lineage cut
    val cells = PartitionedCheckpoint.boundedCheckpoint(
      df.select(g(a, "a").as("ai"), g(b, "b").as("bi"))
        .groupBy(col("ai"), col("bi")).agg(count(lit(1)).as("c")))
    val rowTot = cells.groupBy(col("ai")).agg(sum(col("c")).as("ri"))
    val colTot = cells.groupBy(col("bi")).agg(sum(col("c")).as("cj"))
    // full grid incl. zero cells: bounded r×c, broadcast-sized by the
    // maxCells guard below
    val grid = rowTot.crossJoin(colTot)
      .join(cells, Seq("ai", "bi"), "left")
      .withColumn("cij", coalesce(col("c"), lit(0L)))
      .coalesce(1)
    val wAll = Window.partitionBy(lit(1))
    val capGuard = when(count(lit(1)).over(wAll) > maxCells.toLong,
      raise_error(lit(s"categoricalAssociation: more than $maxCells " +
        "grid cells — not categorical columns")))
    val nD = sum(col("cij")).over(wAll).cast("double")
    val eij = col("ri").cast("double") * col("cj").cast("double") / nD
    val chiTerm = (col("cij").cast("double") - eij) *
      (col("cij").cast("double") - eij) / eij
    val miTerm = when(col("cij") > 0L,
      (col("cij").cast("double") / nD)
        * log(nD * col("cij").cast("double")
          / (col("ri").cast("double") * col("cj").cast("double"))))
      .otherwise(lit(0.0))
    val wCum = Window.orderBy(col("ai").asc, col("bi").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = grid
      .withColumn("chi_cum",
        sum(when(capGuard.isNull, chiTerm)).over(wCum))
      .withColumn("mi_cum", sum(miTerm).over(wCum))
    folded.agg(
      max(struct(col("ai"), col("bi"), col("chi_cum"), col("mi_cum")))
        .as("fin"),
      count_distinct(col("ai")).as("n_rows"),
      count_distinct(col("bi")).as("n_cols"),
      sum(col("cij")).as("n"))
      .select(
        col("n"), col("n_rows"), col("n_cols"),
        col("fin.chi_cum").as("chi2"),
        when(least(col("n_rows"), col("n_cols")) >= 2L,
          sqrt(col("fin.chi_cum") / (col("n").cast("double")
            * least(col("n_rows") - 1L, col("n_cols") - 1L).cast("double"))))
          .otherwise(lit(null).cast("double")).as("cramers_v"),
        col("fin.mi_cum").as("mi"))
  }

  /** RFM SEGMENTATION — the classic recency/frequency/monetary
    * customer grid: each dimension gets a 1–5 score from EXACT global
    * quintile cuts ([[ExactQuantile.selectKth]]'s bin-id-predicate
    * selection — no global sort, bounded driver state), and the
    * output is the per-segment census. Scores are rank-position
    * buckets: s = 1 + #{cuts < v} for "higher is better" dimensions
    * (frequency, monetary) and 6 − that for recency (fewer days since
    * last activity is better), so ties at a cut boundary land
    * deterministically in the lower bucket in both engines.
    *
    * All integer arithmetic (inputs must be non-null integers ≥ 0);
    * the monetary sum travels as an exact decimal STRING digest.
    * Output per non-empty segment: (r_score, f_score, m_score,
    * n_customers, sum_monetary).
    */
  def rfmSegments(
      df: DataFrame,
      recencyDays: Column,
      frequency: Column,
      monetaryCents: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull || c.cast("long") < 0L, raise_error(lit(
        s"rfmSegments: $name must be a non-null integer >= 0")))
        .otherwise(c.cast("long"))
    val base = df.select(g(recencyDays, "recencyDays").as("r"),
      g(frequency, "frequency").as("f"), g(monetaryCents, "monetary").as("m"))
      .localCheckpoint()
    val n = base.count()
    require(n > 0, "rfmSegments: no rows")
    val ranks = (1 to 4).map(i => (i.toLong * n + 4) / 5)
    def cuts(c: String): Seq[Long] =
      ExactQuantile.selectKth(base, col(c), ranks)._2.map(_._2.toLong)
    def score(c: String, cs: Seq[Long]): Column =
      cs.map(cut => when(lit(cut) < col(c), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
    val (rc, fc, mc) = (cuts("r"), cuts("f"), cuts("m"))
    val out = base
      .withColumn("r_score", lit(6) - score("r", rc))
      .withColumn("f_score", score("f", fc))
      .withColumn("m_score", score("m", mc))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m").cast("decimal(19,0)")).cast("decimal(38,0)")
          .cast("string").as("sum_monetary"))
      // eager: materialize the ≤5³-cell result before releasing base
      // (the maseBacktest discipline — unpersist before the caller's
      // first action would otherwise recompute or leak the blocks)
      .localCheckpoint(true)
    base.unpersist()
    out
  }

  /** BEST NUMERIC SPLIT per feature — one-level decision-stump
    * training against a binary target, the threshold sibling of
    * [[giniFeatureGain]]'s categorical screen: for every candidate
    * threshold v (send x ≤ v left), the weighted Gini impurity
    *
    *   [n_L·(1 − (p_L² + q_L²)/n_L²) + n_R·(…)]/N
    *
    * from cumulative cell counts, and the argmin per feature
    * (ties broken by the smaller threshold).
    *
    * Candidates come from each feature's DISTINCT values — windows
    * run over cells ordered by value, one partition per feature
    * (features are discretized/ordinal by contract; the value
    * cardinality, not the row count, bounds the partition). Counts
    * are exact integers; each candidate's impurity is a pinned double
    * (count² must stay below 2⁵³ — guarded loudly), so the argmin and
    * gain are hash-exact.
    *
    * Output per feature: (feature, n, split_value, n_left,
    * gini_split, gini_root, gain).
    */
  def bestNumericSplit(
      df: DataFrame,
      feature: Column,
      value: Column,
      label: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"bestNumericSplit: $name must be a non-null integer")))
        .otherwise(c.cast("long"))
    val yG = when(label.cast("long").isNull ||
      (label.cast("long") =!= 0L && label.cast("long") =!= 1L),
      raise_error(lit("bestNumericSplit: label must be 0 or 1")))
      .otherwise(label.cast("long"))
    val base = df.select(feature.as("ft"), g(value, "value").as("v"),
      yG.as("y"))
    val cells = base.groupBy(col("ft"), col("v"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val wCum = Window.partitionBy(col("ft")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("ft"))
    val twoP53 = 9007199254740992L
    def sq(c: Column, what: String): Column = {
      val d = when(c > lit(twoP53), raise_error(lit(
        s"bestNumericSplit: $what exceeds 2^53 — double cast would round")))
        .otherwise(c).cast("double")
      d * d
    }
    val cum = cells
      .withColumn("nl", sum(col("c")).over(wCum))
      .withColumn("pl", sum(col("p")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("pt", sum(col("p")).over(wAll))
      .filter(col("nl") < col("n")) // right side must be non-empty
    val nlD = col("nl").cast("double")
    val nrD = (col("n") - col("nl")).cast("double")
    val nD = col("n").cast("double")
    val giniL = lit(1.0) -
      (sq(col("pl"), "a left positive count") +
        sq(col("nl") - col("pl"), "a left negative count")) / (nlD * nlD)
    val giniR = lit(1.0) -
      (sq(col("pt") - col("pl"), "a right positive count") +
        sq(col("n") - col("nl") - (col("pt") - col("pl")),
          "a right negative count")) / (nrD * nrD)
    val wg = (nlD * giniL + nrD * giniR) / nD
    val wPick = Window.partitionBy(col("ft"))
      .orderBy(col("wg").asc, col("v").asc)
    val giniRoot = lit(1.0) -
      (sq(col("pt"), "the positive total") +
        sq(col("n") - col("pt"), "the negative total")) / (nD * nD)
    cum
      .withColumn("wg", wg)
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("ft").as("feature"), col("n"),
        col("v").as("split_value"), col("nl").as("n_left"),
        col("wg").as("gini_split"),
        giniRoot.as("gini_root"),
        (giniRoot - col("wg")).as("gain"))
  }

  /** INFORMATION-GAIN FEATURE SCREEN — decision-stump feature ranking
    * against a binary target with the ENTROPY criterion, the ln
    * sibling [[giniFeatureGain]]'s scaladoc promises: per categorical
    * feature, gain = H(root) − Σ_v (n_v/N)·H(v) with the binary
    * entropy H = −(p·ln p + q·ln q) (0·ln 0 = 0). Exact integer
    * cells; ln() is not bit-portable, so the gains are 1e-9-gated by
    * oracles (the [[theilIndex]] discipline) and the per-feature sum
    * keeps map-side combining. Null feature values form their own
    * category; null targets raise. Output per feature:
    * (feature, n_values, entropy_root, entropy_weighted, info_gain).
    */
  def infoGainScreen(
      df: DataFrame,
      feature: Column,
      value: Column,
      label: Column): DataFrame = {
    val yG = when(label.cast("long").isNull ||
      (label.cast("long") =!= 0L && label.cast("long") =!= 1L),
      raise_error(lit("infoGainScreen: label must be 0 or 1")))
      .otherwise(label.cast("long"))
    val base = df.select(feature.as("ft"),
      coalesce(value.cast("string"), lit("__null__")).as("v"), yG.as("y"))
    val cells = base.groupBy(col("ft"), col("v"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val tot = cells.groupBy(col("ft"))
      .agg(sum(col("c")).as("n"), sum(col("p")).as("pt"),
        count(lit(1)).as("nv"))
      .select(col("ft").as("tf"), col("n"), col("pt"), col("nv"))
    def hTerm(pos: Column, cnt: Column): Column = {
      val pr = pos.cast("double") / cnt.cast("double")
      val qr = (cnt - pos).cast("double") / cnt.cast("double")
      -(when(pos > 0L, pr * log(pr)).otherwise(lit(0.0)) +
        when(cnt - pos > 0L, qr * log(qr)).otherwise(lit(0.0)))
    }
    cells.join(broadcast(tot), col("ft") === col("tf"))
      .groupBy(col("ft"))
      .agg(
        first(col("nv")).as("n_values"),
        first(hTerm(col("pt"), col("n"))).as("entropy_root"),
        sum((col("c").cast("double") / col("n").cast("double")) *
          hTerm(col("p"), col("c"))).as("entropy_weighted"))
      .select(col("ft").as("feature"), col("n_values"),
        col("entropy_root"), col("entropy_weighted"),
        (col("entropy_root") - col("entropy_weighted")).as("info_gain"))
  }

  /** SHANNON DIVERSITY per group — entropy H = −Σ p·ln p of a
    * categorical distribution and its EFFECTIVE CATEGORY COUNT
    * exp(H) (Hill number ¹D): "over how many sources/classes is this
    * group really spread?" — the entropy member of the diversity
    * family ([[herfindahl]] is the exact quadratic member; 1/HHI is
    * ²D). Exact integer cells; ln() is not bit-portable, so H and
    * exp(H) are 1e-9-gated by oracles (the [[theilIndex]]
    * discipline) and the sum keeps map-side combining. Output per
    * group: (g, n, n_categories, shannon, effective_categories).
    */
  def shannonDiversity(
      df: DataFrame,
      group: Column,
      category: Column): DataFrame = {
    val base = df.select(group.as("g"), category.as("c"))
      .filter(col("g").isNotNull && col("c").isNotNull)
    val cells = base.groupBy(col("g"), col("c")).agg(count(lit(1)).as("nc"))
    val tot = cells.groupBy(col("g"))
      .agg(sum(col("nc")).as("n"), count(lit(1)).as("ncat"))
      .select(col("g").as("tg"), col("n"), col("ncat"))
    val p = col("nc").cast("double") / col("n").cast("double")
    cells.join(broadcast(tot), col("g") === col("tg"))
      .groupBy(col("g"))
      .agg(sum(-p * log(p)).as("h"),
        first(col("n")).as("n"), first(col("ncat")).as("n_categories"))
      .select(col("g"), col("n"), col("n_categories"),
        col("h").as("shannon"), exp(col("h")).as("effective_categories"))
  }

  /** LEAVE-ONE-OUT SOURCE ABLATION — for a ratio metric Σnum/Σden,
    * each group's marginal influence: the overall rate, the rate with
    * the group REMOVED, and the delta. The data-valuation primitive
    * ("which source is dragging quality down?") for any decomposable
    * metric — one aggregation pass, because removal of a group is
    * pure arithmetic on the exact totals: no per-group re-scan, which
    * is what makes this viable over 10⁴ sources at 100 TB.
    *
    * `num`/`den` must be non-null integers (0/1 indicators or
    * counts); rates are pinned doubles from exact longs — hash-exact.
    * Output per group: (g, num_g, den_g, rate_overall, rate_without,
    * delta) — rate_without null for a group that is the entire
    * dataset.
    */
  def leaveOneOutAblation(
      df: DataFrame,
      group: Column,
      num: Column,
      den: Column): DataFrame = {
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"leaveOneOutAblation: $name must be a non-null integer")))
        .otherwise(c.cast("long"))
    val base = df.select(group.as("g"), g(num, "num").as("p"),
      g(den, "den").as("q"))
    val per = base.groupBy(col("g")).agg(
      sum(col("p")).as("pg"), sum(col("q")).as("qg"))
    // totals as a broadcast 1-row frame, not an all-rows window — no
    // single-partition exchange
    val tot = per.crossJoin(broadcast(
      per.agg(sum(col("pg")).as("pt"), sum(col("qg")).as("qt"))))
    val overall = col("pt").cast("double") / col("qt").cast("double")
    val without = (col("pt") - col("pg")).cast("double") /
      (col("qt") - col("qg")).cast("double")
    tot.select(col("g"), col("pg").as("num_g"), col("qg").as("den_g"),
      overall.as("rate_overall"),
      when(col("qt") > col("qg"), without)
        .otherwise(lit(null).cast("double")).as("rate_without"),
      when(col("qt") > col("qg"), overall - without)
        .otherwise(lit(null).cast("double")).as("delta"))
  }

  /** THEIL T INDEX per group — the entropy member of the inequality
    * family ([[RankStats.giniCoefficient]] is the rank member,
    * [[herfindahl]] the concentration member): T = (1/n)·Σ_{x>0}
    * (x/μ)·ln(x/μ), 0 for perfect equality, ln(n) for total
    * concentration, and — unlike Gini — exactly decomposable into
    * within/between-group terms.
    *
    * n and Σx are exact decimals; each row's term is a pinned double
    * and the per-group total is a plain partial-aggregated float sum
    * — ln() libraries are not bit-identical across engines anyway, so
    * the statistic is 1e-9-gated (the q61/q125 soundness-oracle
    * discipline), and the sum keeps map-side combining instead of
    * paying an ordered fold for false exactness. Zero amounts
    * contribute zero (the x·ln x limit) but count toward n and μ.
    *
    * `amountCents` must be non-null and ≥ 0. Output per group:
    * (k, n, sum_cents, theil) — theil null when Σx = 0.
    */
  def theilIndex(
      df: DataFrame,
      group: Column,
      amountCents: Column): DataFrame = {
    val vL = amountCents.cast("long")
    val vG = when(vL.isNull || vL < 0L, raise_error(lit(
      "theilIndex: amountCents must be non-null and >= 0"))).otherwise(vL)
    val base = df.select(group.as("k"), vG.as("v"))
    val d19 = "decimal(19,0)"
    val st = base.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sum(col("v").cast(d19)).cast("decimal(38,0)").as("sv"))
      .select(col("k").as("sk"), col("n"), col("sv"),
        (col("sv").cast("double") / col("n").cast("double")).as("mu"))
    val joined = base.join(st, col("k") === col("sk"))
    val ratio = col("v").cast("double") / col("mu")
    val term = when(col("v") > 0L, ratio * log(ratio)).otherwise(lit(0.0))
    joined.groupBy(col("k"))
      .agg(sum(term).as("tsum"), first(col("n")).as("n"),
        first(col("sv")).as("sv"))
      .select(col("k"), col("n"),
        col("sv").cast("string").as("sum_cents"),
        when(col("sv") > 0, col("tsum") / col("n").cast("double"))
          .otherwise(lit(null).cast("double")).as("theil"))
  }
}

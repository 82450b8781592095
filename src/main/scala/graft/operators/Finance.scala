package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cash-flow analytics: discounted present value and payback over
  * per-key period series — the project/customer profitability loop
  * of every finance mart.
  *
  * Scale shape: flows first collapse to one row per (key, period)
  * (partial-aggregable), then every window is PARTITIONED BY KEY over
  * that bounded period axis (a 30-year monthly series is 360 rows) —
  * a task owns one key's series, parallelism comes from the millions
  * of keys.
  *
  * Determinism: cash accumulates in EXACT cents (int64 — payback
  * flips on a sign, so it must never ride a float); only the
  * discounted series is double, folded through an ordered running
  * window (one pinned left-to-right order) with a libm `pow` per
  * term — oracles replay the fold and gate NPV at 1e-9 while
  * everything else hash-matches.
  */
object Finance {

  /** Per-key discounted cash flow: n_periods, total_cents (exact),
    * payback_t (first period offset where the UNDISCOUNTED running
    * total turns ≥ 0 — null if never), and npv at `ratePerPeriod`
    * (discounting from the key's first period, t = 0). `period` is
    * any integer timeline (month index, day bucket); gaps are
    * allowed and simply skip t values.
    */
  def dcf(
      df: DataFrame,
      key: Column,
      period: Column,
      amountCents: Column,
      ratePerPeriod: Double): DataFrame = {
    require(ratePerPeriod > -1.0 && java.lang.Double.isFinite(ratePerPeriod),
      s"dcf: ratePerPeriod must be finite and > -1, got $ratePerPeriod")
    val pG = when(period.cast("long").isNull, raise_error(lit(
      "dcf: period must be non-null and long-castable")))
      .otherwise(period.cast("long"))
    val aG = when(amountCents.cast("long").isNull, raise_error(lit(
      "dcf: amountCents must be non-null and long-castable")))
      .otherwise(amountCents.cast("long"))
    val cf = df.select(key.as("k"), pG.as("p"), aG.as("cents"))
      .groupBy(col("k"), col("p")).agg(sum(col("cents")).as("cf"))
    val wKey = Window.partitionBy(col("k"))
    val wCum = Window.partitionBy(col("k")).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = col("p") - min(col("p")).over(wKey)
    val folded = cf
      .withColumn("t", t)
      .withColumn("disc",
        col("cf").cast("double") / pow(lit(1.0 + ratePerPeriod), col("t")))
      .withColumn("cum_cents", sum(col("cf")).over(wCum))
      .withColumn("cum_disc", sum(col("disc")).over(wCum))
    folded.groupBy(col("k")).agg(
      count(lit(1)).as("n_periods"),
      max(struct(col("t"), col("cum_cents"))).getField("cum_cents")
        .as("total_cents"),
      min(when(col("cum_cents") >= 0L, col("t"))).as("payback_t"),
      max(struct(col("t"), col("cum_disc"))).getField("cum_disc").as("npv"))
  }

  /** PRICE INDEX per group — Laspeyres, Paasche, and Fisher between a
    * base and a current period over items present (with positive
    * quantity) in BOTH: with unit prices p = revenue/quantity,
    *
    *   L = Σ p₁q₀ / Σ p₀q₀,   P = Σ p₁q₁ / Σ p₀q₁,   F = √(L·P).
    *
    * Denominator Σp₀q₀ and numerator Σp₁q₁ are just the exact decimal
    * revenue sums; the cross terms p₁q₀ = r₁·q₀/q₁ mix per-item
    * divisions and are FLOAT sums — per-item pinned doubles folded in
    * item order here, but NOT cross-engine bit-stable at realistic
    * group sizes (DuckDB's windowed SUM reassociates via a segment
    * tree past a few dozen rows), so oracles gate the indices at 1e-9
    * instead of hashing them. Revenues in integer cents, quantities
    * integers, both guarded non-negative; 2⁵³ cast guards raise
    * loudly.
    *
    * Output per group: (g, n_items, laspeyres, paasche, fisher) —
    * null indices when a side sums to zero.
    */
  def priceIndex(
      df: DataFrame,
      group: Column,
      item: Column,
      inBase: Column,
      revenueCents: Column,
      qty: Column): DataFrame = {
    def nn(c: Column, name: String): Column =
      when(c.cast("long").isNull || c.cast("long") < 0L, raise_error(lit(
        s"priceIndex: $name must be a non-null integer >= 0")))
        .otherwise(c.cast("long"))
    val flag = when(inBase.cast("boolean").isNull, raise_error(lit(
      "priceIndex: inBase must be a non-null boolean")))
      .otherwise(inBase.cast("boolean"))
    val base = df.select(group.as("g"), item.as("i"), flag.as("b"),
      nn(revenueCents, "revenueCents").as("r"), nn(qty, "qty").as("q"))
    val d19 = "decimal(19,0)"
    val per = base.groupBy(col("g"), col("i")).agg(
      sum(when(col("b"), col("r")).otherwise(0L)).as("r0"),
      sum(when(col("b"), col("q")).otherwise(0L)).as("q0"),
      sum(when(!col("b"), col("r")).otherwise(0L)).as("r1"),
      sum(when(!col("b"), col("q")).otherwise(0L)).as("q1"))
      .filter(col("q0") > 0L && col("q1") > 0L)
    val twoP53 = 9007199254740992L
    def exactDbl(c: Column, what: String): Column =
      when(c > lit(twoP53), raise_error(lit(
        s"priceIndex: $what exceeds 2^53 — double cast would round")))
        .otherwise(c).cast("double")
    val lTerm = exactDbl(col("r1"), "an item revenue") *
      col("q0").cast("double") / col("q1").cast("double")
    val pTerm = exactDbl(col("r0"), "an item revenue") *
      col("q1").cast("double") / col("q0").cast("double")
    val wCum = Window.partitionBy(col("g")).orderBy(col("i").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val folded = per
      .withColumn("lnum", sum(lTerm).over(wCum))
      .withColumn("pden", sum(pTerm).over(wCum))
      .withColumn("sr0", sum(col("r0").cast(d19)).over(wAll)
        .cast("decimal(38,0)"))
      .withColumn("sr1", sum(col("r1").cast(d19)).over(wAll)
        .cast("decimal(38,0)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("i").asc)))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .filter(col("rn") === col("cnt"))
    val l = col("lnum") / exactDbl(col("sr0"), "the base revenue total")
    val p = exactDbl(col("sr1"), "the current revenue total") / col("pden")
    folded.select(col("g"), col("cnt").as("n_items"),
      when(col("sr0") > 0, l).otherwise(lit(null).cast("double"))
        .as("laspeyres"),
      when(col("pden") > 0.0, p).otherwise(lit(null).cast("double"))
        .as("paasche"),
      when(col("sr0") > 0 && col("pden") > 0.0, sqrt(l * p))
        .otherwise(lit(null).cast("double")).as("fisher"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIFO LOT MATCHING — the inventory/cost-basis primitive: sells
  * consume buy lots oldest-first, realized cost (COGS) is the matched
  * quantity × each lot's unit cost, remaining inventory is whatever
  * the sell stream never reached. The classic formulation is a
  * sequential queue fold; this implementation uses the equivalent
  * CUMULATIVE-QUANTITY form — when the ledger is feasible (no sell
  * exceeds what was bought before it), FIFO consumption in aggregate
  * is order-independent: the matched units are exactly the FIRST
  * `S_total` units in buy order, so lot `[cumBefore, cumBefore+qty)`
  * matches `clamp(S_total − cumBefore, 0, qty)` units. That turns the
  * queue fold into ONE per-key cumulative window over the buy lots
  * plus one aggregate — no sequential state, no collect, exact
  * integer arithmetic end to end.
  *
  * Infeasible ledgers (sold more than ever bought) don't raise — the
  * overshoot is reported per key as `unmatched_sold` (the honest
  * number; clamping silently would hide a data-quality bug).
  *
  * `qty` must be a non-negative long; `unitCost` a non-negative long
  * (cents). Output per key: (key, bought_qty, sold_qty, matched_qty,
  * cogs, remaining_qty, remaining_cost, unmatched_sold).
  */
object Fifo {

  def matchLots(
      buys: DataFrame,
      sells: DataFrame,
      buyKey: Column,
      buyTs: Column,
      buyTiebreak: Column,
      buyQty: Column,
      buyUnitCost: Column,
      sellKey: Column,
      sellQty: Column): DataFrame =
    matchImpl(buys, sells, buyKey, buyTs, buyTiebreak, buyQty, buyUnitCost,
      sellKey, sellQty, newestFirst = false)

  /** LIFO variant — sells consume the NEWEST lots first (the other
    * standard cost-basis convention; also the shape of stack-like
    * resource reclamation). Identical cumulative-quantity geometry
    * with the buy order REVERSED: matched units are the LAST S_total
    * units in (ts, tiebreak) order. Same outputs and feasibility
    * semantics as [[matchLots]].
    */
  def matchLotsLifo(
      buys: DataFrame,
      sells: DataFrame,
      buyKey: Column,
      buyTs: Column,
      buyTiebreak: Column,
      buyQty: Column,
      buyUnitCost: Column,
      sellKey: Column,
      sellQty: Column): DataFrame =
    matchImpl(buys, sells, buyKey, buyTs, buyTiebreak, buyQty, buyUnitCost,
      sellKey, sellQty, newestFirst = true)

  private def matchImpl(
      buys: DataFrame,
      sells: DataFrame,
      buyKey: Column,
      buyTs: Column,
      buyTiebreak: Column,
      buyQty: Column,
      buyUnitCost: Column,
      sellKey: Column,
      sellQty: Column,
      newestFirst: Boolean): DataFrame = {
    def nonNeg(c: Column, what: String) =
      when(c.cast("long").isNull || c.cast("long") < 0L, raise_error(lit(
        s"Fifo.matchLots: $what must be a non-negative long"))).otherwise(c.cast("long"))
    val b = buys.select(buyKey.as("k"), buyTs.as("ts"), buyTiebreak.as("tb"),
      nonNeg(buyQty, "buy qty").as("q"), nonNeg(buyUnitCost, "unit cost").as("c"))
      .filter(col("k").isNotNull && col("ts").isNotNull && col("tb").isNotNull)
    val s = sells.select(sellKey.as("k"), nonNeg(sellQty, "sell qty").as("q"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(sum(col("q")).as("sold"))
      .select(col("k").as("sk"), col("sold"))
    val w =
      (if (newestFirst)
        Window.partitionBy(col("k")).orderBy(col("ts").desc, col("tb").desc)
      else Window.partitionBy(col("k")).orderBy(col("ts"), col("tb")))
        .rowsBetween(Window.unboundedPreceding, -1)
    val lots = b
      .withColumn("cumBefore", coalesce(sum(col("q")).over(w), lit(0L)))
      .join(s, col("k") === col("sk"), "left")
      .withColumn("soldT", coalesce(col("sold"), lit(0L)))
      .withColumn("matched",
        greatest(lit(0L), least(col("q"), col("soldT") - col("cumBefore"))))
    val perKey = lots.groupBy(col("k"))
      .agg(
        sum(col("q")).as("bought_qty"),
        max(col("soldT")).as("sold_qty"),
        sum(col("matched")).as("matched_qty"),
        // money accumulates in decimal(38,0): qty × unit-cost products
        // of large longs overflow int64 silently in non-ANSI mode —
        // decimal(19,0) factors make the product exact decimal(38,0)
        sum(col("matched").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("cogs"),
        sum(col("q") - col("matched")).as("remaining_qty"),
        sum((col("q") - col("matched")).cast("decimal(19,0)")
          * col("c").cast("decimal(19,0)")).cast("decimal(38,0)").as("remaining_cost"))
    // sell-only keys (never bought): all-zero lots, pure overshoot —
    // dropping them would hide exactly the ledger bug worth surfacing
    val sellOnly = s.join(b.select(col("k")).distinct(),
      col("sk") === col("k"), "left_anti")
      .select(col("sk").as("k"), lit(0L).as("bought_qty"), col("sold").as("sold_qty"),
        lit(0L).as("matched_qty"), lit(0L).cast("decimal(38,0)").as("cogs"),
        lit(0L).as("remaining_qty"),
        lit(0L).cast("decimal(38,0)").as("remaining_cost"))
    perKey.unionByName(sellOnly)
      .select(col("k").as("key"), col("bought_qty"), col("sold_qty"),
        col("matched_qty"), col("cogs"), col("remaining_qty"), col("remaining_cost"),
        greatest(lit(0L), col("sold_qty") - col("bought_qty")).as("unmatched_sold"))
  }
}

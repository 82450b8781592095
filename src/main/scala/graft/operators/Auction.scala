package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CALL-AUCTION UNIFORM-PRICE CLEARING — the batch-market matching
  * rule (opening/closing auctions, IPO bookbuilding, periodic double
  * auctions): given limit BIDS and ASKS per instrument, find the one
  * price maximizing executable volume, min(D(p), S(p)) with demand
  * D(p) = Σ bid qty priced ≥ p and supply S(p) = Σ ask qty priced
  * ≤ p; ties break to the smaller demand/supply imbalance |D−S|,
  * then to the LOWEST price — a fully deterministic rule.
  *
  * Scale shape: orders collapse to per-(key, price-level) quantity
  * cells in one partial-aggregable pass (ties never travel
  * individually); the demand/supply curves are two cumulative windows
  * over each key's PRICE AXIS — bounded by distinct price levels, not
  * order count — and the argmax is one row_number over the same
  * frame. No global sort, no reducer owns more than one instrument's
  * price axis.
  *
  * Prices and quantities must be exact non-negative longs (cents and
  * units — raises otherwise); every output field is an exact integer,
  * so oracles hash-match with no tolerance. Keys with no crossing
  * volume still emit their deterministic best row (volume 0) — the
  * caller filters, the operator never silently drops an instrument.
  *
  * Output: (key, clearing_price, volume, demand, supply) — demand and
  * supply evaluated AT the clearing price.
  */
object Auction {

  def uniformClearing(
      bids: DataFrame,
      asks: DataFrame,
      bidKey: Column, bidPrice: Column, bidQty: Column,
      askKey: Column, askPrice: Column, askQty: Column): DataFrame = {
    def guard(c: Column, what: String): Column =
      when(c.cast("long").isNull || c.cast("long") < 0L, raise_error(lit(
        s"uniformClearing: $what must be a non-negative long")))
        .otherwise(c.cast("long"))
    val b = bids
      .select(bidKey.as("k"), guard(bidPrice, "bid price").as("p"),
        guard(bidQty, "bid qty").as("q"))
      .filter(col("k").isNotNull)
      .groupBy(col("k"), col("p")).agg(sum(col("q")).as("bq"))
    val a = asks
      .select(askKey.as("k"), guard(askPrice, "ask price").as("p"),
        guard(askQty, "ask qty").as("q"))
      .filter(col("k").isNotNull)
      .groupBy(col("k"), col("p")).agg(sum(col("q")).as("aq"))
    val levels = b.join(a, Seq("k", "p"), "full_outer")
      .select(col("k"), col("p"),
        coalesce(col("bq"), lit(0L)).as("bq"),
        coalesce(col("aq"), lit(0L)).as("aq"))
    // price-axis windows: ≤ distinct price levels per key
    val wUp = Window.partitionBy(col("k")).orderBy(col("p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDown = Window.partitionBy(col("k")).orderBy(col("p").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curves = levels
      .withColumn("supply", sum(col("aq")).over(wUp))
      .withColumn("demand", sum(col("bq")).over(wDown))
      .withColumn("volume", least(col("demand"), col("supply")))
      .withColumn("imb", abs(col("demand") - col("supply")))
    val wPick = Window.partitionBy(col("k"))
      .orderBy(col("volume").desc, col("imb").asc, col("p").asc)
    curves
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("k").as("key"), col("p").as("clearing_price"),
        col("volume"), col("demand"), col("supply"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LARGEST-REMAINDER integer allocation (Hamilton/Hare apportionment):
  * split an integer `total` among each group's items proportionally to
  * their integer weights, exactly — Σ alloc = total per group, every
  * item gets ⌊total·w/W⌋, and the leftover units go one-each to the
  * largest remainders (ties broken by item ascending, so the result is
  * a pure function of the data). The budget/quota/shard-assignment
  * primitive: floats can't do this (their shares don't sum to the
  * total); the entire computation here is int64 arithmetic, so the
  * oracle hash-matches with no tolerance.
  *
  * Scale: weights collapse to one row per (group, item) in a
  * partial-aggregable pass; group totals join back (AQE broadcasts the
  * per-group frame); the only window is the remainder rank over the
  * AGGREGATED (group, item) frame — partitioned per group, bounded by
  * items-per-group, never the raw data. Overflow is guarded:
  * total·w must fit int64, so w ≤ Long.Max/total raises loudly.
  *
  * Contract: weights must be non-negative longs; a group whose total
  * weight is 0 cannot be allocated (division by zero) and raises.
  */
object Allocation {

  /** One row per (group, item): `alloc` with Σ alloc = `total` within
    * every group. `weight` is summed per (group, item) first, so `df`
    * may carry raw detail rows.
    */
  def largestRemainder(
      df: DataFrame,
      group: Column,
      item: Column,
      weight: Column,
      total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    val wL = weight.cast("long")
    val wG = when(wL.isNull || wL < 0L, raise_error(lit(
      "largestRemainder: weight must be a non-negative long"))).otherwise(wL)
    val items = df.select(group.as("g"), item.as("i"), wG.as("w"))
      .groupBy(col("g"), col("i")).agg(sum(col("w")).as("w"))
      // the guard rides a payload column, not the keys (q108 lesson)
      .select(col("g"), col("i"),
        when(col("w") > Long.MaxValue / math.max(total, 1L), raise_error(concat(
          lit(s"largestRemainder: total * weight overflows int64 for item "),
          col("i").cast("string")))).otherwise(col("w")).as("w"))
    val totals = items.groupBy(col("g")).agg(sum(col("w")).as("gw"))
      .select(col("g").as("tg"),
        when(col("gw") === 0L && lit(total) > 0L, raise_error(concat(
          lit("largestRemainder: group "), col("tg").cast("string"),
          lit(" has zero total weight — nothing to allocate against"))))
          .otherwise(col("gw")).as("gw"))
    // With a FOLDABLE group (the single-group callers pass a literal),
    // constant propagation folds `g === tg` to true and the equi-join
    // degrades to a cross join — planned as a CartesianProduct until
    // AQE rescues it at runtime. A foldable group means ONE group, so
    // totals/leftovers are one-row frames: declare the broadcast and
    // the static plan is a BroadcastNestedLoopJoin over a single row,
    // never a cartesian. Non-foldable groups keep the plain hash
    // equi-join (group cardinality can be huge — never broadcast it).
    val groupFoldable = df.select(group.as("__g")).queryExecution.analyzed
      .expressions.exists {
        case a: org.apache.spark.sql.catalyst.expressions.Alias
            if a.name == "__g" => a.child.foldable
        case _ => false
      }
    val bc: DataFrame => DataFrame =
      if (groupFoldable) d => broadcast(d) else identity
    val based = items.join(bc(totals), col("g") === col("tg"))
      .select(col("g"), col("i"), col("w"),
        (lit(total) * col("w")).as("tw"), col("gw"))
      // `div` is INTEGRAL division (long/long `/` would detour through
      // a double and lose exactness past 2^53); operands are
      // non-negative so truncation = floor in both engines
      .select(col("g"), col("i"),
        expr("tw div gw").as("base"),
        (col("tw") % col("gw")).as("rem"))
    val leftovers = based.groupBy(col("g")).agg((lit(total) - sum(col("base"))).as("r"))
      .select(col("g").as("lg"), col("r"))
    val wRank = Window.partitionBy(col("g"))
      .orderBy(col("rem").desc, col("i").asc)
    based.join(bc(leftovers), col("g") === col("lg"))
      .withColumn("rn", row_number().over(wRank))
      .select(col("g").as("group"), col("i").as("item"),
        (col("base") + when(col("rn") <= col("r"), 1L).otherwise(0L)).as("alloc"))
  }

  /** Per-group-TOTAL variant of [[largestRemainder]]: each group
    * carries its OWN integer total (revenue recognition across
    * periods, per-contract proration, per-tenant quota splits). The
    * total must be CONSTANT within a group and non-negative — both
    * raise loudly, as does a total·weight product that cannot fit
    * int64. Same geometry and guarantees: Σ alloc = the group's
    * total, pure int64 arithmetic, hash-exact.
    */
  def largestRemainderBy(
      df: DataFrame,
      group: Column,
      item: Column,
      weight: Column,
      total: Column): DataFrame = {
    val wL = weight.cast("long")
    val wG = when(wL.isNull || wL < 0L, raise_error(lit(
      "largestRemainderBy: weight must be a non-negative long"))).otherwise(wL)
    val tL = total.cast("long")
    val tG = when(tL.isNull || tL < 0L, raise_error(lit(
      "largestRemainderBy: total must be a non-negative long"))).otherwise(tL)
    // partition the stream by the GROUP key up front: the (g,i)
    // aggregation is satisfied by the subset clustering, and every
    // downstream step — group totals, the totals join, the leftover
    // aggregation, the remainder-rank window, the final join — is
    // keyed by g, so ONE exchange serves the whole allocation instead
    // of one per step (the 60M-row q265 stream paid ~5)
    val items = df.select(group.as("g"), item.as("i"), wG.as("w"), tG.as("t"))
      .repartition(col("g"))
      .groupBy(col("g"), col("i")).agg(
        sum(col("w")).as("w"), min(col("t")).as("t0"), max(col("t")).as("t1"))
    val totals = items.groupBy(col("g")).agg(
      sum(col("w")).as("gw"), min(col("t0")).as("ta"), max(col("t1")).as("tb"))
      .select(col("g").as("tg"),
        when(col("ta") =!= col("tb"), raise_error(concat(
          lit("largestRemainderBy: total is not constant within group "),
          col("tg").cast("string")))).otherwise(col("ta")).as("t"),
        when(col("gw") === 0L && col("ta") > 0L, raise_error(concat(
          lit("largestRemainderBy: group "), col("tg").cast("string"),
          lit(" has zero total weight — nothing to allocate against"))))
          .otherwise(col("gw")).as("gw"))
    // `based` feeds BOTH the leftover aggregation and the final join;
    // in the exchange-free plan that recomputes the aggregate subtree
    // twice, which measured CHEAPER than materializing 60M rows once
    // (q265: 3.0 s recompute vs 8.1 s checkpointed) — recompute is
    // map-local over the one repartition exchange, materialization is
    // a full write+read of the stream
    val based = (
      items.join(totals, col("g") === col("tg"))
        // the guard rides a payload column, not the keys (q108 lesson)
        .select(col("g"), col("i"), col("t"), col("gw"),
          when(col("w") > lit(Long.MaxValue) / greatest(col("t"), lit(1L)),
            raise_error(concat(
              lit("largestRemainderBy: total * weight overflows int64 for item "),
              col("i").cast("string")))).otherwise(col("w")).as("w"))
        .select(col("g"), col("i"), col("t"),
          // gw = 0 survives the totals guard only when t = 0 (nothing to
          // allocate): emit 0 explicitly rather than the NULL of 0 div 0.
          when(col("gw") === 0L, lit(0L))
            .otherwise(expr("(t * w) div gw")).as("base"),
          when(col("gw") === 0L, lit(0L))
            .otherwise((col("t") * col("w")) % col("gw")).as("rem")))
    val leftovers = based.groupBy(col("g"))
      .agg((min(col("t")) - sum(col("base"))).as("r"))
      .select(col("g").as("lg"), col("r"))
    val wRank = Window.partitionBy(col("g"))
      .orderBy(col("rem").desc, col("i").asc)
    based.join(leftovers, col("g") === col("lg"))
      .withColumn("rn", row_number().over(wRank))
      .select(col("g").as("group"), col("i").as("item"),
        (col("base") + when(col("rn") <= col("r"), 1L).otherwise(0L)).as("alloc"))
  }
}

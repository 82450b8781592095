package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CLAMPED RUNNING BALANCE — the inventory/credit-ledger fold
  * `b_t = max(0, b_{t−1} + δ_t)` per key in (ts, tiebreak) order,
  * with a count of the clamp events (demand that arrived against an
  * empty balance). The clamp makes the recurrence NON-LINEAR — unlike
  * a plain running sum it cannot be expressed as a window aggregate
  * (`sum() over (...)` then max is wrong: a clamp resets the base for
  * everything after it), so it folds sequentially per key, the
  * [[TimeSeries.ema]] geometry: one `aggregate` HOF over the key's
  * sorted event array. All arithmetic is exact int64.
  *
  * Scale: per-key sequential state is irreducible (each step needs
  * its predecessor); the fold is bounded by `maxEventsPerKey` — a key
  * exceeding it raises loudly rather than silently collecting an
  * unbounded array (same posture as [[TimeSeries.gapFill]]). Keys
  * partition freely; no global sort, no driver state.
  *
  * Output: (key, n_events, final_balance, clamp_count).
  */
object Ledger {

  def clampedRunningSum(
      df: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      delta: Column,
      maxEventsPerKey: Int = 1000000): DataFrame = {
    require(maxEventsPerKey >= 1, s"maxEventsPerKey must be >= 1, got $maxEventsPerKey")
    val dG = when(delta.cast("long").isNull, raise_error(lit(
      "clampedRunningSum: delta must be a non-null long"))).otherwise(delta.cast("long"))
    val base = df.select(key.as("k"), ts.as("ts"), tiebreak.as("tb"), dG.as("d"))
      .filter(col("k").isNotNull && col("ts").isNotNull && col("tb").isNotNull)
    def step(acc: Column, e: Column): Column = {
      val b = acc.getItem(0)
      val d = e.getField("d")
      array(
        greatest(lit(0L), b + d),
        acc.getItem(1) + when(b + d < 0L, 1L).otherwise(0L))
    }
    base.groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("ts"), col("tb"), col("d")))).as("evs"))
      .select(col("k"),
        when(col("n_events") > maxEventsPerKey, raise_error(concat(
          lit("clampedRunningSum: key "), col("k").cast("string"),
          lit(s" has more than $maxEventsPerKey events — the per-key fold " +
            "needs a pre-aggregation or a coarser key")))).otherwise(col("n_events"))
          .as("n_events"),
        aggregate(col("evs"), array(lit(0L), lit(0L)), step).as("__st"))
      .select(col("k").as("key"), col("n_events"),
        col("__st").getItem(0).as("final_balance"),
        col("__st").getItem(1).as("clamp_count"))
  }
}

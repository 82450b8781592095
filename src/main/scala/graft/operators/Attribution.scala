package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution over an event stream: for every conversion
  * event, which earlier touch (same user) gets the credit — last-touch
  * and first-touch in one pass.
  *
  * One window partitioned by user, ordered by the TOTAL order
  * (ts, event_id) — event ids are unique, so carry-forward state is
  * deterministic even under timestamp ties. Both attributions are
  * running carry-forwards (`last`/`first` with ignoreNulls over the
  * strictly-preceding frame), so the whole operator is ONE shuffle on
  * user id and one sort within partitions — no self-join, no
  * per-conversion scan. At fleet scale that is the sessionization
  * exchange geometry: partition count follows user cardinality, state
  * per user is O(1).
  */
object Attribution {

  /** Per-conversion attribution rows:
    * (conv_id, user, conv_ts, first_touch_type, first_touch_ts,
    *  last_touch_type, last_touch_ts, gap_us).
    *
    * `isConversion` selects credit-receiving events; every non-null
    * event that is NOT a conversion is a touch. Conversions with no
    * preceding touch keep NULL touch columns (organic conversions are
    * a real cohort — dropping them would inflate every channel's
    * share). `gap_us` = exact microseconds from last touch to
    * conversion.
    */
  def touchAttribution(
      events: DataFrame,
      user: Column,
      ts: Column,
      eventId: Column,
      eventType: Column,
      isConversion: Column): DataFrame = {
    val base = events
      .filter(user.isNotNull && ts.isNotNull && eventId.isNotNull && eventType.isNotNull)
      .select(user.as("user"), ts.as("ts"), eventId.as("event_id"),
        eventType.as("etype"), isConversion.as("is_conv"))
    val w = Window.partitionBy(col("user")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(!col("is_conv"), struct(col("ts"), col("event_id"), col("etype")))
    base
      .withColumn("last_t", last(touch, ignoreNulls = true).over(w))
      .withColumn("first_t", first(touch, ignoreNulls = true).over(w))
      .filter(col("is_conv"))
      .select(
        col("event_id").as("conv_id"),
        col("user"),
        col("ts").as("conv_ts"),
        col("first_t.etype").as("first_touch_type"),
        col("first_t.ts").as("first_touch_ts"),
        col("last_t.etype").as("last_touch_type"),
        col("last_t.ts").as("last_touch_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_t.ts"))).as("gap_us"))
  }

  /** POSITION-BASED (U-shaped) MULTI-TOUCH attribution — every touch
    * shares in the NEXT conversion it precedes (journeys scoped by
    * the user's total order (ts, event_id)): first touch 40%, last
    * 40%, the middle 20% split evenly. Credits are EXACT INTEGER
    * MILLICREDITS summing to 1000 per converted journey — the middle
    * 200 splits by the largest-remainder rule (equal remainders, so
    * the EARLIEST `200 mod (m−2)` middles get the extra unit) —
    * because float credit shares would make the per-channel rollup an
    * order-dependent float sum. Degenerate journeys: one touch gets
    * 1000, two get 500/500. Touches with no following conversion
    * credit nothing (they are open journeys, not credit).
    *
    * Scale: one user-partitioned window assigns each touch its next
    * conversion (O(1) carry-backward state); position/size run in a
    * journey-partitioned window (bounded by journey length); the
    * rollup is a partial-aggregable integer sum. No self-joins.
    *
    * Output per channel: (channel, n_touches, n_conversions,
    * credit_milli).
    */
  /** Journey scoping shared by the multi-touch attributions: each
    * non-conversion event attaches to the NEXT conversion at-or-after
    * it in the user's (ts, event_id) total order (one O(1)
    * carry-backward window state); open journeys (no following
    * conversion) drop. Output: (user, conv_id, conv_ts, ts, event_id,
    * etype).
    */
  private def journeyTouches(
      events: DataFrame,
      user: Column,
      ts: Column,
      eventId: Column,
      eventType: Column,
      isConversion: Column): DataFrame = {
    val base = events
      .filter(user.isNotNull && ts.isNotNull && eventId.isNotNull && eventType.isNotNull)
      .select(user.as("user"), ts.as("ts"), eventId.as("event_id"),
        eventType.as("etype"), isConversion.as("is_conv"))
    val wFwd = Window.partitionBy(col("user")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cnv = when(col("is_conv"), struct(col("ts"), col("event_id")))
    base
      .withColumn("nc", first(cnv, ignoreNulls = true).over(wFwd))
      .filter(!col("is_conv") && col("nc").isNotNull)
      .select(col("user"), col("nc.event_id").as("conv_id"),
        col("nc.ts").as("conv_ts"), col("ts"), col("event_id"), col("etype"))
  }

  def positionCredit(
      events: DataFrame,
      user: Column,
      ts: Column,
      eventId: Column,
      eventType: Column,
      isConversion: Column): DataFrame = {
    val touches = journeyTouches(events, user, ts, eventId, eventType, isConversion)
    val wJ = Window.partitionBy(col("user"), col("conv_id"))
      .orderBy(col("ts"), col("event_id"))
    val sized = touches
      .withColumn("pos", row_number().over(wJ))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy(col("user"), col("conv_id"))))
    val midN = col("m") - 2L
    val credit =
      when(col("m") === 1L, 1000L)
        .when(col("m") === 2L, 500L)
        .when(col("pos") === 1L, 400L)
        .when(col("pos") === col("m"), 400L)
        .otherwise(
          expr("200 div (m - 2)") +
            when(col("pos") - 1L <= lit(200L) % midN, 1L).otherwise(0L))
    sized
      .withColumn("credit", credit)
      .groupBy(col("etype").as("channel"))
      .agg(
        count(lit(1)).as("n_touches"),
        countDistinct(col("user"), col("conv_id")).as("n_conversions"),
        sum(col("credit")).as("credit_milli"))
  }

  /** TIME-DECAY touch mass per channel — recency-weighted influence
    * with a one-day half-life: a touch `a` whole days before its
    * conversion carries weight 2⁻ᵃ. Weights are EXACT dyadic
    * integers — mass is accumulated in units of 2⁻ᵐᵃˣ (so a touch
    * contributes `1 << (maxAgeDays − min(a, maxAgeDays))`, an int64)
    * — because float decay weights would make the rollup an
    * order-dependent float sum, the q235 lesson. Touches older than
    * `maxAgeDays` keep the floor weight (1 unit — still counted, not
    * silently dropped; callers wanting a hard cutoff filter first).
    * `share` is each channel's fraction of the total mass — one
    * double division of exact integers, computed over the tiny
    * channel aggregate.
    *
    * Output: (channel, n_touches, mass, share); mass in 2⁻ᵐᵃˣ units.
    */
  def decayedTouchMass(
      events: DataFrame,
      user: Column,
      ts: Column,
      eventId: Column,
      eventType: Column,
      isConversion: Column,
      maxAgeDays: Int = 40): DataFrame = {
    require(maxAgeDays >= 1 && maxAgeDays <= 62,
      s"maxAgeDays must be in [1, 62] (the weight is a 2^k int64), got $maxAgeDays")
    val touches = journeyTouches(events, user, ts, eventId, eventType, isConversion)
    val age = floor((unix_micros(col("conv_ts")) - unix_micros(col("ts")))
      / lit(86400000000L)).cast("long")
    val perChannel = touches
      .withColumn("age", age)
      // the functions.shiftleft wrapper only takes a literal shift —
      // the SQL form accepts an expression
      .withColumn("mass",
        expr(s"shiftleft(1L, cast($maxAgeDays - least(age, $maxAgeDays) as int))"))
      .groupBy(col("etype").as("channel"))
      .agg(count(lit(1)).as("n_touches"), sum(col("mass")).as("mass"))
    // total over the ≤ |channels|-row aggregate — bounded, never data
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perChannel
      .withColumn("share",
        col("mass").cast("double") / sum(col("mass")).over(wAll).cast("double"))
      .select(col("channel"), col("n_touches"), col("mass"), col("share"))
  }
}

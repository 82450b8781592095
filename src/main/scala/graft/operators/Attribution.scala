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
}

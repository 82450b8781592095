package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: for each user, the
  * earliest traversal of an ordered step sequence (step 1 → step 2 →
  * … → step n), each later step strictly after the previous one and
  * the whole traversal inside a conversion window anchored at step 1.
  * The classic product-analytics operator (Amplitude/Mixpanel funnels,
  * ClickHouse `windowFunnel`) — and, for training-data pipelines, the
  * behavioral-cohort selector ("users who did A then B" become a
  * sampling stratum).
  *
  * Semantics (all deterministic, no RNG):
  *   - t1 = min ts of step-1 events;
  *   - t(i) = min ts of step-i events with ts > t(i-1) AND
  *     ts <= t1 + window (strictly-after ordering; the window is
  *     anchored at t1, Amplitude's "conversion window" rule);
  *   - stage = number of steps reached; converted = all steps reached.
  * Earliest-traversal (min-first) is greedy-optimal here: taking the
  * earliest feasible t(i) can only enlarge the feasible set for
  * t(i+1), so if ANY traversal fits the window the greedy one does.
  *
  * Scale: each step is one pre-filtered partial-aggregable min — the
  * step-i aggregation shuffles only step-i events (map-side combine to
  * one row per user BEFORE the exchange), and every join is user-keyed
  * (step tables shrink monotonically; AQE broadcasts the later ones).
  * No windows, no per-user event sorting, no state: per-user cost is
  * O(1) rows after the first combine regardless of event count, so a
  * 100 TB event log funnels in n tiny user-keyed joins.
  */
object Funnel {

  /** One row per user that reached step 1: `(user, t_1 … t_n, stage,
    * converted)`. `steps` maps step ordinal to its event-type value;
    * n = steps.size >= 2. Null timestamps are dropped (an event that
    * never happened cannot order a funnel).
    */
  def earliest(
      events: DataFrame,
      user: Column,
      ts: Column,
      eventType: Column,
      steps: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got ${steps.mkString(",")}")
    require(windowSeconds > 0, s"windowSeconds must be > 0, got $windowSeconds")
    val base = events
      .select(user.as("u"), ts.as("ts"), eventType.as("et"))
      .filter(col("ts").isNotNull && col("u").isNotNull)
    val first = base.filter(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as("t1"))
      // the window deadline rides along so later steps never re-derive it
      .withColumn("deadline",
        timestamp_micros(unix_micros(col("t1")) + lit(windowSeconds * 1000000L)))
    val full = steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      // inner-join pre-filter: only step-i events of users still in the
      // funnel aggregate; the min is over (ts > t_prev && ts <= deadline)
      val stepMin = base.filter(col("et") === step)
        .join(acc.select(col("u"), col(prev), col("deadline")), Seq("u"))
        .filter(col("ts") > col(prev) && col("ts") <= col("deadline"))
        .groupBy(col("u")).agg(min(col("ts")).as(cur))
      acc.join(stepMin, Seq("u"), "left")
    }
    val stepCols = steps.indices.map(i => col(s"t${i + 1}"))
    val stage = stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduceLeft[Column](_ + _)
    full.select(
      (col("u").as("user") +: stepCols) :+ stage.as("stage") :+
        (col(s"t${steps.size}").isNotNull).as("converted"): _*)
  }

  /** COHORT RETENTION — the companion rollup to [[earliest]]: users
    * cohort by their first-active period (fixed-width, epoch-aligned,
    * `periodSeconds` wide) and each (cohort, offset) cell counts the
    * cohort's users still active `offset` periods later. The classic
    * retention triangle; for training-data pipelines, the freshness
    * profile of a recurring crawl.
    *
    * Period ids are exact integer arithmetic both engines share:
    * `floor(unix_micros(ts) / (periodSeconds · 1e6))`. The double
    * division is provably exact-floored here — µs values are integers
    * < 2^53 and one µs moves the quotient by ≥ 1/periodMicros, orders
    * of magnitude more than an ulp of a period id, so the rounded
    * quotient can never cross an integer boundary the true quotient
    * doesn't.
    *
    * Scale: `distinct (user, period)` is ONE partial-aggregable
    * dedup (activity collapses map-side to one row per user-period —
    * at 100 TB the shuffle carries user-periods, not events); the
    * cohort min reuses the same user-keyed geometry and the final
    * count-distinct groups by (cohort, offset) — thousands of cells,
    * not users.
    */
  def retention(
      events: DataFrame,
      user: Column,
      ts: Column,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val p = periodSeconds * 1000000L
    val active = events
      .select(user.as("u"), ts.as("ts"))
      .filter(col("ts").isNotNull && col("u").isNotNull)
      .select(col("u"),
        floor(unix_micros(col("ts")) / lit(p)).cast("long").as("period"))
      .distinct()
    val cohort = active.groupBy(col("u")).agg(min(col("period")).as("cohort"))
    active.join(cohort, Seq("u"))
      .groupBy(col("cohort").as("cohort_period"),
        (col("period") - col("cohort")).as("period_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}

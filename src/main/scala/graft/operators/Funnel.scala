package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  /** NEGATIVE-CONDITION FUNNEL — each user's EARLIEST A→B conversion
    * with NO blocker event strictly between the two, inside a time
    * window: "first view→purchase not interrupted by an error", the
    * exclusion pattern (`A (¬C)* B`) that plain ordered funnels
    * ([[earliest]]) and the CEP step machine cannot express.
    *
    * Same scale geometry as [[graft.operators.Attribution]]: ONE
    * user-partitioned window pass carrying two O(1) running states
    * (the last A and the last blocker strictly before each event,
    * via `last(..., ignoreNulls)` over the preceding frame — no
    * self-joins, no per-candidate scans), then a min-struct
    * aggregation picks the earliest valid B per user. A candidate B
    * is valid when a preceding A exists within `windowUs` and the
    * last blocker before B does not fall after that A (blockers
    * BEFORE the A are irrelevant — the pattern restarts at the last
    * A). All comparisons are exact (ts, id) lexicographic order.
    *
    * Output: (user, a_ts, a_id, b_ts, b_id, gap_us) — one row per
    * converting user.
    */
  def negativeFunnel(
      events: DataFrame,
      user: Column,
      ts: Column,
      eventId: Column,
      eventType: Column,
      stepA: String,
      stepB: String,
      blocker: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    require(Set(stepA, stepB, blocker).size == 3,
      s"stepA/stepB/blocker must be distinct, got ($stepA, $stepB, $blocker)")
    val base = events
      .filter(user.isNotNull && ts.isNotNull && eventId.isNotNull && eventType.isNotNull)
      .select(user.as("user"), ts.as("ts"), eventId.as("event_id"),
        eventType.as("etype"))
      .filter(col("etype").isin(stepA, stepB, blocker))
    val w = Window.partitionBy(col("user")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aState = when(col("etype") === stepA, struct(col("ts"), col("event_id")))
    val cState = when(col("etype") === blocker, struct(col("ts"), col("event_id")))
    val cands = base
      .withColumn("la", last(aState, ignoreNulls = true).over(w))
      .withColumn("lc", last(cState, ignoreNulls = true).over(w))
      .filter(col("etype") === stepB && col("la").isNotNull)
      .filter(unix_micros(col("ts")) - unix_micros(col("la.ts")) <= windowUs)
      // no blocker strictly between the A and this B: the last blocker
      // before B must precede the A in the same (ts, id) total order
      .filter(col("lc").isNull || !(col("lc") > col("la")))
    cands
      .groupBy(col("user"))
      .agg(min(struct(col("ts").as("b_ts"), col("event_id").as("b_id"),
        col("la.ts").as("a_ts"), col("la.event_id").as("a_id"))).as("m"))
      .select(col("user"),
        col("m.a_ts").as("a_ts"), col("m.a_id").as("a_id"),
        col("m.b_ts").as("b_ts"), col("m.b_id").as("b_id"),
        (unix_micros(col("m.b_ts")) - unix_micros(col("m.a_ts"))).as("gap_us"))
  }

  /** COHORT LTV curve — cumulative value per cohort-age: users cohort
    * by their FIRST event's period (min period per user — callers
    * pre-filter to the cohorting/revenue event class), revenue
    * aggregates per (cohort, age = period − cohort), and the running
    * cumulative gives each cohort's lifetime-value trajectory;
    * `ltv` = cumulative / cohort size. The retention triangle's
    * ([[retention]]) revenue sibling.
    *
    * Scale: the epoch-period arithmetic of [[retention]]; sums are
    * exact decimal; the only window is the age cumsum over the
    * (cohort, age) AGGREGATE (bounded by the calendar², never
    * events); cohort sizes broadcast back. Ages with zero revenue
    * simply don't appear (observed-age rows, not a dense grid).
    * Output: (cohort, age, users, cum_revenue, ltv).
    */
  def cohortLtv(
      events: DataFrame,
      user: Column,
      ts: Column,
      value: Column,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds must be >= 1, got $periodSeconds")
    val p = periodSeconds * 1000000L
    val base = events
      .filter(user.isNotNull && ts.isNotNull)
      .select(user.as("u"),
        floor(unix_micros(ts) / lit(p)).cast("long").as("per"),
        coalesce(value.cast("decimal(18,6)"), lit(0).cast("decimal(18,6)")).as("v"))
    val cohorts = base.groupBy(col("u")).agg(min(col("per")).as("cohort"))
    val sized = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("users"))
      .select(col("cohort").as("sc"), col("users"))
    val rev = base.join(cohorts, Seq("u"))
      .groupBy(col("cohort"), (col("per") - col("cohort")).as("age"))
      .agg(sum(col("v")).as("rev"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum", sum(col("rev")).over(w))
      .join(sized, col("cohort") === col("sc"))
      .select(col("cohort"), col("age"), col("users"),
        col("cum").cast("double").as("cum_revenue"),
        (col("cum").cast("double") / col("users").cast("double")).as("ltv"))
  }

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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern primitives over per-entity ordered event
  * streams — the counting core of PrefixSpan-style mining and of
  * "what do users do next" product analytics, kept to the exact,
  * SQL-replayable fragment: consecutive n-gram support counting.
  */
object Sequences {

  /** Consecutive event BIGRAMS per entity: for every entity's events
    * in `orderBy` order, the (event, next event) pairs, aggregated to
    * (first_event, next_event, occurrences, n_entities). `orderBy`
    * must be a DETERMINISTIC total order within an entity (pass a
    * tiebreaker column — e.g. (ts, event_id) — or ties make `lead`
    * engine-dependent and the result unreplayable).
    *
    * Scale: ONE window partitioned by entity (each entity's events
    * sort within its own partition — no global order, no single
    * reducer) and one map-side-combined pair aggregation;
    * `n_entities` is an exact distinct count keyed by the pair.
    * Null events or entities fail loudly — a silent null pair would
    * undercount support invisibly.
    */
  def eventBigrams(
      df: DataFrame,
      entity: Column,
      orderBy: Seq[Column],
      event: Column): DataFrame = {
    require(orderBy.nonEmpty, "eventBigrams: empty order — pass (ts, tiebreak)")
    def guarded(c: Column, what: String) =
      when(c.isNull, raise_error(lit(s"eventBigrams: null $what"))).otherwise(c)
    val w = Window.partitionBy(col("__ent")).orderBy(orderBy: _*)
    df.select(Seq(
        guarded(entity, "entity").as("__ent"),
        guarded(event, "event").as("first_event")) ++ orderBy: _*)
      .withColumn("next_event", lead(col("first_event"), 1).over(w))
      .filter(col("next_event").isNotNull)
      .groupBy(col("first_event"), col("next_event"))
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("__ent")).as("n_entities"))
  }

  /** GAP-CONSTRAINED SEQUENTIAL PAIRS — the PrefixSpan-style "a then
    * b within the next `maxGap` events" support counter (skip-grams
    * over behavior, where [[eventBigrams]] counts only ADJACENT
    * pairs): for every entity and every event, each of the ≤ maxGap
    * FOLLOWING events forms an ordered (first_event, later_event,
    * gap) occurrence; support aggregates occurrences and distinct
    * entities per (pair, gap) — the input to "users who view X
    * purchase Y within 3 actions" mining.
    *
    * Scale: ONE window partitioned by entity (in-entity sort only)
    * feeding a fixed maxGap-wide `lead` fan-out — per-row expansion
    * is the CONSTANT maxGap, never the entity's history length — then
    * one map-side-combined aggregation. Exact integers — hash-exact.
    * Null events/entities fail loudly (the [[eventBigrams]]
    * contract).
    */
  def gapPairs(
      df: DataFrame,
      entity: Column,
      orderBy: Seq[Column],
      event: Column,
      maxGap: Int): DataFrame = {
    require(orderBy.nonEmpty, "gapPairs: empty order — pass (ts, tiebreak)")
    require(maxGap >= 1 && maxGap <= 100,
      s"maxGap must be in [1, 100] — it multiplies every row, got $maxGap")
    def guarded(c: Column, what: String) =
      when(c.isNull, raise_error(lit(s"gapPairs: null $what"))).otherwise(c)
    val w = Window.partitionBy(col("__ent")).orderBy(orderBy: _*)
    // leads materialize as plain columns FIRST — Spark rejects window
    // functions inside a generator, so the explode consumes them
    df.select(Seq(
        guarded(entity, "entity").as("__ent"),
        guarded(event, "event").as("first_event")) ++ orderBy: _*)
      .select(col("__ent") +: col("first_event") +:
        (1 to maxGap).map(g =>
          lead(col("first_event"), g).over(w).as(s"__l$g")): _*)
      .select(col("__ent"), col("first_event"),
        explode(array((1 to maxGap).map(g =>
          struct(lit(g.toLong).as("gap"),
            col(s"__l$g").as("later_event"))): _*)).as("l"))
      .filter(col("l.later_event").isNotNull)
      .groupBy(col("first_event"), col("l.later_event").as("later_event"),
        col("l.gap").as("gap"))
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("__ent")).as("n_entities"))
  }
}

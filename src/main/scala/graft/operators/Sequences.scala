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
}

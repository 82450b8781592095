package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXPECTATION-SUITE AUDIT — the declarative data-quality gate
  * (null-rate, range, format, cross-field rules) evaluated in ONE
  * scan: every rule is a boolean Column, the audit is a single
  * map-side-combined aggregation counting violations per rule, and
  * the output is one row per rule at any input size. A 50-rule suite
  * over 100 TB costs exactly one pass — rules never become one job
  * each (the naive great-expectations deployment mistake).
  *
  * Null semantics are explicit: a rule predicate that evaluates to
  * NULL (e.g. `col > 0` on a null cell) counts as a VIOLATION —
  * unknown is not a pass. Rules whose intent is "may be null" say so
  * (`isNull || pred`).
  */
object Expectations {

  /** `rules`: (rule_name, predicate that must hold). Output:
    * (rule, n_rows, n_violations, violation_rate) — the rate is one
    * exact integer division in double.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "Expectations.audit: no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      s"Expectations.audit: duplicate rule names in ${rules.map(_._1)}")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      rules.zipWithIndex.map { case ((_, pred), i) =>
        // NULL predicate = violation: coalesce(pred, false)
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"_v_$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val packed = array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"_v_$i").as("n_violations"))
    }: _*)
    wide.select(col("n_rows"), explode(packed).as("p"))
      .select(
        col("p.rule").as("rule"), col("n_rows"),
        col("p.n_violations").as("n_violations"),
        (col("p.n_violations").cast("double") / col("n_rows"))
          .as("violation_rate"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Materialize a DataFrame ONCE, hash-partitioned on the given keys,
  * with the partitioning VISIBLE to the planner afterwards — so every
  * downstream equi-join/aggregation clustered on those keys plans
  * without another exchange over the materialized data.
  *
  * Why the AQE toggle: `Dataset.localCheckpoint` captures the physical
  * plan's `outputPartitioning` into the resulting `LogicalRDD`, but
  * under adaptive execution the captured plan is an
  * `AdaptiveSparkPlanExec` whose declared partitioning is
  * `UnknownPartitioning` — the information is simply dropped (measured
  * on this Spark build: the same repartition+checkpoint reports
  * `hashpartitioning(u, N)` with AQE off and `UnknownPartitioning(0)`
  * with it on, and a subsequent self-join plans 0 vs 2 exchanges).
  * The toggle only affects the planning of the checkpoint
  * materialization itself — downstream queries still run under
  * whatever AQE setting the session has. Sessions here run queries
  * sequentially (Verify/Bench/Stress/tests), so the temporary session
  * flip cannot race another query's planning.
  */
object PartitionedCheckpoint {

  /** `df` repartitioned by `keys`, eagerly local-checkpointed, with
    * `HashPartitioning(keys)` preserved in the checkpoint's plan node.
    *
    * Two-step on purpose: `df` itself is first materialized under the
    * session's normal AQE setting (so e.g. its joins still get
    * runtime broadcast conversion — turning AQE off for an arbitrary
    * upstream plan measurably regressed the triangle pipeline's
    * orientation joins), and only the cheap scan→shuffle→checkpoint of
    * the already-materialized rows runs inside the AQE-off window that
    * makes the partitioning capturable.
    */
  def byKeys(df: DataFrame, keys: Column*): DataFrame =
    byKeysN(df, 0, keys: _*)

  /** [[byKeys]] with an explicit partition count (0 = the session's
    * `spark.sql.shuffle.partitions`). Downstream work per key group is
    * often superlinear (self-join fan-out), so a finer grain than the
    * session default evens out stragglers that AQE — blind here, the
    * join plans WITHOUT a shuffle to adapt — can no longer fix.
    */
  def byKeysN(df: DataFrame, numPartitions: Int, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val staged = df.localCheckpoint(true)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey, "true")
    spark.conf.set(aqeKey, "false")
    try {
      val parted =
        if (numPartitions > 0) staged.repartition(numPartitions, keys: _*)
        else staged.repartition(keys: _*)
      parted.localCheckpoint(true)
    } finally {
      spark.conf.set(aqeKey, prev)
      // the staging blocks are dead the moment the partitioned copy
      // exists — free them now instead of waiting for the cleaner
      staged.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
  }

}

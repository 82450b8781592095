package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Structural 100-TB red-flag classification over physical plans —
  * the shared engine behind the catalog-wide [[PlanAudit]] sweep and
  * the `PlanGuardSpec` gate. Three flags, each STRUCTURAL (proved on
  * the plan tree, not prose):
  *
  *  - `cartesian`: any `CartesianProductExec` — never acceptable.
  *  - `unbounded single-partition exchange`: a shuffle to ONE
  *    partition whose input is not provably bounded — the classic
  *    driver-shaped bottleneck. A single-partition exchange fed by a
  *    partial aggregate (the global-agg pattern: rows ≤ #partitions),
  *    a limit, or another bounded frame is FINE and not flagged.
  *  - `unbounded global window`: a `WindowExec`/`WindowGroupLimitExec`
  *    with an EMPTY partition spec whose input is not provably
  *    bounded. Every such window funnels its whole input through one
  *    task; it is only acceptable over a post-aggregation frame
  *    (distinct duration axis, vocabulary, bucket table — cardinality
  *    fixed by the domain, not the corpus).
  *
  * "Provably bounded" is a recursive proof over the tree: a subtree
  * is bounded iff EVERY leaf-to-root path inside it passes through an
  * aggregate (`BaseAggregateExec` — grouped output is
  * key-cardinality-sized), a limit (`GlobalLimitExec`/
  * `CollectLimitExec`/`TakeOrderedAndProjectExec`), a
  * `LocalTableScanExec` (driver-literal), or bottoms out at an
  * `RDDScanExec` over a frame this engine locally checkpointed AFTER
  * aggregating (see below). Joins/unions of bounded inputs stay
  * bounded (key-cardinality products, not corpus-sized); any raw
  * parquet scan reaching the flagged operator un-aggregated fails the
  * proof. Adaptive wrappers (`AdaptiveSparkPlanExec`,
  * `QueryStageExec`, `ReusedExchangeExec`, `InMemoryTableScanExec`)
  * are transparent.
  *
  * Checkpoint opacity: `localCheckpoint(true)` truncates lineage, so
  * a checkpointed aggregate re-enters the plan as a bare
  * `RDDScanExec` and the structural proof cannot see the aggregate
  * that bounded it. Rather than allowlisting queries (rot-prone), the
  * engine marks boundedness AT THE CHECKPOINT SITE:
  * [[graft.operators.PartitionedCheckpoint.boundedCheckpoint]] tags
  * the RDD's name, and the proof accepts an `RDDScanExec` only when
  * its RDD carries the tag. An untagged checkpoint feeding a global
  * window is flagged — tagging is a reviewed, grep-able claim next to
  * the aggregation that justifies it.
  */
object PlanGuard {

  /** Marker carried in an RDD name by `boundedCheckpoint`: the frame
    * was aggregated/bounded immediately before checkpointing.
    */
  val BoundedTag = "graft.bounded"

  final case class Finding(kind: String, detail: String)

  final case class Audit(
      cartesians: Int,
      singlePartExchanges: Int,
      unboundedSinglePart: Int,
      windows: Int,
      globalWindows: Int,
      unboundedGlobalWindows: Int,
      findings: Seq[Finding])

  /** The final plan under adaptive execution (initial plan when the
    * query has not run yet — window/aggregate STRUCTURE is identical;
    * AQE only re-plans exchanges and join strategies).
    */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: QueryStageExec => unwrap(q.plan)
    case r: ReusedExchangeExec => unwrap(r.child)
    case other => other
  }

  /** Every node in the plan, descending through adaptive wrappers,
    * cached relations, and (for completeness of flag counting)
    * subquery plans.
    */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val here = unwrap(p)
    val kids = here match {
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case other => other.children
    }
    here +: (kids ++ here.subqueries).flatMap(flatten)
  }

  /** Is this subtree provably bounded (cardinality fixed by keys /
    * limits / literals, not by corpus size)?
    */
  def bounded(p: SparkPlan): Boolean = unwrap(p) match {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec | _: LocalTableScanExec => true
    case s: InMemoryTableScanExec => bounded(s.relation.cachedPlan)
    case r: RDDScanExec =>
      // lineage-truncated checkpoint: bounded iff the producing site
      // tagged it (boundedCheckpoint) — the one reviewed escape hatch
      Option(r.rdd.name).exists(_.contains(BoundedTag))
    case l: LeafExecNode => false
    case other => other.children.nonEmpty && other.children.forall(bounded)
  }

  def audit(df: DataFrame): Audit = {
    val nodes = flatten(df.queryExecution.executedPlan)
    val findings = Vector.newBuilder[Finding]
    var cart = 0
    var spe = 0
    var speUnbounded = 0
    var win = 0
    var gwin = 0
    var gwinUnbounded = 0
    nodes.foreach {
      case c: CartesianProductExec =>
        cart += 1
        findings += Finding("cartesian", c.simpleStringWithNodeId())
      case e: ShuffleExchangeLike if e.outputPartitioning == SinglePartition =>
        spe += 1
        if (!bounded(e.children.head)) {
          speUnbounded += 1
          findings += Finding("unbounded-single-partition-exchange",
            e.simpleStringWithNodeId())
        }
      case w: WindowExec =>
        win += 1
        if (w.partitionSpec.isEmpty) {
          gwin += 1
          if (!bounded(w.child)) {
            gwinUnbounded += 1
            findings += Finding("unbounded-global-window",
              w.simpleStringWithNodeId())
          }
        }
      case w: WindowGroupLimitExec =>
        win += 1
        if (w.partitionSpec.isEmpty) {
          gwin += 1
          if (!bounded(w.child)) {
            gwinUnbounded += 1
            findings += Finding("unbounded-global-window",
              w.simpleStringWithNodeId())
          }
        }
      case _ =>
    }
    Audit(cart, spe, speUnbounded, win, gwin, gwinUnbounded, findings.result())
  }
}

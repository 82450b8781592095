package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark-idiomatic library entry point: registers every graft_* native
  * function through the public extensions hook, so SQL-only users get
  * them session-wide with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder) — no
  * Scala API call required. The Scala `Column` API
  * ([[graft.functions.GraftFunctions]]) self-registers lazily and
  * remains usable without this class; both paths share one registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

    // every injection derives from GraftFunctions.specs — ONE table for
    // both registration paths, so this list can never drift from the
    // lazy Column-API registry again (it once silently omitted
    // graft_nearest_centroids)
    graft.functions.GraftFunctions.specs.foreach { s =>
      ext.injectFunction((
        FunctionIdentifier(s.name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, s.name, s.usage, ""),
        s.builder))
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes TRAINING as pure count algebra — the
  * classic high-throughput text classifier (language ID, topic
  * routing, quality gating) whose model is nothing but smoothed
  * count ratios, which makes it the rare ML operator a SQL oracle can
  * hash-match EXACTLY: every emitted probability is one correctly-
  * rounded division of two exact integers ((cnt+1)/(class_tokens+V),
  * n_docs_class/n_docs), so no tolerance is needed anywhere.
  *
  * Vocabulary is min-count pruned (`minCount`) — the standard NB
  * vocab floor — which also keeps the model table bounded without a
  * per-class top-k (no windows, no single-reducer ranking; the filter
  * is map-side). Laplace smoothing uses the UNPRUNED vocabulary size
  * V (smoothing mass is defined over the event space, not over what
  * survived pruning).
  *
  * Scale: one (class, token) count aggregation (map-side combined,
  * keyed shuffle), one tiny per-class totals frame and one tiny
  * per-class doc-count frame (both broadcast back), and ONE scalar
  * vocabulary count collected to the driver (a single long — bounded
  * by definition). Null labels fail loudly; empty token lists simply
  * contribute nothing.
  */
object NaiveBayes {

  def trainMultinomial(
      df: DataFrame,
      text: Column,
      label: Column,
      minCount: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // null-label guard rides a PAYLOAD column, not the grouping key —
    // wrapping the key itself in when(raise_error…) would make it a
    // computed expression and break hash-partitioning reuse (the q108
    // lesson); the guard aggregate below forces its evaluation
    val base = df.select(
      label.as("class"),
      when(label.isNull, raise_error(lit("trainMultinomial: null class label")))
        .otherwise(lit(1L)).as("__guard"),
      TextAnalysis.tokens(text).as("__toks"))
    // n_docs_class IS sum(__guard) — 1 per valid row, raise on null —
    // so the guard cannot be pruned away as an unused aggregate
    // Materialize the two count pivots ONCE: class totals, the
    // vocabulary count, the doc-count rollup, and the final join all
    // derive from them — without the checkpoint each consumer
    // re-scans (and re-tokenizes) the full corpus, turning a
    // two-scan training pass into five (observed in the executed
    // plan). Both pivots are model-sized (classes × vocab), not
    // corpus-sized.
    val docCounts = base.groupBy(col("class"))
      .agg(sum(col("__guard")).as("n_docs_class"))
      .localCheckpoint(true)
    val nDocs = docCounts.agg(sum(col("n_docs_class")).as("__nd"))
    val tokenCounts = base
      .select(col("class"), explode(col("__toks")).as("token"))
      .groupBy(col("class"), col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // V = unpruned vocabulary size: one scalar to the driver, bounded
    val v = tokenCounts.select(col("token")).distinct().count()
    val classTotals = tokenCounts.groupBy(col("class"))
      .agg(sum(col("cnt")).as("class_tokens"))
    tokenCounts
      .filter(col("cnt") >= minCount)
      .join(broadcast(classTotals), Seq("class"))
      .join(broadcast(docCounts), Seq("class"))
      .crossJoin(broadcast(nDocs))
      .select(
        col("class"), col("token"), col("cnt"),
        ((col("cnt") + lit(1L)).cast("double") /
          (col("class_tokens") + lit(v)).cast("double")).as("p_smoothed"),
        col("n_docs_class"),
        (col("n_docs_class").cast("double") / col("__nd").cast("double")).as("prior"))
  }
}

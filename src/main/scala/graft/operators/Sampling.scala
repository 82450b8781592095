package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing.
  *
  * The 100 TB story: sampling is a pure map-side FILTER on a content
  * hash — no RNG (a re-executed task must keep the same rows), no
  * shuffle, append-stable (a row's fate never depends on what else is
  * in the corpus), reproducible across engines (md5 buckets, the same
  * portability trick as [[Dedup.splitAssign]]).
  */
object Sampling {

  /** Keep-predicate for PER-STRATUM rate sampling (data-mixing weights:
    * e.g. downsample an overrepresented language to 30% while keeping
    * 100% of a rare one). A row survives iff its content-hash bucket
    * (first 8 md5 hex chars mod 100 — a 32-bit bucket, so the mod-100
    * bias is < 10⁻⁸, vs ~0.15% for the 16-bit bucket this replaces)
    * falls below its stratum's percentage; strata missing from `rates`
    * use `defaultRate`.
    *
    * Hash on a CONTENT column (not a sequential id) so survival is
    * stable under re-ingestion and id reassignment. `hashOn` must be a
    * STRING column: the binary cast that feeds md5 resolves only for
    * strings — a numeric column fails analysis rather than hashing an
    * engine-private byte layout that no oracle could reproduce.
    */
  def stratifiedKeep(
      stratum: Column,
      hashOn: Column,
      rates: Map[String, Int],
      defaultRate: Int): Column = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 100, s"sampling rates are percentages in [0,100], got $r"))
    val bucket =
      conv(substring(md5(hashOn.cast("binary")), 1, 8), 16, 10).cast("long") % 100
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    bucket < rate
  }

  /** Cap each stratum (source/domain) at a TOKEN budget, keeping its
    * best documents first — the data-mixing step that turns "40% web,
    * 30% books…" recipes into concrete row sets. Rows are ranked inside
    * their stratum by (`quality` desc, `id` asc — fully deterministic)
    * and kept while the BUDGET-INCLUSIVE running token total stays
    * within `tokenBudget` (the first document that crosses the budget
    * is kept; subsequent ones drop — so a stratum whose single best doc
    * exceeds the budget still contributes it rather than vanishing).
    *
    * One hash-partitioned window per stratum — a shuffle on the stratum
    * key, nothing else; skewed strata salt like any hot groupBy key.
    */
  def tokenBudgetCap(
      df: org.apache.spark.sql.DataFrame,
      stratum: Column,
      tokens: Column,
      quality: Column,
      id: Column,
      tokenBudget: Long): org.apache.spark.sql.DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(quality.desc, id.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // collision-proof scratch name: a fixed "__cum_tokens" would
    // silently clobber (and then drop) a caller's column of that name
    val cum = "__cum_tokens_" + java.util.UUID.randomUUID().toString.replace("-", "")
    df.withColumn(cum, sum(tokens).over(w))
      .filter(col(cum) - tokens < tokenBudget)
      .drop(cum)
  }
}

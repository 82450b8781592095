package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR — Xie et al.,
  * NeurIPS 2023): score every corpus document by how much more likely
  * its hashed n-gram features are under a TARGET distribution (the
  * high-quality slice you want more of) than under the RAW corpus
  * distribution —
  *
  *   log w(d) = Σ_f∈features(d) [ ln p̂_tgt(bucket(f)) − ln p̂_raw(bucket(f)) ]
  *
  * with word unigram + bigram features folded into `buckets` hashed
  * buckets (the paper's hashed n-gram estimator) and add-1 smoothing,
  * so every bucket has nonzero mass under both distributions and the
  * weight is total. Selecting top-w(d) (or Gumbel-resampling by w)
  * shifts the corpus toward the target domain without a trained
  * classifier — the published alternative to q63's fastText-shaped
  * scorer, and the importance-weight companion to q61/q103's
  * perplexity filtering.
  *
  * Scale shape: both distributions are ONE partial-aggregable
  * `buckets`-bounded count pass (the feature hash folds the unbounded
  * n-gram space to `buckets` groups BEFORE the shuffle); the two
  * bucket tables collapse into a single `buckets`-sized log-ratio
  * array literal (the q61/q63 bounded-collect precedent — `buckets` ≤
  * a few thousand by construction, independent of corpus size), and
  * scoring is a map-side position-ordered fold over each document's
  * features: the corpus shuffles ZERO times end to end.
  *
  * Determinism: buckets come from the portable md5 prefix (`pmod
  * (conv(substring(md5(f),1,8),16,10), buckets)` — the q63 hashed-
  * feature convention), counts are exact longs, and the only
  * non-portable step is `ln` — so the DuckDB oracle recomputes every
  * weight independently and admits rows within 1e-9 (the q57/q61
  * tolerance pattern).
  */
object Importance {

  /** Word unigram + adjacent-bigram feature list of a token array —
    * bigrams joined with '_', which cannot appear inside a token
    * (tokens are lowercase alphanumeric) - so bigram features never
    * collide with unigrams or differently-split bigrams. Empty token
    * arrays yield empty feature lists (log-weight 0: no evidence either way).
    */
  private[operators] def features(toks: Column): Column = concat(
    toks,
    when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws("_", a, b)))
      .otherwise(array()))

  private def bucketOf(f: Column, buckets: Int): Column =
    pmod(conv(substring(md5(f), 1, 8), 16, 10).cast("long"), lit(buckets.toLong)).cast("int")

  /** Per-document DSIR log importance weights.
    *
    * @param corpus  raw corpus (defines p̂_raw AND the scored rows)
    * @param target  the target-domain slice (defines p̂_tgt); typically
    *                a filter of the corpus or an external exemplar set
    * @param id      non-null integral document id
    * @param toks    token-array column (both frames, same tokenizer)
    * @param buckets hashed feature space size (≥ 2; the paper uses 10⁴)
    * @return (doc_id, n_feats, log_weight) — one row per corpus doc
    */
  def dsirLogWeights(
      corpus: DataFrame,
      target: DataFrame,
      id: Column,
      toks: Column,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "dsirLogWeights: id is null or not castable to long"))).otherwise(id.cast("long"))

    def bucketCounts(df: DataFrame): Array[Long] = {
      val rows = df
        .select(explode(features(coalesce(toks, array()))).as("f"))
        .select(bucketOf(col("f"), buckets).as("b"))
        .groupBy("b").count()
        .collect()
      val out = new Array[Long](buckets)
      rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
      out
    }

    val tgt = bucketCounts(target)
    val raw = bucketCounts(corpus)
    val tgtTotal = tgt.sum.toDouble + buckets
    val rawTotal = raw.sum.toDouble + buckets
    // ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)), one double per bucket,
    // computed once on the driver and shipped as a literal array —
    // executors do array indexing + adds only
    val logRatio = Array.tabulate(buckets) { b =>
      math.log((tgt(b) + 1.0) / tgtTotal) - math.log((raw(b) + 1.0) / rawTotal)
    }
    val ratioLit = array(logRatio.map(lit(_)): _*)

    corpus
      .select(guardedId.as("doc_id"), features(coalesce(toks, array())).as("fs"))
      .select(
        col("doc_id"),
        size(col("fs")).cast("long").as("n_feats"),
        aggregate(col("fs"), lit(0.0),
          (acc, f) => acc + element_at(ratioLit, bucketOf(f, buckets) + 1))
          .as("log_weight"))
  }
}

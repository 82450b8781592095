package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-itemset mining at the pair level: association rules
  * (support / confidence / lift) over a basket-item fact table — the
  * classic market-basket co-occurrence analysis, shaped for scale.
  *
  * Scale contract: baskets in real fact tables are BOUNDED (a retail
  * order has tens of lines, not millions), so the pair expansion is a
  * self-join co-partitioned on the basket id — one shuffle of the
  * deduped item list, pair cardinality ≤ |basket|²/2 per basket,
  * linear in basket count overall. Item marginals are a tiny
  * aggregate broadcast back onto the rules, so the only wide exchange
  * in the whole plan is the (pair → count) aggregation.
  */
object MarketBasket {

  /** Pairwise association rules A→B over `(basket, item)` rows.
    *
    * Returns one row per ordered rule direction with exact integer
    * counts and the standard derived metrics:
    *   support    = pair_n / n_baskets
    *   confidence = pair_n / ante_n
    *   lift       = confidence / (cons_n / n_baskets)
    * Metrics are computed as single IEEE divisions of exact integer
    * counts in a pinned operation order, so an engine replaying the
    * same counts reproduces the same doubles bit-for-bit.
    *
    * Null baskets/items drop (a null line can't evidence
    * co-occurrence); duplicate (basket, item) rows count once.
    * `minPairCount` prunes BEFORE the marginal join — at scale the
    * long tail of singleton pairs is the bulk of the pair table, and
    * dropping it early keeps the rule table broadcast-joinable.
    */
  def associationRules(
      items: DataFrame,
      basket: Column,
      item: Column,
      minPairCount: Long = 2L,
      minConfidence: Double = 0.0): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    require(minConfidence >= 0.0 && minConfidence <= 1.0,
      s"minConfidence must be in [0,1], got $minConfidence")
    // materialize the deduped item list ONCE, hash-partitioned by
    // basket: four consumers (both self-join sides, marginals, basket
    // count) would otherwise each recompute the distinct from the base
    // scan (no exchange reuse across aliases), and the declared
    // HashPartitioning(b) lets the pair self-join below plan with ZERO
    // exchanges over the materialized rows (the triangle-pipeline
    // checkpoint geometry)
    val it = PartitionedCheckpoint.byKeys(
      items
        .filter(basket.isNotNull && item.isNotNull)
        .select(basket.as("b"), item.cast("string").as("i"))
        .distinct(),
      col("b"))
    // marginals + universe size: |items| distinct item values — tiny
    val marginals = it.groupBy(col("i")).agg(count(lit(1)).as("item_n"))
    val nBaskets = it.select(col("b")).distinct().count()
    require(nBaskets > 0, "associationRules: no non-null baskets")
    // pair expansion co-partitioned on basket id; i < j canonicalizes.
    // shuffle-hash, not sort-merge: both sides already carry the
    // checkpoint's HashPartitioning(b), so the hash join runs with
    // zero exchanges AND zero sorts (SMJ would in-partition-sort both
    // 600k-row sides just to merge them)
    val pairs = it.as("l").join(it.as("r").hint("shuffle_hash"),
        col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("ia"), col("r.i").as("ib"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    // both rule directions from the canonical pair table
    val directed = pairs
      .select(col("ia").as("antecedent"), col("ib").as("consequent"), col("pair_n"))
      .unionByName(pairs
        .select(col("ib").as("antecedent"), col("ia").as("consequent"), col("pair_n")))
    val withMarg = directed
      .join(broadcast(marginals.withColumnRenamed("i", "antecedent")
        .withColumnRenamed("item_n", "ante_n")), Seq("antecedent"))
      .join(broadcast(marginals.withColumnRenamed("i", "consequent")
        .withColumnRenamed("item_n", "cons_n")), Seq("consequent"))
    val confidence = col("pair_n").cast("double") / col("ante_n").cast("double")
    withMarg
      .withColumn("support", col("pair_n").cast("double") / lit(nBaskets).cast("double"))
      .withColumn("confidence", confidence)
      .withColumn("lift",
        confidence / (col("cons_n").cast("double") / lit(nBaskets).cast("double")))
      .filter(col("confidence") >= minConfidence)
      .select("antecedent", "consequent", "pair_n", "ante_n", "cons_n",
        "support", "confidence", "lift")
  }
}

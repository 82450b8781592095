package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering over an implicit-feedback
  * interaction table: cosine similarity between items on the binary
  * user-item matrix, top-k neighbors per item — the classic
  * neighborhood recommender, shaped like [[MarketBasket]] (the
  * co-occurrence self-join co-partitioned on user) but scored by the
  * cosine kernel and ranked per item.
  *
  * Determinism: co-occurrence and marginal counts are exact integers;
  * cosine = co / (sqrt(na) * sqrt(nb)) is three correctly-rounded
  * IEEE ops in pinned order, so an oracle replaying the counts
  * reproduces the doubles bit-for-bit; the top-k rank breaks score
  * ties on the neighbor id.
  *
  * Scale: the pair fan-out is Σ_user |items(user)|² — bounded for
  * organic baskets but quadratic in a crawler/bot user. `maxItemsPerUser`
  * caps it: each user keeps at most that many items, selected by the
  * PORTABLE 60-bit md5 hash of (user, item) (ties on item id), so the
  * truncation is deterministic, engine-replayable, and unbiased —
  * the [[Sampling]] content-hash convention, not an RNG.
  */
object Cf {

  /** Top-k cosine neighbors per item: (item, neighbor, rank, co_n,
    * item_n, nbr_n, cosine). Null users/items drop; duplicate
    * interactions count once. Pairs below `minCo` are pruned before
    * the marginal join (the long tail IS the pair table at scale).
    */
  def itemCosineTopK(
      interactions: DataFrame,
      user: Column,
      item: Column,
      k: Int,
      minCo: Long = 2L,
      maxItemsPerUser: Int = Int.MaxValue): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCo >= 1, s"minCo must be >= 1, got $minCo")
    require(maxItemsPerUser >= 1, s"maxItemsPerUser must be >= 1, got $maxItemsPerUser")
    val distinctIt = interactions
      .filter(user.isNotNull && item.isNotNull)
      .select(user.cast("string").as("u"), item.cast("string").as("i"))
      .distinct()
    // materialized once -- three consumers (both self-join sides and
    // the marginals) would otherwise recompute the distinct/cap from
    // the base scan (the [[MarketBasket]] plan finding)
    val it = (if (maxItemsPerUser == Int.MaxValue) distinctIt
    else {
      val w = Window.partitionBy(col("u"))
        .orderBy(KmvSketch.hash60(concat_ws("", col("u"), col("i"))), col("i"))
      distinctIt.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxItemsPerUser).drop("__rn")
    }).localCheckpoint(true)
    val marginals = it.groupBy(col("i")).agg(count(lit(1)).as("item_n"))
    val pairs = it.as("l").join(it.as("r"),
        col("l.u") === col("r.u") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("ia"), col("r.i").as("ib"))
      .agg(count(lit(1)).as("co_n"))
      .filter(col("co_n") >= minCo)
    val directed = pairs
      .select(col("ia").as("item"), col("ib").as("neighbor"), col("co_n"))
      .unionByName(pairs
        .select(col("ib").as("item"), col("ia").as("neighbor"), col("co_n")))
    val scored = directed
      .join(broadcast(marginals.withColumnRenamed("i", "item")), Seq("item"))
      .join(broadcast(marginals.withColumnRenamed("i", "neighbor")
        .withColumnRenamed("item_n", "nbr_n")), Seq("neighbor"))
      .withColumn("cosine",
        col("co_n").cast("double") /
          (sqrt(col("item_n").cast("double")) * sqrt(col("nbr_n").cast("double"))))
    val rankW = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("item", "neighbor", "rank", "co_n", "item_n", "nbr_n", "cosine")
  }
}

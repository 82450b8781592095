package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RENDEZVOUS (highest-random-weight) HASHING — Thaler & Ravishankar
  * 1996: every key goes to the shard with the highest hash(key, shard),
  * so adding or removing a shard moves ONLY the keys that hashed
  * highest to it (1/n of the data), never a wholesale remap — the
  * minimal-movement placement primitive for sharding a 100 TB corpus
  * across storage nodes, cache tiers, or annotation workers (the
  * property modulo-hashing lacks: pmod(h, n−1) remaps ~all keys).
  *
  * The per-(key, shard) weight is the md5 hex of `key|shard` compared
  * LEXICOGRAPHICALLY — fixed 32 lowercase hex chars, so string order
  * equals numeric order and every engine re-derives identical
  * assignments (the portable-hash convention of the dedup stack). The
  * argmax is a per-row fold over the shard list (array_max of
  * (hex, shard) structs) — map-side only, no shuffle, no UDF.
  */
object Rendezvous {

  /** `df` plus a `shard` column: the rendezvous winner among `shards`
    * for each row's `key`. Null keys raise loudly (a silently
    * misplaced row is a data-loss bug at replication time).
    */
  def assign(
      df: DataFrame,
      key: Column,
      shards: Seq[String],
      shardCol: String = "shard"): DataFrame = {
    require(shards.nonEmpty, "rendezvous needs at least one shard")
    require(shards.distinct.size == shards.size,
      s"duplicate shard names: ${shards.diff(shards.distinct).mkString(", ")}")
    val kG = when(key.cast("string").isNull, raise_error(lit(
      "rendezvous: key is null or not castable to string")))
      .otherwise(key.cast("string"))
    val weighted = array(shards.map(s =>
      struct(
        md5(concat(kG, lit("|"), lit(s)).cast("binary")).as("w"),
        lit(s).as("s"))): _*)
    df.withColumn(shardCol, array_max(weighted).getField("s"))
  }
}

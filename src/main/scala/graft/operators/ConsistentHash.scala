package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CONSISTENT-HASHING RING placement — Karger et al. 1997 (the other
  * classic minimal-movement primitive beside [[Rendezvous]]): shards
  * own `vnodes` points on a hash ring; a key belongs to the first
  * vnode clockwise from its own hash (wrapping past the top). Removing
  * a shard moves ONLY the keys in its arcs (to each arc's successor);
  * virtual nodes smooth the arc-length variance that a single point
  * per shard would leave (the load-balance argument of the paper).
  * Rendezvous costs |shards| hashes per key with perfect balance;
  * the ring costs ONE key hash plus a lookup in a |shards|·vnodes
  * table — the trade that matters when the shard count is large.
  *
  * Portability: ring points are md5 hex of `shard#vnode`, key
  * positions md5 hex of the key — fixed 32 lowercase hex chars, so
  * LEXICOGRAPHIC order equals numeric order and any engine re-derives
  * identical placement (the [[Rendezvous]] convention). The ring is a
  * sorted LITERAL array (computed once at plan time with the same
  * md5); per row the successor scan is a map-side fold over
  * |shards|·vnodes entries — no shuffle, no join, no UDF.
  */
object ConsistentHash {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The sorted ring: (hex position, shard) for every virtual node. */
  def ring(shards: Seq[String], vnodes: Int): Seq[(String, String)] = {
    require(shards.nonEmpty, "consistent hashing needs at least one shard")
    require(shards.distinct.size == shards.size,
      s"duplicate shard names: ${shards.diff(shards.distinct).mkString(", ")}")
    require(vnodes >= 1 && vnodes <= 1024,
      s"vnodes must be in [1, 1024], got $vnodes")
    shards.flatMap(s => (0 until vnodes).map(v => md5Hex(s"$s#$v") -> s))
      .sortBy(identity)
  }

  /** `df` plus a `shard` column: the ring successor of each row's
    * `key`. Null keys raise loudly (the [[Rendezvous]] contract).
    */
  def assign(
      df: DataFrame,
      key: Column,
      shards: Seq[String],
      vnodes: Int = 16,
      shardCol: String = "shard"): DataFrame = {
    val r = ring(shards, vnodes)
    val kG = when(key.cast("string").isNull, raise_error(lit(
      "consistentHash: key is null or not castable to string")))
      .otherwise(key.cast("string"))
    val ringArr = array(r.map { case (h, s) =>
      struct(lit(h).as("h"), lit(s).as("s"))
    }: _*)
    val hk = md5(kG.cast("binary"))
    // first ring point at or past the key's position; wrap to the
    // ring's first point when the key hashes past the last vnode
    val ge = filter(ringArr, e => e.getField("h") >= hk)
    val pick = when(size(ge) > 0, element_at(ge, 1))
      .otherwise(element_at(ringArr, 1))
    df.withColumn(shardCol, pick.getField("s"))
  }
}

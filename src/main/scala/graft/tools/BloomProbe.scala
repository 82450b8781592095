package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnose the q162 bloom: filter size and empirical FP rate over
  * random non-member keys. Usage: runMain graft.tools.BloomProbe <sfDir>
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p")).distinct()
    val canon = it.as("l").join(it.as("r"),
        col("l.b") === col("r.b") && col("l.p") < col("r.p"))
      .select(col("l.p").as("a"), col("r.p").as("bb"))
      .distinct().localCheckpoint(true)
    val n = canon.count()
    println(s"edges: $n")
    val bytes = graft.operators.BloomJoin.buildKeyFilter(
      canon, xxhash64(col("a"), col("bb")))
    println(s"filter bytes: ${bytes.length}")
    // empirical FP: probe 10M sequential longs hashed (virtually none members)
    val probes = spark.range(10000000L)
      .select(xxhash64(col("id") + 999999999L).as("k"))
    val hits = probes.where(graft.functions.GraftFunctions.bloomContains(
      spark, col("k"), bytes)).count()
    println(f"random-probe FP rate: ${hits.toDouble / 1e7}%.4f")
    spark.stop()
  }
}

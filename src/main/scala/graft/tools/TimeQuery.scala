package graft.tools

import org.apache.spark.sql.SparkSession

/** Time arbitrary catalog queries at a given sf dir (warm run after a
  * warm-up pass). Usage: runMain graft.tools.TimeQuery <sfDir> <name>...
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // allow co-partition reuse when a side is hash-partitioned on a
      // SUBSET of the join keys (the partitioned-checkpoint pattern:
      // a build side materialized by its pivot joins with no exchange)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() // warm
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}

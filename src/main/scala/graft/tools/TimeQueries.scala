package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc per-query timing over any catalog subset — the diagnostic
  * the bench (fixed headline list) and verify (untimed) don't give:
  * `runMain graft.tools.TimeQueries <sfDir> <name-regex>` prints one
  * `name seconds rows` line per matching query, same session config
  * as the bench, checkpoint hygiene between queries.
  */
object TimeQueries {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <name-regex>")
    val sfDir = args(0)
    val re = args(1).r
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // allow co-partition reuse when a side is hash-partitioned on a
      // SUBSET of the join keys (the partitioned-checkpoint pattern:
      // a build side materialized by its pivot joins with no exchange)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => re.findFirstIn(n).isDefined)
    names.foreach { name =>
      val t0 = System.nanoTime()
      val rows =
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case t: Throwable =>
          System.err.println(s"[time] $name FAILED: ${t.getMessage}"); -1L
        }
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $rows rows")
      graft.Bench.freeLocalCheckpoints(spark)
    }
    spark.stop()
  }
}

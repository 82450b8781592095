package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of q384 join strategies at a given sf dir.
  * Variants (full 2-round pipeline, identical results, count() dumped):
  *   smj       — current shape (SortMergeJoin both rounds)
  *   shash     — prev side hinted shuffle_hash (no 12M-row sorts)
  *   bcast     — prev side broadcast (no adj exchange, no sorts)
  *   pin+shash — adj pinned by u via PartitionedCheckpoint + shuffle_hash
  * Usage: runMain graft.tools.NeighborhoodAB [sfDir] [reps]
  */
object NeighborhoodAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val k = 32

    def pipeline(variant: String): Long = {
      val e = graft.queries.Tables.lineitem(spark, sfDir).select(
        ($"l_suppkey" * 2).as("sa"), ($"l_partkey" * 2 + 1).as("pb"))
      val canon = e.filter($"sa" =!= $"pb")
        .select(least($"sa", $"pb").as("src"), greatest($"sa", $"pb").as("dst"))
        .distinct()
      val sym = canon.union(canon.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      val nodes = sym.select(col("src").as("v")).distinct()
      val adjBase = sym.select(col("src").as("w"), col("dst").as("u"))
        .union(nodes.select(col("v").as("w"), col("v").as("u")))
      val adj = variant match {
        case "pin+shash" =>
          graft.operators.PartitionedCheckpoint.byKeys(adjBase, col("u"))
        case "pinw+bcast" =>
          // pinned by the AGG key: broadcast join preserves the layout,
          // so each round's groupBy(w) runs with zero exchanges
          graft.operators.PartitionedCheckpoint.byKeys(adjBase, col("w"))
        case _ => adjBase.localCheckpoint(true)
      }
      val s0 = nodes
        .select(col("v"), array(graft.operators.KmvSketch.hash60(col("v"))).as("kmv"))
        .localCheckpoint(true)
      var cur = s0
      var total = 0L
      for (t <- 0 to 2) {
        if (t > 0) {
          val prevBase = cur.select(col("v").as("u"), col("kmv"))
          val prev = variant match {
            case "smj" => prevBase
            case "shash" | "pin+shash" => prevBase.hint("shuffle_hash")
            case "bcast" | "pinw+bcast" => broadcast(prevBase)
          }
          cur = graft.operators.KmvSketch
            .mergeStatesArrays(adj.join(prev, Seq("u")), Seq("w"), col("kmv"), k)
            .select(col("w").as("v"), col("kmv"))
            .localCheckpoint(true)
        }
        total += cur.select(col("v"), size(col("kmv"))).count()
      }
      total
    }

    val variants = Seq("smj", "bcast", "pinw+bcast")
    // warm all variants once at a smaller sf
    variants.foreach { v =>
      try pipeline(v)
      catch { case t: Throwable => println(s"warm $v failed: ${t.getMessage}") }
      graft.Bench.freeLocalCheckpoints(spark)
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; v <- variants) {
      val t0 = System.nanoTime()
      val n = pipeline(v)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.freeLocalCheckpoints(spark)
      times(v) = dt :: times.getOrElse(v, Nil)
      println(f"rep$r $v%-10s ${dt}%6.2f s (rows=$n)")
    }
    for (v <- variants) {
      val ts = times(v)
      println(f"$v%-10s min=${ts.min}%6.2f s all=${ts.reverse.map(t => f"$t%.1f").mkString("/")}")
    }
    spark.stop()
  }
}

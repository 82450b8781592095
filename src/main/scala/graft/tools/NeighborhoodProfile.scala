package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of q384's neighborhood function at a given sf
  * dir — symmetrize/canon, adjacency build, s0, and each round's
  * join + state-grain merge materialized separately, plus two
  * uninstrumented end-to-end runs for the real number and the final
  * round's adaptive plan. Usage:
  *   runMain graft.tools.NeighborhoodProfile [sfDir]
  */
object NeighborhoodProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to 2) {
      timed(s"full q384 rep$rep") {
        println("  rows: " + graft.SparkEntry.queries(
          "q384_neighborhood_function")(spark, sfDir).count())
      }
      graft.Bench.freeLocalCheckpoints(spark)
    }

    // staged replay of Graph.neighborhoodFunction's exact shape
    val k = 32
    val e = graft.queries.Tables.lineitem(spark, sfDir).select(
      ($"l_suppkey" * 2).as("sa"), ($"l_partkey" * 2 + 1).as("pb"))
    val sym = timed("symmetrize + canon distinct + ckpt") {
      // inline replay of Graph.symmetrized (private): canon distinct
      // on the a<b half, then mirror
      val canon = e.filter($"sa" =!= $"pb")
        .select(least($"sa", $"pb").as("src"), greatest($"sa", $"pb").as("dst"))
        .distinct()
      val s = canon.union(canon.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      println(s"  sym edges: ${s.count()}")
      s
    }
    val nodes = sym.select(col("src").as("v")).distinct()
    val adj = timed("adjacency + self-loops + ckpt") {
      val a = sym.select(col("src").as("w"), col("dst").as("u"))
        .union(nodes.select(col("v").as("w"), col("v").as("u")))
        .localCheckpoint(true)
      println(s"  adj rows: ${a.count()}")
      a
    }
    val s0 = timed("s0 singleton sketches + ckpt") {
      val s = nodes
        .select(col("v"), array(graft.operators.KmvSketch.hash60(col("v"))).as("kmv"))
        .localCheckpoint(true)
      println(s"  nodes: ${s.count()}")
      s
    }
    var cur = s0
    for (t <- 1 to 2) {
      cur = timed(s"round $t: join + state-grain merge + ckpt") {
        val prev = cur.select(col("v").as("u"), col("kmv"))
        val m = graft.operators.KmvSketch
          .mergeStatesArrays(adj.join(prev, Seq("u")), Seq("w"), col("kmv"), k)
          .select(col("w").as("v"), col("kmv"))
          .localCheckpoint(true)
        println(s"  states: ${m.count()}")
        m
      }
      if (t == 2) {
        println("=== round-2 adaptive plan ===")
        val prev = cur.select(col("v").as("u"), col("kmv"))
        graft.operators.KmvSketch
          .mergeStatesArrays(adj.join(prev, Seq("u")), Seq("w"), col("kmv"), k)
          .queryExecution.executedPlan.toString.linesIterator.take(40)
          .foreach(l => println("  " + l))
      }
    }
    spark.stop()
  }
}

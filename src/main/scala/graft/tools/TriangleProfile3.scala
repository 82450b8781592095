package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the CURRENT (round-12) triangle pipeline —
  * q162's edge build, orientation checkpoint, wedge join, bloom
  * pre-filter, close join, and final aggregation, each materialized
  * separately at sf1, plus one uninstrumented end-to-end run for the
  * real number. Usage: runMain graft.tools.TriangleProfile3 [sfDir]
  */
object TriangleProfile3 {
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

    // uninstrumented full query first (warm JIT), twice
    for (rep <- 1 to 2) {
      timed(s"full q162 rep$rep") {
        println("  rows: " + graft.SparkEntry.queries("q162_triangle_counts")(
          spark, sfDir).count())
      }
      graft.Bench.freeLocalCheckpoints(spark)
    }

    // staged replay of Graph.triangleCounts' exact shape
    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
      .distinct()
    timed("it distinct (count)")(println(s"  it rows: ${it.count()}"))
    val edges = it.as("l").join(it.as("r"),
        col("l.b") === col("r.b") && col("l.p") < col("r.p"))
      .select(col("l.p").as("x"), col("r.p").as("y"))
    val canon = timed("edge self-join + canon distinct + ckpt") {
      val c = edges
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct()
        .localCheckpoint(true)
      println(s"  canon edges: ${c.count()}")
      c
    }
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val aKey = struct(col("da").as("d"), col("a").as("n"))
    val bKey = struct(col("db").as("d"), col("b").as("n"))
    val fwd = aKey < bKey
    val oriented = timed("degree agg + orientation joins + partitioned ckpt") {
      val o = graft.operators.PartitionedCheckpoint.byKeys(
        canon
          .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
          .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
          .select(
            when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("db")).otherwise(col("da")).as("dv"),
            when(fwd, col("b")).otherwise(col("a")).as("v")),
        col("u"))
      println(s"  oriented: ${o.count()}")
      o
    }
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && (col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("pivot"), col("e1.v").as("v"), col("e2.v").as("w"))
    val candidates = timed("wedge join + bloom build + filter + ckpt") {
      val c = graft.operators.BloomJoin.blockedBloomPreFilter(
        wedges, oriented, xxhash64(col("v"), col("w")),
        xxhash64(col("u"), col("v")))
        .localCheckpoint(true)
      println(s"  candidates: ${c.count()}")
      c
    }
    val tri = timed("close join vs oriented") {
      val t = candidates.join(
          oriented.select(col("u").as("cv"), col("v").as("cw")).hint("shuffle_hash"),
          col("v") === col("cv") && col("w") === col("cw"))
        .select(col("pivot"), col("v"), col("w"))
        .localCheckpoint(true)
      println(s"  triangles: ${t.count()}")
      t
    }
    timed("final count agg") {
      val n = tri
        .select(explode(array(col("pivot"), col("v"), col("w"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri_n")).count()
      println(s"  nodes: $n")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the ROUND-11 triangle pipeline (oriented set
  * checkpointed hash-partitioned by pivot, close join probing the
  * oriented set). Usage: runMain graft.tools.TriangleProfile2 <sfDir>
  */
object TriangleProfile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
      .distinct()
    val edges = it.as("l").join(it.as("r"),
        col("l.b") === col("r.b") && col("l.p") < col("r.p"))
      .select(col("l.p").as("x"), col("r.p").as("y"))
    val canon = edges
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint(true)
    timed("edge build + canon distinct")(println(s"  edges: ${canon.count()}"))
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val aKey = struct(col("da").as("d"), col("a").as("n"))
    val bKey = struct(col("db").as("d"), col("b").as("n"))
    val fwd = aKey < bKey
    val oriented = timed("orientation joins + partitioned ckpt") {
      val o = graft.operators.PartitionedCheckpoint.byKeys(
        canon
          .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
          .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
          .select(
            when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, bKey).otherwise(aKey).as("vkey"),
            when(fwd, col("b")).otherwise(col("a")).as("v")),
        col("u"))
      println(s"  oriented: ${o.count()}")
      o
    }
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.vkey") < col("e2.vkey"))
      .select(col("e1.u").as("pivot"), col("e1.v").as("v"), col("e2.v").as("w"))
    val candidates = timed("wedges + bloom build + filter (fused)") {
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

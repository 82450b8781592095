package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the CURRENT (round-13 kernel) triangle
  * pipeline at an arbitrary scale factor — the round-13 verdict's
  * q162 sf0.1 adjudication tool. Unlike [[TriangleProfile3]] (which
  * replays the old wedge SELF-JOIN), this replays the shipping shape:
  * canon distinct, degree+orientation joins + partitioned checkpoint,
  * bloom build, neighbor-list agg + [[graft.functions.WedgeCandidates]]
  * kernel, shuffle-hash close join, final count agg. Each stage is
  * materialized separately (min over `SPARK_GRAFT_TP_REPS` reps,
  * default 3), bracketed by two uninstrumented end-to-end runs.
  * Usage: runMain graft.tools.TriangleProfile4 [sfDir]
  */
object TriangleProfile4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val reps = sys.env.getOrElse("SPARK_GRAFT_TP_REPS", "3").toInt.max(1)
    def timed[T](label: String)(f: => T): T = {
      var last: Option[T] = None
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        last = Some(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${times.min}%.2f s (${times.map(t => f"$t%.2f").mkString("/")})")
      last.get
    }

    // uninstrumented full query first (warm JIT), twice
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("q162_triangle_counts")(spark, sfDir).count()
      println(f"full q162 rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      graft.Bench.freeLocalCheckpoints(spark)
    }

    // staged replay of the CURRENT Graph.triangleCounts shape
    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
      .distinct()
    timed("1. it distinct (count)")(it.count())
    val canon = {
      val edges = it.as("l").join(it.as("r"),
          col("l.b") === col("r.b") && col("l.p") < col("r.p"))
        .select(col("l.p").as("x"), col("r.p").as("y"))
      timed("2. edge self-join + canon distinct + ckpt") {
        val c = edges
          .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
          .distinct()
          .localCheckpoint(true)
        val n = c.count()
        println(s"   canon edges: $n")
        c
      }
    }
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val aKey = struct(col("da").as("d"), col("a").as("n"))
    val bKey = struct(col("db").as("d"), col("b").as("n"))
    val fwd = aKey < bKey
    val oriented = timed("3. degree agg + orientation joins + partitioned ckpt") {
      val o = graft.operators.PartitionedCheckpoint.byKeys(
        canon
          .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
          .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
          .select(
            when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("db")).otherwise(col("da")).as("dv"),
            when(fwd, col("b")).otherwise(col("a")).as("v")),
        col("u"))
      println(s"   oriented: ${o.count()}")
      o
    }
    val bloomBytes = timed("4. bloom build") {
      graft.operators.BloomJoin.buildBlockedKeyFilter(
        oriented, xxhash64(col("u"), col("v")))
    }
    val candidates = timed("5. nbrs agg + wedge kernel + ckpt") {
      val nbrs = oriented.groupBy(col("u"))
        .agg(sort_array(collect_list(struct(col("dv").as("d"), col("v").as("n"))))
          .as("ns"))
        .filter(size(col("ns")) >= 2)
      val c = nbrs.select(col("u").as("pivot"),
          explode(graft.functions.GraphFunctions.wedgeCandidates(
            spark, col("ns"), bloomBytes)).as("p"))
        .select(col("pivot"), col("p.v").as("v"), col("p.w").as("w"))
        .localCheckpoint(true)
      println(s"   candidates: ${c.count()}")
      c
    }
    val tri = timed("6. close join vs oriented") {
      val t = candidates.join(
          oriented.select(col("u").as("cv"), col("v").as("cw")).hint("shuffle_hash"),
          col("v") === col("cv") && col("w") === col("cw"))
        .select(col("pivot"), col("v"), col("w"))
        .localCheckpoint(true)
      println(s"   triangles: ${t.count()}")
      t
    }
    timed("7. final count agg + orderBy") {
      tri.select(explode(array(col("pivot"), col("v"), col("w"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri_n"))
        .orderBy("node").count()
    }
    spark.stop()
  }
}

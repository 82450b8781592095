package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the two wedge-enumeration formulations over the
  * REAL q162 pipeline (same JVM, alternating reps — cancels the host
  * weather that biases sequential comparisons):
  *   A = round-12 self-join + post-hoc bloom filter (411M joined rows
  *       at sf1, ~95 % dropped after materialization)
  *   B = round-13 WedgeCandidates kernel (i<j double loop over the
  *       pivot's sorted neighbor list, bloom probe inside — only
  *       survivors allocate)
  * Both end in the same exact close join + count aggregation, so rows
  * must agree; the tool asserts it.
  * Usage: runMain graft.tools.WedgeAB <sfDir> [reps]
  */
object WedgeAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def pipeline(kernelWedges: Boolean): Long = {
      val it = graft.queries.Tables.lineitem(spark, sfDir)
        .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
        .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
        .distinct()
      val edges = it.as("l").join(it.as("r"),
          col("l.b") === col("r.b") && col("l.p") < col("r.p"))
        .select(col("l.p").as("x"), col("r.p").as("y"))
      val canon = edges
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct().localCheckpoint(true)
      val deg = canon.select(col("a").as("node"))
        .unionByName(canon.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val aKey = struct(col("da").as("d"), col("a").as("n"))
      val bKey = struct(col("db").as("d"), col("b").as("n"))
      val fwd = aKey < bKey
      val oriented = graft.operators.PartitionedCheckpoint.byKeys(
        canon
          .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
          .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
          .select(
            when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("db")).otherwise(col("da")).as("dv"),
            when(fwd, col("b")).otherwise(col("a")).as("v")),
        col("u"))
      val candidates =
        if (kernelWedges) {
          val bloomBytes = graft.operators.BloomJoin.buildBlockedKeyFilter(
            oriented, xxhash64(col("u"), col("v")))
          oriented.groupBy(col("u"))
            .agg(sort_array(collect_list(struct(col("dv").as("d"), col("v").as("n"))))
              .as("ns"))
            .filter(size(col("ns")) >= 2)
            .select(col("u").as("pivot"),
              explode(graft.functions.GraphFunctions.wedgeCandidates(
                spark, col("ns"), bloomBytes)).as("p"))
            .select(col("pivot"), col("p.v").as("v"), col("p.w").as("w"))
        } else {
          val wedges = oriented.as("e1").join(oriented.as("e2"),
              col("e1.u") === col("e2.u") && (col("e1.dv") < col("e2.dv") ||
                (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
            .select(col("e1.u").as("pivot"), col("e1.v").as("v"), col("e2.v").as("w"))
          graft.operators.BloomJoin.blockedBloomPreFilter(
            wedges, oriented, xxhash64(col("v"), col("w")),
            xxhash64(col("u"), col("v")))
        }
      val tri = candidates.join(
        oriented.select(col("u").as("cv"), col("v").as("cw")).hint("shuffle_hash"),
        col("v") === col("cv") && col("w") === col("cw"))
      val n = tri.select(explode(array(col("pivot"), col("v"), col("w"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri_n")).count()
      graft.Bench.freeLocalCheckpoints(spark)
      n
    }

    // warm both shapes once
    val wa = pipeline(kernelWedges = false)
    val wb = pipeline(kernelWedges = true)
    require(wa == wb, s"row mismatch: join=$wa kernel=$wb")
    val times = Array.fill(2)(Vector.empty[Double])
    for (r <- 1 to reps; b <- Seq(false, true)) {
      val t0 = System.nanoTime()
      pipeline(b)
      val dt = (System.nanoTime() - t0) / 1e9
      val i = if (b) 1 else 0
      times(i) = times(i) :+ dt
      println(f"rep$r ${if (b) "B(kernel)" else "A(join)"}: $dt%.2f s")
    }
    println(f"A(join)   min=${times(0).min}%.2f s reps=${times(0).map(t => f"$t%.1f").mkString("/")}")
    println(f"B(kernel) min=${times(1).min}%.2f s reps=${times(1).map(t => f"$t%.1f").mkString("/")}")
    spark.stop()
  }
}

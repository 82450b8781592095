package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the wedge stage's neighbor-list
  * ordering: A = SQL `sort_array` upstream of the kernel (the
  * round-13 shape; the in-kernel sort then sees sorted input),
  * B = unsorted `collect_list` straight into the kernel (round-14
  * shape — the kernel's dual-array quicksort does the ordering).
  * Identical outputs (checksummed); alternating reps over the same
  * checkpointed `oriented` input so only the stage under test
  * varies. Usage: runMain graft.tools.WedgeSortAB [sfDir] [reps]
  */
object WedgeSortAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
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

    // shared prefix, materialized once: canon + orientation
    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
      .distinct()
    val canon = it.as("l").join(it.as("r"),
        col("l.b") === col("r.b") && col("l.p") < col("r.p"))
      .select(col("l.p").as("a"), col("r.p").as("b"))
      .distinct()
      .localCheckpoint(true)
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
    println(s"oriented: ${oriented.count()}")
    val bloomBytes = graft.operators.BloomJoin.buildBlockedKeyFilter(
      oriented, xxhash64(col("u"), col("v")))

    def stage(sorted: Boolean) = {
      val lst = collect_list(struct(col("dv").as("d"), col("v").as("n")))
      val nbrs = oriented.groupBy(col("u"))
        .agg((if (sorted) sort_array(lst) else lst).as("ns"))
        .filter(size(col("ns")) >= 2)
      nbrs.select(col("u").as("pivot"),
          explode(graft.functions.GraphFunctions.wedgeCandidates(
            spark, col("ns"), bloomBytes)).as("p"))
        .select(col("pivot"), col("p.v").as("v"), col("p.w").as("w"))
    }
    def cs(sorted: Boolean) = stage(sorted)
      .agg(count(lit(1)),
        sum(xxhash64(col("pivot"), col("v"), col("w")).cast("decimal(38,0)")))
      .collect()(0).toString
    println(s"A (sort_array) checksum: ${cs(true)}")
    println(s"B (in-kernel)  checksum: ${cs(false)}")

    def time(sorted: Boolean): Double = {
      val t0 = System.nanoTime()
      stage(sorted).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val (ta, tb) = (
      scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    for (_ <- 1 to reps) { ta += time(true); tb += time(false) }
    println(f"A (sort_array upstream): min ${ta.min}%.2f s (${ta.map(t => f"$t%.2f").mkString("/")})")
    println(f"B (in-kernel sort only): min ${tb.min}%.2f s (${tb.map(t => f"$t%.2f").mkString("/")})")
    spark.stop()
  }
}

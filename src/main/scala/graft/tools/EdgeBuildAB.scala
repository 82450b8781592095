package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the co-purchase CANONICAL EDGE build
  * (the q162/q166/q281-q287 shared prefix):
  *   A — shipping shape: distinct (b,p) → self-join on b → canon
  *       distinct → localCheckpoint;
  *   B — basket-grain: groupBy(b).agg(sort_array(collect_set(p))) →
  *       per-basket pair explode → distinct → localCheckpoint
  *       (map-side partial collect_set dedups (b,p) before the
  *       exchange; one shuffle replaces distinct+join).
  * Alternating reps, min + all times printed, plus a checksum proving
  * both produce the identical edge set.
  * Usage: runMain graft.tools.EdgeBuildAB [sfDir] [reps]
  */
object EdgeBuildAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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

    def base = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p"))

    def buildA() = {
      val it = base.distinct()
      val edges = it.as("l").join(it.as("r"),
          col("l.b") === col("r.b") && col("l.p") < col("r.p"))
        .select(col("l.p").as("x"), col("r.p").as("y"))
      edges
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct()
        .localCheckpoint(true)
    }

    def buildB() = {
      val pairs = base.groupBy(col("b"))
        .agg(sort_array(collect_set(col("p"))).as("ps"))
        .filter(size(col("ps")) >= 2)
        .select(explode(flatten(transform(
          sequence(lit(0), size(col("ps")) - 2),
          i => transform(
            slice(col("ps"), i + 2, size(col("ps")) - i - 1),
            y => struct(element_at(col("ps"), i + 1).as("a"), y.as("b")))))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
      pairs.distinct().localCheckpoint(true)
    }

    def buildC() = {
      val it = base
      val edges = it.as("l").join(it.as("r"),
          col("l.b") === col("r.b") && col("l.p") < col("r.p"))
        .select(col("l.p").as("x"), col("r.p").as("y"))
      edges
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct()
        .localCheckpoint(true)
    }

    // correctness: identical edge sets
    val cs = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).collect()(0).toString
    println(s"A checksum: ${cs(buildA())}")
    println(s"B checksum: ${cs(buildB())}")
    println(s"C checksum: ${cs(buildC())}")
    graft.Bench.freeLocalCheckpoints(spark)

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.freeLocalCheckpoints(spark)
      dt
    }
    val (ta, tb, tc) = (
      scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    for (_ <- 1 to reps) { ta += time(buildA _); tb += time(buildB _); tc += time(buildC _) }
    println(f"A (self-join):     min ${ta.min}%.2f s (${ta.map(t => f"$t%.2f").mkString("/")})")
    println(f"B (collect_set):   min ${tb.min}%.2f s (${tb.map(t => f"$t%.2f").mkString("/")})")
    println(f"C (no-predistinct):min ${tc.min}%.2f s (${tc.map(t => f"$t%.2f").mkString("/")})")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Same-JVM interleaved A/B of q266's pair-aggregation layout at sf1:
  * the 82M-candidate-row exchange into a ~70M-group count runs at 32
  * shuffle partitions (~106 MB of hash map per task — spill regime) vs
  * an explicit wider repartition on the pair key before the groupBy.
  * Usage: runMain graft.tools.ContainmentAB [sfDir] [reps]
  */
object ContainmentAB {
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
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val (tNum, tDen) = (1L, 2L)

    def run(parts: Int): Long = {
      val hashed = graft.operators.Dedup.hashedShingleSets(
        graft.queries.Tables.documents(spark, sfDir), $"text", $"doc_id", n = 3)
        .localCheckpoint(true)
      val postings = hashed.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("h"))
      val dfs = postings.groupBy("h").agg(count(lit(1)).as("df"))
      val ranked = postings
        .join(dfs, "h")
        .withColumn("pos",
          row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))) - 1)
        .filter(col("df") >= 2)
      val prefixSide = ranked
        .filter((col("n_sh") - col("pos") + 1) * tDen >= lit(tNum) * col("n_sh"))
        .select(col("doc_id").as("id_src"), col("n_sh").as("n_src"),
          ((col("n_sh") - col("pos")) * tDen >= lit(tNum) * col("n_sh")).as("pc"),
          col("h"))
      val fullSide = ranked
        .select(col("doc_id").as("id_dst"), col("n_sh").as("n_dst"),
          col("pos").as("pos_dst"), col("h"))
      val joined = prefixSide.join(fullSide, "h")
        .filter(col("id_src") =!= col("id_dst"))
        .filter((col("n_dst") - col("pos_dst") + 1) * tDen >= lit(tNum) * col("n_src"))
      val pre = if (parts > 0) joined.repartition(parts, col("id_src"), col("id_dst"))
                else joined
      pre
        .groupBy(col("id_src"), col("id_dst"))
        .agg(count(lit(1)).as("c"),
          max(when(col("pc") &&
            (col("n_dst") - col("pos_dst")) * tDen >= lit(tNum) * col("n_src"),
            1).otherwise(0)).as("w"),
          first(lit(tNum) * col("n_src") <= lit(tDen)).as("small"))
        .filter(col("w") === 1 && (col("c") >= 2L || col("small")))
        .count()
    }

    val variants = Seq(0, 128, 256)
    variants.foreach { v =>
      try run(v) catch { case t: Throwable => println(s"warm $v failed: ${t.getMessage}") }
      graft.Bench.freeLocalCheckpoints(spark)
    }
    val times = scala.collection.mutable.Map.empty[Int, List[Double]]
    for (r <- 1 to reps; v <- variants) {
      val t0 = System.nanoTime()
      val n = run(v)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.freeLocalCheckpoints(spark)
      times(v) = dt :: times.getOrElse(v, Nil)
      println(f"rep$r parts=$v%-4d ${dt}%6.2f s (pruned pairs=$n)")
    }
    for (v <- variants)
      println(f"parts=$v%-4d min=${times(v).min}%6.2f s all=${times(v).reverse.map(t => f"$t%.1f").mkString("/")}")
    spark.stop()
  }
}

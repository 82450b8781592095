package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B the q304 linkPrediction window shape: fold RA over ALL
  * non-adjacent wedges (current) vs count-first + fold only surviving
  * pairs. Usage: runMain graft.tools.LinkPredProfile <sfDir>
  */
object LinkPredProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // q304's edge build (co-purchase graph)
    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p")).distinct()
    val edges = it.as("l").join(it.as("r"),
        col("l.b") === col("r.b") && col("l.p") < col("r.p"))
      .select(col("l.p").as("s"), col("r.p").as("t"))
    val e0 = edges.select(col("s").as("src"), col("t").as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    println(s"sym edges: ${sym.count()}")
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("c"), col("d"))
    val centers = deg.filter(col("d") <= 64)
    val e1 = sym.select(col("src").as("u"), col("dst").as("w"))
    val e2 = sym.select(col("src").as("w2"), col("dst").as("v"))
    def wedges = e1
      .join(centers, col("w") === col("c"))
      .join(e2, col("w") === col("w2") && col("u") < col("v"))
      .select(col("u"), col("v"), col("w"), col("d"))
    val canon = sym.filter(col("src") < col("dst"))
      .select(col("src").as("ea"), col("dst").as("eb"))
    def nonAdj = wedges.join(canon,
      col("u") === col("ea") && col("v") === col("eb"), "left_anti")
    timed("wedge + anti-join volume")(println(s"  rows: ${nonAdj.count()}"))

    val wCum = Window.partitionBy(col("u"), col("v")).orderBy(col("w").asc)
    val wAll = Window.partitionBy(col("u"), col("v"))
    timed("A: window fold over all nonAdj (current)") {
      val out = nonAdj
        .withColumn("ra", sum(lit(1.0) / col("d").cast("double"))
          .over(wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(wCum))
        .withColumn("cn", count(lit(1)).over(wAll))
        .filter(col("rn") === col("cn") && col("cn") >= 2)
      println(s"  pairs: ${out.count()}")
    }
    timed("B: count-first, fold survivors only") {
      val counted = nonAdj.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"))
        .filter(col("cn") >= 2)
      val surv = nonAdj.join(counted, Seq("u", "v"))
      val out = surv
        .withColumn("ra", sum(lit(1.0) / col("d").cast("double"))
          .over(wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(wCum))
        .filter(col("rn") === col("cn"))
      println(s"  pairs: ${out.count()}")
    }
    spark.stop()
  }
}

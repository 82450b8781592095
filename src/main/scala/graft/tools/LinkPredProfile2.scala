package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timers for the ROUND-11 q304 shape (minPrice=50000,
  * minCommon=3, exact-rational RA aggregation).
  * Usage: runMain graft.tools.LinkPredProfile2 <sfDir>
  */
object LinkPredProfile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
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
    val it = timed("it build + partitioned ckpt") {
      graft.operators.PartitionedCheckpoint.byKeys(
        graft.queries.Tables.lineitem(spark, sfDir)
          .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull &&
            $"l_extendedprice" > 50000.0)
          .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
          .distinct(),
        col("o"))
    }
    val edges = it.as("l").join(it.as("r"),
        col("l.o") === col("r.o") && col("l.p") < col("r.p"))
      .select(col("l.p").as("src"), col("r.p").as("dst"))
    val canon0 = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    val sym = timed("pairs + canon distinct + mirror + ckpt") {
      val s2 = canon0.union(canon0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      println(s"  sym: ${s2.count()}")
      s2
    }
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("c"), col("d"))
    val centers = deg.filter(col("d") <= 64)
    val e1 = sym.select(col("src").as("u"), col("dst").as("w"))
    val e2 = sym.select(col("src").as("w2"), col("dst").as("v"))
    val wedges = e1
      .join(centers, col("w") === col("c"))
      .join(e2, col("w") === col("w2") && col("u") < col("v"))
      .select(col("u"), col("v"), col("w"), col("d"))
    val lcm = (1 to 64).foldLeft(BigInt(1))((l, i) => l / l.gcd(BigInt(i)) * i)
    val recips = typedLit((1 to 64).map(d => (lcm / d).toString))
      .cast("array<decimal(38,0)>")
    val agg = wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(element_at(recips, col("d").cast("int")))
          .cast("decimal(38,0)").as("sra"))
      .filter(col("cn") >= 3)
    val agged = timed("wedge enumeration + pair agg + minCommon") {
      val a = agg.localCheckpoint(true)
      println(s"  pairs cn>=3: ${a.count()}")
      a
    }
    val canon = sym.filter(col("src") < col("dst"))
      .select(col("src").as("ea"), col("dst").as("eb"))
    timed("anti-join + final select") {
      val out = agged.join(canon,
          col("u") === col("ea") && col("v") === col("eb"), "left_anti")
        .select(col("u").as("a"), col("v").as("b"), col("cn"),
          (col("sra").cast("double") / lit(lcm.toDouble)).as("ra_index"))
      println(s"  out: ${out.count()}")
    }
    spark.stop()
  }
}

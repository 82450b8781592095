package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Finer stage split of the q304 wedge phase at sf1: wedge join only
  * (count) vs join + per-pair agg, plus wedge-row count.
  * Usage: runMain graft.tools.LinkPredProfile4 <sfDir>
  */
object LinkPredProfile4 {
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
    val cap = 64
    val lcm = (1 to cap).foldLeft(BigInt(1))((l, i) => l / l.gcd(BigInt(i)) * i)
    val capBits = 64 - java.lang.Long.numberOfLeadingZeros(cap.toLong)
    val shift = math.max(0, lcm.bitLength - (62 - capBits))
    val mask = (BigInt(1) << shift) - 1
    val qArr = typedLit((1 to cap).map(d => ((lcm / d) >> shift).toLong))
    val rArr = typedLit((1 to cap).map(d => ((lcm / d) & mask).toLong))

    val it = Seq(1).toDF("z") // placeholder to keep imports used
    val it2 = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull &&
        $"l_extendedprice" > 50000.0)
      .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
      .distinct()
      .localCheckpoint(true)
    val edges = it2.as("l").join(it2.as("r"),
        col("l.o") === col("r.o") && col("l.p") < col("r.p"))
      .select(col("l.p").as("src"), col("r.p").as("dst"))
    val canon0 = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    val sym = timed("sym build + ckpt") {
      val s2 = canon0.union(canon0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      println(s"  sym: ${s2.count()}")
      s2
    }
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("c"), col("d"))
    val centers = deg.filter(col("d") <= cap)
    val e1 = sym.select(col("src").as("u"), col("dst").as("w"))
    val e2 = sym.select(col("src").as("w2"), col("dst").as("v"))
    def wedges = e1
      .join(centers, col("w") === col("c"))
      .join(e2, col("w") === col("w2") && col("u") < col("v"))
      .select(col("u"), col("v"), col("d"))
    timed("wedge join ONLY (count rows)") {
      println(s"  wedges: ${wedges.count()}")
    }
    timed("wedge join + pair agg + minCommon") {
      val n = wedges
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(qArr, col("d").cast("int"))).as("sq"),
          sum(element_at(rArr, col("d").cast("int"))).as("sr"))
        .filter(col("cn") >= 3).count()
      println(s"  pairs cn>=3: $n")
    }
    timed("wedge join + COUNT-ONLY pair agg") {
      val n = wedges
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"))
        .filter(col("cn") >= 3).count()
      println(s"  pairs cn>=3: $n")
    }
    timed("distinct (u,v) among wedges") {
      println(s"  distinct pairs: ${wedges.select(col("u"), col("v")).distinct().count()}")
    }
    timed("wedge rows on ADJACENT pairs (semi vs canon)") {
      val canon = sym.filter(col("src") < col("dst"))
        .select(col("src").as("ea"), col("dst").as("eb"))
      val n = wedges.join(broadcast(canon),
        col("u") === col("ea") && col("v") === col("eb"), "left_semi").count()
      println(s"  adjacent wedge rows: $n")
    }
    for (p <- Seq(128, 256, 512)) {
      timed(s"repartition($p,u,v) + agg") {
        val n = wedges.repartition(p, col("u"), col("v"))
          .groupBy(col("u"), col("v"))
          .agg(count(lit(1)).as("cn"),
            sum(element_at(qArr, col("d").cast("int"))).as("sq"),
            sum(element_at(rArr, col("d").cast("int"))).as("sr"))
          .filter(col("cn") >= 3).count()
        println(s"  pairs cn>=3: $n")
      }
    }
    it.count()
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: q304's per-pair aggregation with a (u,v) two-long grouping key
  * vs a single packed u<<32|v long key (ids fit 32 bits on this data).
  * Usage: runMain graft.tools.LinkPredPackProbe <sfDir>
  */
object LinkPredPackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
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
    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull &&
        $"l_extendedprice" > 50000.0)
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      .localCheckpoint(true)
    val edges = it.as("l").join(it.as("r"),
        col("l.o") === col("r.o") && col("l.p") < col("r.p"))
      .select(col("l.p").as("src"), col("r.p").as("dst"))
    val canon0 = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst")).distinct()
    val sym = canon0.union(canon0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("c"), col("d"))
    val centers = deg.filter(col("d") <= 64)
    val e1 = sym.select(col("src").as("u"), col("dst").as("w"))
    val e2 = sym.select(col("src").as("w2"), col("dst").as("v"))
    def wedges = e1
      .join(centers, col("w") === col("c"))
      .join(e2, col("w") === col("w2") && col("u") < col("v"))
      .select(col("u"), col("v"), col("w"), col("d"))
    val lcm = (1 to 64).foldLeft(BigInt(1))((l, i) => l / l.gcd(BigInt(i)) * i)
    val recips = typedLit((1 to 64).map(d => (lcm / d).toString))
      .cast("array<decimal(38,0)>")

    timed("A: groupBy(u,v)") {
      val a = wedges.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(recips, col("d").cast("int")))
            .cast("decimal(38,0)").as("sra"))
        .filter(col("cn") >= 3)
      println(s"  pairs: ${a.count()}")
    }
    timed("B: groupBy(packed u<<32|v)") {
      val b = wedges
        .select(shiftleft(col("u").cast("long"), 32).bitwiseOR(col("v").cast("long")).as("uv"), col("d"))
        .groupBy(col("uv"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(recips, col("d").cast("int")))
            .cast("decimal(38,0)").as("sra"))
        .filter(col("cn") >= 3)
      println(s"  pairs: ${b.count()}")
    }
    timed("D: packed key + long-only sums") {
      val qArr = typedLit((1 to 64).map(d => ((lcm / d) >> 33).toLong))
      val rArr = typedLit((1 to 64).map(d => ((lcm / d) & ((1L << 33) - 1)).toLong))
      val dd = wedges
        .select(shiftleft(col("u").cast("long"), 32).bitwiseOR(col("v").cast("long")).as("uv"), col("d"))
        .groupBy(col("uv"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(qArr, col("d").cast("int"))).as("sq"),
          sum(element_at(rArr, col("d").cast("int"))).as("sr"))
        .filter(col("cn") >= 3)
      println(s"  pairs: ${dd.count()}")
    }
    timed("C: groupBy(u,v), long-only sums (q,r split)") {
      val qArr = typedLit((1 to 64).map(d => ((lcm / d) >> 33).toLong))
      val rArr = typedLit((1 to 64).map(d => ((lcm / d) & ((1L << 33) - 1)).toLong))
      val c = wedges.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(qArr, col("d").cast("int"))).as("sq"),
          sum(element_at(rArr, col("d").cast("int"))).as("sr"))
        .filter(col("cn") >= 3)
      println(s"  pairs: ${c.count()}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B/C/D of q304 linkPrediction shapes on the REAL
  * copurchase edges (same JVM):
  *   A = r11 shape (groupBy direct, old shift, no guard)
  *   B = A + repartition(4x, u, v) before groupBy
  *   C = B + balanced shift + overflow guard   (= round-12 code)
  *   D = A + balanced shift + overflow guard   (guard, no repartition)
  * Usage: runMain graft.tools.LinkPredProfile5 <sfDir> [reps]
  */
object LinkPredProfile5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cap = 64
    val minCommon = 3
    val lcm = (1 to cap).foldLeft(BigInt(1))((l, i) => l / l.gcd(BigInt(i)) * i)

    def pipeline(aggParts: Int, balanced: Boolean, guard: Boolean): Long = {
      // full production shape from lineitem read to ordered output
      val it = graft.queries.Tables.lineitem(spark, sfDir)
        .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull &&
          $"l_extendedprice" > 50000.0)
        .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
        .distinct()
        .localCheckpoint(true)
      val edges = it.as("l").join(it.as("r"),
          col("l.o") === col("r.o") && col("l.p") < col("r.p"))
        .select(col("l.p").as("src"), col("r.p").as("dst"))
      val e0 = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .distinct()
      val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .select(col("src").as("c"), col("d"))
      val centers = deg.filter(col("d") <= cap)
      val e1 = sym.select(col("src").as("u"), col("dst").as("w"))
      val e2 = sym.select(col("src").as("w2"), col("dst").as("v"))
      val wedges0 = e1
        .join(centers, col("w") === col("c"))
        .join(e2, col("w") === col("w2") && col("u") < col("v"))
        .select(col("u"), col("v"), col("w"), col("d"))
      val canon = sym.filter(col("src") < col("dst"))
        .select(col("src").as("ea"), col("dst").as("eb"))
      val capBits = 64 - java.lang.Long.numberOfLeadingZeros(cap.toLong)
      val shift =
        if (balanced) (lcm.bitLength + 1) / 2
        else math.max(0, lcm.bitLength - (62 - capBits))
      val mask = (BigInt(1) << shift) - 1
      val maxAddends = 1L << math.max(0, 62 - math.max(shift, lcm.bitLength - shift))
      val qArr = typedLit((1 to cap).map(d => ((lcm / d) >> shift).toLong))
      val rArr = typedLit((1 to cap).map(d => ((lcm / d) & mask).toLong))
      val wedges = if (aggParts > 0) wedges0.repartition(aggParts, col("u"), col("v")) else wedges0
      val raExpr =
        (col("sq").cast("decimal(38,0)") *
          lit((BigInt(1) << shift).toString).cast("decimal(38,0)") +
          col("sr").cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("double") / lit(lcm.toDouble)
      val ra =
        if (guard)
          when(col("cn") > lit(maxAddends), raise_error(concat(
            lit("overflow guard ("), col("cn"), lit(" common)"))))
            .otherwise(raExpr)
        else raExpr
      wedges
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(qArr, col("d").cast("int"))).as("sq"),
          sum(element_at(rArr, col("d").cast("int"))).as("sr"))
        .filter(col("cn") >= minCommon)
        .join(canon,
          col("u") === col("ea") && col("v") === col("eb"), "left_anti")
        .select(col("u").as("a"), col("v").as("b"),
          col("cn").as("common_neighbors"), ra.as("ra_index"))
        .orderBy(col("a"), col("b"))
        .count()
    }

    val variants = Seq(
      ("A r11        ", () => pipeline(0, false, false)),
      ("B +repart    ", () => pipeline(128, false, false)),
      ("C +rep+guard ", () => pipeline(128, true, true)),
      ("D +guard only", () => pipeline(0, true, true)))
    // warm-up
    variants.foreach(_._2())
    graft.Bench.freeLocalCheckpoints(spark)
    for (rep <- 1 to reps; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      println(f"$name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.Bench.freeLocalCheckpoints(spark)
    }
    spark.stop()
  }
}

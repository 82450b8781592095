package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the q304 wedge-enumeration shapes at a given sf dir:
  *   A = round-11 join shape (e1 ⋈ centers ⋈ e2, u < v filter)
  *   B = neighbor-list shape (collect sorted adjacency per capped
  *       center, explode the C(d,2) pairs, per-center addend hoist)
  * Usage: runMain graft.tools.LinkPredProfile3 <sfDir> [reps]
  */
object LinkPredProfile3 {
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
    val capBits = 64 - java.lang.Long.numberOfLeadingZeros(cap.toLong)
    val shift = math.max(0, lcm.bitLength - (62 - capBits))
    val mask = (BigInt(1) << shift) - 1
    val qArr = typedLit((1 to cap).map(d => ((lcm / d) >> shift).toLong))
    val rArr = typedLit((1 to cap).map(d => ((lcm / d) & mask).toLong))

    def base() = {
      val it = graft.queries.Tables.lineitem(spark, sfDir)
        .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull &&
          $"l_extendedprice" > 50000.0)
        .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
        .distinct()
      val it2 = graft.operators.PartitionedCheckpoint.byKeys(it, col("o"))
      val edges = it2.as("l").join(it2.as("r"),
          col("l.o") === col("r.o") && col("l.p") < col("r.p"))
        .select(col("l.p").as("src"), col("r.p").as("dst"))
      val canon0 = edges
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .distinct()
      canon0.union(canon0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
    }

    def runA(sym: org.apache.spark.sql.DataFrame): Long = {
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .select(col("src").as("c"), col("d"))
      val centers = deg.filter(col("d") <= cap)
      val e1 = sym.select(col("src").as("u"), col("dst").as("w"))
      val e2 = sym.select(col("src").as("w2"), col("dst").as("v"))
      val wedges = e1
        .join(centers, col("w") === col("c"))
        .join(e2, col("w") === col("w2") && col("u") < col("v"))
        .select(col("u"), col("v"), col("w"), col("d"))
      val canon = sym.filter(col("src") < col("dst"))
        .select(col("src").as("ea"), col("dst").as("eb"))
      wedges
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(element_at(qArr, col("d").cast("int"))).as("sq"),
          sum(element_at(rArr, col("d").cast("int"))).as("sr"))
        .filter(col("cn") >= minCommon)
        .join(canon,
          col("u") === col("ea") && col("v") === col("eb"), "left_anti")
        .count()
    }

    def runB(sym: org.apache.spark.sql.DataFrame): Long = {
      // adjacency per center, capped: one groupBy, pairs exploded as
      // C(d,2) ordered combos of the SORTED list, addends hoisted to
      // one array lookup per center
      val neigh = sym.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("ns"))
        .filter(size(col("ns")) <= cap)
        .select(col("ns"),
          element_at(qArr, size(col("ns"))).as("q"),
          element_at(rArr, size(col("ns"))).as("r"))
      val wedges = neigh.select(
          explode(expr(
            "flatten(transform(ns, (x, i) -> " +
              "transform(slice(ns, i + 2, size(ns) - i - 1), " +
              "y -> struct(x AS u, y AS v))))")).as("pr"),
          col("q"), col("r"))
        .select(col("pr.u"), col("pr.v"), col("q"), col("r"))
      val canon = sym.filter(col("src") < col("dst"))
        .select(col("src").as("ea"), col("dst").as("eb"))
      wedges
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"), sum(col("q")).as("sq"), sum(col("r")).as("sr"))
        .filter(col("cn") >= minCommon)
        .join(canon,
          col("u") === col("ea") && col("v") === col("eb"), "left_anti")
        .count()
    }

    val sym = base()
    // warm-up both
    runA(sym); runB(sym)
    for (rep <- 1 to reps) {
      var t0 = System.nanoTime()
      val ra = runA(sym)
      println(f"A(join)  rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($ra rows)")
      t0 = System.nanoTime()
      val rb = runB(sym)
      println(f"B(adjl)  rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rb rows)")
      require(ra == rb, s"row mismatch: $ra vs $rb")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of the depth-2 FastSS join (q365)
  * at a given sf: groups build, variant explode + block groupBy,
  * in-block verification, string-pair dedup, id expansion — each
  * materialized separately so the 13 s stress cost decomposes into
  * actionable stages. Mirrors `FuzzyJoin.edPairs` shape (k = 2).
  * Usage: runMain graft.tools.Ed2Profile [sfDir]
  */
object Ed2Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
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

    // one warm pass end-to-end first (JIT/codegen), then staged
    val warm = graft.operators.FuzzyJoin.edPairs(
      graft.queries.Tables.customer(spark, sfDir).filter($"c_custkey" % 7 === 0),
      $"c_custkey", $"c_name", k = 2)
    timed("warm full query")(println(s"  pairs: ${warm.count()}"))
    graft.Bench.freeLocalCheckpoints(spark)

    val base = graft.queries.Tables.customer(spark, sfDir)
      .filter($"c_custkey" % 7 === 0)
      .select($"c_custkey".cast("long").as("id"), $"c_name".as("s"))
      .filter(col("id").isNotNull && col("s").isNotNull)
    val groups = timed("groups build (groupBy s + ckpt)") {
      val g = base.groupBy(col("s"))
        .agg(sort_array(collect_set(col("id"))).as("ids"))
        .localCheckpoint(true)
      println(s"  distinct strings: ${g.count()}")
      g
    }
    val dels = when(length(col("s")) > 0, transform(
      sequence(lit(0), length(col("s")) - 1),
      i => concat(col("s").substr(lit(1), i), col("s").substr(i + lit(2), length(col("s"))))))
      .otherwise(array().cast("array<string>"))
    val dels2 = when(length(col("s")) > 1, flatten(transform(
      sequence(lit(0), length(col("s")) - 2),
      i => transform(
        sequence(i + lit(1), length(col("s")) - 1),
        j => concat(
          col("s").substr(lit(1), i),
          col("s").substr(i + lit(2), j - i - lit(1)),
          col("s").substr(j + lit(2), length(col("s")) - j - lit(1)))))))
      .otherwise(array().cast("array<string>"))
    val variants = groups.select(
      col("s"), explode(array_distinct(transform(
        concat(array(col("s")), dels, dels2), v => xxhash64(v)))).as("v"))
    timed("variant explode only (count)")(println(s"  variants: ${variants.count()}"))
    val blocks = timed("blocks: groupBy(vh) + collect_list + ckpt") {
      val b = variants.groupBy(col("v"))
        .agg(sort_array(collect_list(col("s"))).as("ms"))
        .filter(size(col("ms")) >= 2)
        .localCheckpoint(true)
      println(s"  blocks: ${b.count()}")
      b
    }
    val enums = blocks
      .select((size(col("ms")) * (size(col("ms")) - 1) / 2).cast("long").as("p"))
      .agg(sum(col("p"))).first().getLong(0)
    println(s"  enumerations: $enums")
    val strPairs = blocks.select(explode(flatten(transform(
      sequence(lit(0), size(col("ms")) - 2),
      i => {
        val a = element_at(col("ms"), i + 1)
        filter(
          transform(
            slice(col("ms"), i + 2, size(col("ms")) - i - 1),
            b => struct(a.as("sa"), b.as("sb"),
              graft.functions.GraftFunctions.levAtMost(spark, a, b, 2).as("dist"))),
          p => p.getField("dist") > 0)
      }))).as("p"))
      .select(col("p.sa").as("sa"), col("p.sb").as("sb"), col("p.dist").as("dist"))
    timed("in-block verify (count, pre-dedup)")(
      println(s"  verified pair rows: ${strPairs.count()}"))
    val deduped = timed("verify + dropDuplicates(sa,sb) + ckpt") {
      val d = strPairs.dropDuplicates("sa", "sb").localCheckpoint(true)
      println(s"  distinct string pairs: ${d.count()}")
      d
    }
    timed("id expansion (joins + explode + min-rollup)") {
      val near = deduped
        .join(groups.select(col("s").as("sa"), col("ids").as("ids_a")), Seq("sa"))
        .join(groups.select(col("s").as("sb"), col("ids").as("ids_b")), Seq("sb"))
        .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("dist"))
        .select(col("ia"), explode(col("ids_b")).as("ib"), col("dist"))
        .filter(col("ia") =!= col("ib"))
        .select(least(col("ia"), col("ib")).as("id_a"),
          greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
      println(s"  near id pairs (no rollup): ${near.count()}")
    }
    spark.stop()
  }
}

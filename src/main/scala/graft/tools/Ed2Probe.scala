package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-economics probe for the depth-2 FastSS join: counts the
  * in-block pair enumerations, the distinct candidate pairs, and the
  * verified survivors at a given sf — decides verify-then-dedup vs
  * dedup-then-verify for k = 2 (the q25 trade re-measured at ED2's
  * much higher per-pair duplication).
  * Usage: runMain graft.tools.Ed2Probe <sfDir>
  */
object Ed2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.queries.Tables.customer(spark, sfDir)
      .filter($"c_custkey" % 7 === 0)
      .select($"c_custkey".cast("long").as("id"), $"c_name".as("s"))
      .filter(col("id").isNotNull && col("s").isNotNull)
    val groups = base.groupBy(col("s"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .localCheckpoint(true)
    println(s"records=${base.count()} distinct=${groups.count()}")

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
      col("s"), explode(array_distinct(concat(array(col("s")), dels, dels2))).as("v"))
    val blocks = variants.groupBy(col("v"))
      .agg(sort_array(collect_list(col("s"))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .localCheckpoint(true)
    val enumerations = blocks
      .select((size(col("ms")) * (size(col("ms")) - 1) / 2).cast("long").as("p"))
      .agg(sum(col("p"))).first().getLong(0)
    println(s"blocks=${blocks.count()} enumerations=$enumerations")

    val cand = blocks.select(explode(flatten(transform(
      sequence(lit(0), size(col("ms")) - 2),
      i => {
        val a = element_at(col("ms"), i + 1)
        transform(
          slice(col("ms"), i + 2, size(col("ms")) - i - 1),
          b => struct(a.as("sa"), b.as("sb")))
      }))).as("p"))
      .select(col("p.sa").as("sa"), col("p.sb").as("sb"))
    val t0 = System.nanoTime()
    val distinctCand = cand.dropDuplicates("sa", "sb").count()
    val t1 = System.nanoTime()
    println(f"distinctCand=$distinctCand dedupFirstSec=${(t1 - t0) / 1e9}%.2f")

    val t2 = System.nanoTime()
    val surv = cand.filter(levenshtein(col("sa"), col("sb")) <= 2)
      .dropDuplicates("sa", "sb").count()
    val t3 = System.nanoTime()
    println(f"survivors=$surv verifyFirstSec=${(t3 - t2) / 1e9}%.2f")

    val t4 = System.nanoTime()
    val surv2 = cand.dropDuplicates("sa", "sb")
      .filter(levenshtein(col("sa"), col("sb")) <= 2).count()
    val t5 = System.nanoTime()
    println(f"survivors2=$surv2 dedupThenVerifySec=${(t5 - t4) / 1e9}%.2f")
    spark.stop()
  }
}

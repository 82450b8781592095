package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the shared shingle-cache build cost that dominates q25's
  * bench number: times each sub-expression (tokenize, shingle, hash,
  * sort, cache) with codegen warmed on a different dir first — the
  * same thermal state as graft.Bench's measured pass.
  * Usage: runMain graft.tools.ShingleBuildProfile [sfDir]
  */
object ShingleBuildProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  [$r]")
      r
    }

    // warm codegen/JIT on the smaller dir (bench does the same)
    for (_ <- 1 to 2) {
      val w = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      graft.operators.Dedup.hashedShingleSets(w, $"text", $"doc_id", 3).count()
    }

    val docs = spark.read.parquet(s"$d/documents.parquet")
    println("input partitions: " + docs.rdd.getNumPartitions)
    timed("read+count only")(docs.count())
    val toks = docs.select($"doc_id",
      graft.operators.TextAnalysis.tokens($"text").as("toks"))
    timed("tokens")(toks.count())
    val sh = docs.select($"doc_id",
      graft.functions.GraftFunctions.shingles(
        graft.operators.TextAnalysis.tokens($"text"), 3).as("sh"))
    timed("tokens+shingles")(sh.count())
    val hashed0 = graft.operators.Dedup.hashedShingleSets(docs, $"text", $"doc_id", 3)
    timed("tokens+shingles+hash+sort (no cache)")(hashed0.count())
    val cached = hashed0.cache()
    timed("cache build")(cached.count())
    timed("cached re-count")(cached.count())
    cached.unpersist(true)
    // second full build (cold cache again) — steady-state repeat
    val again = graft.operators.Dedup.hashedShingleSets(docs, $"text", $"doc_id", 3).cache()
    timed("cache build #2")(again.count())
    spark.stop()
  }
}

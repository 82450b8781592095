package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the exact-Jaccard pair pipeline at a given
  * sf dir — identifies whether shingle build, frequency ranking,
  * candidate expansion, or verification dominates. Mirrors the REAL
  * `Dedup.ngramJaccardPairsFromHashed` stages and times each twice
  * (second number is the warm/steady-state one).
  * Usage: runMain graft.tools.JaccardProfile [sfDir]
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    def timed2[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r1 = f
      val t1 = System.nanoTime(); f
      println(f"$label: cold ${(t1 - t0) / 1e9}%.2f s, warm ${(System.nanoTime() - t1) / 1e9}%.2f s  [$r1]")
      r1
    }

    val t = 0.3
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val hashed = graft.operators.Dedup.hashedShingleSets(docs, $"text", $"doc_id", 3).cache()
    timed2("shingles (cache build)")(hashed.count())

    val postings = hashed.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("h"))
    val dfs = postings.groupBy("h").agg(count(lit(1)).as("df"))
    timed2("dfs (count agg)")(dfs.count())
    println("  postings=" + postings.count()
      + " shingles_ge2=" + dfs.filter(col("df") >= 2).count())

    val prefixLen = (col("n_sh") - ceil(col("n_sh") * t) + 1).cast("int")
    val prefixes = postings
      .join(dfs, "h")
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))) - 1)
      .filter(col("pos") < prefixLen && col("df") >= 2)
      .select(col("doc_id"), col("n_sh"), col("pos"), col("h"))
    timed2("prefixes (join+window, df>=2)")(prefixes.count())

    val tFrac = t / (1.0 + t)
    val blocks = prefixes.groupBy("h")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh"), col("pos")))).as("ms"))
      .filter(size(col("ms")).between(2, 100000))
    timed2("prefix blocks>=2")(blocks.count())
    println("  sum m^2 = " + blocks.select(sum(size(col("ms")) * size(col("ms")))).first().get(0))

    val candidatesHof = blocks
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ms")) - 2),
        i => {
          val a = element_at(col("ms"), i + 1)
          val na = a.getField("n_sh")
          val ra = na - a.getField("pos") - 1
          transform(
            filter(
              slice(col("ms"), i + 2, size(col("ms")) - i - 1),
              b => (lit(1) + least(ra, b.getField("n_sh") - b.getField("pos") - 1))
                .cast("double") >= (na + b.getField("n_sh")) * tFrac - lit(1e-9)),
            b => struct(
              a.getField("doc_id").as("id_a"),
              b.getField("doc_id").as("id_b")))
        }))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    timed2("expansion HOF (pre-dedup)")(candidatesHof.count())
    val candidates = blocks
      .select(explode(
        graft.functions.GraftFunctions.ppjoinExpand(col("ms"), tFrac)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    timed2("expansion KERNEL (pre-dedup)")(candidates.count())
    val deduped = candidates.dropDuplicates("id_a", "id_b").cache()
    timed2("dedup (cache build)")(deduped.count())

    val verified = deduped
      .join(hashed.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("c", graft.functions.GraftFunctions.sortedOverlap(col("hs_a"), col("hs_b")))
      .withColumn("jaccard",
        col("c").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("c")).cast("double"))
      .filter(col("jaccard") >= t)
    timed2("verify")(verified.count())

    timed2("END TO END (fresh, shingles cached)")(
      graft.operators.Dedup.ngramJaccardPairsFromHashed(hashed, t).count())
    spark.stop()
  }
}

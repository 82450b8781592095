package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the exact-Jaccard pair pipeline at a given
  * sf dir — identifies whether shingle build, frequency ranking,
  * candidate expansion, or verification dominates.
  * Usage: runMain graft.tools.JaccardProfile [sfDir]
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$d/documents.parquet")
    val hashed = graft.operators.Dedup.hashedShingleSets(docs, $"text", $"doc_id", 3).cache()
    timed("hashed shingle sets (native kernel, build+cache)")(hashed.count())
    val freq = hashed.select(explode(col("hs")).as("h")).groupBy("h").agg(count(lit(1)).as("df"))
    timed("freq")(freq.count())
    val t = 0.3
    val prefixLen = (col("n_sh") - ceil(col("n_sh") * t) + 1).cast("int")
    val prefixes = hashed
      .select(col("doc_id"), col("n_sh"), explode(col("hs")).as("h"))
      .join(freq, "h")
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(collect_list(struct(col("df"), col("h"))).as("fh"))
      .select(col("doc_id"), col("n_sh"),
        posexplode(transform(slice(array_sort(col("fh")), lit(1), prefixLen),
          p => p.getField("h"))).as(Seq("pos", "h"))).cache()
    timed("prefixes")(prefixes.count())
    val needed = (col("na") + col("nb")) * (t / (1.0 + t)) - lit(1e-9)
    val candidates = prefixes.groupBy("h")
      .agg(collect_list(struct(col("doc_id"), col("n_sh"), col("pos"))).as("ms"))
      .filter(size(col("ms")).between(2, 100000))
      .select(explode(expr("flatten(transform(sequence(0, size(sort_array(ms)) - 2), " +
        "i -> transform(slice(sort_array(ms), i + 2, size(sort_array(ms)) - i - 1), " +
        "b -> struct(element_at(sort_array(ms), i + 1) as id_a, b as id_b))))")).as("p"))
      .select(
        col("p.id_a.doc_id").as("id_a"), col("p.id_a.n_sh").as("na"), col("p.id_a.pos").as("pa"),
        col("p.id_b.doc_id").as("id_b"), col("p.id_b.n_sh").as("nb"), col("p.id_b.pos").as("pb"))
      .filter((lit(1) + least(col("na") - col("pa") - 1, col("nb") - col("pb") - 1)).cast("double") >= needed)
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b").cache()
    timed("candidates")(println("  n_cand=" + candidates.count()))
    val verified = candidates
      .join(hashed.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double"))
      .filter(col("jaccard") >= 0.3)
    timed("verify")(println("  n_pairs=" + verified.count()))
    spark.stop()
  }
}

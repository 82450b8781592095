package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level profile of q266's containment-pairs pipeline at an
  * arbitrary sf dir: times the shingle build, the candidate join
  * volume BEFORE dedup, the distinct cost, and the verify joins
  * separately, so an optimization lands where the time actually is.
  * Usage: runMain graft.tools.ContainmentProfile <sfDir>
  */
object ContainmentProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val (tNum, tDen) = (1L, 2L)
    val hashed = timed("shingle build (cached count)") {
      val h = graft.operators.Dedup.hashedShingleSets(
        graft.queries.Tables.documents(spark, sfDir), $"text", $"doc_id", n = 3)
        .localCheckpoint(true)
      println(s"  docs: ${h.count()}")
      h
    }
    val postings = hashed.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("h"))
    val dfs = postings.groupBy("h").agg(count(lit(1)).as("df"))
    val ranked = postings
      .join(dfs, "h")
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))) - 1)
      .filter(col("df") >= 2)
      .localCheckpoint(true)
    timed("ranked postings build")(println(s"  rows: ${ranked.count()}"))
    val prefixSide = ranked
      .filter((col("n_sh") - col("pos")) * tDen >= lit(tNum) * col("n_sh"))
      .select(col("doc_id").as("id_src"), col("n_sh").as("n_src"),
        col("pos").as("pos_src"), col("h"))
    timed("prefix rows")(println(s"  rows: ${prefixSide.count()}"))
    val fullSide2 = ranked
      .select(col("doc_id").as("id_dst"), col("n_sh").as("n_dst"),
        col("pos").as("pos_dst"), col("h"))
    val joined = prefixSide.join(fullSide2, "h")
      .filter(col("id_src") =!= col("id_dst"))
    val survOld = joined
      .filter((col("n_dst") - col("pos_dst")) * tDen >= lit(tNum) * col("n_src"))
    timed("candidates (old dst bound), pre-distinct")(
      println(s"  rows: ${survOld.count()}"))
    // tighter PPJoin bound: overlap <= 1 + min(n_src-pos_src-1, n_dst-pos_dst-1)
    val survNew = joined
      .filter((lit(1L) + least(col("n_src") - col("pos_src") - 1L,
        col("n_dst") - col("pos_dst") - 1L)) * tDen >= lit(tNum) * col("n_src"))
    timed("candidates (ppjoin bound), pre-distinct")(
      println(s"  rows: ${survNew.count()}"))
    val distOld = survOld.select("id_src", "id_dst").distinct()
    timed("distinct (old)")(println(s"  pairs: ${distOld.count()}"))
    val distNew = survNew.select("id_src", "id_dst").distinct()
    timed("distinct (ppjoin)")(println(s"  pairs: ${distNew.count()}"))
    // generalized prefix filter i=2: extended prefix (one more rank),
    // relaxed dst bound (sound for the two smallest shared shingles),
    // group per pair, require c >= 2 (alpha >= 2) + the old strong
    // witness row
    val extPrefix = ranked
      .filter((col("n_sh") - col("pos") + 1) * tDen >= lit(tNum) * col("n_sh"))
      .select(col("doc_id").as("id_src"), col("n_sh").as("n_src"),
        col("pos").as("pos_src"), col("h"))
    val grouped = extPrefix.join(fullSide2, "h")
      .filter(col("id_src") =!= col("id_dst"))
      .filter((col("n_dst") - col("pos_dst") + 1) * tDen >= lit(tNum) * col("n_src"))
      .groupBy(col("id_src"), col("id_dst"))
      .agg(first(col("n_src")).as("n_src"), count(lit(1)).as("c"),
        max(when(
          (col("n_src") - col("pos_src")) * tDen >= lit(tNum) * col("n_src") &&
          (col("n_dst") - col("pos_dst")) * tDen >= lit(tNum) * col("n_src"),
          1).otherwise(0)).as("w"))
    timed("grouped pairs (ext prefix, relaxed bound)")(
      println(s"  pairs: ${grouped.count()}"))
    val pruned = grouped.filter(
      (col("c") >= 2 || lit(tNum) * col("n_src") <= lit(tDen)) && col("w") === 1)
      .select("id_src", "id_dst")
      .localCheckpoint(true)
    timed("pruned candidates (c>=2 & witness)")(
      println(s"  pairs: ${pruned.count()}"))
    val verified2 = timed("verify joins (on pruned)") {
      val v = pruned
        .join(hashed.select(col("doc_id").as("id_src"), col("hs").as("hs_a")), "id_src")
        .join(hashed.select(col("doc_id").as("id_dst"), col("hs").as("hs_b")), "id_dst")
        .withColumn("overlap",
          graft.functions.GraftFunctions.sortedOverlap(col("hs_a"), col("hs_b")))
        .filter(col("overlap") * lit(tDen) >= lit(tNum) * size(col("hs_a")))
      println(s"  final pairs: ${v.count()}")
      v
    }
    val _2 = verified2
    val verified = timed("verify joins (on ppjoin distinct)") {
      val v = distNew
        .join(hashed.select(col("doc_id").as("id_src"), col("hs").as("hs_a")), "id_src")
        .join(hashed.select(col("doc_id").as("id_dst"), col("hs").as("hs_b")), "id_dst")
        .withColumn("overlap",
          graft.functions.GraftFunctions.sortedOverlap(col("hs_a"), col("hs_b")))
        .filter(col("overlap") * lit(tDen) >= lit(tNum) * size(col("hs_a")))
      println(s"  final pairs: ${v.count()}")
      v
    }
    val _ = verified
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of q91's SemDeDup pipeline.
  * Usage: runMain graft.tools.SemDedupProfile <sfDir>
  */
object SemDedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/dev/shm/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
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

    val emb = graft.queries.Tables.embeddings(spark, sfDir)
    val n = timed("count")(emb.count())
    println(s"  n=$n")
    val nlist = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    println(s"  nlist=$nlist")
    val cents = timed("coarseTrain")(
      graft.operators.Similarity.coarseTrain(emb, $"embedding", $"vec_id", nlist = nlist))
    val dim = cents.head.length
    val centLit = typedLit(cents.map(_.toSeq).toSeq)
    val withCell = emb
      .select($"vec_id".cast("long").as("vec_id"),
        $"embedding".cast("array<double>").as("v"),
        $"label".cast("double").as("q"))
      .filter($"vec_id".isNotNull && size($"v") === dim)
      .withColumn("cell", element_at(
        graft.functions.GraftFunctions.nearestCentroids(spark, $"v", centLit, 1), 1))
      .localCheckpoint(true)
    timed("cell assignment (materialized)")(withCell.count())
    timed("cell histogram") {
      val h = withCell.groupBy($"cell").count()
        .agg(max($"count").as("mx"), avg($"count").as("av")).collect()(0)
      println(s"  max cell=${h.getLong(0)} avg=${h.getDouble(1)}")
    }
    val pairs = withCell.select($"cell", $"vec_id".as("id_a"), $"v".as("va"))
      .join(withCell.select($"cell", $"vec_id".as("id_b"), $"v".as("vb")), Seq("cell"))
      .filter($"id_a" < $"id_b")
      .filter(graft.operators.Similarity.cosine($"va", $"vb") >= 0.35)
      .select($"id_a", $"id_b")
    timed("within-cell pairs")(println(s"  pairs: ${pairs.count()}"))
    val surv = graft.operators.Dedup.semanticPrune(
      emb, $"embedding", $"vec_id", $"label".cast("double"), cents, threshold = 0.35)
    timed("full semanticPrune")(println(s"  survivors: ${surv.count()}"))
    surv.unpersist()
    val pairsCk = pairs.localCheckpoint(true)
    timed("clusters() pointer jumping alone") {
      val c = graft.operators.Dedup.clusters(pairsCk)
      println(s"  labeled: ${c.count()}")
    }
    timed("keepBestPerCluster") {
      val kb = graft.operators.Dedup.keepBestPerCluster(
        withCell.select($"vec_id", $"cell", $"q"), pairsCk, $"vec_id", $"q")
      println(s"  kept: ${kb.count()}")
      kb.unpersist()
    }
    timed("q91 query as written (cold name lookup)") {
      val r = graft.SparkEntry.queries("q91_semantic_prune")(spark, sfDir)
      println(s"  rows: ${r.count()}")
    }
    spark.stop()
  }
}

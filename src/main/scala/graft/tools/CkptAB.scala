package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the two partitioned-checkpoint strategies over
  * the REAL q162 pipeline (same JVM, alternating reps — cancels the
  * host's monotone slowdown that biases sequential comparisons):
  *   A = round-11 two-checkpoint (stage under AQE, re-shuffle in an
  *       AQE-off window)
  *   B = round-12 single checkpoint + LogicalRDD partitioning rewrap
  * Usage: runMain graft.tools.CkptAB <sfDir> [reps]
  */
object CkptAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def oldByKeys(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
      val staged = df.localCheckpoint(true)
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try staged.repartition(keys: _*).localCheckpoint(true)
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        staged.queryExecution.optimizedPlan match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false)
          case _ => ()
        }
      }
    }

    def q162(ckpt: (DataFrame, Seq[org.apache.spark.sql.Column]) => DataFrame): Long = {
      val it = graft.queries.Tables.lineitem(spark, sfDir)
        .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
        .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
        .distinct()
      val edges = it.as("l").join(it.as("r"),
          col("l.b") === col("r.b") && col("l.p") < col("r.p"))
        .select(col("l.p").as("x"), col("r.p").as("y"))
      val canon = edges
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct().localCheckpoint(true)
      val deg = canon.select(col("a").as("node"))
        .unionByName(canon.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val aKey = struct(col("da").as("d"), col("a").as("n"))
      val bKey = struct(col("db").as("d"), col("b").as("n"))
      val fwd = aKey < bKey
      val oriented = ckpt(
        canon
          .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), Seq("a"))
          .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), Seq("b"))
          .select(
            when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("db")).otherwise(col("da")).as("dv"),
            when(fwd, col("b")).otherwise(col("a")).as("v")),
        Seq(col("u")))
      val wedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.u") === col("e2.u") && (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
        .select(col("e1.u").as("pivot"), col("e1.v").as("v"), col("e2.v").as("w"))
      val candidates = graft.operators.BloomJoin.blockedBloomPreFilter(
        wedges, oriented, xxhash64(col("v"), col("w")),
        xxhash64(col("u"), col("v")))
      val tri = candidates.join(
        oriented.select(col("u").as("cv"), col("v").as("cw")).hint("shuffle_hash"),
        col("v") === col("cv") && col("w") === col("cw"))
      tri.select(explode(array(col("pivot"), col("v"), col("w"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri_n")).count()
    }

    // warm-up
    q162((df, ks) => graft.operators.PartitionedCheckpoint.byKeys(df, ks: _*))
    graft.Bench.freeLocalCheckpoints(spark)

    val ta = collection.mutable.ArrayBuffer[Double]()
    val tb = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      var t0 = System.nanoTime()
      val ra = q162((df, ks) => oldByKeys(df, ks: _*))
      ta += (System.nanoTime() - t0) / 1e9
      graft.Bench.freeLocalCheckpoints(spark)
      t0 = System.nanoTime()
      val rb = q162((df, ks) => graft.operators.PartitionedCheckpoint.byKeys(df, ks: _*))
      tb += (System.nanoTime() - t0) / 1e9
      graft.Bench.freeLocalCheckpoints(spark)
      require(ra == rb, s"row mismatch: $ra vs $rb")
    }
    println(f"A(two-ckpt): min ${ta.min}%.2f  all ${ta.map(t => f"$t%.2f").mkString("/")}")
    println(f"B(rewrap)  : min ${tb.min}%.2f  all ${tb.map(t => f"$t%.2f").mkString("/")}")
    spark.stop()
  }
}

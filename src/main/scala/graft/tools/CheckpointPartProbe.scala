package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does Dataset.localCheckpoint preserve HashPartitioning into
  * the LogicalRDD under AQE on/off in this Spark build? Decides the
  * exchange-reuse strategy for the triangle pipeline.
  */
object CheckpointPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val df = (1 to 1000).toDF("x").withColumn("u", col("x") % 50)
        .repartition(col("u"))
        .localCheckpoint(true)
      val lr = df.queryExecution.optimizedPlan
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
      println(s"AQE=$aqe LogicalRDD partitioning: ${lr.outputPartitioning}")
      val j = df.as("a").join(df.as("b"), $"a.u" === $"b.u")
      j.count()
      val ex = j.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(ex).length
      println(s"  self-join exchanges (executed): $nEx")
      // and the subset-key join: partitioned by u, join on (u, x)
      val j2 = df.as("a").join(df.as("b"), $"a.u" === $"b.u" && $"a.x" === $"b.x")
      j2.count()
      val nEx2 = "Exchange".r.findAllIn(j2.queryExecution.executedPlan.toString).length
      println(s"  two-key join exchanges (executed): $nEx2")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual smoke: batch-read a real MRF file through format("payer-mrf"),
  * report chunk/element counts and parse-back timing.
  * Usage: runMain graft.tools.MrfSmoke <path> [perElement]
  */
object MrfSmoke {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val perElement = args.length > 1 && args(1).toBoolean
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    val df = spark.read.format("payer-mrf")
      .option("perElement", perElement.toString).load(path)
    df.groupBy("header_key").count().show(truncate = false)
    println(f"chunk scan+count: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val t1 = System.nanoTime()
    val n = spark.read.json(
      df.filter($"header_key" === "in_network").select("json_payload").as[String])
      .select(explode(col("negotiated_rates")).as("r"))
      .count()
    println(f"in_network rates after full JSON parse: $n (${(System.nanoTime() - t1) / 1e9}%.2f s)")

    // full silver+gold pipeline with explicit schema (no inference pass)
    if (args.length > 2) {
      val Array(billingCode, tinValue) = args(2).split(",")
      val t2 = System.nanoTime()
      val s = graft.pipeline.MrfPipeline.silver(df)
      val gold = graft.pipeline.MrfPipeline.shoppablePrices(
        s.codes, s.prices, s.parProviders, s.providersXPayer, billingCode, tinValue)
      gold.show(5, truncate = false)
      println(f"gold shoppable($billingCode @ $tinValue): ${gold.count()} rows " +
        f"(${(System.nanoTime() - t2) / 1e9}%.2f s incl. silver)")
    }
    spark.stop()
  }
}

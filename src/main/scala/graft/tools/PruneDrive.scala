package graft.tools
import org.apache.spark.sql.SparkSession
object PruneDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.read.format("payer-mrf").option("perElement","true").load("/tmp/mrf/huge.json")
    var t0 = System.nanoTime()
    df.groupBy("header_key").count().show(truncate=false)
    println(f"pruned count (no payload read): ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n = df.filter($"header_key" === "provider_references").count()
    println(f"filtered demux count ($n rows): ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for catalog queries at an arbitrary
  * scale dir under the SAME session confs as `graft.Bench`, one file
  * per query — the plans/r14 before/after evidence the optimization
  * round commits. Usage:
  *   runMain graft.tools.ExplainAt <sfDir> <outDir> <suffix> <name>...
  */
object ExplainAt {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${n}_$suffix.txt")
      graft.Bench.freeLocalCheckpoints(spark)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One local SparkSession per suite (guide: one per suite, lazy). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see graft.Bench: artifact-isolation classloaders turn janino's
      // class-name probes into per-probe RPC round-trips during in-task
      // codegen; across a ~100-test suite that overhead dominates on a
      // loaded host. No artifacts are added in tests — disable.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

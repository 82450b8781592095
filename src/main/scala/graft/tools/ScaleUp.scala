package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata dir by
  * replicating every table K times with disjoint key spaces — a
  * STRESS fixture (size-dependent cliffs: bloom sizing, block caps,
  * codegen limits, driver collects that secretly scale with N), not a
  * correctness oracle. Each replica shifts only the ENTITY KEYS
  * (order/part/supp/cust/doc/vec/event/user ids) by `i * 10^9`, so
  * intra-replica referential integrity is exact: every join that held
  * at the source sf holds per replica, and cross-replica keys never
  * collide. Dimension leaves (region, nation) are copied once —
  * replicas share them, exactly how a 10× fact load shares dims in a
  * warehouse. Text/embedding payloads repeat verbatim, which RAISES
  * duplicate density — harder, not easier, for the dedup family.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [k=10]
  */
object ScaleUp {

  private val shiftCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "region" -> Seq.empty,
    "nation" -> Seq.empty)

  /** Write the K× replica of every table under `dst` (shared
    * entry point for the CLI below and [[Stress]]).
    */
  def replicate(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    // nullable user_id/doc refs survive the shift: null + literal = null
    def shifted(df: DataFrame, cols: Seq[String], i: Int): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i.toLong * 1000000000L)))
    shiftCols.foreach { case (table, cols) =>
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out =
        if (cols.isEmpty) base // shared dimension: one copy
        else (0 until k).map(i => shifted(base, cols, i)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"$table: ${if (cols.isEmpty) "1x (shared dim)" else s"${k}x"} written")
    }
  }

  /** Every table name the replica must contain for a dir to count as
    * an existing stress fixture.
    */
  def tableNames: Seq[String] = shiftCols.keys.toSeq

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicate(spark, src, dst, k)
    spark.stop()
  }
}

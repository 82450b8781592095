package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the blocked-bloom build pass task
  * grain: A = one build task per input partition (32 full filter
  * instances at the session default), B = coalesced to ~2M keys/task
  * (the round-14 `coalesceForBuild`). Build keys are the q162
  * oriented-edge xxhash64(u, v) set. Usage:
  *   runMain graft.tools.BloomBuildAB [sfDir] [reps]
  */
object BloomBuildAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.BlockedBloom

    val it = graft.queries.Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("b"), $"l_partkey".as("p"))
      .distinct()
    val canon = it.as("l").join(it.as("r"),
        col("l.b") === col("r.b") && col("l.p") < col("r.p"))
      .select(col("l.p").as("a"), col("r.p").as("b"))
      .distinct()
      .localCheckpoint(true)
    val keys = canon.select(xxhash64(col("a"), col("b")).as("k"))
    val n = keys.count()
    println(s"build keys: $n")

    def rddAt(parts: Int) = {
      val raw = keys.queryExecution.toRdd
      if (parts > 0 && parts < raw.getNumPartitions)
        raw.coalesce(parts, shuffle = false) else raw
    }
    // A: the round-13 shape — treeAggregate ships a full-size serialized
    // zeroValue with every task
    def buildA(parts: Int): Array[Byte] =
      rddAt(parts).map(_.getLong(0)).treeAggregate(BlockedBloom.create(n, 16))(
        (f, k) => { f.put(k); f },
        (a, b) => a.mergeInPlace(b)).serialized
    // B: round-14 — create-in-task, driver merges serialized partials
    def buildB(parts: Int): Array[Byte] = {
      val partials = rddAt(parts).mapPartitions { it =>
        val f = BlockedBloom.create(n, 16)
        while (it.hasNext) f.put(it.next().getLong(0))
        Iterator.single(f.serialized)
      }.collect()
      val merged = BlockedBloom.deserialize(partials.head)
      partials.tail.foreach(b => merged.mergeInPlace(BlockedBloom.deserialize(b)))
      merged.serialized
    }
    def time(f: () => Array[Byte]): Double = {
      val t0 = System.nanoTime()
      val bytes = f()
      val dt = (System.nanoTime() - t0) / 1e9
      if (bytes.length < 0) println("impossible")
      dt
    }
    val coalesced = math.max(1L, math.min(32L, (n + (2L << 20) - 1) / (2L << 20))).toInt
    println(s"coalesced task count: $coalesced")
    val (t32a, tca, tcb) = (
      scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    for (_ <- 1 to reps) {
      t32a += time(() => buildA(0))
      tca += time(() => buildA(coalesced))
      tcb += time(() => buildB(coalesced))
    }
    def fmt(xs: Seq[Double]) = f"min ${xs.min}%.2f s (${xs.map(t => f"$t%.2f").mkString("/")})"
    println(s"A 32 tasks, tree+zero-ship:        ${fmt(t32a.toSeq)}")
    println(s"A $coalesced tasks, tree+zero-ship: ${fmt(tca.toSeq)}")
    println(s"B $coalesced tasks, create-in-task: ${fmt(tcb.toSeq)}")
    spark.stop()
  }
}

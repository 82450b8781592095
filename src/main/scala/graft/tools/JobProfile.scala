package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock profile of one catalog query: registers a
  * listener, runs the query (after a same-dir warm rep), and prints
  * every Spark job's duration + first-stage name — the gap analysis
  * between a staged profile (which times stages in isolation) and the
  * end-to-end number (which also pays scheduling/planning between
  * them). Usage: runMain graft.tools.JobProfile <sfDir> <query> [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(id: Int, t0: Long, desc: String)
    val open = scala.collection.concurrent.TrieMap.empty[Int, J]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(J, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties.getProperty("spark.job.description"))
          .getOrElse(e.stageInfos.headOption.map(_.name).getOrElse(""))
        open(e.jobId) = J(e.jobId, System.nanoTime(), desc.take(100))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        open.remove(e.jobId).foreach(j => done.add(j -> System.nanoTime()))
    })

    for (rep <- 1 to reps) {
      done.clear()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      graft.Bench.freeLocalCheckpoints(spark)
      Thread.sleep(300) // let listener events drain
      println(f"== rep$rep $name: $total%.2f s ($rows rows)")
      val js = done.toArray(Array.empty[(J, Long)]).sortBy(_._1.t0)
      var prevEnd = t0
      for ((j, tEnd) <- js) {
        val gap = (j.t0 - prevEnd) / 1e9
        println(f"  job ${j.id}%3d  dur ${(tEnd - j.t0) / 1e9}%6.2f s  gap-before $gap%5.2f s  ${j.desc}")
        prevEnd = math.max(prevEnd, tEnd)
      }
      val jobSum = js.map { case (j, e) => (e - j.t0) / 1e9 }.sum
      println(f"  job-dur sum: $jobSum%.2f s (total $total%.2f s)")
    }
    spark.stop()
  }
}

package graft.tools

import java.io.{BufferedInputStream, FileInputStream}
import java.nio.file.{Files, Paths}

import graft.sources.JsonSplitter

/** Multi-file splitter fleet throughput: the scale unit of the MRF
  * source is the FILE (one resumable forward-only splitter per file —
  * `JsonSplitter.scala`), so fleet throughput should scale with cores
  * until memory bandwidth saturates. Two measurements pin that claim:
  *
  *   1. `threads` — N independent splitters over the same (page-cached)
  *      file on a plain thread pool: the pure splitter-kernel scaling
  *      number, no Spark overhead.
  *   2. `spark` — the REAL path: a directory of N hardlinks of the file
  *      read through `format("payer-mrf")` with `splitMode=executors`,
  *      so Spark schedules one split task per file across local[32];
  *      the count() forces full chunk materialization (what a job
  *      actually pays, splitter + row building).
  *
  * Hardlinks make the N-file corpus free to stage (same inode, no
  * copies) without changing what the source sees: N distinct paths.
  * Usage: runMain graft.tools.FleetSplitterBench <file> [N=8] [reps=2]
  */
object FleetSplitterBench {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val n = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 2
    val size = new java.io.File(path).length()
    val totalGb = n * size / 1e9

    // --- mode 1: pure splitter kernels on a thread pool
    def splitOnce(): Long = {
      var bytes = 0L
      val in = new BufferedInputStream(new FileInputStream(path), 8 << 20)
      try new JsonSplitter(in).run {
        case c: JsonSplitter.ArrayChunk => bytes += c.end - c.start
        case _: JsonSplitter.HeaderChunk => ()
      } finally in.close()
      bytes
    }
    splitOnce() // warm page cache + JIT
    for (r <- 1 to reps) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      // shutdown in finally: the pool's threads are non-daemon, so a
      // worker exception escaping _.get() would otherwise leave the
      // JVM hanging after the stack trace
      try {
        val t0 = System.nanoTime()
        val futs = (1 to n).map(_ => pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = splitOnce()
        }))
        val bytes = futs.map(_.get()).sum
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"threads rep $r: $n x ${size / 1e6}%.0f MB in $sec%.2f s = " +
          f"${totalGb / (sec / 60)}%.1f GB/min aggregate " +
          f"(${totalGb / (sec / 60) / n}%.2f GB/min/splitter, $bytes array bytes)")
      } finally pool.shutdown()
    }

    // --- mode 2: the payer-mrf source with executor-side splitting
    val dir = Files.createTempDirectory(Paths.get("/tmp"), "mrf_fleet_")
    try {
      val src = Paths.get(path)
      (1 to n).foreach { i =>
        val dst = dir.resolve(f"copy_$i%02d.json")
        // hardlink (free) when /tmp shares the source filesystem;
        // fall back to a real copy when it doesn't
        try Files.createLink(dst, src)
        catch { case _: Exception => Files.copy(src, dst); () }
      }
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.artifact.isolation.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val rows = spark.read.format("payer-mrf")
          .option("splitMode", "executors")
          .load(dir.toString)
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"spark rep $r: $n files in $sec%.2f s = " +
          f"${totalGb / (sec / 60)}%.1f GB/min aggregate ($rows rows)")
      }
      spark.stop()
    } finally {
      val listing = Files.list(dir)
      try listing.forEach(p => Files.deleteIfExists(p))
      finally listing.close()
      Files.deleteIfExists(dir)
      ()
    }
  }
}

package graft.tools

import java.io.{BufferedInputStream, FileInputStream}

import graft.sources.JsonSplitter

/** Standalone splitter throughput check vs the reference's published
  * 5–7 GB/min (`/root/reference/README.md:111-113`).
  * Usage: runMain graft.tools.SplitterBench <file> [reps]
  */
object SplitterBench {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val size = new java.io.File(path).length()
    for (r <- 1 to reps) {
      var chunks = 0
      var bytes = 0L
      val t0 = System.nanoTime()
      val in = new BufferedInputStream(new FileInputStream(path), 8 << 20)
      try new JsonSplitter(in).run {
        case c: JsonSplitter.ArrayChunk => chunks += 1; bytes += c.end - c.start
        case _: JsonSplitter.HeaderChunk => chunks += 1
      } finally in.close()
      val sec = (System.nanoTime() - t0) / 1e9
      val gbMin = size / 1e9 / (sec / 60)
      println(f"rep $r: ${size / 1e6}%.0f MB in $sec%.2f s = $gbMin%.1f GB/min ($chunks chunks, $bytes array bytes)")
    }
  }
}

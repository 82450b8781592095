package graft.sources

import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Eager gz decompression to a sibling file on the same filesystem —
  * gz is not seekable, and the source's whole design rests on executors
  * seeking into byte ranges. Mirrors the reference
  * (`/root/reference/src/main/scala/com/databricks/
  * JsonMRFSourceProvider.scala:38-46`), with two fixes: the sibling is
  * reused if it already exists (idempotent restarts) and written via a
  * temp file + rename so a crash never leaves a torn output.
  */
object Gunzip {

  def decompressIfNeeded(path: Path, conf: Configuration): Path = {
    val name = path.getName
    if (!name.endsWith(".gz")) return path
    val fs = path.getFileSystem(conf)
    val target = new Path(path.getParent, name.stripSuffix(".gz") match {
      case n if n.endsWith(".json") => n
      case n => n + ".json"
    })
    if (fs.exists(target)) return target
    val tmp = new Path(path.getParent, "." + target.getName + ".tmp")
    val in = new GZIPInputStream(fs.open(path), 1 << 20)
    try {
      val out = fs.create(tmp, true)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally out.close()
    } finally in.close()
    if (!fs.rename(tmp, target) && !fs.exists(target))
      throw new java.io.IOException(s"failed to materialize $target")
    target
  }
}

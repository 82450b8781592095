package graft.sources

import java.io.InputStream
import java.util.zip.{GZIPInputStream, ZipInputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Eager decompression of non-seekable inputs to a sibling file on the
  * same filesystem — the source's whole design rests on executors
  * seeking into byte ranges. Mirrors the reference's gz handling
  * (`/root/reference/src/main/scala/com/databricks/
  * JsonMRFSourceProvider.scala:38-46`), with two fixes: the sibling is
  * reused if it already exists (idempotent restarts) and written via a
  * temp file + rename so a crash never leaves a torn output. Beyond the
  * reference's gz-only support, `.zst`/`.zstd` (zstd-jni ships with
  * Spark) and `.zip` (first entry) are handled — real transparency
  * feeds publish all three.
  */
object Gunzip {

  /** Decompressed sibling basename for a compressed input, None for
    * anything the source reads directly. Shared with the scan's
    * file_name pruning so pushed filters match compressed inputs by
    * their decompressed name too.
    */
  def decompressedName(name: String): Option[String] = {
    val base =
      if (name.endsWith(".gz")) Some(name.stripSuffix(".gz"))
      else if (name.endsWith(".zstd")) Some(name.stripSuffix(".zstd"))
      else if (name.endsWith(".zst")) Some(name.stripSuffix(".zst"))
      else if (name.endsWith(".zip")) Some(name.stripSuffix(".zip"))
      else None
    base.map(b => if (b.endsWith(".json")) b else b + ".json")
  }

  private def decodeStream(name: String, raw: InputStream): InputStream =
    if (name.endsWith(".gz")) new GZIPInputStream(raw, 1 << 20)
    else if (name.endsWith(".zst") || name.endsWith(".zstd"))
      new com.github.luben.zstd.ZstdInputStream(new java.io.BufferedInputStream(raw, 1 << 20))
    else { // .zip: the payload is the first entry
      val z = new ZipInputStream(raw)
      if (z.getNextEntry == null)
        throw new java.io.IOException(s"payer-mrf: zip input $name has no entries")
      z
    }

  // Same-JVM serialization of materializations per target path: two
  // queries decompressing the same archive concurrently must not
  // interleave writes into one temp file (torn sibling), and a stale
  // delete must not yank the target out from under a concurrent reader
  // that just validated it.
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def decompressIfNeeded(path: Path, conf: Configuration): Path = {
    val name = path.getName
    decompressedName(name) match {
      case None => path
      case Some(targetName) =>
        val fs = path.getFileSystem(conf)
        val target = new Path(path.getParent, targetName)
        // reuse the sibling only while it is NEWER than the compressed
        // source — a re-uploaded archive must re-materialize, not be
        // silently shadowed by the stale previous decompression
        def siblingFresh: Boolean =
          fs.exists(target) &&
            fs.getFileStatus(target).getModificationTime >=
              fs.getFileStatus(path).getModificationTime
        if (siblingFresh) return target
        val lock = locks.computeIfAbsent(target.toString, _ => new Object)
        try lockedMaterialize(lock, fs, path, target, name, () => siblingFresh)
        finally
          // evict so the map doesn't grow one entry per archive forever
          // on long-lived drivers; a racer that grabbed the same lock
          // object still holds a working monitor, and one that maps a
          // FRESH object merely risks a duplicate materialization,
          // which the unique-temp + stale-only-delete protocol already
          // tolerates (it is the cross-JVM story)
          locks.remove(target.toString, lock)
    }
  }

  private def lockedMaterialize(
      lock: Object,
      fs: org.apache.hadoop.fs.FileSystem,
      path: Path,
      target: Path,
      name: String,
      siblingFresh: () => Boolean): Path =
    lock.synchronized {
      if (siblingFresh()) return target // another thread just won
      // UNIQUE temp per attempt: concurrent writers outside this
      // JVM's lock (another driver) each write their own file and
      // contend only at the atomic rename, never inside the bytes
      val tmp = new Path(path.getParent,
        "." + target.getName + ".tmp." + java.util.UUID.randomUUID().toString.take(8))
      val in = decodeStream(name, fs.open(path))
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
      // delete ONLY a genuinely stale sibling; if a concurrent
      // writer materialized a fresh one meanwhile, keep theirs
      if (siblingFresh()) {
        fs.delete(tmp, false)
        return target
      }
      fs.delete(target, false) // stale sibling, if any
      if (!fs.rename(tmp, target)) {
        fs.delete(tmp, false)
        if (!fs.exists(target))
          throw new java.io.IOException(s"failed to materialize $target")
      }
      target
    }
}

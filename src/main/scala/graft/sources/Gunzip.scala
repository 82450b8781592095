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
    // case-insensitive match: real feeds publish DATA.JSON.GZ too, and
    // an unmatched archive would reach the splitter as raw binary
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    def strip(suffix: String): String = name.dropRight(suffix.length)
    val base =
      if (lower.endsWith(".gz")) Some(strip(".gz"))
      else if (lower.endsWith(".zstd")) Some(strip(".zstd"))
      else if (lower.endsWith(".zst")) Some(strip(".zst"))
      else if (lower.endsWith(".zip")) Some(strip(".zip"))
      else None
    base.map(b => if (b.toLowerCase(java.util.Locale.ROOT).endsWith(".json")) b else b + ".json")
  }

  private def decodeStream(name: String, raw: InputStream): InputStream = {
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    if (lower.endsWith(".gz")) new GZIPInputStream(raw, 1 << 20)
    else if (lower.endsWith(".zst") || lower.endsWith(".zstd"))
      new com.github.luben.zstd.ZstdInputStream(new java.io.BufferedInputStream(raw, 1 << 20))
    else { // .zip: the payload is the first REAL file entry —
      // folder-zipped archives lead with directory entries, and macOS
      // archives carry __MACOSX/._* AppleDouble FILE entries whose
      // resource-fork bytes would otherwise be materialized as the
      // .json payload (then fail the splitter as malformed — or, under
      // ignoreCorruptFiles, silently contribute zero rows while the
      // bogus sibling shadows the archive on later reads)
      def isMetadata(entryName: String): Boolean = {
        val n = entryName.replace('\\', '/')
        // hidden-basename convention (covers ._AppleDouble and
        // .DS_Store alike — the same leading-dot rule Spark's file
        // listing applies)
        n.startsWith("__MACOSX/") ||
          n.substring(n.lastIndexOf('/') + 1).startsWith(".")
      }
      val z = new ZipInputStream(raw)
      var e = z.getNextEntry
      while (e != null && (e.isDirectory || isMetadata(e.getName))) e = z.getNextEntry
      if (e == null)
        throw new java.io.IOException(s"payer-mrf: zip input $name has no file entries")
      z
    }
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
        } catch {
          case t: Throwable =>
            // a failed/interrupted materialization must not leak the
            // (uniquely named, hidden) temp file — each retry would
            // otherwise strand another multi-GB orphan
            try fs.delete(tmp, false) catch { case _: Exception => () }
            throw t
        }
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

package graft.queries

import java.nio.file.{Files, Path, Paths}

/** Scratch-space selection for gate-harness staging and ephemeral
  * streaming checkpoints.
  *
  * The gate's streaming queries (q19/q43/q44/q50) stage small fixture
  * files and run AvailableNow micro-batches whose checkpoint traffic is
  * metadata-heavy: offset logs, commit logs, and per-partition state
  * store deltas, each with its own create/rename/fsync. On a host whose
  * block device is slow (observed here: syscall-bound I/O where reading
  * the Spark jars costs 4s of pure sys time), those fsyncs dominate the
  * stream's wall-clock and can blow the gate's termination bounds even
  * though the actual data is kilobytes. A RAM-backed tmpfs makes every
  * one of those operations a memory write.
  *
  * This is a HARNESS concern only: the staged inputs are re-creatable
  * fixtures and the checkpoints are ephemeral (AvailableNow runs to
  * completion and the directory is deleted in the query's finally), so
  * tmpfs volatility costs nothing. Production streams pass their own
  * durable checkpoint locations and never come through here.
  */
object Scratch {

  /** `/dev/shm` when present and writable, else `java.io.tmpdir`. */
  lazy val base: Path = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
    else Paths.get(System.getProperty("java.io.tmpdir"))
  }

  def tempDir(prefix: String): Path = Files.createTempDirectory(base, prefix)

  /** Stage a parquet table into `dir` for a file-stream source via
    * symlinks. A single-FILE table (the driver testdata layout) links
    * once under its own name; a DIRECTORY table (Spark's own output
    * layout — any real warehouse table) links each `part-*.parquet`
    * member individually, because the file-stream source lists the
    * staging directory non-recursively and a symlink to a directory
    * contributes zero input files (the sf1 replica sweep caught q19
    * returning 0 rows exactly this way). Callers relying on one
    * micro-batch must not set a per-trigger file limit: AvailableNow
    * takes every staged file in batch 0, so multi-file tables keep
    * single-file semantics (no watermark can drop rows mid-stream).
    */
  def stageTableLinks(dir: Path, table: Path): Unit =
    if (Files.isDirectory(table)) {
      val s = Files.list(table)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith("part-") && n.endsWith(".parquet"))
            Files.createSymbolicLink(dir.resolve(n), p)
        }
      } finally s.close()
    } else
      Files.createSymbolicLink(dir.resolve(table.getFileName.toString), table)

  /** Recursive delete (staging dirs now hold checkpoint subtrees, not
    * just flat files — a plain `deleteIfExists` would throw
    * `DirectoryNotEmptyException` and mask the query's real result).
    * Deliberately quiet on failure: scratch cleanup must never fail a
    * gate query that already produced its answer.
    *
    * NEVER TRAVERSES SYMLINKS: the streaming queries stage input
    * tables by symlinking `$sfDir/<table>.parquet` into their scratch
    * dir (a file-stream source lists a directory, and copying the
    * table would double the staging cost). `File.isDirectory` FOLLOWS
    * links, so the pre-fix recursion descended through the link and
    * deleted the LINK TARGET's contents — the caller's INPUT TABLE.
    * The sf1 full-catalog sweep caught this destroying the writable
    * replica's events/documents tables mid-run (~140 cascade
    * failures); on the driver's read-only testdata the deletes had
    * silently no-op'ed for 13 rounds, which is why no gate ever saw
    * it. A symlink is now unlinked (the link itself, never the
    * target), matching POSIX `rm -r` semantics.
    */
  def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (!Files.isSymbolicLink(p) && f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(c => deleteRecursively(c.toPath)))
    f.delete(): Unit
  }
}

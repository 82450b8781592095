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

  /** Recursive delete (staging dirs now hold checkpoint subtrees, not
    * just flat files — a plain `deleteIfExists` would throw
    * `DirectoryNotEmptyException` and mask the query's real result).
    * Deliberately quiet on failure: scratch cleanup must never fail a
    * gate query that already produced its answer.
    */
  def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(c => deleteRecursively(c.toPath)))
    f.delete(): Unit
  }
}

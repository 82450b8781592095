package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Scratch.deleteRecursively must clean staging trees WITHOUT ever
  * traversing a symlink: the streaming queries stage input tables by
  * symlinking `$sfDir/<table>.parquet` into scratch, and a traversing
  * delete destroys the link TARGET — the caller's input table (the
  * sf1 sweep caught exactly that on a writable replica; read-only
  * testdata had masked it for 13 rounds).
  */
class ScratchSpec extends AnyFunSuite {

  test("deleteRecursively removes a staging tree with nested dirs and plain files") {
    val root = Files.createTempDirectory("scratch_spec_tree")
    val sub = Files.createDirectories(root.resolve("a/b"))
    Files.write(sub.resolve("x.txt"), "x".getBytes)
    Files.write(root.resolve("y.txt"), "y".getBytes)
    Scratch.deleteRecursively(root)
    assert(!Files.exists(root))
  }

  test("deleteRecursively unlinks a dir symlink WITHOUT touching the target's contents") {
    val target = Files.createTempDirectory("scratch_spec_target")
    val keep = target.resolve("precious.parquet")
    Files.write(keep, "do not delete".getBytes)
    val scratch = Files.createTempDirectory("scratch_spec_stage")
    val link = scratch.resolve("staged.parquet")
    Files.createSymbolicLink(link, target)
    try {
      Scratch.deleteRecursively(scratch)
      assert(!Files.exists(scratch), "scratch dir must be gone")
      assert(Files.exists(keep),
        "the symlink TARGET's contents must survive the cleanup")
    } finally Scratch.deleteRecursively(target)
  }

  test("deleteRecursively on a symlink path itself unlinks, never follows") {
    val target = Files.createTempDirectory("scratch_spec_target2")
    Files.write(target.resolve("f"), "f".getBytes)
    val link = Files.createTempDirectory("scratch_spec_holder").resolve("ln")
    Files.createSymbolicLink(link, target)
    try {
      Scratch.deleteRecursively(link)
      assert(!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      assert(Files.exists(target.resolve("f")))
    } finally {
      Scratch.deleteRecursively(link.getParent)
      Scratch.deleteRecursively(target)
    }
  }
}

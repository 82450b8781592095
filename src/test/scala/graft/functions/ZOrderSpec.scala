package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ZOrderKey: kernel bit-layout pinning, null/range contracts, and the
  * property the operator exists for — a z-sorted layout keeps row-group
  * min/max ranges tight on BOTH dimensions, pruning conjunctive
  * predicates a single-column sort cannot.
  */
class ZOrderSpec extends SparkTestBase {

  test("kernel interleaves bit i of column c to output bit i*n+c") {
    // hand-computed: v0=0b101 → bits 0,4; v1=0b011 → bits 1,3 → 27
    assert(ZOrderKernels.interleave(Array(5L, 3L), 3) == 27L)
    assert(ZOrderKernels.interleave(Array(0L, 0L), 16) == 0L)
    // single bits land where the layout says
    assert(ZOrderKernels.interleave(Array(1L, 0L), 4) == 1L)
    assert(ZOrderKernels.interleave(Array(0L, 1L), 4) == 2L)
    assert(ZOrderKernels.interleave(Array(0L, 0L, 1L), 4) == 4L)
    // out-of-range throws rather than interleaving garbage
    intercept[IllegalArgumentException] {
      ZOrderKernels.interleave(Array(16L, 0L), 4)
    }
    intercept[IllegalArgumentException] {
      ZOrderKernels.interleave(Array(-1L, 0L), 4)
    }
  }

  test("column expression: codegen equals kernel; null key gives null") {
    import spark.implicits._
    val df = Seq((5L, 3L), (0L, 15L), (7L, 7L)).toDF("a", "b")
    val got = df.select(GraftFunctions.zorderKey(spark, 4, Seq($"a", $"b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = Seq((5L, 3L), (0L, 15L), (7L, 7L))
      .map { case (a, b) => ZOrderKernels.interleave(Array(a, b), 4) }
    assert(got == want)
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(GraftFunctions.zorderKey(spark, 4, Seq($"a", $"b")).as("z"))
      .collect()
    assert(withNull.head.isNullAt(0))
  }

  test("z-sorted chunks prune a 2-d box predicate better than a 1-d sort") {
    val n = 4096
    val side = 64L
    // deterministic pseudo-grid: every (x, y) pair visited in a fixed
    // scrambled order — no RNG
    val pts = (0 until n).map { i =>
      val x = (i * 2654435761L) % side
      val y = (i * 40503L + 17L) % side
      (x, y)
    }
    val chunks = 16
    val per = n / chunks
    def chunkRanges(sorted: Seq[(Long, Long)]) =
      sorted.grouped(per).map { g =>
        (g.map(_._1).min, g.map(_._1).max, g.map(_._2).min, g.map(_._2).max)
      }.toSeq
    // box predicate: x in [8, 15] AND y in [8, 15]
    def overlapping(rs: Seq[(Long, Long, Long, Long)]) =
      rs.count { case (xlo, xhi, ylo, yhi) =>
        xhi >= 8 && xlo <= 15 && yhi >= 8 && ylo <= 15
      }
    val linear = chunkRanges(pts.sortBy { case (x, y) => (x, y) })
    val zed = chunkRanges(pts.sortBy { case (x, y) =>
      ZOrderKernels.interleave(Array(x, y), 6)
    })
    val (linHit, zHit) = (overlapping(linear), overlapping(zed))
    // the x-sorted layout prunes on x but every chunk spans all of y,
    // so most x-overlapping chunks survive; the z-sorted layout bounds
    // BOTH dimensions per chunk
    assert(zHit < linHit,
      s"z-order should prune more chunks: z hits $zHit vs linear $linHit")
  }
}

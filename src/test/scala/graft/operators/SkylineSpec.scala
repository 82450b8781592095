package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pareto frontier: brute-force parity on random data under any
  * bucketing/partitioning, hand-built tie semantics, and guards.
  */
class SkylineSpec extends SparkTestBase {

  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        (x2 > x && y2 <= y) || (x2 >= x && y2 < y)
      }
    }.toSet

  test("matches the brute-force skyline on random data, any buckets/partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val expect = brute(rows)
    for (buckets <- Seq(1, 7, 64); parts <- Seq(3, 11)) {
      val got = Skyline.paretoFrontier2d(
        rows.toDF("id", "x", "y").repartition(parts),
        $"id", $"x", $"y", buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"buckets=$buckets parts=$parts")
    }
  }

  test("tie semantics: duplicate frontier points all survive; dominated ties drop") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L), // duplicates on the frontier — both live
      (3L, 10L, 6L),                // same x, worse y — dominated
      (4L, 11L, 5L),                // dominates nothing above? x higher, same y → kills 1,2? no: y equal, x strictly greater dominates 1,2
      (5L, 9L, 4L))                 // lower x, better y — lives
    val got = Skyline.paretoFrontier2d(rows.toDF("id", "x", "y"), $"id", $"x", $"y", 4)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute(rows).map(_._1), got.toString)
    // 4 dominates 1 and 2 (x strictly greater, y equal); 5 survives
    assert(got == Set(4L, 5L))
  }

  test("monotone chain: every point on a strictly improving chain survives") {
    import spark.implicits._
    // x and y both increase: each point has the best y at-or-above its x
    val rows = (1L to 20L).map(i => (i, i, i))
    val got = Skyline.paretoFrontier2d(rows.toDF("id", "x", "y"), $"id", $"x", $"y", 5)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute(rows).map(_._1))
    // only the minimum-y point also has maximal... check brute agrees: (i,i,i):
    // j dominates i iff (j>i and j<=i) impossible or (j>=i and j<i) impossible → all survive
    assert(got == (1L to 20L).toSet)
  }

  test("empty input yields an empty frontier; null dimensions fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(Skyline.paretoFrontier2d(empty, $"id", $"x", $"y", 8).count() == 0)
    val withNull = Seq((Some(1L), Some(2L), Option.empty[Long])).toDF("id", "x", "y")
    val ex = intercept[Exception] {
      Skyline.paretoFrontier2d(withNull, $"id", $"x", $"y", 8).collect()
    }
    assert(ex.getMessage.contains("paretoFrontier2d"), ex.getMessage)
  }
}

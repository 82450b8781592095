package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RRF fusion: hand-computed scores, consensus-beats-single-list
  * ordering, duplicate-vote collapse, determinism under partitioning,
  * and guards.
  */
class FusionSpec extends SparkTestBase {

  test("matches hand-computed RRF scores exactly") {
    import spark.implicits._
    // item 1: rank 1 in list A, rank 2 in B → 1/61 + 1/62
    // item 2: rank 2 in A only → 1/62
    // item 3: rank 1 in B only → 1/61
    val ranked = Seq(("A", 1L, 1L), ("B", 1L, 2L), ("A", 2L, 2L), ("B", 3L, 1L))
      .toDF("l", "item", "r")
    val got = Fusion.rrf(ranked, $"l", $"item", $"r", kRrf = 60)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(got(1L) == ((2L, 1.0 / 61.0 + 1.0 / 62.0)))
    assert(got(2L) == ((1L, 1.0 / 62.0)))
    assert(got(3L) == ((1L, 1.0 / 61.0)))
    // consensus wins: item 1 outranks both single-list items
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("duplicate (list, item) votes collapse to the BEST rank") {
    import spark.implicits._
    val ranked = Seq(("A", 1L, 3L), ("A", 1L, 3L), ("A", 1L, 7L))
      .toDF("l", "item", "r")
    val got = Fusion.rrf(ranked, $"l", $"item", $"r").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 1L) // one list, not three
    assert(got(0).getDouble(2) == 1.0 / 63.0) // min rank 3 wins
  }

  test("score is bit-identical under any partitioning (sorted fold)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ranked = (1 to 500).map(i =>
      (s"L${rnd.nextInt(7)}", rnd.nextInt(40).toLong, (rnd.nextInt(50) + 1).toLong))
      .toDF("l", "item", "r")
    val a = Fusion.rrf(ranked.repartition(3), $"l", $"item", $"r")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val b = Fusion.rrf(ranked.repartition(13), $"l", $"item", $"r")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(a == b)
  }

  test("guards: bad k, null item, non-positive rank fail loudly") {
    import spark.implicits._
    val ok = Seq(("A", 1L, 1L)).toDF("l", "item", "r")
    intercept[IllegalArgumentException] { Fusion.rrf(ok, $"l", $"item", $"r", 0) }
    val nullItem = Seq(("A", Option.empty[Long], 1L)).toDF("l", "item", "r")
    val e1 = intercept[Exception] { Fusion.rrf(nullItem, $"l", $"item", $"r").collect() }
    assert(e1.getMessage.contains("Fusion.rrf"), e1.getMessage)
    val zeroRank = Seq(("A", 1L, 0L)).toDF("l", "item", "r")
    val e2 = intercept[Exception] { Fusion.rrf(zeroRank, $"l", $"item", $"r").collect() }
    assert(e2.getMessage.contains("1-based"), e2.getMessage)
  }
}

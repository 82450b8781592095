package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-center greedy: local brute-force replay parity, the
  * non-increasing coverage-radius invariant, extreme-point selection
  * on structured data, early stop, and input hygiene.
  */
class CoresetSpec extends SparkTestBase {

  // the operator's CONTRACT formula — the dot-product decomposition
  // with left-to-right dots (NOT sum((x-y)^2), which differs in ulps)
  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def d2(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, a) - 2.0 * dot(a, b) + dot(b, b)

  private def localGreedy(pts: Map[Long, Seq[Double]], k: Int): Seq[(Long, Option[Double])] = {
    val seed = pts.keys.min
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Option[Double])]((seed, None))
    while (chosen.size < k && chosen.size < pts.size) {
      val remaining = pts.view.filterKeys(id => !chosen.exists(_._1 == id))
      val (bid, bd) = remaining.map { case (id, v) =>
        id -> chosen.map(c => d2(v, pts(c._1))).min
      }.toSeq.maxBy { case (id, d) => (d, -id) }
      chosen += ((bid, Some(bd)))
    }
    chosen.toSeq
  }

  test("matches a local greedy replay on random vectors, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val pts = (1L to 120L).map(i => i -> Seq.fill(6)(rnd.nextGaussian())).toMap
    val df = pts.toSeq.toDF("vec_id", "v").repartition(7)
    val got = Coreset.kCenterGreedy(df, $"v", $"vec_id", k = 6)
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val want = localGreedy(pts, 6)
    assert(got.toSeq == want, s"\ngot  $got\nwant $want")
  }

  test("coverage radius is non-increasing and extremes are picked first on a line") {
    import spark.implicits._
    // points 0..100 on a line, seed = id 0 at x=0 → next pick x=100,
    // then x=50 (farthest from both ends), then 25 or 75 (tie → 25)
    val pts = (0L to 100L).map(i => (i, Seq(i.toDouble)))
    val got = Coreset.kCenterGreedy(pts.toDF("vec_id", "v"), $"v", $"vec_id", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == Seq((1, 0L), (2, 100L), (3, 50L), (4, 25L)), got.toSeq.toString)
    val d2s = Coreset.kCenterGreedy(pts.toDF("vec_id", "v"), $"v", $"vec_id", k = 6)
      .filter($"dist2".isNotNull).orderBy($"rank")
      .collect().map(_.getDouble(2))
    assert(d2s.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
      s"coverage radius increased: ${d2s.toSeq}")
  }

  test("stops early when fewer distinct points than k; hygiene filters apply") {
    import spark.implicits._
    val tiny = Seq((1L, Seq(1.0)), (2L, Seq(5.0))).toDF("vec_id", "v")
    val got = Coreset.kCenterGreedy(tiny, $"v", $"vec_id", k = 5).collect()
    assert(got.length == 2)
    // null-element and empty vectors are excluded, not scored
    val mixed = Seq(
      (1L, Some(Seq(Some(1.0)))),
      (2L, Some(Seq(Option.empty[Double]))),
      (3L, Some(Seq.empty[Option[Double]])))
      .toDF("vec_id", "v")
    val ids = Coreset.kCenterGreedy(mixed, $"v", $"vec_id", k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(ids == Set(1L))
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(tiny, $"v", $"vec_id", k = 0)
    }
  }
}

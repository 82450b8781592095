package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KMV sketches: state = the k smallest DISTINCT hashes under any
  * partitioning, merge ≡ global build (the associativity q126's
  * union-rollup depends on), exact below saturation, estimator
  * accuracy above it, and Jaccard estimation on known overlaps.
  */
class KmvSketchSpec extends SparkTestBase {

  private def sketchOf(ids: Seq[Long], k: Int, parts: Int = 7): Seq[Long] = {
    import spark.implicits._
    val df = ids.toDF("id").repartition(parts)
    KmvSketch.sketch(df, Seq.empty, $"id", k)
      .collect()(0).getSeq[Long](0)
  }

  private def localHashes(ids: Seq[Long]): Seq[Long] = {
    import spark.implicits._
    ids.distinct.toDF("id").select(KmvSketch.hash60($"id").as("h"))
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  test("state is the k smallest distinct hashes, sorted, any partitioning") {
    val ids = (1L to 500L) ++ (1L to 250L) // heavy duplication
    val k = 16
    val expect = localHashes(ids).take(k)
    assert(sketchOf(ids, k, parts = 3) == expect)
    assert(sketchOf(ids, k, parts = 17) == expect)
  }

  test("unsaturated sketch holds every distinct hash and estimates exactly") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 2L, 1L)
    val k = 32
    val got = sketchOf(ids, k)
    assert(got == localHashes(ids))
    val est = KmvSketch.sketch(ids.toDF("id"), Seq.empty, $"id", k)
      .select(KmvSketch.estimate($"kmv", k).as("e")).collect()(0).getDouble(0)
    assert(est == 3.0)
  }

  test("merge of partial states equals the sketch of the union") {
    import spark.implicits._
    val a = (1L to 300L).map(i => ("g", i))
    val b = (200L to 500L).map(i => ("h", i))
    val k = 24
    val parts = KmvSketch.sketch(
      (a ++ b).toDF("grp", "id").repartition(5), Seq("grp"), $"id", k)
    val merged = KmvSketch.mergeStates(parts, Seq.empty, $"kmv", k)
      .collect()(0).getSeq[Long](0)
    val global = localHashes((1L to 500L)).take(k)
    assert(merged == global)
  }

  test("saturated estimator lands within 3 standard errors of the truth") {
    val n = 2000
    val k = 64
    val ids = (1L to n.toLong)
    import spark.implicits._
    val est = KmvSketch.sketch(ids.toDF("id"), Seq.empty, $"id", k)
      .select(KmvSketch.estimate($"kmv", k).as("e")).collect()(0).getDouble(0)
    // KMV relative standard error ≈ 1/sqrt(k-2)
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n) / n < 3 * rse,
      s"estimate $est too far from $n (rse $rse)")
  }

  test("jaccard estimate is exact when both sketches are unsaturated") {
    import spark.implicits._
    // |A|=40, |B|=40, |A∩B|=20, |A∪B|=60 → J = 1/3; k=128 holds all
    val k = 128
    val a = (1L to 40L)
    val b = (21L to 60L)
    val sa = KmvSketch.sketch(a.toDF("id"), Seq.empty, $"id", k)
      .select($"kmv".as("a"))
    val sb = KmvSketch.sketch(b.toDF("id"), Seq.empty, $"id", k)
      .select($"kmv".as("b"))
    val j = sa.crossJoin(sb)
      .select(KmvSketch.jaccardEstimate($"a", $"b", k).as("j"))
      .collect()(0).getDouble(0)
    assert(math.abs(j - 20.0 / 60.0) < 1e-12)
  }

  test("k < 2 and null-unsafe inputs fail loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      KmvSketch.sketch(Seq(1L).toDF("id"), Seq.empty, $"id", 1)
    }
  }
}

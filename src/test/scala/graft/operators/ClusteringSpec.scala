package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Clustering.lloyd]]: the emitted trace is self-consistent under a
  * local replay (assignments from iter t-1 centroids produce iter t's
  * counts exactly and means to 1e-12), seeds are corpus vectors,
  * empty clusters carry their previous centroid, and the whole run is
  * deterministic.
  */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 4
  // two tight blobs + a lone outlier, ids spread so the hash-picked
  // seeds land in both blobs across runs (content determines seeds,
  // not row order)
  private val corpus: Seq[(Long, Seq[Double])] =
    (0 until 12).map(i => (i.toLong, Seq(1.0 + i * 0.01, 1.0, 0.0, 0.0))) ++
      (100 until 112).map(i => (i.toLong, Seq(9.0 + (i - 100) * 0.01, 9.0, 0.0, 0.0))) ++
      Seq((999L, Seq(50.0, 50.0, 50.0, 50.0)))

  private def trace(k: Int, iters: Int, data: Seq[(Long, Seq[Double])] = corpus) =
    Clustering.lloyd(data.toDF("vec_id", "embedding"),
      col("embedding"), col("vec_id"), k = k, iters = iters, dim = dim)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
      .toMap

  private def centsOf(t: Map[(Int, Int, Int), Double], iter: Int, k: Int): Map[Int, Array[Double]] =
    (1 to k).map(c => c -> Array.tabulate(dim)(d => t((iter, c, d)))).toMap

  test("trace replays locally: counts exact, means to 1e-12, seeds are corpus vectors") {
    val k = 3; val iters = 3
    val t = trace(k, iters)
    val vecs = corpus.map { case (_, v) => v.toArray }
    val seed = centsOf(t, 0, k)
    seed.values.foreach(s => assert(vecs.exists(_.sameElements(s)), "seed not a corpus vector"))
    for (it <- 1 to iters) {
      val prev = centsOf(t, it - 1, k)
      // local assignment: the kernel's vv - 2*vc + cc decomposition
      val assigned = vecs.groupBy { v =>
        (1 to k).minBy { c =>
          val ct = prev(c)
          var vv = 0.0; var vc = 0.0; var cc = 0.0
          for (d <- 0 until dim) { vv += v(d) * v(d); vc += v(d) * ct(d); cc += ct(d) * ct(d) }
          (vv - 2.0 * vc + cc, c)
        }
      }
      for (c <- 1 to k) {
        val members = assigned.getOrElse(c, Seq.empty[Array[Double]])
        assert(t((it, c, -1)) == members.length.toDouble, s"iter $it cid $c count")
        val want =
          if (members.isEmpty) centsOf(t, it - 1, k)(c)
          else Array.tabulate(dim)(d => members.map(_(d)).sum / members.length)
        for (d <- 0 until dim)
          assert(math.abs(t((it, c, d)) - want(d)) < 1e-12, s"iter $it cid $c dim $d")
      }
    }
  }

  test("empty clusters keep the previous centroid; run is deterministic") {
    // only two distinct vector values but k=3: two seeds coincide, the
    // duplicate loses every (distance, cid) tie and goes empty
    val dup = (0L to 9L).map(i => (i, Seq(1.0, 0.0, 0.0, 0.0))) ++
      (10L to 19L).map(i => (i, Seq(5.0, 0.0, 0.0, 0.0)))
    val t = trace(3, 2, dup)
    val emptyCids = (1 to 3).filter(c => t((1, c, -1)) == 0.0)
    assert(emptyCids.nonEmpty, "expected at least one empty cluster")
    emptyCids.foreach { c =>
      for (d <- 0 until dim)
        assert(t((1, c, d)) == t((0, c, d)), s"empty cid $c must keep its seed")
    }
    assert(trace(3, 2, dup) == t, "non-deterministic trace")
  }

  test("ragged and null-element vectors drop; too-small corpus fails loudly") {
    val dirty = corpus ++ Seq(
      (500L, Seq(1.0, 2.0)),                       // ragged
      (501L, Seq(Double.NaN, 0.0, 0.0, 0.0)))      // NaN element
    assert(trace(2, 1, dirty) == trace(2, 1))
    intercept[IllegalArgumentException] {
      Clustering.lloyd(Seq((1L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("vec_id", "embedding"),
        col("embedding"), col("vec_id"), k = 5, iters = 1, dim = dim)
    }
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** JL random projection: local JVM replay of the md5 matrix + dots,
  * distance preservation on real embeddings, corrupt-input drops, and
  * the matvec kernel vs the HOF formulation.
  */
class RandomProjectSpec extends SparkTestBase {

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def localCoin(s: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 2 == 0
  }

  test("matches a local replay of the md5 matrix and ordered dots exactly") {
    import spark.implicits._
    val (inDim, outDim, seed) = (4, 3, 11)
    val vecs = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq(-1.0, 0.5, 0.0, 2.25)))
    val got = Similarity.randomProject(
      vecs.toDF("vec_id", "embedding"), $"embedding", $"vec_id", inDim, outDim, seed)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val matrix = Array.tabulate(outDim, inDim)((k, j) =>
      if (localCoin(s"jl_${seed}_${k}_${j}")) 1.0 else -1.0)
    vecs.foreach { case (id, v) =>
      for (k <- 0 until outDim) {
        var dot = 0.0
        for (j <- 0 until inDim) dot += v(j) * matrix(k)(j)
        val expect = dot / math.sqrt(outDim.toDouble)
        assert(got((id, k)) == expect, s"vec $id dim $k: ${got((id, k))} != $expect")
      }
    }
  }

  test("preserves pairwise distances within JL distortion on real embeddings") {
    import spark.implicits._
    val outDim = 16
    val proj = Similarity.randomProject(embs, $"embedding", $"vec_id", 64, outDim)
      .groupBy($"vec_id").agg(sort_array(collect_list(struct($"dim_idx", $"value"))).as("p"))
      .select($"vec_id", expr("transform(p, x -> x.value)").as("pv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val orig = embs.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val rnd = new scala.util.Random(3)
    val ids = orig.keys.toArray.sorted
    val ratios = (1 to 200).map { _ =>
      val a = ids(rnd.nextInt(ids.length))
      val b = ids(rnd.nextInt(ids.length))
      if (a == b) 1.0
      else d2(proj(a), proj(b)) / d2(orig(a), orig(b))
    }
    // E[ratio] = 1; k=16 gives loose but real concentration. Median
    // must sit near 1 and no pair may distort catastrophically.
    val sorted = ratios.sorted
    val median = sorted(ratios.size / 2)
    assert(median > 0.7 && median < 1.4, s"median distortion $median")
    assert(sorted.head > 0.05 && sorted.last < 5.0,
      s"distortion range [${sorted.head}, ${sorted.last}]")
  }

  test("wrong-dimension and null-element vectors emit no rows") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0)))),
      (2L, Some(Seq(Some(1.0)))), // ragged
      (3L, Some(Seq(Some(1.0), None))), // null element
      (4L, Option.empty[Seq[Option[Double]]])) // null vector
      .toDF("vec_id", "embedding")
    val got = Similarity.randomProject(vecs, $"embedding", $"vec_id", 2, 3)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("matvec kernel equals the zip_with/aggregate HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("id", "v")
    val rows = array((0 until 4).map(k =>
      array((0 until 8).map(j => lit(if ((k + j) % 3 == 0) 1.0 else -1.0)): _*)): _*)
    val kernel = df.select($"id",
      graft.functions.GraftFunctions.matVec($"v", rows).as("p"))
    val hof = df.select($"id",
      expr("transform(sequence(0, 3), k -> aggregate(zip_with(v, " +
        "transform(sequence(0, 7), j -> CASE WHEN (k + j) % 3 = 0 THEN 1.0 ELSE -1.0 END), " +
        "(a, b) -> a * b), 0.0D, (acc, x) -> acc + x))").as("p"))
    val a = kernel.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = hof.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }
}

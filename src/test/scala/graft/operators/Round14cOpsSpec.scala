package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-14c operators: Heaps' law vocabulary-growth fit (hand-worked
  * OLS, exact degenerate slopes, guards) and the MAUVE-style
  * divergence frontier (identical-sides zero, disjoint-cluster closed
  * form, guards, order invariance).
  */
class Round14cOpsSpec extends SparkTestBase {

  import spark.implicits._

  // ---- heapsFit ------------------------------------------------------

  test("heaps: hand-worked 4-checkpoint growth matches a local OLS replay") {
    // maxId=3, C=4: fi = clamp(ceil(id*4/3),1,4) = [1,2,3,4]
    // N = [2,4,6,8], V = [2,3,4,5]
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "a d"), (3L, "a e"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(docs, col("doc_id"), col("text"),
      checkpoints = 4).collect()(0) // bounded: one summary row
    assert(r.getAs[Long]("n_points") === 4L)
    assert(r.getAs[Long]("n_tokens") === 8L)
    assert(r.getAs[Long]("n_vocab") === 5L)
    // local replay of the identical fold
    val pts = Seq((2.0, 2.0), (4.0, 3.0), (6.0, 4.0), (8.0, 5.0))
      .map { case (n, v) => (math.log(n), math.log(v)) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (4 * sxy - sx * sy) / (4 * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-12)
    assert(math.abs(r.getAs[Double]("ln_k") - (sy - beta * sx) / 4) < 1e-12)
  }

  test("heaps: all-unique tokens give beta exactly 1; pure template flattens toward 0") {
    val unique = (0L until 8L).map(i => (i, s"tok${i}a tok${i}b tok${i}c"))
      .toDF("doc_id", "text")
    val u = TextAnalysis.heapsFit(unique, col("doc_id"), col("text"),
      checkpoints = 4).collect()(0) // bounded: one summary row
    // V(N) = N exactly -> ln V = ln N -> slope is numerically exactly 1
    assert(u.getAs[Double]("beta") === 1.0)
    assert(u.getAs[Double]("ln_k") === 0.0)
    val template = (0L until 8L).map(i => (i, "same words every time"))
      .toDF("doc_id", "text")
    val t = TextAnalysis.heapsFit(template, col("doc_id"), col("text"),
      checkpoints = 4).collect()(0) // bounded: one summary row
    assert(t.getAs[Long]("n_vocab") === 4L)
    assert(t.getAs[Double]("beta") < 0.05)
  }

  test("heaps: guards — one-doc corpus and negative ids raise") {
    val e1 = intercept[Exception] {
      TextAnalysis.heapsFit(Seq((0L, "a b c")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), checkpoints = 4)
        .collect() // bounded: one summary row; the raise fires first
    }
    assert(e1.getMessage.contains("at least 2 non-empty checkpoints"))
    val e2 = intercept[Exception] {
      TextAnalysis.heapsFit(Seq((-1L, "a"), (5L, "b")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), checkpoints = 4)
        .collect() // bounded: one summary row; the raise fires first
    }
    assert(e2.getMessage.contains("non-negative"))
  }

  // ---- divergenceFrontier --------------------------------------------

  private def vec(seed: Int): Seq[Double] =
    (0 until 64).map(d => math.sin(seed * 64 + d).abs + 0.1)

  test("divergence frontier: identical sides score exactly 0 on both arms") {
    // even and odd ids carry the SAME vectors -> p == q per cell
    val rows = (0 until 20).flatMap(i =>
      Seq((2L * i, vec(i)), (2L * i + 1, vec(i))))
    val out = Similarity.divergenceFrontier(
      rows.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), col("vec_id") % 2 === 0,
      anchors = 8, lambdaDen = 8)
      .collect() // bounded: 7 lambda rows
    assert(out.length === 7)
    out.foreach { r =>
      assert(r.getAs[Double]("kl_p") === 0.0)
      assert(r.getAs[Double]("kl_q") === 0.0)
      assert(r.getAs[Long]("n_p") === 20L && r.getAs[Long]("n_q") === 20L)
    }
  }

  test("divergence frontier: fully separated sides hit the -ln(lambda) closed form") {
    // all P mass in one cell, all Q mass in another:
    // kl_p = -ln(lam), kl_q = -ln(1 - lam)
    val pSide = (0 until 10).map(i => (2L * i, Seq.fill(64)(0.0)))
    val qSide = (0 until 10).map(i => (2L * i + 1, Seq.fill(64)(10.0)))
    val out = Similarity.divergenceFrontier(
      (pSide ++ qSide).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), col("vec_id") % 2 === 0,
      anchors = 2, lambdaDen = 8)
      .collect().map(r => r.getAs[Long]("lam_num") -> r).toMap // bounded: 7 rows
    for (j <- 1L to 7L) {
      val lam = j.toDouble / 8.0
      assert(math.abs(out(j).getAs[Double]("kl_p") + math.log(lam)) < 1e-12)
      assert(math.abs(out(j).getAs[Double]("kl_q") + math.log(1.0 - lam)) < 1e-12)
    }
  }

  test("divergence frontier: input row order never changes the result") {
    val rows = (0 until 30).map(i => (i.toLong, vec(i % 7)))
    val a = Similarity.divergenceFrontier(rows.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), col("vec_id") % 2 === 0,
      anchors = 4, lambdaDen = 4).collect().map(_.toSeq) // bounded: 3 rows
    val b = Similarity.divergenceFrontier(
      rows.reverse.toDF("vec_id", "embedding").repartition(7),
      col("vec_id"), col("embedding"), col("vec_id") % 2 === 0,
      anchors = 4, lambdaDen = 4).collect().map(_.toSeq) // bounded: 3 rows
    assert(a.toSeq === b.toSeq)
  }

  test("divergence frontier: an empty side raises loudly") {
    val rows = (0 until 10).map(i => (2L * i, vec(i))) // even ids only
    val e = intercept[Exception] {
      Similarity.divergenceFrontier(rows.toDF("vec_id", "embedding"),
        col("vec_id"), col("embedding"), col("vec_id") % 2 === 0,
        anchors = 4, lambdaDen = 8)
        .collect() // bounded: 7 rows; the raise fires first
    }
    assert(e.getMessage.contains("one side is empty"))
  }
}

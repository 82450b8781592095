package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PCA: known eigenstructure recovered on hand-built data, MAXIMALITY
  * (fit returns the TOP k of the full spectrum — the half of
  * verification the SQL certificate can't pin), certificate
  * properties on real embeddings, partition stability, and guards.
  */
class PcaSpec extends SparkTestBase {

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("recovers a planted dominant direction on hand-built data") {
    import spark.implicits._
    // points on the line t*(3,4)/5 + tiny noise in the orthogonal
    // direction: top eigenvector must align with (0.6, 0.8)
    val rnd = new scala.util.Random(1)
    val rows = (1 to 400).map { _ =>
      val t = rnd.nextGaussian() * 10
      val e = rnd.nextGaussian() * 0.01
      Seq(0.6 * t - 0.8 * e, 0.8 * t + 0.6 * e)
    }
    val m = Pca.fit(rows.toDF("v"), $"v", dim = 2, topK = 2)
    val v0 = m.eigvecs(0)
    val align = math.abs(v0(0) * 0.6 + v0(1) * 0.8)
    assert(align > 0.9999, s"top eigenvector ${v0.toSeq} misaligned ($align)")
    assert(m.eigvals(0) > 50 && m.eigvals(1) < 0.01,
      s"eigvals ${m.eigvals.toSeq} don't separate signal from noise")
  }

  test("MAXIMALITY: topK eigvals equal the largest of the full spectrum") {
    import spark.implicits._
    val dim = 16
    val base = embs.select(expr("slice(cast(embedding as array<double>), 1, 16)").as("v"))
    val top = Pca.fit(base, $"v", dim, topK = 4)
    val full = Pca.fit(base, $"v", dim, topK = dim)
    // full spectrum sorted desc by construction; top-4 must match its head
    (0 until 4).foreach { k =>
      assert(math.abs(top.eigvals(k) - full.eigvals(k)) < 1e-9,
        s"top-4[$k]=${top.eigvals(k)} != full[$k]=${full.eigvals(k)}")
    }
    // and the full spectrum's trace equals the covariance trace
    val vals = base.collect().map(_.getSeq[Double](0).toArray)
    val n = vals.length
    val mean = Array.tabulate(dim)(j => vals.map(_(j)).sum / n)
    val trace = (0 until dim).map { j =>
      vals.map(v => (v(j) - mean(j)) * (v(j) - mean(j))).sum / (n - 1)
    }.sum
    assert(math.abs(full.eigvals.sum - trace) < 1e-6 * math.max(1.0, math.abs(trace)),
      s"spectrum sum ${full.eigvals.sum} != trace $trace")
  }

  test("certificate properties hold on real embeddings under any partitioning") {
    import spark.implicits._
    def check(parts: Int): Pca.Model = {
      val m = Pca.fit(embs.repartition(parts), $"embedding", dim = 64, topK = 4)
      // orthonormal
      for (a <- 0 until 4; b <- 0 until 4) {
        val dot = (0 until 64).map(j => m.eigvecs(a)(j) * m.eigvecs(b)(j)).sum
        val want = if (a == b) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-9, s"dot($a,$b)=$dot")
      }
      // descending, non-negative-ish
      (0 until 3).foreach(k => assert(m.eigvals(k) >= m.eigvals(k + 1) - 1e-12))
      assert(m.eigvals(3) > -1e-9)
      // sign pin: largest |component| is positive
      m.eigvecs.foreach { v =>
        val bi = v.indices.maxBy(i => (math.abs(v(i)), -i))
        assert(v(bi) > 0, s"sign not pinned: ${v.toSeq}")
      }
      m
    }
    val a = check(2)
    val b = check(11)
    // partition order shifts float sums only in the last ulps — the
    // solved eigenvalues must agree far tighter than the oracle band
    (0 until 4).foreach(k =>
      assert(math.abs(a.eigvals(k) - b.eigvals(k)) < 1e-9,
        s"eigval $k drifted: ${a.eigvals(k)} vs ${b.eigvals(k)}"))
  }

  test("project: coordinates equal centered dots; variance concentrates on top components") {
    import spark.implicits._
    val m = Pca.fit(embs, $"embedding", dim = 64, topK = 4)
    val coords = Pca.project(embs, $"embedding", $"vec_id", m)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val raw = embs.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(coords.size == raw.size * 4)
    raw.foreach { case (id, v) =>
      for (k <- 0 until 4) {
        var dot = 0.0
        var c = 0.0
        for (j <- 0 until 64) { dot += v(j) * m.eigvecs(k)(j); c += m.mean(j) * m.eigvecs(k)(j) }
        assert(coords((id, k)) == dot - c, s"vec $id comp $k")
      }
    }
    // sample variance along component k estimates λ_k
    val n = raw.size
    for (k <- 0 until 4) {
      val cs = raw.keys.map(id => coords((id, k))).toArray
      val mu = cs.sum / n
      val varK = cs.map(x => (x - mu) * (x - mu)).sum / (n - 1)
      assert(math.abs(varK - m.eigvals(k)) < 1e-6 * math.max(1.0, m.eigvals(k)),
        s"component $k variance $varK != eigval ${m.eigvals(k)}")
    }
  }

  test("co-moment sums from disjoint slices merge into the whole-corpus model") {
    import spark.implicits._
    val a = Pca.sumsOf(embs.filter($"vec_id" % 2 === 0), $"embedding", 64)
    val b = Pca.sumsOf(embs.filter($"vec_id" % 2 === 1), $"embedding", 64)
    val merged = a.zip(b).map { case (x, y) => x + y }
    val m1 = Pca.modelFromSums(merged, 64, 4)
    val m2 = Pca.fit(embs, $"embedding", 64, 4)
    assert(m1.n == m2.n)
    (0 until 4).foreach { k =>
      // float sums differ only in merge order — eigenvalues must agree
      // far tighter than the oracle's certificate band
      assert(math.abs(m1.eigvals(k) - m2.eigvals(k)) < 1e-9,
        s"eigval $k: ${m1.eigvals(k)} vs ${m2.eigvals(k)}")
    }
  }

  test("ragged vectors and degenerate inputs fail loudly") {
    import spark.implicits._
    val ragged = Seq(Seq(1.0, 2.0), Seq(1.0)).toDF("v")
    val ex = intercept[Exception] { Pca.fit(ragged, $"v", dim = 2, topK = 1) }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] {
      Pca.fit(Seq(Seq(1.0)).toDF("v"), $"v", dim = 1, topK = 2)
    }
    val one = Seq(Seq(1.0, 2.0)).toDF("v")
    val ex2 = intercept[IllegalArgumentException] { Pca.fit(one, $"v", dim = 2, topK = 1) }
    assert(ex2.getMessage.contains("at least 2"), ex2.getMessage)
  }
}

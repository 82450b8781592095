package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PmiZscoreSpec extends SparkTestBase {
  import spark.implicits._

  test("pmiCollocations matches the hand replay; minCount floors; topK bounds") {
    // pairs: (a b)x6 from doc1, (b c)x1, (c a)x5 via doc2's cycle
    val docs = Seq(
      "a b a b a b a b a b a b", // (a,b)x6 (b,a)x5
      "c a c a c a c a c a b c") // (c,a)x5 (a,c)x5 (a,b)x1 (b,c)x1
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, $"text", minCount = 5L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val allPairs = Seq("a b a b a b a b a b a b", "c a c a c a c a c a b c")
      .flatMap(_.split(" ").sliding(2).map(p => (p(0), p(1))))
    val pc = allPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = allPairs.size.toDouble
    val m1 = pc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val m2 = pc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val expect = pc.filter(_._2 >= 5L).map { case ((w1, w2), c12) =>
      (w1, w2) -> ((c12, math.log(c12.toDouble * n / (m1(w1).toDouble * m2(w2).toDouble))))
    }
    assert(out.keySet == expect.keySet,
      s"minCount floor must keep exactly the >=5 pairs: $out vs $expect")
    for ((k, (c, p)) <- expect) {
      assert(out(k)._1 == c && math.abs(out(k)._2 - p) < 1e-12, s"pair $k")
    }
    // topK truly bounds
    val one = TextAnalysis.pmiCollocations(docs, $"text", minCount = 1L, topK = 1).collect()
    assert(one.length == 1)
    intercept[IllegalArgumentException] {
      TextAnalysis.pmiCollocations(docs, $"text", minCount = 0L)
    }
    intercept[Exception] {
      TextAnalysis.pmiCollocations(
        Seq((1L, "solo")).toDF("doc_id", "text"), $"text").collect()
    }
  }

  test("zscoreOutliers computes exact-statistics z; degenerate groups emit nothing") {
    // group g: values 0,0,0,0,100 → μ=20, σ²=(10000/5 − 400)=1600,
    // σ=40, z(100)=2 — below 3, nothing; threshold 1.9 → one row z=2
    val df = Seq(
      ("g", 1L, 0.0), ("g", 2L, 0.0), ("g", 3L, 0.0), ("g", 4L, 0.0), ("g", 5L, 100.0),
      ("const", 6L, 7.0), ("const", 7L, 7.0), // σ=0 → nothing
      ("solo", 8L, 99.0)) // single row → nothing
      .toDF("t", "id", "v")
    val none = Profiling.zscoreOutliers(df, $"t", $"id", $"v", 3.0).collect()
    assert(none.isEmpty)
    val hit = Profiling.zscoreOutliers(df, $"t", $"id", $"v", 1.9)
      .collect()
    assert(hit.length == 1 && hit.head.getLong(1) == 5L && hit.head.getDouble(3) == 2.0,
      s"exact z must be 2.0, got ${hit.toSeq}")
    intercept[IllegalArgumentException] {
      Profiling.zscoreOutliers(df, $"t", $"id", $"v", 0.0)
    }
  }

  test("groupedCorr: perfect lines hit ±1, degenerate groups null") {
    val df = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0), // r = 1
      ("down", 1.0, 9.0), ("down", 2.0, 6.0), ("down", 3.0, 3.0), // r = -1
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), // y constant → null
      ("solo", 1.0, 1.0)) // n = 1 → null
      .toDF("t", "x", "y")
    val out = Profiling.groupedCorr(df, $"t", $"x", $"y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(math.abs(out("up").get - 1.0) < 1e-12)
    assert(math.abs(out("down").get + 1.0) < 1e-12)
    assert(out("flat").isEmpty && out("solo").isEmpty)
    // repartition-invariant: decimal statistics are order-free
    val a = Profiling.groupedCorr(df, $"t", $"x", $"y").orderBy($"group").collect()
    val b = Profiling.groupedCorr(df.repartition(5), $"t", $"x", $"y")
      .orderBy($"group").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("madOutliers: hand-computed modified z; MAD immune to the spike; mad=0 flags nothing") {
    // g: 1,2,3,4,5,1000 → median 3.5, deviations 2.5,1.5,.5,.5,1.5,996.5
    // → MAD 1.5; rz(1000) = .6745*996.5/1.5 = 448.09...; rz(1) =
    // .6745*(-2.5)/1.5 ≈ -1.12 (inlier). A mean/σ z-score would have
    // had σ ≈ 406 and z(1000) ≈ 2.04 — the spike hides itself.
    val df = Seq(
      ("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("g", 4L, 4.0), ("g", 5L, 5.0), ("g", 6L, 1000.0),
      ("z", 7L, 5.0), ("z", 8L, 5.0), ("z", 9L, 99.0)) // median 5, MAD 0
      .toDF("t", "id", "v")
    val out = Profiling.madOutliers(df, $"t", $"id", $"v", threshold = 3.5).collect()
    assert(out.length == 1 && out.head.getLong(1) == 6L)
    val rz = out.head.getDouble(3)
    assert(math.abs(rz - 0.6745 * 996.5 / 1.5) < 1e-9, s"got $rz")
    // the classic z-score misses the same spike at the same cutoff
    assert(Profiling.zscoreOutliers(df.filter($"t" === "g"), $"t", $"id", $"v", 3.5)
      .collect().isEmpty, "mean/sigma is fooled by its own outlier")
    // approx medians converge to exact at high accuracy
    val approx = Profiling.madOutliers(df, $"t", $"id", $"v", 3.5,
      approxAccuracy = Some(10000)).collect()
    assert(approx.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).toSeq)
    intercept[IllegalArgumentException] {
      Profiling.madOutliers(df, $"t", $"id", $"v", 0.0)
    }
    intercept[IllegalArgumentException] {
      Profiling.madOutliers(df, $"t", $"id", $"v", 3.5, approxAccuracy = Some(1))
    }
  }

  test("chiSquare: independent table scores ~0, perfect dependence scores n·(min(r,c)−1)") {
    // perfectly independent 2×2 (every e equals o) → chi2 = 0
    val indep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(40)(("y", "q")))
      .toDF("a", "b")
    val r1 = Profiling.chiSquare(indep, $"a", $"b").collect().head
    assert(r1.getLong(0) == 90L && r1.getLong(3) == 1L)
    assert(math.abs(r1.getDouble(4)) < 1e-9, s"independent → 0, got ${r1.getDouble(4)}")
    // perfect 2×2 dependence (diagonal only) → chi2 = n exactly
    val dep = (Seq.fill(50)(("x", "p")) ++ Seq.fill(50)(("y", "q"))).toDF("a", "b")
    val r2 = Profiling.chiSquare(dep, $"a", $"b").collect().head
    assert(r2.getDouble(4) == 100.0 && r2.getLong(3) == 1L)
    // null categories drop
    val withNull = dep.union(Seq((null: String, "p")).toDF("a", "b"))
    assert(Profiling.chiSquare(withNull, $"a", $"b").collect().head.getLong(0) == 100L)
  }

  test("psi: identical distributions score 0; a known shift matches the hand formula; one-sided categories fail loudly") {
    // ref: p 50/100, q 50/100; cur: p 25/100, q 75/100
    val df = (Seq.fill(50)(("p", false)) ++ Seq.fill(50)(("q", false)) ++
      Seq.fill(25)(("p", true)) ++ Seq.fill(75)(("q", true))).toDF("c", "cur")
    val out = Profiling.psi(df, $"c", $"cur")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val expP = (0.25 - 0.5) * math.log(0.25 / 0.5)
    val expQ = (0.75 - 0.5) * math.log(0.75 / 0.5)
    assert(math.abs(out("p") - expP) < 1e-12 && math.abs(out("q") - expQ) < 1e-12)
    // no drift → every term 0
    val same = (Seq.fill(30)(("p", false)) ++ Seq.fill(30)(("p", true)) ++
      Seq.fill(10)(("q", false)) ++ Seq.fill(10)(("q", true))).toDF("c", "cur")
    assert(Profiling.psi(same, $"c", $"cur").collect()
      .forall(r => math.abs(r.getDouble(3)) < 1e-12))
    // category only on one side → loud
    val oneSided = (Seq.fill(5)(("p", false)) ++ Seq.fill(5)(("q", true))).toDF("c", "cur")
    val e = intercept[Exception] {
      Profiling.psi(oneSided, $"c", $"cur").collect()
    }
    assert(e.getMessage.contains("one side"))
    intercept[IllegalArgumentException] {
      Profiling.psi(df.filter($"cur"), $"c", $"cur")
    }
  }

  test("zscoreOutliers is repartition-invariant (decimal stats are order-free)") {
    // uniform base (max z ≈ 1.7) plus genuine spikes so the threshold
    // actually selects rows
    val df = (1 to 3000).map(i =>
      (s"g${i % 3}", i.toLong,
        if (i % 500 == 0) 5000.0 else (i % 97) * 1.37 + (i % 13)))
      .toDF("t", "id", "v")
    val a = Profiling.zscoreOutliers(df, $"t", $"id", $"v", 2.0)
      .orderBy($"group", $"id").collect()
    val b = Profiling.zscoreOutliers(df.repartition(17), $"t", $"id", $"v", 2.0)
      .orderBy($"group", $"id").collect()
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }
}

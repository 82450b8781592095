package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-14b operators: token-level WER (kernel parity + edge
  * contracts), Krippendorff's alpha (hand-worked rationals, the
  * unequal-ratings semantics Fleiss can't express, guards), Cliff's
  * delta (brute-force pair parity, band boundaries), and Page–Hinkley
  * (hand-worked trajectory, order invariance, guards).
  */
class Round14bOpsSpec extends SparkTestBase {

  import spark.implicits._

  // ---- wordErrorRate -------------------------------------------------

  private def werRow(hyp: String, ref: String, cap: Int = 128) =
    TextAnalysis.wordErrorRate(
      Seq((1L, hyp, ref)).toDF("pid", "h", "r"),
      col("pid"), col("h"), col("r"), maxTokens = cap)
      .collect()(0) // bounded: one pair in, one row out

  test("wer: identical texts score 0") {
    val r = werRow("the quick brown fox", "the quick brown fox")
    assert(r.getAs[Long]("dist") === 0L)
    assert(r.getAs[Double]("wer") === 0.0)
  }

  test("wer: one substitution + one deletion over a 4-token reference = 0.5") {
    // ref "a b c d" -> hyp "a x c": sub b->x, delete d
    val r = werRow("a x c", "a b c d")
    assert(r.getAs[Long]("dist") === 2L)
    assert(r.getAs[Double]("wer") === 0.5)
  }

  test("wer: empty hypothesis scores all-deletions; empty reference is undefined") {
    val allDel = werRow("", "a b c")
    assert(allDel.getAs[Long]("dist") === 3L && allDel.getAs[Double]("wer") === 1.0)
    val undef = werRow("a b", "")
    assert(undef.getAs[Long]("dist") === 2L && undef.isNullAt(undef.fieldIndex("wer")))
    val both = werRow("", "")
    assert(both.getAs[Long]("dist") === 0L && both.getAs[Double]("wer") === 0.0)
  }

  test("wer: can exceed 1 when insertions outnumber the reference") {
    val r = werRow("a b c d e f", "a")
    assert(r.getAs[Long]("dist") === 5L)
    assert(r.getAs[Double]("wer") === 5.0)
  }

  test("wer: maxTokens caps both sides (documented contract)") {
    val r = werRow(("x " * 50).trim, ("x " * 300).trim, cap = 10)
    assert(r.getAs[Long]("h_len") === 10L && r.getAs[Long]("r_len") === 10L)
    assert(r.getAs[Long]("dist") === 0L)
  }

  test("wer kernel: token-level distance equals char levenshtein on single-char tokens") {
    // on single-char tokens the token DP degenerates to the character
    // DP, so the builtin is an independent oracle for the kernel
    val rnd = new scala.util.Random(14)
    val rows = (1 to 60).map { i =>
      def s() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (i.toLong, s(), s())
    }
    val df = rows.toDF("pid", "a", "b")
      .withColumn("at", filter(split(col("a"), ""), x => x =!= ""))
      .withColumn("bt", filter(split(col("b"), ""), x => x =!= ""))
    val bad = df.select(
      graft.functions.GraftFunctions.tokenLev(col("at"), col("bt")).as("tok"),
      levenshtein(col("a"), col("b")).as("ch"))
      .filter(col("tok") =!= col("ch")).count()
    assert(bad === 0L)
  }

  // ---- krippendorffAlpha ---------------------------------------------

  private def alphaOf(ratings: Seq[(String, String)]) =
    Experiment.krippendorffAlpha(
      ratings.toDF("u", "c"), col("u"), col("c"))
      .collect()(0) // bounded: one summary row

  test("krippendorff: hand-worked unequal-ratings example is exactly 1/2") {
    // u1 {a,a} m=2, u2 {a,b} m=2, u3 {b,b,b} m=3, u4 {c} dropped (m=1)
    // n=7, n_a=3, n_b=4, spread=49-25=24, W=0+2+0=2
    // alpha = 1 - 6*2/24 = 0.5
    val r = alphaOf(Seq(
      "u1" -> "a", "u1" -> "a", "u2" -> "a", "u2" -> "b",
      "u3" -> "b", "u3" -> "b", "u3" -> "b", "u4" -> "c"))
    assert(r.getAs[Long]("n_units") === 3L)
    assert(r.getAs[Long]("n_values") === 7L)
    assert(r.getAs[Long]("n_categories") === 2L) // c left with the dropped unit
    assert(r.getAs[Double]("alpha") === 0.5)
    // exact rational digests: num/den = 360360*24 - 6*2*360360 -> 1/2
    val num = BigInt(r.getAs[String]("alpha_num"))
    val den = BigInt(r.getAs[String]("alpha_den"))
    assert(num * 2 === den)
  }

  test("krippendorff: perfect agreement is exactly 1, worse-than-chance goes negative") {
    val perfect = alphaOf(Seq(
      "u1" -> "a", "u1" -> "a", "u2" -> "b", "u2" -> "b"))
    assert(perfect.getAs[Double]("alpha") === 1.0)
    // u1 {a,b}, u2 {a,b}: every unit maximally split -> alpha = -0.5
    val split = alphaOf(Seq(
      "u1" -> "a", "u1" -> "b", "u2" -> "a", "u2" -> "b"))
    assert(split.getAs[Double]("alpha") === -0.5)
  }

  test("krippendorff: single category makes alpha undefined (null), digests still exact") {
    val r = alphaOf(Seq("u1" -> "a", "u1" -> "a", "u2" -> "a", "u2" -> "a"))
    assert(r.isNullAt(r.fieldIndex("alpha")))
    assert(BigInt(r.getAs[String]("alpha_den")) === BigInt(0))
  }

  test("krippendorff: single-rating units are excluded, not raised (Krippendorff semantics)") {
    val withSingleton = alphaOf(Seq(
      "u1" -> "a", "u1" -> "b", "u2" -> "a", "u2" -> "b", "lonely" -> "a"))
    val without = alphaOf(Seq(
      "u1" -> "a", "u1" -> "b", "u2" -> "a", "u2" -> "b"))
    assert(withSingleton.getAs[Double]("alpha") === without.getAs[Double]("alpha"))
    assert(withSingleton.getAs[Long]("n_units") === 2L)
  }

  test("krippendorff: guards — nothing pairable raises; >16 ratings on a unit raises") {
    val e1 = intercept[Exception] { alphaOf(Seq("u1" -> "a", "u2" -> "b")) }
    assert(e1.getMessage.contains("nothing is pairable"))
    val e2 = intercept[Exception] {
      alphaOf((1 to 17).map(i => "u1" -> (if (i % 2 == 0) "a" else "b")))
    }
    assert(e2.getMessage.contains("more than 16 ratings"))
  }

  // ---- cliffsDelta ---------------------------------------------------

  test("cliffs delta: brute-force pair parity on random grouped data") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 0 until 4; _ <- 0 until 40) yield
      (k, rnd.nextInt(8).toDouble, rnd.nextInt(2).toLong)
    val out = RankStats.cliffsDelta(
      rows.toDF("k", "v", "y"), col("k"), col("v"), col("y"))
      .collect() // bounded: one row per key (4)
      .map(r => r.getAs[Int]("k") -> r).toMap
    for (k <- 0 until 4) {
      val g = rows.filter(_._1 == k)
      val s1 = g.filter(_._3 == 1L).map(_._2)
      val s0 = g.filter(_._3 == 0L).map(_._2)
      val gt = s1.map(x => s0.count(x > _).toLong).sum
      val lt = s1.map(x => s0.count(x < _).toLong).sum
      val expected = (gt - lt).toDouble / (s1.size.toLong * s0.size)
      assert(out(k).getAs[Double]("delta") === expected,
        s"key $k: delta mismatch")
      assert(BigInt(out(k).getAs[String]("delta_num")) === BigInt(gt - lt))
    }
  }

  test("cliffs delta: full separation is exactly +/-1 with band 'large'") {
    val df = Seq((0, 4.0, 1L), (0, 5.0, 1L), (0, 1.0, 0L), (0, 2.0, 0L)).toDF("k", "v", "y")
    val r = RankStats.cliffsDelta(df, col("k"), col("v"), col("y"))
      .collect()(0) // bounded: one key
    assert(r.getAs[Double]("delta") === 1.0)
    assert(r.getAs[String]("magnitude") === "large")
  }

  test("cliffs delta: identical samples score 0 'negligible'; empty side is null") {
    val same = RankStats.cliffsDelta(
      Seq((0, 1.0, 1L), (0, 2.0, 1L), (0, 1.0, 0L), (0, 2.0, 0L)).toDF("k", "v", "y"),
      col("k"), col("v"), col("y")).collect()(0) // bounded: one key
    assert(same.getAs[Double]("delta") === 0.0)
    assert(same.getAs[String]("magnitude") === "negligible")
    val empty = RankStats.cliffsDelta(
      Seq((0, 1.0, 1L), (0, 2.0, 1L)).toDF("k", "v", "y"),
      col("k"), col("v"), col("y")).collect()(0) // bounded: one key
    assert(empty.isNullAt(empty.fieldIndex("delta")))
    assert(empty.isNullAt(empty.fieldIndex("magnitude")))
  }

  test("cliffs delta: band boundary is exact — delta exactly 0.147 reads 'small'") {
    // 1000 sample-0 values below, engineered so num/den = 147/1000:
    // gt - lt = 147, n1*n0 = 1000 -> one sample-1 row vs 1000 sample-0
    // rows with 147 strictly below it and 853 above... simpler: use
    // direct value placement with ties: x=0 vs 426.5 split is fussy —
    // instead verify both sides of the threshold with clean rationals
    // 146/1000 (negligible) and 147/1000 (small).
    def mk(below: Int): String = {
      val s0 = (1 to 1000).map { i =>
        // `below` zeros sit under x=1; the rest tie with x (no credit)
        (0, if (i <= below) 0.0 else 1.0, 0L)
      }
      val df = (s0 :+ ((0, 1.0, 1L))).toDF("k", "v", "y")
      RankStats.cliffsDelta(df, col("k"), col("v"), col("y"))
        .collect()(0).getAs[String]("magnitude") // bounded: one key
    }
    assert(mk(146) === "negligible")
    assert(mk(147) === "small")
  }

  // ---- pageHinkley ---------------------------------------------------

  private def phOf(rows: Seq[(String, Long, Double)], delta: Double, lambda: Double) =
    TimeSeries.pageHinkley(
      rows.toDF("k", "p", "v"), col("k"), col("p"), col("v"),
      delta = delta, lambda = lambda)
      .collect().map(r => r.getAs[String]("k") -> r).toMap // bounded: one row per key

  test("page-hinkley: hand-worked step jump — alarm lands on the jump day") {
    // x = [0,0,0,10], delta=0: terms [0,0,0,7.5], m=[0,0,0,7.5],
    // min-prefix 0 -> ph_4 = 7.5 > lambda=5
    val out = phOf(Seq(("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 0.0), ("a", 4L, 10.0)),
      delta = 0.0, lambda = 5.0)
    val r = out("a")
    assert(r.getAs[Long]("n_periods") === 4L)
    assert(r.getAs[Double]("ph_max") === 7.5)
    assert(r.getAs[Long]("alarm_period") === 4L)
    assert(r.getAs[Double]("alarm_ph") === 7.5)
  }

  test("page-hinkley: a constant series never alarms (ph stays 0)") {
    val out = phOf((1L to 20L).map(p => ("c", p, 42.0)), delta = 0.5, lambda = 1.0)
    val r = out("c")
    assert(r.getAs[Double]("ph_max") === 0.0)
    assert(r.isNullAt(r.fieldIndex("alarm_period")))
    assert(r.isNullAt(r.fieldIndex("alarm_ph")))
  }

  test("page-hinkley: input row order never changes the result") {
    val rows = Seq(("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 0.0), ("a", 4L, 10.0),
      ("b", 1L, 5.0), ("b", 2L, 5.0))
    val fwd = phOf(rows, delta = 0.0, lambda = 5.0)
    val rev = phOf(rows.reverse, delta = 0.0, lambda = 5.0)
    for (k <- Seq("a", "b")) {
      assert(fwd(k).getAs[Double]("ph_max") === rev(k).getAs[Double]("ph_max"))
      assert(fwd(k).getAs[Any]("alarm_period") === rev(k).getAs[Any]("alarm_period"))
    }
  }

  test("page-hinkley: keys are independent — one key's jump never alarms another") {
    val out = phOf(Seq(("calm", 1L, 1.0), ("calm", 2L, 1.0), ("calm", 3L, 1.0),
      ("jumpy", 1L, 0.0), ("jumpy", 2L, 0.0), ("jumpy", 3L, 0.0), ("jumpy", 4L, 100.0)),
      delta = 0.0, lambda = 10.0)
    assert(out("calm").isNullAt(out("calm").fieldIndex("alarm_period")))
    assert(out("jumpy").getAs[Long]("alarm_period") === 4L)
  }

  test("page-hinkley: parameter and input guards raise loudly") {
    intercept[IllegalArgumentException] {
      TimeSeries.pageHinkley(Seq(("a", 1L, 1.0)).toDF("k", "p", "v"),
        col("k"), col("p"), col("v"), delta = -0.1, lambda = 1.0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.pageHinkley(Seq(("a", 1L, 1.0)).toDF("k", "p", "v"),
        col("k"), col("p"), col("v"), delta = 0.0, lambda = 0.0)
    }
    val e = intercept[Exception] {
      TimeSeries.pageHinkley(
        Seq(("a", Some(1L), Some(1.0)), ("a", Some(2L), None))
          .toDF("k", "p", "v"),
        col("k"), col("p"), col("v"), delta = 0.0, lambda = 1.0)
        .collect() // bounded: one row per key; the raise fires first
    }
    assert(e.getMessage.contains("value must be non-null"))
  }
}

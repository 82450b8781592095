package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-12 operators: Monge–Elkan hybrid similarity and the
  * Jensen–Shannon corpus-drift divergence — local-replay parity,
  * the textbook identities, and the loud-failure contracts.
  */
class Round12OpsSpec extends SparkTestBase {

  import spark.implicits._

  // --- Monge–Elkan ------------------------------------------------

  /** Scala reference: mean over A's tokens of the best JW match in B,
    * summed left-to-right like the operator's aggregate fold.
    */
  private def bruteMe(a: String, b: String): Double = {
    val ta = a.split(" ").filter(_.nonEmpty)
    val tb = b.split(" ").filter(_.nonEmpty)
    ta.foldLeft(0.0) { (acc, t) =>
      acc + tb.map(u => graft.functions.JaroWinkler.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        org.apache.spark.unsafe.types.UTF8String.fromString(u))).max
    } / ta.length
  }

  test("mongeElkan matches the local fold bit-for-bit; asymmetry is real") {
    val recs = Seq(
      (1L, "peter christen"),
      (2L, "christen peter paul"),
      (3L, "pedro christensen"),
      (4L, "completely different words")).toDF("id", "name")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    val out = RecordLinkage.mongeElkan(recs, $"id", $"name", pairs)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val names = Map(1L -> "peter christen", 2L -> "christen peter paul",
      3L -> "pedro christensen", 4L -> "completely different words")
    out.foreach { case (ia, ib, ab, ba) =>
      assert(ab == bruteMe(names(ia), names(ib)), s"me_ab for ($ia,$ib)")
      assert(ba == bruteMe(names(ib), names(ia)), s"me_ba for ($ia,$ib)")
    }
    // subset-containment asymmetry: every token of (1) matches (2)
    // exactly, but (2) has an unmatched extra token
    val p12 = out.find(p => p._1 == 1L && p._2 == 2L).get
    assert(p12._3 == 1.0 && p12._4 < 1.0)
  }

  test("mongeElkan raises on token-less records and null ids") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val e = intercept[Exception] {
      RecordLinkage.mongeElkan(
        Seq((1L, "ok name"), (2L, "  ")).toDF("id", "name"),
        $"id", $"name", pairs).collect()
    }
    assert(e.getMessage.contains("no tokens"))
    val e2 = intercept[Exception] {
      RecordLinkage.mongeElkan(
        Seq((null.asInstanceOf[java.lang.Long], "x"), (2L, "y"))
          .toDF("id", "name"),
        $"id", $"name", pairs).collect()
    }
    assert(e2.getMessage.contains("id"))
  }

  // --- consistent hashing -----------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("consistentHash matches the brute ring successor incl. wrap") {
    val shards = Seq("alpha", "beta", "gamma")
    val vnodes = 4
    val ring = ConsistentHash.ring(shards, vnodes)
    assert(ring == ring.sorted && ring.size == shards.size * vnodes)
    val keys = (0 until 300).map(_.toString)
    val out = ConsistentHash.assign(
      keys.toDF("k"), $"k", shards, vnodes).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    var wrapped = 0
    keys.foreach { k =>
      val hk = md5hex(k)
      val exp = ring.find(_._1 >= hk).getOrElse { wrapped += 1; ring.head }._2
      assert(out(k) == exp, s"key $k: got ${out(k)}, expected $exp")
    }
    assert(wrapped > 0, "fixture must exercise the wrap-around arc")
    assert(out.values.toSet == shards.toSet, "all shards should own keys")
  }

  test("consistentHash reshard moves only the removed shard's keys; guards raise") {
    val shards = Seq("s0", "s1", "s2", "s3")
    val df = (0 until 500).map(_.toLong).toDF("k")
    val placed = ConsistentHash.assign(
      ConsistentHash.assign(df, $"k", shards, 8, "before"),
      $"k", shards.filterNot(_ == "s2"), 8, "after").collect()
      .map(r => (r.getString(1), r.getString(2)))
    placed.foreach { case (b, a) =>
      if (b != "s2") assert(a == b, s"stable key moved: $b -> $a")
      else assert(a != "s2")
    }
    assert(placed.exists(_._1 == "s2"), "s2 must own keys before removal")
    intercept[IllegalArgumentException] {
      ConsistentHash.assign(df, $"k", Seq("a", "a"), 8)
    }
    intercept[IllegalArgumentException] {
      ConsistentHash.assign(df, $"k", Seq("a"), 0)
    }
    val e = intercept[Exception] {
      ConsistentHash.assign(
        Seq(null.asInstanceOf[java.lang.Long]).toDF("k"), $"k", shards).collect()
    }
    assert(e.getMessage.contains("key is null"))
  }

  // --- Fleiss' kappa -----------------------------------------------

  test("fleissKappa matches the textbook worked arithmetic") {
    // 4 items, 3 raters, 2 categories — hand-computable:
    // counts per item (x, y): (3,0), (2,1), (1,2), (0,3)
    val ratings = Seq(
      (1, "x"), (1, "x"), (1, "x"),
      (2, "x"), (2, "x"), (2, "y"),
      (3, "x"), (3, "y"), (3, "y"),
      (4, "y"), (4, "y"), (4, "y")).toDF("item", "cat")
    val out = Experiment.fleissKappa(ratings, $"item", $"cat").collect().head
    // A = Σ(Σc² − n) = (9−3)+(5−3)+(5−3)+(9−3) = 16; B = 4·3·2 = 24
    // T = (6, 6); C = 72; D = 144
    // κ = (A·D − C·B)/(B·(D − C)) = (2304 − 1728)/(24·72) = 576/1728 = 1/3
    assert(out.getLong(0) == 4 && out.getLong(1) == 3)
    assert(out.getDouble(2) == 16.0 / 24.0 && out.getDouble(3) == 72.0 / 144.0)
    assert(out.getDouble(4) == 576.0 / 1728.0)
    assert(out.getString(5) == "576" && out.getString(6) == "1728")
  }

  test("fleissKappa edges: perfect agreement, single category, unequal raise") {
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b")).toDF("item", "cat")
    val p = Experiment.fleissKappa(perfect, $"item", $"cat").collect().head
    assert(p.getDouble(4) == 1.0, "unanimous distinct categories → κ = 1")
    // every rating one category → P_e = 1 → κ undefined (null)
    val mono = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a")).toDF("item", "cat")
    val m = Experiment.fleissKappa(mono, $"item", $"cat").collect().head
    assert(m.isNullAt(4) && m.getDouble(3) == 1.0)
    val e = intercept[Exception] {
      Experiment.fleissKappa(
        Seq((1, "a"), (1, "b"), (2, "a")).toDF("item", "cat"),
        $"item", $"cat").collect()
    }
    assert(e.getMessage.contains("unequal ratings"))
    val e2 = intercept[Exception] {
      Experiment.fleissKappa(
        Seq((1, "a"), (2, "b")).toDF("item", "cat"), $"item", $"cat").collect()
    }
    assert(e2.getMessage.contains("at least 2"))
    // empty input raises loudly instead of returning a null-kappa row
    val e3 = intercept[Exception] {
      Experiment.fleissKappa(
        Seq.empty[(Int, String)].toDF("item", "cat"), $"item", $"cat").collect()
    }
    assert(e3.getMessage.contains("empty input"))
  }

  // --- Sinkhorn entropic OT ----------------------------------------

  test("sinkhornDistance: forced single-route transport hits the exact cost") {
    // all slice-A mass at bin 0, all slice-B mass at bin 5: the only
    // feasible plan ships everything 5 bins → cost = 5 exactly
    val df = (Seq.fill(40)((0L, true)) ++ Seq.fill(25)((5L, false)))
      .toDF("bin", "ina")
    val out = KsTest.sinkhornDistance(df, $"bin", $"ina", rounds = 10).collect().head
    assert(out.getLong(0) == 40 && out.getLong(1) == 25 && out.getLong(2) == 2)
    assert(math.abs(out.getDouble(3) - 5.0) < 1e-9, s"cost=${out.getDouble(3)}")
  }

  test("sinkhornDistance raises loudly on kernel underflow instead of NaN") {
    // |Δbin| = 10⁶ at ε = 1/2 → exp(-2·10⁶) underflows to 0.0; the
    // row sums vanish and u turns infinite — must raise, not emit NaN
    val df = (Seq.fill(5)((0L, true)) ++ Seq.fill(5)((1000000L, false)))
      .toDF("bin", "ina")
    val e = intercept[Exception] {
      KsTest.sinkhornDistance(df, $"bin", $"ina").collect()
    }
    assert(e.getMessage.contains("kernel underflow"),
      s"expected the underflow guard, got: ${e.getMessage}")
  }

  test("sinkhornDistance upper-bounds the exact 1-D EMD and shrinks with epsilon") {
    val rows = Seq((0L, true, 30), (1L, true, 10), (3L, true, 10),
      (1L, false, 15), (2L, false, 20), (4L, false, 15))
      .flatMap { case (b, s, n) => Seq.fill(n)((b, s)) }
    val df = rows.toDF("bin", "ina")
    // exact binned W1 = Σ_bins |cdfA − cdfB| summed over unit gaps
    val bins = 0L to 4L
    val na = rows.count(_._2).toDouble
    val nb = rows.size - na
    var (ca, cb, w1) = (0.0, 0.0, 0.0)
    bins.dropRight(1).foreach { b =>
      ca += rows.count(r => r._1 == b && r._2) / na
      cb += rows.count(r => r._1 == b && !r._2) / nb
      w1 += math.abs(ca - cb)
    }
    // at convergence (eps = 1/2 converges fast) the plan is feasible,
    // so the entropic cost upper-bounds the exact binned EMD
    val conv = KsTest.sinkhornDistance(df, $"bin", $"ina",
      epsNum = 1L, epsDen = 2L, rounds = 64).collect().head.getDouble(3)
    assert(conv >= w1 - 1e-9, s"converged entropic cost must upper-bound W1=$w1, got $conv")
    assert(conv < w1 + 0.5, s"eps=1/2 cost should stay near W1=$w1, got $conv")
    // finite-round invariant regardless of convergence: the final
    // v-step makes the plan's COLUMN marginals exactly b — replay the
    // plan locally from the same histogram and check
    val bcnt = Seq(0.0, 15.0, 20.0, 0.0, 15.0).map(_ / nb)
    val acnt = Seq(30.0, 10.0, 0.0, 10.0, 0.0).map(_ / na)
    var u = Array.fill(5)(0.0)
    var v = Array.fill(5)(1.0)
    def k2(i: Int, j: Int) = math.exp(-math.abs(i - j).toDouble * 2.0)
    for (_ <- 1 to 3) {
      u = Array.tabulate(5)(i => acnt(i) / (0 until 5).map(j => k2(i, j) * v(j)).sum)
      v = Array.tabulate(5)(j => bcnt(j) / (0 until 5).map(i => k2(i, j) * u(i)).sum)
    }
    (0 until 5).foreach { j =>
      val colMass = (0 until 5).map(i => u(i) * k2(i, j) * v(j)).sum
      assert(math.abs(colMass - bcnt(j)) < 1e-12,
        s"column marginal $j must be exact after the v-step")
    }
  }

  test("sinkhornDistance guards: empty slice, null bin, bin explosion") {
    val e = intercept[Exception] {
      KsTest.sinkhornDistance(
        Seq((1L, true), (2L, true)).toDF("bin", "ina"), $"bin", $"ina").collect()
    }
    assert(e.getMessage.contains("both slices"))
    val e2 = intercept[Exception] {
      KsTest.sinkhornDistance(
        Seq((None: Option[Long], true), (Some(2L), false)).toDF("bin", "ina"),
        $"bin", $"ina").collect()
    }
    assert(e2.getMessage.contains("bin must be"))
    val e3 = intercept[Exception] {
      KsTest.sinkhornDistance(
        (1L to 50L).map(i => (i, i % 2 == 0)).toDF("bin", "ina"),
        $"bin", $"ina", maxBins = 10).collect()
    }
    assert(e3.getMessage.contains("maxBins"))
  }

  // --- IPF / raking ------------------------------------------------

  test("rakeWeights converges to the target margins; local replay agrees") {
    val sample = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "y"), ("b", "y"), ("b", "y")).toDF("r", "c")
    val tr = Seq(("a", 60L), ("b", 40L)).toDF("k", "t")
    val tc = Seq(("x", 30L), ("y", 70L)).toDF("k", "t")
    val out = Raking.rakeWeights(sample, $"r", $"c", tr, tc, rounds = 12)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // local IPF replay with the identical (t/m)-then-multiply op order
    var w = Map(("a", "x") -> 2.0, ("a", "y") -> 1.0, ("b", "x") -> 1.0, ("b", "y") -> 3.0)
    val rT = Map("a" -> 60.0, "b" -> 40.0)
    val cT = Map("x" -> 30.0, "y" -> 70.0)
    for (_ <- 1 to 12) {
      val rm = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      w = w.map { case (k, v) => k -> v * (rT(k._1) / rm(k._1)) }
      val cm = w.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      w = w.map { case (k, v) => k -> v * (cT(k._2) / cm(k._2)) }
    }
    out.foreach { case (r, c, n, wt) =>
      assert(n == (if ((r, c) == ("b", "y")) 3L else if ((r, c) == ("a", "x")) 2L else 1L))
      assert(math.abs(wt - w((r, c))) < 1e-9, s"cell ($r,$c): $wt vs ${w((r, c))}")
    }
    // after the final column step, column margins match EXACTLY-ish
    // and row margins are converged
    val byC = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(math.abs(byC("x") - 30.0) < 1e-6 && math.abs(byC("y") - 70.0) < 1e-6)
    val byR = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(math.abs(byR("a") - 60.0) < 1e-3 && math.abs(byR("b") - 40.0) < 1e-3)
  }

  test("rakeWeights raises on missing or non-positive targets") {
    val sample = Seq(("a", "x"), ("b", "x")).toDF("r", "c")
    val tcOk = Seq(("x", 10L)).toDF("k", "t")
    val e = intercept[Exception] {
      Raking.rakeWeights(sample, $"r", $"c",
        Seq(("a", 5L)).toDF("k", "t"), tcOk).collect()
    }
    assert(e.getMessage.contains("no target margin"))
    val e2 = intercept[Exception] {
      Raking.rakeWeights(sample, $"r", $"c",
        Seq(("a", 5L), ("b", 0L)).toDF("k", "t"), tcOk).collect()
    }
    assert(e2.getMessage.contains("<= 0"))
    intercept[IllegalArgumentException] {
      Raking.rakeWeights(sample, $"r", $"c", tcOk, tcOk, rounds = 0)
    }
  }

  // --- Jensen–Shannon ---------------------------------------------

  /** Scala reference of the smoothed JSD over the joint vocabulary,
    * folded in ascending token order like the operator's window.
    */
  private def bruteJsd(docs: Seq[(String, Boolean)]): (Long, Long, Long, Double) = {
    val toks = docs.flatMap { case (t, ina) =>
      t.toLowerCase.split("[^\\p{L}\\p{Nd}]+").filter(_.nonEmpty).map(_ -> ina)
    }
    val byTok = toks.groupBy(_._1).toSeq.sortBy(_._1)
    val v = byTok.size.toLong
    val na = toks.count(_._2).toLong
    val nb = toks.size - na
    val jsd = byTok.foldLeft(0.0) { case (acc, (_, occ)) =>
      val ca = occ.count(_._2).toLong
      val cb = occ.size - ca
      val p = (ca + 1L).toDouble / (na + v).toDouble
      val q = (cb + 1L).toDouble / (nb + v).toDouble
      val m = (p + q) / 2.0
      acc + (0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m))
    }
    (na, nb, v, jsd)
  }

  private val fixture = Seq(
    ("the quick brown fox jumps over the lazy dog", true),
    ("the quick red fox runs", true),
    ("pack my box with five dozen jugs", false),
    ("the lazy dog sleeps all day long", false),
    ("quick quick quick brown", true))

  test("jensenShannon matches the local fold; symmetric under slice swap") {
    val df = fixture.toDF("text", "ina")
    val out = TextAnalysis.jensenShannon(df, $"text", $"ina").collect().head
    val (na, nb, v, jsd) = bruteJsd(fixture)
    assert(out.getLong(0) == na && out.getLong(1) == nb && out.getLong(2) == v)
    assert(math.abs(out.getDouble(3) - jsd) < 1e-12, s"${out.getDouble(3)} vs $jsd")
    assert(jsd > 0 && jsd < math.log(2.0))
    val swapped = TextAnalysis.jensenShannon(df, $"text", !$"ina").collect().head
    assert(math.abs(swapped.getDouble(3) - out.getDouble(3)) < 1e-12,
      "JSD must be symmetric in the two slices")
    assert(swapped.getLong(0) == nb && swapped.getLong(1) == na)
  }

  // --- paired permutation test ------------------------------------

  private def md5u32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("pairedPermutationTest matches the local sign-flip replay") {
    val b = 16
    val data = Seq(("u1", 120L), ("u2", -40L), ("u3", 300L), ("u4", 5L),
      ("u5", -220L), ("u6", 90L), ("u7", 17L))
    val out = Resample.pairedPermutationTest(
      data.toDF("id", "d"), $"id", $"d", b).collect().head
    val tObs = data.map(_._2).sum
    val ts = (0 until b).map(bi => data.map { case (id, d) =>
      if (md5u32(s"$id:$bi") < 2147483648L) d else -d
    }.sum)
    val nExtreme = ts.count(t => math.abs(t) >= math.abs(tObs))
    assert(out.getLong(0) == data.size && out.getLong(1) == tObs)
    assert(out.getLong(2) == b && out.getLong(3) == nExtreme)
    assert(out.getDouble(4) == (nExtreme + 1).toDouble / (b + 1).toDouble)
  }

  test("pairedPermutationTest: null-sensitive effect is detected, guards raise") {
    // a large one-sided effect: every difference positive and big —
    // no sign-flip can reach |T_obs| unless all 40 signs stay +1
    val big = (1 to 40).map(i => (s"u$i", 1000L + i))
    val res = Resample.pairedPermutationTest(
      big.toDF("id", "d"), $"id", $"d", b = 64).collect().head
    assert(res.getDouble(4) <= 2.0 / 65.0, s"p=${res.getDouble(4)} should be minimal")
    val e = intercept[Exception] {
      Resample.pairedPermutationTest(
        Seq(("u1", null.asInstanceOf[java.lang.Long])).toDF("id", "d"),
        $"id", $"d").collect()
    }
    assert(e.getMessage.contains("diff"))
    intercept[IllegalArgumentException] {
      Resample.pairedPermutationTest(big.toDF("id", "d"), $"id", $"d", b = 4)
    }
  }

  test("jensenShannon is ~0 for identically distributed slices and raises on null flags") {
    // every doc appears verbatim in both slices → p == q exactly
    val mirrored = fixture.map(_._1).flatMap(t => Seq((t, true), (t, false)))
    val out = TextAnalysis.jensenShannon(mirrored.toDF("text", "ina"), $"text", $"ina")
      .collect().head
    assert(out.getDouble(3) == 0.0, "p == q term-for-term must fold to exactly 0")
    val e = intercept[Exception] {
      TextAnalysis.jensenShannon(
        Seq(("x", null.asInstanceOf[java.lang.Boolean])).toDF("text", "ina"),
        $"text", $"ina").collect()
    }
    assert(e.getMessage.contains("slice flag"))
  }
}

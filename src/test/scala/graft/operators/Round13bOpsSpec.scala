package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-13 batch-2 operators: Cramér–von Mises, 1-D energy distance,
  * vocabulary coverage (Chao1 + Good–Turing), and ordinal association
  * (Goodman–Kruskal γ / Somers' D) — brute-force parity on random
  * corpora, the textbook identities, and the loud-failure contracts.
  */
class Round13bOpsSpec extends SparkTestBase {

  import spark.implicits._

  private val rng = new scala.util.Random(20260816)

  /** Random two-sample fixture: (value, isRef) with deliberate ties
    * both within and across sides.
    */
  private def twoSample(n1: Int, n2: Int, span: Int): Seq[(Long, Boolean)] =
    (Seq.fill(n1)((rng.nextInt(span).toLong, true)) ++
      Seq.fill(n2)((rng.nextInt(span).toLong, false)))

  /** Exact CvM numerator Σ_v (c1+c2)·(cc1·n2 − cc2·n1)² in BigInt. */
  private def bruteCvmNum(xs: Seq[(Long, Boolean)]): (BigInt, Long, Long) = {
    val n1 = xs.count(_._2).toLong
    val n2 = xs.size - n1
    var cc1 = 0L
    var cc2 = 0L
    var s = BigInt(0)
    xs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      val c1 = g.count(_._2).toLong
      val c2 = g.size - c1
      cc1 += c1; cc2 += c2
      val d = BigInt(cc1) * n2 - BigInt(cc2) * n1
      s += BigInt(c1 + c2) * d * d
    }
    (s, n1, n2)
  }

  /** Exact energy numerator Σ intervals (ec1·n2 − ec2·n1)²·gap. */
  private def bruteEnergyNum(xs: Seq[(Long, Boolean)]): (BigInt, Long, Long) = {
    val n1 = xs.count(_._2).toLong
    val n2 = xs.size - n1
    var cc1 = 0L
    var cc2 = 0L
    var prev: Option[Long] = None
    var s = BigInt(0)
    xs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      prev.foreach { pv =>
        val d = BigInt(cc1) * n2 - BigInt(cc2) * n1
        s += d * d * BigInt(v - pv)
      }
      cc1 += g.count(_._2).toLong
      cc2 += g.count(!_._2).toLong
      prev = Some(v)
    }
    (s, n1, n2)
  }

  test("cramerVonMises: exact numerator and pinned division match the brute fold") {
    for (trial <- 1 to 5) {
      val xs = twoSample(40 + trial * 17, 30 + trial * 11, 12 + trial)
      val (num, n1, n2) = bruteCvmNum(xs)
      val row = KsTest.cramerVonMises(
        xs.toDF("v", "r"), col("v"), col("r"), buckets = 7).collect()(0)
      assert(row.getLong(0) == n1 && row.getLong(1) == n2)
      assert(row.getString(3) == num.toString, s"trial $trial numerator")
      val den = (BigInt(n1) * BigInt(n2) *
        BigInt(n1 + n2) * BigInt(n1 + n2)).toDouble
      assert(row.getDouble(4) == num.toDouble / den, s"trial $trial t")
    }
  }

  test("cramerVonMises: the statistic equals the textbook pooled-sample sum") {
    val xs = twoSample(60, 45, 9)
    val n1 = xs.count(_._2).toDouble
    val n2 = xs.size - n1
    // T = nm/N² Σ_k (F(z_k) − G(z_k))² over all pooled observations
    val sorted = xs.map(_._1).sorted
    def cdf(side: Boolean)(z: Long): Double =
      xs.count(p => p._2 == side && p._1 <= z) / (if (side) n1 else n2)
    val t = sorted.map(z => math.pow(cdf(true)(z) - cdf(false)(z), 2)).sum *
      n1 * n2 / math.pow(n1 + n2, 2)
    val got = KsTest.cramerVonMises(
      xs.toDF("v", "r"), col("v"), col("r")).collect()(0).getDouble(4)
    assert(math.abs(got - t) <= 1e-12 * math.max(got.abs, t.abs))
  }

  test("cramerVonMises: identical samples give exactly zero; guards raise") {
    val same = (1 to 50).flatMap(i => Seq((i.toLong % 7, true), (i.toLong % 7, false)))
    val r = KsTest.cramerVonMises(same.toDF("v", "r"), col("v"), col("r")).collect()(0)
    assert(r.getString(3) == "0" && r.getDouble(4) == 0.0)
    intercept[Exception] {
      KsTest.cramerVonMises(Seq((1L, true)).toDF("v", "r"), col("v"), col("r")).collect()
    }
    intercept[Exception] {
      KsTest.cramerVonMises(
        Seq((null.asInstanceOf[java.lang.Long], true)).toDF("v", "r"),
        col("v"), col("r")).collect()
    }
  }

  test("energyDistance1D: exact numerator matches the brute interval fold") {
    for (trial <- 1 to 5) {
      val xs = twoSample(35 + trial * 13, 25 + trial * 7, 200 + trial * 31)
      val (num, n1, n2) = bruteEnergyNum(xs)
      val row = KsTest.energyDistance1D(
        xs.toDF("v", "r"), col("v"), col("r"), buckets = 5).collect()(0)
      assert(row.getString(3) == num.toString, s"trial $trial numerator")
      val den = (BigInt(n1) * BigInt(n2) * BigInt(n1) * BigInt(n2)).toDouble
      assert(row.getDouble(4) == 2.0 * (num.toDouble / den), s"trial $trial energy")
    }
  }

  test("energyDistance1D: equals Székely's pairwise form 2E|XY|-E|XX'|-E|YY'|") {
    val xs = twoSample(40, 55, 60)
    val a = xs.filter(_._2).map(_._1.toDouble)
    val b = xs.filterNot(_._2).map(_._1.toDouble)
    def meanAbs(u: Seq[Double], v: Seq[Double]): Double =
      u.flatMap(x => v.map(y => math.abs(x - y))).sum / (u.size.toDouble * v.size)
    val e = 2.0 * meanAbs(a, b) - meanAbs(a, a) - meanAbs(b, b)
    val got = KsTest.energyDistance1D(
      xs.toDF("v", "r"), col("v"), col("r")).collect()(0).getDouble(4)
    assert(got >= 0.0)
    assert(math.abs(got - e) <= 1e-9 * math.max(1.0, e.abs))
  }

  test("energyDistance1D: identical samples give exactly zero") {
    val same = (1 to 40).flatMap(i => Seq((i.toLong * 3, true), (i.toLong * 3, false)))
    val r = KsTest.energyDistance1D(same.toDF("v", "r"), col("v"), col("r")).collect()(0)
    assert(r.getString(3) == "0" && r.getDouble(4) == 0.0)
  }

  test("vocabularyCoverage: hand-computed spectrum, f2=0 form, empty raises") {
    // tokens: a×3 b×2 c×1 d×1 → N=7 S=4 f1=2 f2=1
    val docs = Seq("a b c", "a b", "a d").toDF("text")
    val r = TextAnalysis.vocabularyCoverage(docs, col("text")).collect()(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 4.0 + 2.0 / 4.0) // chao1 = S + f1(f1-1)/(2(f2+1))
    assert(r.getDouble(5) == 2.0 / 7.0)
    assert(r.getDouble(6) == 1.0 - 2.0 / 7.0)
    // all singletons, no doubletons: the +1 keeps chao1 finite
    val singles = Seq("x y z").toDF("text")
    val r2 = TextAnalysis.vocabularyCoverage(singles, col("text")).collect()(0)
    assert(r2.getLong(2) == 3L && r2.getLong(3) == 0L)
    assert(r2.getDouble(4) == 3.0 + 6.0 / 2.0)
    assert(r2.getDouble(5) == 1.0) // every token unseen-class
    val e = intercept[Exception] {
      TextAnalysis.vocabularyCoverage(
        Seq.empty[String].toDF("text"), col("text")).collect()
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("ordinalAssociationDaily: brute pair counts and one-division statistics") {
    // one key, 5 daily periods with controlled (volume, value) ranks:
    // periods p0..p4, volumes 1,2,2,3,1  values 10,20,15,30,10
    val day = 86400L
    val rows = scala.collection.mutable.Buffer[(String, java.sql.Timestamp, Double)]()
    val vols = Seq(1, 2, 2, 3, 1)
    val vals = Seq(10.0, 20.0, 15.0, 30.0, 10.0)
    for (p <- 0 until 5; i <- 0 until vols(p)) {
      val share = vals(p) / vols(p)
      rows += (("k", new java.sql.Timestamp((p * day + i) * 1000L), share))
    }
    val df = rows.toSeq.toDF("event_type", "ts", "value")
    val out = TimeSeries.ordinalAssociationDaily(
      df, col("event_type"), col("ts"), col("value"), day).collect()(0)
    // brute over the 10 period pairs
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- 0 until 5; j <- i + 1 until 5) {
      val cx = Integer.compare(vols(j), vols(i))
      val cy = java.lang.Double.compare(vals(j), vals(i))
      if (cx * cy > 0) conc += 1
      else if (cx * cy < 0) disc += 1
      if (cx == 0) tx += 1
      if (cy == 0) ty += 1
    }
    val n0 = 10L
    assert(out.getLong(1) == 5L)
    assert(out.getLong(2) == conc && out.getLong(3) == disc)
    assert(out.getLong(4) == tx && out.getLong(5) == ty)
    assert(out.getDouble(6) == (conc - disc).toDouble / (conc + disc).toDouble)
    assert(out.getDouble(7) == (conc - disc).toDouble / (n0 - tx).toDouble)
    assert(out.getDouble(8) == (conc - disc).toDouble / (n0 - ty).toDouble)
  }

  test("ordinalAssociationDaily: counts agree with kendallTauDaily; degenerate nulls") {
    val day = 86400L
    val rows = (0 until 60).map { i =>
      ("t" + (i % 3), new java.sql.Timestamp((i / 3 * day + i) * 1000L),
        (i % 7).toDouble + 1.0)
    }
    val df = rows.toDF("event_type", "ts", "value")
    val oa = TimeSeries.ordinalAssociationDaily(
      df, col("event_type"), col("ts"), col("value"), day)
      .select("key", "concordant", "discordant").orderBy("key").collect()
    val kt = TimeSeries.kendallTauDaily(
      df, col("event_type"), col("ts"), col("value"), day)
      .select("key", "concordant", "discordant").orderBy("key").collect()
    assert(oa.map(_.toSeq).toSeq == kt.map(_.toSeq).toSeq)
    // a single period per key: no pairs — every statistic null
    val one = Seq(("k", new java.sql.Timestamp(1000L), 5.0))
      .toDF("event_type", "ts", "value")
    val r = TimeSeries.ordinalAssociationDaily(
      one, col("event_type"), col("ts"), col("value"), day).collect()(0)
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  // --- Hoeffding's D ------------------------------------------------

  /** Brute Hollander–Wolfe mid-rank D over (x, y) pairs: the ×16
    * integer scaling, exactly as the operator defines it.
    */
  private def bruteHoeffding(xs: Seq[(Long, BigDecimal)]): (BigInt, Double) = {
    val n = xs.size
    def c2(a: Long, b: Long): Long = if (b < a) 2L else if (b == a) 1L else 0L
    def c2d(a: BigDecimal, b: BigDecimal): Long =
      if (b < a) 2L else if (b == a) 1L else 0L
    var d1 = BigInt(0); var d2 = BigInt(0); var d3 = BigInt(0)
    for (i <- xs.indices) {
      var r2 = 2L; var s2 = 2L; var q4 = 4L
      for (j <- xs.indices if j != i) {
        val cx = c2(xs(i)._1, xs(j)._1)
        val cy = c2d(xs(i)._2, xs(j)._2)
        r2 += cx; s2 += cy; q4 += cx * cy
      }
      d1 += BigInt(q4 - 4) * (q4 - 8)
      d2 += BigInt(r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)
      d3 += BigInt(r2 - 4) * (s2 - 4) * (q4 - 4)
    }
    val num16 = BigInt(n - 2) * (n - 3) * d1 + d2 - 2 * BigInt(n - 2) * d3
    val den16 = BigInt(16) * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    (num16, (30 * num16).toDouble / den16.toDouble)
  }

  /** Daily event rows realizing per-period (volume, value): `volume`
    * rows per period, each carrying value/volume so the period sum is
    * the target value.
    */
  private def dailySeries(vols: Seq[Int], vals: Seq[Double]) = {
    val day = 86400L
    val rows = for {
      p <- vols.indices
      i <- 0 until vols(p)
    } yield ("k", new java.sql.Timestamp((p * day + i) * 1000L), vals(p) / vols(p))
    rows.toDF("event_type", "ts", "value")
  }

  test("hoeffdingsDDaily: exact ×16 numerator matches the brute mid-rank fold") {
    val vols = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 1) // ties on purpose
    val vals = Seq(7.0, 1.5, 7.0, 3.25, 9.0, 2.0, 7.0, 8.5, 9.0, 1.5, 4.0, 3.25)
    val out = TimeSeries.hoeffdingsDDaily(
      dailySeries(vols, vals), col("event_type"), col("ts"), col("value"),
      86400L).collect()(0)
    // the operator aggregates value sums in decimal(18,6) — replay that
    val pairs = vols.indices.map(p => (vols(p).toLong,
      (0 until vols(p)).map(_ => BigDecimal(vals(p) / vols(p))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum))
    val (num16, d) = bruteHoeffding(pairs)
    assert(out.getLong(1) == vols.size.toLong)
    assert(out.getString(2) == num16.toString)
    assert(out.getDouble(3) == d)
  }

  test("hoeffdingsDDaily: exact injective dependence gives D = 1; n<5 nulls") {
    // y strictly increasing with distinct x: perfect dependence
    val vols = Seq(1, 2, 3, 4, 5, 6, 7)
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val r = TimeSeries.hoeffdingsDDaily(
      dailySeries(vols, vals), col("event_type"), col("ts"), col("value"),
      86400L).collect()(0)
    assert(r.getDouble(3) == 1.0)
    val r4 = TimeSeries.hoeffdingsDDaily(
      dailySeries(Seq(1, 2, 3, 4), Seq(1.0, 2.0, 3.0, 4.0)),
      col("event_type"), col("ts"), col("value"), 86400L).collect()(0)
    assert(r4.isNullAt(2) && r4.isNullAt(3))
  }

  test("hoeffdingsDDaily: detects the U-shape Kendall's tau reads as ~zero") {
    val vols = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9)
    val vals = vols.map(v => math.pow(v - 5.0, 2) + 1.0)
    val df = dailySeries(vols, vals)
    val hd = TimeSeries.hoeffdingsDDaily(
      df, col("event_type"), col("ts"), col("value"), 86400L)
      .collect()(0).getDouble(3)
    val tau = TimeSeries.kendallTauDaily(
      df, col("event_type"), col("ts"), col("value"), 86400L)
      .collect()(0).getDouble(4)
    assert(math.abs(tau) < 0.15, s"tau=$tau should be near zero on the U")
    // n = 9 keeps the exact D modest; the point is positive vs ~zero
    assert(hd > 0.05, s"hoeffding D=$hd should expose the U dependence")
  }

  // --- Anderson–Darling --------------------------------------------

  /** Brute A²akN via the unscaled rational definition: midrank
    * cumulatives as doubles of half-integers (exact), direct sum.
    */
  private def bruteAd(xs: Seq[(Long, Boolean)]): Double = {
    val groups = xs.groupBy(_._1).toSeq.sortBy(_._1)
    val n1 = xs.count(_._2).toDouble
    val n2 = xs.size - n1
    val nTot = n1 + n2
    var b = 0.0; var ma = 0.0; var mb = 0.0
    var sa = 0.0; var sb = 0.0
    groups.foreach { case (_, g) =>
      val l = g.size.toDouble
      val la = g.count(_._2).toDouble
      val ba = b + l / 2
      val maj = ma + la / 2
      val mbj = mb + (l - la) / 2
      val den = ba * (nTot - ba) - nTot * l / 4
      sa += l * math.pow(nTot * maj - n1 * ba, 2) / den
      sb += l * math.pow(nTot * mbj - n2 * ba, 2) / den
      b += l; ma += la; mb += l - la
    }
    (sa / n1 + sb / n2) * (nTot - 1) / (nTot * nTot)
  }

  test("andersonDarlingTwoSample matches the brute midrank formula") {
    for (trial <- 1 to 4) {
      val xs = twoSample(50 + trial * 19, 40 + trial * 13, 9 + trial)
      val got = KsTest.andersonDarlingTwoSample(
        xs.toDF("v", "r"), col("v"), col("r")).collect()(0).getDouble(3)
      val want = bruteAd(xs)
      assert(math.abs(got - want) <= 1e-11 * math.max(1.0, want.abs),
        s"trial $trial: got $got want $want")
    }
  }

  test("andersonDarling is rank-based: a monotone bin transform changes nothing") {
    val xs = twoSample(70, 55, 11)
    val base = KsTest.andersonDarlingTwoSample(
      xs.toDF("v", "r"), col("v"), col("r")).collect()(0).getDouble(3)
    val squashed = xs.map { case (v, r) => (v * v * 7L + 3L, r) } // strictly monotone on ≥0
    val same = KsTest.andersonDarlingTwoSample(
      squashed.toDF("v", "r"), col("v"), col("r")).collect()(0).getDouble(3)
    assert(base == same)
  }

  test("andersonDarling: identical binned samples give exactly zero; guards raise") {
    val same = (1 to 60).flatMap(i => Seq((i.toLong % 5, true), (i.toLong % 5, false)))
    val r = KsTest.andersonDarlingTwoSample(
      same.toDF("v", "r"), col("v"), col("r")).collect()(0)
    assert(r.getDouble(3) == 0.0)
    intercept[Exception] { // one side empty
      KsTest.andersonDarlingTwoSample(
        Seq((1L, true), (2L, true)).toDF("v", "r"), col("v"), col("r")).collect()
    }
    intercept[Exception] { // single bin
      KsTest.andersonDarlingTwoSample(
        Seq((1L, true), (1L, false)).toDF("v", "r"), col("v"), col("r")).collect()
    }
    intercept[Exception] { // maxBins exceeded
      KsTest.andersonDarlingTwoSample(
        (1 to 10).map(i => (i.toLong, i % 2 == 0)).toDF("v", "r"),
        col("v"), col("r"), maxBins = 4).collect()
    }
  }

  // --- Kuiper -------------------------------------------------------

  test("kuiperTwoSample: exact directed suprema match the brute ECDF scan") {
    for (trial <- 1 to 4) {
      val xs = twoSample(45 + trial * 7, 35 + trial * 5, 14 + trial)
      val n1 = xs.count(_._2).toLong
      val n2 = xs.size - n1
      var cc1 = 0L; var cc2 = 0L
      var dp = BigInt(0); var dm = BigInt(0)
      xs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
        cc1 += g.count(_._2); cc2 += g.count(!_._2)
        val gap = BigInt(cc1) * n2 - BigInt(cc2) * n1
        if (gap > dp) dp = gap
        if (-gap > dm) dm = -gap
      }
      val row = KsTest.kuiperTwoSample(
        xs.toDF("v", "r"), col("v"), col("r"), buckets = 6).collect()(0)
      assert(row.getString(3) == dp.toString && row.getString(4) == dm.toString)
      assert(row.getDouble(5) ==
        (dp + dm).toDouble / (BigInt(n1) * BigInt(n2)).toDouble)
      // Kuiper dominates KS: V ≥ D
      val d = KsTest.ksTwoSample(xs.toDF("v", "r"), col("v"), col("r"))
        .collect()(0).getDouble(2)
      assert(row.getDouble(5) >= d - 1e-12)
    }
  }

  // --- distance correlation ------------------------------------------

  /** Brute ×n⁶-scaled double-centered sums over (x, y-cents) pairs. */
  private def bruteDcor(xs: Seq[(Long, Long)]): (BigInt, BigInt, BigInt, Option[Double]) = {
    val n = xs.size
    def mat(sel: ((Long, Long)) => Long): Array[Array[BigInt]] =
      Array.tabulate(n, n)((i, j) => BigInt((sel(xs(i)) - sel(xs(j))).abs))
    def centered(m: Array[Array[BigInt]]): Array[Array[BigInt]] = {
      val row = m.map(_.sum)
      val tot = row.sum
      Array.tabulate(n, n)((i, j) =>
        BigInt(n) * n * m(i)(j) - BigInt(n) * row(i) - BigInt(n) * row(j) + tot)
    }
    val (ap, bp) = (centered(mat(_._1)), centered(mat(_._2)))
    var sab = BigInt(0); var saa = BigInt(0); var sbb = BigInt(0)
    for (i <- 0 until n; j <- 0 until n) {
      sab += ap(i)(j) * bp(i)(j); saa += ap(i)(j) * ap(i)(j); sbb += bp(i)(j) * bp(i)(j)
    }
    val dcor = if (saa > 0 && sbb > 0)
      Some(math.sqrt(sab.toDouble / math.sqrt(saa.toDouble * sbb.toDouble)))
    else None
    (sab, saa, sbb, dcor)
  }

  test("distanceCorrelationDaily: exact digests and pinned chain match the brute") {
    val vols = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3)
    val vals = Seq(2.5, 7.0, 2.5, 3.0, 8.25, 1.0, 7.0, 4.5, 8.25, 0.75)
    val out = TimeSeries.distanceCorrelationDaily(
      dailySeries(vols, vals), col("event_type"), col("ts"), col("value"),
      86400L).collect()(0)
    // period cents = Σ round(share·100) per row — replay the operator's grain
    val pairs = vols.indices.map { p =>
      val share = vals(p) / vols(p)
      (vols(p).toLong,
        (0 until vols(p)).map(_ => math.round(share * 100)).sum)
    }
    val (sab, saa, sbb, dcor) = bruteDcor(pairs)
    assert(out.getString(2) == sab.toString)
    assert(out.getString(3) == saa.toString)
    assert(out.getString(4) == sbb.toString)
    assert(out.getDouble(5) == dcor.get)
  }

  test("distanceCorrelationDaily: exact linear dependence gives dcor = 1; constant series null") {
    // y = 3·x cents exactly, distinct x
    val vols = Seq(1, 2, 3, 4, 5, 6)
    val vals = vols.map(v => 0.03 * v) // 3v cents per period
    val r = TimeSeries.distanceCorrelationDaily(
      dailySeries(vols, vals), col("event_type"), col("ts"), col("value"),
      86400L).collect()(0)
    assert(r.getDouble(5) == 1.0)
    // constant volume: dVarX = 0 → null
    val flat = TimeSeries.distanceCorrelationDaily(
      dailySeries(Seq(2, 2, 2, 2), Seq(1.0, 2.0, 3.0, 4.0)),
      col("event_type"), col("ts"), col("value"), 86400L).collect()(0)
    assert(flat.isNullAt(5) && flat.getString(3) == "0")
  }

  test("distanceCorrelationDaily: sees the U-shape Pearson misses; guard raises") {
    val vols = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9)
    val vals = vols.map(v => math.pow(v - 5.0, 2) / 100.0 + 0.01)
    val r = TimeSeries.distanceCorrelationDaily(
      dailySeries(vols, vals), col("event_type"), col("ts"), col("value"),
      86400L).collect()(0)
    assert(r.getDouble(5) > 0.3, s"dcor=${r.getDouble(5)} on the U")
    val e = intercept[Exception] {
      TimeSeries.distanceCorrelationDaily(
        dailySeries(Seq(1, 2, 3), Seq(1.0, 2.0, 3.0)),
        col("event_type"), col("ts"), col("value"), 86400L,
        maxPeriodsPerKey = 2).collect()
    }
    assert(e.getMessage.contains("more than 2 periods"))
  }

  test("kuiperTwoSample: disjoint supports give V = 1; swapped sides swap suprema") {
    val xs = (1 to 30).map(i => (i.toLong, true)) ++
      (31 to 55).map(i => (i.toLong, false))
    val r = KsTest.kuiperTwoSample(xs.toDF("v", "r"), col("v"), col("r")).collect()(0)
    assert(r.getDouble(5) == 1.0 && r.getString(4) == "0")
    val sw = KsTest.kuiperTwoSample(
      xs.map { case (v, b) => (v, !b) }.toDF("v", "r"), col("v"), col("r"))
      .collect()(0)
    assert(sw.getString(3) == r.getString(4) && sw.getString(4) == r.getString(3))
  }

  test("merged-CDF family is bucket-count invariant (the monotone-map claim)") {
    // the two-phase geometry's correctness must not depend on WHERE
    // bucket boundaries land: any monotone same-value-same-bucket map
    // reconstructs the same exact cumulative
    val xs = twoSample(80, 65, 25)
    val df = xs.toDF("v", "r")
    def rows(b: Int) = Seq(
      KsTest.cramerVonMises(df, col("v"), col("r"), buckets = b).collect()(0).toSeq,
      KsTest.energyDistance1D(df, col("v"), col("r"), buckets = b).collect()(0).toSeq,
      KsTest.kuiperTwoSample(df, col("v"), col("r"), buckets = b).collect()(0).toSeq)
    val base = rows(256)
    for (b <- Seq(1, 2, 7, 1000))
      assert(rows(b) == base, s"buckets=$b diverged")
  }

  test("hoeffdingsDDaily: random-corpus brute parity across trials") {
    for (trial <- 1 to 4) {
      val m = 6 + trial * 2
      val vols = Seq.fill(m)(1 + rng.nextInt(5))
      val vals = Seq.fill(m)((1 + rng.nextInt(8)).toDouble)
      val out = TimeSeries.hoeffdingsDDaily(
        dailySeries(vols, vals), col("event_type"), col("ts"), col("value"),
        86400L).collect()(0)
      val pairs = vols.indices.map(p => (vols(p).toLong,
        (0 until vols(p)).map(_ => BigDecimal(vals(p) / vols(p))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum))
      val (num16, d) = bruteHoeffding(pairs)
      assert(out.getString(2) == num16.toString, s"trial $trial num16")
      assert(out.getDouble(3) == d, s"trial $trial d")
    }
  }

  // --- Gopher repetition filters -------------------------------------

  private def topRows(docs: Seq[(Long, String)], ns: Seq[Int]) =
    TextAnalysis.topNgramCharFraction(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), ns)
      .orderBy("doc_id", "n").collect()

  test("topNgramCharFraction: hand-built docs, greatest-gram tie rule, short docs null") {
    val rows = topRows(Seq((1L, "a b a b c"), (2L, "x y z x y z"), (3L, "q")), Seq(2))
    // doc 1: "a b"×2, top_chars 3, total = 5 chars + 4 spaces = 9
    assert(rows(0).getLong(2) == 2L && rows(0).getLong(3) == 3L &&
      rows(0).getLong(4) == 9L && rows(0).getDouble(5) == 6.0 / 9.0)
    // doc 2: "x y" and "y z" both ×2 — tie breaks to the GREATEST gram
    val r2 = topRows(Seq((2L, "x y z x y z")), Seq(2))(0)
    assert(r2.getLong(2) == 2L)
    // frac uses len("y z") = 3 either way; the tie rule is observable
    // through determinism across runs (and the oracle replays it)
    assert(r2.getDouble(5) == 6.0 / 11.0)
    // doc 3 has 1 token: no 2-gram → null stats, total_chars kept
    assert(rows(2).isNullAt(2) && rows(2).getLong(4) == 1L && rows(2).isNullAt(5))
  }

  /** Brute union-coverage: fraction of token chars under any n-gram
    * occurring more than once.
    */
  private def bruteDup(text: String, n: Int): Option[(Long, Long)] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty) return None
    val total = toks.map(_.length.toLong).sum
    val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
    val dup = grams.groupBy(identity).filter(_._2.size > 1).keySet
    val covered = grams.zipWithIndex.collect {
      case (g, i) if dup(g) => (i until i + n)
    }.flatten.toSet
    Some((covered.toSeq.map(i => toks(i).length.toLong).sum, total))
  }

  test("duplicatedNgramCharFraction: overlap unions once; brute parity on random docs") {
    val docs = Seq(
      (1L, "a a a a"),          // "a a"×3 covers all 4 tokens
      (2L, "a b c a b d"),      // "a b"×2 covers idx {0,1,3,4}
      (3L, "a b a b a"),        // two dup grams jointly cover all
      (4L, "x y z w"))          // nothing repeats
    val out = TextAnalysis.duplicatedNgramCharFraction(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), Seq(2))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 4L && out(0).getDouble(4) == 1.0)
    assert(out(1).getLong(2) == 4L && out(1).getDouble(4) == 4.0 / 6.0)
    assert(out(2).getLong(2) == 5L && out(2).getDouble(4) == 1.0)
    assert(out(3).getLong(2) == 0L && out(3).getDouble(4) == 0.0)
    // random-corpus brute parity across n = 2 and 3
    val alpha = Seq("a", "b", "c", "d")
    val rdocs = (1L to 40L).map { i =>
      (i, Seq.fill(3 + rng.nextInt(18))(alpha(rng.nextInt(alpha.size))).mkString(" "))
    }
    for (n <- Seq(2, 3)) {
      val got = TextAnalysis.duplicatedNgramCharFraction(
        rdocs.toDF("doc_id", "text"), col("doc_id"), col("text"), Seq(n))
        .orderBy("doc_id").collect()
      rdocs.indices.foreach { k =>
        val (cov, tot) = bruteDup(rdocs(k)._2, n).get
        assert(got(k).getLong(2) == cov && got(k).getLong(3) == tot,
          s"doc ${rdocs(k)._1} n=$n: ${rdocs(k)._2}")
      }
    }
  }

  // --- neighborhood function (HyperANF on KMV) -----------------------

  /** Brute undirected BFS ball sizes on a tiny edge list. */
  private def bruteBalls(edges: Seq[(Long, Long)], rounds: Int): Map[(Long, Int), Int] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val nodes = adj.keySet
    nodes.flatMap { v =>
      var ball = Set(v)
      (0 to rounds).map { t =>
        val r = ((v, t), ball.size)
        ball = ball ++ ball.flatMap(u => adj.getOrElse(u, Set.empty))
        r
      }
    }.toMap
  }

  test("neighborhoodFunction: unsaturated balls are EXACT BFS sizes") {
    // two components: a 6-path and a 4-cycle — all balls < k
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val out = Graph.neighborhoodFunction(
      edges.toDF("a", "b"), col("a"), col("b"), rounds = 3, k = 32)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r)).toMap
    val want = bruteBalls(edges, 3)
    assert(out.size == want.size)
    want.foreach { case (key, size) =>
      val r = out(key)
      assert(r.getLong(2) == size.toLong, s"$key n_hashes")
      assert(r.getDouble(4) == size.toDouble, s"$key exact estimate")
      assert(r.isNullAt(3), s"$key unsaturated ⇒ no kth hash")
    }
  }

  test("neighborhoodFunction: saturated estimates track the true ball; est is monotone in t") {
    // a 120-clique: ball(v, 1) = 120 for every node, k = 16 saturates
    val k = 16
    val edges = for (i <- 1L to 120L; j <- i + 1 to 120L if j <= i + 7) yield (i, j)
    // i..i+7 band graph: diameter ~ 17; balls grow steadily
    val out = Graph.neighborhoodFunction(
      edges.toDF("a", "b"), col("a"), col("b"), rounds = 3, k = k)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(4)))).toMap
    val want = bruteBalls(edges, 3)
    var satChecked = 0
    want.foreach { case ((v, t), size) =>
      val (nh, est) = out((v, t))
      if (nh < k) assert(est == size.toDouble)
      else {
        satChecked += 1
        assert(math.abs(est - size) <= 0.6 * size,
          s"($v,$t): est $est vs true $size — KMV k=$k should land within 60%")
      }
    }
    assert(satChecked > 100, s"want many saturated sketches, got $satChecked")
    // monotone: the k-th min can only shrink, so est never decreases
    for (v <- 1L to 120L; t <- 1 to 3)
      assert(out((v, t))._2 >= out((v, t - 1))._2, s"est not monotone at ($v,$t)")
  }

  test("mergeStatesArrays is row-for-row identical to the element-grain mergeStates") {
    val k = 8
    val states = (1 to 60).map { i =>
      val g = (i % 5).toLong
      val hs = Seq.fill(1 + rng.nextInt(k))(rng.nextLong().abs % 1000).distinct.sorted
      (g, hs)
    }
    val df = states.toDF("g", "kmv")
    val a = KmvSketch.mergeStates(df, Seq("g"), col("kmv"), k)
      .orderBy("g").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val b = KmvSketch.mergeStatesArrays(df, Seq("g"), col("kmv"), k)
      .orderBy("g").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(a.toSeq == b.toSeq)
  }

  // --- simplified silhouette ------------------------------------------

  test("simplifiedSilhouette: brute parity, separated blobs score high, at-centroid s") {
    val dim = 4
    // two tight blobs far apart + their exact centers; k = 2 seeds are
    // content-addressed, so compute the expectation with the same rule
    val pts = (1L to 20L).map { i =>
      val blob = if (i % 2 == 0) 0.0 else 100.0
      (i, Array.tabulate(dim)(d => blob + (i % 3) * 0.25 + d * 0.1))
    }
    val df = pts.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
    val out = Clustering.simplifiedSilhouette(
      df, col("embedding"), col("vec_id"), k = 2, dim = dim)
      .orderBy("vec_id").collect()
    // brute replay with the same md5-60bit seed rule
    def h60(id: Long): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16)
    val seeds = pts.sortBy(p => (h60(p._1), p._1)).take(2).map(_._2)
    def d2(v: Array[Double], c: Array[Double]): Double = {
      var vv = 0.0; var vc = 0.0; var cc = 0.0
      for (i <- 0 until dim) { vv += v(i) * v(i); vc += v(i) * c(i); cc += c(i) * c(i) }
      math.max(vv - 2.0 * vc + cc, 0.0)
    }
    out.zip(pts).foreach { case (r, (_, v)) =>
      val ds = seeds.map(c => d2(v, c))
      val cid = if (ds(0) <= ds(1)) 0 else 1
      val (a, b) = (math.sqrt(ds(cid)), math.sqrt(ds(1 - cid)))
      assert(r.getInt(1) == cid + 1)
      assert(r.getDouble(2) == a && r.getDouble(3) == b)
      assert(r.getDouble(4) == (b - a) / math.max(a, b))
      // blobs are 100 apart with ≤1.05 internal spread: strong separation
      assert(r.getDouble(4) > 0.9, s"vec ${r.getLong(0)} silhouette ${r.getDouble(4)}")
    }
    // a point EXACTLY at a seed: d_own = 0, s = 1
    val seedId = pts.sortBy(p => (h60(p._1), p._1)).head._1
    val atSeed = out.find(_.getLong(0) == seedId).get
    assert(atSeed.getDouble(2) == 0.0 && atSeed.getDouble(4) == 1.0)
  }

  test("simplifiedSilhouette: guards on k and malformed vectors") {
    intercept[IllegalArgumentException] {
      Clustering.simplifiedSilhouette(
        Seq((1L, Seq(1.0))).toDF("vec_id", "embedding"),
        col("embedding"), col("vec_id"), k = 1, dim = 1)
    }
    val e = intercept[Exception] {
      Clustering.simplifiedSilhouette(
        Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"),
        col("embedding"), col("vec_id"), k = 2, dim = 2).collect()
    }
    assert(e.getMessage.contains("only 1 usable vectors"))
  }

  test("neighborhoodFunction: guards raise on nulls and bad params") {
    intercept[IllegalArgumentException] {
      Graph.neighborhoodFunction(
        Seq((1L, 2L)).toDF("a", "b"), col("a"), col("b"), rounds = 0)
    }
    intercept[Exception] {
      Graph.neighborhoodFunction(
        Seq((Some(1L), None: Option[Long])).toDF("a", "b"),
        col("a"), col("b")).collect()
    }
  }

  test("duplicatedNgramCharFraction: token-less docs null; long format stacks ns") {
    val out = TextAnalysis.duplicatedNgramCharFraction(
      Seq((1L, "!!! ???"), (2L, "a a a")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), Seq(2, 3))
      .orderBy("doc_id", "n").collect()
    assert(out.length == 4)
    assert(out(0).isNullAt(2) && out(0).isNullAt(4)) // no tokens at n=2
    assert(out(2).getDouble(4) == 1.0)               // "a a"×2 covers all
    assert(out(3).getDouble(4) == 0.0)               // single 3-gram: no dup
  }
}

package graft.operators

import org.apache.spark.sql.functions.{lit, pmod}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Round-9 operators: two-group log-rank test vs a direct
  * risk-set fold, CUPED vs exact-BigInt sufficient statistics, and
  * diff-in-diff vs hand-computed cell means.
  */
class Round9OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop, min: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // --- log-rank

  /** Direct fold: per distinct event time, risk sets by re-scan. */
  private def refLogRank(subj: Seq[(Long, Boolean, Int)])
      : (Long, Long, Long, Double, Double) = {
    val n1 = subj.count(_._3 == 1).toLong
    val n0 = subj.count(_._3 == 0).toLong
    var o1 = 0L; var e1 = 0.0; var v = 0.0
    for (t <- subj.map(_._1).distinct.sorted) {
      val at1 = subj.count(s => s._1 >= t && s._3 == 1).toDouble
      val at0 = subj.count(s => s._1 >= t && s._3 == 0).toDouble
      val d1 = subj.count(s => s._1 == t && s._2 && s._3 == 1).toLong
      val dt = (d1 + subj.count(s => s._1 == t && s._2 && s._3 == 0)).toDouble
      val nt = at1 + at0
      o1 += d1
      if (dt > 0) {
        e1 += dt * at1 / nt
        if (nt > 1) v += dt * at1 * at0 * (nt - dt) / (nt * nt * (nt - 1.0))
      }
    }
    (n1, n0, o1, e1, v)
  }

  private val genSubjects: Gen[List[(Long, Boolean, Int)]] = for {
    n <- Gen.chooseNum(1, 50)
    rows <- Gen.listOfN(n, for {
      t <- Gen.chooseNum(0L, 6L)
      ev <- Gen.oneOf(true, false)
      g <- Gen.oneOf(0, 1)
    } yield (t, ev, g))
  } yield rows

  test("property: logRank O/E/V match the direct risk-set fold") {
    check(Prop.forAll(genSubjects) { subj =>
      val row = Survival.logRank(
        subj.toDF("dur", "ev", "g"), $"dur", $"ev", $"g").collect()(0)
      val (n1, n0, o1, e1, v) = refLogRank(subj)
      row.getLong(0) == n1 && row.getLong(1) == n0 && row.getLong(2) == o1 &&
        math.abs(row.getDouble(3) - e1) < 1e-9 &&
        math.abs(row.getDouble(4) - v) < 1e-9 && {
          if (v > 0) {
            val z = (o1 - e1) / math.sqrt(v)
            math.abs(row.getDouble(5) - z) < 1e-9 &&
              math.abs(row.getDouble(6) - z * z) < 1e-9
          } else row.isNullAt(5) && row.isNullAt(6)
        }
    })
  }

  test("logRank: identical groups give O1 = E1 exactly under symmetry") {
    // two groups with the SAME duration/event multiset: every death
    // splits the risk set evenly, so O1 - E1 = 0 and z = 0
    val half = Seq((0L, true), (1L, true), (2L, false), (3L, true))
    val subj = half.map { case (t, e) => (t, e, 1) } ++
      half.map { case (t, e) => (t, e, 0) }
    val row = Survival.logRank(
      subj.toDF("dur", "ev", "g"), $"dur", $"ev", $"g").collect()(0)
    assert(math.abs(row.getLong(2).toDouble - row.getDouble(3)) < 1e-12)
    assert(math.abs(row.getDouble(5)) < 1e-12)
  }

  test("logRank: one empty group degenerates to null z") {
    val subj = Seq((1L, true, 1), (2L, false, 1), (3L, true, 1))
    val row = Survival.logRank(
      subj.toDF("dur", "ev", "g"), $"dur", $"ev", $"g").collect()(0)
    assert(row.getLong(1) == 0L && row.isNullAt(5) && row.isNullAt(6))
  }

  test("logRank guards: bad group and negative duration raise") {
    val bad = Seq((1L, true, 2)).toDF("dur", "ev", "g")
    val e1 = intercept[Exception](
      Survival.logRank(bad, $"dur", $"ev", $"g").collect())
    assert(e1.getMessage.contains("group") ||
      Option(e1.getCause).exists(_.getMessage.contains("group")))
    val neg = Seq((-1L, true, 1)).toDF("dur", "ev", "g")
    val e2 = intercept[Exception](
      Survival.logRank(neg, $"dur", $"ev", $"g").collect())
    assert(e2.getMessage.contains("duration") ||
      Option(e2.getCause).exists(_.getMessage.contains("duration")))
  }

  // --- CUPED

  test("property: cuped matches exact-BigInt sufficient statistics") {
    val genRows = for {
      n <- Gen.chooseNum(2, 40)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf(0, 1)
        x <- Gen.chooseNum(-50L, 50L)
        y <- Gen.chooseNum(-50L, 50L)
      } yield (a, x, y))
    } yield rows
    check(Prop.forAll(genRows) { rows =>
      val got = Experiment.cuped(rows.toDF("arm", "x", "y"), $"arm", $"y", $"x")
        .collect().map(r => r.getInt(0) -> r).toMap
      val gn = BigInt(rows.size)
      val gsx = rows.map(r => BigInt(r._2)).sum
      val gsy = rows.map(r => BigInt(r._3)).sum
      val gsxy = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val gsxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val den = (gn * gsxx - gsx * gsx).toDouble
      val theta = if (den > 0) Some((gn * gsxy - gsx * gsy).toDouble / den) else None
      val gmx = gsx.toDouble / gn.toDouble
      rows.groupBy(_._1).forall { case (arm, rs) =>
        val r = got(arm)
        val n = rs.size
        val my = rs.map(r2 => BigInt(r2._3)).sum.toDouble / n
        val mx = rs.map(r2 => BigInt(r2._2)).sum.toDouble / n
        math.abs(r.getDouble(2) - my) < 1e-9 &&
          math.abs(r.getDouble(3) - mx) < 1e-9 && (theta match {
            case None => r.isNullAt(4) && r.isNullAt(5)
            case Some(th) =>
              math.abs(r.getDouble(4) - th) < 1e-9 &&
                math.abs(r.getDouble(5) - (my - th * (mx - gmx))) < 1e-9
          })
      }
    })
  }

  test("cuped: weighted mean of adjusted means equals the grand mean of y") {
    // the defining invariant: CUPED re-centers, never shifts the total
    val rows = Seq((0, 10L, 3L), (0, 4L, 1L), (1, 8L, 5L), (1, 2L, 2L), (1, 6L, 4L))
    val got = Experiment.cuped(rows.toDF("arm", "y", "x"), $"arm", $"y", $"x")
      .collect()
    val total = got.map(r => r.getLong(1) * r.getDouble(5)).sum
    val grand = rows.map(_._2).sum.toDouble
    assert(math.abs(total - grand) < 1e-9)
  }

  test("cuped: constant covariate nulls theta and adj_mean") {
    val rows = Seq((0, 10L, 7L), (1, 4L, 7L), (1, 6L, 7L))
    val got = Experiment.cuped(rows.toDF("arm", "y", "x"), $"arm", $"y", $"x")
      .collect()
    assert(got.forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  // --- graph structure metrics

  test("degreeAssortativity: star graph is perfectly disassortative") {
    val es = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(es, $"a", $"b").collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == -1.0)
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val r2 = Graph.degreeAssortativity(ring, $"a", $"b").collect()(0)
    assert(r2.isNullAt(2)) // all degrees equal — zero variance
  }

  test("richClub: thresholds count club nodes and internal edges") {
    // hub square 1-2-3-4 (complete K4) + pendants 5..8 one per hub
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val pend = Seq((1L, 5L), (2L, 6L), (3L, 7L), (4L, 8L))
    val es = (k4 ++ pend).toDF("a", "b")
    val got = Graph.richClub(es, $"a", $"b", ks = Seq(1L, 3L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3))))
      .toMap
    // deg(hubs) = 4, deg(pendants) = 1
    assert(got(1L) == ((4L, 6L, 1.0))) // club = K4, fully connected
    assert(got(3L) == ((4L, 6L, 1.0)))
  }

  test("globalClustering: triangle with a pendant gives 3T/W = 3/5") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val r = Graph.globalClustering(es, $"a", $"b").collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 1L) // one triangle
    assert(r.getDecimal(3).longValueExact == 5L) // wedges 1+1+3+0
    assert(r.getDouble(4) == 3.0 / 5.0)
  }

  // --- posting varint estimate

  test("postingVarintEstimate: gaps, first-id absolute, byte widths") {
    val rows = Seq(
      ("t1", 5L), ("t1", 10L), ("t1", 300L), // 1 + 1 + 2 bytes (gap 290)
      ("t2", 20000L), ("t2", 20001L), // 3 bytes (20000 ≥ 16384) + 1
      ("t2", 20000L)) // duplicate posting collapses
    val r = Encoding.postingVarintEstimate(rows.toDF("t", "id"), $"t", $"id")
      .collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
    assert(r.getLong(2) == 40L)
    assert(r.getLong(3) == 1L + 1L + 2L + 3L + 1L)
    assert(r.getDouble(4) == 8.0 / 40.0)
  }

  // --- local clustering / k-truss / power law

  test("localClustering: triangle+pendant hand-check") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val got = Graph.localClustering(es, $"a", $"b")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(4L)._1 == 1L && got(4L)._2 == 0L && got(4L)._3.isNaN)
  }

  test("kTruss: peels the pendant triangle off the K4 core") {
    // K4 on 1..4 (every edge on 2 triangles) + triangle (4,5,6)
    // hanging off node 4 (its edges sit on exactly 1 triangle)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val hang = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val es = (k4 ++ hang).toDF("a", "b")
    val t4 = Graph.kTruss(es, $"a", $"b", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4.keySet == k4.toSet)
    assert(t4.values.forall(_ == 2L))
    // k=3 keeps everything (all edges on >= 1 triangle)
    val t3 = Graph.kTruss(es, $"a", $"b", k = 3).collect()
    assert(t3.length == 9)
    // a pure star has no triangles: empty truss
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    assert(Graph.kTruss(star, $"a", $"b", k = 3).collect().isEmpty)
  }

  test("kTruss: raises when maxIter rounds do not reach the fixpoint") {
    // K4 + hanging triangle needs 2 rounds under k=4: round 1 drops
    // the hanging edges, round 2 confirms the K4 fixpoint
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val es = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toDF("a", "b")
    val e = intercept[Exception] {
      Graph.kTruss(es, $"a", $"b", k = 4, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("fixpoint"))
  }

  test("powerLawAlpha: matches the closed form on a hand distribution") {
    // values: 5 x3, 10 x2, 20 x1; xmin=5 → n=6,
    // lnsum = 2·ln(2) + ln(4)
    val xs = Seq(5L, 5L, 5L, 10L, 10L, 20L, 3L, 1L).toDF("x")
    val r = Profiling.powerLawAlpha(xs, $"x", xmin = 5L).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L)
    val lnsum = 2.0 * math.log(10.0 / 5.0) + math.log(20.0 / 5.0)
    assert(math.abs(r.getDouble(2) - lnsum) < 1e-12)
    assert(math.abs(r.getDouble(3) - (1.0 + 6.0 / lnsum)) < 1e-12)
    // degenerate: all values at xmin → alpha null
    val deg = Seq(5L, 5L).toDF("x")
    val r2 = Profiling.powerLawAlpha(deg, $"x", xmin = 5L).collect()(0)
    assert(r2.getLong(0) == 2L && r2.getDouble(2) == 0.0 && r2.isNullAt(3))
  }

  // --- dcf / ohlc / gini

  test("dcf: npv, exact payback, and gap periods") {
    // flows at t=0,1,3 (gap at 2): -100, +60, +70 cents
    val rows = Seq(("p", 10L, -100L), ("p", 11L, 60L), ("p", 13L, 70L))
      .toDF("k", "per", "cents")
    val r = Finance.dcf(rows, $"k", $"per", $"cents", ratePerPeriod = 0.1)
      .collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 30L)
    assert(r.getLong(3) == 3L) // cum: -100, -40, +30 at t=3
    val npv = -100.0 + 60.0 / 1.1 + 70.0 / math.pow(1.1, 3)
    assert(math.abs(r.getDouble(4) - npv) < 1e-9)
    // never-positive flows: payback null
    val neg = Seq(("q", 0L, -5L), ("q", 1L, -7L)).toDF("k", "per", "cents")
    val r2 = Finance.dcf(neg, $"k", $"per", $"cents", 0.1).collect()(0)
    assert(r2.isNullAt(3) && r2.getLong(2) == -12L)
  }

  test("ohlcBars: open/close tie-break, extremes, vwap") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // one bucket (period 1h): two rows share the open timestamp
    val rows = Seq(
      ("a", ts(0), 500L, 2L), ("a", ts(0), 400L, 1L), // open = 400 (tie→low)
      ("a", ts(10), 900L, 3L), ("a", ts(20), 300L, 1L),
      ("a", ts(30), 700L, 2L), // close = 700
      ("a", ts(3700), 100L, 1L)) // next bucket
      .toDF("k", "ts", "cents", "q")
    val got = TimeSeries.ohlcBars(rows, $"k", $"ts", $"cents", $"q", 3600L)
      .collect().map(r => r.getLong(1) -> r).toMap
    val b0 = got(got.keys.min)
    assert(b0.getLong(2) == 5L)
    assert(b0.getLong(3) == 400L && b0.getLong(4) == 900L)
    assert(b0.getLong(5) == 300L && b0.getLong(6) == 700L)
    assert(b0.getLong(7) == 9L)
    val vwap = (500.0 * 2 + 400 + 900 * 3 + 300 + 700 * 2) / 9.0
    assert(math.abs(b0.getDouble(8) - vwap) < 1e-12)
    assert(got(got.keys.max).getLong(3) == 100L)
  }

  test("giniCoefficient: known distributions") {
    // perfect equality → gini 0
    val eq = Seq.fill(4)(("a", 100L)).toDF("k", "v")
    val r1 = RankStats.giniCoefficient(eq, $"k", $"v").collect()(0)
    assert(r1.getLong(1) == 4L && r1.getString(2) == "400")
    assert(math.abs(r1.getDouble(3)) < 1e-12)
    // one-holder concentration over n=4 → (n-1)/n = 0.75
    val conc = (Seq(("b", 100L)) ++ Seq.fill(3)(("b", 0L))).toDF("k", "v")
    val r2 = RankStats.giniCoefficient(conc, $"k", $"v").collect()(0)
    assert(math.abs(r2.getDouble(3) - 0.75) < 1e-12)
    // hand case with ties: values 1,1,2 → Σr·v = 1.5+1.5+6 = 9,
    // G = (2·9 − 4·4)/(3·4) = 2/12
    val h = Seq(("c", 1L), ("c", 1L), ("c", 2L)).toDF("k", "v")
    val r3 = RankStats.giniCoefficient(h, $"k", $"v").collect()(0)
    assert(math.abs(r3.getDouble(3) - 2.0 / 12.0) < 1e-12)
  }

  test("property: giniCoefficient equals brute midrank formula") {
    val gen = Gen.listOfN(30, Gen.chooseNum(0L, 50L))
    check(Prop.forAll(gen) { vs =>
      val df = vs.map(("g", _)).toDF("k", "v")
      val got = RankStats.giniCoefficient(df, $"k", $"v").collect()(0)
      val n = vs.size
      val sv = vs.sum
      if (sv == 0 || n < 2) got.isNullAt(3)
      else {
        val sorted = vs.sorted
        val ranks: Seq[Double] = vs.map { v =>
          val lo = sorted.count(_ < v); val t = sorted.count(_ == v)
          lo + (t + 1) / 2.0
        }
        val expect = (2.0 * ranks.zip(vs).map { case (r, v) => r * v }.sum
          - (n + 1.0) * sv) / (n.toDouble * sv)
        math.abs(got.getDouble(3) - expect) < 1e-9
      }
    }, min = 15)
  }

  // --- spatial radius join

  test("radiusJoin: finds exactly the within-radius pairs across cells") {
    // pairs straddling cell boundaries must still be found
    val pts = Seq(
      (1L, 0.99, 0.99), (2L, 1.01, 1.01), // adjacent cells, dist ~0.028
      (3L, 0.10, 0.10), (4L, 0.12, 0.10), // same-ish cell, dist 0.02
      (5L, 5.00, 5.00)) // isolated
      .toDF("id", "x", "y")
    val got = Spatial.radiusJoin(pts, $"id", $"x", $"y", radius = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("property: radiusJoin equals brute-force all-pairs") {
    val gen = Gen.listOfN(40, for {
      x <- Gen.chooseNum(-1.0, 1.0); y <- Gen.chooseNum(-1.0, 1.0)
    } yield (x, y))
    check(Prop.forAll(gen) { ps =>
      val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val r = 0.3
      val expect = (for {
        (a, i) <- pts.zipWithIndex; (b, j) <- pts.zipWithIndex
        if i < j
        d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
        if d2 <= r * r
      } yield (a._1, b._1)).toSet
      val got = Spatial.radiusJoin(
        pts.toDF("id", "x", "y"), $"id", $"x", $"y", r)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      got == expect
    }, min = 10)
  }

  // --- categorical association

  test("categoricalAssociation: hand 2x2 table with a zero cell") {
    // cells: (a,x)=2 (a,y)=2 (b,x)=4 (b,y)=0; n=8
    val rows = Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(4)(("b", "x"))
    val r = Profiling.categoricalAssociation(
      rows.toDF("u", "v"), $"u", $"v").collect()(0)
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    // expected: e(a,x)=4*6/8=3, e(a,y)=1, e(b,x)=3, e(b,y)=1
    val chi2 = math.pow(2 - 3.0, 2) / 3.0 + math.pow(2 - 1.0, 2) / 1.0 +
      math.pow(4 - 3.0, 2) / 3.0 + math.pow(0 - 1.0, 2) / 1.0
    assert(math.abs(r.getDouble(3) - chi2) < 1e-12)
    assert(math.abs(r.getDouble(4) - math.sqrt(chi2 / 8.0)) < 1e-12)
    val mi = 2.0 / 8 * math.log(8 * 2.0 / (4 * 6.0)) +
      2.0 / 8 * math.log(8 * 2.0 / (4 * 2.0)) +
      4.0 / 8 * math.log(8 * 4.0 / (4 * 6.0))
    assert(math.abs(r.getDouble(5) - mi) < 1e-12)
  }

  test("categoricalAssociation: independent columns give zero chi2/mi") {
    val rows = for { u <- Seq("a", "b"); v <- Seq("x", "y", "z") }
      yield (u, v)
    val r = Profiling.categoricalAssociation(
      rows.toDF("u", "v"), $"u", $"v").collect()(0)
    assert(math.abs(r.getDouble(3)) < 1e-12)
    assert(math.abs(r.getDouble(5)) < 1e-12)
    // single-category column: cramers_v undefined
    val one = Seq(("a", "x"), ("a", "y")).toDF("u", "v")
    val r2 = Profiling.categoricalAssociation(one, $"u", $"v").collect()(0)
    assert(r2.isNullAt(4))
  }

  // --- RAKE

  test("rakeScores: phrase degrees and scores match hand computation") {
    // "red apple and green apple" → phrases [red apple][green apple]
    // deg(apple)=2+2=4 freq=2 score 2; red/green deg 2 freq 1 score 2
    val docs = Seq((1L, "red apple and green apple"),
      (2L, "the apple")).toDF("id", "text")
    val got = TextAnalysis.rakeScores(docs, $"id", $"text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("apple") == ((3L, 5L, 5.0 / 3.0))) // +1 solo phrase in doc 2
    assert(got("red") == ((1L, 2L, 2.0)))
    assert(got("green") == ((1L, 2L, 2.0)))
    assert(!got.contains("and") && !got.contains("the"))
  }

  // --- ranked-retrieval metrics

  test("rankingMetrics: textbook NDCG/AP/RR hand-check") {
    // one query, 5 items ranked by score: rels in rank order 3,0,1,0,2
    val rows = Seq(
      ("a", 1L, 50.0, 3L), ("a", 2L, 40.0, 0L), ("a", 3L, 30.0, 1L),
      ("a", 4L, 20.0, 0L), ("a", 5L, 10.0, 2L))
    val r = RankingMetrics.rankingMetrics(
      rows.toDF("q", "i", "s", "r"), $"q", $"i", $"s", $"r", k = 5)
      .collect()(0)
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = 7.0 / lg2(2) + 0.0 + 1.0 / lg2(4) + 0.0 + 3.0 / lg2(6)
    // ideal order rels: 3,2,1,0,0
    val idcg = 7.0 / lg2(2) + 3.0 / lg2(3) + 1.0 / lg2(4)
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - dcg) < 1e-12)
    assert(math.abs(r.getDouble(4) - dcg / idcg) < 1e-12)
    // hits at positions 1,3,5 → AP = (1/1 + 2/3 + 3/5)/3
    assert(math.abs(r.getDouble(5) - (1.0 + 2.0 / 3.0 + 3.0 / 5.0) / 3.0) < 1e-12)
    assert(r.getDouble(6) == 1.0)
  }

  test("rankingMetrics: cutoff k, score ties break by item id, no-rel nulls") {
    // tied scores: item 1 (rel 0) ranks before item 2 (rel 1); k=1
    // sees only the irrelevant item, so DCG@1 = 0 but IDCG@1 > 0
    val rows = Seq(("a", 1L, 5.0, 0L), ("a", 2L, 5.0, 1L),
      ("b", 7L, 1.0, 0L))
    val got = RankingMetrics.rankingMetrics(
      rows.toDF("q", "i", "s", "r"), $"q", $"i", $"s", $"r", k = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getDouble(3) == 0.0 && a.getDouble(4) == 0.0)
    assert(a.getDouble(5) == 0.5) // hit at pos 2: (2's prec 1/2)/1
    assert(a.getDouble(6) == 0.5)
    val b = got("b")
    assert(b.isNullAt(4) && b.isNullAt(5) && b.isNullAt(6))
  }

  test("rankingMetrics: duplicate item ids and out-of-range rel raise") {
    val dup = Seq(("a", 1L, 5.0, 0L), ("a", 1L, 4.0, 1L))
      .toDF("q", "i", "s", "r")
    val e = intercept[Exception] {
      RankingMetrics.rankingMetrics(dup, $"q", $"i", $"s", $"r", k = 2)
        .collect()
    }
    assert(e.getMessage.contains("duplicate item"))
    val bad = Seq(("a", 1L, 5.0, 31L)).toDF("q", "i", "s", "r")
    val e2 = intercept[Exception] {
      RankingMetrics.rankingMetrics(bad, $"q", $"i", $"s", $"r", k = 2)
        .collect()
    }
    assert(e2.getMessage.contains("[0, 30]"))
  }

  // --- Spearman

  test("property: spearman equals midrank Pearson computed by brute force") {
    val genRows = for {
      n <- Gen.chooseNum(2, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        x <- Gen.chooseNum(0, 8)
        y <- Gen.chooseNum(0, 8)
      } yield (g, x.toDouble, y.toDouble))
    } yield rows
    def midranks(vs: Seq[Double]): Map[Double, Double] =
      vs.distinct.map { v =>
        val below = vs.count(_ < v); val ties = vs.count(_ == v)
        v -> (below + (ties + 1) / 2.0)
      }.toMap
    check(Prop.forAll(genRows) { rows =>
      val got = RankStats.spearman(rows.toDF("g", "x", "y"), $"g", $"x", $"y")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
        .toMap
      rows.groupBy(_._1).forall { case (g, rs) =>
        val rx = midranks(rs.map(_._2)); val ry = midranks(rs.map(_._3))
        val pts = rs.map(r => (rx(r._2), ry(r._3)))
        val n = pts.size.toDouble
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val syy = pts.map(p => p._2 * p._2).sum
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        val (gn, gr) = got(g)
        gn == rs.size.toLong && {
          if (rs.size < 2 || vx <= 0 || vy <= 0) gr.isEmpty
          else gr.exists(r =>
            math.abs(r - (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
              < 1e-9)
        }
      }
    })
  }

  test("spearman: monotone transform invariance") {
    val rows = (1 to 30).map(i => ("g", i.toDouble, (i * i).toDouble))
    val r = RankStats.spearman(rows.toDF("g", "x", "y"), $"g", $"x", $"y")
      .collect()(0)
    assert(r.getDouble(2) == 1.0) // perfectly monotone → rho exactly 1
  }

  // --- Cronbach's alpha

  test("cronbachAlpha matches the variance-ratio formula") {
    val rows = Seq((1L, 2L, 3L), (2L, 4L, 5L), (3L, 6L, 8L), (4L, 8L, 9L))
    val r = Profiling.cronbachAlpha(rows.toDF("a", "b", "c"),
      Seq("a" -> $"a", "b" -> $"b", "c" -> $"c")).collect()(0)
    def varN(vs: Seq[Long]): BigInt = {
      val n = BigInt(vs.size)
      n * vs.map(v => BigInt(v) * BigInt(v)).sum -
        vs.map(BigInt(_)).sum * vs.map(BigInt(_)).sum
    }
    val a = Seq(1L, 2L, 3L, 4L); val b = Seq(2L, 4L, 6L, 8L)
    val c = Seq(3L, 5L, 8L, 9L)
    val t = a.zip(b).zip(c).map { case ((x, y), z) => x + y + z }
    val num = varN(a) + varN(b) + varN(c)
    val den = varN(t)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDecimal(2).toBigInteger == num.bigInteger)
    assert(r.getDecimal(3).toBigInteger == den.bigInteger)
    assert(r.getDouble(4) ==
      3.0 * (1.0 - num.toDouble / den.toDouble) / 2.0)
  }

  test("cronbachAlpha: zero scale variance nulls alpha") {
    // items perfectly anticorrelated: total constant
    val rows = Seq((1L, 9L), (5L, 5L), (9L, 1L))
    val r = Profiling.cronbachAlpha(rows.toDF("a", "b"),
      Seq("a" -> $"a", "b" -> $"b")).collect()(0)
    assert(r.isNullAt(4))
  }

  test("cronbachAlpha: out-of-contract sum magnitude raises, not null") {
    // per-row squares stay inside int64 (3e9² = 9e18) but Σx² = 2.7e19
    // crosses 10^19: the narrowing cast must raise loudly instead of
    // silently producing a null alpha
    val big = 3000000000L
    val rows = Seq((big, 1L), (big, 2L), (big, 3L))
    val e = intercept[Exception] {
      Profiling.cronbachAlpha(rows.toDF("a", "b"),
        Seq("a" -> $"a", "b" -> $"b")).collect()
    }
    assert(e.getMessage.contains("10^19") ||
      Option(e.getCause).exists(_.getMessage.contains("10^19")),
      s"wrong failure: ${e.getMessage}")
  }

  // --- Herfindahl

  test("herfindahl: monopoly = 1, perfect balance = 1/n, entities pre-sum") {
    val rows = Seq(
      (1L, 10L, 7L), // nation 1: single entity → 1.0
      (2L, 20L, 5L), (2L, 21L, 5L), (2L, 22L, 5L), (2L, 23L, 5L), // 1/4
      (3L, 30L, 3L), (3L, 30L, 3L), (3L, 31L, 6L)) // entity 30 sums to 6
    val got = Profiling.herfindahl(rows.toDF("k", "e", "w"), $"k", $"e", $"w")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((1L, 1.0)))
    assert(got(2L) == ((4L, 0.25)))
    assert(got(3L) == ((2L, (36.0 + 36.0) / 144.0))) // two entities of 6
  }

  // --- expected calibration error

  test("eceFromScores: the integer-gap collapse equals the textbook bin sum") {
    // two bins: scores 0.1 and 0.9 in micro-units
    val rows = Seq((100000L, false), (100000L, true), (900000L, true),
      (900000L, true), (900000L, false), (900000L, true))
    val r = ModelEval.eceFromScores(rows.toDF("s", "y"), $"s", $"y", bins = 2)
      .collect()(0)
    // bin 0: n=2 pos=1 conf=0.1 → |0.5-0.1|*2/6; bin 1: n=4 pos=3
    // conf=0.9 → |0.75-0.9|*4/6; ece = (0.8 + 0.6)/6/... compute via
    // exact gaps: |1e6 - 2e5| + |3e6 - 3.6e6| = 8e5 + 6e5 = 1.4e6
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getDecimal(2).longValueExact == 1400000L)
    assert(r.getDouble(3) == 1400000.0 / (6.0 * 1000000.0))
  }

  test("eceFromScores: perfectly calibrated constant predictor scores ~0") {
    // score = exact base rate of the bin it lands in
    val rows = Seq((500000L, true), (500000L, false))
    val r = ModelEval.eceFromScores(rows.toDF("s", "y"), $"s", $"y", bins = 4)
      .collect()(0)
    assert(r.getDecimal(2).longValueExact == 0L && r.getDouble(3) == 0.0)
  }

  // --- Cohen's kappa

  test("cohenKappa matches the hand formula; constant raters null out") {
    val rows = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"))
    val r = Experiment.cohenKappa(rows.toDF("x", "y"), $"x", $"y").collect()(0)
    // agree = 3, n = 5; rows a=2 b=2 c=1; cols a=2 b=3
    // pe_num = 2*2 + 2*3 + 1*0 = 10
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    val po = 3.0 / 5.0
    val pe = 10.0 / 25.0
    assert(r.getDouble(2) == po && r.getDouble(3) == pe)
    assert(r.getDouble(4) == (po - pe) / (1.0 - pe))
    val const = Seq(("a", "a"), ("a", "a"))
    val r2 = Experiment.cohenKappa(const.toDF("x", "y"), $"x", $"y").collect()(0)
    assert(r2.isNullAt(4)) // pe = 1
  }

  // --- Gini feature screen

  test("giniFeatureGain matches brute impurity; perfect predictor gets full gain") {
    val rows = Seq(
      ("x", "p", true), ("x", "p", true), ("y", "p", false),
      ("y", "q", false), ("x", "q", true), ("y", "q", false))
    // feature f1 ("x"/"y") predicts y perfectly; f2 ("p"/"q") does not
    val got = Profiling.giniFeatureGain(
      rows.toDF("f1", "f2", "y"), $"y",
      Seq("f1" -> $"f1", "f2" -> $"f2"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val root = 2.0 * 3 * 3 / 36.0 // 0.5
    assert(got("f1")._1 == 2L && got("f1")._2 == 0.0)
    assert(got("f1")._3 == root)
    // f2: p = (2 pos, 1 neg), q = (1 pos, 2 neg): term each =
    // (9 - 4 - 1)/(6*3) = 4/18
    val gwF2 = (9.0 - 4.0 - 1.0) / 18.0 + (9.0 - 1.0 - 4.0) / 18.0
    assert(math.abs(got("f2")._2 - gwF2) < 1e-15)
  }

  // --- Qini curve

  test("qiniCurve: cumulative accounting and the uplift formula") {
    // deterministic hash arms; verify against a recomputation with
    // the operator's own arm assignment
    val rows = (1L to 300L).map(u => (u, (u % 50).toDouble, u % 3 == 0))
    val df = rows.toDF("u", "s", "y")
    val got = ModelEval.qiniCurve(df, $"u", $"s", $"y", buckets = 4)
      .collect().sortBy(_.getInt(0))
    val armed = df.select($"u", $"s", $"y",
      (pmod(KmvSketch.hash60($"u"), lit(2L)) === 0L).as("t"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3)))
    assert(got.map(_.getLong(1)).sum == armed.count(_._4).toLong)
    assert(got.map(_.getLong(3)).sum == armed.count(!_._4).toLong)
    // last bucket's cumulative = totals; qini matches the pinned form
    val last = got.last
    val (cnt, cct, cnc, ccc) = (last.getLong(5), last.getLong(6),
      last.getLong(7), last.getLong(8))
    assert(cnt == armed.count(_._4).toLong &&
      ccc == armed.count(a => !a._4 && a._3).toLong)
    assert(last.getDouble(9) ==
      cct.toDouble - ccc.toDouble * (cnt.toDouble / cnc.toDouble))
  }

  // --- Jonckheere-Terpstra pairs

  test("property: jonckheerePairs equals brute pairwise counting") {
    val genRows = for {
      n <- Gen.chooseNum(2, 50)
      rows <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(1, 3)
        v <- Gen.chooseNum(0, 6)
      } yield (g.toLong, v.toDouble))
    } yield rows
    check(Prop.forAll(genRows) { rows =>
      val got = RankStats.jonckheerePairs(rows.toDF("g", "v"), $"g", $"v")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDecimal(4).longValueExact)))
        .toMap
      val groups = rows.map(_._1).distinct.sorted
      val expect = (for {
        gi <- groups; gj <- groups if gi < gj
        ai = rows.filter(_._1 == gi).map(_._2)
        bj = rows.filter(_._1 == gj).map(_._2)
      } yield {
        val u2 = (for (a <- ai; b <- bj)
          yield if (a < b) 2L else if (a == b) 1L else 0L).sum
        (gi, gj) -> ((ai.size.toLong, bj.size.toLong, u2))
      }).toMap
      got == expect
    })
  }

  // --- McNemar

  test("mcnemar matches hand counts; no discordance nulls chi2") {
    val rows = Seq((false, false), (false, true), (false, true),
      (true, false), (true, true))
    val r = Experiment.mcnemar(rows.toDF("a", "b"), $"a", $"b").collect()(0)
    assert(r.getLong(0) == 1 && r.getLong(1) == 2 &&
      r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(r.getDouble(4) == (2.0 - 1.0) * (2.0 - 1.0) / 3.0)
    val conc = Seq((true, true), (false, false))
    val r2 = Experiment.mcnemar(conc.toDF("a", "b"), $"a", $"b").collect()(0)
    assert(r2.isNullAt(4))
  }

  // --- MASE backtest

  test("maseBacktest matches a hand-computed seasonal-naive score") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // key "a": days 0..13, value = 10*day cents; split at day 10
    val rows = (0L to 13L).map(day => ("a", t(day), day * 10L))
    val r = TimeSeries.maseBacktest(rows.toDF("k", "ts", "v"),
      $"k", $"ts", $"v", seasonLag = 7, splitPeriod = 10L,
      periodSeconds = 86400L).collect()(0)
    // test days 10..13 vs lag-7 (days 3..6): |10d - 10(d-7)| = 70 each
    assert(r.getLong(1) == 4L && r.getDouble(3) == 280.0)
    // naive: days 1..9 vs previous: |10| each → 9 steps, sae 90
    assert(r.getLong(2) == 9L && r.getDouble(4) == 90.0)
    assert(r.getDouble(5) == (280.0 / 4.0) / (90.0 / 9.0)) // = 7.0
  }

  test("maseBacktest: gaps skip pairs instead of fabricating them") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // day 13 has no day-6 partner; day 11 pairs with day 4
    val rows = Seq(("a", t(5L), 50L), ("a", t(4L), 40L), ("a", t(11L), 90L),
      ("a", t(13L), 100L))
    val r = TimeSeries.maseBacktest(rows.toDF("k", "ts", "v"),
      $"k", $"ts", $"v", seasonLag = 7, splitPeriod = 10L,
      periodSeconds = 86400L).collect()(0)
    assert(r.getLong(1) == 1L) // only day 11 forecastable
    assert(r.getLong(2) == 1L) // only (4,5) naive step
  }

  // --- vocabulary growth

  test("vocabularyGrowth: first-appearance accounting and cumulative curve") {
    val docs = Seq(
      (0L, "alpha beta"), (1L, "beta gamma"), // bucket 0: alpha beta gamma
      (2L, "alpha delta"), (3L, ""), // bucket 1: delta; empty doc counts
      (5L, "beta epsilon")) // bucket 2 (id 4 missing): epsilon
    val got = TextAnalysis.vocabularyGrowth(
      docs.toDF("doc_id", "text"), $"doc_id", $"text", bucketDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) == ((2L, 3L, 3L)))
    assert(got(1L) == ((2L, 1L, 4L)))
    assert(got(2L) == ((1L, 1L, 5L)))
  }

  // --- content-addressed chunking

  test("fixedChunks: boundaries, lengths, md5s, and cross-doc refs") {
    val docs = Seq((1L, "abcdefgh"), (2L, "abcdxyz"), (3L, "abcd"))
    val got = Multimodal.fixedChunks(docs.toDF("doc_id", "text"),
      $"doc_id", $"text", chunkChars = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))))
      .toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // "abcd" appears as chunk 0 of all three docs → refs = 3
    assert(got((1L, 0L)) == ((0L, 4L, m("abcd"), 3L)))
    assert(got((1L, 1L)) == ((4L, 4L, m("efgh"), 1L)))
    assert(got((2L, 1L)) == ((4L, 3L, m("xyz"), 1L))) // short tail chunk
    assert(got((3L, 0L)) == ((0L, 4L, m("abcd"), 3L)))
    assert(got.size == 5)
  }

  // --- selectKth

  test("property: selectKth returns exact order statistics at arbitrary ranks") {
    val genVals = for {
      n <- Gen.chooseNum(1, 80)
      vs <- Gen.listOfN(n, Gen.chooseNum(-50, 50))
    } yield vs.map(_.toDouble)
    check(Prop.forAll(genVals) { vs =>
      val sorted = vs.sorted
      val ks = Seq(1L, (vs.size / 2 + 1).toLong, vs.size.toLong).distinct
      val (n, got) = ExactQuantile.selectKth(vs.toDF("v"), $"v", ks, bins = 8)
      n == vs.size.toLong &&
        got.forall { case (k, v) => v == sorted((k - 1).toInt) }
    })
  }

  // --- split conformal

  test("splitConformal: qhat is the exact k-th calibration residual and coverage audits") {
    val rows = (1L to 400L).map(u => (u, u % 37, 3 * (u % 37) + (u % 11)))
    val df = rows.toDF("u", "x", "y")
    val r = ModelEval.splitConformal(df, $"u", $"x", $"y", 1L, 8L).collect()(0)
    val slope = r.getDouble(3); val icept = r.getDouble(4)
    val k = r.getLong(5); val qhat = r.getDouble(6)
    // recompute the splits with the operator's own hash
    val withSplit = df.select($"u", $"x", $"y",
      pmod(KmvSketch.hash60($"u"), lit(3L)).as("s"))
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3)))
    def resid(x: Long, y: Long) = math.abs(y.toDouble - (icept + slope * x.toDouble))
    val calR = withSplit.filter(_._4 == 1L).map(t => resid(t._2, t._3)).sorted
    assert(r.getLong(1) == calR.size.toLong)
    assert(k == math.min(calR.size.toLong, ((calR.size + 1L) * 7L + 7L) / 8L))
    assert(qhat == calR((k - 1).toInt))
    val tst = withSplit.filter(_._4 == 2L)
    val covered = tst.count(t => resid(t._2, t._3) <= qhat).toLong
    assert(r.getLong(7) == covered)
    assert(r.getDouble(8) == covered.toDouble / tst.size)
  }

  test("splitConformal: constant train covariate raises") {
    val rows = (1L to 60L).map(u => (u, 5L, u))
    val e = intercept[Exception](ModelEval.splitConformal(
      rows.toDF("u", "x", "y"), $"u", $"x", $"y", 1L, 8L).collect())
    assert(e.getMessage.contains("constant"))
  }

  // --- diff-in-diff

  test("diffInDiff matches hand-computed cell means and contrast") {
    val rows = Seq(
      (false, false, 10L), (false, false, 20L),
      (false, true, 30L),
      (true, false, 5L), (true, false, 15L),
      (true, true, 40L), (true, true, 50L))
    val r = Experiment.diffInDiff(
      rows.toDF("tr", "po", "y"), $"tr", $"po", $"y").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 1 &&
      r.getLong(2) == 2 && r.getLong(3) == 2)
    assert(r.getDouble(4) == 15.0 && r.getDouble(5) == 30.0 &&
      r.getDouble(6) == 10.0 && r.getDouble(7) == 45.0)
    assert(r.getDouble(8) == (45.0 - 10.0) - (30.0 - 15.0))
  }

  // --- grid-density clustering

  /** Brute reference: cells, density filter, union-find over the
    * 8-neighbourhood.
    */
  private def refGrid(pts: Seq[(Double, Double)], w: Double, h: Double,
      minPts: Int): Map[(Long, Long), (Long, Long)] = {
    val cells = pts.groupBy(p =>
      (math.floor(p._1 / w).toLong, math.floor(p._2 / h).toLong))
      .view.mapValues(_.size.toLong).toMap
    val dense = cells.filter(_._2 >= minPts).keys.toSeq
    val parent = scala.collection.mutable.Map(dense.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for {
      a <- dense; b <- dense
      if a != b && math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    def enc(c: (Long, Long)): Long = (c._1 + (1L << 20)) * (1L << 21) + (c._2 + (1L << 20))
    val comp = dense.groupBy(find).flatMap { case (_, members) =>
      val label = members.map(enc).min
      members.map(_ -> label)
    }
    dense.map(c => c -> ((cells(c), comp(c)))).toMap
  }

  test("property: gridDensityClusters equals brute union-find components") {
    val genPts = for {
      n <- Gen.chooseNum(1, 120)
      pts <- Gen.listOfN(n, for {
        x <- Gen.chooseNum(-20, 20)
        y <- Gen.chooseNum(-20, 20)
      } yield (x.toDouble, y.toDouble))
    } yield pts
    check(Prop.forAll(genPts) { pts =>
      val got = Clustering.gridDensityClusters(
        pts.toDF("x", "y"), $"x", $"y", cellW = 7.0, cellH = 7.0, minPts = 3L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      got == refGrid(pts, 7.0, 7.0, 3)
    }, min = 20)
  }

  test("gridDensityClusters: isolated dense cell is a singleton cluster") {
    val pts = Seq.fill(5)((0.5, 0.5)) ++ Seq.fill(5)((100.0, 100.0))
    val got = Clustering.gridDensityClusters(
      pts.toDF("x", "y"), $"x", $"y", 1.0, 1.0, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.size == 2)
    assert(got.values.toSet.size == 2) // two distinct clusters
  }

  test("gridDensityClusters guards: NaN point raises") {
    val pts = Seq((Double.NaN, 1.0)).toDF("x", "y")
    val e = intercept[Exception](Clustering.gridDensityClusters(
      pts, $"x", $"y", 1.0, 1.0, 1L).collect())
    assert(e.getMessage.contains("finite") ||
      Option(e.getCause).exists(_.getMessage.contains("finite")))
  }

  // --- SPC charts

  test("pChart matches hand-computed limits and flags") {
    // day 1: 1/10 defective; day 2: 8/10; day 3: 2/5 — pbar = 11/25
    val rows = (1 to 10).map(i => (1L, i <= 1)) ++
      (1 to 10).map(i => (2L, i <= 8)) ++ (1 to 5).map(i => (3L, i <= 2))
    val got = Spc.pChart(rows.toDF("day", "d"), $"day", $"d")
      .collect().map(r => r.getLong(0) -> r).toMap
    val pbar = 11.0 / 25.0
    assert(got(1L).getDouble(4) == pbar)
    val s10 = math.sqrt(pbar * (1 - pbar) / 10.0)
    assert(got(1L).getDouble(5) == pbar + 3.0 * s10)
    assert(got(1L).getDouble(6) == math.max(0.0, pbar - 3.0 * s10))
    // day 2's 0.8 is above UCL ≈ 0.44 + 0.47 = 0.91? no: 3σ = 0.471 →
    // ucl ≈ 0.911 — 0.8 in control; recompute: flags must match formula
    rows.groupBy(_._1).foreach { case (day, rs) =>
      val n = rs.size; val d = rs.count(_._2)
      val phat = d.toDouble / n
      val sig = math.sqrt(pbar * (1 - pbar) / n)
      val exp = phat > pbar + 3.0 * sig || phat < math.max(0.0, pbar - 3.0 * sig)
      assert(got(day).getBoolean(7) == exp, s"day $day flag")
    }
  }

  test("cChart flags a count beyond three sigma") {
    // daily error counts: 4, 4, 4, 16 → cbar = 7, ucl = 7 + 3√7 ≈ 14.9
    val rows = Seq.fill(4)(1L) ++ Seq.fill(4)(2L) ++ Seq.fill(4)(3L) ++
      Seq.fill(16)(4L)
    val got = Spc.cChart(rows.toDF("day"), $"day")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(5)))).toMap
    assert(got(1L) == ((4L, false)) && got(4L) == ((16L, true)))
  }

  // --- per-group-total largest remainder

  test("property: largestRemainderBy sums to each group's own total") {
    val genGroups = for {
      ng <- Gen.chooseNum(1, 4)
      gs <- Gen.listOfN(ng, for {
        total <- Gen.chooseNum(0L, 500L)
        ni <- Gen.chooseNum(1, 6)
        ws <- Gen.listOfN(ni, Gen.chooseNum(0L, 30L))
        if ws.sum > 0
      } yield (total, ws))
    } yield gs.zipWithIndex
    check(Prop.forAll(genGroups) { gs =>
      val rows = gs.flatMap { case ((total, ws), g) =>
        ws.zipWithIndex.map { case (w, i) => (g.toLong, i.toLong, w, total) }
      }
      val got = Allocation.largestRemainderBy(
        rows.toDF("g", "i", "w", "t"), $"g", $"i", $"w", $"t")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      gs.forall { case ((total, ws), g) =>
        val allocs = ws.indices.map(i => got((g.toLong, i.toLong)))
        allocs.sum == total &&
          // every item gets at least its floor share
          ws.zip(allocs).forall { case (w, a) =>
            a >= total * w / ws.sum && a <= total * w / ws.sum + 1
          }
      }
    })
  }

  test("largestRemainderBy: constant-total groups equal largestRemainder") {
    val rows = Seq((1L, 1L, 3L, 10L), (1L, 2L, 7L, 10L),
      (2L, 1L, 5L, 10L), (2L, 2L, 5L, 10L), (2L, 3L, 1L, 10L))
    val a = Allocation.largestRemainderBy(
      rows.toDF("g", "i", "w", "t"), $"g", $"i", $"w", $"t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Allocation.largestRemainder(
      rows.toDF("g", "i", "w", "t"), $"g", $"i", $"w", total = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("largestRemainderBy: a non-constant group total raises") {
    val rows = Seq((1L, 1L, 3L, 10L), (1L, 2L, 7L, 20L))
    val e = intercept[Exception](Allocation.largestRemainderBy(
      rows.toDF("g", "i", "w", "t"), $"g", $"i", $"w", $"t").collect())
    assert(e.getMessage.contains("constant") ||
      Option(e.getCause).exists(_.getMessage.contains("constant")))
  }

  test("largestRemainderBy: total=0 with zero weights allocates 0, not NULL") {
    // 0 div 0 regression: a group with total = 0 AND zero total weight
    // must emit alloc = 0 for every item (nothing to allocate), never
    // a silent NULL from the non-ANSI 0 div 0
    val rows = Seq((1L, 1L, 0L, 0L), (1L, 2L, 0L, 0L), // degenerate group
      (2L, 1L, 2L, 5L), (2L, 2L, 3L, 5L))              // normal group
    val got = Allocation.largestRemainderBy(
      rows.toDF("g", "i", "w", "t"), $"g", $"i", $"w", $"t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(got((1L, 1L)) == 0L && got((1L, 2L)) == 0L)
    assert(got((2L, 1L)).asInstanceOf[Long] + got((2L, 2L)).asInstanceOf[Long] == 5L)
  }

  // --- containment pairs

  test("property: containmentPairsFromHashed equals brute all-pairs containment") {
    // docs as random subsets of a small hash universe — sorted distinct
    val genDocs = for {
      nd <- Gen.chooseNum(2, 8)
      docs <- Gen.listOfN(nd, Gen.someOf(1L to 12L))
      if docs.forall(_.nonEmpty)
    } yield docs.zipWithIndex.map { case (s, i) => (i.toLong, s.toSeq.sorted) }
    check(Prop.forAll(genDocs, Gen.oneOf((1L, 2L), (2L, 3L), (1L, 1L))) {
      case (docsRaw, (tn, td)) =>
        // filter here, not only in the generator: shrinking ignores
        // generator filters and an empty set makes containment 0/0
        val docs = docsRaw.filter(_._2.nonEmpty)
        val hashed = docs.map { case (id, hs) => (id, hs, hs.size.toLong) }
          .toDF("doc_id", "hs", "n_sh")
        val got = Dedup.containmentPairsFromHashed(hashed, tn, td)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
          .toMap
        val expect = (for {
          (a, sa) <- docs; (b, sb) <- docs
          if a != b
          inter = sa.toSet.intersect(sb.toSet).size.toLong
          if inter * td >= tn * sa.size
        } yield (a, b) -> ((inter, sa.size.toLong))).toMap
        got == expect
    }, min = 25)
  }

  // --- auction clearing

  /** Brute reference: evaluate D/S at every distinct price level,
    * pick by (volume desc, imbalance asc, price asc).
    */
  private def refClearing(bids: Seq[(Long, Long, Long)], asks: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] = {
    val keys = (bids.map(_._1) ++ asks.map(_._1)).distinct
    keys.map { k =>
      val bs = bids.filter(_._1 == k)
      val as = asks.filter(_._1 == k)
      val levels = (bs.map(_._2) ++ as.map(_._2)).distinct.sorted
      val best = levels.map { p =>
        val d = bs.filter(_._2 >= p).map(_._3).sum
        val s = as.filter(_._2 <= p).map(_._3).sum
        (p, math.min(d, s), d, s)
      }.minBy { case (p, vol, d, s) => (-vol, math.abs(d - s), p) }
      k -> best
    }.toMap
  }

  test("property: uniformClearing equals brute price-level evaluation") {
    val genOrders = for {
      nb <- Gen.chooseNum(0, 12)
      na <- Gen.chooseNum(0, 12)
      bs <- Gen.listOfN(nb, for {
        k <- Gen.chooseNum(1L, 3L); p <- Gen.chooseNum(1L, 8L)
        q <- Gen.chooseNum(0L, 10L)
      } yield (k, p, q))
      as <- Gen.listOfN(na, for {
        k <- Gen.chooseNum(1L, 3L); p <- Gen.chooseNum(1L, 8L)
        q <- Gen.chooseNum(0L, 10L)
      } yield (k, p, q))
      if bs.nonEmpty || as.nonEmpty
    } yield (bs, as)
    check(Prop.forAll(genOrders) { case (bs, as) =>
      val bdf = bs.toDF("k", "p", "q")
      val adf = as.toDF("k", "p", "q")
      val got = Auction.uniformClearing(bdf, adf,
        $"k", $"p", $"q", $"k", $"p", $"q")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      got == refClearing(bs, as)
    }, min = 30)
  }

  test("uniformClearing: crossing book clears at the max-volume price") {
    // bids: 10@5, 20@4; asks: 10@3, 10@4 → p=3: vol=10 (S=10), imb 20
    // p=4: D=30, S=20 → vol 20, imb 10  ← unique max volume
    // p=5: D=10, S=20 → vol 10, imb 10
    val bids = Seq((1L, 5L, 10L), (1L, 4L, 20L)).toDF("k", "p", "q")
    val asks = Seq((1L, 3L, 10L), (1L, 4L, 10L)).toDF("k", "p", "q")
    val r = Auction.uniformClearing(bids, asks, $"k", $"p", $"q", $"k", $"p", $"q")
      .collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 20L &&
      r.getLong(3) == 30L && r.getLong(4) == 20L)
  }

  test("uniformClearing guards: negative qty raises") {
    val bids = Seq((1L, 5L, -1L)).toDF("k", "p", "q")
    val asks = Seq((1L, 3L, 10L)).toDF("k", "p", "q")
    val e = intercept[Exception](Auction.uniformClearing(
      bids, asks, $"k", $"p", $"q", $"k", $"p", $"q").collect())
    assert(e.getMessage.contains("non-negative") ||
      Option(e.getCause).exists(_.getMessage.contains("non-negative")))
  }

  // --- landmark closeness

  test("property: landmarkCloseness equals per-landmark brute BFS") {
    val genGraph = for {
      n <- Gen.chooseNum(2, 14)
      m <- Gen.chooseNum(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong - 1)
        b <- Gen.chooseNum(0L, n.toLong - 1)
        if a != b
      } yield (a, b))
      if es.nonEmpty
    } yield es
    check(Prop.forAll(genGraph) { es =>
      val lms = Seq(0L, 1L)
      val hops = 4
      val adj = (es ++ es.map(e => (e._2, e._1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      def bfs(s: Long): Map[Long, Int] = {
        var dist = Map(s -> 0); var frontier = Set(s)
        for (h <- 1 to hops) {
          val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
            .diff(dist.keySet)
          next.foreach(n => dist += n -> h)
          frontier = next
        }
        dist
      }
      val expect = lms.flatMap(l => bfs(l).toSeq.filter(_._2 > 0)
        .map { case (n, d) => n -> d })
        .groupBy(_._1).map { case (n, ds) =>
          val hs = ds.map(_._2)
          n -> ((hs.size.toLong, hs.map(_.toLong).sum, hs.map(60L / _).sum))
        }
      val got = Graph.landmarkCloseness(
        es.toDF("a", "b"), $"a", $"b", lms, hops)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      got == expect
    }, min = 20)
  }

  test("landmarkCloseness: maxHops beyond the sixtieths bound raises") {
    val es = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](
      Graph.landmarkCloseness(es, $"a", $"b", Seq(1L), maxHops = 7))
  }

  test("diffInDiff: an empty cell nulls the contrast, not zero") {
    val rows = Seq((false, false, 10L), (false, true, 30L), (true, true, 40L))
    val r = Experiment.diffInDiff(
      rows.toDF("tr", "po", "y"), $"tr", $"po", $"y").collect()(0)
    assert(r.getLong(2) == 0 && r.isNullAt(6) && r.isNullAt(8))
  }

  // --- Kruskal–Wallis

  /** Textbook H: global midranks by sort, Σ R_g²/n_g, tie correction. */
  private def refKw(rows: Seq[(Int, Double)]): (Double, Option[Double]) = {
    val n = rows.size
    val sorted = rows.map(_._2).sorted
    val rankOf: Map[Double, Double] = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
    val s = rows.groupBy(_._1).values
      .map { rs => math.pow(rs.map(r => rankOf(r._2)).sum, 2) / rs.size }.sum
    val h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    val ties = sorted.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val den = 1.0 - ties / (math.pow(n, 3) - n)
    (h, if (den > 0) Some(h / den) else None)
  }

  private val genKwRows: Gen[List[(Int, Int)]] = for {
    n <- Gen.chooseNum(2, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(1, 4)
      v <- Gen.chooseNum(0, 9) // small range → heavy ties
    } yield (g, v))
  } yield rows

  test("property: kruskalWallis equals the textbook H, any bucket count") {
    check(Prop.forAll(genKwRows, Gen.oneOf(1, 2, 7, 1024)) { (rows, buckets) =>
      val df = rows.map { case (g, v) => ("k", g, v) }.toDF("k", "g", "v")
      val r = RankStats.kruskalWallis(df, $"k", $"g", $"v", buckets)
        .collect()(0)
      val (eh, eha) = refKw(rows.map { case (g, v) => (g, v.toDouble) })
      val hOk = math.abs(r.getDouble(3) - eh) < 1e-9
      val haOk = (eha, if (r.isNullAt(4)) None else Some(r.getDouble(4))) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
        case (None, None)       => true
        case _                  => false
      }
      r.getLong(1) == rows.size &&
        r.getLong(2) == rows.map(_._1).distinct.size && hOk && haOk
    })
  }

  test("kruskalWallis: all values tied → h = 0, tie-corrected h null") {
    val df = Seq(("k", 1, 5), ("k", 2, 5), ("k", 2, 5)).toDF("k", "g", "v")
    val r = RankStats.kruskalWallis(df, $"k", $"g", $"v").collect()(0)
    assert(r.getDouble(3) == 0.0 && r.isNullAt(4))
  }

  test("kruskalWallis: null group raises") {
    val df = Seq(("k", Some(1), 5), ("k", None, 6)).toDF("k", "g", "v")
    val e = intercept[Exception] {
      RankStats.kruskalWallis(df, $"k", $"g", $"v").collect()
    }
    assert(e.getMessage.contains("non-null integer"))
  }

  // --- one-way ANOVA / Brown–Forsythe

  /** Textbook F from per-group means. */
  private def refAnova(rows: Seq[(Int, Double)])
      : (Double, Double, Option[Double]) = {
    val n = rows.size
    val k = rows.map(_._1).distinct.size
    val grand = rows.map(_._2).sum / n
    val byG = rows.groupBy(_._1).values.toSeq
    val ssb = byG.map { rs =>
      val m = rs.map(_._2).sum / rs.size; rs.size * (m - grand) * (m - grand)
    }.sum
    val ssw = byG.map { rs =>
      val m = rs.map(_._2).sum / rs.size
      rs.map(r => (r._2 - m) * (r._2 - m)).sum
    }.sum
    val f = if (k >= 2 && n > k && ssw > 0)
      Some((ssb / (k - 1)) / (ssw / (n - k))) else None
    (ssb, ssw, f)
  }

  private val genAnovaRows: Gen[List[(Int, Int)]] = for {
    n <- Gen.chooseNum(2, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(1, 3)
      v <- Gen.chooseNum(-20, 20)
    } yield (g, v))
  } yield rows

  test("property: anovaF equals the textbook decomposition") {
    check(Prop.forAll(genAnovaRows) { rows =>
      val df = rows.map { case (g, v) => ("k", g, v) }.toDF("k", "g", "v")
      val r = Experiment.anovaF(df, $"k", $"g", $"v").collect()(0)
      val (essb, essw, ef) = refAnova(rows.map { case (g, v) => (g, v.toDouble) })
      val fOk = (ef, if (r.isNullAt(5)) None else Some(r.getDouble(5))) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9 * math.max(1.0, a.abs)
        case (None, None)       => true
        case _                  => false
      }
      math.abs(r.getDouble(3) - essb) < 1e-6 &&
        math.abs(r.getDouble(4) - essw) < 1e-6 && fOk
    })
  }

  test("anovaF: sum-of-squares past 2^53 raises loudly") {
    val df = Seq(("k", 1, 95000000L), ("k", 2, 95000001L), ("k", 1, 95000002L))
      .toDF("k", "g", "v")
    val e = intercept[Exception] {
      Experiment.anovaF(df, $"k", $"g", $"v").collect()
    }
    assert(e.getMessage.contains("exceeds 2^53"))
  }

  test("property: brownForsythe equals ANOVA on |v - group median|") {
    check(Prop.forAll(genAnovaRows) { rows =>
      val df = rows.map { case (g, v) => ("k", g, v) }.toDF("k", "g", "v")
      val r = Experiment.brownForsythe(df, $"k", $"g", $"v").collect()(0)
      val devs = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        val vs = rs.map(_._2.toDouble).sorted
        val m = (vs((vs.size - 1) / 2) + vs(vs.size / 2)) / 2.0
        rs.map(x => (g, math.abs(x._2 - m)))
      }
      val (essb, essw, ef) = refAnova(devs)
      val fOk = (ef, if (r.isNullAt(5)) None else Some(r.getDouble(5))) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9 * math.max(1.0, a.abs)
        case (None, None)       => true
        case _                  => false
      }
      // emitted SSB/SSW are on the doubled-deviation scale: 4×
      math.abs(r.getDouble(3) - 4 * essb) < 1e-6 &&
        math.abs(r.getDouble(4) - 4 * essw) < 1e-6 && fOk
    })
  }

  // --- max drawdown

  test("property: maxDrawdown equals the sequential peak-trough fold") {
    val genPath: Gen[List[Int]] =
      Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 50)))
    check(Prop.forAll(genPath) { prices =>
      val rows = prices.zipWithIndex.map { case (p, i) =>
        ("k", 1000000L * i, i.toLong, p.toLong)
      }
      val df = rows.toDF("k", "us", "tb", "p")
        .select($"k", ($"us" / 1000000L).cast("timestamp").as("ts"),
          $"tb", $"p")
      val r = TimeSeries.maxDrawdown(df, $"k", $"ts", $"tb", $"p")
        .collect()(0)
      var m = Long.MinValue; var dd = 0L; var frac = Option.empty[Double]
      for (p <- prices.map(_.toLong)) {
        m = math.max(m, p); dd = math.max(dd, m - p)
        if (m > 0L) {
          val f = (m - p).toDouble / m.toDouble
          frac = Some(math.max(frac.getOrElse(0.0), f))
        }
      }
      r.getLong(1) == prices.size && r.getLong(2) == prices.max.toLong &&
        r.getLong(3) == dd &&
        ((frac, if (r.isNullAt(4)) None else Some(r.getDouble(4))) match {
          case (Some(a), Some(b)) => a == b
          case (None, None)       => true
          case _                  => false
        })
    })
  }

  // --- Lorenz curve

  test("property: lorenzCurve equals the sorted cumulative shares") {
    val genAmts: Gen[List[Int]] = Gen.chooseNum(1, 50)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(0, 0, 1, 2, 5, 5, 9, 100)))
    check(Prop.forAll(genAmts, Gen.oneOf(2, 4, 8)) { (amts, b) =>
      val got = RankStats.lorenzCurve(amts.map(Tuple1(_)).toDF("v"), $"v", b)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          BigInt(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      val sorted = amts.map(_.toLong).sorted
      val tot = sorted.sum
      got.forall { case (i, r, cut, cum, share) =>
        val er = (i.toLong * amts.size + b - 1) / b
        val ecum = BigInt(sorted.take(er.toInt).sum)
        r == er && cut == sorted(er.toInt - 1) && cum == ecum &&
          (share match {
            case Some(sh) => tot > 0 &&
              math.abs(sh - ecum.toDouble / tot.toDouble) < 1e-12
            case None => tot == 0L
          })
      } && got.length == b
    })
  }

  // --- bounded Katz

  test("property: katzBounded equals brute walk counting") {
    val genEdges: Gen[List[(Long, Long)]] = Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 8L); b <- Gen.chooseNum(0L, 8L)
      } yield (a, b)))
    check(Prop.forAll(genEdges) { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      edges.isEmpty || {
        val adj = (edges ++ edges.map(_.swap)).distinct
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
        def walks(i: Int): Map[Long, Long] =
          if (i == 1) adj.map { case (k, ns) => k -> ns.size.toLong }
          else {
            val prev = walks(i - 1)
            adj.map { case (k, ns) => k -> ns.map(prev).sum }
          }
        val (w1, w2, w3) = (walks(1), walks(2), walks(3))
        val got = Graph.katzBounded(
          edges.toDF("s", "t"), $"s", $"t", hops = 3, alphaDen = 8L)
          .collect()
        got.length == adj.size && got.forall { r =>
          val n = r.getLong(0)
          r.getLong(1) == w1(n) && r.getLong(2) == w2(n) &&
            r.getLong(3) == w3(n) &&
            r.getDouble(4) ==
              (w1(n) * 64L + w2(n) * 8L + w3(n)).toDouble / 512.0
        }
      }
    })
  }

  // --- Wilcoxon signed-rank

  /** Textbook W⁺ and z from midranks of |d|. */
  private def refWilcoxon(pairs: Seq[(Int, Int)])
      : (Long, Long, Option[Double], Option[Double]) = {
    val ds = pairs.map { case (x, y) => (y - x).toLong }.filter(_ != 0L)
    if (ds.isEmpty) (pairs.size.toLong, 0L, None, None)
    else {
      val abs = ds.map(math.abs).sorted
      val rankOf: Map[Long, Double] = abs.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
      val wp = ds.filter(_ > 0).map(d => rankOf(math.abs(d))).sum
      val n = ds.size.toDouble
      val ties = abs.groupBy(identity).values
        .map(g => math.pow(g.size, 3) - g.size).sum
      val varw = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
      val z = if (varw > 0) Some((wp - n * (n + 1) / 4.0) / math.sqrt(varw))
              else None
      (pairs.size.toLong, ds.size.toLong, Some(wp), z)
    }
  }

  test("property: wilcoxonSignedRank equals the textbook statistic") {
    val genPairs: Gen[List[(Int, Int)]] = Gen.chooseNum(1, 50).flatMap(n =>
      Gen.listOfN(n, for {
        x <- Gen.chooseNum(0, 8); y <- Gen.chooseNum(0, 8)
      } yield (x, y)))
    check(Prop.forAll(genPairs) { pairs =>
      val df = pairs.map { case (x, y) => ("k", x, y) }.toDF("k", "x", "y")
      val r = RankStats.wilcoxonSignedRank(df, $"k", $"x", $"y").collect()(0)
      val (enp, enz, ewp, ez) = refWilcoxon(pairs)
      def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      r.getLong(1) == enp && r.getLong(2) == enz &&
        ((ewp, optD(3)) match {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case (None, None)       => true
          case _                  => false
        }) &&
        ((ez, optD(4)) match {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case (None, None)       => true
          case _                  => false
        })
    })
  }

  // --- Friedman

  /** Textbook χ²_F with within-block midranks and tie correction. */
  private def refFriedman(blocks: Seq[Seq[Int]]): (Double, Option[Double]) = {
    val b = blocks.size.toDouble
    val k = blocks.head.size.toDouble
    def midranks(vs: Seq[Int]): Seq[Double] = {
      val sorted = vs.sorted
      val rk = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
      vs.map(rk)
    }
    val ranks = blocks.map(midranks)
    val rT = (0 until blocks.head.size).map(t => ranks.map(_(t)).sum)
    val chi2 = 12.0 / (b * k * (k + 1)) * rT.map(r => r * r).sum -
      3.0 * b * (k + 1)
    val ties = blocks.map(vs => vs.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum).sum
    val den = 1.0 - ties / (b * k * (k * k - 1))
    (chi2, if (den > 0) Some(chi2 / den) else None)
  }

  test("property: friedman equals the textbook statistic; incomplete blocks drop") {
    val genDesign: Gen[(Int, List[List[Int]])] = for {
      k <- Gen.chooseNum(2, 5)
      b <- Gen.chooseNum(1, 15)
      blocks <- Gen.listOfN(b, Gen.listOfN(k, Gen.chooseNum(0, 6)))
    } yield (k, blocks)
    check(Prop.forAll(genDesign) { case (k, blocks) =>
      // block ids 0..b-1 complete; block 999 deliberately incomplete
      // (missing treatment 1) — it must be dropped entirely
      val rows = blocks.zipWithIndex.flatMap { case (vs, bi) =>
        vs.zipWithIndex.map { case (v, t) => ("g", bi.toLong, t.toLong, v) }
      } ++ (2 until k).map(t => ("g", 999L, t.toLong, 3))
      val r = RankStats.friedman(
        rows.toDF("k", "b", "t", "v"), $"k", $"b", $"t", $"v").collect()(0)
      val (ec, eca) = refFriedman(blocks)
      r.getLong(1) == blocks.size && r.getLong(2) == k &&
        math.abs(r.getDouble(3) - ec) < 1e-9 &&
        ((eca, if (r.isNullAt(4)) None else Some(r.getDouble(4))) match {
          case (Some(a), Some(b2)) => math.abs(a - b2) < 1e-9
          case (None, None)        => true
          case _                   => false
        })
    })
  }

  test("friedman: duplicate (key, block, treatment) cells raise") {
    val rows = Seq(("g", 1L, 1L, 5), ("g", 1L, 1L, 6), ("g", 1L, 2L, 7))
    val e = intercept[Exception] {
      RankStats.friedman(rows.toDF("k", "b", "t", "v"),
        $"k", $"b", $"t", $"v").collect()
    }
    assert(e.getMessage.contains("more than one row"))
  }

  // --- link prediction

  test("property: linkPrediction equals brute wedge scoring; cap excludes hub centers") {
    val genEdges: Gen[List[(Long, Long)]] = Gen.chooseNum(3, 30).flatMap(n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L)
      } yield (a, b)))
    check(Prop.forAll(genEdges, Gen.oneOf(2, 3, 100)) { (raw, cap) =>
      val canon = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      canon.isEmpty || {
        val adj = (canon ++ canon.map(_.swap))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
        val deg = adj.map { case (k, ns) => k -> ns.size }
        val pairs = (for {
          w <- adj.keys.toSeq if deg(w) <= cap
          u <- adj(w); v <- adj(w) if u < v
          if !adj(u).contains(v)
        } yield ((u, v), w)).groupBy(_._1)
          .map { case (p, ws) =>
            val centers = ws.map(_._2).sorted
            p -> ((centers.size.toLong,
              centers.foldLeft(0.0)((s, w) => s + 1.0 / deg(w))))
          }.filter(_._2._1 >= 2L)
        val got = Graph.linkPrediction(
          canon.toDF("s", "t"), $"s", $"t",
          minCommon = 2, maxCenterDegree = cap)
          .collect().map(r => ((r.getLong(0), r.getLong(1)),
            (r.getLong(2), r.getDouble(3)))).toMap
        got.keySet == pairs.keySet && pairs.forall { case (p, (cn, ra)) =>
          got(p)._1 == cn && math.abs(got(p)._2 - ra) < 1e-12
        }
      }
    })
  }

  // --- pinball backtest

  test("property: quantilePinballBacktest equals brute order-statistic + loss") {
    val genRows: Gen[List[(Int, Boolean)]] = Gen.chooseNum(1, 50).flatMap(n =>
      Gen.listOfN(n, for {
        v <- Gen.chooseNum(0, 12); tr <- Gen.oneOf(true, false)
      } yield (v, tr)))
    check(Prop.forAll(genRows) { rows =>
      val train = rows.filter(_._2).map(_._1.toLong)
      train.isEmpty || {
        val df = rows.map { case (v, tr) => ("g", v, tr) }.toDF("g", "v", "tr")
        val r = ModelEval.quantilePinballBacktest(
          df, $"g", $"v", $"tr", num = 3, den = 4).collect()(0)
        val sorted = train.sorted
        val k = (3 * train.size + 3) / 4
        val f = sorted(k - 1)
        val ev = rows.filterNot(_._2).map(_._1.toLong)
        val sx = ev.map(y => math.max(3 * (y - f), -(y - f))).sum
        r.getLong(1) == train.size && r.getLong(2) == f &&
          r.getLong(3) == ev.size && BigInt(r.getString(4)) == BigInt(sx) &&
          (if (ev.isEmpty) r.isNullAt(5)
           else r.getDouble(5) == sx.toDouble / (4.0 * ev.size))
      }
    })
  }

  // --- RFM segmentation

  test("property: rfmSegments equals brute quintile scoring") {
    val genRows: Gen[List[(Int, Int, Int)]] = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, for {
        r <- Gen.chooseNum(0, 9); f <- Gen.chooseNum(0, 5)
        m <- Gen.chooseNum(0, 200)
      } yield (r, f, m)))
    check(Prop.forAll(genRows) { rows =>
      val n = rows.size
      def cuts(vs: Seq[Long]): Seq[Long] = {
        val s = vs.sorted
        (1 to 4).map(i => s((((i.toLong * n + 4) / 5) - 1).toInt))
      }
      val (rc, fc, mc) = (cuts(rows.map(_._1.toLong)),
        cuts(rows.map(_._2.toLong)), cuts(rows.map(_._3.toLong)))
      val expect = rows.groupBy { case (r, f, m) =>
        (6 - (1 + rc.count(_ < r)), 1 + fc.count(_ < f), 1 + mc.count(_ < m))
      }.map { case (k, rs) =>
        k -> ((rs.size.toLong, BigInt(rs.map(_._3.toLong).sum)))
      }
      val got = Profiling.rfmSegments(
        rows.toDF("r", "f", "m"), $"r", $"f", $"m")
        .collect().map(x => ((x.getInt(0), x.getInt(1), x.getInt(2)),
          (x.getLong(3), BigInt(x.getString(4))))).toMap
      got == expect
    })
  }

  // --- decision stump

  test("property: bestNumericSplit equals brute threshold search") {
    val genRows: Gen[List[(Int, Int)]] = Gen.chooseNum(2, 60).flatMap(n =>
      Gen.listOfN(n, for {
        v <- Gen.chooseNum(0, 7); y <- Gen.oneOf(0, 1)
      } yield (v, y)))
    check(Prop.forAll(genRows) { rows =>
      rows.map(_._1).distinct.size < 2 || {
        val n = rows.size.toDouble
        def gini(rs: Seq[(Int, Int)]): Double = {
          val p = rs.count(_._2 == 1).toDouble
          val q = rs.size - p
          1.0 - (p * p + q * q) / (rs.size.toDouble * rs.size.toDouble)
        }
        val cands = rows.map(_._1).distinct.sorted.init.map { v =>
          val (l, r) = rows.partition(_._1 <= v)
          (v, (l.size * gini(l) + r.size * gini(r)) / n, l.size.toLong)
        }
        val best = cands.minBy(c => (c._2, c._1))
        val row = Profiling.bestNumericSplit(
          rows.map { case (v, y) => ("x", v, y) }.toDF("ft", "v", "y"),
          $"ft", $"v", $"y").collect()(0)
        row.getLong(1) == rows.size && row.getLong(2) == best._1.toLong &&
          row.getLong(3) == best._3 &&
          math.abs(row.getDouble(4) - best._2) < 1e-9 &&
          math.abs(row.getDouble(5) - gini(rows)) < 1e-12 &&
          math.abs(row.getDouble(6) - (gini(rows) - best._2)) < 1e-9
      }
    })
  }

  // --- LIFO matching

  test("property: matchLotsLifo equals the sequential stack fold") {
    val genLedger: Gen[(List[(Long, Long, Long)], Long)] = for {
      n <- Gen.chooseNum(1, 12)
      lots <- Gen.listOfN(n, for {
        q <- Gen.chooseNum(0L, 9L); c <- Gen.chooseNum(1L, 5L)
      } yield (q, c))
      sold <- Gen.chooseNum(0L, 60L)
    } yield (lots.zipWithIndex.map { case ((q, c), i) => (i.toLong, q, c) }, sold)
    check(Prop.forAll(genLedger) { case (lots, sold) =>
      val buys = lots.map { case (i, q, c) =>
        ("k", new java.sql.Timestamp(i * 1000L), i, q, c)
      }.toDF("k", "ts", "tb", "q", "c")
      val sells = Seq(("k", sold)).toDF("k", "q")
      val r = Fifo.matchLotsLifo(buys, sells,
        $"k", $"ts", $"tb", $"q", $"c", $"k", $"q").collect()(0)
      // stack fold: consume newest lots first
      var remaining = sold
      var cogs = BigInt(0); var matched = 0L
      for ((_, q, c) <- lots.reverse) {
        val m = math.min(q, math.max(0L, remaining))
        matched += m; cogs += BigInt(m) * c; remaining -= m
      }
      r.getLong(3) == matched && BigInt(r.getDecimal(4).toBigInteger) == cogs &&
        r.getLong(7) == math.max(0L, sold - lots.map(_._2).sum)
    })
  }

  // --- info gain

  test("infoGainScreen equals direct entropy arithmetic") {
    val rows = Seq(("f", 1, 1), ("f", 1, 1), ("f", 1, 0), ("f", 2, 0),
      ("f", 2, 0), ("f", 2, 1))
    val r = Profiling.infoGainScreen(
      rows.toDF("ft", "v", "y"), $"ft", $"v", $"y").collect()(0)
    def h(p: Double): Double =
      if (p <= 0 || p >= 1) 0.0
      else -(p * math.log(p) + (1 - p) * math.log(1 - p))
    val root = h(3.0 / 6.0)
    val hw = 0.5 * h(2.0 / 3.0) + 0.5 * h(1.0 / 3.0)
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - root) < 1e-12 &&
      math.abs(r.getDouble(3) - hw) < 1e-12 &&
      math.abs(r.getDouble(4) - (root - hw)) < 1e-12)
  }

  // --- seasonal Mann–Kendall

  test("property: seasonalMannKendall equals brute within-season pairs") {
    val genSeries: Gen[List[Int]] = Gen.chooseNum(4, 40)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 5)))
    check(Prop.forAll(genSeries) { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        ("k", new java.sql.Timestamp(i.toLong * 86400L * 1000L), v)
      }
      val r = TimeSeries.seasonalMannKendall(
        rows.toDF("k", "ts", "v"), $"k", $"ts", $"v",
        periodSeconds = 86400L, seasonPeriods = 7).collect()(0)
      val bySea = vals.zipWithIndex.groupBy(_._2 % 7)
      var sStat = 0L; var vnum = 0L
      for ((_, xs) <- bySea) {
        val vs = xs.map(_._1)
        for (i <- vs.indices; j <- i + 1 until vs.size)
          sStat += java.lang.Long.signum(vs(j).toLong - vs(i).toLong)
        val n = vs.size.toLong
        val ties = vs.groupBy(identity).values
          .map { g => val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
        vnum += n * (n - 1) * (2 * n + 5) - ties
      }
      val varS = vnum.toDouble / 18.0
      val ez =
        if (varS <= 0) None
        else if (sStat > 0) Some((sStat - 1.0) / math.sqrt(varS))
        else if (sStat < 0) Some((sStat + 1.0) / math.sqrt(varS))
        else Some(0.0)
      r.getLong(1) == vals.size && r.getLong(2) == sStat &&
        ((ez, if (r.isNullAt(3)) None else Some(r.getDouble(3))) match {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-12
          case (None, None)       => true
          case _                  => false
        })
    })
  }

  // --- plan shapes of the new scale-sensitive operators

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("plan: linkPrediction never goes cartesian or nested-loop") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L))
      .toDF("s", "t")
    val plan = finalPlan(Graph.linkPrediction(edges, $"s", $"t", 1, 64))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge/anti-join path must stay equi-join only:\n$plan")
  }

  test("plan: katzBounded is equi-joins + aggregates only") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "t")
    val plan = finalPlan(Graph.katzBounded(edges, $"s", $"t", 3, 8L))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("plan: lorenzCurve evaluates all cuts without any Window") {
    val df = (1 to 100).map(i => Tuple1(i.toLong)).toDF("v")
    val plan = finalPlan(RankStats.lorenzCurve(df, $"v", buckets = 4))
    assert(!plan.contains("Window"),
      s"the conditional-sum pass must not sort/window the data:\n$plan")
  }

  test("plan: rfmSegments scores without any Window") {
    val df = (1 to 60).map(i => (i, i % 7, i * 3)).toDF("r", "f", "m")
    val plan = finalPlan(Profiling.rfmSegments(df, $"r", $"f", $"m"))
    assert(!plan.contains("Window"),
      s"cut scoring must be a map-side comparison, not a rank window:\n$plan")
  }

  // --- Page's trend test

  test("property: pageTrend equals textbook L and z on complete blocks") {
    val genDesign: Gen[(Int, List[List[Int]])] = for {
      k <- Gen.chooseNum(2, 5)
      b <- Gen.chooseNum(1, 12)
      blocks <- Gen.listOfN(b, Gen.listOfN(k, Gen.chooseNum(0, 6)))
    } yield (k, blocks)
    check(Prop.forAll(genDesign) { case (k, blocks) =>
      val rows = blocks.zipWithIndex.flatMap { case (vs, bi) =>
        vs.zipWithIndex.map { case (v, t) =>
          ("g", bi.toLong, (t + 1).toLong, v)
        }
      }
      val r = RankStats.pageTrend(
        rows.toDF("k", "b", "t", "v"), $"k", $"b", $"t", $"v").collect()(0)
      def midranks(vs: Seq[Int]): Seq[Double] = {
        val sorted = vs.sorted
        val rk = sorted.zipWithIndex.groupBy(_._1)
          .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
        vs.map(rk)
      }
      val ranks = blocks.map(midranks)
      val l = (0 until k).map(j => (j + 1) * ranks.map(_(j)).sum).sum
      val bN = blocks.size.toDouble
      val eL = bN * k * (k + 1.0) * (k + 1.0) / 4.0
      val vL = bN * k * k * (k + 1.0) * (k * k - 1.0) / 144.0
      math.abs(r.getDouble(3) - l) < 1e-9 &&
        ((if (vL > 0) Some((l - eL) / math.sqrt(vL)) else None,
          if (r.isNullAt(4)) None else Some(r.getDouble(4))) match {
          case (Some(a), Some(b2)) => math.abs(a - b2) < 1e-9
          case (None, None)        => true
          case _                   => false
        })
    })
  }

  test("pageTrend: non-consecutive treatment ordinals raise") {
    val rows = Seq(("g", 1L, 2L, 5), ("g", 1L, 3L, 6))
    val e = intercept[Exception] {
      RankStats.pageTrend(rows.toDF("k", "b", "t", "v"),
        $"k", $"b", $"t", $"v").collect()
    }
    assert(e.getMessage.contains("consecutive ordinals"))
  }

  // --- Shannon diversity

  test("shannonDiversity equals direct entropy") {
    val rows = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "c"))
    val r = Profiling.shannonDiversity(rows.toDF("g", "c"), $"g", $"c")
      .collect()(0)
    val h = -(0.5 * math.log(0.5) + 2 * (0.25 * math.log(0.25)))
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - h) < 1e-12 &&
      math.abs(r.getDouble(4) - math.exp(h)) < 1e-12)
  }

  // --- Wilson interval

  test("wilsonInterval equals the closed form; edge rates stay in [0,1]") {
    val rows = (1 to 40).map(i => ("g", i <= 10)) ++
      Seq(("z", true), ("z", true)) // p̂ = 1 — Wald would collapse
    val got = Experiment.wilsonInterval(rows.toDF("g", "y"), $"g", $"y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val (n, p, z) = (40.0, 0.25, 1.96)
    val c = p + z * z / (2 * n)
    val h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    val dn = 1 + z * z / n
    assert(got("g")._1 == 40L && got("g")._2 == 0.25)
    assert(math.abs(got("g")._3 - (c - h) / dn) < 1e-12)
    assert(math.abs(got("g")._4 - (c + h) / dn) < 1e-12)
    assert(got("z")._3 > 0.0 && got("z")._4 <= 1.0 && got("z")._3 < 1.0)
  }

  // --- readability

  test("readability counts words, sentence runs, and vowel groups") {
    val rows = Seq(
      (1L, "The cat sat. The dog ran!! Done?"),
      (2L, ""), (3L, "zzz pfft"))
    val got = TextAnalysis.readability(rows.toDF("id", "tx"), $"tx", $"id")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // doc 1: 7 words, 3 sentence runs, vowel groups: e,a,a,e,o,a,o,e = 8
    assert(got(1L)._1 == 7 && got(1L)._2 == 3 && got(1L)._3 == 8)
    val f = 206.835 - 1.015 * (7.0 / 3.0) - 84.6 * (8.0 / 7.0)
    assert(math.abs(got(1L)._4.get - f) < 1e-12)
    assert(got(2L) == ((0, 1, 0, None)))
    assert(got(3L)._1 == 2 && got(3L)._3 == 0 && got(3L)._4.isDefined)
  }

  // --- Neyman allocation

  test("neymanAllocation: weights N_h*S_h, seats sum to the budget") {
    val rows =
      (1 to 10).map(i => ("hi", 10 * i)) ++ // n=10, spread
        (1 to 10).map(_ => ("lo", 7)) ++    // constant → weight 0
        (1 to 5).map(i => ("md", i))        // n=5, small spread
    val got = Sampling.neymanAllocation(
      rows.toDF("h", "v"), $"h", $"v", total = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def sd(vs: Seq[Double]): Double = {
      val m = vs.sum / vs.size
      math.sqrt(vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1))
    }
    val wHi = math.floor(10 * sd((1 to 10).map(i => 10.0 * i))).toLong
    val wMd = math.floor(5 * sd((1 to 5).map(_.toDouble))).toLong
    assert(got("hi")._2 == wHi && got("md")._2 == wMd && got("lo")._2 == 0L)
    assert(got.values.map(_._3).sum == 100L)
    assert(got("hi")._3 > got("md")._3)
  }

  // --- Fano factor

  test("fanoFactor equals direct dispersion over the dense grid") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    // key a: days 0,0,0,2 → dense counts [3,0,1] over 3 days
    val rows = Seq(("a", t(0)), ("a", t(0)), ("a", t(0)), ("a", t(2)))
    val r = TimeSeries.fanoFactor(
      rows.toDF("k", "ts"), $"k", $"ts", periodSeconds = 86400L)
      .collect()(0)
    val cs = Seq(3.0, 0.0, 1.0)
    val m = cs.sum / 3
    val v = cs.map(x => (x - m) * (x - m)).sum / 2
    assert(r.getLong(1) == 3L && r.getDouble(2) == m)
    assert(math.abs(r.getDouble(3) - v) < 1e-12 &&
      math.abs(r.getDouble(4) - v / m) < 1e-12)
  }

  // --- Brier decomposition

  test("property: brierDecomposition equals textbook REL/RES/UNC") {
    val genRows: Gen[List[(Int, Boolean)]] = Gen.chooseNum(2, 60).flatMap(n =>
      Gen.listOfN(n, for {
        s <- Gen.oneOf(0, 125000, 250000, 500000, 900000, 1000000)
        y <- Gen.oneOf(true, false)
      } yield (s, y)))
    check(Prop.forAll(genRows) { rows =>
      val r = ModelEval.brierDecomposition(
        rows.toDF("s", "y"), $"s", $"y", bins = 16).collect()(0)
      val byBin = rows.groupBy { case (s, _) =>
        math.min(15L, s.toLong * 16 / 1000000) }
      val n = rows.size.toDouble
      val obar = rows.count(_._2).toDouble / n
      val rel = byBin.values.map { rs =>
        val pbar = rs.map(_._1.toLong).sum.toDouble / (rs.size * 1e6)
        val ob = rs.count(_._2).toDouble / rs.size
        rs.size * (pbar - ob) * (pbar - ob)
      }.sum / n
      val res = byBin.values.map { rs =>
        val ob = rs.count(_._2).toDouble / rs.size
        rs.size * (ob - obar) * (ob - obar)
      }.sum / n
      val bu = rows.map { case (s, y) =>
        val d = s.toLong - (if (y) 1000000L else 0L); BigInt(d) * BigInt(d)
      }.sum
      r.getLong(0) == rows.size && r.getLong(1) == byBin.size &&
        BigInt(r.getString(2)) == bu &&
        math.abs(r.getDouble(3) - rel) < 1e-9 &&
        math.abs(r.getDouble(4) - res) < 1e-9 &&
        math.abs(r.getDouble(5) - obar * (1 - obar)) < 1e-12
    })
  }

  // --- standardized rates

  test("standardizedRates equals direct mix-weighted arithmetic") {
    val rows = Seq(
      ("a", 1L, true), ("a", 1L, false), ("a", 2L, true),
      ("b", 1L, false), ("b", 2L, true), ("b", 2L, false))
    val got = Experiment.standardizedRates(
      rows.toDF("g", "s", "y"), $"g", $"s", $"y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // mix: s=1 3/6, s=2 3/6
    val wa = 0.5 * (1.0 / 2.0) + 0.5 * 1.0
    val wb = 0.5 * 0.0 + 0.5 * (1.0 / 2.0)
    assert(got("a")._1 == 3L && got("a")._2 == 2L)
    assert(math.abs(got("a")._4 - wa) < 1e-12 && got("a")._5 == 1.0)
    assert(math.abs(got("b")._4 - wb) < 1e-12)
  }

  // --- Cochran's Q

  test("property: cochranQ equals the textbook statistic on complete blocks") {
    val genBlocks: Gen[(Int, List[List[Boolean]])] = for {
      k <- Gen.chooseNum(2, 4)
      b <- Gen.chooseNum(2, 12)
      bl <- Gen.listOfN(b, Gen.listOfN(k, Gen.oneOf(true, false)))
    } yield (k, bl)
    check(Prop.forAll(genBlocks) { case (k, blocks) =>
      val rows = blocks.zipWithIndex.flatMap { case (vs, bi) =>
        vs.zipWithIndex.map { case (y, t) => ("g", bi.toLong, t.toLong, y) }
      } ++ (1 until k).map(t => ("g", 999L, t.toLong, true)) // incomplete
      val r = Experiment.cochranQ(
        rows.toDF("k", "b", "t", "y"), $"k", $"b", $"t", $"y").collect()(0)
      val cj = (0 until k).map(t => blocks.count(_(t)).toLong)
      val ri = blocks.map(_.count(identity).toLong)
      val tt = cj.sum
      val num = (k - 1).toLong * (k * cj.map(c => c * c).sum - tt * tt)
      val den = k * tt - ri.map(x => x * x).sum
      r.getLong(1) == blocks.size && r.getLong(2) == k &&
        BigInt(r.getString(3)) == BigInt(num) &&
        BigInt(r.getString(4)) == BigInt(den) &&
        (if (den == 0) r.isNullAt(5)
         else math.abs(r.getDouble(5) - num.toDouble / den) < 1e-12)
    })
  }

  // --- Aalen–Johansen

  test("property: aalenJohansen equals the sequential CIF fold") {
    val genSubj: Gen[List[(Int, Int)]] = Gen.chooseNum(2, 40).flatMap(n =>
      Gen.listOfN(n, for {
        t <- Gen.chooseNum(0, 8); k <- Gen.oneOf(0, 1, 1, 2)
      } yield (t, k)))
    check(Prop.forAll(genSubj) { subj =>
      val got = Survival.aalenJohansen(
        subj.toDF("t", "k"), $"t", $"k")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
            r.getDouble(5), r.getDouble(6)))).toMap
      var n = subj.size.toLong
      var s = 1.0; var cif1 = 0.0; var cif2 = 0.0
      var ok = true
      for (t <- subj.map(_._1).distinct.sorted) {
        val at = subj.filter(_._1 == t)
        val d1 = at.count(_._2 == 1).toLong
        val d2 = at.count(_._2 == 2).toLong
        if (d1 + d2 > 0) {
          cif1 += s * d1.toDouble / n
          cif2 += s * d2.toDouble / n
          got.get(t.toLong) match {
            case Some((gn, g1, g2, gs, gc1, gc2)) =>
              ok &&= gn == n && g1 == d1 && g2 == d2 &&
                math.abs(gs - s) < 1e-12 &&
                math.abs(gc1 - cif1) < 1e-12 && math.abs(gc2 - cif2) < 1e-12
            case None => ok = false
          }
        }
        if (d1 + d2 < n) s *= 1.0 - (d1 + d2).toDouble / n
        else s = 0.0
        n -= at.size
      }
      ok && got.keySet == subj.filter(x => x._2 > 0).map(_._1.toLong).toSet
    })
  }

  // --- Mood's median test

  test("property: moodMedianTest equals brute contingency chi-square") {
    check(Prop.forAll(genKwRows) { rows =>
      val df = rows.map { case (g, v) => ("k", g, v) }.toDF("k", "g", "v")
      val r = RankStats.moodMedianTest(df, $"k", $"g", $"v").collect()(0)
      val vs = rows.map(_._2).sorted
      val med2 = vs((vs.size - 1) / 2) + vs(vs.size / 2)
      val byG = rows.groupBy(_._1)
      val cells = byG.view.mapValues { rs =>
        (rs.count(x => 2 * x._2 > med2).toLong,
          rs.count(x => 2 * x._2 <= med2).toLong)
      }.toMap
      val bigA = cells.values.map(_._1).sum
      val bigB = cells.values.map(_._2).sum
      val nTot = (bigA + bigB).toDouble
      val expectChi =
        if (bigA == 0 || bigB == 0) None
        else Some(cells.values.map { case (a, b) =>
          val ng = (a + b).toDouble
          val ea = ng * bigA / nTot; val eb = ng * bigB / nTot
          (a - ea) * (a - ea) / ea + (b - eb) * (b - eb) / eb
        }.sum)
      r.getLong(1) == rows.size && r.getLong(3) == bigA &&
        ((expectChi, if (r.isNullAt(4)) None else Some(r.getDouble(4))) match {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case (None, None)       => true
          case _                  => false
        })
    })
  }

  // --- ridge regression

  test("property: ridge2 coefficients satisfy the ridge normal equations") {
    val genRows: Gen[List[(Int, Int, Int)]] = Gen.chooseNum(3, 50).flatMap(n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0, 9); b <- Gen.chooseNum(-5, 5)
        y <- Gen.chooseNum(-50, 50)
      } yield (a, b, y)))
    check(Prop.forAll(genRows) { rows =>
      val lam = 4.0
      val r = Regression.ridge2(
        rows.map { case (a, b, y) => ("k", a, b, y) }.toDF("k", "a", "b", "y"),
        $"k", $"a", $"b", $"y", lambda = lam).collect()(0)
      val n = rows.size.toDouble
      val s1 = rows.map(_._1).sum.toDouble
      val s2 = rows.map(_._2).sum.toDouble
      val s11 = rows.map(r0 => r0._1.toDouble * r0._1).sum
      val s12 = rows.map(r0 => r0._1.toDouble * r0._2).sum
      val s22 = rows.map(r0 => r0._2.toDouble * r0._2).sum
      val sy = rows.map(_._3).sum.toDouble
      val s1y = rows.map(r0 => r0._1.toDouble * r0._3).sum
      val s2y = rows.map(r0 => r0._2.toDouble * r0._3).sum
      val (b0, b1, b2) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // A·b must reproduce the right-hand side (λ>0 ⇒ PD system)
      val res = Seq(
        n * b0 + s1 * b1 + s2 * b2 - sy,
        s1 * b0 + (s11 + lam) * b1 + s12 * b2 - s1y,
        s2 * b0 + s12 * b1 + (s22 + lam) * b2 - s2y)
      val scale = math.max(1.0, Seq(sy, s1y, s2y).map(_.abs).max)
      r.getLong(1) == rows.size && res.forall(x => x.abs < 1e-7 * scale)
    })
  }

  // --- covariate balance

  test("covariateBalance equals direct SMD arithmetic") {
    val rows = Seq(
      (false, 10L, 1L), (false, 12L, 3L), (false, 14L, 5L),
      (true, 20L, 2L), (true, 24L, 2L), (true, 28L, 4L))
    val got = Experiment.covariateBalance(
      rows.toDF("armb", "c1", "c2"), $"armb",
      Seq("c1" -> $"c1", "c2" -> $"c2"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    def smd(a: Seq[Double], b: Seq[Double]): Double = {
      def v(x: Seq[Double]) = {
        val m = x.sum / x.size
        x.map(e => (e - m) * (e - m)).sum / (x.size - 1)
      }
      (b.sum / b.size - a.sum / a.size) /
        math.sqrt((v(a) + v(b)) / 2.0)
    }
    val e1 = smd(Seq(10, 12, 14), Seq(20, 24, 28))
    val e2 = smd(Seq(1, 3, 5), Seq(2, 2, 4))
    assert(got("c1")._1 == 3L && got("c1")._2 == 3L)
    assert(math.abs(got("c1")._5 - e1) < 1e-12)
    assert(math.abs(got("c2")._5 - e2) < 1e-12)
    assert(got("c1")._3 == 12.0 && got("c1")._4 == 24.0)
  }

  // --- mean cumulative function

  test("meanCumulativeFunction equals the sequential risk-set fold") {
    // subjects: 1 enters d0, 2 enters d2, 3 never enters (ignored)
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val rows = Seq(
      (1L, t(0), "signup"), (1L, t(1), "purchase"), (1L, t(3), "purchase"),
      (2L, t(2), "signup"), (2L, t(1), "purchase"), // pre-entry: ignored
      (2L, t(3), "purchase"),
      (3L, t(0), "purchase")) // never entered: ignored
    val got = Survival.meanCumulativeFunction(
      rows.toDF("s", "ts", "et"), $"s", $"ts",
      $"et" === "signup", $"et" === "purchase")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // day1: risk {1}, 1 event → mcf 1.0; day3: risk {1,2}, 2 events →
    // mcf 1.0 + 2/2 = 2.0
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == ((1L, 1L, 1.0)))
    assert(got(3L) == ((2L, 2L, 2.0)))
  }

  // --- price index

  test("priceIndex equals direct Laspeyres/Paasche/Fisher arithmetic") {
    // item A: p0 = 10 (r0 200 / q0 20), p1 = 12 (r1 120 / q1 10)
    // item B: p0 = 4  (r0 40 / q0 10),  p1 = 2  (r1 20 / q1 10)
    // item C: base only → dropped
    val rows = Seq(
      ("g", 1L, true, 200L, 20L), ("g", 1L, false, 120L, 10L),
      ("g", 2L, true, 40L, 10L), ("g", 2L, false, 20L, 10L),
      ("g", 3L, true, 99L, 9L))
    val r = Finance.priceIndex(rows.toDF("g", "i", "b", "r", "q"),
      $"g", $"i", $"b", $"r", $"q").collect()(0)
    val lasp = (12.0 * 20 + 2.0 * 10) / (200.0 + 40.0)
    val paas = (120.0 + 20.0) / (10.0 * 10 + 4.0 * 10)
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - lasp) < 1e-12)
    assert(math.abs(r.getDouble(3) - paas) < 1e-12)
    assert(math.abs(r.getDouble(4) - math.sqrt(lasp * paas)) < 1e-12)
  }

  // --- confusion matrix

  test("confusionMatrix counts and row shares") {
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
    val got = ModelEval.confusionMatrix(rows.toDF("y", "p"), $"y", $"p")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("a", "a")) == ((2L, 3L, 2.0 / 3.0)))
    assert(got(("a", "b")) == ((1L, 3L, 1.0 / 3.0)))
    assert(got(("b", "b")) == ((1L, 1L, 1.0)))
  }

  // --- Croston

  test("property: croston equals the sequential reference fold") {
    val genSeries: Gen[List[Int]] = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(0, 0, 0, 1, 2, 7))) // mostly zeros
    check(Prop.forAll(genSeries) { series =>
      // one row per NONZERO period (zeros are the gapFill's job);
      // periods are daily so the dense grid equals the index range
      val nz = series.zipWithIndex.filter(_._1 > 0)
      nz.isEmpty || {
        val lo = nz.map(_._2).min
        val hi = nz.map(_._2).max
        val rows = nz.map { case (v, i) =>
          ("k", new java.sql.Timestamp(i.toLong * 86400L * 1000L), v)
        }
        val r = TimeSeries.croston(
          rows.toDF("k", "ts", "v"), $"k", $"ts", $"v",
          periodSeconds = 86400L, alpha = 0.25).collect()(0)
        // reference over the dense [lo, hi] slice
        var size = 0.0; var itv = 0.0; var since = 0.0; var seen = false
        for (i <- lo to hi) {
          val d = series(i).toDouble
          val s1 = since + 1.0
          if (d > 0) {
            if (!seen) { size = d; itv = s1; seen = true }
            else { size += 0.25 * (d - size); itv += 0.25 * (s1 - itv) }
            since = 0.0
          } else since = s1
        }
        r.getLong(1) == (hi - lo + 1).toLong &&
          r.getLong(2) == nz.size.toLong &&
          r.getDouble(3) == size && r.getDouble(4) == itv &&
          r.getDouble(5) == size / itv
      }
    })
  }

  // --- leave-one-out ablation

  test("leaveOneOutAblation equals direct removal arithmetic") {
    val rows = Seq(("a", 1L, 1L), ("a", 0L, 1L), ("b", 1L, 1L),
      ("b", 1L, 1L), ("c", 0L, 1L))
    val got = Profiling.leaveOneOutAblation(
      rows.toDF("g", "p", "q"), $"g", $"p", $"q")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("a") == ((1L, 2L, 3.0 / 5.0, 2.0 / 3.0, 3.0 / 5.0 - 2.0 / 3.0)))
    assert(got("b") == ((2L, 2L, 3.0 / 5.0, 1.0 / 3.0, 3.0 / 5.0 - 1.0 / 3.0)))
    assert(got("c")._4 == 3.0 / 4.0)
  }

  // --- disparate impact

  test("disparateImpact: exact four-fifths flag and deterministic reference") {
    // rates: a = 10/20 (ref), b = 8/20 = exactly 0.8·ref (NOT below),
    // c = 7/20 (below)
    val rows =
      (1 to 20).map(i => ("a", i <= 10)) ++
        (1 to 20).map(i => ("b", i <= 8)) ++
        (1 to 20).map(i => ("c", i <= 7))
    val got = Experiment.disparateImpact(rows.toDF("g", "y"), $"g", $"y")
      .collect().map(r => r.getString(0) ->
        ((r.getString(4), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got("a") == (("a", 1.0, false)))
    assert(got("b")._1 == "a" && math.abs(got("b")._2 - 0.8) < 1e-15 &&
      !got("b")._3, "boundary 0.8 must NOT flag (strict <, exact integers)")
    assert(got("c")._3)
  }

  // --- source overlap

  test("sourceOverlapFromHashed equals brute shingle-set algebra") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "s1"),
      (2L, "quick brown fox jumps high", "s1"),
      (3L, "the quick brown fox jumps", "s2"), // exact dup of doc 1
      (4L, "completely different text here now", "s2"),
      (5L, "the quick brown fox jumps high", "s3"))
    val df = docs.toDF("doc_id", "text", "source")
    def shingles(t: String): Set[Seq[String]] = {
      val tk = t.split(" ").toSeq
      if (tk.size >= 3) tk.sliding(3).toSet else Set(tk)
    }
    val bySrc = docs.groupBy(_._3).map { case (s, ds) =>
      s -> ds.flatMap(d => shingles(d._2)).toSet
    }
    val expect = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      inter = (bySrc(a) & bySrc(b)).size if inter > 0
    } yield (a, b) -> ((bySrc(a).size.toLong, bySrc(b).size.toLong,
      inter.toLong,
      inter.toDouble / (bySrc(a).size + bySrc(b).size - inter)))).toMap
    val got = Dedup.sourceOverlapFromHashed(
      Dedup.hashedShingleSets(df, $"text", $"doc_id", n = 3),
      df.select($"doc_id", $"source"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, (na, nb, inter, j)) =>
      val g = got(k)
      assert(g._1 == na && g._2 == nb && g._3 == inter &&
        math.abs(g._4 - j) < 1e-12, s"$k: got $g expected ($na,$nb,$inter,$j)")
    }
  }

  // --- Theil index

  test("property: theilIndex equals the textbook entropy index") {
    val genAmts: Gen[List[Int]] = Gen.chooseNum(1, 40)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(0, 0, 1, 3, 7, 100)))
    check(Prop.forAll(genAmts) { amts =>
      val r = Profiling.theilIndex(
        amts.map(("k", _)).toDF("k", "v"), $"k", $"v").collect()(0)
      val tot = amts.map(_.toLong).sum
      val okDigest = BigInt(r.getString(2)) == BigInt(tot)
      if (tot == 0L) okDigest && r.isNullAt(3)
      else {
        val mu = tot.toDouble / amts.size
        val et = amts.filter(_ > 0)
          .map(x => (x / mu) * math.log(x / mu)).sum / amts.size
        okDigest && math.abs(r.getDouble(3) - et) < 1e-9
      }
    })
  }
}

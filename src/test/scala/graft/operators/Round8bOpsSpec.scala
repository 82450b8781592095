package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Round-8 continuation operators vs brute-force references:
  * bounded-round SSSP ≡ full Bellman-Ford, largest-remainder
  * allocation invariants + reference, clamped-balance fold, the
  * Holt-Winters recurrence, zone-map skipping counts.
  */
class Round8bOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop, min: Int = 25): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // --- reference bounded Bellman-Ford on the symmetrized simple graph
  private def refSssp(
      edges: Seq[(Long, Long, Long)], source: Long, rounds: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((a, b), es) => (a, b, es.map(_._3).min) }
      .toSeq
    var dist = Map(source -> 0L)
    for (_ <- 1 to rounds) {
      val relaxed = sym.flatMap { case (a, b, w) => dist.get(a).map(da => b -> (da + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  private val genGraph: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 30)
    es <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0L, 9L)
      b <- Gen.chooseNum(0L, 9L)
      w <- Gen.chooseNum(0L, 20L)
    } yield (a, b, w))
  } yield es.filter(e => e._1 != e._2)

  test("property: ssspBoundedRounds equals reference Bellman-Ford per round cap") {
    check(Prop.forAll(genGraph, Gen.chooseNum(0, 5)) { (edges, rounds) =>
      edges.isEmpty || !edges.exists(e => e._1 == 0L || e._2 == 0L) || {
        val got = Graph.ssspBoundedRounds(
          edges.toDF("a", "b", "w"), $"a", $"b", $"w", source = 0L, rounds = rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == refSssp(edges, 0L, rounds)
      }
    })
  }

  test("ssspBoundedRounds: early convergence matches a larger round cap") {
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 1L), (0L, 2L, 9L), (2L, 3L, 2L))
    val a = Graph.ssspBoundedRounds(edges.toDF("a", "b", "w"), $"a", $"b", $"w", 0L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.ssspBoundedRounds(edges.toDF("a", "b", "w"), $"a", $"b", $"w", 0L, 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a(2L) == 6L && a(3L) == 8L)
    val neg = intercept[Exception](Graph.ssspBoundedRounds(
      Seq((0L, 1L, -1L)).toDF("a", "b", "w"), $"a", $"b", $"w", 0L, 2).collect())
    assert(neg.getMessage.contains("non-negative") ||
      Option(neg.getCause).exists(_.getMessage.contains("non-negative")))
  }

  // --- largest remainder
  private def refAlloc(ws: Seq[(String, Long)], total: Long): Map[String, Long] = {
    val gw = ws.map(_._2).sum
    val based = ws.map { case (i, w) => (i, total * w / gw, total * w % gw) }
    val r = total - based.map(_._2).sum
    val bump = based.sortBy(x => (-x._3, x._1)).take(r.toInt).map(_._1).toSet
    based.map { case (i, b, _) => i -> (b + (if (bump(i)) 1L else 0L)) }.toMap
  }

  private val genWeights: Gen[List[(String, Long)]] = for {
    n <- Gen.chooseNum(1, 12)
    ws <- Gen.listOfN(n, Gen.chooseNum(0L, 500L))
  } yield ws.zipWithIndex.map { case (w, i) => (f"i$i%02d", w) }

  test("property: largestRemainder sums to total and matches the reference") {
    check(Prop.forAll(genWeights, Gen.chooseNum(0L, 300L)) { (ws, total) =>
      ws.map(_._2).sum == 0L || {
        val got = Allocation.largestRemainder(
          ws.toDF("i", "w").select(lit("g").as("g"), $"i", $"w"),
          $"g", $"i", $"w", total)
          .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
        got.values.sum == total && got == refAlloc(ws, total)
      }
    })
  }

  test("largestRemainder: zero group weight raises; two groups stay independent") {
    val e = intercept[Exception](Allocation.largestRemainder(
      Seq(("g", "a", 0L)).toDF("g", "i", "w"), $"g", $"i", $"w", 10L).collect())
    assert(e.getMessage.contains("zero total weight") ||
      Option(e.getCause).exists(_.getMessage.contains("zero total weight")))
    val two = Allocation.largestRemainder(
      Seq(("g1", "a", 1L), ("g1", "b", 1L), ("g1", "b", 1L), ("g2", "a", 7L))
        .toDF("g", "i", "w"), $"g", $"i", $"w", 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(two(("g1", "a")) + two(("g1", "b")) == 5L && two(("g2", "a")) == 5L)
    // detail rows summed: g1/b arrived twice at weight 1 ⇒ weight 2 of 3
    assert(two(("g1", "b")) > two(("g1", "a")))
  }

  // --- clamped running balance
  private def refBalance(evs: Seq[(Int, Long, Long)]): (Long, Long) =
    evs.sortBy(e => (e._1, e._2)).foldLeft((0L, 0L)) { case ((b, c), (_, _, d)) =>
      if (b + d < 0) (0L, c + 1) else (b + d, c)
    }

  private val genLedger: Gen[List[(Int, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 50)
    evs <- Gen.listOfN(n, for {
      t <- Gen.chooseNum(1, 20)
      d <- Gen.chooseNum(-50L, 50L)
    } yield (t, d))
  } yield evs.zipWithIndex.map { case ((t, d), i) => (t, i.toLong, d) }

  test("property: clampedRunningSum equals the reference fold") {
    check(Prop.forAll(genLedger) { evs =>
      val row = Ledger.clampedRunningSum(
        evs.map { case (t, tb, d) =>
          ("k", new java.sql.Timestamp(t * 1000L), tb, d)
        }.toDF("k", "ts", "tb", "d"),
        $"k", $"ts", $"tb", $"d").collect()(0)
      (row.getLong(2), row.getLong(3)) == refBalance(evs) &&
        row.getLong(1) == evs.size.toLong
    })
  }

  // --- Holt-Winters reference fold
  private def refHw(xs: Seq[Double], m: Int, a: Double, b: Double, g: Double)
      : (Double, Double, Double) = {
    var acc = Array(xs.head, 0.0) ++ Array.fill(m)(0.0)
    for (x <- xs.tail) {
      val (l, t, c) = (acc(0), acc(1), acc(2))
      val nl = a * (x - c) + (1 - a) * (l + t)
      val nt = b * (nl - l) + (1 - b) * t
      val nc = g * (x - nl) + (1 - g) * c
      acc = Array(nl, nt) ++ acc.drop(3) ++ Array(nc)
    }
    (acc(0), acc(1), acc(2))
  }

  test("holtWinters matches the reference rotation fold on a dense series") {
    val days = (0 until 23).map(i => (1L, new java.sql.Timestamp(i * 86400000L),
      (i % 7) * 10.0 + i))
    val got = TimeSeries.holtWinters(
      days.toDF("k", "ts", "v"), $"k", $"ts", $"v", 86400L, m = 7).collect()(0)
    val (l, t, c) = refHw(days.map(_._3), 7, 0.25, 0.125, 0.25)
    assert(got.getLong(1) == 23L)
    assert(math.abs(got.getDouble(3) - l) < 1e-9)
    assert(math.abs(got.getDouble(4) - t) < 1e-9)
    assert(math.abs(got.getDouble(5) - c) < 1e-9)
    assert(math.abs(got.getDouble(6) - (l + t + c)) < 1e-9)
  }

  test("holtWinters zero-fills gaps so the seasonal register stays aligned") {
    // identical to a dense series whose missing days are explicit zeros
    val present = Seq(0, 1, 3, 6, 8, 13, 20)
    val sparse = present.map(i =>
      (1L, new java.sql.Timestamp(i * 86400000L), 5.0 + i))
    val dense = (0 to 20).map(i =>
      (1L, new java.sql.Timestamp(i * 86400000L),
        if (present.contains(i)) 5.0 + i else 0.0))
    val a = TimeSeries.holtWinters(sparse.toDF("k", "ts", "v"),
      $"k", $"ts", $"v", 86400L, m = 7).collect()(0)
    val b = TimeSeries.holtWinters(dense.toDF("k", "ts", "v"),
      $"k", $"ts", $"v", 86400L, m = 7).collect()(0)
    assert(a.getLong(1) == 21L && b.getLong(1) == 21L)
    assert(a.getDouble(6) == b.getDouble(6))
  }

  // --- time-series diagnostics
  private def refAcf(xs: Seq[Double], k: Int): Option[Double] = {
    val n = xs.size
    val xb = xs.sum / n
    val den = xs.map(x => (x - xb) * (x - xb)).sum
    if (den <= 0 || n <= k) None
    else Some((0 until n - k).map(i => (xs(i) - xb) * (xs(i + k) - xb)).sum / den)
  }

  test("autocorrelation matches the reference formula; degenerate cases null") {
    val xs = Seq(3.0, 7.0, 1.0, 9.0, 2.0, 8.0, 4.0, 6.0, 5.0, 10.0)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      (1L, new java.sql.Timestamp(i * 86400000L), v)
    }
    val got = TimeSeries.autocorrelation(rows.toDF("k", "ts", "v"),
      $"k", $"ts", $"v", 86400L, lags = Seq(1, 2, 12))
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    for (l <- Seq(1, 2)) {
      assert(got(l)._1 == (10 - l).toLong)
      assert(math.abs(got(l)._2.get - refAcf(xs, l).get) < 1e-9)
    }
    assert(got(12) == ((0L, None))) // lag beyond the series
    val const = (0 until 5).map(i => (1L, new java.sql.Timestamp(i * 86400000L), 4.0))
    val c = TimeSeries.autocorrelation(const.toDF("k", "ts", "v"),
      $"k", $"ts", $"v", 86400L, lags = Seq(1)).collect()(0)
    assert(c.isNullAt(3)) // zero variance
  }

  private def refMk(xs: Seq[Double]): (Long, Option[Double]) = {
    val n = xs.size
    val s = (for (i <- xs.indices; j <- i + 1 until n)
      yield math.signum(xs(j) - xs(i)).toLong).sum
    val ties = xs.groupBy(identity).values
      .map(t => t.size.toLong * (t.size - 1) * (2 * t.size + 5)).sum
    val varS = (n.toLong * (n - 1) * (2 * n + 5) - ties).toDouble / 18.0
    val z = if (n < 2 || varS <= 0) None
    else Some(
      if (s > 0) (s - 1.0) / math.sqrt(varS)
      else if (s < 0) (s + 1.0) / math.sqrt(varS) else 0.0)
    (s, z)
  }

  test("property: mannKendall matches brute-force S and z") {
    val genSeries = for {
      n <- Gen.chooseNum(1, 15)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 5))
    } yield xs.map(_.toDouble)
    check(Prop.forAll(genSeries) { xs =>
      val rows = xs.zipWithIndex.map { case (v, i) =>
        (1L, new java.sql.Timestamp(i * 86400000L), v)
      }
      val r = TimeSeries.mannKendall(rows.toDF("k", "ts", "v"),
        $"k", $"ts", $"v", 86400L).collect()(0)
      val (es, ez) = refMk(xs)
      r.getLong(1) == xs.size.toLong && r.getLong(2) == es &&
        ((r.isNullAt(3) && ez.isEmpty) ||
          ez.exists(z => math.abs(r.getDouble(3) - z) < 1e-9))
    })
  }

  private def refRuns(xs: Seq[Double]): (Long, Long, Option[Double]) = {
    val n = xs.size
    // division-free like the operator: exact for quarter-valued series
    val above = xs.map(x => x * n >= xs.sum)
    val n1 = above.count(identity).toLong
    val n0 = n - n1
    val runs = 1L + above.sliding(2).count(w => w.size == 2 && w(0) != w(1))
    val two = 2.0 * n1 * n0
    val varR = two * (two - n) / (n.toDouble * n * (n - 1))
    val z = if (n1 == 0 || n0 == 0 || n < 2 || varR <= 0) None
    else Some((runs - (two / n + 1.0)) / math.sqrt(varR))
    (n1, runs, z)
  }

  test("property: runsTest matches brute force (mean from exact integer halves)") {
    // quarter-valued series: the n·x ≥ Σx comparison is exact, and the
    // reference mean is exact in doubles too, so the indicators agree
    val genSeries = for {
      n <- Gen.chooseNum(1, 16)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 12))
    } yield xs.map(_ * 0.25)
    check(Prop.forAll(genSeries) { xs =>
      val rows = xs.zipWithIndex.map { case (v, i) =>
        (1L, new java.sql.Timestamp(i * 86400000L), v)
      }
      val r = TimeSeries.runsTest(rows.toDF("k", "ts", "v"),
        $"k", $"ts", $"v", 86400L).collect()(0)
      val (en1, eruns, ez) = refRuns(xs)
      r.getLong(1) == xs.size.toLong && r.getLong(2) == en1 && r.getLong(3) == eruns &&
        ((r.isNullAt(4) && ez.isEmpty) ||
          ez.exists(z => math.abs(r.getDouble(4) - z) < 1e-9))
    })
  }

  // --- interpolated quantiles (type-7 / quantile_cont)
  test("property: selectQuantilesInterpolated equals the sorted-list type-7 formula") {
    val genXs = for {
      n <- Gen.chooseNum(1, 80)
      xs <- Gen.listOfN(n, Gen.chooseNum(-100, 100))
    } yield xs.map(_ * 0.5)
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    check(Prop.forAll(genXs) { xs =>
      val got = ExactQuantile.selectQuantilesInterpolated(
        xs.toDF("v"), $"v", qs, bins = 8, levels = 2)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sorted = xs.sorted
      qs.forall { q =>
        val h = (xs.size - 1).toDouble * q
        val lo = sorted(math.floor(h).toInt)
        val hi = sorted(math.min(math.floor(h).toInt + 1, xs.size - 1))
        got(q) == lo + (h - math.floor(h)) * (hi - lo)
      }
    }, min = 20)
  }

  test("property: grouped interpolatedQuantiles equals the per-group type-7 formula") {
    val genXs = for {
      n <- Gen.chooseNum(1, 40)
      xs <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        v <- Gen.chooseNum(0, 10)
      } yield (g, v * 0.5))
    } yield xs
    val qs = Seq((0, 1), (1, 4), (1, 2), (9, 10), (1, 1))
    check(Prop.forAll(genXs) { xs =>
      val got = WeightedQuantile.interpolatedQuantiles(
        xs.toDF("g", "v"), $"g", $"v", qs)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getDouble(4))
        .toMap
      xs.groupBy(_._1).forall { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        qs.forall { case (num, den) =>
          val n = sorted.size
          val h = (n - 1).toLong * num
          val kLo = (h / den).toInt
          val frac = (h % den).toDouble / den
          val lo = sorted(kLo)
          val hi = sorted(math.min(kLo + 1, n - 1))
          got((g, num, den)) == lo + frac * (hi - lo)
        }
      }
    }, min = 25)
  }

  // --- correlation matrix
  test("correlationMatrix matches per-pair groupedCorr; constant column is null") {
    val rows = (0 until 200).map { i =>
      (i.toDouble, (i * 3 % 17).toDouble, ((i * i) % 23).toDouble, 5.0)
    }
    val df = rows.toDF("a", "b", "c", "k")
    val got = Profiling.correlationMatrix(df,
      Seq("a" -> $"a", "b" -> $"b", "c" -> $"c", "k" -> $"k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got.size == 6)
    for ((x, y) <- Seq(("a", "b"), ("a", "c"), ("b", "c"))) {
      val single = Profiling.groupedCorr(
        df.select(lit("g").as("g"), col(x), col(y)), $"g", col(x), col(y))
        .collect()(0)
      val (n, corr) = got((x, y))
      assert(n == 200L && n == single.getLong(1))
      assert(corr.contains(single.getDouble(2)), s"pair ($x, $y)")
    }
    // zero-variance column: every pair with k is null
    for (x <- Seq("a", "b", "c")) assert(got((x, "k"))._2.isEmpty)
  }

  // --- position-based attribution
  private def refPosition(evs: Seq[(Long, Int, Long, String)])
      : Map[String, (Long, Long)] = {
    // per user in (ts, id) order: split into journeys ending at each
    // conversion ("C"); U-shaped integer millicredits
    val perTouch = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
      var pending = Vector.empty[(String, Long)]
      for (r <- sorted) {
        if (r._4 == "C") {
          val m = pending.size
          pending.zipWithIndex.foreach { case ((et, _), i0) =>
            val pos = i0 + 1
            val credit =
              if (m == 1) 1000L
              else if (m == 2) 500L
              else if (pos == 1 || pos == m) 400L
              else 200L / (m - 2) + (if (pos - 1 <= 200 % (m - 2)) 1L else 0L)
            out += ((et, credit, r._3))
          }
          pending = Vector.empty
        } else pending :+= ((r._4, r._3))
      }
      out
    }
    perTouch.groupBy(_._1).map { case (et, xs) =>
      et -> ((xs.size.toLong, xs.map(_._2).sum))
    }
  }

  test("property: positionCredit matches the journey reference; credits sum to 1000 per journey") {
    val genEvents = for {
      n <- Gen.chooseNum(1, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 4L)
        t <- Gen.chooseNum(1, 30)
        et <- Gen.oneOf("a", "b", "c", "C")
      } yield (u, t, et))
    } yield evs.zipWithIndex.map { case ((u, t, et), i) => (u, t, i.toLong, et) }
    check(Prop.forAll(genEvents) { evs =>
      val got = Attribution.positionCredit(
        evs.map { case (u, t, id, et) =>
          (u, new java.sql.Timestamp(t * 1000L), id, et)
        }.toDF("u", "ts", "id", "et"),
        $"u", $"ts", $"id", $"et", $"et" === "C")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      val expect = refPosition(evs)
      got == expect && {
        val totalCredit = got.values.map(_._2).sum
        totalCredit % 1000 == 0
      }
    })
  }

  // --- negative funnel
  private def refNegFunnel(evs: Seq[(Long, Int, Long, String)], windowSec: Long)
      : Map[Long, (Long, Long)] =
    evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var lastA: Option[(Int, Long)] = None
      var lastC: Option[(Int, Long)] = None
      var hit: Option[(Long, Long)] = None
      for (r <- sorted if hit.isEmpty) {
        r._4 match {
          case "A" => lastA = Some((r._2, r._3))
          case "C" => lastC = Some((r._2, r._3))
          case "B" =>
            lastA.foreach { a =>
              val blocked = lastC.exists(c =>
                (c._1 > a._1) || (c._1 == a._1 && c._2 > a._2))
              if (!blocked && (r._2 - a._1).toLong <= windowSec)
                hit = Some((a._2, r._3))
            }
          case _ =>
        }
      }
      hit.map(u -> _)
    }

  test("property: negativeFunnel matches the sequential reference") {
    val genEvents = for {
      n <- Gen.chooseNum(1, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 4L)
        t <- Gen.chooseNum(1, 40)
        et <- Gen.oneOf("A", "B", "C")
      } yield (u, t, et))
    } yield evs.zipWithIndex.map { case ((u, t, et), i) => (u, t, i.toLong, et) }
    check(Prop.forAll(genEvents, Gen.oneOf(5L, 15L, 100L)) { (evs, win) =>
      val got = Funnel.negativeFunnel(
        evs.map { case (u, t, id, et) =>
          (u, new java.sql.Timestamp(t * 1000L), id, et)
        }.toDF("u", "ts", "id", "et"),
        $"u", $"ts", $"id", $"et", "A", "B", "C", windowUs = win * 1000000L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
      got == refNegFunnel(evs, win)
    })
  }

  // --- isotonic (minimax ≡ sequential PAVA)
  test("property: isotonicBins is monotone and equals sequential PAVA") {
    // direct PAVA over cells, tracking cell counts per block
    def pavaCells(cells: Seq[(Long, Long)]): Seq[Double] = {
      case class B(cells: Int, n: Long, pos: Long) { def r: Double = pos.toDouble / n }
      var st = Vector.empty[B]
      for ((n, pos) <- cells) {
        var b = B(1, n, pos)
        while (st.nonEmpty && st.last.r >= b.r) {
          val p = st.last; st = st.init; b = B(p.cells + b.cells, p.n + b.n, p.pos + b.pos)
        }
        st :+= b
      }
      st.flatMap(b => Seq.fill(b.cells)(b.r))
    }
    val genCells = for {
      n <- Gen.chooseNum(1, 12)
      cs <- Gen.listOfN(n, for {
        w <- Gen.chooseNum(1L, 20L)
        p <- Gen.chooseNum(0L, 20L)
      } yield (w, math.min(p, w)))
    } yield cs
    check(Prop.forAll(genCells) { cells =>
      // feed rows that bin exactly into cell index i: score = i + 0.5
      // over [0, n) with bins = n... simpler: call the minimax on a
      // hand-built frame via score = bin index with bins = cells.size
      val rows = cells.zipWithIndex.flatMap { case ((w, p), i) =>
        (0L until w).map(r => (i.toDouble, if (r < p) 1 else 0))
      }
      cells.size < 2 || {
        val got = ModelEval.isotonicBins(rows.toDF("s", "y"), $"s", $"y",
          bins = cells.size)
          .collect().sortBy(_.getInt(0)).map(_.getDouble(4)).toSeq
        val expect = pavaCells(cells)
        got.size == expect.size &&
          got.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-12 } &&
          got.sliding(2).forall(w => w.size < 2 || w(0) <= w(1))
      }
    })
  }

  test("isotonicBins: no rows vanish when the score range overflows a double") {
    // hi - lo is +Infinity here; the naive span formula produced NULL
    // bins whose cells silently dropped out of the minimax joins
    val rows = Seq((-1.7e308, 0), (-1.0, 0), (1.0, 1), (1.7e308, 1))
    val got = ModelEval.isotonicBins(rows.toDF("s", "y"), $"s", $"y", bins = 16)
      .collect().sortBy(_.getInt(0))
    assert(got.map(_.getLong(1)).sum == 4) // every row still binned
    val iso = got.map(_.getDouble(4)).toSeq
    assert(iso.sliding(2).forall(w => w.size < 2 || w(0) <= w(1)))
  }

  // --- seasonal index (STL-lite)
  test("seasonalIndex matches the centered-MA + weekday-mean reference") {
    val xs = (0 until 28).map(i => (i % 7) * 4.0 + i * 0.5) // seasonality + trend
    val rows = xs.zipWithIndex.map { case (v, i) =>
      (1L, new java.sql.Timestamp(i * 86400000L), v)
    }
    val got = TimeSeries.seasonalIndex(rows.toDF("k", "ts", "v"),
      $"k", $"ts", $"v", 86400L, halfWindow = 3)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // reference: full-window rows are t in [3, 24]; weekday = t mod 7
    // (epoch day 0 here IS grid position 0)
    val ref = (3 to 24).map { t =>
      val ma = (t - 3 to t + 3).map(xs).sum / 7.0
      (t % 7, xs(t) - ma)
    }.groupBy(_._1).map { case (w, ds) =>
      w.toLong -> ((ds.size.toLong, ds.map(_._2).sum / ds.size))
    }
    assert(got.keySet == ref.keySet)
    for ((w, (n, sVal)) <- got) {
      assert(n == ref(w)._1)
      assert(math.abs(sVal - ref(w)._2) < 1e-9, s"weekday $w")
    }
  }

  // --- Qn robust scale
  test("property: qnScale equals the sorted pairwise-difference selection") {
    val genXs = for {
      n <- Gen.chooseNum(1, 16)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 20))
    } yield xs.map(_ * 0.25)
    check(Prop.forAll(genXs) { xs =>
      val rows = xs.zipWithIndex.map { case (v, i) =>
        (1L, new java.sql.Timestamp(i * 86400000L), v)
      }
      val r = TimeSeries.qnScale(rows.toDF("k", "ts", "v"),
        $"k", $"ts", $"v", 86400L).collect()(0)
      val n = xs.size
      val h = n / 2 + 1
      val rank = h.toLong * (h - 1) / 2
      if (n < 2 || rank == 0) r.isNullAt(2)
      else {
        val diffs = (for (i <- xs.indices; j <- i + 1 until n)
          yield math.abs(xs(j) - xs(i))).sorted
        r.getLong(1) == n.toLong && r.getDouble(2) == diffs((rank - 1).toInt)
      }
    }, min = 40)
  }

  // --- binary segmentation
  test("property: binarySegmentation equals the brute-force integer-evidence recursion") {
    def bestSplit(xs: Seq[Long], start: Int): Option[(Int, BigInt)] = {
      val n = xs.size
      if (n < 2) None
      else {
        val total = xs.map(BigInt(_)).sum
        val cands = (1 until n).map { p =>
          val c = xs.take(p).map(BigInt(_)).sum
          (p, (BigInt(n) * c - BigInt(p) * total).abs)
        }
        val best = cands.maxBy(c => (c._2, -c._1))
        Some((start + best._1 - 1, best._2)) // global 1-based position
      }
    }
    val genXs = for {
      n <- Gen.chooseNum(2, 20)
      xs <- Gen.listOfN(n, Gen.chooseNum(0L, 8L))
    } yield xs
    check(Prop.forAll(genXs) { xs =>
      val rows = xs.zipWithIndex.map { case (v, i) =>
        (1L, new java.sql.Timestamp(i * 86400000L), v.toDouble)
      }
      val got = TimeSeries.binarySegmentation(rows.toDF("k", "ts", "v"),
        $"k", $"ts", $"v", 86400L)
        .collect().map(r => (r.getInt(1), r.getLong(2)) ->
          ((r.getLong(4), r.getDouble(5)))).toMap
      val micro = xs.map(_ * 1000000L)
      val n = xs.size
      val Some((s1, e1)) = bestSplit(micro, 1)
      val okL1 = got((1, 1L)) == ((s1.toLong, e1.toDouble))
      val left = bestSplit(micro.take(s1), 1)
      val right = bestSplit(micro.drop(s1), s1 + 1)
      val okL2 =
        left.forall { case (s, e) => got.get((2, 1L)).contains((s.toLong, e.toDouble)) } &&
        (left.nonEmpty || !got.contains((2, 1L))) &&
        right.forall { case (s, e) =>
          got.get((2, s1.toLong + 1L)).contains((s.toLong, e.toDouble)) } &&
        (right.nonEmpty || !got.contains((2, s1.toLong + 1L)))
      okL1 && okL2
    }, min = 40)
  }

  // --- Nelson-Aalen
  test("property: nelsonAalen equals the hand fold; hazard ≥ -ln(KM survival) ordering holds") {
    val genSubjects = for {
      n <- Gen.chooseNum(1, 40)
      subj <- Gen.listOfN(n, for {
        t <- Gen.chooseNum(0L, 8L)
        ev <- Gen.oneOf(true, false)
      } yield (t, ev))
    } yield subj
    check(Prop.forAll(genSubjects) { subj =>
      val got = Survival.nelsonAalen(subj.toDF("dur", "ev"), $"dur", $"ev")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
      val byT = subj.groupBy(_._1).toSeq.sortBy(_._1)
      var atRisk = subj.size.toLong
      var h = 0.0
      var v = 0.0
      byT.forall { case (t, rs) =>
        val d = rs.count(_._2).toLong
        if (d > 0) { h += d.toDouble / atRisk; v += d.toDouble / (atRisk.toDouble * atRisk) }
        val ok = got(t) == ((atRisk, d, h, v))
        atRisk -= rs.size
        ok
      }
    })
  }

  // --- Kendall tau-b
  test("property: kendallTauDaily equals brute-force concordance counting") {
    // one event per (key, day) with value v and multiplicity m ⇒ the
    // daily series is x = m (via m rows), y = m·v
    val genDays = for {
      n <- Gen.chooseNum(1, 12)
      days <- Gen.listOfN(n, for {
        m <- Gen.chooseNum(1, 3)
        v <- Gen.chooseNum(0, 5)
      } yield (m, v * 0.5))
    } yield days
    check(Prop.forAll(genDays) { days =>
      val rows = days.zipWithIndex.flatMap { case ((m, v), i) =>
        (0 until m).map(_ => (1L, new java.sql.Timestamp(i * 86400000L), v))
      }
      val r = TimeSeries.kendallTauDaily(rows.toDF("k", "ts", "v"),
        $"k", $"ts", $"v", 86400L).collect()(0)
      val series = days.map { case (m, v) => (m.toLong, m * v) }
      val n = series.size
      val prs = for (i <- series.indices; j <- i + 1 until n) yield {
        val cx = java.lang.Long.signum(series(j)._1 - series(i)._1).toLong
        val cy = math.signum(series(j)._2 - series(i)._2).toLong
        (cx, cy)
      }
      val conc = prs.count(p => p._1 * p._2 > 0).toLong
      val disc = prs.count(p => p._1 * p._2 < 0).toLong
      val tx = prs.count(_._1 == 0).toLong
      val ty = prs.count(_._2 == 0).toLong
      val n0 = n.toLong * (n - 1) / 2
      val d1 = (n0 - tx).toDouble
      val d2 = (n0 - ty).toDouble
      r.getLong(1) == n.toLong && r.getLong(2) == conc && r.getLong(3) == disc &&
        (if (d1 > 0 && d2 > 0)
           math.abs(r.getDouble(4) - (conc - disc).toDouble / math.sqrt(d1 * d2)) < 1e-12
         else r.isNullAt(4))
    }, min = 40)
  }

  // --- cohort LTV
  test("cohortLtv: cumulative per cohort-age equals brute force") {
    def t(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // period = 10 days; users 1,2 cohort period 0; user 3 cohort 1
    val evs = Seq(
      (1L, t(1), 10.0), (1L, t(12), 5.0), (1L, t(25), 2.0),
      (2L, t(3), 1.0), (2L, t(27), 4.0),
      (3L, t(11), 7.0))
    val got = Funnel.cohortLtv(evs.toDF("u", "ts", "v"),
      $"u", $"ts", $"v", periodSeconds = 10L * 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got((0L, 0L)) == ((2L, 11.0, 5.5)))  // day1+day3
    assert(got((0L, 1L)) == ((2L, 16.0, 8.0)))  // + day12
    assert(got((0L, 2L)) == ((2L, 22.0, 11.0))) // + day25+day27
    assert(got((1L, 0L)) == ((1L, 7.0, 7.0)))   // user 3's own cohort
    assert(got.size == 4)
  }

  // --- FIFO lot matching
  private def refFifoQueue(buys: Seq[(Int, Long, Long)], soldTotal: Long)
      : (Long, Long, Long, Long) = {
    // true sequential queue consumption over buy lots in time order
    var remainingSell = soldTotal
    var matched = 0L; var cogs = 0L; var remQ = 0L; var remC = 0L
    for ((_, q, c) <- buys.sortBy(_._1)) {
      val take = math.min(q, math.max(0L, remainingSell))
      remainingSell -= take
      matched += take; cogs += take * c
      remQ += q - take; remC += (q - take) * c
    }
    (matched, cogs, remQ, remC)
  }

  test("property: Fifo.matchLots equals the sequential queue fold") {
    val genLedger = for {
      nb <- Gen.chooseNum(0, 15)
      buys <- Gen.listOfN(nb, for {
        t <- Gen.chooseNum(1, 30)
        q <- Gen.chooseNum(0L, 20L)
        c <- Gen.chooseNum(1L, 9L)
      } yield (t, q, c))
      sold <- Gen.chooseNum(0L, 200L)
    } yield (buys.zipWithIndex.map { case ((t, q, c), i) => (t, q, c, i.toLong) }, sold)
    check(Prop.forAll(genLedger) { case (buys, sold) =>
      val bdf = buys.map { case (t, q, c, tb) =>
        ("k", new java.sql.Timestamp(t * 1000L), tb, q, c)
      }.toDF("k", "ts", "tb", "q", "c")
      val sdf = Seq(("k", sold)).toDF("k", "q")
      val row = Fifo.matchLots(bdf, sdf, $"k", $"ts", $"tb", $"q", $"c", $"k", $"q")
        .collect()(0)
      val (m, cg, rq, rc) = refFifoQueue(buys.map(b => (b._1, b._2, b._3)), sold)
      val bought = buys.map(_._2).sum
      row.getLong(1) == bought && row.getLong(2) == sold &&
        row.getLong(3) == m && row.getDecimal(4).longValueExact == cg &&
        row.getLong(5) == rq && row.getDecimal(6).longValueExact == rc &&
        row.getLong(7) == math.max(0L, sold - bought)
    })
  }

  test("Fifo.matchLots surfaces sell-only keys as pure overshoot") {
    val bdf = Seq(("a", new java.sql.Timestamp(1000L), 1L, 5L, 2L))
      .toDF("k", "ts", "tb", "q", "c")
    val sdf = Seq(("a", 3L), ("ghost", 7L)).toDF("k", "q")
    val got = Fifo.matchLots(bdf, sdf, $"k", $"ts", $"tb", $"q", $"c", $"k", $"q")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDecimal(4).longValueExact == 6L) // 3 matched × cost 2
    assert(got("ghost").getLong(1) == 0L && got("ghost").getLong(7) == 7L)
  }

  test("Fifo.matchLots money survives int64-overflowing qty × cost products") {
    // two lots whose matched × unitCost each exceed Long.MaxValue —
    // the raw long product would wrap silently in non-ANSI mode
    val q = 4000000000L // 4e9 units
    val c = 3000000000L // 3e9 cost units
    val bdf = Seq(
      ("k", new java.sql.Timestamp(1000L), 1L, q, c),
      ("k", new java.sql.Timestamp(2000L), 2L, q, c)).toDF("k", "ts", "tb", "q", "c")
    val sdf = Seq(("k", q + 1L)).toDF("k", "q") // lot 1 full, lot 2 one unit
    val row = Fifo.matchLots(bdf, sdf, $"k", $"ts", $"tb", $"q", $"c", $"k", $"q")
      .collect()(0)
    val big = java.math.BigInteger.valueOf(q).multiply(java.math.BigInteger.valueOf(c))
    val cogs = big.add(java.math.BigInteger.valueOf(c)) // full lot + 1 unit
    val remaining = big.subtract(java.math.BigInteger.valueOf(c))
    assert(row.getDecimal(4).toBigInteger == cogs)
    assert(row.getDecimal(6).toBigInteger == remaining)
  }

  // --- time-decay touch mass
  test("decayedTouchMass: exact dyadic weights, floor at maxAge, shares sum to 1") {
    def t(day: Int) = new java.sql.Timestamp(day * 86400000L)
    val evs = Seq(
      (1L, t(0), 1L, "a"), (1L, t(2), 2L, "b"), (1L, t(3), 3L, "C"), // ages 3, 1
      (2L, t(0), 4L, "a"), (2L, t(50), 5L, "C"), // age 50 → floored at 40
      (3L, t(0), 6L, "b")) // open journey: drops
    val got = Attribution.decayedTouchMass(
      evs.toDF("u", "ts", "id", "et"), $"u", $"ts", $"id", $"et", $"et" === "C",
      maxAgeDays = 40)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("a")._2 == (1L << 37) + 1L) // age 3 → 2^37; age 50 → floor 2^0
    assert(got("b")._2 == (1L << 39)) // age 1 → 2^39
    assert(got.size == 2 && math.abs(got.values.map(_._3).sum - 1.0) < 1e-12)
  }

  // --- exact stratified take
  test("property: exactStratifiedTake = largest-remainder seats filled in (hash, id) order") {
    val genRows = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        s <- Gen.alphaStr.map(_.take(6))
      } yield (g, s))
    } yield rows.zipWithIndex.map { case ((g, s), i) => (g, s + i, i.toLong) }
    check(Prop.forAll(genRows, Gen.chooseNum(0, 40)) { (rows, totalRaw) =>
      val total = math.min(totalRaw.toLong, rows.size.toLong)
      val df = rows.toDF("g", "txt", "rid")
      val got = Sampling.exactStratifiedTake(df, $"g", $"txt", $"rid", total)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // reference: hash via the engine itself (the md5-based hash60
      // matters only for portability, not for this equivalence)
      val hashed = df.select($"g", KmvSketch.hash60($"txt").cast("double").as("h"),
        $"rid").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      val byG = hashed.groupBy(_._1)
      val ns = byG.view.mapValues(_.size.toLong).toMap
      val nn = rows.size.toLong
      val seats: Map[String, Long] = if (total == 0) ns.map { case (g, _) => g -> 0L }
      else {
        val based = ns.toSeq.map { case (g, n) => (g, total * n / nn, total * n % nn) }
        val r = total - based.map(_._2).sum
        val bump = based.sortBy(x => (-x._3, x._1)).take(r.toInt).map(_._1).toSet
        based.map { case (g, b, _) => g -> (b + (if (bump(g)) 1L else 0L)) }.toMap
      }
      val expect = byG.toSeq.flatMap { case (g, xs) =>
        xs.toSeq.sortBy(x => (x._2, x._3)).take(seats(g).toInt).map(x => (g, x._3))
      }.toSet
      got == expect && got.size.toLong == total
    }, min = 25)
  }

  test("exactStratifiedTake: total beyond the row count raises") {
    val df = Seq(("a", "x", 1L), ("b", "y", 2L)).toDF("g", "txt", "rid")
    val e = intercept[Exception](
      Sampling.exactStratifiedTake(df, $"g", $"txt", $"rid", 5L).collect())
    assert(e.getMessage.contains("exceeds the eligible") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds the eligible")))
  }

  // --- zone maps
  test("zoneMap skipping counts match brute force; null probe raises") {
    val rows = (0 until 500).map(i => (i % 13, i.toLong))
    val stats = ZoneMap.fileStats(rows.toDF("f", "v"), $"f", $"v")
    val sum = ZoneMap.skippingSummary(stats, lit(100L), lit(200L)).collect()(0)
    val byFile = rows.groupBy(_._1).map { case (f, rs) =>
      (rs.map(_._2).min, rs.map(_._2).max, rs.size.toLong)
    }
    val skipped = byFile.filter { case (mn, mx, _) => mx < 100L || mn > 200L }
    assert(sum.getLong(0) == 13L && sum.getLong(1) == 500L)
    assert(sum.getLong(2) == skipped.size.toLong)
    assert(sum.getLong(3) == skipped.map(_._3).sum)
    assert(sum.getLong(4) == 500L - skipped.map(_._3).sum)
    val e = intercept[Exception](ZoneMap.fileStats(
      Seq((1, Option.empty[java.lang.Long])).toDF("f", "v"), $"f", $"v").collect())
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("zoneMap two-column conjunctive skipping matches brute force") {
    // files = 4x4 tiles of a 20x20 grid: a conjunctive range hits few
    val rows = for (x <- 0 until 20; y <- 0 until 20)
      yield (x / 5 * 4 + y / 5, x.toLong, y.toLong)
    val stats = ZoneMap.fileStats2(rows.toDF("f", "x", "y"), $"f", $"x", $"y")
    val sum = ZoneMap.skippingSummary2(stats,
      lit(6L), lit(8L), lit(11L), lit(13L)).collect()(0)
    val byFile = rows.groupBy(_._1).values.map { rs =>
      (rs.map(_._2).min, rs.map(_._2).max, rs.map(_._3).min, rs.map(_._3).max,
        rs.size.toLong)
    }
    val skipped = byFile.filter { case (x1, x2, y1, y2, _) =>
      x2 < 6 || x1 > 8 || y2 < 11 || y1 > 13 }
    assert(sum.getLong(0) == 16L && sum.getLong(1) == 400L)
    assert(sum.getLong(2) == skipped.size.toLong)
    assert(sum.getLong(3) == skipped.map(_._5).sum)
    assert(sum.getLong(4) == 400L - skipped.map(_._5).sum)
    // the probe lands inside exactly one tile: 15 of 16 skip
    assert(sum.getLong(2) == 15L)
  }
}

package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Property-based coverage for the round-8 operators: SCD2 build +
  * incremental merge vs a reference fold, weighted quantiles vs brute
  * force, gains-table mass invariants, expectation-audit counts vs
  * direct filters.
  */
class Round8PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop, min: Int = 40): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  private def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)

  // reference SCD2: sort by (t, tb), collapse equal-attr runs, close
  // with the successor's start
  private def refScd2(obs: Seq[(Long, Int, Long, String)])
      : Seq[(Long, Int, Option[Int], Int, Boolean, String)] =
    obs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val surv = sorted.foldLeft(Vector.empty[(Int, String)]) { (acc, r) =>
        if (acc.nonEmpty && acc.last._2 == r._4) acc else acc :+ ((r._2, r._4))
      }
      surv.zipWithIndex.map { case ((day, attr), i) =>
        val next = if (i + 1 < surv.size) Some(surv(i + 1)._1) else None
        (k, day, next, i + 1, next.isEmpty, attr)
      }
    }

  private val genLog: Gen[List[(Long, Int, Long, String)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 3L)
      day <- Gen.chooseNum(1, 20)
      attr <- Gen.oneOf("A", "B", "C")
    } yield (k, day, attr))
  } yield rows.zipWithIndex.map { case ((k, d, a), i) => (k, d, i.toLong, a) }

  test("property: Scd2.fromChangeLog equals the reference fold") {
    check(Prop.forAll(genLog) { log =>
      val got = Scd2.fromChangeLog(
        log.map { case (k, d, tb, a) => (k, ts(d), tb, a) }.toDF("k", "t", "id", "attr"),
        $"k", $"t", $"id", Seq("attr" -> $"attr"))
        .collect().map(r => (r.getLong(0), (r.getTimestamp(1).getTime / 86400000L).toInt,
          Option(r.getTimestamp(2)).map(t => (t.getTime / 86400000L).toInt),
          r.getInt(3), r.getBoolean(4), r.getString(5))).toSet
      got == refScd2(log).toSet
    })
  }

  test("property: Scd2.applyDelta at a random time cut equals the full rebuild") {
    check(Prop.forAll(genLog, Gen.chooseNum(1, 21)) { (log, cut) =>
      val full = refScd2(log).toSet
      val dim = Scd2.fromChangeLog(
        log.filter(_._2 < cut).map { case (k, d, tb, a) => (k, ts(d), tb, a) }
          .toDF("k", "t", "id", "attr"),
        $"k", $"t", $"id", Seq("attr" -> $"attr"))
      val delta = log.filter(_._2 >= cut)
      val inc =
        if (log.forall(_._2 >= cut))
          // empty dim frame: build directly (applyDelta on a 0-row dim
          // works too, but exercise the direct path half the time)
          Scd2.fromChangeLog(
            delta.map { case (k, d, tb, a) => (k, ts(d), tb, a) }.toDF("k", "t", "id", "attr"),
            $"k", $"t", $"id", Seq("attr" -> $"attr"))
        else Scd2.applyDelta(
          dim,
          delta.map { case (k, d, tb, a) => (k, ts(d), tb, a) }.toDF("k", "t", "id", "attr"),
          $"k", $"t", $"id", Seq("attr" -> $"attr"))
      val got = inc.collect().map(r => (r.getLong(0),
        (r.getTimestamp(1).getTime / 86400000L).toInt,
        Option(r.getTimestamp(2)).map(t => (t.getTime / 86400000L).toInt),
        r.getInt(3), r.getBoolean(4), r.getString(5))).toSet
      got == full
    }, min = 25)
  }

  test("property: weightedQuantile equals brute force for integer weights") {
    val gen = for {
      n <- Gen.chooseNum(1, 25)
      vs <- Gen.listOfN(n, Gen.chooseNum(-10, 10))
      ws <- Gen.listOfN(n, Gen.chooseNum(1, 5))
      den <- Gen.chooseNum(2, 8)
      num <- Gen.chooseNum(1, 8)
    } yield (vs.map(_.toDouble).zip(ws.map(_.toDouble)), math.min(num, den), den)
    check(Prop.forAll(gen) { case (pairs, num, den) =>
      val df = pairs.map { case (v, w) => ("g", v, w) }.toDF("g", "v", "w")
      val got = WeightedQuantile.weightedQuantile(df, $"g", $"v", $"w", num, den)
        .collect().head.getDouble(1)
      // brute force: expand by integer weight, k-th smallest at
      // ceil(num/den * total) in exact rational arithmetic
      val expanded = pairs.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
      val tot = expanded.size
      val k = (num.toLong * tot + den - 1) / den // ceil(num*tot/den)
      val expect = expanded((k - 1).toInt)
      got == expect
    })
  }

  test("property: gainsTable conserves mass and stays monotone") {
    val gen = for {
      n <- Gen.chooseNum(8, 120)
      labels <- Gen.listOfN(n, Gen.oneOf(0L, 0L, 1L))
    } yield labels
    check(Prop.forAll(gen) { labels =>
      val withPos = if (labels.contains(1L)) labels else 1L :: labels.tail
      val df = withPos.zipWithIndex
        .map { case (y, i) => ((i * 37 % 101).toDouble + i * 1e-3, y) }
        .toDF("s", "y")
      val rows = ModelEval.gainsTable(df, $"s", $"y", buckets = 8)
        .orderBy($"bucket").collect()
      val n = withPos.size.toLong
      val pos = withPos.count(_ == 1L).toLong
      val sumN = rows.map(_.getLong(1)).sum
      val sumPos = rows.map(_.getLong(2)).sum
      val lastCum = rows.last
      val capMono = rows.map(_.getDouble(6)).toSeq
        .sliding(2).forall { case Seq(a, b) => b >= a; case _ => true }
      sumN == n && sumPos == pos &&
        lastCum.getLong(3) == n && lastCum.getLong(4) == pos &&
        math.abs(lastCum.getDouble(6) - 1.0) < 1e-12 && capMono
    })
  }

  test("property: Expectations.audit counts match direct filters") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      vs <- Gen.listOfN(n, Gen.option(Gen.chooseNum(-5L, 5L)))
    } yield vs
    check(Prop.forAll(gen) { vs =>
      val df = vs.map(v => Tuple1(v)).toDF("v")
      val rules = Seq(
        "positive" -> ($"v" > 0L),
        "not_null" -> $"v".isNotNull,
        "null_or_small" -> ($"v".isNull || $"v" < 3L))
      val got = Expectations.audit(df, rules)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val expect = Map(
        "positive" -> vs.count(v => !v.exists(_ > 0L)).toLong,
        "not_null" -> vs.count(_.isEmpty).toLong,
        "null_or_small" -> vs.count(v => !(v.isEmpty || v.exists(_ < 3L))).toLong)
      got == expect
    })
  }
}

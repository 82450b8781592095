package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** RankStats: the bucketed midrank machinery vs brute-force pair
  * counting (AUC is P[pos outranks neg], ties half) and the direct
  * Mann-Whitney formulas; bucket-count invariance; guard rails.
  */
class RankStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop, min: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // scores drawn from a tiny integer range so ties are common
  private val genRows: Gen[List[(String, Int, Int)]] = for {
    n <- Gen.chooseNum(2, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(0, 7)
      y <- Gen.oneOf(0, 1)
    } yield (g, v, y))
  } yield rows

  private def bruteAuc2(rows: Seq[(Int, Int)]): Option[(Long, Long, Double)] = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val num2 = (for (p <- pos; q <- neg)
        yield if (p > q) 2L else if (p == q) 1L else 0L).sum
      Some((pos.size.toLong, neg.size.toLong,
        num2.toDouble / (2.0 * pos.size * neg.size)))
    }
  }

  test("property: rocAuc equals brute-force pair counting, any bucket count") {
    check(Prop.forAll(genRows, Gen.oneOf(1, 2, 7, 1024)) { (rows, buckets) =>
      val df = rows.toDF("g", "v", "y")
      val got = RankStats.rocAuc(df, $"g", $"v", $"y", buckets)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
        .toMap
      rows.groupBy(_._1).forall { case (g, rs) =>
        val expect = bruteAuc2(rs.map(r => (r._2, r._3)))
        val (n1, n0, auc) = got(g)
        expect match {
          case None => n1 == 0 || n0 == 0
          case Some((en1, en0, ea)) =>
            n1 == en1 && n0 == en0 && auc.exists(a => math.abs(a - ea) < 1e-12)
        }
      }
    })
  }

  test("property: mannWhitney u1/z match the direct formulas") {
    check(Prop.forAll(genRows) { rows =>
      val df = rows.toDF("g", "v", "y")
      val got = RankStats.mannWhitney(df, $"g", $"v", $"y", buckets = 16)
        .collect().map(r => r.getString(0) ->
          ((if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      rows.groupBy(_._1).forall { case (g, rs) =>
        val vals = rs.map(_._2.toDouble)
        val n1 = rs.count(_._3 == 1).toLong
        val n0 = rs.size - n1
        val (gu1, gz) = got(g)
        if (n1 == 0 || n0 == 0) gu1.isEmpty && gz.isEmpty
        else {
          // midranks by definition
          val ranks = vals.sorted.zipWithIndex.groupBy(_._1)
            .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
          val r1 = rs.filter(_._3 == 1).map(r => ranks(r._2.toDouble)).sum
          val u1 = r1 - n1 * (n1 + 1) / 2.0
          val n = rs.size.toDouble
          val ties = vals.groupBy(identity).values
            .map(t => t.size.toDouble * t.size * t.size - t.size).sum
          val varU = n1 * n0 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
          gu1.exists(x => math.abs(x - u1) < 1e-9) &&
            (if (varU > 0)
               gz.exists(z => math.abs(z - (u1 - n1 * n0 / 2.0) / math.sqrt(varU)) < 1e-9)
             else gz.isEmpty)
        }
      }
    })
  }

  test("all values tied: auc = 0.5, z null") {
    val df = Seq(("g", 3, 1), ("g", 3, 0), ("g", 3, 1)).toDF("g", "v", "y")
    val auc = RankStats.rocAuc(df, $"g", $"v", $"y").collect()(0)
    assert(auc.getDouble(3) == 0.5)
    val mw = RankStats.mannWhitney(df, $"g", $"v", $"y").collect()(0)
    assert(!mw.isNullAt(3) && mw.isNullAt(4))
  }

  test("value range wider than the largest finite double keeps exact ranks") {
    // hi - lo overflows to +Infinity here; the naive span formula sent
    // the largest values to a NULL bucket (sorted before bucket 0),
    // silently giving them the LOWEST midranks — AUC would read < 1
    val rows = Seq(
      ("g", -1.7e308, 0), ("g", -1.0, 0),
      ("g", 0.0, 1), ("g", 1.0, 1), ("g", 1.7e308, 1))
    val got = RankStats.rocAuc(rows.toDF("g", "v", "y"), $"g", $"v", $"y")
      .collect()(0)
    assert(got.getLong(1) == 3 && got.getLong(2) == 2)
    assert(got.getDouble(3) == 1.0) // every positive outranks every negative
  }

  test("guards: NaN score and non-binary label raise") {
    val nan = Seq(("g", Double.NaN, 1)).toDF("g", "v", "y")
    val e1 = intercept[Exception](RankStats.rocAuc(nan, $"g", $"v", $"y").collect())
    assert(e1.getMessage.contains("finite") ||
      Option(e1.getCause).exists(_.getMessage.contains("finite")))
    val bad = Seq(("g", 1.0, 2)).toDF("g", "v", "y")
    val e2 = intercept[Exception](RankStats.rocAuc(bad, $"g", $"v", $"y").collect())
    assert(e2.getMessage.contains("label") ||
      Option(e2.getCause).exists(_.getMessage.contains("label")))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Property coverage for the round-7 operators: randomized
  * equivalence checks against independent in-memory references
  * (the CEP transition function's properties live in
  * [[graft.streaming.PatternMatchSpec]] with the private API).
  */
class Round7PropertySpec extends SparkTestBase {
  import spark.implicits._

  test("property: selectQuantiles equals sorted-array selection on random multisets") {
    // a small value pool forces heavy duplication; odd bins/levels
    // stress the refinement recursion
    val gen = for {
      n <- Gen.chooseNum(1, 50)
      vs <- Gen.listOfN(n, Gen.oneOf(-2.5, 0.0, 1.0, 1.0000001, 3.5, 1e6))
      q <- Gen.oneOf(0.01, 0.25, 0.5, 0.77, 0.9, 1.0)
      bins <- Gen.oneOf(2, 3, 7)
      levels <- Gen.oneOf(0, 1, 2)
    } yield (vs, q, bins, levels)
    val prop = Prop.forAll(gen) { case (vs, q, bins, levels) =>
      val got = ExactQuantile.selectQuantiles(
        vs.toDF("x"), col("x"), Seq(q), bins = bins, levels = levels)
        .collect()(0)
      val k = math.max(1L, math.ceil(q * vs.size).toLong)
      got.getLong(1) == k && got.getDouble(2) == vs.sorted.apply((k - 1).toInt)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: topNPerGroup equals an independent sort-take per group") {
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(1L, 4L)
        id <- Gen.chooseNum(1L, 30L)
        s <- Gen.oneOf(1.0, 2.0, 2.0, 5.5, -1.0)
      } yield (g, id, s))
      k <- Gen.oneOf(1, 2, 4)
    } yield (rows.distinctBy(r => (r._1, r._2)), k)
    val prop = Prop.forAll(gen) { case (rows, k) =>
      val got = Ranking.topNPerGroup(rows.toDF("g", "id", "s"), col("g"), col("id"), col("s"), k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.map {
          case ((_, id, s), i) => (g, i + 1, id, s)
        }
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: mergeAdditive over a random split equals the unsplit aggregate") {
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 6L)
        v <- Gen.chooseNum(-50L, 50L)
      } yield (k, v))
      mask <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield (rows, mask)
    val prop = Prop.forAll(gen) { case (rows, mask) =>
      def agg(rs: Seq[(Long, Long)]) = rs.groupBy(_._1).view
        .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
      def df(rs: Seq[(Long, Long)]) = {
        val m = agg(rs).toSeq.map { case (k, (n0, s0)) => (k, n0, s0) }
        m.toDF("k", "n", "s")
      }
      val (a, b) = rows.zip(mask).partition(_._2)
      val got = Incremental.mergeAdditive(
        df(a.map(_._1)), df(b.map(_._1)), Seq("k"), Seq("n", "s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == agg(rows)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** JaroWinkler kernel: DuckDB-verified constants (the oracle engine's
  * own jaro_winkler_similarity outputs, byte-level semantics),
  * codegen ≡ static eval, and metric properties. q236 additionally
  * cross-validates against DuckDB on every blocked part-name pair at
  * both gate scales.
  */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("DuckDB-verified constants (byte-level, boost > 0.7, empty = 0)") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("héllo", "hello", 0.8400000000000001), // 6-vs-5 BYTES, not codepoints
      ("crate", "trace", 0.7333333333333334), // above 0.7 but prefix 0: no boost
      ("aaapppp", "ap", 0.7857142857142857),
      ("abcdef", "fedcba", 0.38888888888888884), // ≤ 0.7: boost suppressed
      ("ab", "ba", 0.0), // window 0: no matches
      ("", "", 0.0), ("a", "", 0.0), ("a", "a", 1.0))
    for ((a, b, expect) <- cases)
      assert(math.abs(jw(a, b) - expect) < 1e-12, s"jw($a, $b)")
  }

  test("codegen path equals the static kernel") {
    val rows = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", "x"),
      ("same", "same"), ("héllo", "hello"), ("ab", "ba"))
    val got = rows.toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(spark, $"a", $"b")).collect().map(_.getDouble(0))
    for (((a, b), g) <- rows.zip(got)) assert(g == jw(a, b), s"($a, $b)")
    // null propagates
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(spark, $"a", $"b")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("property: bounded, symmetric, reflexive") {
    val genS = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é')).map(_.mkString))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(genS, genS) { (a, b) =>
        val s = jw(a, b)
        s >= 0.0 && s <= 1.0 && s == jw(b, a) &&
          (a.isEmpty || jw(a, a) == 1.0)
      })
    assert(res.passed, res.status.toString)
  }
}

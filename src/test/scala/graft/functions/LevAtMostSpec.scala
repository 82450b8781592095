package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The banded thresholded-edit-distance kernel: exact parity with
  * Spark's own `levenshtein` wherever the distance is ≤ k, −1 beyond,
  * across random corpora, unicode, empties, and every k edge.
  */
class LevAtMostSpec extends SparkTestBase {

  import spark.implicits._

  private def led(a: String, b: String, k: Int): Int =
    LevenshteinAtMost.led(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  private def ref(a: String, b: String): Int = {
    val m = a.codePointCount(0, a.length)
    val n = b.codePointCount(0, b.length)
    val ac = a.codePoints().toArray
    val bc = b.codePoints().toArray
    val dp = Array.tabulate(m + 1, n + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to m; j <- 1 to n)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (ac(i - 1) == bc(j - 1)) 0 else 1))
    dp(m)(n)
  }

  test("parity with the full DP on a dense random corpus, every k in 0..4") {
    val strs = (0 until 80).map { i =>
      val r = new scala.util.Random(i * 2654435761L)
      (0 until r.nextInt(9)).map(_ => ('a' + r.nextInt(3)).toChar).mkString
    } ++ Seq("", "a", "customer#001", "customer#100", "héllo", "hello", "héllô")
    for (a <- strs; b <- strs; k <- 0 to 4) {
      val d = ref(a, b)
      val expect = if (d <= k) d else -1
      assert(led(a, b, k) == expect, s"led('$a','$b',$k): got ${led(a, b, k)}, want $expect")
    }
  }

  test("kernel equals Spark's levenshtein through SQL, codegen and interpreted") {
    val pairs = Seq(
      ("Customer#000000005", "Customer#000000050"),
      ("Customer#000000005", "Customer#000001235"),
      ("kitten", "sitting"), ("", "ab"), ("héllo", "hello"))
    val df = pairs.toDF("a", "b")
    val out = df.select(
      GraftFunctions.levAtMost(spark, $"a", $"b", 3).as("led"),
      levenshtein($"a", $"b").as("lev")).collect()
    out.foreach { r =>
      val expect = if (r.getInt(1) <= 3) r.getInt(1) else -1
      assert(r.getInt(0) == expect)
    }
    // null propagation and the k guard
    val n = df.limit(1).select(
      GraftFunctions.levAtMost(spark, lit(null).cast("string"), $"b", 2)).collect()
    assert(n.head.isNullAt(0))
    intercept[Exception] {
      df.select(GraftFunctions.levAtMost(spark, $"a", $"b", 65)).collect()
    }
  }

  test("long shared prefixes and suffixes short-circuit correctly") {
    val base = "Customer#" + "0" * 40
    assert(led(base + "123abc", base + "123abc", 2) == 0)
    assert(led(base + "123abc", base + "129abc", 2) == 1)
    assert(led(base + "123abc", base + "199abc", 1) == -1)
    assert(led(base, base + "xy", 2) == 2)
    assert(led("ab" + base, "ba" + base, 2) == 2)
  }
}

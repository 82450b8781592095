package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CountMin: portable-hash pinning against an independent md5
  * implementation, counter exactness vs a JVM brute force, the
  * merge ≡ global-build identity, the overestimate-only guarantee,
  * and merge validation.
  */
class CountMinSpec extends SparkTestBase {

  test("bucket matches an independently computed md5 reference") {
    // expectations computed with python hashlib.md5 — pins the
    // first-8-hex-chars-unsigned-mod-w contract any engine can replay
    assert(CountMin.bucket("alpha", 0, 64) == 10)
    assert(CountMin.bucket("alpha", 3, 64) == 59)
    assert(CountMin.bucket("42", 1, 64) == 59)
    assert(CountMin.bucket("", 0, 64) == 47)
    assert(CountMin.bucket("héllo", 2, 256) == 228) // non-ASCII → UTF-8 bytes
  }

  test("cmsStates counters equal a brute-force recomputation; nulls dropped") {
    import spark.implicits._
    val (w, d) = (32, 3)
    val toks = Seq("a", "b", "a", "c", "a", "b", null)
    val df = toks.zipWithIndex.map { case (t, i) => (i % 2, t) }.toDF("g", "tok")
    val got = CountMin.cmsStates(df, $"tok", Seq("g"), w, d)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    val want = toks.zipWithIndex.filter(_._1 != null)
      .groupBy { case (_, i) => i % 2 }
      .map { case (g, rows) =>
        val counters = new Array[Long](w * d)
        rows.foreach { case (t, _) =>
          (0 until d).foreach(j => counters(j * w + CountMin.bucket(t, j, w)) += 1L)
        }
        g -> counters
      }
    assert(got.keySet == want.keySet)
    got.foreach { case (g, arr) => assert(arr.sameElements(want(g)), s"group $g") }
  }

  test("merged per-group states are IDENTICAL to one global build (any grouping)") {
    import spark.implicits._
    val (w, d) = (64, 4)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source", explode(split($"text", " ")).as("tok"))
    val perGroup = CountMin.cmsStates(df, $"tok", Seq("source"), w, d)
    val merged = CountMin.cmsMergeStates(perGroup, $"cms", w, d)
      .collect().head.getSeq[Long](0).toArray
    val global = CountMin.cmsStates(df, $"tok", Seq.empty, w, d)
      .collect().head.getSeq[Long](0).toArray
    assert(merged.sameElements(global))
  }

  test("estimates never underestimate, and are exact when no collision occurs") {
    import spark.implicits._
    val (w, d) = (64, 4)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split($"text", " ")).as("tok"))
    val truth = df.groupBy($"tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = truth.keys.toSeq.sorted.take(20) :+ "__definitely_absent__"
    val state = CountMin.cmsStates(df, $"tok", Seq.empty, w, d)
    val est = CountMin.cmsPointEstimates(state, $"cms", keys, w, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      val t = truth.getOrElse(k, 0L)
      assert(est(k) >= t, s"CMS underestimated '$k': ${est(k)} < $t")
    }
  }

  test("cmsMergeStates rejects mis-shaped and null states loudly") {
    import spark.implicits._
    val bad = Seq(Seq(1L, 2L, 3L)).toDF("cms") // wrong length for 64x4
    val e = intercept[org.apache.spark.SparkException] {
      CountMin.cmsMergeStates(bad, $"cms", 64, 4).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      CountMin.cmsStates(Seq("a").toDF("t"), $"t", Seq.empty, 1, 4) // w too small
    }
  }
}

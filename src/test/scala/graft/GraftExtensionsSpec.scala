package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions hook registers every graft_* function session-wide —
  * SQL-only usage, no Scala API call anywhere.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in pure SQL") {
    // build an ISOLATED session (fresh sessionState + extensions) even
    // when another suite already holds the active/default session; the
    // underlying SparkContext is shared and must NOT be stopped here
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // .withExtensions drives the same injectFunction path as
      // spark.sql.extensions=graft.GraftExtensions; the conf form is a
      // STATIC conf read from the SparkContext, so it can't be proven
      // from a suite that shares an already-running context
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-spec")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val row = spark.sql(
        """SELECT
          |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
          |  graft_tokenize('Hello, World 42!') AS toks,
          |  size(graft_minhash(array('a','b'), 8)) AS mh,
          |  size(graft_minhash64(graft_shingles(array('a','b','c','d'), 3), 8)) AS mh64,
          |  graft_simhash(array('a','b')) AS sh,
          |  graft_simhash60(array('a','b')) AS sh60,
          |  graft_overlap(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS ov,
          |  size(graft_hyperplane_buckets(array(0.5d, -0.25d), 4, 8)) AS hb,
          |  graft_nearest_centroids(array(1.0d, 0.0d),
          |    array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 1) AS nc,
          |  graft_wordpiece(array('tables'), array('table', 'tab', 'le')) AS wp
          |""".stripMargin).collect().head
      assert(row.getDouble(0) == 1.0)
      assert(row.getSeq[String](1) == Seq("hello", "world", "42"))
      assert(row.getInt(2) == 8)
      assert(row.getInt(3) == 8)
      assert(row.getLong(5) >= 0L && row.getLong(5) < (1L << 60)) // sh60 range
      assert(row.getInt(6) == 2)
      assert(row.getInt(7) == 8)
      assert(row.getSeq[Int](8) == Seq(1))
      assert(row.getSeq[String](9) == Seq("table", "s")) // greedy longest match in pure SQL
      // completeness is STRUCTURAL: every function in the shared spec
      // table must resolve in this SQL-only session (the previous
      // hand-maintained injection list silently omitted one)
      graft.functions.GraftFunctions.specs.foreach { s =>
        spark.sql(s"DESCRIBE FUNCTION ${s.name}").collect()
      }
      // malformed literal args fail with a READABLE message, not an
      // IndexOutOfBounds/UnsupportedOperation from raw eval()
      val bad = intercept[Exception] {
        spark.sql("SELECT graft_minhash(array('a'))").collect()
      }
      assert(bad.getMessage.contains("graft_minhash"), bad.getMessage)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

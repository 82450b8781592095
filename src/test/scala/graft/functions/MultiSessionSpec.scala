package graft.functions

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Session threading of the native-function registry: operators must
  * resolve their graft_* kernels on the session that OWNS the input
  * frame, not whatever session happens to be active on the building
  * thread (`newSession()` registries are isolated, so relying on
  * `.active` mis-registers when a driver juggles several sessions).
  */
class MultiSessionSpec extends SparkTestBase {

  test("operators resolve on the owning session while a different session is active") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val other = spark.newSession()
    SparkSession.setActiveSession(other)
    try {
      // shingleSets registers on df's owning session (the one operator
      // entry that previously relied on build-time .active registration
      // — under a foreign active session it raised UNRESOLVED_ROUTINE
      // for graft_tokenize when run standalone)
      assert(Dedup.shingleSets(df, $"text", $"doc_id", n = 3).count() == 3)
      // the explicit-session builder registers where told, active
      // session notwithstanding
      val toks = df.select(GraftFunctions.tokenize(spark, $"text").as("t")).collect()
      assert(toks.length == 3)
      // a full operator chain (tokenize → shingles → minhash → overlap)
      // under the foreign active session
      val pairs = Dedup.ngramJaccardPairs(df, $"text", $"doc_id", n = 3, threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"got $pairs")
    } finally SparkSession.setActiveSession(spark)
  }
}

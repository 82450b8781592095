package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: exactness below capacity, the
  * N/(k+1) error/completeness guarantees above it (any partitioning),
  * and plan shape (aggregate, not a vocabulary-wide sort).
  */
class SketchesSpec extends SparkTestBase {

  test("heavyHitters is EXACT when distinct tokens fit in k") {
    import spark.implicits._
    val toks = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val df = toks.toDF("t").repartition(7) // force multi-partition merges
    val got = Sketches.heavyHitters(df, $"t", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 30L), ("b", 20L), ("c", 10L)))
  }

  test("heavyHitters guarantees hold on a skewed stream over capacity") {
    import spark.implicits._
    val k = 4
    // zipfish: one dominant token, a mid tier, and a long distinct tail
    val toks = Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++ Seq.fill(90)("mild") ++
      (1 to 300).map(i => s"tail$i")
    val n = toks.size
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    val got = Sketches.heavyHitters(toks.toDF("t").repartition(13), $"t", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k)
    got.foreach { case (t, est) =>
      val c = exact.getOrElse(t, 0L)
      assert(est <= c, s"$t overestimated: $est > $c")
      assert(c - est <= bound, s"$t error ${c - est} exceeds N/(k+1)=$bound")
    }
    // completeness: every token with true count > N/(k+1) must survive
    exact.filter(_._2 > bound).keys.foreach(t =>
      assert(got.contains(t), s"heavy token $t missing from summary"))
  }

  test("heavyHitters plan: aggregate only, no vocabulary-wide Window/sort-shuffle") {
    import spark.implicits._
    val plan = Sketches.heavyHitters(Seq("a", "b").toDF("t"), $"t", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("heavyHitters refuses k < 1; null tokens are ignored") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(Seq("a").toDF("t"), $"t", 0)
    }
    val df = Seq(Some("a"), None, Some("a")).toDF("t")
    val got = Sketches.heavyHitters(df, $"t", 4).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L)))
  }
}

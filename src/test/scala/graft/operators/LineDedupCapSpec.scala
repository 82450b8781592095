package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed cases for removeDuplicatedLines (C4-style boilerplate
  * removal) and Sampling.capPerKey (per-domain cap).
  */
class LineDedupCapSpec extends SparkTestBase {

  test("removeDuplicatedLines: corpus-wide lines removed everywhere, order kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nboiler\nbeta"),
      (2L, "boiler\ngamma"),
      (3L, "delta\nboiler"),
      (4L, "unique one\nunique two"),
      (5L, "boiler"), // doc that becomes empty
    ).toDF("doc_id", "text")
    val got = TextAnalysis.removeDuplicatedLines(docs, $"text", $"doc_id", minOccurrences = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val by = got
    assert(by(1L) == (("alpha\nbeta", 1L)))
    assert(by(2L) == (("gamma", 1L)))
    assert(by(3L) == (("delta", 1L)))
    assert(by(4L) == (("unique one\nunique two", 0L)))
    assert(by(5L) == (("", 1L))) // fully-boilerplate doc survives, empty
    assert(got.size == 5)
  }

  test("removeDuplicatedLines: threshold is corpus occurrences, within-doc counts") {
    import spark.implicits._
    // "rep" appears twice in ONE doc → reaches minOccurrences=2 and is
    // removed from both positions; "solo" appears once per doc (2 docs)
    // → also removed at 2; nothing below threshold moves
    val docs = Seq(
      (1L, "rep\nmid\nrep"),
      (2L, "solo\nkeep me"),
      (3L, "solo\nother"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.removeDuplicatedLines(docs, $"text", $"doc_id", minOccurrences = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("mid", 2L)))
    assert(got(2L) == (("keep me", 1L)))
    assert(got(3L) == (("other", 1L)))
  }

  test("removeDuplicatedLines: trailing newline makes a real (countable) empty line") {
    import spark.implicits._
    val docs = Seq((1L, "a\n"), (2L, "b\n"), (3L, "c")).toDF("doc_id", "text")
    // the two trailing "" lines reach minOccurrences=2 and drop
    val got = TextAnalysis.removeDuplicatedLines(docs, $"text", $"doc_id", minOccurrences = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("a", 1L)) && got(2L) == (("b", 1L)) && got(3L) == (("c", 0L)))
  }

  test("removeDuplicatedLines guards: null id throws, minOccurrences=1 refused") {
    import spark.implicits._
    val bad = Seq((Option.empty[java.lang.Long], "x")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      TextAnalysis.removeDuplicatedLines(bad, $"text", $"doc_id").collect()
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] {
      TextAnalysis.removeDuplicatedLines(
        Seq((1L, "x")).toDF("doc_id", "text"), $"text", $"doc_id", minOccurrences = 1)
    }
  }

  test("capPerKey: top-k by (score desc, id asc), originals returned intact") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 0.9, "p1"), ("a", 2L, 0.8, "p2"), ("a", 3L, 0.8, "p3"), ("a", 4L, 0.1, "p4"),
      ("b", 5L, 0.5, "p5"), ("b", 6L, 0.4, "p6"),
      ("c", 7L, 0.2, "p7"),
    ).toDF("source", "id", "score", "payload")
    val got = Sampling.capPerKey(df, $"source", $"score", $"id", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet
    // a: 0.9 then tie at 0.8 → lower id (2) wins; b, c keep all (≤ k)
    assert(got == Set(("a", 1L, "p1"), ("a", 2L, "p2"),
      ("b", 5L, "p5"), ("b", 6L, "p6"), ("c", 7L, "p7")))
  }

  test("capPerKey: null scores never win; NaN ranks worst") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(0.1)), ("a", 2L, None), ("a", 3L, Some(Double.NaN)), ("a", 4L, Some(0.2)),
    ).toDF("source", "id", "score")
    val got = Sampling.capPerKey(df, $"source", $"score", $"id", k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(4L, 1L)) // real scores beat NaN; null row can't win
    val one = Sampling.capPerKey(df, $"source", $"score", $"id", k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(one == Set(4L, 1L, 3L)) // NaN fills the last slot; null never does
  }

  test("capPerKey plan: bounded aggregator, no Window sort") {
    import spark.implicits._
    val df = Seq(("a", 1L, 0.5)).toDF("source", "id", "score")
    val plan = Sampling.capPerKey(df, $"source", $"score", $"id", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"capPerKey must not use a window sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected typed aggregate in plan:\n$plan")
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Golden-record survivorship: newest-non-null per field, null-skip
  * semantics (a later null never erases an earlier value), per-field
  * independence, tie-break determinism, and guards.
  */
class GoldenRecordSpec extends SparkTestBase {

  private def run(rows: Seq[(Long, Long, Long, Option[String], Option[Double])]) = {
    import spark.implicits._
    Cdc.goldenRecord(
      rows.toDF("k", "v", "t", "name", "amt").repartition(5),
      $"k", $"v", $"t",
      Seq("name" -> $"name", "amt" -> $"amt"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.getAs[String]("name")), Option(r.getAs[Any]("amt")))).toMap
  }

  test("each field survives from its newest NON-NULL observation independently") {
    val got = run(Seq(
      (1L, 1L, 1L, Some("old"), Some(5.0)),
      (1L, 2L, 2L, Some("new"), None), // later null must NOT erase amt
      (1L, 3L, 3L, None, None),
      (2L, 1L, 1L, None, Some(7.0)),
      (2L, 2L, 2L, None, None))) // key 2: name null in EVERY observation
    assert(got(1L) == ((3L, Some("new"), Some(5.0))))
    assert(got(2L) == ((2L, None, Some(7.0))))
  }

  test("version ties break on tieBreak deterministically") {
    val got = run(Seq(
      (1L, 5L, 1L, Some("a"), None),
      (1L, 5L, 2L, Some("b"), None))) // same version, higher tie wins
    assert(got(1L)._2 == Some("b"))
  }

  test("guards: empty/duplicate fields, reserved names, null keys fail loudly") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, "x")).toDF("k", "v", "t", "f")
    intercept[IllegalArgumentException] {
      Cdc.goldenRecord(df, $"k", $"v", $"t", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Cdc.goldenRecord(df, $"k", $"v", $"t", Seq("a" -> $"f", "a" -> $"f"))
    }
    intercept[IllegalArgumentException] {
      Cdc.goldenRecord(df, $"k", $"v", $"t", Seq("n_obs" -> $"f"))
    }
    val nullKey = Seq((Option.empty[Long], 1L, 1L, "x")).toDF("k", "v", "t", "f")
    val ex = intercept[Exception] {
      Cdc.goldenRecord(nullKey, $"k", $"v", $"t", Seq("f2" -> $"f")).collect()
    }
    assert(ex.getMessage.contains("goldenRecord"), ex.getMessage)
  }
}

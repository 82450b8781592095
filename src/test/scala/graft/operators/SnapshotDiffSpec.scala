package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def snap(rows: (Long, Option[Long], Double)*) =
    rows.toDF("id", "a", "b")

  test("classifies insert / delete / update / unchanged, null-safely") {
    val olds = snap((1L, Some(10L), 1.0), (2L, Some(20L), 2.0),
      (3L, None, 3.0), (4L, Some(40L), 4.0))
    val news = snap((1L, Some(10L), 1.0), (2L, Some(99L), 2.0),
      (3L, Some(30L), 3.0), (5L, Some(50L), 5.0))
    val out = Cdc.snapshotDiff(olds, news, $"id", $"id", Seq("a", "b"))
      .orderBy($"key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "unchanged", // identical payload
      2L -> "update", // a moved
      3L -> "update", // null -> value IS a change (null-safe compare)
      4L -> "delete",
      5L -> "insert"))
  }

  test("old columns null on insert, new columns null on delete; filter flag works") {
    val olds = snap((4L, Some(40L), 4.0))
    val news = snap((5L, Some(50L), 5.0))
    val rows = Cdc.snapshotDiff(olds, news, $"id", $"id", Seq("a", "b"))
      .orderBy($"key").collect()
    val del = rows.find(_.getString(1) == "delete").get
    val ins = rows.find(_.getString(1) == "insert").get
    assert(del.getLong(2) == 40L && del.isNullAt(4) && del.isNullAt(5))
    assert(ins.isNullAt(2) && ins.isNullAt(3) && ins.getLong(4) == 50L)
    val filtered = Cdc.snapshotDiff(
      snap((1L, Some(1L), 1.0)), snap((1L, Some(1L), 1.0)),
      $"id", $"id", Seq("a", "b"), includeUnchanged = false)
    assert(filtered.count() == 0)
  }

  test("duplicate keys and null keys fail loudly") {
    val dup = snap((1L, Some(1L), 1.0), (1L, Some(2L), 2.0))
    val ok = snap((1L, Some(1L), 1.0))
    val e = intercept[Exception] {
      Cdc.snapshotDiff(dup, ok, $"id", $"id", Seq("a", "b")).collect()
    }
    assert(e.getMessage.contains("multiple rows"))
    val nullKey = Seq((Option.empty[Long], Option(1L), 1.0)).toDF("id", "a", "b")
    val e2 = intercept[Exception] {
      Cdc.snapshotDiff(nullKey, ok, $"id", $"id", Seq("a", "b")).collect()
    }
    assert(e2.getMessage.contains("null"))
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(ok, ok, $"id", $"id", Seq.empty)
    }
  }

  test("diff of merge(snapshot, changes) against the snapshot recovers the changes") {
    // the operator-pair round trip: apply a change batch with
    // upsertMerge, then diff new-vs-old — every non-no-op change row
    // must come back with its class
    val olds = snap((1L, Some(10L), 1.0), (2L, Some(20L), 2.0), (3L, Some(30L), 3.0))
    val changes = Seq(
      (2L, Option(99L), 2.0, false), // update
      (3L, Option(30L), 3.0, true), // delete
      (4L, Option(40L), 4.0, false)) // insert
      .toDF("id", "a", "b", "del")
    val outs = Seq("id" -> col("id"), "a" -> col("a"), "b" -> col("b"))
    val merged = Cdc.upsertMerge(olds, changes, $"id", $"id", $"del", outs, outs)
    val diff = Cdc.snapshotDiff(olds, merged, $"id", $"id", Seq("a", "b"),
      includeUnchanged = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }
}

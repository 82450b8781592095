package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-7 wave 2: exact quantile selection, out-of-fold target
  * encoding, deterministic negative sampling, posting-list stats.
  */
class Round7Ops2Spec extends SparkTestBase {
  import spark.implicits._

  test("selectQuantiles: matches sorted-array selection on awkward shapes") {
    // duplicates, negatives, a huge outlier, and a value at the range max
    val data = Seq(5.0, 1.0, 1.0, 1.0, -3.5, 2.25, 2.25, 1e9, 7.0, 7.0)
    val df = data.toDF("x")
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    val got = ExactQuantile.selectQuantiles(df, $"x", qs, bins = 4, levels = 2)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sorted = data.sorted
    qs.foreach { q =>
      val k = math.max(1L, math.ceil(q * data.size).toLong)
      assert(got(q) == ((k, sorted((k - 1).toInt))),
        s"q=$q: ${got(q)} vs ($k, ${sorted((k - 1).toInt)})")
    }
  }

  test("selectQuantiles: all-identical values collapse the range; empty input fails loudly") {
    val same = Seq.fill(100)(42.0).toDF("x")
    val r = ExactQuantile.selectQuantiles(same, $"x", Seq(0.5)).collect()(0)
    assert(r.getDouble(2) == 42.0)
    val ex = intercept[Exception] {
      ExactQuantile.selectQuantiles(
        Seq(Option.empty[Double]).toDF("x"), $"x", Seq(0.5)).collect()
    }
    assert(ex.getMessage.contains("no non-null"))
  }

  test("selectQuantiles: distinct-value cap in the final bucket raises loudly") {
    val many = (1 to 200).map(_.toDouble).toDF("x")
    val ex = intercept[Exception] {
      // bins=2, levels=0 → final bucket is the whole column, 200 > 50
      ExactQuantile.selectQuantiles(many, $"x", Seq(0.5), bins = 2,
        levels = 0, maxDistinctInBucket = 50).collect()
    }
    assert(ex.getMessage.contains("distinct values"))
  }

  test("targetEncodeOof: out-of-fold rates exclude the row's own fold; single-fold cell nulls") {
    // entities 0..7 hash into folds; compute expected from the operator's
    // own fold assignment (the portable hash), then verify the oof algebra
    val rows = (0L to 7L).flatMap(e => Seq(("a", e, e % 2 == 0), ("a", e, true)))
    val df = rows.toDF("cat", "ent", "t")
    val out = Encoding.targetEncodeOof(df, $"cat", $"ent", $"t", folds = 2)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val total = out.values.map(_._1).sum
    val totalPos = out.values.map(_._2).sum
    out.foreach { case (fold, (n, pos, nOof, posOof)) =>
      assert(nOof == total - n, s"fold $fold n_oof")
      assert(posOof == totalPos - pos, s"fold $fold pos_oof")
    }
    // a category living in ONE fold gets a NULL encoding there
    val solo = Seq(("b", 1L, true)).toDF("cat", "ent", "t")
    val soloRow = Encoding.targetEncodeOof(solo, $"cat", $"ent", $"t", folds = 2)
      .collect()(0)
    assert(soloRow.isNullAt(6), "no out-of-fold data → NULL encoding, not 0")
  }

  test("negativeSample: deterministic, never self, negatives are real docs") {
    val docs = (1L to 200L).toDF("doc_id")
    val a = Contrastive.negativeSample(docs, $"doc_id", k = 3, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Contrastive.negativeSample(docs, $"doc_id", k = 3, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "sampling must replay identically")
    assert(a.nonEmpty)
    val ids = (1L to 200L).toSet
    a.foreach { case (doc, _, neg) =>
      assert(neg != doc, s"self-negative for $doc")
      assert(ids.contains(neg), s"negative $neg is not a corpus doc")
    }
    // near-complete coverage: each anchor keeps close to k draws
    // (draws lost only to empty / anchor-singleton cells)
    assert(a.size > 200 * 2, s"too many dropped draws: ${a.size}")
  }

  test("postingStats: df/cf/max_tf and the (tf desc, doc asc) argmax") {
    val df = Seq(
      (1L, "cat cat dog"), (2L, "cat fish"), (3L, "dog dog dog cat")).toDF("id", "text")
    val got = TextAnalysis.postingStats(df, $"text", $"id", minDf = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("cat") == ((3L, 4L, 2L, 1L)))
    assert(got("dog") == ((2L, 4L, 3L, 3L)))
    assert(got("fish") == ((1L, 1L, 1L, 2L)))
    val floored = TextAnalysis.postingStats(df, $"text", $"id", minDf = 2)
      .collect().map(_.getString(0)).toSet
    assert(floored == Set("cat", "dog"))
  }
}

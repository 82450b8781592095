package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Soundex phonetic blocking ([[RecordLinkage.phoneticPairs]]):
  * classic same-sound pairs block together, pair output equals the
  * brute-force same-code enumeration, the block-size cap raises, and
  * null/shape hygiene.
  */
class PhoneticPairsSpec extends SparkTestBase {

  private def pairsOf(names: Seq[(Long, String)], cap: Int = 100000) = {
    import spark.implicits._
    RecordLinkage.phoneticPairs(
      names.toDF("id", "name").repartition(3), $"id", $"name", cap)
  }

  test("classic same-sound names pair; different sounds don't") {
    val got = pairsOf(Seq(
      1L -> "robert", 2L -> "rupert", // R163 = R163 (textbook pair)
      3L -> "rose", 4L -> "rosy",     // R200 = R200
      5L -> "ashcraft",               // A261 — the NARA h/w-skip case
      6L -> "tymczak"))               // T522
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 2L, "R163"), (3L, 4L, "R200")))
  }

  test("pairs equal the brute-force same-code enumeration; block_n correct") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Seq("smith", "smyth", "smithe", "jon", "john", "jane",
      "jean", "kate", "cate", "karl", "carl", "carlo", "kurt", "court")
    val rows = (1L to 60L).map(i => i -> vocab(rng.nextInt(vocab.length)))
    val df = rows.toDF("id", "name")
    val got = pairsOf(rows)
      .select("id_a", "id_b", "code", "block_n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val coded = df.select($"id", soundex($"name").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byCode = coded.groupBy(_._2)
    val want = byCode.toSeq.flatMap { case (c, members) =>
      val ids = members.map(_._1).toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b, c, ids.length.toLong)
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("block-size cap raises loudly instead of exploding") {
    val e = intercept[Exception] {
      pairsOf((1L to 10L).map(i => i -> "smith"), cap = 4).count()
    }
    assert(e.getMessage.contains("phoneticPairs: block exceeds 4"))
  }

  test("null ids and null keys drop; id ordering is strict") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("lime")), (Some(2L), Some("lawn")),
      (None: Option[Long], Some("lime")), (Some(3L), None: Option[String]))
      .toDF("id", "name")
    val got = RecordLinkage.phoneticPairs(df, $"id", $"name")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }
}

package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** WordpieceEncode: greedy longest-match semantics against a scala
  * reference, fallback behavior, and codegen/interpreted agreement via
  * the registered SQL function.
  */
class WordpieceSpec extends SparkTestBase {

  private def reference(words: Seq[String], vocab: Set[String]): Seq[String] = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    words.flatMap { w =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = 0
      while (p < w.length) {
        val hit = (math.min(maxLen, w.length - p) to 1 by -1)
          .find(l => vocab.contains(w.substring(p, p + l)))
          .getOrElse(
            // code-point fallback: never split a surrogate pair
            if (Character.isHighSurrogate(w.charAt(p)) && p + 1 < w.length &&
              Character.isLowSurrogate(w.charAt(p + 1))) 2
            else 1)
        out += w.substring(p, p + hit)
        p += hit
      }
      out.toSeq
    }
  }

  test("greedy longest match beats shorter pieces; char fallback is total") {
    import spark.implicits._
    val vocab = Seq("table", "tab", "le", "ue", "val")
    val got = Seq(Seq("table", "value", "xyz"))
      .toDF("toks")
      .select(GraftFunctions.wordpiece(spark, $"toks", vocab).as("p"))
      .first().getSeq[String](0)
    // "table" matches whole (not tab+le); "value" → val+ue; "xyz" → chars
    assert(got == Seq("table", "val", "ue", "x", "y", "z"))
  }

  test("matches the reference implementation on the documents corpus") {
    import spark.implicits._
    val vocab = graft.queries.Curation2.wordpieceVocab
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = docs
      .select($"doc_id",
        graft.operators.TextAnalysis.tokens($"text").as("toks"))
      .withColumn("pieces", GraftFunctions.wordpiece(spark, $"toks", vocab))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = r.getSeq[String](1)
      val got = r.getSeq[String](2)
      assert(got == reference(toks, vocab.toSet), s"doc ${r.getLong(0)}")
    }
    // concatenation invariant: pieces rebuild the exact token stream
    rows.foreach { r =>
      assert(r.getSeq[String](2).mkString == r.getSeq[String](1).mkString)
    }
  }

  test("empty tokens → empty pieces; null tokens → null; empty-string vocab entries ignored") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "toks")
    val out = df.select($"id",
      GraftFunctions.wordpiece(spark, $"toks", Seq("a", "")).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).get.asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(out(2L).isEmpty)
  }

  test("supplementary-plane fallback keeps surrogate pairs whole") {
    import spark.implicits._
    // U+10437 (DESERET SMALL LETTER YEE) is two UTF-16 chars; with no
    // matching vocab piece the fallback must emit the full code point,
    // not two lone surrogates that UTF-8 encoding collapses to '?'
    val yee = new String(Character.toChars(0x10437))
    val got = Seq(Seq(s"${yee}ok")).toDF("toks")
      .select(GraftFunctions.wordpiece(spark, $"toks", Seq("zz")).as("p"))
      .first().getSeq[String](0)
    assert(got == Seq(yee, "o", "k"), s"got $got")
    assert(got.mkString == s"${yee}ok", "concatenation invariant incl. surrogates")
    intercept[IllegalArgumentException] {
      GraftFunctions.wordpiece(spark, $"toks", Seq.empty)
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BigramLogProbSpec extends SparkTestBase {
  import spark.implicits._

  // reference replay of the documented model, for hand-sized corpora
  private def replay(
      docs: Seq[(Long, String)], vocabSize: Int, bigramSize: Int,
      lambda: Double): Map[Long, (Long, Option[Double])] = {
    def toks(t: String) =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val tokenized = docs.map { case (id, t) => id -> toks(t) }
    val uni = tokenized.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = uni.values.sum
    val voc = uni.toSeq.sortBy { case (t, c) => (-c, t) }.take(vocabSize).toMap
    val pairsAll = tokenized.flatMap(_._2.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val bvoc = pairsAll.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(bigramSize).toMap
    tokenized.map { case (id, ts) =>
      val pairs = ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val score = if (pairs.isEmpty) None else Some(
        pairs.map { case (w1, w2) =>
          val pbi = (bvoc.get((w1, w2)), voc.get(w1)) match {
            case (Some(cb), Some(c1)) => cb.toDouble / c1.toDouble
            case _ => 0.0
          }
          val puni = voc.get(w2).map(_.toDouble).getOrElse(1.0) / total.toDouble
          math.log(lambda * pbi + (1.0 - lambda) * puni)
        }.sum / pairs.size)
      id -> (pairs.size.toLong, score)
    }.toMap
  }

  private def run(
      docs: Seq[(Long, String)], vocabSize: Int = 65536,
      bigramSize: Int = 65536, lambda: Double = 0.75) = {
    val out = TextAnalysis.bigramLogProb(
      docs.toDF("doc_id", "text"), $"text", $"doc_id", vocabSize, bigramSize, lambda)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val exp = replay(docs, vocabSize, bigramSize, lambda)
    assert(out.keySet == exp.keySet)
    for (id <- exp.keys) {
      assert(out(id)._1 == exp(id)._1, s"doc $id n_pairs")
      (out(id)._2, exp(id)._2) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"doc $id score $a vs $b")
        case (a, b) => assert(a == b, s"doc $id nullability")
      }
    }
    out
  }

  private val corpus = Seq(
    1L -> "a b a b",
    2L -> "a b c",
    3L -> "z")

  test("matches the hand replay; pairless docs score null") {
    val out = run(corpus)
    assert(out(3L) == ((0L, None)), "a 1-token doc has no pairs")
    // doc 1 (a-b transitions dominate) must outrank doc 2 (rarer b-c)
    assert(out(1L)._2.get > out(2L)._2.get)
  }

  test("a truncated bigram table zeroes the conditional leg, not the unigram leg") {
    // bigramSize=1 keeps only (a,b) (count 3); (b,a)/(b,c) fall back to
    // pure 0.25·P_uni — the replay models exactly that
    run(corpus, bigramSize = 1)
  }

  test("an out-of-vocab LEFT word zeroes the conditional leg even when the pair is tabled") {
    // vocabSize=1 keeps only 'a' (count ties break by token) — P(·|b)
    // has no known denominator and must contribute 0
    run(corpus, vocabSize = 1)
  }

  test("word-salad scores below natural transitions under the bigram model") {
    val natural = (1 to 20).map(i => i.toLong -> "the cat sat on the mat")
    val salad = Seq(100L -> "mat the on sat cat the")
    val out = run(natural ++ salad)
    assert(out(100L)._2.get < out(1L)._2.get,
      "same tokens, scrambled transitions — only the bigram leg can tell")
  }

  test("parameter guards are loud") {
    val df = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramLogProb(df, $"text", $"doc_id", lambda = 0.7)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramLogProb(df, $"text", $"doc_id", lambda = 1.0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramLogProb(df, $"text", $"doc_id", vocabSize = 0)
    }
  }
}

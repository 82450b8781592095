package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance weights: local JVM replay of the full pipeline
  * (features → buckets → smoothed log-ratio → ordered fold), the
  * directional contract (target-like docs score higher), edge cases,
  * and guards.
  */
class ImportanceSpec extends SparkTestBase {

  private def localBucket(f: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets).toInt
  }

  private def localFeatures(toks: Seq[String]): Seq[String] =
    toks ++ toks.sliding(2).collect { case Seq(a, b) => s"${a}_$b" }.toSeq

  test("matches a from-first-principles local replay within 1e-12") {
    import spark.implicits._
    val buckets = 16
    val corpus = Seq(
      (1L, "en", Seq("the", "quick", "fox")),
      (2L, "en", Seq("the", "lazy", "dog")),
      (3L, "de", Seq("der", "schnelle", "fuchs")),
      (4L, "de", Seq("the", "dog", "der")))
    val df = corpus.toDF("doc_id", "lang", "toks").repartition(3)
    val got = Importance.dsirLogWeights(
      df, df.filter($"lang" === "en"), $"doc_id", $"toks", buckets)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // local replay
    val tgtCounts = new Array[Long](buckets)
    val rawCounts = new Array[Long](buckets)
    corpus.foreach { case (_, lang, toks) =>
      localFeatures(toks).foreach { f =>
        val b = localBucket(f, buckets)
        rawCounts(b) += 1
        if (lang == "en") tgtCounts(b) += 1
      }
    }
    val tt = tgtCounts.sum.toDouble + buckets
    val rt = rawCounts.sum.toDouble + buckets
    val ratio = Array.tabulate(buckets)(b =>
      math.log((tgtCounts(b) + 1.0) / tt) - math.log((rawCounts(b) + 1.0) / rt))
    corpus.foreach { case (id, _, toks) =>
      val fs = localFeatures(toks)
      var acc = 0.0
      fs.foreach(f => acc += ratio(localBucket(f, buckets)))
      val (nf, lw) = got(id)
      assert(nf == fs.size, s"doc $id n_feats $nf != ${fs.size}")
      assert(math.abs(lw - acc) < 1e-12, s"doc $id weight $lw != $acc")
    }
  }

  test("target-exclusive vocabulary outweighs raw-exclusive vocabulary") {
    import spark.implicits._
    // target docs repeat 'alpha'; the rest repeat 'omega' — a doc made
    // of 'alpha' must outscore a doc made of 'omega'
    val corpus = (1L to 10L).map(i =>
      (i, if (i <= 5) "t" else "r",
        Seq.fill(6)(if (i <= 5) "alpha" else "omega"))).toDF("doc_id", "lang", "toks")
    val w = Importance.dsirLogWeights(
      corpus, corpus.filter($"lang" === "t"), $"doc_id", $"toks", 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(6L) + 1.0, s"target doc ${w(1L)} not above raw doc ${w(6L)}")
  }

  test("empty token lists score 0 with 0 features; bigrams need 2 tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]), (2L, Seq("solo")), (3L, Seq("a", "b")))
      .toDF("doc_id", "toks")
    val got = Importance.dsirLogWeights(df, df, $"doc_id", $"toks", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((0L, 0.0)))
    assert(got(2L)._1 == 1L) // unigram only
    assert(got(3L)._1 == 3L) // two unigrams + one bigram
    // target == corpus with equal smoothing still shifts weights only
    // through the +1/B terms; sign is not asserted, determinism is
    val again = Importance.dsirLogWeights(df, df, $"doc_id", $"toks", 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == got.view.mapValues(_._2).toMap)
  }

  test("parameter and null-id guards are loud") {
    import spark.implicits._
    val df = Seq((1L, Seq("a"))).toDF("doc_id", "toks")
    intercept[IllegalArgumentException] {
      Importance.dsirLogWeights(df, df, $"doc_id", $"toks", 1)
    }
    val nullId = Seq((Option.empty[Long], Seq("a"))).toDF("doc_id", "toks")
    val ex = intercept[Exception] {
      Importance.dsirLogWeights(nullId, df, $"doc_id", $"toks", 8).collect()
    }
    assert(ex.getMessage.contains("dsirLogWeights"), ex.getMessage)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-14 eval operators: BLEU (clipping, brevity penalty, the
  * Papineni worked example), chrF (identity/disjoint/cap contracts),
  * and the Zipf rank–frequency fit (hand OLS parity, guards).
  */
class Round14OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def bleuRow(cand: String, ref: String) =
    TextAnalysis.bleuScore(
      Seq((1L, cand, ref)).toDF("pid", "c", "r"),
      col("pid"), col("c"), col("r"), maxN = 4)
      .collect()(0) // bounded: one pair in, one row out

  test("bleu: identical texts score exactly 1 with bp 1") {
    val r = bleuRow("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog")
    assert(r.getAs[Double]("bp") === 1.0)
    assert(r.getAs[Double]("bleu") === 1.0)
    assert(r.getAs[Long]("m1") === 9L && r.getAs[Long]("m4") === 6L)
  }

  test("bleu: the Papineni clipping example — 'the'*7 vs a 2-'the' reference") {
    // modified unigram precision must CLIP at the reference count (2),
    // not count all 7 candidate occurrences
    val r = bleuRow("the the the the the the the", "the cat is on the mat")
    assert(r.getAs[Long]("m1") === 2L)
    assert(r.getAs[Long]("m2") === 0L) // "the the" never occurs in ref
    assert(r.getAs[Double]("bleu") === 0.0) // any p_n = 0 => unsmoothed 0
    assert(r.getAs[Double]("bp") === 1.0) // c = 7 >= r = 6
  }

  test("bleu: brevity penalty is exp(1 - r/c) when candidate is shorter") {
    val r = bleuRow("a b c d e", "a b c d e f g h i j")
    assert(r.getAs[Long]("c_len") === 5L && r.getAs[Long]("r_len") === 10L)
    assert(math.abs(r.getAs[Double]("bp") - math.exp(1.0 - 10.0 / 5.0)) < 1e-15)
    // candidate is a verbatim prefix: every p_n = 1, bleu = bp
    assert(math.abs(r.getAs[Double]("bleu") - r.getAs[Double]("bp")) < 1e-15)
  }

  test("bleu: a candidate shorter than maxN grams scores 0 (t4 = 0)") {
    val r = bleuRow("a b c", "a b c")
    assert(r.getAs[Long]("m3") === 1L)
    assert(r.getAs[Double]("bleu") === 0.0) // no 4-grams to score
  }

  test("bleu: empty candidate scores 0 without dividing by zero") {
    val r = bleuRow("", "some reference text")
    assert(r.getAs[Double]("bleu") === 0.0 && r.getAs[Double]("bp") === 0.0)
  }

  private def chrfRow(cand: String, ref: String) =
    TextAnalysis.chrF(
      Seq((1L, cand, ref)).toDF("pid", "c", "r"),
      col("pid"), col("c"), col("r"), maxN = 6, maxChars = 200)
      .collect()(0) // bounded: one pair in, one row out

  test("chrf: identical texts score exactly 1") {
    val r = chrfRow("The quick brown fox", "The  quick brown fox")
    // whitespace-stripped lowercase: the double space must not matter
    assert(r.getAs[Double]("p_avg") === 1.0)
    assert(r.getAs[Double]("r_avg") === 1.0)
    assert(r.getAs[Double]("chrf") === 1.0)
  }

  test("chrf: disjoint alphabets score 0") {
    val r = chrfRow("aaaa", "zzzz")
    assert(r.getAs[Double]("chrf") === 0.0)
    (1 to 6).foreach(n => assert(r.getAs[Long](s"m$n") === 0L))
  }

  test("chrf: recall-weighted — missing half the reference hurts more than adding it") {
    val full = "abcdefghijklmnop"
    val half = full.take(8)
    val prec = chrfRow(full, half) // candidate adds beyond ref: P drops
    val rec = chrfRow(half, full) // candidate misses ref: R drops
    // beta = 2 weighs recall 4x: the recall-deficient pair scores lower
    assert(rec.getAs[Double]("chrf") < prec.getAs[Double]("chrf"))
  }

  test("chrf: maxChars cap truncates both sides (documented contract)") {
    val long = "ab" * 300 // 600 chars, stripped stays 600
    val r = chrfRow(long, long)
    assert(r.getAs[Long]("c_chars") === 200L)
    assert(r.getAs[Double]("chrf") === 1.0)
  }

  test("zipf: hand OLS parity on a known frequency spectrum") {
    // tokens: a x4, b x2, c x1 -> ranks 1,2,3 with counts 4,2,1
    val df = Seq("a a a a b", "b c").toDF("text")
    val r = TextAnalysis.zipfFit(df, col("text"), topK = 4096).collect()(0)
    assert(r.getAs[Long]("n_ranks") === 3L)
    assert(r.getAs[Long]("top_count") === 4L)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-12)
    // counts 4,2,1 over ranks 1,2,3 approximate a power law closely
    assert(r.getAs[Double]("r2") > 0.95)
    assert(r.getAs[Double]("slope") < 0.0)
  }

  test("zipf: topK caps the fitted head") {
    val df = Seq("a a a a a b b b c c d").toDF("text")
    val r = TextAnalysis.zipfFit(df, col("text"), topK = 2).collect()(0)
    assert(r.getAs[Long]("n_ranks") === 2L)
  }

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("zipf: single-token vocabulary raises loudly") {
    val df = Seq("same same same").toDF("text")
    val e = intercept[Exception] {
      TextAnalysis.zipfFit(df, col("text")).collect()
    }
    assert(messageChain(e).contains("at least 2 distinct tokens"))
  }

  test("zipf: all-equal head counts raise loudly (no law to fit)") {
    val df = Seq("a b c d").toDF("text") // every token count = 1
    val e = intercept[Exception] {
      TextAnalysis.zipfFit(df, col("text")).collect()
    }
    assert(messageChain(e).contains("degenerate spectrum"))
  }

  private def rougeRow(cand: String, ref: String, maxTokens: Int = 128) =
    TextAnalysis.rougeL(
      Seq((1L, cand, ref)).toDF("pid", "c", "r"),
      col("pid"), col("c"), col("r"), maxTokens)
      .collect()(0) // bounded: one pair in, one row out

  test("rouge-l: identical texts score exactly 1") {
    val r = rougeRow("the quick brown fox", "the quick brown fox")
    assert(r.getAs[Long]("lcs") === 4L)
    assert(r.getAs[Double]("f") === 1.0)
  }

  test("rouge-l: credits gapped in-order overlap that BLEU 2-grams miss") {
    val r = rougeRow("a x b y c", "a b c")
    assert(r.getAs[Long]("lcs") === 3L) // a..b..c in order, gaps allowed
    assert(r.getAs[Double]("p") === 3.0 / 5.0)
    assert(r.getAs[Double]("r") === 1.0)
  }

  test("rouge-l: order matters — reversed tokens share only one") {
    val r = rougeRow("c b a", "a b c")
    assert(r.getAs[Long]("lcs") === 1L)
  }

  test("rouge-l: disjoint and empty score 0 without dividing by zero") {
    assert(rougeRow("a b", "x y").getAs[Double]("f") === 0.0)
    assert(rougeRow("", "x y").getAs[Double]("f") === 0.0)
    assert(rougeRow("", "").getAs[Double]("f") === 0.0)
  }

  test("rouge-l: maxTokens caps the scored lengths (documented contract)") {
    val r = rougeRow(("w " * 50).trim, ("w " * 50).trim, maxTokens = 8)
    assert(r.getAs[Long]("c_len") === 8L && r.getAs[Long]("lcs") === 8L)
  }

  test("lcs kernel: parity with the brute recursive reference on random inputs") {
    // memoized brute LCS over indices — the textbook recurrence
    def brute(a: Seq[String], b: Seq[String]): Int = {
      val memo = Array.fill(a.length + 1, b.length + 1)(-1)
      def go(i: Int, j: Int): Int = {
        if (i == 0 || j == 0) 0
        else if (memo(i)(j) >= 0) memo(i)(j)
        else {
          val v =
            if (a(i - 1) == b(j - 1)) go(i - 1, j - 1) + 1
            else math.max(go(i - 1, j), go(i, j - 1))
          memo(i)(j) = v
          v
        }
      }
      go(a.length, b.length)
    }
    val rnd = new scala.util.Random(14)
    val alpha = Vector("a", "b", "c", "d")
    for (_ <- 1 to 60) {
      val xs = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.size)))
      val ys = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.size)))
      val got = rougeRow(xs.mkString(" "), ys.mkString(" ")).getAs[Long]("lcs")
      assert(got === brute(xs, ys).toLong,
        s"lcs mismatch on ${xs.mkString(",")} vs ${ys.mkString(",")}")
    }
  }
}

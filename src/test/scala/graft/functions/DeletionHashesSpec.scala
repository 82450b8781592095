package graft.functions

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** The deletion-neighborhood hash kernel behind the FastSS blocking:
  * its O(1)-per-variant rolling-hash values must EQUAL the hash each
  * variant string would get as a full string — that cross-string
  * agreement is what makes two strings' blocks meet exactly when
  * their deletion neighborhoods intersect.
  */
class DeletionHashesSpec extends SparkTestBase {

  private def hashesOf(s: String, k: Int): Set[Long] =
    DeletionHashes.hashes(UTF8String.fromString(s), k)
      .toLongArray().toSet

  /** Reference: the variant STRINGS themselves. */
  private def variantStrings(s: String, k: Int): Set[String] = {
    val cp = s.codePoints().toArray
    def del(ps: Seq[Int]): String = {
      val keep = cp.indices.filterNot(ps.contains)
      new String(keep.map(cp).toArray, 0, keep.length)
    }
    val d0 = Set(s)
    val d1 = cp.indices.map(i => del(Seq(i))).toSet
    val d2 =
      if (k >= 2)
        (for (i <- cp.indices; j <- cp.indices if i < j)
          yield del(Seq(i, j))).toSet
      else Set.empty[String]
    if (k >= 2) d0 ++ d1 ++ d2 else d0 ++ d1
  }

  test("two strings' hash sets intersect IFF their variant-string sets do") {
    // the property the FastSS blocking actually relies on: block keys
    // agree across strings exactly when the deletion neighborhoods
    // share a variant STRING — checked exhaustively over a corpus with
    // repeats, unicode (2-byte and surrogate-free multibyte), empties
    // and the near-identical long-prefix shape of the q365 fixture
    val corpus = Seq("", "a", "ab", "aab", "cat", "cart", "tac",
      "Customer#000000001", "Customer#000000010", "héllo", "hallo",
      "ζζab", "abζζ", "aζb")
    for (x <- corpus; y <- corpus; k <- Seq(1, 2)) {
      val share = variantStrings(x, k).intersect(variantStrings(y, k)).nonEmpty
      val hashShare = hashesOf(x, k).intersect(hashesOf(y, k)).nonEmpty
      assert(share == hashShare,
        s"block agreement broke for ('$x','$y') k=$k: strings=$share hashes=$hashShare")
    }
  }

  test("hash-set size equals the distinct variant-string count (no self-collisions)") {
    val corpus = Seq("a", "ab", "aab", "aaaa", "cat", "cart",
      "Customer#000000001", "héllo", "ζζab")
    for (s <- corpus; k <- Seq(1, 2)) {
      assert(hashesOf(s, k).size == variantStrings(s, k).size,
        s"'$s' k=$k: ${hashesOf(s, k).size} hashes vs " +
          s"${variantStrings(s, k).size} distinct variants")
    }
  }

  test("property: block agreement matches variant-string agreement on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small alphabet + short strings maximize both real shared variants
    // and near-miss pairs; include a multibyte letter so code-point
    // arithmetic is exercised, and repeats so in-string dedup is too
    val genStr = for {
      n <- Gen.chooseNum(0, 7)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'ζ'))
    } yield cs.mkString
    val prop = Prop.forAll(genStr, genStr, Gen.oneOf(1, 2)) { (x, y, k) =>
      val strings = variantStrings(x, k).intersect(variantStrings(y, k)).nonEmpty
      val hashes = hashesOf(x, k).intersect(hashesOf(y, k)).nonEmpty
      strings == hashes &&
        hashesOf(x, k).size == variantStrings(x, k).size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("empty string has exactly its own hash; guards fire") {
    assert(hashesOf("", 1).size == 1 && hashesOf("", 2).size == 1)
    intercept[IllegalArgumentException] {
      DeletionHashes.hashes(UTF8String.fromString("x" * 8193), 2)
    }
  }
}

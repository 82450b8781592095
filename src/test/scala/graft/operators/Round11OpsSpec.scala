package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Round-11 operators: winnowing fingerprints (MOSS) and rendezvous
  * hashing — brute-force equivalence, the winnowing coverage
  * guarantee, and the rendezvous minimal-movement property.
  */
class Round11OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def check(prop: Prop, min: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  /** Scala reference of robust winnowing over a token list: k-gram
    * md5-60bit hashes, window rightmost-min, distinct (pos, h).
    */
  private def bruteWinnow(toks: Seq[String], k: Int, window: Int): Set[(Long, Long)] = {
    if (toks.length < k) return Set.empty
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val grams = (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
    val hs = grams.map(h60)
    val m = hs.length
    val ends = (1 to m).filter(e => e >= window || e == m)
    ends.map { e =>
      val lo = math.max(1, e - window + 1)
      val win = (lo to e).map(p => (hs(p - 1), p))
      // min hash, rightmost position on ties
      val mh = win.map(_._1).min
      val pos = win.filter(_._1 == mh).map(_._2).max
      (pos.toLong, mh)
    }.toSet
  }

  test("property: winnowingFingerprints equals the brute reference") {
    val genDoc: Gen[List[String]] = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "ee", "f0")))
    check(Prop.forAll(genDoc, Gen.oneOf(1, 2, 5), Gen.oneOf(1, 3, 4)) {
      (toks, k, w) =>
        val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
        val got = TextAnalysis.winnowingFingerprints(df, $"text", $"doc_id", k, w)
          .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
        got == bruteWinnow(toks, k, w)
    })
  }

  test("winnowing coverage guarantee: a shared run of >= k+w-1 tokens shares a fingerprint") {
    val run = Seq("x1", "x2", "x3", "x4", "x5", "x6", "x7", "x8") // k=5,w=4 => need 8
    val docA = Seq("a", "b", "c") ++ run ++ Seq("d", "e")
    val docB = Seq("q", "r") ++ run ++ Seq("s", "t", "u", "v")
    val df = Seq((1L, docA.mkString(" ")), (2L, docB.mkString(" ")))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(df, $"text", $"doc_id", 5, 4)
      .collect().groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(_.getLong(2)).toSet
      }
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "shared 8-token run produced no shared fingerprint")
  }

  test("rendezvous: equals brute argmax; removal moves ONLY the removed shard's keys") {
    val shards = (0 until 8).map(i => s"s$i")
    val keys = (1L to 500L).toDF("k")
    val placed = Rendezvous.assign(
      Rendezvous.assign(keys, $"k", shards, "sb"),
      $"k", shards.filterNot(_ == "s3"), "sa")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    placed.foreach { case (k, sb, sa) =>
      val brute = shards.maxBy(s => md5hex(s"$k|$s"))
      assert(sb == brute, s"key $k: got $sb, brute $brute")
      if (sb != "s3") assert(sa == sb, s"key $k moved from $sb to $sa without cause")
      else assert(sa != "s3")
    }
    // the removed shard's keys spread, and load stays roughly balanced
    val moved = placed.count { case (_, sb, sa) => sb != sa }
    assert(moved == placed.count(_._2 == "s3"))
    val byShard = placed.groupBy(_._2).view.mapValues(_.length)
    assert(byShard.values.min > 20, s"suspiciously unbalanced: $byShard")
  }

  test("rendezvous guards: null key raises, duplicate shard rejected") {
    val e = intercept[IllegalArgumentException] {
      Rendezvous.assign(Seq(1L).toDF("k"), $"k", Seq("a", "a"))
    }
    assert(e.getMessage.contains("duplicate"))
    val err = intercept[Exception] {
      Rendezvous.assign(
        Seq(Some(1L), None).toDF("k"), $"k", Seq("a", "b")).collect()
    }
    assert(err.getMessage.contains("rendezvous"))
  }

  test("fellegiSunter: weights match the brute m/u arithmetic; nulls contribute 0") {
    val recs = Seq(
      (1L, Some("us"), Some("A")), (2L, Some("us"), Some("A")),
      (3L, Some("us"), Some("B")), (4L, Some("de"), None),
      (5L, Some("de"), Some("B")), (6L, Some("fr"), Some("A")))
      .toDF("id", "country", "seg")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (1L, 6L))
      .toDF("id_a", "id_b")
    val got = RecordLinkage.fellegiSunter(
      recs, $"id",
      Seq(("country", $"country", 9L, 10L), ("seg", $"seg", 4L, 5L)),
      pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // u(country): counts us=3, de=2, fr=1 over 6 -> (6+2)/30
    val uC = 8.0 / 30.0
    // u(seg): non-null counts A=3, B=2 over 5 -> (6+2)/20
    val uS = 8.0 / 20.0
    val (mC, mS) = (0.9, 0.8)
    def w(agree: Boolean, m: Double, u: Double): Double =
      if (agree) math.log(m / u) else math.log((1 - m) / (1 - u))
    assert(got((1L, 2L))._1 == 2 && got((1L, 2L))._2 == 2)
    assert(math.abs(got((1L, 2L))._3 - (w(true, mC, uC) + w(true, mS, uS))) < 1e-12)
    assert(math.abs(got((1L, 3L))._3 - (w(true, mC, uC) + w(false, mS, uS))) < 1e-12)
    // (4,5): country agrees, seg null on one side -> 0 contribution
    assert(got((4L, 5L)) == ((1L, 1L, w(true, mC, uC))))
    assert(math.abs(got((1L, 6L))._3 - (w(false, mC, uC) + w(true, mS, uS))) < 1e-12)
  }

  test("fellegiSunter guards: all-distinct field (u=0) and constant field (u=1) raise") {
    val recs = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"))
      .toDF("id", "uniq", "const")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val e1 = intercept[IllegalArgumentException] {
      RecordLinkage.fellegiSunter(recs, $"id", Seq(("u", $"uniq", 1L, 2L)), pairs)
    }
    assert(e1.getMessage.contains("all-distinct"))
    val e2 = intercept[IllegalArgumentException] {
      RecordLinkage.fellegiSunter(recs, $"id", Seq(("c", $"const", 1L, 2L)), pairs)
    }
    assert(e2.getMessage.contains("constant"))
  }

  test("property: sortedNeighborhoodPairs equals the brute global-sort window") {
    val genRecs: Gen[List[(Long, String)]] = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, for {
        id <- Gen.chooseNum(1L, 200L)
        s <- Gen.listOfN(3, Gen.oneOf("a", "b", "c")).map(_.mkString)
      } yield (id, s))).map(_.distinctBy(_._1))
    check(Prop.forAll(genRecs, Gen.oneOf(2, 3, 5), Gen.oneOf(1, 2)) {
      (recs, w, plen) =>
        val df = recs.toDF("id", "k")
        val got = RecordLinkage.sortedNeighborhoodPairs(
          df, $"id", $"k", window = w, prefixLen = plen)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val sorted = recs.sortBy { case (id, k) => (k, id) }
        val want = (for {
          i <- sorted.indices; j <- (i + 1) until math.min(i + w, sorted.length)
        } yield (sorted(i)._1, sorted(j)._1, (j - i).toLong)).toSet
        got == want
    })
  }

  test("property: wasserstein1D equals the brute CDF-integral on integer samples") {
    val genSide: Gen[List[Long]] = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)))
    check(Prop.forAll(genSide, genSide, Gen.oneOf(1, 3, 256)) { (xs, ys, buckets) =>
      val df = (xs.map((_, true)) ++ ys.map((_, false))).toDF("v", "r")
      val row = KsTest.wasserstein1D(df, $"v", $"r", buckets).collect()(0)
      val support = (xs ++ ys).distinct.sorted
      val (na, nb) = (xs.length.toLong, ys.length.toLong)
      var (ca, cb) = (0L, 0L)
      var num = BigInt(0)
      var prev: Option[Long] = None
      support.foreach { x =>
        prev.foreach(p => num +=
          (BigInt(ca) * nb - BigInt(cb) * na).abs * BigInt(x - p))
        ca += xs.count(_ == x); cb += ys.count(_ == x)
        prev = Some(x)
      }
      row.getLong(0) == na && row.getLong(1) == nb &&
        row.getLong(2) == support.length.toLong &&
        row.getString(3) == num.toString &&
        math.abs(row.getDouble(4) -
          num.toDouble / (na.toDouble * nb.toDouble)) < 1e-12
    })
  }
}

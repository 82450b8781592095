package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(rows: (Long, String)*) =
    FuzzyJoin.ed1Pairs(rows.toDF("id", "s"), $"id", $"s")
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

  test("finds equal, substituted, inserted and deleted variants; rejects transpositions") {
    val out = pairs(
      1L -> "cat", 2L -> "cat", // equal → dist 0
      3L -> "cut", // substitution of 1
      4L -> "cats", // insertion on 1
      5L -> "at", // deletion of 1
      6L -> "dog", // unrelated
      7L -> "tac") // transposition-ish of 1: ED 2, must NOT pair
    assert(out.contains((1L, 2L, 0)))
    assert(out.contains((1L, 3L, 1)) && out.contains((2L, 3L, 1)))
    assert(out.contains((1L, 4L, 1)) && out.contains((1L, 5L, 1)))
    assert(!out.exists(p => p._1 == 7L || p._2 == 7L),
      "ED-2 strings sharing a deletion variant must be verified away")
    assert(!out.exists(p => p._1 == 6L || p._2 == 6L))
    // "ab"/"ba" is the canonical shared-variant false positive
    assert(pairs(1L -> "ab", 2L -> "ba").isEmpty)
  }

  test("empty and single-char strings behave (ED1 across the empty string)") {
    val out = pairs(1L -> "", 2L -> "a", 3L -> "b")
    assert(out.contains((1L, 2L, 1)) && out.contains((1L, 3L, 1)))
    assert(out.contains((2L, 3L, 1)), "a→b is one substitution")
  }

  test("complete and sound vs the brute-force join on a random-ish corpus") {
    // deterministic pseudo-random short strings over a 3-letter
    // alphabet — dense enough that every edit class appears
    val strs = (0 until 120).map { i =>
      val r = new scala.util.Random(i * 2654435761L)
      (i.toLong, (0 until (1 + r.nextInt(5))).map(_ => ('a' + r.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("id", "s")
    val blocked = FuzzyJoin.ed1Pairs(df, $"id", $"s")
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = df.select($"id".as("ia"), $"s".as("sa"))
    val b = df.select($"id".as("ib"), $"s".as("sb"))
    val brute = a.crossJoin(b)
      .filter($"ia" < $"ib" && levenshtein($"sa", $"sb") <= 1)
      .select($"ia", $"ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must actually contain ED<=1 pairs")
  }

  test("hot variant blocks fail loudly; result is repartition-invariant") {
    // 5 identical strings share every variant — block size 5 > cap 4
    val hot = (1L to 5L).map(_ -> "same").toDF("id", "s")
    val e = intercept[Exception] {
      FuzzyJoin.ed1Pairs(hot, $"id", $"s", maxBlockSize = 4).collect()
    }
    assert(e.getMessage.contains("maxBlockSize"))
    val df = (0L to 60L).map(i => i -> s"tok$i").toDF("id", "s")
    val x = FuzzyJoin.ed1Pairs(df, $"id", $"s").orderBy($"id_a", $"id_b").collect()
    val y = FuzzyJoin.ed1Pairs(df.repartition(11), $"id", $"s")
      .orderBy($"id_a", $"id_b").collect()
    assert(x.toSeq == y.toSeq)
    intercept[IllegalArgumentException] {
      FuzzyJoin.ed1Pairs(df, $"id", $"s", maxBlockSize = 1)
    }
  }

  test("k=2 finds transpositions and double edits; complete vs brute force") {
    val out = FuzzyJoin.edPairs(Seq(
      1L -> "cat", 2L -> "tac", // transposition = ED 2
      3L -> "cart", 4L -> "ca", // one insertion / double delete vs "cart"
      5L -> "dog").toDF("id", "s"), $"id", $"s", 2)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out.contains((1L, 2L, 2)) && out.contains((1L, 3L, 1)) &&
      out.contains((1L, 4L, 1)) && out.contains((3L, 4L, 2)))
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L))
    // brute-force parity including dist values on a dense random corpus
    val strs = (0 until 90).map { i =>
      val r = new scala.util.Random(i * 2654435761L)
      (i.toLong, (0 until (1 + r.nextInt(5))).map(_ => ('a' + r.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("id", "s")
    val blocked = FuzzyJoin.edPairs(df, $"id", $"s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = df.select($"id".as("ia"), $"s".as("sa"))
      .crossJoin(df.select($"id".as("ib"), $"s".as("sb")))
      .filter($"ia" < $"ib" && levenshtein($"sa", $"sb") <= 2)
      .select($"ia", $"ib", levenshtein($"sa", $"sb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute,
      s"missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
    assert(brute.exists(_._3 == 2), "fixture must contain true ED-2 pairs")
    intercept[IllegalArgumentException] {
      FuzzyJoin.edPairs(df, $"id", $"s", 3)
    }
  }

  test("multibyte strings block and verify at code-point grain") {
    // levenshtein counts code points; the hash-blocked neighborhood
    // must too (a byte-level deletion model would miss these pairs)
    val out = pairs(1L -> "héllo", 2L -> "hallo", 3L -> "héllos")
    assert(out.contains((1L, 2L, 1)), s"é→a is one substitution, got ${out.toSeq}")
    assert(out.contains((1L, 3L, 1)), s"trailing s is one insertion, got ${out.toSeq}")
    val out2 = FuzzyJoin.edPairs(
      Seq(1L -> "ζζab", 2L -> "abζζ", 3L -> "ζaζb").toDF("id", "s"),
      $"id", $"s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out2 == Set((1L, 3L, 2)),
      s"ζζab↔ζaζb is the only ED≤2 pair (abζζ is ED 4 / ED 3 away), got $out2")
  }

  test("multi-spelling ids emit ONE row per pair with the min distance") {
    // id 1 carries two spellings: "cat" (dist 0 vs id 2) and "cut"
    // (dist 1 vs id 2's "cat") — the pair (1,2) surfaces from the eq
    // branch AND from near; the rollup must keep exactly one row, at
    // the smallest witnessed distance
    val df = Seq((1L, "cat"), (1L, "cut"), (2L, "cat")).toDF("id", "s")
    val out = FuzzyJoin.ed1Pairs(df, $"id", $"s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.count(p => p._1 == 1L && p._2 == 2L) == 1,
      s"pair (1,2) must appear exactly once, got ${out.toSeq}")
    assert(out.contains((1L, 2L, 0)), s"min dist is 0 (cat==cat), got ${out.toSeq}")
    // two distinct near-witnesses, no eq witness: still one row, dist 1
    val df2 = Seq((1L, "cab"), (1L, "cut"), (2L, "cat")).toDF("id", "s")
    val out2 = FuzzyJoin.ed1Pairs(df2, $"id", $"s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out2.toSeq == Seq((1L, 2L, 1)), s"got ${out2.toSeq}")
  }

  test("entity-resolution composition: pairs → components → best survivor") {
    // cluster {1,2,3}: kitt/mitt/mitts chain (kitt↔mitt sub,
    // mitt↔mitts ins — kitt↔mitts is ED 2, linked only transitively);
    // cluster {4}: singleton
    val ents = Seq(
      (1L, "kitt", 10.0), (2L, "mitt", 30.0), (3L, "mitts", 20.0),
      (4L, "zzz", 5.0)).toDF("id", "s", "bal")
    val pairs = FuzzyJoin.ed1Pairs(ents, $"id", $"s").select($"id_a", $"id_b")
    val resolved = Dedup.keepBestPerCluster(ents, pairs, $"id", $"bal")
    val out = resolved.select($"id", $"cluster_id", $"n_members")
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    resolved.unpersist()
    assert(out.toSeq == Seq((2L, 1L, 3L), (4L, 4L, 1L)),
      s"best-balance survivor of the transitive cluster + the singleton, got ${out.toSeq}")
  }
}

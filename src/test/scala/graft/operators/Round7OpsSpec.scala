package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-7 operator semantics: k-core peeling, personalized PageRank,
  * Naive Bayes training counts, FD profiling, sequential bigrams, and
  * the leave-one-out seasonal baseline.
  */
class Round7OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("kCore: triangle survives the 2-core, pendant and its bridge peel away") {
    // triangle 1-2-3 plus pendant chain 3-4-5
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val got = Graph.kCore(e, $"s", $"d", k = 2, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 5 peels (deg 1) → 4 becomes deg 1 → peels → triangle stable at deg 2
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: k above the max degree empties the graph; fixed rounds are a no-op at fixpoint") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    assert(Graph.kCore(e, $"s", $"d", k = 5, rounds = 4).count() == 0)
    val a = Graph.kCore(e, $"s", $"d", k = 1, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.kCore(e, $"s", $"d", k = 1, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "extra rounds past the fixpoint must not change the core")
  }

  test("personalizedPageRank: conserves mass, zeroes unreachable nodes, matches a local replay") {
    // 1→2→3 reachable from seed 1; island 8→9 unreachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (8L, 9L))
    val df = edges.toDF("s", "d")
    val seeds = Seq(1L)
    val got = Graph.personalizedPageRank(df, $"s", $"d", seeds, 0.85, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass leak: ${got.values.sum}")
    assert(got(8L) == 0.0 && got(9L) == 0.0, "unreachable nodes must score exactly 0")
    // local replay
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    var r = nodes.map(n => n -> (if (seeds.contains(n)) 1.0 / seeds.size else 0.0)).toMap
    for (_ <- 1 to 10) {
      val dang = r.collect { case (n, v) if !out.contains(n) => v }.sum
      r = nodes.map { v =>
        val c = out.toSeq.collect {
          case (u, ds) if ds.contains(v) => r(u) / ds.size
        }.sum
        val tele = if (seeds.contains(v)) (0.15 + 0.85 * dang) / seeds.size else 0.0
        v -> (0.85 * c + tele)
      }.toMap
    }
    r.foreach { case (n, v) =>
      assert(math.abs(got(n) - v) < 1e-12, s"node $n: ${got(n)} vs $v")
    }
  }

  test("trainMultinomial: smoothed ratios from exact counts; null label raises") {
    val df = Seq(
      ("en", "cat dog cat"), ("en", "dog"), ("fr", "chat chat")).toDF("lang", "text")
    val got = NaiveBayes.trainMultinomial(df, $"text", $"lang", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    // V = 3 (cat, dog, chat); en tokens = 4, fr tokens = 2
    assert(got(("en", "cat")) == ((2L, 3.0 / 7.0, 2L, 2.0 / 3.0)))
    assert(got(("en", "dog")) == ((2L, 3.0 / 7.0, 2L, 2.0 / 3.0)))
    assert(got(("fr", "chat")) == ((2L, 3.0 / 5.0, 1L, 1.0 / 3.0)))
    val ex = intercept[Exception] {
      NaiveBayes.trainMultinomial(
        Seq((Option.empty[String], "x")).toDF("lang", "text"),
        $"text", $"lang", minCount = 1).collect()
    }
    assert(ex.getMessage.contains("null class label"))
  }

  test("functionalDependency: holding vs violated, null determinants excluded") {
    val df = Seq(
      (Some(1L), "a"), (Some(1L), "a"), (Some(2L), "a"), (Some(2L), "b"),
      (None, "z")).toDF("k", "v")
    val hold = Profiling.functionalDependency(
      df.filter($"k" === 1), "h", $"k", $"v").collect()(0)
    assert(hold.getLong(1) == 1L && hold.getLong(2) == 0L && hold.getLong(3) == 1L)
    val viol = Profiling.functionalDependency(df, "x", $"k", $"v").collect()(0)
    assert(viol.getLong(1) == 2L, "null determinant must not count as an lhs")
    assert(viol.getLong(2) == 1L && viol.getLong(3) == 2L)
  }

  test("eventBigrams: per-entity consecutive pairs in explicit order; support counts") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    val df = Seq(
      (1L, t(1), 10L, "view"), (1L, t(2), 11L, "click"), (1L, t(3), 12L, "buy"),
      (2L, t(1), 20L, "view"), (2L, t(2), 21L, "click")).toDF("u", "ts", "id", "ev")
    val got = Sequences.eventBigrams(df, $"u", Seq($"ts", $"id"), $"ev")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("view", "click")) == ((2L, 2L)))
    assert(got(("click", "buy")) == ((1L, 1L)))
    assert(!got.contains(("buy", "view")), "no pair across entities")
  }

  test("seasonalAnomaly: leave-one-out baseline; a spike flags high without inflating itself") {
    import java.sql.Timestamp
    // weekday bucket = epoch-day mod 7; put 4 same-weekday days at
    // counts 10,10,10,40 — the 40 must flag against baseline 10
    val rows = (0 until 4).flatMap { w =>
      val day = w * 7L // same weekday
      val n = if (w == 3) 40 else 10
      (0 until n).map(i => ("a", new Timestamp((day * 86400L + i) * 1000)))
    }
    val got = Profiling.seasonalAnomaly(rows.toDF("g", "ts"), $"g", $"ts")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got(21L) == ((40L, 10.0, true, false)), s"spike row: ${got(21L)}")
    // a normal day's baseline includes the spike: (10+10+40)/3 = 20;
    // 10 vs 20 sits exactly AT the 0.5x low threshold (60 < 60 fails) —
    // strict inequality keeps the boundary un-flagged
    assert(got(0L)._2 == 20.0 && !got(0L)._3 && !got(0L)._4)
  }
}

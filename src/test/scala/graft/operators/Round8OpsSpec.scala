package graft.operators

import graft.SparkTestBase

/** Round-8 operators: SCD2 dimension build, gains/lift table,
  * exact weighted quantiles.
  */
class Round8OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("Scd2: collapses unchanged runs, tiles the timeline, flags the current version") {
    val log = Seq(
      // key 1: A, A (collapse), B, A — three versions
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "A"),
      (1L, ts(5), 12L, "B"), (1L, ts(9), 13L, "A"),
      // key 2: single observation — one current version
      (2L, ts(3), 20L, "X"))
      .toDF("k", "t", "id", "attr")
    val got = Scd2.fromChangeLog(log, $"k", $"t", $"id", Seq("attr" -> $"attr"))
      .orderBy($"k", $"version")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)),
        r.getInt(3), r.getBoolean(4), r.getString(5)))
    assert(got.toSeq == Seq(
      (1L, ts(1), Some(ts(5)), 1, false, "A"),
      (1L, ts(5), Some(ts(9)), 2, false, "B"),
      (1L, ts(9), None, 3, true, "A"),
      (2L, ts(3), None, 1, true, "X")))
    // versions tile: valid_to of version v == valid_from of v+1
    val byKey = got.groupBy(_._1)
    byKey.values.foreach { vs =>
      vs.sortBy(_._4).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._3.contains(b._2), s"gap/overlap between $a and $b")
        case _ =>
      }
    }
  }

  test("Scd2: same-timestamp ties resolve by the tiebreak column") {
    val log = Seq(
      (1L, ts(1), 2L, "B"), (1L, ts(1), 1L, "A"), (1L, ts(2), 3L, "B"))
      .toDF("k", "t", "id", "attr")
    val got = Scd2.fromChangeLog(log, $"k", $"t", $"id", Seq("attr" -> $"attr"))
      .orderBy($"version").collect().map(r => (r.getInt(3), r.getString(5)))
    // order is A (id 1), B (id 2), B (id 3, collapses): two versions
    assert(got.toSeq == Seq((1, "A"), (2, "B")))
  }

  test("Scd2: a change to null and from null are both changes (null-safe equality)") {
    val log = Seq(
      (1L, ts(1), 1L, Some("A")), (1L, ts(2), 2L, None),
      (1L, ts(3), 3L, None), (1L, ts(4), 4L, Some("A")))
      .toDF("k", "t", "id", "attr")
    val got = Scd2.fromChangeLog(log, $"k", $"t", $"id", Seq("attr" -> $"attr"))
      .orderBy($"version").collect().map(r => (r.getInt(3), Option(r.getString(5))))
    assert(got.toSeq == Seq((1, Some("A")), (2, None), (3, Some("A"))))
  }

  test("Scd2 plan: both window passes share ONE shuffle on the key") {
    val log = Seq((1L, ts(1), 1L, "A"), (1L, ts(2), 2L, "B"))
      .toDF("k", "t", "id", "attr")
    val df = Scd2.fromChangeLog(log, $"k", $"t", $"id", Seq("attr" -> $"attr"))
    df.collect() // finalize the adaptive plan
    // AQE's toString echoes the pre-adaptive plan under "Initial
    // Plan" — assert on the FINAL section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected one key shuffle feeding both window passes, got $exchanges:\n$plan")
  }

  test("Scd2.applyDelta ≡ full rebuild, for every time split; untouched keys pass through") {
    val log = Seq(
      (1L, ts(1), 1L, "A"), (1L, ts(3), 2L, "A"), (1L, ts(5), 3L, "B"),
      (1L, ts(7), 4L, "B"), (1L, ts(9), 5L, "C"),
      (2L, ts(2), 6L, "X"), (2L, ts(8), 7L, "Y"),
      (3L, ts(4), 8L, "Q")) // key 3: old-only, must pass through untouched
      .toDF("k", "t", "id", "attr")
    val full = Scd2.fromChangeLog(log, $"k", $"t", $"id", Seq("attr" -> $"attr"))
      .orderBy($"k", $"version").collect().map(_.toSeq)
    // split at every day boundary: incremental must equal full rebuild
    for (cutDay <- Seq(2, 4, 6, 8, 10)) {
      val cut = ts(cutDay)
      val dim = Scd2.fromChangeLog(
        log.filter($"t" < cut), $"k", $"t", $"id", Seq("attr" -> $"attr"))
      val inc = Scd2.applyDelta(
        dim, log.filter($"t" >= cut), $"k", $"t", $"id", Seq("attr" -> $"attr"))
        .orderBy($"k", $"version").collect().map(_.toSeq)
      assert(inc.toSeq == full.toSeq, s"split at day $cutDay diverged")
    }
  }

  test("Scd2.applyDelta: a delta at or before an existing version fails loudly") {
    val dim = Scd2.fromChangeLog(
      Seq((1L, ts(5), 1L, "A")).toDF("k", "t", "id", "attr"),
      $"k", $"t", $"id", Seq("attr" -> $"attr"))
    val stale = Seq((1L, ts(3), 2L, "B")).toDF("k", "t", "id", "attr")
    val e = intercept[Exception] {
      Scd2.applyDelta(dim, stale, $"k", $"t", $"id", Seq("attr" -> $"attr")).collect()
    }
    assert(e.getMessage.contains("out-of-order backfill") ||
      (e.getCause != null && e.getCause.getMessage.contains("out-of-order backfill")))
  }

  test("gainsTable: a perfectly-separating score concentrates positives in bucket 1") {
    // 16 rows, 4 positives with the 4 highest scores, 8 buckets of 2
    val df = (1 to 16).map(i => (i.toDouble, if (i > 12) 1L else 0L))
      .toDF("s", "y")
    val got = ModelEval.gainsTable(df, $"s", $"y", buckets = 8)
      .orderBy($"bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.length == 8)
    // every bucket holds exactly 2 rows; top two buckets hold all 4 positives
    assert(got.forall(_._2 == 2L))
    assert(got(0) == ((1, 2L, 2L, 2L, 2L, 4.0, 0.5)))
    assert(got(1) == ((2, 2L, 2L, 4L, 4L, 4.0, 1.0)))
    // after all positives are captured, lift decays as 16/cum_n
    assert(got(7)._6 == 1.0 && got(7)._7 == 1.0)
    // monotone: cum_capture never decreases
    assert(got.map(_._7).toSeq.sliding(2).forall { case Seq(a, b) => b >= a; case _ => true })
  }

  test("gainsTable: non-power-of-two buckets and zero positives fail loudly") {
    val df = Seq((1.0, 0L), (2.0, 0L)).toDF("s", "y")
    intercept[IllegalArgumentException] {
      ModelEval.gainsTable(df, $"s", $"y", buckets = 10)
    }
    val e = intercept[Exception] {
      ModelEval.gainsTable(df, $"s", $"y", buckets = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("connectedComponentsFrontier equals pointer-jumping clusters on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.chooseNum(1, 25)
      es <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(1L, 15L); b <- Gen.chooseNum(1L, 15L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.filter(e => e._1 != e._2).distinct
    val prop = Prop.forAll(gen) { es =>
      if (es.isEmpty) true
      else {
        val pairs = es.toDF("id_a", "id_b")
        val viaClusters = Dedup.clusters(pairs)
        val expect = viaClusters.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        viaClusters.unpersist()
        val got = Graph.connectedComponentsFrontier(pairs, $"id_a", $"id_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expect
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("connectedComponentsIncremental equals the full recompute for random graph growth") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges = (n: Int) => Gen.listOfN(n, for {
      a <- Gen.chooseNum(1L, 15L); b <- Gen.chooseNum(1L, 15L)
    } yield (math.min(a, b), math.max(a, b)))
    val gen = for {
      nOld <- Gen.chooseNum(1, 20); nNew <- Gen.chooseNum(1, 10)
      old <- genEdges(nOld); nw <- genEdges(nNew)
    } yield (
      old.filter(e => e._1 != e._2).distinct,
      nw.filter(e => e._1 != e._2).distinct)
    val prop = Prop.forAll(gen) { case (oldEs, newEs) =>
      if (oldEs.isEmpty || newEs.isEmpty) true
      else {
        val all = (oldEs ++ newEs).distinct.toDF("id_a", "id_b")
        val expect = Graph.connectedComponentsFrontier(all, $"id_a", $"id_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val oldLabels = Graph.connectedComponentsFrontier(
          oldEs.toDF("id_a", "id_b"), $"id_a", $"id_b")
        val got = Graph.connectedComponentsIncremental(
          oldLabels, all, newEs.toDF("id_a", "id_b"), $"id_a", $"id_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expect
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("connectedComponentsFrontier: chain converges to min label; disjoint stars stay apart") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val gotChain = Graph.connectedComponentsFrontier(chain, $"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotChain.length == 12 && gotChain.forall(_._2 == 1L))
    val stars = Seq((10L, 11L), (10L, 12L), (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val gotStars = Graph.connectedComponentsFrontier(stars, $"id_a", $"id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotStars == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("Throttle.keepFirstPerTtl matches a per-key reference fold for random histories") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ttlUs = 10L * 1000000L // 10 s
    def refKeep(evs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      // evs: (tUs, id) sorted by (t, id); returns kept
      var last = Long.MinValue
      evs.flatMap { case (t, id) =>
        if (last == Long.MinValue || t - last >= ttlUs) { last = t; Some((t, id)) }
        else None
      }
    }
    val genKey: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(0, 30)
      t <- Gen.listOfN(n, Gen.chooseNum(0L, 100L)) // seconds
    } yield t.zipWithIndex.map { case (sec, i) => (sec * 1000000L, i.toLong) }
      .sortBy(x => (x._1, x._2))
    val prop = Prop.forAll(Gen.listOfN(3, genKey)) { keys =>
      val rows = keys.zipWithIndex.flatMap { case (evs, k) =>
        evs.map { case (t, id) =>
          (k.toLong, new java.sql.Timestamp(t / 1000L), id)
        }
      }
      val expected = keys.zipWithIndex.flatMap { case (evs, k) =>
        refKeep(evs).map { case (t, id) => (k.toLong, t, id) }
      }.toSet
      if (rows.isEmpty) expected.isEmpty
      else {
        val df = rows.toDF("k", "ts", "id")
        val got = Throttle.keepFirstPerTtl(df, $"k", $"ts", $"id", ttlUs)
          .collect().map { r =>
            (r.getLong(0),
              Math.floorDiv(r.getTimestamp(1).getTime, 1000L) * 1000000L +
                r.getTimestamp(1).getNanos / 1000L,
              r.getLong(2))
          }.toSet
        got == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("Throttle: equal-ts events after a kept one are suppressed; re-admission is >= ttl strict") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      (1L, t(0), 1L), (1L, t(0), 2L), // same instant: only the tiebreak-first kept
      (1L, t(9), 3L),                 // 9 s < 10 s ttl: suppressed
      (1L, t(10), 4L),                // exactly ttl: re-admitted
      (1L, t(19), 5L), (1L, t(21), 6L)) // 9 s after kept(10): no; 11 s: yes
      .toDF("k", "ts", "id")
    val got = Throttle.keepFirstPerTtl(df, $"k", $"ts", $"id", 10L * 1000000L)
      .collect().map(_.getLong(2)).sorted
    assert(got.toSeq == Seq(1L, 4L, 6L))
  }

  test("Expectations.audit: NULL predicates count as violations; one row per rule") {
    val df = Seq(
      (Some(5L), "ok"), (None, "ok"), (Some(-1L), null))
      .toDF("v", "s")
    val got = Expectations.audit(df, Seq(
      "v_positive" -> ($"v" > 0L), // null v → violation
      "v_maybe_null" -> ($"v".isNull || $"v" > 0L), // explicit null-ok
      "s_not_null" -> $"s".isNotNull))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "v_positive" -> ((3L, 2L)), // null + negative
      "v_maybe_null" -> ((3L, 1L)), // only the negative
      "s_not_null" -> ((3L, 1L))))
    intercept[IllegalArgumentException] {
      Expectations.audit(df, Seq(
        "a" -> org.apache.spark.sql.functions.lit(true),
        "a" -> org.apache.spark.sql.functions.lit(false)))
    }
  }

  test("streamingKeepFirstPerTtlEventTime: shuffled + late arrivals ≡ batch; state drains") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // NOT epoch 0: an event at ts <= the initial watermark (0) is
    // pre-filtered by the stateful operator's late-row guard
    def t(sec: Long) = new java.sql.Timestamp((1000L + sec) * 1000L)
    val ttl = 10L * 1000000L
    val ordered = Seq(
      Throttle.ThrottleEv(1L, t(0), 1L), Throttle.ThrottleEv(1L, t(5), 2L),
      Throttle.ThrottleEv(1L, t(12), 3L), Throttle.ThrottleEv(1L, t(21), 4L),
      Throttle.ThrottleEv(2L, t(3), 5L), Throttle.ThrottleEv(2L, t(4), 6L))
    val expected = Throttle.keepFirstPerTtl(
      ordered.toDF().select($"k", $"ts", $"tb"), $"k", $"ts", $"tb", ttl)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // batch 1: a shuffled subset missing two events; batch 2: the rest
    // shuffled INCLUDING the two one-batch-late events (ids 2 and 5,
    // inside the 60 s lateness horizon); batch 3: far-future flush
    val late = ordered.filter(e => Set(2L, 5L).contains(e.tb))
    val cutMs = t(5).getTime
    val b1 = scala.util.Random.shuffle(
      ordered.filter(e => e.ts.getTime <= cutMs && !Set(2L, 5L).contains(e.tb)))
    val b2 = scala.util.Random.shuffle(
      ordered.filter(_.ts.getTime > cutMs) ++ late)
    val input = MemoryStream[Throttle.ThrottleEv]
    val q = Throttle.streamingKeepFirstPerTtlEventTime(
      input.toDS(), ttl, delay = "60 seconds")
      .writeStream.format("memory").queryName("throttle_ooo_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(Throttle.ThrottleEv(99L, t(100000), 99L)); q.processAllAvailable()
      val got = spark.table("throttle_ooo_out").as[Throttle.ThrottleEv]
        .collect().map(e => (e.k, e.ts, e.tb)).toSet
      assert(got == expected, s"diverged: got $got expected $expected")
      // only the pending flush event's state row survives
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 1L, s"state store not drained to the sentinel: $stateRows")
    } finally q.stop()
  }

  test("tokenBucket: bursts spend the budget, refill is continuous, burst=1 ≡ keepFirstPerTtl") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ttl = 10L * 1000000L // 10 s per token
    // burst 3: three immediate admits, 4th blocked, refill re-admits
    val df = Seq(
      (1L, t(0), 1L), (1L, t(1), 2L), (1L, t(2), 3L), // 3 admits (burst)
      (1L, t(3), 4L),  // bucket 1s-worth: blocked
      (1L, t(9), 5L),  // bucket 7s-worth: blocked
      (1L, t(13), 6L), // bucket 11s ≥ 10s: admitted
      (1L, t(14), 7L)) // bucket 2s: blocked
      .toDF("k", "ts", "id")
    val got = Throttle.tokenBucket(df, $"k", $"ts", $"id", ttl, burst = 3)
      .collect().map(_.getLong(2)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 6L))

    // burst = 1 degenerates to keepFirstPerTtl on random histories
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      secs <- Gen.listOfN(n, Gen.chooseNum(0L, 100L))
    } yield secs.zipWithIndex.map { case (sc, i) => (sc, i.toLong) }
    val prop = Prop.forAll(gen) { evs =>
      val d = evs.map { case (sec, id) => (7L, t(sec), id) }.toDF("k", "ts", "id")
      val a = Throttle.tokenBucket(d, $"k", $"ts", $"id", ttl, burst = 1)
        .collect().map(_.getLong(2)).toSet
      val b = Throttle.keepFirstPerTtl(d, $"k", $"ts", $"id", ttl)
        .collect().map(_.getLong(2)).toSet
      a == b
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("weightedQuantile: crossing lands on the exact value; ties cannot move it") {
    // group g: values 1 (w=1), 2 (w=2), 3 (w=1): total 4, half 2 →
    // smallest v with cumW ≥ 2 is 2
    val df = Seq(
      ("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
      // group h: heavy tail — w(10)=9 dominates
      ("h", 1.0, 1.0), ("h", 10.0, 9.0))
      .toDF("g", "v", "w")
    val got = WeightedQuantile.weightedQuantile(df, $"g", $"v", $"w", 1, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("g" -> 2.0, "h" -> 10.0))
    // p90 of h: still 10 (9/10 of the weight sits there)
    val p90 = WeightedQuantile.weightedQuantile(df, $"g", $"v", $"w", 9, 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(p90("h") == 10.0 && p90("g") == 3.0)
  }

  test("weightedQuantile: unweighted median agrees with the plain exact median") {
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 11.0, 2.0)
    val df = vals.map(v => ("g", v, 1.0)).toDF("g", "v", "w")
    val got = WeightedQuantile.weightedQuantile(df, $"g", $"v", $"w", 1, 2)
      .collect().head.getDouble(1)
    // ceil(0.5·7) = 4th smallest = 5
    assert(got == 5.0)
    // negative weight fails loudly
    val bad = Seq(("g", 1.0, -1.0)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      WeightedQuantile.weightedQuantile(bad, $"g", $"v", $"w", 1, 2).collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      e.getCause != null)
  }
}

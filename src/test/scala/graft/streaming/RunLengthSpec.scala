package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.streaming.PatternMatch.Ev
import graft.streaming.RunLength.Run

/** RunLength: the declarative batch twin vs a sequential islands
  * fold (property), and the event-time streaming encoder under
  * shuffled + one-batch-late arrival ≡ the batch twin with a fully
  * drained state store (the q261 gate contract).
  */
class RunLengthSpec extends SparkTestBase {
  import spark.implicits._

  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Sequential islands reference: close on value change or gap >
    * idle; the final open run also closes (batch semantics).
    */
  private def refRuns(evs: Seq[(Long, Long, Long, String)], idleUs: Long,
      values: Set[String]): Set[(Long, String, Long, Long, Long)] =
    evs.filter(e => values(e._4)).groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val runs = scala.collection.mutable.ListBuffer.empty[(Long, String, Long, Long, Long)]
      var v: String = null; var start = 0L; var last = 0L; var n = 0L
      for ((_, t, _, et) <- sorted) {
        if (v == null) { v = et; start = t; last = t; n = 1L }
        else if (et == v && t - last <= idleUs) { last = t; n += 1L }
        else { runs += ((u, v, start, last, n)); v = et; start = t; last = t; n = 1L }
      }
      if (v != null) runs += ((u, v, start, last, n))
      runs
    }.toSet

  private val vals = Set("a", "b", "c")

  test("property: encodeBatch equals the sequential islands fold") {
    val genEvents = for {
      n <- Gen.chooseNum(1, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        t <- Gen.chooseNum(1L, 50L)
        et <- Gen.oneOf("a", "b", "c", "noise")
      } yield (u, t, et))
    } yield evs.zipWithIndex.map { case ((u, t, et), i) =>
      (u, t * 1000000L, i.toLong, et)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAll(genEvents, Gen.oneOf(3L, 10L, 100L)) { (evs, idleSec) =>
        val ds = evs.map { case (u, tUs, id, et) =>
          Ev(u, new java.sql.Timestamp(tUs / 1000L), et, id)
        }.toDS()
        val got = RunLength.encodeBatch(ds, vals, idleSec * 1000000L)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
          .toSet
        got == refRuns(evs, idleSec * 1000000L, vals)
      })
    assert(res.passed, res.status.toString)
  }

  test("a same-value repeat past the idle horizon opens a NEW run") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val evs = Seq(
      Ev(1L, t(0), "a", 1), Ev(1L, t(5), "a", 2), // run 1
      Ev(1L, t(200), "a", 3)) // gap 195s > 100s idle — run 2
    val got = RunLength.encodeBatch(evs.toDS(), vals, 100L * 1000000L)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((0L, 5000000L, 2L), (200000000L, 200000000L, 1L)))
  }

  test("encodeEventTime: shuffled + one-batch-late arrivals == batch twin; state drains") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val idleUs = 100L * 1000000L
    val ordered = Seq(
      Ev(1L, t(1), "a", 1), Ev(1L, t(3), "a", 2), // run of 2
      Ev(1L, t(5), "b", 3), // value change
      Ev(1L, t(200), "b", 4), // same value, gap > idle — new run
      Ev(2L, t(4), "c", 5), Ev(2L, t(50), "c", 6), // spans the batch cut
      Ev(2L, t(60), "a", 7),
      Ev(3L, t(2), "noise", 8), // filtered before buffering
      Ev(3L, t(9), "a", 9))
    val expected = RunLength.encodeBatch(ordered.toDS(), vals, idleUs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(expected.size == 6)

    val late = ordered.filter(e => Set(2L, 5L).contains(e.event_id))
    val batch1 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) <= 9000000L && !Set(2L, 5L).contains(e.event_id)))
    val batch2 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) > 9000000L) ++ late)
    val sentinel = Ev(999L, t(100000), "flush", 99)

    val input = MemoryStream[Ev]
    val q = RunLength.encodeEventTime(input.toDS(), vals, idleUs, delay = "60 seconds")
      .writeStream.format("memory").queryName("rle_ooo_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("rle_ooo_out").as[Run]
        .collect().map(r => (r.user_id, r.value, r.start_us, r.end_us, r.n)).toSet
      assert(got == expected, s"out-of-order stream diverged: got $got")
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 0L, s"state store not drained: $stateRows rows")
    } finally q.stop()
  }

  test("advance: pure fold closes on change and gap, keeps the open run") {
    import RunLength.{advance, RlCore}
    val (c1, out1) = advance(RlCore(null, 0, 0, 0),
      Seq((10L, "a"), (20L, "a"), (30L, "b")), 100L)
    assert(out1 == Seq(("a", 10L, 20L, 2L)))
    assert(c1 == RlCore("b", 30L, 30L, 1L))
    val (c2, out2) = advance(c1, Seq((200L, "b")), 100L)
    assert(out2 == Seq(("b", 30L, 30L, 1L))) // gap 170 > 100
    assert(c2 == RlCore("b", 200L, 200L, 1L))
  }
}

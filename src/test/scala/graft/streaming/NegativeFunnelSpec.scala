package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.streaming.NegativeFunnel.NfMatch
import graft.streaming.PatternMatch.Ev

/** NegativeFunnel: the batch twin vs a sequential reference fold
  * (property), and the event-time streaming variant under shuffled +
  * one-batch-late arrival ≡ the batch twin, with a fully drained
  * state store (the q243 gate contract).
  */
class NegativeFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  // sequential reference: last-A arms, blocker poisons, valid B
  // consumes
  private def ref(evs: Seq[(Long, Long, Long, String)], winUs: Long)
      : Set[(Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var aT = -1L; var poisoned = false
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      for ((_, t, _, et) <- sorted) et match {
        case "A" => aT = t; poisoned = false
        case "C" => if (aT >= 0) poisoned = true
        case "B" =>
          if (aT >= 0 && !poisoned && t - aT <= winUs) { out += ((u, aT, t)); aT = -1 }
        case _ =>
      }
      out
    }.toSet

  test("property: detectBatch equals the sequential consumption fold") {
    val genEvents = for {
      n <- Gen.chooseNum(1, 50)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        t <- Gen.chooseNum(1L, 40L)
        et <- Gen.oneOf("A", "B", "C", "noise")
      } yield (u, t, et))
    } yield evs.zipWithIndex.map { case ((u, t, et), i) =>
      (u, t * 1000000L, i.toLong, et)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAll(genEvents, Gen.oneOf(5L, 15L, 100L)) { (evs, winSec) =>
        val ds = evs.map { case (u, tUs, id, et) =>
          Ev(u, new java.sql.Timestamp(tUs / 1000L), et, id)
        }.toDS()
        val got = NegativeFunnel.detectBatch(ds, "A", "B", "C", winSec * 1000000L)
          .collect().map(m => (m.user_id, m.a_us, m.b_us)).toSet
        got == ref(evs, winSec * 1000000L)
      })
    assert(res.passed, res.status.toString)
  }

  test("detectEventTime: shuffled + one-batch-late arrivals == batch twin; state drains") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val winUs = 100L * 1000000L
    val ordered = Seq(
      Ev(1L, t(1), "view", 1), Ev(1L, t(3), "purchase", 2), // clean match
      Ev(1L, t(5), "view", 3), Ev(1L, t(6), "error", 4),
      Ev(1L, t(7), "purchase", 5), // poisoned — no match
      Ev(2L, t(4), "view", 6), // spans the batch cut...
      Ev(2L, t(50), "purchase", 7), // ...completes in batch 2
      Ev(2L, t(60), "view", 8), Ev(2L, t(200), "purchase", 9), // beyond window
      Ev(3L, t(2), "error", 10), Ev(3L, t(5), "view", 11),
      Ev(3L, t(8), "purchase", 12)) // error BEFORE the view: still a match
    val expected = NegativeFunnel
      .detectBatch(ordered.toDS(), "view", "purchase", "error", winUs)
      .collect().map(m => (m.user_id, m.a_us, m.b_us)).toSet
    assert(expected == Set((1L, 1000000L, 3000000L), (2L, 4000000L, 50000000L),
      (3L, 5000000L, 8000000L)))

    val late = ordered.filter(e => Set(2L, 6L).contains(e.event_id))
    val batch1 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) <= 8000000L && !Set(2L, 6L).contains(e.event_id)))
    val batch2 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) > 8000000L) ++ late)
    val sentinel = Ev(999L, t(10000), "flush", 99)

    val input = MemoryStream[Ev]
    val q = NegativeFunnel
      .detectEventTime(input.toDS(), "view", "purchase", "error", winUs,
        delay = "60 seconds")
      .writeStream.format("memory").queryName("nf_ooo_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("nf_ooo_out").as[NfMatch]
        .collect().map(m => (m.user_id, m.a_us, m.b_us)).toSet
      assert(got == expected, s"out-of-order stream diverged: got $got")
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 0L, s"state store not drained: $stateRows rows")
    } finally q.stop()
  }
}

package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.streaming.Cusum.{CuAlert, CuEv}

/** Cusum: the batch twin vs the textbook max(0, S + x) recursion
  * (property — also proves the R − min-prefix closed form the SQL
  * oracle uses), and the event-time streaming variant under shuffled
  * + one-batch-late arrival ≡ the batch twin with scalar state rows
  * only — the q345 gate contract.
  */
class CusumSpec extends SparkTestBase {
  import spark.implicits._

  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Textbook recursion: S = max(0, S + (v − k)); alert on crossing
    * h from below.
    */
  private def ref(evs: Seq[(String, Long, Long, Long)], k: Long, h: Long)
      : Set[(String, Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (key, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var s = 0L
      val out = scala.collection.mutable.ListBuffer
        .empty[(String, Long, Long, Long)]
      for ((_, t, id, v) <- sorted) {
        val sPrev = s
        s = math.max(0L, s + (v - k))
        if (sPrev < h && s >= h) out += ((key, t, id, s))
      }
      out
    }.toSet

  test("property: detectBatch equals the textbook max(0, S + x) recursion") {
    val genEvents = for {
      n <- Gen.chooseNum(1, 60)
      evs <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b")
        t <- Gen.chooseNum(1L, 40L)
        v <- Gen.chooseNum(0L, 12L)
      } yield (k, t, v))
    } yield evs.zipWithIndex.map { case ((k, t, v), i) =>
      (k, t * 1000000L, i.toLong, v)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAll(genEvents) { evs =>
        val ds = evs.map { case (k, tUs, id, v) =>
          CuEv(k, new java.sql.Timestamp(tUs / 1000L), id, v)
        }.toDS()
        val got = Cusum.detectBatch(ds, allowance = 5L, threshold = 9L)
          .collect().map(a => (a.key, a.alert_us, a.event_id, a.cusum_cents))
          .toSet
        got == ref(evs, 5L, 9L)
      })
    assert(res.passed, res.status.toString)
  }

  test("detectBatch: non-positive threshold raises") {
    val ds = Seq(CuEv("a", new java.sql.Timestamp(1000L), 1L, 5L)).toDS()
    intercept[IllegalArgumentException] {
      Cusum.detectBatch(ds, allowance = 1L, threshold = 0L)
    }
  }

  test("detectEventTime: shuffled + one-batch-late arrivals == batch twin; scalar state only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // k = 5, h = 9: S walks 0→5→10(alert)→5→10(alert after dip? no —
    // crossing needs sPrev < 9) … the late event 3 changes WHICH
    // event crosses, so ordering is load-bearing
    val ordered = Seq(
      CuEv("a", t(1), 1, 10),  // S=5
      CuEv("a", t(3), 2, 9),   // S=9  — crosses (alert)
      CuEv("a", t(5), 3, 1),   // S=5  — dips below h
      CuEv("a", t(50), 4, 8),  // S=8
      CuEv("a", t(60), 5, 7),  // S=10 — re-crosses (alert)
      CuEv("b", t(2), 6, 20),  // S=15 — crosses (alert)
      CuEv("b", t(7), 7, 0),   // S=10
      CuEv("b", t(55), 8, 1))  // S=6
    val expected = Cusum.detectBatch(ordered.toDS(), 5L, 9L)
      .collect().map(a => (a.key, a.alert_us, a.event_id, a.cusum_cents)).toSet
    assert(expected.size == 3, s"fixture should alert 3 times: $expected")

    val late = ordered.filter(e => Set(2L, 7L).contains(e.event_id))
    val batch1 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) <= 8000000L &&
        !Set(2L, 7L).contains(e.event_id)))
    val batch2 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) > 8000000L) ++ late)
    val sentinel = CuEv("__flush__", t(10000), 99, 0)

    val input = MemoryStream[CuEv]
    val q = Cusum.detectEventTime(input.toDS(), allowance = 5L,
      threshold = 9L, delay = "60 seconds")
      .writeStream.format("memory").queryName("cusum_ooo_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("cusum_ooo_out").as[CuAlert]
        .filter(_.key != "__flush__")
        .collect().map(a => (a.key, a.alert_us, a.event_id, a.cusum_cents))
        .toSet
      assert(got == expected, s"out-of-order stream diverged: got $got")
      // 2 real keys + sentinel, one scalar row each, buffers drained
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 3L, s"expected 3 scalar state rows, got $stateRows")
    } finally q.stop()
  }
}

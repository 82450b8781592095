package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.streaming.HighWater.{HwAlert, HwEv}

/** HighWater: the batch twin vs a sequential running-max fold
  * (property), and the event-time streaming variant under shuffled +
  * one-batch-late arrival ≡ the batch twin, with exactly one scalar
  * state row per key (buffers drained) — the q306 gate contract.
  */
class HighWaterSpec extends SparkTestBase {
  import spark.implicits._

  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def ref(evs: Seq[(String, Long, Long, Long)])
      : Set[(String, Long, Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var hwm = -1L
      val out = scala.collection.mutable.ListBuffer
        .empty[(String, Long, Long, Long, Long)]
      for ((_, t, id, p) <- sorted)
        if (p > hwm) { out += ((k, t, id, p, hwm)); hwm = p }
      out
    }.toSet

  test("property: detectBatch equals the sequential running-max fold") {
    val genEvents = for {
      n <- Gen.chooseNum(1, 50)
      evs <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b")
        t <- Gen.chooseNum(1L, 40L)
        p <- Gen.chooseNum(0L, 9L)
      } yield (k, t, p))
    } yield evs.zipWithIndex.map { case ((k, t, p), i) =>
      (k, t * 1000000L, i.toLong, p)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAll(genEvents) { evs =>
        val ds = evs.map { case (k, tUs, id, p) =>
          HwEv(k, new java.sql.Timestamp(tUs / 1000L), id, p)
        }.toDS()
        val got = HighWater.detectBatch(ds)
          .collect().map(a =>
            (a.key, a.alert_us, a.event_id, a.price_cents, a.prev_max_cents))
          .toSet
        got == ref(evs)
      })
    assert(res.passed, res.status.toString)
  }

  test("detectBatch: negative price raises") {
    val ds = Seq(HwEv("a", new java.sql.Timestamp(1000L), 1L, -5L)).toDS()
    val e = intercept[Exception] { HighWater.detectBatch(ds).collect() }
    assert(e.getMessage != null)
  }

  test("detectEventTime: shuffled + one-batch-late arrivals == batch twin; one state row per key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ordered = Seq(
      HwEv("a", t(1), 1, 50),  // first — alerts (prev -1)
      HwEv("a", t(3), 2, 40),  // below — silent
      HwEv("a", t(5), 3, 70),  // new high — alerts (prev 50)
      HwEv("a", t(50), 4, 70), // tie — silent
      HwEv("a", t(60), 5, 90), // new high — alerts (prev 70)
      HwEv("b", t(2), 6, 10),  // first — alerts
      // late LOWER high arriving a batch late must still alert,
      // because in event time it precedes the higher one:
      HwEv("b", t(7), 7, 20),
      HwEv("b", t(55), 8, 30))
    val expected = HighWater.detectBatch(ordered.toDS())
      .collect().map(a =>
        (a.key, a.alert_us, a.event_id, a.price_cents, a.prev_max_cents)).toSet
    assert(expected.size == 6 &&
      expected.contains(("b", 7000000L, 7L, 20L, 10L)))

    val late = ordered.filter(e => Set(3L, 7L).contains(e.event_id))
    val batch1 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) <= 8000000L &&
        !Set(3L, 7L).contains(e.event_id)))
    val batch2 = scala.util.Random.shuffle(
      ordered.filter(e => micros(e.ts) > 8000000L) ++ late)
    val sentinel = HwEv("__flush__", t(10000), 99, 0)

    val input = MemoryStream[HwEv]
    val q = HighWater.detectEventTime(input.toDS(), delay = "60 seconds")
      .writeStream.format("memory").queryName("hwm_ooo_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("hwm_ooo_out").as[HwAlert]
        .filter(_.key != "__flush__")
        .collect().map(a =>
          (a.key, a.alert_us, a.event_id, a.price_cents, a.prev_max_cents))
        .toSet
      assert(got == expected, s"out-of-order stream diverged: got $got")
      // 2 real keys + sentinel, one scalar row each, buffers drained
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 3L, s"expected 3 scalar state rows, got $stateRows")
    } finally q.stop()
  }
}

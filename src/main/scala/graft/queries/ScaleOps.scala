package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Scale-shape operators under the gate: the bloom-pre-filtered join,
  * count-min mergeable frequency states (batch AND incrementally
  * maintained under a real micro-batch stream), and the sliding-window
  * variant of the event aggregation (q18 is tumbling-only).
  */
object ScaleOps {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  val all: Seq[Q] = Seq(

    // ---- bloom-pre-filtered semi join: lineitem rows for high-value
    // orders (~6% selectivity at this threshold). The bloom filter
    // built over the qualifying order keys drops non-matching lineitem
    // rows map-side BEFORE the join exchange; the exact semi join that
    // follows removes bloom false positives, so the result is
    // bit-identical to the plain semi join the oracle runs.
    Q(
      "q76_bloom_semi_join",
      (s, d) => {
        import s.implicits._
        graft.operators.BloomJoin.bloomSemiJoin(
          Tables.lineitem(s, d),
          Tables.orders(s, d).where($"o_totalprice" > 470000.0),
          bigKey = $"l_orderkey", smallKey = $"o_orderkey")
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem l
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 470000)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- count-min mergeable frequency states: per-event-type CMS
    // states over user ids, union-merged into one corpus sketch, then
    // point estimates for a fixed key list (incl. an absent key, whose
    // estimate is pure collision mass). The md5 bucketing is the
    // engine-portable idiom, so DuckDB replays every counter and the
    // min-over-rows estimate EXACTLY — a deterministic hash-match gate
    // on a probabilistic data structure.
    Q(
      "q77_cms_point_estimates",
      (s, d) => {
        import s.implicits._
        val states = graft.operators.CountMin.cmsStates(
          Tables.events(s, d), $"user_id", Seq("event_type"), w = 64, d = 4)
        val merged = graft.operators.CountMin.cmsMergeStates(states, $"cms", w = 64, d = 4)
        graft.operators.CountMin.cmsPointEstimates(
          merged, $"cms", Seq("0", "12345", "149", "42", "77"), w = 64, d = 4)
          .orderBy($"key")
      },
      Some("""WITH tok AS (SELECT CAST(user_id AS VARCHAR) AS t FROM events
             |  WHERE user_id IS NOT NULL),
             |jj AS (SELECT unnest(range(0, 4)) AS j),
             |cnt AS (SELECT j,
             |    CAST(('0x' || substring(md5(t || '|' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b,
             |    count(*) AS c
             |  FROM tok CROSS JOIN jj GROUP BY 1, 2),
             |keys AS (SELECT unnest(['0', '12345', '149', '42', '77']) AS k),
             |kb AS (SELECT k, j,
             |    CAST(('0x' || substring(md5(k || '|' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b
             |  FROM keys CROSS JOIN jj)
             |SELECT kb.k AS key, min(coalesce(cnt.c, 0)) AS est
             |FROM kb LEFT JOIN cnt ON cnt.j = kb.j AND cnt.b = kb.b
             |GROUP BY kb.k ORDER BY key""".stripMargin)),

    // ---- SLIDING-window event aggregation (10-minute windows every 5
    // minutes — each event lands in exactly two windows). Same
    // exact-sum idiom as q18 (decimal-sum, double output); the oracle
    // derives both containing window starts per event from the
    // epoch-aligned 5-minute bucket.
    Q(
      "q78_sliding_window_agg",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
          .orderBy($"window_start", $"event_type")
      },
      Some("""WITH e AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS s1,
             |    event_type, value FROM events),
             |w AS (SELECT unnest([s1, s1 - INTERVAL '5 minutes']) AS window_start,
             |    event_type, value FROM e)
             |SELECT window_start, event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // ---- deterministic uniform k-per-source sample: exactly min(k, n)
    // docs per source chosen by content-hash order — no RNG, no per-key
    // window sort (bounded top-k aggregator under the hood). The oracle
    // IS the row_number window plan the operator replaces.
    Q(
      "q79_uniform_per_source",
      (s, d) => {
        import s.implicits._
        graft.operators.Sampling.uniformKPerKey(
          Tables.documents(s, d),
          key = $"source", hashOn = $"text", id = $"doc_id", k = 7)
          .select($"doc_id", $"lang", $"source")
          .orderBy($"doc_id")
      },
      Some("""WITH r AS (SELECT doc_id, lang, source, row_number() OVER (
             |    PARTITION BY source ORDER BY
             |      CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) DESC,
             |      doc_id ASC) AS rn
             |  FROM documents)
             |SELECT doc_id, lang, source FROM r WHERE rn <= 7
             |ORDER BY doc_id""".stripMargin)),

    // ---- STREAMING CMS: the same counters as a batch build, but
    // maintained incrementally — readStream over a multi-file copy of
    // events (maxFilesPerTrigger=1 forces ≥ 2 real micro-batches),
    // per-batch states union-merged in foreachBatch. Because CMS merge
    // is exactly associative/commutative, the streamed counters equal
    // the batch counters bit-for-bit, and the SAME deterministic md5
    // oracle gates the estimates. Driver state is one d·w array —
    // bounded regardless of stream length (the incremental-analytics
    // contract of the q70 HLL states, now under a live stream).
    Q(
      "q80_streaming_cms",
      (s, d) => streamingCms(s, d),
      Some("""WITH tok AS (SELECT CAST(user_id AS VARCHAR) AS t FROM events
             |  WHERE user_id IS NOT NULL),
             |jj AS (SELECT unnest(range(0, 4)) AS j),
             |cnt AS (SELECT j,
             |    CAST(('0x' || substring(md5(t || '|' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b,
             |    count(*) AS c
             |  FROM tok CROSS JOIN jj GROUP BY 1, 2),
             |keys AS (SELECT unnest(['1', '100', '12345', '5', '73']) AS k),
             |kb AS (SELECT k, j,
             |    CAST(('0x' || substring(md5(k || '|' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b
             |  FROM keys CROSS JOIN jj)
             |SELECT kb.k AS key, min(coalesce(cnt.c, 0)) AS est
             |FROM kb LEFT JOIN cnt ON cnt.j = kb.j AND cnt.b = kb.b
             |GROUP BY kb.k ORDER BY key""".stripMargin)),

    // ---- Z-order clustering key: Morton-interleave (l_partkey,
    // l_suppkey) and sort by it — the write-time layout step that keeps
    // row-group min/max tight on BOTH columns so conjunctive predicates
    // skip data a 1-d sort cannot (pruning property spec-asserted; this
    // query gates the key arithmetic bit-for-bit). 16 bits/column
    // covers the gate SFs; production quantizes first (e.g.
    // graft_searchsorted bin indices).
    Q(
      "q81_zorder_key",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber",
            graft.functions.GraftFunctions.zorderKey(
              s, 16, Seq($"l_partkey", $"l_suppkey")).as("zkey"))
          .orderBy($"zkey", $"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST((SELECT sum(((l_partkey >> i) & 1) << (2 * i))
             |             + sum(((l_suppkey >> i) & 1) << (2 * i + 1))
             |        FROM range(0, 16) t(i)) AS BIGINT) AS zkey
             |FROM lineitem
             |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin)),
  )

  private val cmsKeys = Seq("1", "100", "12345", "5", "73")

  private def streamingCms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (w, dep) = (64, 4)
    val scratch = Scratch.tempDir("q80_cms")
    try {
      // stage a 4-file projection of events (drops the nanos ts column,
      // so the stream needs no legacy-conf flip); input and checkpoint
      // are siblings — the checkpoint must never sit in the listed dir
      val inDir = scratch.resolve("input").toString
      Tables.events(s, d).select($"user_id", $"event_type")
        .repartition(4).write.parquet(inDir)
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_type", StringType)))
      val merged = new Array[Long](w * dep)
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      val lock = new Object
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // one global CMS state per batch: a single d·w row collects
          val rows = graft.operators.CountMin.cmsStates(
            batch, col("user_id"), Seq.empty, w, dep).collect()
          lock.synchronized {
            rows.foreach { r =>
              var i = 0
              r.getSeq[Long](0).foreach { c => merged(i) += c; i += 1 }
            }
          }
          nBatches.incrementAndGet(): Unit
        }
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(600000),
        "q80 stream did not terminate within 600s — refusing a partial sketch")
      finally q.stop()
      // the multi-batch merge must actually have been exercised — one
      // giant batch would silently degrade this to the batch query
      require(nBatches.get() >= 2,
        s"q80 ran ${nBatches.get()} micro-batch(es); the incremental-merge " +
          "path needs at least 2")
      val state = lock.synchronized(Seq(merged.toSeq)).toDF("cms")
      graft.operators.CountMin.cmsPointEstimates(state, $"cms", cmsKeys, w, dep)
        .orderBy($"key")
    } finally Scratch.deleteRecursively(scratch)
  }
}

package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Second slice of SURVEY.md §2 coverage: distinct, window functions,
  * semi/anti joins, set ops, JSON extraction (F7/S11), nested-struct
  * access (F4), array ops (F1/F5), parameterized predicates (P5), and
  * event-time windowed aggregation — including one query that runs a
  * REAL Structured Streaming job and must match DuckDB's batch answer
  * (stream/batch parity is the streaming correctness oracle).
  */
object Relational2 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  val all: Seq[Q] = Seq(

    Q(
      "q09_distinct",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderstatus", $"o_orderpriority")
          .distinct()
          .orderBy($"o_orderstatus", $"o_orderpriority")
      },
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // ---- window functions: ranking + running aggregate. Unique order
    // key (shipdate, orderkey, linenumber) makes the running double sum
    // a fixed-order left fold — deterministic in both engines.
    Q(
      "q10_window_rank_running",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        Tables.lineitem(s, d)
          .filter($"l_suppkey" < 50)
          .select(
            $"l_suppkey", $"l_orderkey", $"l_linenumber",
            row_number().over(w).as("rn"),
            sum(dec($"l_quantity")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_qty"))
          .orderBy($"l_suppkey", $"rn")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  CAST(row_number() OVER w AS INT) AS rn,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER
             |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
             |FROM lineitem WHERE l_suppkey < 50
             |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
             |ORDER BY l_suppkey, rn""".stripMargin),
      bench = true),

    // ---- left-semi: customers having at least one urgent order.
    Q(
      "q11_semi_join",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
        Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- left-anti: customers with no orders at all.
    Q(
      "q12_anti_join",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- set op: union of two filtered key sets.
    Q(
      "q13_union",
      (s, d) => {
        import s.implicits._
        val a = Tables.customer(s, d).filter($"c_acctbal" > 9900)
          .select($"c_custkey".as("key"), lit("high_balance").as("tag"))
        val b = Tables.customer(s, d).filter($"c_mktsegment" === "MACHINERY")
          .select($"c_custkey".as("key"), lit("machinery").as("tag"))
        a.union(b).orderBy($"key", $"tag")
      },
      Some("""SELECT c_custkey AS key, 'high_balance' AS tag FROM customer WHERE c_acctbal > 9900
             |UNION ALL
             |SELECT c_custkey AS key, 'machinery' AS tag FROM customer WHERE c_mktsegment = 'MACHINERY'
             |ORDER BY key, tag""".stripMargin)),

    // ---- F7/S11: JSON payload parse (the demo re-parses bronze
    // json_payload; here over the events.props JSON column).
    Q(
      "q14_json_extract",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(
            $"event_id",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .filter($"k" > 50)
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
             |ORDER BY event_id""".stripMargin)),

    // ---- P5: parameterized predicate (engine-API argument binding, the
    // getArgument() analog).
    Q(
      "q15_param_filter",
      (s, d) => paramFilter(s, d, segment = "AUTOMOBILE", minBalance = 5000.0),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal >= 5000.0
             |ORDER BY c_custkey""".stripMargin)),

    // ---- F4: build a nested struct, then extract by dot path (the CMS
    // tin.type/tin.value pattern); oracle compares the flattened result.
    Q(
      "q16_nested_struct",
      (s, d) => {
        import s.implicits._
        Tables.supplier(s, d)
          .select(
            $"s_suppkey",
            struct(
              struct($"s_name".as("name"), $"s_acctbal".as("balance")).as("info"),
              $"s_nationkey".as("nation")).as("payload"))
          .select(
            $"s_suppkey",
            $"payload.info.name".as("name"),
            $"payload.info.balance".as("balance"),
            $"payload.nation".as("nation"))
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name AS name, s_acctbal AS balance, s_nationkey AS nation
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // ---- F1/F5: split → explode → element_at (LATERAL VIEW pattern).
    Q(
      "q17_explode_array",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .filter($"p_partkey" < 500)
          .select(
            $"p_partkey",
            element_at(split($"p_type", " "), 1).as("first_word"),
            posexplode(split($"p_type", " ")).as(Seq("pos", "word")))
          .select($"p_partkey", $"first_word", $"pos", $"word")
          .orderBy($"p_partkey", $"pos")
      },
      Some("""SELECT p_partkey, string_split(p_type, ' ')[1] AS first_word,
             |  CAST(u.pos - 1 AS INT) AS pos, u.word
             |FROM part,
             |  LATERAL (SELECT unnest(string_split(p_type, ' ')) AS word,
             |           generate_subscripts(string_split(p_type, ' '), 1) AS pos) u
             |WHERE p_partkey < 500
             |ORDER BY p_partkey, pos""".stripMargin)),

    // ---- T-family: tumbling event-time window aggregation (batch).
    Q(
      "q18_event_window_agg",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(
            window($"ts", "5 minutes").as("w"),
            $"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
          .orderBy($"window_start", $"event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      bench = true),

    // ---- Structured Streaming end-to-end: the SAME windowed
    // aggregation through readStream → watermark → writeStream(memory),
    // run to completion with AvailableNow, compared against DuckDB's
    // batch answer — stream/batch parity as the streaming oracle.
    Q(
      "q19_streaming_window_agg",
      (s, d) => streamingWindowAgg(s, d),
      Some("""SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))
  )

  /** Distinct aggregation and hierarchical (rollup) aggregation. */
  val aggQueries: Seq[Q] = Seq(
    Q(
      "q39_count_distinct",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_partkey").as("n_parts"),
            countDistinct($"l_suppkey").as("n_suppliers"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q(
      "q41_percentiles",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_extendedprice, 0.5)").as("p50"),
            expr("percentile(l_extendedprice, array(0.25, 0.75))").as("p25_75"),
            max($"l_extendedprice").as("pmax"))
          .select(
            $"l_returnflag", $"p50",
            element_at($"p25_75", 1).as("p25"),
            element_at($"p25_75", 2).as("p75"),
            $"pmax")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_extendedprice, 0.5) AS p50,
             |  quantile_cont(l_extendedprice, 0.25) AS p25,
             |  quantile_cont(l_extendedprice, 0.75) AS p75,
             |  max(l_extendedprice) AS pmax
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q(
      "q40_rollup",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("total"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // APPROXIMATE sketches — HLL++ distinct counts and quantile-sketch
    // percentiles, the constant-memory map-side summaries a 100 TB
    // pipeline uses where exact distinct/percentile would shuffle the
    // full column. Tolerance oracle (the soundness pattern): DuckDB
    // reads the emitted values back, computes the EXACT statistics, and
    // admits the row only within the sketches' error envelopes (HLL++
    // default rsd 0.05 → 10% with margin; percentile_approx accuracy
    // 1000 → rank error ≤ 0.001, gated at quantile ±0.05 rank); any
    // violation yields the poison row → red.
    Q(
      "q45_approx_sketches",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d).agg(
          approx_count_distinct($"user_id").as("approx_users"),
          approx_count_distinct($"event_type").as("approx_types"),
          percentile_approx($"value", lit(0.5), lit(1000)).as("p50_value"),
          percentile_approx($"value", lit(0.95), lit(1000)).as("p95_value"))
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q45_approx_sketches/*.parquet')),
             |exact AS (SELECT
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             |    CAST(count(DISTINCT event_type) AS BIGINT) AS types,
             |    quantile_cont(value, 0.45) AS p45, quantile_cont(value, 0.55) AS p55,
             |    quantile_cont(value, 0.90) AS p90, quantile_cont(value, 0.99) AS p99
             |  FROM events),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = 1
             |    AND abs((SELECT approx_users FROM emitted) - (SELECT users FROM exact))
             |      <= greatest(0.1 * (SELECT users FROM exact), 1)
             |    AND abs((SELECT approx_types FROM emitted) - (SELECT types FROM exact))
             |      <= greatest(0.1 * (SELECT types FROM exact), 1)
             |    AND (SELECT p50_value FROM emitted)
             |      BETWEEN (SELECT p45 FROM exact) AND (SELECT p55 FROM exact)
             |    AND (SELECT p95_value FROM emitted)
             |      BETWEEN (SELECT p90 FROM exact) AND (SELECT p99 FROM exact)
             |  ) AS ok)
             |SELECT approx_users, approx_types, p50_value, p95_value FROM emitted
             |WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT) AS approx_users, CAST(-1 AS BIGINT) AS approx_types,
             |  CAST(-999 AS DOUBLE) AS p50_value, CAST(-999 AS DOUBLE) AS p95_value
             |WHERE NOT (SELECT ok FROM flag)""".stripMargin))
  )

  /** Gap-based sessionization (batch formulation; the streaming
    * `flatMapGroupsWithState` twin lives in graft.streaming.Sessionize
    * and is equivalence-tested against this in SessionizeSpec).
    */
  val sessionQueries: Seq[Q] = Seq(
    Q(
      "q36_sessionize",
      (s, d) => {
        import s.implicits._
        graft.streaming.Sessionize.batch(Tables.events(s, d), gapMinutes = 10)
          .orderBy($"user_id", $"session_start")
      },
      Some("""WITH e AS (
             |  SELECT user_id, ts, value,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value) AS prev_ts
             |  FROM events),
             |m AS (SELECT *, CASE WHEN prev_ts IS NULL
             |    OR epoch_us(ts) - epoch_us(prev_ts) > 600000000 THEN 1 ELSE 0 END AS ns FROM e),
             |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, value
             |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
             |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             |  CAST(count(*) AS INT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
      bench = true),

    Q(
      "q37_text_clean",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(
          $"doc_id",
          trim(regexp_replace(
            regexp_replace(
              regexp_replace($"text", "https?://\\S+", ""),
              "[\\w.+-]+@[\\w.-]+", ""),
            "\\s+", " ")).as("clean"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(
             |    regexp_replace(
             |      regexp_replace(text, 'https?://\S+', '', 'g'),
             |      '[\w.+-]+@[\w.-]+', '', 'g'),
             |    '\s+', ' ', 'g')) AS clean
             |FROM documents ORDER BY doc_id""".stripMargin))
  )

  /** P5 parameterized query as a plain Scala function — literal binding
    * at plan build time (Catalyst constant-folds it into the scan
    * filter), the engine-API analog of the notebook's getArgument().
    */
  def paramFilter(s: SparkSession, d: String, segment: String, minBalance: Double) = {
    import s.implicits._
    Tables.customer(s, d)
      .filter($"c_mktsegment" === segment && $"c_acctbal" >= minBalance)
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** Runs a real micro-batch streaming query over the events parquet and
    * returns the final result table (complete mode: every window emitted
    * at end-of-stream, so the result equals the batch answer).
    */
  def streamingWindowAgg(s: SparkSession, d: String) = {
    import s.implicits._
    // read with the RAW on-disk schema (ts = nanos-as-long), convert
    // after. The legacy conf flip is SCOPED: the previous value is
    // restored once the stream terminates — a library function must not
    // leave session state mutated behind the caller's back.
    // the file stream source wants a DIRECTORY — stage the single
    // parquet file behind a symlink, removed after the run. Temp-dir
    // creation happens BEFORE the conf flip: a failure here must not
    // leave the legacy flag set with no restoring finally in place.
    // Scratch space (staging + checkpoint) lives on RAM-backed tmpfs
    // where available — see [[Scratch]] for why this matters on a
    // slow-disk host. Input and checkpoint are siblings: the checkpoint
    // must never sit where the file-stream source lists input.
    val scratch = Scratch.tempDir("q19_events")
    val dir = scratch.resolve("input")
    java.nio.file.Files.createDirectory(dir)
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(confKey)
    s.conf.set(confKey, "true")
    try {
      val rawSchema = Tables.eventsRawSchema(s, d)
      // absolute target (a relative sf-dir would dangle from the
      // staging dir); handles file- AND directory-shaped tables (see
      // stageTableLinks — a directory symlink yields zero input
      // files). No per-trigger limit is set, so AvailableNow takes
      // every staged part in batch 0 and the watermark cannot drop
      // rows across batches.
      Scratch.stageTableLinks(dir,
        java.nio.file.Paths.get(d).toAbsolutePath.resolve("events.parquet"))
      val name = "q19_stream_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // the memory-sink view drops in a finally — a failed/timed-out
      // stream must not leak its rows into the session for the
      // session's lifetime
      try {
        val q = s.readStream.schema(rawSchema).parquet(dir.toString)
          .withColumn("ts", Tables.normalizedEventsTs(rawSchema("ts").dataType))
          .withWatermark("ts", "1 hour")
          .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"))
          .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
          .writeStream
          .outputMode("complete")
          .format("memory").queryName(name)
          .option("checkpointLocation", scratch.resolve("_ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        // stop() on the failure path too — a hung stream must not keep
        // running (and holding its memory sink) after the timeout
        // propagates; stop() after normal termination is a no-op
        try require(q.awaitTermination(600000),
          "q19 stream did not terminate within 600s — refusing to return a partial result")
        finally q.stop()
        // materialize the result locally (the memory-sink table would
        // otherwise pin a full result copy in driver memory)
        // bounded: the windowed aggregate — one row per (window, type)
        val result = s.table(name).orderBy($"window_start", $"event_type")
        val schema = result.schema
        val rows = result.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
          .orderBy($"window_start", $"event_type")
      } finally s.catalog.dropTempView(name)
    } finally {
      prev match {
        case Some(v) => s.conf.set(confKey, v)
        case None => s.conf.unset(confKey)
      }
      Scratch.deleteRecursively(scratch)
    }
  }
}

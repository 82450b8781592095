package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

    // ---- Z-order clustering key: RANGE-QUANTIZE (l_partkey,
    // l_suppkey) into 2^16 equal-width bins of each column's observed
    // [min, max], Morton-interleave the bin ids, and sort by the key —
    // the write-time layout step that keeps row-group min/max tight on
    // BOTH columns so conjunctive predicates skip data a 1-d sort
    // cannot (pruning property spec-asserted; this query gates the key
    // arithmetic bit-for-bit). Quantizing FIRST is what makes the key
    // scale-proof: raw interleave needs every key < 2^16 and the 10×
    // replica's offset ids (~8·10⁹) overflow even 32 bits/column —
    // the sf1 sweep caught exactly that raise. bin = (v − min)·2^16
    // / (max − min + 1) in exact integer arithmetic (one broadcast
    // 2-scalar stats row; products ≤ ~10¹⁵, far under 2^63), so the
    // oracle replays every bin and the interleave bit-for-bit.
    Q(
      "q81_zorder_key",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val stats = li.agg(
          min($"l_partkey".cast("long")).as("pmin"),
          max($"l_partkey".cast("long")).as("pmax"),
          min($"l_suppkey".cast("long")).as("smin"),
          max($"l_suppkey".cast("long")).as("smax"))
        // `div` (not `/`): Column `/` is double division and the
        // product reaches ~5·10¹⁴ at the 10× replica — integral div
        // keeps every intermediate an exact long
        def bin(v: String, lo: String, hi: String): Column =
          expr(s"(cast($v as bigint) - $lo) * 65536 div ($hi - $lo + 1)")
        li.crossJoin(broadcast(stats))
          .select($"l_orderkey", $"l_linenumber",
            graft.functions.GraftFunctions.zorderKey(
              s, 16, Seq(
                bin("l_partkey", "pmin", "pmax"),
                bin("l_suppkey", "smin", "smax"))).as("zkey"))
          .orderBy($"zkey", $"l_orderkey", $"l_linenumber")
      },
      Some("""WITH st AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
             |    min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem),
             |b AS (SELECT l_orderkey, l_linenumber,
             |    (CAST(l_partkey AS BIGINT) - pmin) * 65536 // (pmax - pmin + 1) AS pb,
             |    (CAST(l_suppkey AS BIGINT) - smin) * 65536 // (smax - smin + 1) AS sb
             |  FROM lineitem CROSS JOIN st)
             |SELECT l_orderkey, l_linenumber,
             |  CAST((SELECT sum(((pb >> i) & 1) << (2 * i))
             |             + sum(((sb >> i) & 1) << (2 * i + 1))
             |        FROM range(0, 16) t(i)) AS BIGINT) AS zkey
             |FROM b
             |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin)),

    // ---- product-quantization codes (cosine metric, matching the ANN
    // stack): 4 subspaces × 16 codes over the 64-dim embeddings — the
    // compression step past int8 (q58) that makes a 100 TB embedding
    // corpus servable. Output is SCALAR-ONLY (the driver compare
    // lexsorts raw columns; arrays crash it): codebook rows carry
    // vec_id -1 and one (dim_idx, value) per centroid element; code
    // rows carry dim_idx -1 / value 0. The oracle re-derives EVERY
    // code independently: it re-assembles the codebooks from the
    // emitted element rows (list(value ORDER BY dim_idx) — exact
    // doubles, no precision loss) and recomputes each vector's
    // argmax-cosine code with the bit-equal list_dot_product kernel
    // (q29 precedent), ties to the lowest code exactly like the
    // NearestCentroids rule.
    Q(
      "q82_pq_codes",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val cbs = graft.operators.Similarity.pqTrain(
          emb, $"embedding", $"vec_id", m = 4, codes = 16)
        val codeRows = graft.operators.Similarity.pqAssign(
          emb, $"embedding", $"vec_id", cbs)
          .select($"vec_id", $"sub", $"code",
            lit(-1).as("dim_idx"), lit(0.0).as("value"))
        val cbRows = for {
          (cb, sIdx) <- cbs.zipWithIndex
          (cent, cIdx) <- cb.zipWithIndex
          (x, dIdx) <- cent.toSeq.zipWithIndex
        } yield (-1L, sIdx, cIdx, dIdx, x)
        s.createDataFrame(cbRows)
          .toDF("vec_id", "sub", "code", "dim_idx", "value")
          .unionByName(codeRows)
          .orderBy($"vec_id", $"sub", $"code", $"dim_idx")
      },
      Some("""WITH outp AS (SELECT * FROM read_parquet('{{OUT}}/q82_pq_codes/*.parquet')),
             |-- MATERIALIZED: DuckDB otherwise re-runs the list re-assembly
             |-- per downstream chunk
             |cb AS MATERIALIZED (SELECT sub, code, list(value ORDER BY dim_idx) AS centroid
             |  FROM outp WHERE vec_id = -1 GROUP BY sub, code),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |  WHERE vec_id IS NOT NULL AND len(embedding) = 64),
             |sc AS (SELECT e.vec_id, cb.sub, cb.code,
             |    list_dot_product(v[cb.sub*16+1 : cb.sub*16+16], cb.centroid)
             |      / (sqrt(list_dot_product(v[cb.sub*16+1 : cb.sub*16+16], v[cb.sub*16+1 : cb.sub*16+16]))
             |         * sqrt(list_dot_product(cb.centroid, cb.centroid))) AS cos
             |  FROM e CROSS JOIN cb),
             |r AS (SELECT vec_id, sub, code, row_number() OVER (
             |    PARTITION BY vec_id, sub
             |    ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |      code ASC) AS rn
             |  FROM sc)
             |SELECT vec_id, sub, code, CAST(-1 AS INT) AS dim_idx, 0.0 AS value
             |FROM r WHERE rn = 1
             |UNION ALL
             |SELECT vec_id, sub, code, dim_idx, value FROM outp WHERE vec_id = -1
             |ORDER BY vec_id, sub, code, dim_idx""".stripMargin)),

    // ---- PQ ADC top-k (FAISS-style asymmetric scoring re-expressed as
    // a Catalyst plan): corpus vectors are represented ONLY by their PQ
    // codes; per-query lookup tables ride in as array literals so the
    // scoring is pure codegen over one corpus scan — no join, no corpus
    // shuffle. Output = codebook rows (query_id -1, one scalar
    // (dim_idx, value) row per centroid element — see q82's
    // scalar-only rationale) + top-5 rows (dim_idx -1 / value 0). The
    // oracle is FULLY independent on the search path: from the emitted
    // codebook element rows alone it re-derives every corpus vector's
    // codes (argmax-cosine, q82), every ADC score (identical nested
    // float arithmetic), and the exact ranking — the emitted neighbors
    // must match row-for-row, score-for-score.
    Q(
      "q83_pq_adc_topk",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val cbs = graft.operators.Similarity.pqTrain(
          emb, $"embedding", $"vec_id", m = 4, codes = 16)
        // bounded query-side collect (8 vectors) — q29's broadcast
        // pattern, just driver-side so the LUTs can be literals
        val queries = emb.filter($"vec_id" < 8)
          .select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
          // bounded: 8 literal-keyed query vectors
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1).toSeq
        val topk = graft.operators.Similarity.pqAdcTopK(
          emb, $"embedding", $"vec_id", queries, cbs, k = 5)
          .select($"query_id", $"rank", $"corpus_id".as("vec_id"), $"score",
            lit(-1).as("sub"), lit(-1).as("code"),
            lit(-1).as("dim_idx"), lit(0.0).as("value"))
        val cbRows = for {
          (cb, sIdx) <- cbs.zipWithIndex
          (cent, cIdx) <- cb.zipWithIndex
          (x, dIdx) <- cent.toSeq.zipWithIndex
        } yield (-1L, -1, -1L, 0.0, sIdx, cIdx, dIdx, x)
        s.createDataFrame(cbRows)
          .toDF("query_id", "rank", "vec_id", "score", "sub", "code", "dim_idx", "value")
          .unionByName(topk)
          .orderBy($"query_id", $"rank", $"sub", $"code", $"dim_idx")
      },
      Some("""WITH outp AS (SELECT * FROM read_parquet('{{OUT}}/q83_pq_adc_topk/*.parquet')),
             |-- MATERIALIZED: see q82 — avoid re-running the list re-assembly
             |cb AS MATERIALIZED (SELECT sub, code, list(value ORDER BY dim_idx) AS centroid
             |  FROM outp WHERE query_id = -1 GROUP BY sub, code),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |  WHERE vec_id IS NOT NULL AND len(embedding) = 64),
             |sc AS (SELECT e.vec_id, cb.sub, cb.code,
             |    list_dot_product(v[cb.sub*16+1 : cb.sub*16+16], cb.centroid)
             |      / (sqrt(list_dot_product(v[cb.sub*16+1 : cb.sub*16+16], v[cb.sub*16+1 : cb.sub*16+16]))
             |         * sqrt(list_dot_product(cb.centroid, cb.centroid))) AS cos
             |  FROM e CROSS JOIN cb),
             |codes AS (SELECT vec_id, sub, code FROM (
             |    SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub
             |      ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |        code ASC) AS rn
             |    FROM sc) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
             |  FROM e WHERE vec_id < 8),
             |d AS (SELECT q.query_id, codes.vec_id, codes.sub, q.qn,
             |    list_dot_product(qv[codes.sub*16+1 : codes.sub*16+16], cb.centroid) AS ds,
             |    list_dot_product(cb.centroid, cb.centroid) AS ns
             |  FROM q CROSS JOIN codes
             |  JOIN cb ON cb.sub = codes.sub AND cb.code = codes.code),
             |p AS (SELECT query_id, vec_id, max(qn) AS qn,
             |    max(CASE WHEN sub=0 THEN ds END) AS d0, max(CASE WHEN sub=1 THEN ds END) AS d1,
             |    max(CASE WHEN sub=2 THEN ds END) AS d2, max(CASE WHEN sub=3 THEN ds END) AS d3,
             |    max(CASE WHEN sub=0 THEN ns END) AS n0, max(CASE WHEN sub=1 THEN ns END) AS n1,
             |    max(CASE WHEN sub=2 THEN ns END) AS n2, max(CASE WHEN sub=3 THEN ns END) AS n3
             |  FROM d GROUP BY query_id, vec_id),
             |s AS (SELECT query_id, vec_id,
             |    CASE WHEN qn * sqrt(((n0+n1)+n2)+n3) > 0
             |         THEN (((d0+d1)+d2)+d3) / (qn * sqrt(((n0+n1)+n2)+n3))
             |         ELSE 'NaN'::DOUBLE END AS score
             |  FROM p WHERE query_id <> vec_id),
             |r AS (SELECT query_id, vec_id, score, CAST(row_number() OVER (PARTITION BY query_id
             |    ORDER BY (CASE WHEN isnan(score) THEN -1.7976931348623157e308 ELSE score END) DESC,
             |      vec_id ASC) AS INT) AS rank
             |  FROM s)
             |SELECT query_id, rank, vec_id, score, -1 AS sub, -1 AS code,
             |  CAST(-1 AS INT) AS dim_idx, 0.0 AS value
             |FROM r WHERE rank <= 5
             |UNION ALL
             |SELECT query_id, rank, vec_id, score, sub, code, dim_idx, value
             |FROM outp WHERE query_id = -1
             |ORDER BY query_id, rank, sub, code, dim_idx""".stripMargin)),

    // ---- keyless interval-overlap join: shipment windows
    // [l_shipdate, l_shipdate + l_quantity days] (this testdata carries
    // no receipt date; quantity makes a deterministic 1-50 day window)
    // × 30-day order fulfillment windows [o_orderdate, o_orderdate+30].
    // A bare theta join planner-degrades to a nested-loop cross
    // product; the operator bins the time axis (binWidth = 32 days) and
    // turns it into an equi-join on bin id with canonical-bin dedup —
    // each overlapping pair emitted exactly once, no distinct shuffle.
    // The oracle IS that cross product (the O(n·m) formulation the
    // operator replaces), exact in integer day arithmetic.
    Q(
      "q84_interval_overlap_join",
      (s, d) => {
        import s.implicits._
        val epoch = to_date(lit("1970-01-01"))
        val li = Tables.lineitem(s, d).where($"l_orderkey" % 97 === 0)
        val ord = Tables.orders(s, d).where($"o_orderkey" % 53 === 0)
        graft.operators.TemporalJoins.intervalOverlapJoin(
          li, ord,
          datediff($"l_shipdate", epoch).cast("long"),
          (datediff($"l_shipdate", epoch) + $"l_quantity".cast("int")).cast("long"),
          datediff($"o_orderdate", epoch).cast("long"),
          (datediff($"o_orderdate", epoch) + 30).cast("long"),
          Seq("l_orderkey" -> $"l_orderkey", "l_linenumber" -> $"l_linenumber"),
          Seq("o_orderkey" -> $"o_orderkey"),
          binWidth = 32)
          .orderBy($"l_orderkey", $"l_linenumber", $"o_orderkey")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_linenumber,
             |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS ls,
             |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
             |      + CAST(l_quantity AS INT) AS le
             |  FROM lineitem WHERE l_orderkey % 97 = 0),
             |od AS (SELECT o_orderkey,
             |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS rs,
             |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 30 AS re
             |  FROM orders WHERE o_orderkey % 53 = 0)
             |SELECT li.l_orderkey, li.l_linenumber, od.o_orderkey,
             |  CAST(least(le, re) - greatest(ls, rs) + 1 AS BIGINT) AS overlap_len
             |FROM li CROSS JOIN od
             |WHERE ls <= re AND rs <= le
             |ORDER BY l_orderkey, l_linenumber, o_orderkey""".stripMargin)),

    // ---- small-files compaction plan: deterministic sorted-next-fit
    // bin packing per table partition (documents stand in as the file
    // listing: source = partition, text bytes = file size). Exact
    // integer arithmetic over a deterministic order — the plan is
    // reproducible run-over-run, which a rewrite job requires. The
    // oracle replays the identical window + integer division.
    Q(
      "q85_compaction_plan",
      (s, d) => {
        import s.implicits._
        graft.operators.Compaction.compactionPlan(
          Tables.documents(s, d),
          $"source", $"doc_id", octet_length($"text"), targetBytes = 16384L)
          .orderBy($"partition", $"bin", $"size_bytes".desc, $"file_id")
      },
      Some("""WITH f AS (SELECT source AS "partition", doc_id AS file_id,
             |    CAST(strlen(text) AS BIGINT) AS size_bytes FROM documents),
             |c AS (SELECT *, sum(size_bytes) OVER (PARTITION BY "partition"
             |      ORDER BY size_bytes DESC, file_id ASC
             |      ROWS UNBOUNDED PRECEDING) - size_bytes AS cum FROM f)
             |SELECT "partition", file_id, size_bytes, CAST(cum // 16384 AS BIGINT) AS bin
             |FROM c ORDER BY "partition", bin, size_bytes DESC, file_id""".stripMargin)),

    // ---- MERGE INTO (Delta-style upsert + tombstone delete) without a
    // table format: snapshot = per-user state from the first half of
    // the event log, change batch = per-user state from the second
    // half, tombstones for user_id % 9 = 0. The snapshot moves through
    // ONE left-anti join (change side broadcast by AQE); ambiguous
    // change batches fail loudly. Oracle = the NOT IN / UNION ALL
    // formulation, decimal-exact sums.
    Q(
      "q86_upsert_merge",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val cutoff = lit("2024-01-16").cast("timestamp")
        def state(df: DataFrame) = df.groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
        val snap = state(ev.filter($"ts" < cutoff))
        val chg = state(ev.filter($"ts" >= cutoff))
          .withColumn("del", $"user_id" % 9 === 0)
        val outs = Seq("user_id" -> $"user_id", "n_events" -> $"n_events",
          "total_value" -> $"total_value")
        graft.operators.Cdc.upsertMerge(
          snap, chg, $"user_id", $"user_id", $"del", outs, outs)
          .orderBy($"user_id")
      },
      Some("""WITH snap AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |  FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY user_id),
             |chg AS (SELECT user_id, count(*) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             |    user_id % 9 = 0 AS del
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY user_id)
             |SELECT user_id, n_events, total_value FROM snap
             |WHERE user_id NOT IN (SELECT user_id FROM chg)
             |UNION ALL
             |SELECT user_id, n_events, total_value FROM chg WHERE NOT del
             |ORDER BY user_id""".stripMargin)),

    // ---- SCD2 history from the event change log: one validity
    // interval per non-delete change, closed by the next change or by
    // an 'error' tombstone (which emits no interval of its own).
    // One lead() window per user — per-key rows bounded by change
    // rate. Oracle replays the identical window, exact timestamps.
    Q(
      "q87_scd2_history",
      (s, d) => {
        import s.implicits._
        graft.operators.Cdc.scd2History(
          Tables.events(s, d).filter($"user_id" < 40),
          $"user_id", $"ts", $"event_type" === "error",
          Seq("event_type" -> $"event_type", "value" -> $"value"))
          .orderBy($"key", $"valid_from")
      },
      Some("""WITH e AS (SELECT user_id AS key, ts, event_type, value,
             |    event_type = 'error' AS del FROM events WHERE user_id < 40),
             |l AS (SELECT *, lead(ts) OVER (PARTITION BY key ORDER BY ts) AS valid_to
             |  FROM e)
             |SELECT key, event_type, value, ts AS valid_from, valid_to,
             |  valid_to IS NULL AS is_current
             |FROM l WHERE NOT del ORDER BY key, valid_from""".stripMargin)),

    // ---- IVF-PQ top-k (FAISS IVFADC, by_residual=false, as ONE
    // Catalyst corpus scan): the coarse quantizer routes each corpus
    // vector to its cell map-side, rows in unprobed cells drop BEFORE
    // any PQ work, survivors score through the per-query ADC lookup
    // tables gated on cell membership — no join, no corpus shuffle at
    // any scale (8 cells × probe 3 ≈ 37% of the corpus scanned here).
    // Output = coarse centroid rows (query_id -2, cell id in `code`,
    // 1-based) + PQ codebook rows (query_id -1) + top-5 rows, all
    // SCALAR-ONLY: centroid/codebook vectors are emitted as one
    // (dim_idx, value) row per element (q82's rationale — the driver
    // compare cannot sort array columns). The oracle is FULLY
    // independent on the whole search path: from the
    // emitted model alone DuckDB re-derives every vector's cell
    // (argmax-cosine over centroids), every PQ code (q82), every
    // query's probe set (top-nprobe cells), every ADC score on the
    // probed subset, and the exact ranking — emitted neighbors must
    // match row-for-row, score-for-score.
    Q(
      "q88_ivfpq_topk",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val cents = graft.operators.Similarity.coarseTrain(
          emb, $"embedding", $"vec_id", nlist = 8)
        val cbs = graft.operators.Similarity.pqTrain(
          emb, $"embedding", $"vec_id", m = 4, codes = 16)
        val queries = emb.filter($"vec_id" < 8)
          .select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
          // bounded: 8 literal-keyed query vectors
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1).toSeq
        val topk = graft.operators.Similarity.ivfPqTopK(
          emb, $"embedding", $"vec_id", queries, cents, cbs, k = 5, nprobe = 3)
          .select($"query_id", $"rank", $"corpus_id".as("vec_id"), $"score",
            lit(-1).as("sub"), lit(-1).as("code"),
            lit(-1).as("dim_idx"), lit(0.0).as("value"))
        val centRows = for {
          (c, i) <- cents.zipWithIndex
          (x, dIdx) <- c.toSeq.zipWithIndex
        } yield (-2L, -1, -1L, 0.0, -1, i + 1, dIdx, x)
        val cbRows = for {
          (cb, sIdx) <- cbs.zipWithIndex
          (cent, cIdx) <- cb.zipWithIndex
          (x, dIdx) <- cent.toSeq.zipWithIndex
        } yield (-1L, -1, -1L, 0.0, sIdx, cIdx, dIdx, x)
        s.createDataFrame(centRows ++ cbRows)
          .toDF("query_id", "rank", "vec_id", "score", "sub", "code", "dim_idx", "value")
          .unionByName(topk)
          .orderBy($"query_id", $"rank", $"sub", $"code", $"dim_idx")
      },
      Some("""WITH outp AS (SELECT * FROM read_parquet('{{OUT}}/q88_ivfpq_topk/*.parquet')),
             |-- MATERIALIZED: see q82 — avoid re-running the list re-assembly
             |cent AS MATERIALIZED (SELECT code AS cid, list(value ORDER BY dim_idx) AS centroid
             |  FROM outp WHERE query_id = -2 GROUP BY code),
             |cb AS MATERIALIZED (SELECT sub, code, list(value ORDER BY dim_idx) AS centroid
             |  FROM outp WHERE query_id = -1 GROUP BY sub, code),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |  WHERE vec_id IS NOT NULL AND len(embedding) = 64),
             |csc AS (SELECT e.vec_id, cent.cid,
             |    list_dot_product(v, cent.centroid)
             |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cent.centroid, cent.centroid))) AS cos
             |  FROM e CROSS JOIN cent),
             |cells AS (SELECT vec_id, cid FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |        cid ASC) AS rn
             |    FROM csc) WHERE rn = 1),
             |sc AS (SELECT e.vec_id, cb.sub, cb.code,
             |    list_dot_product(v[cb.sub*16+1 : cb.sub*16+16], cb.centroid)
             |      / (sqrt(list_dot_product(v[cb.sub*16+1 : cb.sub*16+16], v[cb.sub*16+1 : cb.sub*16+16]))
             |         * sqrt(list_dot_product(cb.centroid, cb.centroid))) AS cos
             |  FROM e CROSS JOIN cb),
             |codes AS (SELECT vec_id, sub, code FROM (
             |    SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub
             |      ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |        code ASC) AS rn
             |    FROM sc) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
             |  FROM e WHERE vec_id < 8),
             |psc AS (SELECT q.query_id, cent.cid,
             |    list_dot_product(qv, cent.centroid)
             |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cent.centroid, cent.centroid))) AS cos
             |  FROM q CROSS JOIN cent),
             |probes AS (SELECT query_id, cid FROM (
             |    SELECT query_id, cid, row_number() OVER (PARTITION BY query_id
             |      ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |        cid ASC) AS rn
             |    FROM psc) WHERE rn <= 3),
             |d AS (SELECT q.query_id, codes.vec_id, codes.sub, q.qn,
             |    list_dot_product(qv[codes.sub*16+1 : codes.sub*16+16], cb.centroid) AS ds,
             |    list_dot_product(cb.centroid, cb.centroid) AS ns
             |  FROM q
             |  JOIN probes ON probes.query_id = q.query_id
             |  JOIN cells ON cells.cid = probes.cid
             |  JOIN codes ON codes.vec_id = cells.vec_id
             |  JOIN cb ON cb.sub = codes.sub AND cb.code = codes.code),
             |p AS (SELECT query_id, vec_id, max(qn) AS qn,
             |    max(CASE WHEN sub=0 THEN ds END) AS d0, max(CASE WHEN sub=1 THEN ds END) AS d1,
             |    max(CASE WHEN sub=2 THEN ds END) AS d2, max(CASE WHEN sub=3 THEN ds END) AS d3,
             |    max(CASE WHEN sub=0 THEN ns END) AS n0, max(CASE WHEN sub=1 THEN ns END) AS n1,
             |    max(CASE WHEN sub=2 THEN ns END) AS n2, max(CASE WHEN sub=3 THEN ns END) AS n3
             |  FROM d GROUP BY query_id, vec_id),
             |s AS (SELECT query_id, vec_id,
             |    CASE WHEN qn * sqrt(((n0+n1)+n2)+n3) > 0
             |         THEN (((d0+d1)+d2)+d3) / (qn * sqrt(((n0+n1)+n2)+n3))
             |         ELSE 'NaN'::DOUBLE END AS score
             |  FROM p WHERE query_id <> vec_id),
             |r AS (SELECT query_id, vec_id, score, CAST(row_number() OVER (PARTITION BY query_id
             |    ORDER BY (CASE WHEN isnan(score) THEN -1.7976931348623157e308 ELSE score END) DESC,
             |      vec_id ASC) AS INT) AS rank
             |  FROM s)
             |SELECT query_id, rank, vec_id, score, -1 AS sub, -1 AS code,
             |  CAST(-1 AS INT) AS dim_idx, 0.0 AS value
             |FROM r WHERE rank <= 5
             |UNION ALL
             |SELECT query_id, rank, vec_id, score, sub, code, dim_idx, value
             |FROM outp WHERE query_id = -2
             |UNION ALL
             |SELECT query_id, rank, vec_id, score, sub, code, dim_idx, value
             |FROM outp WHERE query_id = -1
             |ORDER BY query_id, rank, sub, code, dim_idx""".stripMargin)),

    // ---- PageRank over the supplier→part shipment graph (suppliers
    // ship parts; parts are dangling sinks, so ~95% of the rank mass
    // cycles through the dangling redistribution every iteration —
    // the correction is load-bearing, not decorative). Duplicate
    // (supplier, part) pairs in lineitem collapse to one edge. The
    // oracle replays all 10 power iterations as unrolled MATERIALIZED
    // CTEs (DuckDB inlines plain CTEs; each iteration is referenced
    // twice — dangling mass + next rank — so inlining would blow up
    // 2^10) and accepts the emitted ranks within 1e-9 per node
    // (q57's tolerance pattern: double sums fold in partition order
    // on the Spark side, so bit-equality across engines is not
    // defined for this operator), emitting a poison row on any
    // missing/extra/duplicated node or out-of-tolerance rank.
    Q(
      "q89_pagerank",
      (s, d) => {
        import s.implicits._
        graft.operators.Graph.pageRank(
          Tables.lineitem(s, d).select(
            $"l_suppkey".cast("long").as("src"),
            ($"l_partkey".cast("long") + 1000000L).as("dst")),
          $"src", $"dst", 0.85, 10)
          .orderBy($"node")
      },
      Some(pagerankOracle)),

    // ---- IVF-PQ top-k with RESIDUAL encoding (FAISS IVFADC,
    // by_residual=true — the FAISS default; q88 is the =false flavor):
    // PQ codes quantize v - centroid(cell) with L2 assignment, ADC
    // scores the reconstruction centroid + codeword. Same single-scan
    // zero-join plan and same scalar-only output shape as q88 (cent
    // rows query_id -2, residual-codebook rows query_id -1, top-5
    // rows). The oracle is FULLY independent on the whole search path:
    // from the emitted model alone DuckDB re-derives every cell
    // (argmax cosine), every residual (elementwise v - cent), every
    // code (argmin of the list_dot_product L2 decomposition — the
    // kernel computes the identical float expression), every probe
    // set, every ADC score (same left-nested sums), and the ranking.
    Q(
      "q90_ivfpq_residual_topk",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val cents = graft.operators.Similarity.coarseTrain(
          emb, $"embedding", $"vec_id", nlist = 8)
        val cbs = graft.operators.Similarity.pqTrainResidual(
          emb, $"embedding", $"vec_id", cents, m = 4, codes = 16)
        val queries = emb.filter($"vec_id" < 8)
          .select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
          // bounded: 8 literal-keyed query vectors
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1).toSeq
        val topk = graft.operators.Similarity.ivfPqResidualTopK(
          emb, $"embedding", $"vec_id", queries, cents, cbs, k = 5, nprobe = 3)
          .select($"query_id", $"rank", $"corpus_id".as("vec_id"), $"score",
            lit(-1).as("sub"), lit(-1).as("code"),
            lit(-1).as("dim_idx"), lit(0.0).as("value"))
        val centRows = for {
          (c, i) <- cents.zipWithIndex
          (x, dIdx) <- c.toSeq.zipWithIndex
        } yield (-2L, -1, -1L, 0.0, -1, i + 1, dIdx, x)
        val cbRows = for {
          (cb, sIdx) <- cbs.zipWithIndex
          (cent, cIdx) <- cb.zipWithIndex
          (x, dIdx) <- cent.toSeq.zipWithIndex
        } yield (-1L, -1, -1L, 0.0, sIdx, cIdx, dIdx, x)
        s.createDataFrame(centRows ++ cbRows)
          .toDF("query_id", "rank", "vec_id", "score", "sub", "code", "dim_idx", "value")
          .unionByName(topk)
          .orderBy($"query_id", $"rank", $"sub", $"code", $"dim_idx")
      },
      Some("""WITH outp AS (SELECT * FROM read_parquet('{{OUT}}/q90_ivfpq_residual_topk/*.parquet')),
             |cent AS MATERIALIZED (SELECT code AS cid, list(value ORDER BY dim_idx) AS centroid
             |  FROM outp WHERE query_id = -2 GROUP BY code),
             |cb AS MATERIALIZED (SELECT sub, code, list(value ORDER BY dim_idx) AS centroid
             |  FROM outp WHERE query_id = -1 GROUP BY sub, code),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |  WHERE vec_id IS NOT NULL AND len(embedding) = 64),
             |csc AS (SELECT e.vec_id, cent.cid,
             |    list_dot_product(v, cent.centroid)
             |      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cent.centroid, cent.centroid))) AS cos
             |  FROM e CROSS JOIN cent),
             |-- MATERIALIZED: referenced by both res and d
             |cells AS MATERIALIZED (SELECT vec_id, cid FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |        cid ASC) AS rn
             |    FROM csc) WHERE rn = 1),
             |res AS MATERIALIZED (SELECT e.vec_id, s.sub,
             |    list_transform(list_zip(v[s.sub*16+1 : s.sub*16+16],
             |        cent.centroid[s.sub*16+1 : s.sub*16+16]), x -> x[1] - x[2]) AS r
             |  FROM e JOIN cells ON cells.vec_id = e.vec_id
             |  JOIN cent ON cent.cid = cells.cid
             |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS sub) s),
             |dsc AS (SELECT res.vec_id, res.sub, cb.code,
             |    list_dot_product(r, r) - 2 * list_dot_product(r, cb.centroid)
             |      + list_dot_product(cb.centroid, cb.centroid) AS dist
             |  FROM res JOIN cb ON cb.sub = res.sub),
             |codes AS (SELECT vec_id, sub, code FROM (
             |    SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub
             |      ORDER BY (CASE WHEN isnan(dist) THEN 1.7976931348623157e308 ELSE dist END) ASC,
             |        code ASC) AS rn
             |    FROM dsc) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
             |  FROM e WHERE vec_id < 8),
             |psc AS (SELECT q.query_id, cent.cid,
             |    list_dot_product(qv, cent.centroid)
             |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cent.centroid, cent.centroid))) AS cos
             |  FROM q CROSS JOIN cent),
             |probes AS (SELECT query_id, cid FROM (
             |    SELECT query_id, cid, row_number() OVER (PARTITION BY query_id
             |      ORDER BY (CASE WHEN isnan(cos) THEN -1.7976931348623157e308 ELSE cos END) DESC,
             |        cid ASC) AS rn
             |    FROM psc) WHERE rn <= 3),
             |d AS (SELECT q.query_id, codes.vec_id, codes.sub, q.qn,
             |    list_dot_product(qv[codes.sub*16+1 : codes.sub*16+16], cb.centroid) AS ds,
             |    list_dot_product(cent.centroid[codes.sub*16+1 : codes.sub*16+16],
             |        cent.centroid[codes.sub*16+1 : codes.sub*16+16])
             |      + 2 * list_dot_product(cent.centroid[codes.sub*16+1 : codes.sub*16+16], cb.centroid)
             |      + list_dot_product(cb.centroid, cb.centroid) AS nt,
             |    list_dot_product(qv, cent.centroid) AS qc
             |  FROM q
             |  JOIN probes ON probes.query_id = q.query_id
             |  JOIN cells ON cells.cid = probes.cid
             |  JOIN cent ON cent.cid = cells.cid
             |  JOIN codes ON codes.vec_id = cells.vec_id
             |  JOIN cb ON cb.sub = codes.sub AND cb.code = codes.code),
             |p AS (SELECT query_id, vec_id, max(qn) AS qn, max(qc) AS qc,
             |    max(CASE WHEN sub=0 THEN ds END) AS d0, max(CASE WHEN sub=1 THEN ds END) AS d1,
             |    max(CASE WHEN sub=2 THEN ds END) AS d2, max(CASE WHEN sub=3 THEN ds END) AS d3,
             |    max(CASE WHEN sub=0 THEN nt END) AS n0, max(CASE WHEN sub=1 THEN nt END) AS n1,
             |    max(CASE WHEN sub=2 THEN nt END) AS n2, max(CASE WHEN sub=3 THEN nt END) AS n3
             |  FROM d GROUP BY query_id, vec_id),
             |s AS (SELECT query_id, vec_id,
             |    CASE WHEN qn * sqrt((((n0+n1)+n2)+n3)) > 0
             |         THEN ((((qc + d0) + d1) + d2) + d3) / (qn * sqrt((((n0+n1)+n2)+n3)))
             |         ELSE 'NaN'::DOUBLE END AS score
             |  FROM p WHERE query_id <> vec_id),
             |r AS (SELECT query_id, vec_id, score, CAST(row_number() OVER (PARTITION BY query_id
             |    ORDER BY (CASE WHEN isnan(score) THEN -1.7976931348623157e308 ELSE score END) DESC,
             |      vec_id ASC) AS INT) AS rank
             |  FROM s)
             |SELECT query_id, rank, vec_id, score, -1 AS sub, -1 AS code,
             |  CAST(-1 AS INT) AS dim_idx, 0.0 AS value
             |FROM r WHERE rank <= 5
             |UNION ALL
             |SELECT query_id, rank, vec_id, score, sub, code, dim_idx, value
             |FROM outp WHERE query_id = -2
             |UNION ALL
             |SELECT query_id, rank, vec_id, score, sub, code, dim_idx, value
             |FROM outp WHERE query_id = -1
             |ORDER BY query_id, rank, sub, code, dim_idx""".stripMargin)),

    // ---- watermarked stream-stream interval join under the gate: the
    // live twin of q67's bounded range join, run through a REAL
    // multi-micro-batch AvailableNow query (see streamingIntervalJoin).
    // The oracle is the batch theta join — watermark(2h) > interval(1h)
    // guarantees the streamed pair set is exactly the batch pair set.
    Q(
      "q92_streaming_interval_join",
      (s, d) => streamingIntervalJoin(s, d),
      Some("""SELECT a.event_id AS error_event_id, b.event_id AS click_event_id
             |FROM events a JOIN events b ON a.user_id = b.user_id
             | AND a.event_type = 'error' AND b.event_type = 'click'
             | AND epoch_us(CAST(b.ts AS TIMESTAMP))
             |       BETWEEN epoch_us(CAST(a.ts AS TIMESTAMP)) - 3600000000
             |           AND epoch_us(CAST(a.ts AS TIMESTAMP)) + 3600000000
             |ORDER BY error_event_id, click_event_id""".stripMargin)),

    // ---- salted equi-join under the gate (the salted AGGREGATE is
    // q33; the join flavor was spec-only): lineitem joins its order
    // header with the left side salted 16 ways and the small side
    // replicated per salt — the hot-key mitigation for joins whose key
    // histogram is skewed. Result must be BIT-IDENTICAL to the plain
    // equi-join, which is exactly what the oracle runs.
    Q(
      "q99_skew_salted_join",
      (s, d) => {
        import s.implicits._
        graft.operators.Skew.saltedJoin(
          Tables.lineitem(s, d).where($"l_orderkey" % 31 === 0)
            .select($"l_orderkey", $"l_linenumber", $"l_quantity"),
          Tables.orders(s, d)
            .select($"o_orderkey".as("l_orderkey"), $"o_custkey", $"o_totalprice"),
          keys = Seq("l_orderkey"), salts = 16)
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
             |  o.o_custkey, o.o_totalprice
             |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |WHERE l.l_orderkey % 31 = 0
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)),

    // ---- bucketed co-located join under the gate (the plan-shape
    // proof — no ShuffleExchange feeding the join — is BucketingSpec;
    // this gates the VALUES): both sides written as 8-bucket
    // per-bucket-sorted managed tables on the join key, joined, and
    // compared against the plain equi-join the oracle runs. Managed
    // tables are per-run-unique and dropped in finally (concurrent
    // gate queries share one session).
    Q(
      "q101_bucketed_join",
      (s, d) => {
        import s.implicits._
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        val (tl, to) = (s"graft_q101_li_$tag", s"graft_q101_ord_$tag")
        try {
          graft.operators.Bucketing.writeBucketed(
            Tables.lineitem(s, d).where($"l_orderkey" % 17 === 0)
              .select($"l_orderkey", $"l_linenumber", $"l_extendedprice"),
            tl, "l_orderkey", buckets = 8)
          graft.operators.Bucketing.writeBucketed(
            Tables.orders(s, d)
              .select($"o_orderkey".as("l_orderkey"), $"o_custkey", $"o_totalprice"),
            to, "l_orderkey", buckets = 8)
          s.table(tl).join(s.table(to), "l_orderkey")
            .orderBy($"l_orderkey", $"l_linenumber")
            .localCheckpoint(true)
        } finally {
          s.sql(s"DROP TABLE IF EXISTS $tl")
          s.sql(s"DROP TABLE IF EXISTS $to")
          ()
        }
      },
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
             |  o.o_custkey, o.o_totalprice
             |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |WHERE l.l_orderkey % 17 = 0
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)),

    // ---- stateful streaming sessionization under the gate: the real
    // flatMapGroupsWithState query over time-partitioned multi-batch
    // file input with sentinel flushes (see streamingSessionize) must
    // reproduce the batch lag+cumsum sessionization EXACTLY — q36's
    // oracle, verbatim.
    Q(
      "q100_streaming_sessionize",
      (s, d) => streamingSessionize(s, d),
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
             |ORDER BY user_id, session_start""".stripMargin)),

    // ---- ANALYZE-style corpus profiling: per-column stats for the
    // documents table in ONE aggregation pass (the naive loop is one
    // full scan per column). Exact fields hash-match; the HLL++
    // distinct estimate passes through a q45-style envelope gate —
    // DuckDB computes the exact distinct count and admits the emitted
    // row only within 10% (rsd 1.6%), poison row otherwise.
    Q(
      "q94_corpus_profile",
      (s, d) => {
        import s.implicits._
        graft.operators.Profiling.profile(
          Tables.documents(s, d), Seq("doc_id", "source", "text"))
          .orderBy($"column")
      },
      Some("""WITH outp AS (SELECT * FROM read_parquet('{{OUT}}/q94_corpus_profile/*.parquet')),
             |exp AS (
             |  SELECT 'doc_id' AS col, count(*) AS n_rows, count(doc_id) AS n_nonnull,
             |      count(DISTINCT doc_id) AS d_exact,
             |      CAST(min(doc_id) AS VARCHAR) AS min_value,
             |      CAST(max(doc_id) AS VARCHAR) AS max_value,
             |      CAST(coalesce(sum(length(CAST(doc_id AS VARCHAR))), 0) AS BIGINT) AS len_sum
             |    FROM documents
             |  UNION ALL
             |  SELECT 'source', count(*), count(source), count(DISTINCT source),
             |      min(source), max(source),
             |      CAST(coalesce(sum(length(source)), 0) AS BIGINT)
             |    FROM documents
             |  UNION ALL
             |  SELECT 'text', count(*), count(text), count(DISTINCT text),
             |      min(text), max(text),
             |      CAST(coalesce(sum(length(text)), 0) AS BIGINT)
             |    FROM documents),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM outp) = 3
             |    AND NOT EXISTS (SELECT 1 FROM outp o JOIN exp e ON o.column = e.col
             |      WHERE o.n_rows <> e.n_rows OR o.n_nonnull <> e.n_nonnull
             |         OR o.min_value <> e.min_value OR o.max_value <> e.max_value
             |         OR o.len_sum <> e.len_sum
             |         OR abs(o.n_distinct - e.d_exact) > 0.10 * e.d_exact)
             |    AND NOT EXISTS (SELECT 1 FROM exp e
             |      WHERE e.col NOT IN (SELECT o2.column FROM outp o2))
             |  ) AS ok)
             |SELECT "column", n_rows, n_nonnull, n_distinct, min_value, max_value, len_sum
             |FROM outp WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT 'POISON', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  '', '', CAST(-1 AS BIGINT)
             |  WHERE NOT (SELECT ok FROM flag)
             |ORDER BY "column"""".stripMargin)),
  )

  /** q89's oracle: 10 unrolled PageRank iterations (damping 0.85,
    * uniform 1/N start, dangling mass redistributed uniformly) over
    * the deduped supplier→part edge list, then a soundness gate that
    * emits the Spark result only if it matches node-for-node within
    * 1e-9. Built by loop because SQL cannot iterate without recursion
    * and DuckDB's recursive CTEs disallow aggregates over the
    * recursive reference — 10 fixed iterations unroll cleanly.
    */
  private def pagerankOracle: String = {
    val iters = 10
    val header =
      """WITH e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
        |    CAST(l_partkey AS BIGINT) + 1000000 AS dst FROM lineitem),
        |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |meta AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |od AS MATERIALIZED (SELECT src, count(*) AS od FROM e GROUP BY src),
        |r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM meta) AS rank FROM nodes)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""dang$k AS MATERIALIZED (SELECT coalesce(sum(rank), 0) AS dang FROM r${k - 1}
         |  WHERE node NOT IN (SELECT src FROM od)),
         |r$k AS MATERIALIZED (SELECT nodes.node,
         |  (1.0 - 0.85) / (SELECT n FROM meta)
         |    + 0.85 * (coalesce(c.s, 0) + (SELECT dang FROM dang$k) / (SELECT n FROM meta)) AS rank
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rank / od.od) AS s
         |    FROM r${k - 1} p JOIN od ON od.src = p.node JOIN e ON e.src = p.node
         |    GROUP BY e.dst) c USING (node))""".stripMargin
    }
    val gate =
      s"""emitted AS (SELECT node, rank FROM read_parquet('{{OUT}}/q89_pagerank/*.parquet')),
         |flag AS (SELECT (
         |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM r$iters)
         |    AND (SELECT count(DISTINCT node) FROM emitted) = (SELECT count(*) FROM emitted)
         |    AND NOT EXISTS (SELECT 1 FROM emitted x LEFT JOIN r$iters r USING (node)
         |      WHERE r.node IS NULL OR abs(x.rank - r.rank) > 1e-9)
         |  ) AS ok)
         |SELECT node, rank FROM emitted WHERE (SELECT ok FROM flag)
         |UNION ALL
         |SELECT CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
         |  WHERE NOT (SELECT ok FROM flag)
         |ORDER BY node""".stripMargin
    (Seq(header) ++ steps ++ Seq(gate)).mkString(",\n")
  }

  private val cmsKeys = Seq("1", "100", "12345", "5", "73")

  /** q100: the stateful flatMapGroupsWithState sessionizer under the
    * gate (q36 gates the batch twin; the stream itself was spec-only).
    * Determinism needs two staging decisions the operator itself
    * cannot make:
    *
    *   1. TIME-PARTITIONED batches. The sessionizer sorts within a
    *      batch and merges forward with the open state, but a closed
    *      session is FINAL — an event older than an already-closed
    *      session arriving in a later batch cannot re-open it (the
    *      documented state model). Splitting input files on the time
    *      axis (with explicit ascending modification times so the file
    *      stream lists them in order) means no event ever arrives
    *      "behind" a closed session, so the fold over batches equals
    *      the batch formulation exactly.
    *   2. SENTINEL FLUSH. Append-mode state only emits a session once
    *      a LATER event closes it, so per-user sentinels at
    *      global-max-ts + gap + 1min close every real session; the
    *      sentinel sessions themselves stay open in state and are
    *      never emitted. (Processing-time straggler timeouts are OFF —
    *      wall-clock flushes are nondeterministic.)
    *
    * Result: streamed sessions ≡ the batch lag+cumsum formulation —
    * and q36's oracle verifies exactly that.
    */
  private def streamingSessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q100_sess")
    try {
      val ev = Tables.events(s, d)
        .select($"user_id", $"ts", $"value").filter($"ts".isNotNull)
      val bounds = ev.agg(min($"ts"), max($"ts")).head()
      val (minTs, maxTs) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
      val cut = new java.sql.Timestamp((minTs.getTime + maxTs.getTime) / 2)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 11 * 60000L)
      val inDir = scratch.resolve("input")
      java.nio.file.Files.createDirectories(inDir)
      def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
        val tmp = scratch.resolve(s"tmp_$name")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp)
        val src = try part.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow()
        finally part.close()
        val dst = inDir.resolve(s"$name.parquet")
        java.nio.file.Files.move(src, dst)
        java.nio.file.Files.setLastModifiedTime(
          dst, java.nio.file.attribute.FileTime.fromMillis(mtime)): Unit
      }
      val t0 = System.currentTimeMillis() - 60000L
      stage(ev.filter($"ts" <= cut), "00_early", t0)
      stage(ev.filter($"ts" > cut), "01_late", t0 + 5000L)
      stage(ev.select($"user_id").distinct()
        .select($"user_id", lit(sentinelTs).as("ts"), lit(0.0).as("value")),
        "02_sentinel", t0 + 10000L)
      val schema = s.read.parquet(inDir.toString).schema
      val input = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
        .as[graft.streaming.Sessionize.Event]
      val sessions = graft.streaming.Sessionize.streaming(
        input, gapMinutes = 10, stragglerTimeout = false)
      val name = "q100_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = sessions.writeStream.outputMode("append")
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        try require(q.awaitTermination(600000),
          "q100 stream did not terminate within 600s — refusing a partial result")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 2,
          s"q100 ran $dataBatches data micro-batch(es); the cross-batch " +
            "state path needs at least 2")
        s.table(name)
          .select($"user_id", $"session_start", $"session_end",
            $"n_events", $"total_value")
          .orderBy($"user_id", $"session_start")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

  /** q92: the LIVE-stream twin of the bounded range join (q67) under
    * the gate — a watermarked stream-stream inner interval join run
    * through a real multi-micro-batch AvailableNow query. The 2-hour
    * watermarks exceed the ±1-hour join interval, so no in-interval
    * pair can be dropped as late and the streamed result must equal
    * the batch theta join EXACTLY (the oracle). State is bounded by
    * the watermark on both sides — the property that lets this run
    * forever on live streams; `maxFilesPerTrigger=1` over 2-file
    * inputs forces ≥2 micro-batches so the incremental-state path is
    * genuinely exercised (enforced below, q80 precedent).
    */
  private def streamingIntervalJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = Scratch.tempDir("q92_ssj")
    try {
      def stage(tpe: String, dir: String): Unit =
        Tables.events(s, d).filter($"event_type" === tpe)
          .select($"event_id", $"user_id", $"ts")
          .repartition(2).write.parquet(dir)
      val errDir = scratch.resolve("err").toString
      val clkDir = scratch.resolve("clk").toString
      stage("error", errDir)
      stage("click", clkDir)
      val schema = s.read.parquet(errDir).schema
      val a = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(errDir).withWatermark("ts", "2 hours").alias("a")
      val b = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(clkDir).withWatermark("ts", "2 hours").alias("b")
      val joined = a.join(b,
        expr("""a.user_id = b.user_id AND
                b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR"""))
        .select(col("a.event_id").as("error_event_id"),
          col("b.event_id").as("click_event_id"))
      val name = "q92_ssj_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = joined.writeStream.outputMode("append")
        .option("checkpointLocation", scratch.resolve("_ckpt").toString)
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      // the memory-sink view exists from start(); drop it in finally so
      // a timeout/require failure cannot leave its rows pinned in the
      // shared gate session (the convention of the other memory-sink
      // streaming queries)
      try {
        try require(q.awaitTermination(600000),
          "q92 stream did not terminate within 600s — refusing a partial join")
        finally q.stop()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches >= 2,
          s"q92 ran $dataBatches data micro-batch(es); the incremental " +
            "stream-stream state path needs at least 2")
        // materialize on executors before the view goes away
        s.table(name)
          .select($"error_event_id", $"click_event_id")
          .orderBy($"error_event_id", $"click_event_id")
          .localCheckpoint(true)
      } finally { s.catalog.dropTempView(name); () }
    } finally Scratch.deleteRecursively(scratch)
  }

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
          // bounded: one global CMS state per batch — a single d·w row
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

package graft.queries

import org.apache.spark.sql.functions._

/** Round-11 queries: winnowing fingerprints (the MOSS guaranteed-
  * coverage document fingerprint), winnowing-based copy detection,
  * and rendezvous-hash shard placement with its minimal-movement
  * property under resharding.
  */
object ScaleOps11 {

  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared oracle CTE chain re-deriving
    * [[graft.operators.TextAnalysis.winnowingFingerprints]] (k=5,
    * window=4) over `documents` — the grouped two-phase replay of the
    * rightmost-min selection (min hash per window end, then the
    * rightmost position attaining it), ending in CTE `sel` =
    * (doc_id, pos, fp) distinct.
    */
  private val sqlWinnow =
    s"""toks AS (SELECT doc_id, coalesce($sqlToks, []) AS t FROM documents),
       |g AS (SELECT doc_id, unnest(range(1, len(t) - 3)) AS pos, t
       |  FROM toks WHERE len(t) >= 5),
       |gh AS MATERIALIZED (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    CAST(('0x' || substring(md5(array_to_string(t[pos:pos+4], ' ')), 1, 15))
       |      AS BIGINT) AS h
       |  FROM g),
       |mm AS (SELECT doc_id, max(pos) AS m FROM gh GROUP BY 1),
       |ends AS (SELECT gh.doc_id, gh.pos AS e FROM gh JOIN mm USING (doc_id)
       |  WHERE gh.pos >= 4 OR gh.pos = mm.m),
       |win AS MATERIALIZED (SELECT en.doc_id, en.e, g2.pos, g2.h
       |  FROM ends en JOIN gh g2 ON g2.doc_id = en.doc_id
       |    AND g2.pos BETWEEN en.e - 3 AND en.e),
       |mn AS (SELECT doc_id, e, min(h) AS mh FROM win GROUP BY 1, 2),
       |pick AS (SELECT w.doc_id, w.e, max(w.pos) AS pos, min(n.mh) AS fp
       |  FROM win w JOIN mn n ON w.doc_id = n.doc_id AND w.e = n.e AND w.h = n.mh
       |  GROUP BY 1, 2),
       |sel AS (SELECT DISTINCT doc_id, pos, fp FROM pick)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- q357: WINNOWING FINGERPRINTS (Schleimer/Wilkerson/Aiken
    // 2003, the MOSS algorithm) over the document corpus: token
    // 5-gram md5 hashes, window-4 rightmost-min selection — the
    // guaranteed-coverage fingerprint (any shared run of >= 8 tokens
    // shares a fingerprint). All-integer — hash-exact.
    Q(
      "q357_winnowing_fingerprints",
      (s, d) => {
        import s.implicits._
        graft.operators.TextAnalysis.winnowingFingerprints(
          Tables.documents(s, d), $"text", $"doc_id", k = 5, window = 4)
          .orderBy($"doc_id", $"pos", $"fp")
      },
      Some(s"""WITH $sqlWinnow
              |SELECT doc_id, pos, fp FROM sel
              |ORDER BY doc_id, pos, fp""".stripMargin)),

    // ---- q358: WINNOWING COPY DETECTION — the MOSS match step over
    // q357's fingerprints: distinct (doc, fp), fingerprints shared by
    // more than 64 documents dropped (boilerplate, the standard MOSS
    // "too common to mean copying" cap — an explicit semantic, not a
    // truncation), pairs sharing >= 2 surviving fingerprints with the
    // shared count. Exact integers — hash-exact.
    Q(
      "q358_winnowing_matches",
      (s, d) => {
        import s.implicits._
        val sel = graft.operators.TextAnalysis.winnowingFingerprints(
          Tables.documents(s, d), $"text", $"doc_id", k = 5, window = 4)
          .select($"doc_id", $"fp").distinct()
          .localCheckpoint(true)
        val rare = sel.groupBy($"fp").agg(count(lit(1)).as("df"))
          .filter($"df" <= 64)
        val post = sel.join(rare.select($"fp"), Seq("fp"))
        post.select($"fp", $"doc_id".as("id_a"))
          .join(post.select($"fp", $"doc_id".as("id_b")),
            Seq("fp"))
          .filter($"id_a" < $"id_b")
          .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("shared"))
          .filter($"shared" >= 2)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH $sqlWinnow,
              |fps AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM sel),
              |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64),
              |post AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |  CAST(count(*) AS BIGINT) AS shared
              |FROM post a JOIN post b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |GROUP BY 1, 2 HAVING count(*) >= 2
              |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q359: RENDEZVOUS RESHARDING AUDIT
    // ([[graft.operators.Rendezvous.assign]]): place every document on
    // 8 named shards by highest-random-weight hashing, remove shard
    // s3, re-place on the surviving 7, and account for the movement —
    // the minimal-movement property (ONLY s3's keys move, spreading
    // over the survivors) falls out of the counts. Hash-exact.
    Q(
      "q359_rendezvous_resharding",
      (s, d) => {
        import s.implicits._
        val shards = (0 until 8).map(i => s"s$i")
        val placed = graft.operators.Rendezvous.assign(
          graft.operators.Rendezvous.assign(
            Tables.documents(s, d).select($"doc_id"),
            $"doc_id", shards, "sb"),
          $"doc_id", shards.filterNot(_ == "s3"), "sa")
          .localCheckpoint(true)
        val nb = placed.groupBy($"sb".as("shard"))
          .agg(count(lit(1)).as("n_before"))
        val na = placed.groupBy($"sa".as("shard")).agg(
          count(lit(1)).as("n_after"),
          sum(when($"sb" === "s3", 1L).otherwise(0L)).as("moved_in"))
        nb.join(na, Seq("shard"), "full_outer")
          .select($"shard",
            coalesce($"n_before", lit(0L)).as("n_before"),
            coalesce($"n_after", lit(0L)).as("n_after"),
            coalesce($"moved_in", lit(0L)).as("moved_in"))
          .orderBy($"shard")
      },
      Some("""WITH sh8 AS (SELECT unnest(['s0','s1','s2','s3','s4','s5','s6','s7']) AS s),
             |w8 AS (SELECT d.doc_id, sh8.s,
             |    md5(CAST(d.doc_id AS VARCHAR) || '|' || sh8.s) AS w
             |  FROM documents d CROSS JOIN sh8),
             |b AS (SELECT doc_id, arg_max(s, w) AS sb FROM w8 GROUP BY 1),
             |a AS (SELECT doc_id, arg_max(s, w) AS sa FROM w8
             |  WHERE s <> 's3' GROUP BY 1),
             |placed AS (SELECT b.doc_id, b.sb, a.sa FROM b JOIN a USING (doc_id)),
             |nb AS (SELECT sb AS shard, count(*) AS n_before FROM placed GROUP BY 1),
             |na AS (SELECT sa AS shard, count(*) AS n_after,
             |    sum(CASE WHEN sb = 's3' THEN 1 ELSE 0 END) AS moved_in
             |  FROM placed GROUP BY 1)
             |SELECT coalesce(nb.shard, na.shard) AS shard,
             |  CAST(coalesce(n_before, 0) AS BIGINT) AS n_before,
             |  CAST(coalesce(n_after, 0) AS BIGINT) AS n_after,
             |  CAST(coalesce(moved_in, 0) AS BIGINT) AS moved_in
             |FROM nb FULL OUTER JOIN na ON nb.shard = na.shard
             |ORDER BY shard""".stripMargin)),

    // ---- q360: FELLEGI–SUNTER record-linkage scoring (Fellegi &
    // Sunter 1969) — log-likelihood-ratio match weights over ED≤1 name
    // candidate pairs (q109's FastSS blocking), comparison vector =
    // (nationkey, mktsegment, 1000-unit balance band), m priors exact
    // rationals (19/20, 4/5, 9/10), u estimated from the data as the
    // exact random-agreement ratio Σc(c−1)/N(N−1). Counts hash; the
    // ln-based weight gates at 1e-9 via the poison-row certificate
    // (the q61 pattern).
    Q(
      "q360_fellegi_sunter",
      (s, d) => {
        import s.implicits._
        // one materialization: the blocking pass, the record count,
        // the three field histograms, and both score-join sides all
        // re-read this projection (7 scans of the parquet otherwise)
        val cust = Tables.customer(s, d).filter($"c_custkey" % 5 === 0)
          .localCheckpoint(true)
        val pairs = graft.operators.FuzzyJoin.ed1Pairs(cust, $"c_custkey", $"c_name")
          .select($"id_a", $"id_b")
        graft.operators.RecordLinkage.fellegiSunter(
          cust, $"c_custkey",
          Seq(
            ("nation", $"c_nationkey", 19L, 20L),
            ("segment", $"c_mktsegment", 4L, 5L),
            // exact integer band, +100000 cents keeps the dividend
            // non-negative so truncating and flooring division agree
            ("band", expr(
              "(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000"),
              9L, 10L)),
          pairs)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH emitted AS (SELECT * FROM read_parquet('{{OUT}}/q360_fellegi_sunter/*.parquet')),
             |c AS MATERIALIZED (SELECT c_custkey AS id,
             |    CAST(c_nationkey AS VARCHAR) AS f_nation,
             |    CAST(c_mktsegment AS VARCHAR) AS f_segment,
             |    CAST((CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
             |      AS VARCHAR) AS f_area,
             |    c_name
             |  FROM customer WHERE c_custkey % 5 = 0),
             |prs AS (SELECT a.id AS id_a, b.id AS id_b,
             |    a.f_nation AS na, b.f_nation AS nb,
             |    a.f_segment AS sa, b.f_segment AS sb,
             |    a.f_area AS aa, b.f_area AS ab
             |  FROM c a JOIN c b ON a.id < b.id
             |    AND levenshtein(a.c_name, b.c_name) <= 1),
             |u_nation AS (SELECT CAST(sum(CAST(cc AS HUGEINT) * (cc - 1)) AS DOUBLE)
             |    / CAST((SELECT CAST(count(*) AS HUGEINT) * (count(*) - 1) FROM c
             |            WHERE f_nation IS NOT NULL) AS DOUBLE) AS u
             |  FROM (SELECT count(*) AS cc FROM c WHERE f_nation IS NOT NULL GROUP BY f_nation)),
             |u_segment AS (SELECT CAST(sum(CAST(cc AS HUGEINT) * (cc - 1)) AS DOUBLE)
             |    / CAST((SELECT CAST(count(*) AS HUGEINT) * (count(*) - 1) FROM c
             |            WHERE f_segment IS NOT NULL) AS DOUBLE) AS u
             |  FROM (SELECT count(*) AS cc FROM c WHERE f_segment IS NOT NULL GROUP BY f_segment)),
             |u_area AS (SELECT CAST(sum(CAST(cc AS HUGEINT) * (cc - 1)) AS DOUBLE)
             |    / CAST((SELECT CAST(count(*) AS HUGEINT) * (count(*) - 1) FROM c
             |            WHERE f_area IS NOT NULL) AS DOUBLE) AS u
             |  FROM (SELECT count(*) AS cc FROM c WHERE f_area IS NOT NULL GROUP BY f_area)),
             |scored AS (SELECT id_a, id_b,
             |    (CASE WHEN na IS NOT NULL AND nb IS NOT NULL AND na = nb THEN 1 ELSE 0 END
             |     + CASE WHEN sa IS NOT NULL AND sb IS NOT NULL AND sa = sb THEN 1 ELSE 0 END
             |     + CASE WHEN aa IS NOT NULL AND ab IS NOT NULL AND aa = ab THEN 1 ELSE 0 END)
             |      AS n_agree,
             |    (CASE WHEN na IS NOT NULL AND nb IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN sa IS NOT NULL AND sb IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN aa IS NOT NULL AND ab IS NOT NULL THEN 1 ELSE 0 END)
             |      AS n_compared,
             |    (CASE WHEN na IS NULL OR nb IS NULL THEN 0.0
             |          WHEN na = nb THEN ln((CAST(19 AS DOUBLE)/20) / (SELECT u FROM u_nation))
             |          ELSE ln((1 - CAST(19 AS DOUBLE)/20) / (1 - (SELECT u FROM u_nation))) END
             |     + CASE WHEN sa IS NULL OR sb IS NULL THEN 0.0
             |          WHEN sa = sb THEN ln((CAST(4 AS DOUBLE)/5) / (SELECT u FROM u_segment))
             |          ELSE ln((1 - CAST(4 AS DOUBLE)/5) / (1 - (SELECT u FROM u_segment))) END
             |     + CASE WHEN aa IS NULL OR ab IS NULL THEN 0.0
             |          WHEN aa = ab THEN ln((CAST(9 AS DOUBLE)/10) / (SELECT u FROM u_area))
             |          ELSE ln((1 - CAST(9 AS DOUBLE)/10) / (1 - (SELECT u FROM u_area))) END)
             |      AS weight
             |  FROM prs),
             |flag AS (SELECT (
             |    (SELECT count(*) FROM emitted) = (SELECT count(*) FROM scored)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e JOIN scored x
             |      ON e.id_a = x.id_a AND e.id_b = x.id_b
             |      WHERE e.n_agree <> x.n_agree OR e.n_compared <> x.n_compared
             |         OR abs(e.weight - x.weight) > 1e-9)
             |    AND NOT EXISTS (SELECT 1 FROM emitted e
             |      WHERE NOT EXISTS (SELECT 1 FROM scored x
             |        WHERE x.id_a = e.id_a AND x.id_b = e.id_b))
             |  ) AS ok)
             |SELECT id_a, id_b, CAST(n_agree AS BIGINT) AS n_agree,
             |  CAST(n_compared AS BIGINT) AS n_compared, weight
             |FROM scored WHERE (SELECT ok FROM flag)
             |UNION ALL
             |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |  CAST(-1 AS BIGINT), CAST(-999 AS DOUBLE)
             |WHERE NOT (SELECT ok FROM flag)
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q361: SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo
    // 1995, merge/purge) — every customer pair within a 5-position
    // window of the (name, id) sort order, computed without a global
    // single-partition sort (prefix buckets + offset fold). The
    // oracle replays the window over the true global row_number —
    // proving the distributed position assignment exact. Hash-exact.
    Q(
      "q361_sorted_neighborhood",
      (s, d) => {
        import s.implicits._
        graft.operators.RecordLinkage.sortedNeighborhoodPairs(
          Tables.customer(s, d).filter($"c_custkey" % 3 === 0),
          // names are 'Customer#%09d' — a 14-char prefix keys the
          // buckets on the leading custkey digits (~150 buckets at
          // sf1); the operator default of 2 would put the whole
          // fixture in one bucket
          $"c_custkey", $"c_name", window = 5, prefixLen = 14)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS k FROM customer
             |  WHERE c_custkey % 3 = 0 AND c_custkey IS NOT NULL
             |    AND c_name IS NOT NULL),
             |p AS MATERIALIZED (SELECT id,
             |    CAST(row_number() OVER (ORDER BY k, id) AS BIGINT) AS pos
             |  FROM c)
             |SELECT a.id AS id_a, b.id AS id_b, b.pos - a.pos AS gap
             |FROM p a JOIN p b
             |  ON b.pos > a.pos AND b.pos - a.pos < 5
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q362: 1-D WASSERSTEIN DRIFT — earth-mover distance between
    // the pre/post-2024-01-16 event-value distributions in exact
    // cents ([[graft.operators.KsTest.wasserstein1D]]): the integral
    // sibling of q141's KS sup-gap. Every term exact decimal; the
    // numerator hashes as a string and the final double is one pinned
    // division of two correctly-rounded exact integers — fully
    // hash-exact despite being a float statistic.
    Q(
      "q362_wasserstein_drift",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .filter($"value".isNotNull && $"ts".isNotNull)
        graft.operators.KsTest.wasserstein1D(
          ev, round($"value" * 100).cast("long"),
          $"ts" < lit("2024-01-16").cast("timestamp"), buckets = 256)
      },
      Some("""WITH base AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
             |    (ts < TIMESTAMP '2024-01-16') AS r
             |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
             |pv AS MATERIALIZED (SELECT v,
             |    sum(CASE WHEN r THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS c2
             |  FROM base GROUP BY v),
             |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c2) AS BIGINT) AS n2,
             |    CAST(count(*) AS BIGINT) AS ns FROM pv),
             |cum AS (SELECT v, c1, c2,
             |    sum(c1) OVER w AS cc1, sum(c2) OVER w AS cc2,
             |    lag(v) OVER (ORDER BY v) AS pvv
             |  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW)),
             |terms AS (SELECT
             |    abs(CAST(cc1 - c1 AS HUGEINT) * (SELECT n2 FROM tot)
             |      - CAST(cc2 - c2 AS HUGEINT) * (SELECT n1 FROM tot))
             |      * CAST(v - pvv AS HUGEINT) AS t
             |  FROM cum WHERE pvv IS NOT NULL),
             |num AS (SELECT coalesce(sum(t), CAST(0 AS HUGEINT)) AS w1n FROM terms)
             |SELECT tot.n1 AS n_ref, tot.n2 AS n_cur, tot.ns AS n_support,
             |  CAST(w1n AS VARCHAR) AS w1_num,
             |  CAST(w1n AS DOUBLE)
             |    / (CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE)) AS w1
             |FROM num, tot""".stripMargin)))
}

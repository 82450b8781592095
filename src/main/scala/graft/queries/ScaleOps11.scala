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
             |ORDER BY shard""".stripMargin)))
}

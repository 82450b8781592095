package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching at edit distance ≤ 1 — the entity-resolution
  * primitive (record linkage, spelling-variant mining, near-identical
  * key detection) as an EXACT distributed algorithm: FastSS
  * deletion-neighborhood blocking (Bocek et al. 2007, public
  * literature) + in-block verification.
  *
  * Theorem (k = 1): two strings with levenshtein(a, b) ≤ 1 share a
  * member of variants(s) = {s} ∪ {s minus one char} — equal strings
  * share s; a deletion b = del_i(a) shares b itself; a substitution at
  * i shares del_i(a) = del_i(b); an insertion is the deletion read the
  * other way. The converse is NOT true ("ab"/"ba" share variants at
  * distance 2), so blocking only gates candidates — every surviving
  * pair is verified with the exact `levenshtein` before emission.
  * Sound AND complete: blocking cannot lose a true pair, verification
  * cannot keep a false one.
  *
  * Scale: the quadratic machinery runs over DISTINCT STRINGS, never
  * records. Real dedup corpora are duplicate-heavy (that is why the
  * operator exists), and a string duplicated d times would inflate
  * every variant block it touches by d — in-block comparisons by d².
  * Factoring first (group records by string, keep the sorted id set)
  * makes duplicate density multiply only the FINAL pair expansion
  * (which is the output size, irreducible for an exact operator):
  *   - identical-string pairs (dist 0) expand straight from each
  *     group's id set — no blocking, no levenshtein, emitted once;
  *   - the deletion-neighborhood blocks carry each string once, and
  *     verified string pairs (dist 1, deduped at STRING grain — tiny)
  *     expand to id pairs through two joins against the group table.
  * Each string of length L emits ≤ 1 + L (k = 1) or
  * ≤ 1 + L + L(L−1)/2 (k = 2) variant HASHES — 8-byte block keys from
  * the [[graft.functions.DeletionHashes]] rolling-hash kernel, no
  * variant string ever materialized; a variant block or an
  * identical-string group larger than `maxBlockSize` fails LOUDLY
  * rather than silently dropping pairs — exactness is the contract;
  * raise the cap or pre-filter the hot key instead.
  */
object FuzzyJoin {

  def ed1Pairs(
      df: DataFrame,
      id: Column,
      str: Column,
      maxBlockSize: Int = 1000): DataFrame =
    edPairs(df, id, str, 1, maxBlockSize)

  /** All record pairs with levenshtein(a, b) ≤ k, k ∈ {1, 2} — the
    * depth-k FastSS generalization. Theorem (Bocek et al.): an optimal
    * edit script aligning a and b at cost ≤ k yields a common string
    * reachable by ≤ k deletions from EACH side (delete the edited
    * position on whichever side carries it — a substitution deletes
    * one char from both, an insertion/deletion deletes from one), so
    * Del≤k(a) ∩ Del≤k(b) ≠ ∅ is a complete candidate condition; exact
    * verification keeps it sound. Depth 2 emits ≤ 1 + L + L(L−1)/2
    * variants per DISTINCT string — the distinct-string factoring is
    * what keeps that quadratic-in-L fan-out off the record axis.
    */
  def edPairs(
      df: DataFrame,
      id: Column,
      str: Column,
      k: Int,
      maxBlockSize: Int = 1000): DataFrame = {
    require(k == 1 || k == 2, s"edPairs supports k in {1, 2}, got $k")
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val base = df.select(id.cast("long").as("id"), str.as("s"))
      .filter(col("id").isNotNull && col("s").isNotNull)
    // distinct-string factoring: one row per string with its sorted id
    // set. collect_set so degenerate duplicate (id, s) rows collapse —
    // the record-grain algorithm never paired an id with itself either.
    // Tiny (bounded by the vocabulary, not the corpus) — materialized
    // once, read three times (dist-0 expansion + both ed-1 join sides).
    val groups = base.groupBy(col("s"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .select(col("s"),
        when(size(col("ids")) > maxBlockSize, raise_error(concat(
          lit(s"edPairs(k=$k): identical-string group exceeds maxBlockSize=$maxBlockSize for '"),
          col("s"), lit("' — raise the cap or pre-filter the hot key"))))
          .otherwise(col("ids")).as("ids"))
      .localCheckpoint(true)
    // dist-0: in-group (i < j) expansion of the sorted id set — id_a <
    // id_b by construction, each identical pair emitted exactly once
    val eq = groups.filter(size(col("ids")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ids")) - 2),
        i => transform(
          slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          j => struct(
            element_at(col("ids"), i + 1).as("id_a"),
            j.as("id_b"),
            lit(0).as("dist")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.dist").as("dist"))
    // block key = a 64-bit HASH of each deletion variant, computed by
    // the [[graft.functions.DeletionHashes]] rolling-hash kernel
    // without materializing a single variant string: the shuffle
    // carries an 8-byte long per row instead of an L-char string, the
    // per-group compares are long equality, and the 1 + L + L(L−1)/2
    // substr/concat allocations per row disappear entirely (measured
    // 2.8 s → sub-second on the sf1 q365 variant stage). A 64-bit
    // collision can only MERGE two blocks — the union of their
    // candidates still passes exact verification, so completeness AND
    // soundness are untouched (collisions add candidates, never lose
    // them). The kernel's del-variant hash equals the hash the variant
    // would get as a full string, so cross-string keys agree exactly.
    val spark = df.sparkSession
    val variants = groups.select(
      col("s"),
      explode(graft.functions.GraftFunctions.delHashes(spark, col("s"), k))
        .as("vh"))
    val blocks = variants.groupBy(col("vh"))
      .agg(sort_array(collect_list(col("s"))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(when(size(col("ms")) > maxBlockSize, raise_error(concat(
        lit(s"edPairs(k=$k): variant block exceeds maxBlockSize=$maxBlockSize near '"),
        element_at(col("ms"), 1),
        lit("' — raise the cap or pre-filter the hot key"))))
        .otherwise(col("ms")).as("ms"))
    // in-block (i < j) expansion with the EXACT verification inside
    // the lambda: rejected candidates never reach the flatten buffer
    // or the dedup exchange. Strings in a block are distinct, so the
    // verified distance is in [1, k] and sa < sb lexicographically —
    // a string pair surfaces from several shared variants
    // (substitutions share one per edited position); dedup at string
    // grain, BEFORE duplicate density multiplies anything. The
    // verifier is the banded early-exit kernel
    // ([[graft.functions.LevenshteinAtMost]] — common prefix/suffix
    // strip + Ukkonen band, ONE call per candidate) rather than two
    // full-DP `levenshtein` evaluations; its values equal Spark's
    // `levenshtein` wherever ≤ k, so the contract is unchanged.
    val strPairs = blocks.select(explode(flatten(transform(
      sequence(lit(0), size(col("ms")) - 2),
      i => {
        val a = element_at(col("ms"), i + 1)
        filter(
          transform(
            slice(col("ms"), i + 2, size(col("ms")) - i - 1),
            b => struct(a.as("sa"), b.as("sb"),
              graft.functions.GraftFunctions.levAtMost(spark, a, b, k).as("dist"))),
          p => p.getField("dist") > 0)
      }))).as("p"))
      .select(col("p.sa").as("sa"), col("p.sb").as("sb"), col("p.dist").as("dist"))
      .dropDuplicates("sa", "sb")
    // expand verified string pairs to id pairs: two joins against the
    // tiny group table (broadcast-sized by construction), output
    // written map-side. When (id, string) is functionally unique —
    // the overwhelmingly common case — a record pair has ONE
    // unordered string pair, every id carries one spelling, and the
    // union below is already pair-distinct. Only the degenerate
    // multi-spelling case (one id, several strings, admitted by the
    // ia ≠ ib filter) can surface the same id pair twice: from the eq
    // branch AND near, or twice from near via two distinct verified
    // string pairs. Detect that case with one tiny aggregate over the
    // (already materialized) group table and pay the min-dist rollup
    // — a shuffle sized by the RESULT, which at sf1 is the single
    // largest frame this operator produces — ONLY when it can matter.
    val near = strPairs
      .join(groups.select(col("s").as("sa"), col("ids").as("ids_a")), Seq("sa"))
      .join(groups.select(col("s").as("sb"), col("ids").as("ids_b")), Seq("sb"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("dist"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("dist"))
      .filter(col("ia") =!= col("ib"))
      .select(
        least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        col("dist"))
    val combined = eq.unionByName(near)
    val multiSpelling = !groups
      .select(explode(col("ids")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1L)
      .isEmpty
    if (multiSpelling)
      combined.groupBy(col("id_a"), col("id_b"))
        .agg(min(col("dist")).as("dist"))
    else combined
  }
}

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
  * Scale: each string of length L emits ≤ L+1 variant rows — the
  * shuffle carries (variant, id, string), grouped by variant; pair
  * expansion runs inside blocks and the exact verification runs
  * BEFORE the candidate dedup (the q25 lesson: shuffling rejects just
  * to dedup them is wasted exchange). A variant shared by more than
  * `maxBlockSize` strings fails LOUDLY rather than silently dropping
  * pairs — exactness is the contract; raise the cap or pre-filter the
  * hot key instead.
  */
object FuzzyJoin {

  def ed1Pairs(
      df: DataFrame,
      id: Column,
      str: Column,
      maxBlockSize: Int = 1000): DataFrame = {
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val base = df.select(id.cast("long").as("id"), str.as("s"))
      .filter(col("id").isNotNull && col("s").isNotNull)
    // sequence(0, -1) throws for the empty string — it has no
    // deletions, only itself
    val dels = when(length(col("s")) > 0, transform(
      sequence(lit(0), length(col("s")) - 1),
      i => concat(col("s").substr(lit(1), i), col("s").substr(i + lit(2), length(col("s"))))))
      .otherwise(array().cast("array<string>"))
    val variants = base.select(
      col("id"), col("s"),
      explode(array_distinct(concat(array(col("s")), dels))).as("v"))
    val blocks = variants.groupBy(col("v"))
      .agg(sort_array(collect_list(struct(col("id"), col("s")))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(when(size(col("ms")) > maxBlockSize, raise_error(concat(
        lit(s"ed1Pairs: variant block exceeds maxBlockSize=$maxBlockSize for variant '"),
        col("v"), lit("' — raise the cap or pre-filter the hot key"))))
        .otherwise(col("ms")).as("ms"))
    // in-block (i < j) expansion with the EXACT verification inside
    // the lambda: rejected pairs never reach the flatten buffer or the
    // dedup exchange
    val pairs = blocks.select(explode(flatten(transform(
      sequence(lit(0), size(col("ms")) - 2),
      i => {
        val a = element_at(col("ms"), i + 1)
        transform(
          filter(
            slice(col("ms"), i + 2, size(col("ms")) - i - 1),
            b => b.getField("id") =!= a.getField("id") &&
              levenshtein(a.getField("s"), b.getField("s")) <= 1),
          b => struct(
            a.getField("id").as("id_a"),
            b.getField("id").as("id_b"),
            levenshtein(a.getField("s"), b.getField("s")).as("dist")))
      }))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.dist").as("dist"))
    // a pair can surface from several shared variants (substitutions
    // share one per edited position) — one exchange of verified pairs
    pairs.dropDuplicates("id_a", "id_b")
  }
}

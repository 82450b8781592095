package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FELLEGI–SUNTER probabilistic record linkage (Fellegi & Sunter,
  * JASA 1969 — the decision-theoretic foundation every modern linkage
  * tool implements): candidate pairs score the log-likelihood ratio of
  * "same entity" vs "random pair" summed over field agreements,
  *
  *   w(a,b) = Σ_f  agree_f ? ln(m_f / u_f) : ln((1−m_f) / (1−u_f)),
  *
  * where m_f = P(field f agrees | match) and u_f = P(field f agrees |
  * non-match). m comes from the caller as EXACT RATIONAL priors (the
  * supervised/Splink-style setup); u is ESTIMATED FROM THE DATA as the
  * random-agreement probability of field f,
  *
  *   u_f = Σ_v c_v(c_v−1) / (N(N−1)),
  *
  * an exact integer ratio from the field's value histogram — the
  * standard estimator (a random pair agrees iff both draw the same
  * value). Fields where either side is NULL contribute 0 (the
  * missing-at-random treatment), so null-heavy fields dilute nothing.
  *
  * Scale shape: one histogram aggregation per field over the RECORDS
  * (never pairs), the Σc(c−1)/N(N−1) moments in decimal(38,0) (counts
  * past 2^31.5 would wrap a long product), and the per-pair score is
  * a map-side projection after two hash joins attach the field
  * vectors — candidate generation (blocking) stays the caller's
  * concern ([[FuzzyJoin]], LSH, sorted-neighborhood). ln is libm, so
  * oracles gate `weight` at tolerance while `n_agree` hashes exactly.
  *
  * Output per pair: (id_a, id_b, n_agree, n_compared, weight).
  */
object RecordLinkage {

  /** @param fields (name, value expression over `records`, mNum, mDen):
    *               the comparison vector, each with its exact-rational
    *               m prior (0 < m < 1).
    */
  def fellegiSunter(
      records: DataFrame,
      id: Column,
      fields: Seq[(String, Column, Long, Long)],
      pairs: DataFrame): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter needs at least one field")
    fields.foreach { case (n, _, mNum, mDen) =>
      require(mNum > 0 && mNum < mDen,
        s"field $n: m must be a rational in (0,1), got $mNum/$mDen")
    }
    val idG = when(id.cast("long").isNull, raise_error(lit(
      "fellegiSunter: record id is null or not castable to long")))
      .otherwise(id.cast("long"))
    val base = records.select(
      idG.as("__rl_id") +: fields.map { case (n, c, _, _) =>
        c.cast("string").as(s"__f_$n")
      }: _*)
    val n = base.count()
    require(n >= 2, s"fellegiSunter needs >= 2 records, got $n")
    // u_f = Σ c_v(c_v−1) / (N_f(N_f−1)) over NON-NULL values of f
    // (N_f = non-null count — a null can never agree, so it is outside
    // f's agreement universe); decimal moments, one pinned division.
    // ALL fields' histograms run in ONE job: rows explode to
    // (field, value), one two-level aggregation folds every field's
    // value histogram to its moments, one collect of ≤ #fields rows —
    // a per-field `.first()` loop was #fields sequential stages of
    // pure scheduling latency on small inputs
    val fv = explode(array(fields.map { case (name, _, _, _) =>
      struct(lit(name).as("f"), col(s"__f_$name").as("v"))
    }: _*))
    val moments = base
      .select(fv.as("x"))
      .filter(col("x.v").isNotNull)
      .groupBy(col("x.f").as("f"), col("x.v").as("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("f"))
      .agg(
        sum(col("c")).as("nf"),
        sum(col("c").cast("decimal(19,0)") * (col("c") - 1).cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("num"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    val us: Seq[Double] = fields.map { case (name, _, _, _) =>
      val (nf, num) = moments.getOrElse(name, (0L, null))
      require(nf >= 2, s"fellegiSunter: field $name has < 2 non-null values")
      require(num.signum() > 0,
        s"fellegiSunter: field $name is all-distinct — u = 0 makes the " +
          "agreement weight infinite; drop or coarsen the field")
      // one double division of two correctly-rounded exact integers —
      // the replayable shape (a higher-precision intermediate would
      // double-round differently per engine)
      val u = new java.math.BigDecimal(num.toBigInteger).doubleValue() /
        java.math.BigDecimal.valueOf(nf)
          .multiply(java.math.BigDecimal.valueOf(nf - 1)).doubleValue()
      require(u < 1.0, s"fellegiSunter: field $name is constant — u = 1")
      u
    }
    val a = base.select(col("__rl_id").as("__ida") +:
      fields.map { case (n2, _, _, _) => col(s"__f_$n2").as(s"__fa_$n2") }: _*)
    val b = base.select(col("__rl_id").as("__idb") +:
      fields.map { case (n2, _, _, _) => col(s"__f_$n2").as(s"__fb_$n2") }: _*)
    val joined = pairs
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
      .join(a, col("id_a") === col("__ida"))
      .join(b, col("id_b") === col("__idb"))
    val contribs = fields.zip(us).map { case ((name, _, mNum, mDen), u) =>
      val fa = col(s"__fa_$name")
      val fb = col(s"__fb_$name")
      val m = mNum.toDouble / mDen.toDouble
      val agreeW = math.log(m / u)
      val disW = math.log((1.0 - m) / (1.0 - u))
      val agree = fa.isNotNull && fb.isNotNull && fa === fb
      val compared = fa.isNotNull && fb.isNotNull
      (when(agree, lit(agreeW)).when(compared, lit(disW)).otherwise(lit(0.0)),
        when(agree, 1L).otherwise(0L),
        when(compared, 1L).otherwise(0L))
    }
    joined.select(
      col("id_a"), col("id_b"),
      contribs.map(_._2).reduce(_ + _).as("n_agree"),
      contribs.map(_._3).reduce(_ + _).as("n_compared"),
      contribs.map(_._1).reduce(_ + _).as("weight"))
  }

  /** SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo, SIGMOD 1995 —
    * the merge/purge method): sort records by a blocking key and emit
    * every pair within a sliding window of `window` positions — the
    * classic complement to deletion-neighborhood ([[FuzzyJoin]]) and
    * LSH blocking: it catches near-matches whose ERRORS ARE IN THE
    * KEY'S TAIL (same prefix, different suffix) at linear pair volume
    * N·(window−1).
    *
    * The global sort position is computed WITHOUT a single-partition
    * window: records bucket by a caller-chosen PREFIX of the key
    * (`prefixLen` chars — the same bounded-block contract as
    * [[FuzzyJoin.ed1Pairs]], guarded by `maxBucketSize`), per-bucket
    * counts fold to prefix offsets over the ≤ #buckets-row count
    * frame, and the in-bucket rank is a per-bucket window. The total
    * order is (key, id) — unique, so positions are deterministic.
    * Window pairs join on position blocks (block and next block — a
    * pair within `window` spans at most two), never all-pairs.
    *
    * Output: (id_a, id_b, gap) for every pair with
    * 0 < pos(b) − pos(a) < window, gap = the position distance.
    * Null ids/keys drop (they have no place on the sort axis — the
    * [[FuzzyJoin]] convention).
    */
  def sortedNeighborhoodPairs(
      records: DataFrame,
      id: Column,
      key: Column,
      window: Int,
      prefixLen: Int = 2,
      maxBucketSize: Int = 1000000): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    val base = records
      .select(id.cast("long").as("id"), key.cast("string").as("k"))
      .filter(col("id").isNotNull && col("k").isNotNull)
      .withColumn("b", substring(col("k"), 1, prefixLen))
    val counts = base.groupBy(col("b")).agg(count(lit(1)).as("c"))
    val wPrefix = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum(col("c")).over(wPrefix), lit(0L)))
      .select(col("b").as("ob"),
        when(col("c") > maxBucketSize, raise_error(concat(
          lit(s"sortedNeighborhoodPairs: prefix bucket exceeds $maxBucketSize for '"),
          col("b"), lit("' — lengthen prefixLen or raise the cap"))))
          .otherwise(col("off")).as("off"))
    val wRank = Window.partitionBy(col("b")).orderBy(col("k").asc, col("id").asc)
    val pos = base
      .join(offsets, col("b") === col("ob"))
      .withColumn("pos", col("off") + row_number().over(wRank).cast("long"))
      .select(col("id"), col("pos"))
    val l = pos.select(col("id").as("id_a"), col("pos").as("pa"),
      expr(s"pos div $window").as("blk"))
    val r = pos.select(col("id").as("id_b"), col("pos").as("pb"),
        expr(s"pos div $window").as("rb"))
      // a pair within `window` spans at most two consecutive blocks:
      // the right side registers under its own block AND the previous
      .select(col("id_b"), col("pb"),
        explode(array(col("rb"), col("rb") - 1)).as("blk"))
    l.join(r, Seq("blk"))
      .filter(col("pb") > col("pa") && col("pb") - col("pa") < window)
      .select(col("id_a"), col("id_b"), (col("pb") - col("pa")).as("gap"))
  }

  /** PHONETIC BLOCKING — candidate pairs whose keys share an American
    * Soundex code (Russell & Odell's 1918 patent algorithm, public
    * domain; the second blocking key Hernández & Stolfo's merge/purge
    * runs alongside sorted-neighborhood): same-sounding names land in
    * the same block regardless of spelling-tail errors, the failure
    * mode prefix blocking misses. Spark's built-in `soundex` is the
    * NARA variant — H/W are skipped entirely (the previous consonant
    * code persists across them: ASHCRAFT → A261), vowels separate
    * duplicate codes, output is letter + 3 digits zero-padded.
    *
    * Scale shape: one code projection over the records, one block
    * histogram (≤ 26·7³ distinct codes), and the pair self-join keyed
    * on the code — never all-pairs. Blocks above `maxBlockSize` raise
    * loudly (through a payload column, keeping the join key clean)
    * rather than silently exploding quadratically: phonetic codes are
    * coarse (every "Customer#…" name shares one), so the guard is the
    * operator's semantics, not a tuning detail.
    *
    * Output per pair: (id_a, id_b, code, block_n) with id_a < id_b
    * under the id column's natural ordering.
    */
  def phoneticPairs(
      records: DataFrame,
      id: Column,
      key: Column,
      maxBlockSize: Int = 100000): DataFrame = {
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val base = records
      .select(id.as("pid"), key.cast("string").as("k"))
      .filter(col("pid").isNotNull && col("k").isNotNull)
      .select(col("pid"), soundex(col("k")).as("code"))
    // the guard lives in a FILTER, not a payload column: a projected
    // raise column would be pruned away whenever the caller doesn't
    // select block_n (e.g. a bare count), silently skipping the guard
    val blocks = base.groupBy(col("code")).agg(count(lit(1)).as("bn"))
      .filter(when(col("bn") > maxBlockSize, raise_error(concat(
        lit(s"phoneticPairs: block exceeds $maxBlockSize records for code '"),
        col("code"), lit("' — pre-split the block or raise the cap"))))
        .otherwise(lit(true)))
      .select(col("code").as("bc"), col("bn"))
    val g = base.join(blocks, col("code") === col("bc"))
      .select(col("pid"), col("code"), col("bn"))
    g.as("a").join(g.as("b"),
        col("a.code") === col("b.code") && col("a.pid") < col("b.pid"))
      .select(col("a.pid").as("id_a"), col("b.pid").as("id_b"),
        col("a.code").as("code"), col("a.bn").as("block_n"))
  }

  /** MONGE–ELKAN hybrid similarity (Monge & Elkan, 1996 — the
    * standard token-level/character-level hybrid for multi-word field
    * comparison): each token of A takes its best character-level match
    * in B, and the score is the mean of those maxima,
    *
    *   ME(A→B) = (1/|A|) Σ_{t∈A} max_{u∈B} jw(t, u),
    *
    * with Jaro–Winkler as the inner kernel
    * ([[graft.functions.JaroWinkler]] — codegen'd, byte-level pinned
    * to DuckDB's own `jaro_winkler_similarity`). ME is ASYMMETRIC
    * (a name contained in a longer one scores high one way); both
    * directions are emitted — symmetrizing (mean/max) is the caller's
    * policy decision.
    *
    * Scale shape: blocking is the caller's concern (the [[FuzzyJoin]]
    * / [[sortedNeighborhoodPairs]] / [[phoneticPairs]] contract);
    * scoring attaches each side's token array with one equi-join and
    * folds |A|·|B| kernel evaluations per pair map-side, left-to-right
    * over the token arrays (a pinned order the oracle can replay).
    * Records with NO tokens fail loudly — the mean of an empty set is
    * a policy question the operator refuses to answer silently.
    *
    * Output per pair: (id_a, id_b, me_ab, me_ba).
    */
  def mongeElkan(
      records: DataFrame,
      id: Column,
      text: Column,
      pairs: DataFrame): DataFrame = {
    val spark = records.sparkSession
    val idG = when(id.cast("long").isNull, raise_error(lit(
      "mongeElkan: record id is null or not castable to long")))
      .otherwise(id.cast("long"))
    val toksRaw = filter(split(text.cast("string"), " "), t => t =!= "")
    val toks = when(size(toksRaw) === 0, raise_error(lit(
      "mongeElkan: record has no tokens — filter empties first")))
      .otherwise(toksRaw)
    val base = records.select(idG.as("__me_id"), toks.as("__me_toks"))
    def me(a: Column, b: Column): Column =
      aggregate(a, lit(0.0), (acc, t) => acc +
        array_max(transform(b, u =>
          graft.functions.GraftFunctions.jaroWinkler(spark, t, u)))) /
        size(a).cast("double")
    pairs
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .join(base.select(col("__me_id").as("__ida"), col("__me_toks").as("ta")),
        col("id_a") === col("__ida"))
      .join(base.select(col("__me_id").as("__idb"), col("__me_toks").as("tb")),
        col("id_b") === col("__idb"))
      .select(col("id_a"), col("id_b"),
        me(col("ta"), col("tb")).as("me_ab"),
        me(col("tb"), col("ta")).as("me_ba"))
  }
}

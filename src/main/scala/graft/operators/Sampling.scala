package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing.
  *
  * The 100 TB story: sampling is a pure map-side FILTER on a content
  * hash — no RNG (a re-executed task must keep the same rows), no
  * shuffle, append-stable (a row's fate never depends on what else is
  * in the corpus), reproducible across engines (md5 buckets, the same
  * portability trick as [[Dedup.splitAssign]]).
  */
object Sampling {

  /** Keep-predicate for PER-STRATUM rate sampling (data-mixing weights:
    * e.g. downsample an overrepresented language to 30% while keeping
    * 100% of a rare one). A row survives iff its content-hash bucket
    * (first 8 md5 hex chars mod 100 — a 32-bit bucket, so the mod-100
    * bias is < 10⁻⁸, vs ~0.15% for the 16-bit bucket this replaces)
    * falls below its stratum's percentage; strata missing from `rates`
    * use `defaultRate`.
    *
    * Hash on a CONTENT column (not a sequential id) so survival is
    * stable under re-ingestion and id reassignment. `hashOn` must be a
    * STRING column: the binary cast that feeds md5 resolves only for
    * strings — a numeric column fails analysis rather than hashing an
    * engine-private byte layout that no oracle could reproduce.
    */
  def stratifiedKeep(
      stratum: Column,
      hashOn: Column,
      rates: Map[String, Int],
      defaultRate: Int): Column = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 100, s"sampling rates are percentages in [0,100], got $r"))
    val bucket = md5Bucket32(md5(hashOn.cast("binary"))) % 100
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    bucket < rate
  }

  /** The one md5-portability idiom both sampling operators share: the
    * first 8 hex chars of an md5 HEX column as a 32-bit long bucket
    * (any engine reproduces it with `('0x' || substring(md5(x),1,8))
    * :: BIGINT`). Null content hashes to null — callers own the null
    * policy.
    */
  private def md5Bucket32(md5Hex: Column): Column =
    conv(substring(md5Hex, 1, 8), 16, 10).cast("long")

  /** Deterministic global shuffle + sharding for training-data output:
    * every row gets a `shard` (which output file) and `pos` (its rank
    * inside that file), both pure functions of CONTENT — no RNG, so a
    * re-executed task, a re-ingested corpus, or a different engine all
    * produce the identical example order. This is the "shuffle the
    * corpus before training" step done the only way that is both
    * reproducible and distributed: order by a cryptographic hash of the
    * content.
    *
    * Scale shape: the md5/bucket computation is map-side; the one
    * shuffle (partition by shard) is THE POINT of the operator — a
    * global shuffle moves the corpus once no matter how it is
    * expressed. Per-shard ranking is a window over one shard, and
    * `numShards` scales with the corpus (pick shards ≈ output files of
    * ~1 GB), so each reducer owns one output file's worth of rows by
    * construction — there is no single-reducer stratum here because
    * the operator OWNS the partition count.
    *
    * Ordering ties (byte-identical `hashOn` content) break by `id`, so
    * the output is a total order. `hashOn` must be a STRING column
    * (same md5-portability contract as [[stratifiedKeep]]) and must be
    * NON-NULL: a null hash would mean a null shard — a row the "every
    * row gets a shard" contract cannot place — so the operator THROWS
    * on the first null instead of silently writing a shard=null output
    * file (`coalesce` the column first if empty content is valid).
    */
  def shuffleShard(
      df: org.apache.spark.sql.DataFrame,
      hashOn: Column,
      id: Column,
      numShards: Int): org.apache.spark.sql.DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    // the OUTPUT columns are a fixed contract; silently replacing a
    // caller's same-named column would corrupt their frame — refuse
    Seq("shard", "pos").foreach(c =>
      require(!df.columns.contains(c),
        s"shuffleShard adds a '$c' column but the input already has one — rename it first"))
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val hC = s"__shs_h_$tag"; val idC = s"__shs_id_$tag"
    val guardedHash = when(hashOn.isNull, raise_error(lit(
      "shuffleShard: null hashOn content cannot be placed in any shard — " +
        "coalesce the column first if empty content is intended")))
      .otherwise(md5(hashOn.cast("binary")))
    val withH = df.withColumn(hC, guardedHash).withColumn(idC, id)
    val shard = md5Bucket32(col(hC)) % numShards
    val pos = org.apache.spark.sql.functions.row_number().over(
      Window.partitionBy(shard).orderBy(col(hC), col(idC)))
    withH
      .withColumn("shard", shard)
      .withColumn("pos", pos)
      .drop(hC, idC)
  }

  /** SEQUENCE PACKING: assign items (chunks/documents with a token
    * `size`) to fixed-capacity training bins — the step that turns
    * chunked documents into dense fixed-length training batches.
    * Deterministic first-fit-decreasing WITHIN content-hash shards:
    * items shard by md5(id), sort (size desc, id asc) inside their
    * shard, and fill bins sequentially — a new bin opens when the
    * current one cannot take the next item. Oversized items (size >
    * `binCapacity`) get a bin of their own rather than vanishing.
    * Returns (id, shard, bin) where `bin` is the shard-local bin
    * ordinal.
    *
    * Scale shape: true global bin packing is inherently sequential, so
    * the operator makes the PARALLEL UNIT explicit — shards pack
    * independently. The plan is one shuffle (repartition by shard), a
    * Tungsten sort within partitions on (shard, size desc, id), and an
    * O(n) CONSTANT-MEMORY streaming scan that carries only (current
    * shard, bin, fill) across rows — shards of any size pack without
    * materializing a per-shard list, and the sort spills instead of
    * OOMing. mapPartitions is the honest tool here: the fill state is
    * genuinely sequential per shard and reduces to three scalars.
    * Per-shard packing loses at most one partially-filled bin per
    * shard vs a global pack — negligible when shards hold thousands of
    * bins. No RNG anywhere: re-runs and other engines reproduce the
    * identical assignment (the scan's output depends only on the
    * sorted order, never on partition boundaries — a shard change
    * resets the state).
    */
  def packChunks(
      df: org.apache.spark.sql.DataFrame,
      id: Column,
      size: Column,
      binCapacity: Long,
      numShards: Int): org.apache.spark.sql.DataFrame = {
    require(binCapacity >= 1, s"binCapacity must be >= 1, got $binCapacity")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "packChunks: id is null or not castable to long"))).otherwise(id.cast("long"))
    val guardedSize = when(size.cast("long").isNull || size.cast("long") < 0,
      raise_error(lit("packChunks: size must be a non-null non-negative integer")))
      .otherwise(size.cast("long"))
    val base = df.select(guardedId.as("id"), guardedSize.as("size"))
      .withColumn("shard", md5Bucket32(md5(col("id").cast("string").cast("binary"))) % numShards)
    val spark = df.sparkSession
    import spark.implicits._
    base.select(col("id"), col("size"), col("shard")).as[(Long, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("size").desc, col("id"))
      .mapPartitions { it =>
        // first-fit-decreasing fill, state reset at every shard change;
        // `used > 0` keeps an oversized FIRST item in bin 0 (with sizes
        // sorted desc, used == 0 mid-shard implies every remaining size
        // is 0, so the guard only matters for that first item)
        var curShard = 0L; var bin = 0; var used = 0L; var started = false
        it.map { case (rid, rsize, rshard) =>
          if (!started || rshard != curShard) {
            started = true; curShard = rshard; bin = 0; used = rsize
          } else if (used > 0 && used + rsize > binCapacity) {
            bin += 1; used = rsize
          } else used += rsize
          (rid, rshard, bin)
        }
      }
      .toDF("id", "shard", "bin")
  }

  /** TEMPERATURE-FLATTENED mixture sampling: downsample each stratum
    * with `rate_s = min(1, baseRate · (n_max / n_s)^alpha)` — the
    * multilingual/multi-source reweighting that keeps big sources from
    * drowning rare ones (alpha = 0 keeps natural proportions scaled by
    * `baseRate`; alpha = 1 fully flattens toward uniform). The keep
    * decision is the same content-hash bucket as [[stratifiedKeep]],
    * so it is RNG-free, append-stable, and engine-portable.
    *
    * Rates derive only from per-stratum counts and their max — exact
    * integers — so every engine computes identical rates. At
    * alpha = 0.5 the power is evaluated as sqrt (IEEE
    * correctly-rounded, hence bit-portable); other alphas go through
    * pow(), whose last-ulp behavior may differ across math libraries —
    * fine for sampling, but a bit-exact cross-engine oracle should
    * stick to 0.5. One tiny count aggregation broadcast back; the
    * corpus itself is touched by a single map-side filter.
    */
  def temperatureSample(
      df: org.apache.spark.sql.DataFrame,
      stratum: Column,
      hashOn: Column,
      baseRate: Double,
      alpha: Double): org.apache.spark.sql.DataFrame = {
    require(baseRate > 0 && baseRate <= 1.0, s"baseRate must be in (0,1], got $baseRate")
    require(alpha >= 0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val sC = s"__ts_s_$tag"; val nC = s"__ts_n_$tag"; val mC = s"__ts_m_$tag"
    val base = df.withColumn(sC, stratum)
    val counts = base.groupBy(col(sC)).agg(count(lit(1)).as(nC))
    val withMax = counts.crossJoin(broadcast(counts.agg(max(col(nC)).as(mC))))
    val ratio = col(mC).cast("double") / col(nC).cast("double")
    val flat = if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 0.0) lit(1.0)
      else pow(ratio, lit(alpha))
    val rates = withMax.select(
      col(sC).as(sC + "_r"),
      least(lit(1.0), lit(baseRate) * flat).as(s"__ts_rate_$tag"))
    // same 32-bit md5 bucket as stratifiedKeep, compared as a fraction
    // of the full 32-bit space so any rate in [0,1] maps exactly.
    // No broadcast HINT on rates: one row per stratum means AQE
    // broadcasts it on its own in the documented regime (tens of
    // strata), while a forced hint on a high-cardinality stratum
    // column would OOM the driver (same policy as tokenBudgetCap)
    val bucket = md5Bucket32(md5(hashOn.cast("binary")))
    base.join(rates, col(sC) <=> col(sC + "_r"), "left")
      .filter(bucket.cast("double") < col(s"__ts_rate_$tag") * 4294967296.0)
      .select(df.columns.map(col): _*)
  }

  /** Cap each stratum (source/domain) at a TOKEN budget, keeping its
    * best documents first — the data-mixing step that turns "40% web,
    * 30% books…" recipes into concrete row sets. Rows are ranked inside
    * their stratum by (`quality` desc, `id` asc — fully deterministic)
    * and kept while the BUDGET-INCLUSIVE running token total stays
    * within `tokenBudget` (the first document that crosses the budget
    * is kept; subsequent ones drop — so a stratum whose single best doc
    * exceeds the budget still contributes it rather than vanishing).
    *
    * A running sum is ORDER-DEPENDENT, so its window cannot be salted
    * the way a hot groupBy key can — and strata are few by nature (a
    * mixing recipe has tens of sources), so a plain per-stratum window
    * would hand each reducer an entire stratum: terabytes through one
    * task at corpus scale. This runs TWO-PHASE instead:
    *
    *  1. rows map-side bucket by quality (`qualityBuckets` equal-width
    *     slices of the stratum's finite quality range, computed from a
    *     broadcast per-stratum min/max — bucketing is monotone in
    *     quality and ties share a bucket, so bucket order refines the
    *     ranking exactly);
    *  2. one tiny aggregation gives each (stratum, bucket) its token
    *     sum, and a window over that AGGREGATED frame (≤ buckets+4 rows
    *     per stratum) gives each bucket its exclusive prefix E and
    *     inclusive total T;
    *  3. broadcast back: buckets with T < budget are kept MAP-SIDE
    *     (every row's preceding total is < budget — no shuffle touches
    *     them), buckets with E ≥ budget drop map-side, and only the
    *     single BOUNDARY bucket per stratum (E < budget ≤ T) runs the
    *     exact running-sum window, seeded with E — so the only
    *     per-row sort covers the sliver of rows around the cutoff,
    *     not the stratum.
    *
    * Semantics are IDENTICAL to the single-window formulation,
    * including the budget-inclusive rule and null handling (null
    * tokens drop; null/NaN quality rank as in `quality.desc`: NaN
    * first, nulls last), for any integral token type. Floating-point
    * token counts would make the bucket pre-sums order-sensitive, and
    * NEGATIVE token counts would break the bucket bounds entirely —
    * the operator detects negatives per stratum and throws rather than
    * returning a plausible wrong set.
    */
  def tokenBudgetCap(
      df: org.apache.spark.sql.DataFrame,
      stratum: Column,
      tokens: Column,
      quality: Column,
      id: Column,
      tokenBudget: Long,
      qualityBuckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(qualityBuckets >= 1, s"qualityBuckets must be >= 1, got $qualityBuckets")
    val B = qualityBuckets
    // collision-proof scratch names: a fixed name would silently
    // clobber (and then drop) a caller's column of that name. The
    // "__tbc_" prefixes are load-bearing for the plan-shape spec, which
    // identifies the tiny bucket-prefix window by its aggregated-sum
    // output column.
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val sC = s"__tbc_stratum_$tag"; val tC = s"__tbc_tokens_$tag"
    val qC = s"__tbc_quality_$tag"; val iC = s"__tbc_id_$tag"
    val bC = s"__tbc_bucket_$tag"; val sumC = s"__tbc_s_$tag"
    val eC = s"__tbc_e_$tag"; val tTotC = s"__tbc_t_$tag"
    val qminC = s"__tbc_qmin_$tag"; val qmaxC = s"__tbc_qmax_$tag"
    val tokminC = s"__tbc_tokmin_$tag"; val cumC = s"__tbc_cum_$tag"

    val outCols = df.columns.toSeq.map(col)
    val base = df
      .withColumn(sC, stratum).withColumn(tC, tokens)
      .withColumn(qC, quality).withColumn(iC, id)
    // the bucket geometry works on quality AS A DOUBLE; a non-numeric
    // quality (e.g. a string) would cast to null and silently rank
    // nulls-last instead of its native ordering — refuse it up front
    base.schema(qC).dataType match {
      case _: org.apache.spark.sql.types.NumericType | org.apache.spark.sql.types.NullType =>
      case other => throw new IllegalArgumentException(
        s"tokenBudgetCap requires a numeric quality column (bucket cutoffs are " +
          s"computed on doubles); got ${other.simpleString} — rank on a numeric " +
          "score, or map the ordering to a number first")
    }
    val qD = col(qC).cast("double")

    // per-stratum FINITE quality range (bucket geometry) + the
    // non-negativity witness for tokens; both partially aggregate
    // map-side to one row per stratum
    val finite = !isnan(qD) && qD =!= Double.PositiveInfinity && qD =!= Double.NegativeInfinity
    // no broadcast() hint: in the operator's documented regime (a
    // mixing recipe has tens of strata) AQE broadcasts these one-row-
    // per-stratum frames on its own, keeping classification map-side
    // with zero corpus shuffle; if someone strats on a high-cardinality
    // key instead, the join degrades to a shuffle — slower, but not the
    // driver OOM a forced broadcast of millions of strata would be
    val stats = base.groupBy(col(sC)).agg(
      min(when(finite, qD)).as(qminC),
      max(when(finite, qD)).as(qmaxC),
      min(col(tC)).as(tokminC))
    val withStats = base.join(
      stats.withColumnRenamed(sC, sC + "_r"),
      col(sC) <=> col(sC + "_r"), "left").drop(sC + "_r")

    // bucket layout mirrors `quality.desc` ordering exactly:
    // 0 = NaN (sorts above +Inf in Spark), 1 = +Inf, 2..B+1 = finite
    // (2 = highest), B+2 = -Inf, B+3 = null (desc puts nulls last).
    // Monotone in quality and tie-preserving, so concatenating buckets
    // in ascending order reproduces the global per-stratum ranking.
    val interior = lit(2) + greatest(
      least(floor((col(qmaxC) - qD) / (col(qmaxC) - col(qminC)) * B).cast("int"), lit(B - 1)),
      lit(0))
    val withBucket = withStats.withColumn(bC,
      when(qD.isNull, lit(B + 3))
        .when(isnan(qD), lit(0))
        .when(qD === Double.PositiveInfinity, lit(1))
        .when(qD === Double.NegativeInfinity, lit(B + 2))
        .when(col(qmaxC).isNull || (col(qmaxC) <=> col(qminC)), lit(2))
        .otherwise(interior))

    // phase 2: per-bucket token sums, then the prefix window over the
    // AGGREGATED frame — ≤ B+4 rows per stratum, so one reducer per
    // stratum here is a handful of rows, not the corpus
    val bucketSums = withBucket.groupBy(col(sC), col(bC)).agg(sum(col(tC)).as(sumC))
    val wPrefix = Window.partitionBy(col(sC)).orderBy(col(bC))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = bucketSums
      .withColumn(eC, coalesce(sum(col(sumC)).over(wPrefix), lit(0L)))
      .withColumn(tTotC, col(eC) + col(sumC))
      .select(col(sC).as(sC + "_p"), col(bC).as(bC + "_p"), col(eC), col(tTotC))

    val classified = withBucket.join(
      prefixed,
      col(sC) <=> col(sC + "_p") && col(bC) === col(bC + "_p"), "left")

    // negative tokens void the bucket bounds (a later negative row
    // could pull a "fully dropped" bucket back under budget) — throw
    // from inside the filter, where every row evaluates the guard
    val budget = lit(tokenBudget)
    def guarded(pred: Column): Column =
      when(col(tokminC) < 0, raise_error(concat(
        lit("tokenBudgetCap requires non-negative token counts; stratum "),
        coalesce(col(sC).cast("string"), lit("NULL")),
        lit(" has min token count "), col(tokminC).cast("string"))))
        .otherwise(pred)

    // T < budget → every row's preceding total < budget: keep map-side
    // (null tokens still drop, as in the single-window plan)
    val fullyKept = classified.filter(guarded(col(tTotC) < budget && col(tC).isNotNull))
    // E < budget <= T → the one boundary bucket per stratum: exact
    // running sum, seeded with the bucket's exclusive prefix E
    val wExact = Window.partitionBy(col(sC), col(bC)).orderBy(col(qC).desc, col(iC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = classified
      .filter(guarded(col(eC) < budget && col(tTotC) >= budget))
      .withColumn(cumC, sum(col(tC)).over(wExact))
      .filter(col(eC) + col(cumC) - col(tC) < budget)
    fullyKept.select(outCols: _*).union(boundaryKept.select(outCols: _*))
  }

  /** Deterministic weighted interleave for training order: a virtual
    * time `vt = u / weight(stratum)` with `u` the row's content-hash
    * uniform in [0, 1) — sorting by `vt` yields a sequence where every
    * prefix contains each stratum in proportion to its weight (stride
    * scheduling), with zero RNG and zero windows: `vt` is a pure
    * map-side expression, and the global sort is Spark's
    * range-partitioned orderBy — the one genuinely global operation a
    * training-order materialization cannot avoid. Append-stable: a
    * row's position relative to others never changes when data is
    * added.
    *
    * `weights` are relative densities (a stratum at weight 2 appears
    * 2× as often per prefix as one at weight 1); strata missing from
    * the map use `defaultWeight`. All weights must be > 0.
    */
  def interleaveByWeight(
      stratum: Column,
      hashOn: Column,
      weights: Map[String, Double],
      defaultWeight: Double): Column = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w > 0, s"interleave weights must be > 0, got $w"))
    val u = md5Bucket32(md5(hashOn.cast("binary"))).cast("double") / lit(4294967296.0)
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    u / w
  }

  /** EXACT within-key percentile rank (`percent_rank` semantics:
    * (min_rank − 1) / (n − 1), ties share the min rank, single-row
    * keys get 0) — score calibration across heterogeneous sources —
    * WITHOUT the per-key full sort of a `percent_rank() OVER
    * (PARTITION BY key)` window, which at 100 TB puts an entire
    * source's rows on one reducer (strata are few by nature; the q48
    * lesson). Two-phase instead, the [[tokenBudgetCap]] geometry:
    * bucket each score into `buckets` equal-width bins of its key's
    * [min, max] range, count per (key, bucket) — a partially
    * aggregated frame of ≤ `buckets` rows per key whose prefix sums
    * give every row's exclusive lower-bucket count map-side — and run
    * the exact rank window only WITHIN each (key, bucket): partitions
    * number keys × buckets and each holds ~n/buckets rows, so no
    * single task ever owns a stratum. Equal scores always share a
    * bucket, so min-rank ties are exact.
    *
    * Returns `df` + `outCol` (double in [0, 1]). Scores must be
    * numeric, non-null and finite — NaN/±Inf would silently corrupt
    * the bucket geometry, so they raise instead.
    */
  def percentileRank(
      df: org.apache.spark.sql.DataFrame,
      key: Column,
      score: Column,
      outCol: String,
      buckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(!df.columns.contains(outCol), s"output column $outCol already exists")
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val kC = s"__pr_key_$tag"; val sC = s"__pr_s_$tag"; val bC = s"__pr_b_$tag"
    val loC = s"__pr_lo_$tag"; val hiC = s"__pr_hi_$tag"; val nC = s"__pr_n_$tag"
    val cC = s"__pr_c_$tag"; val eC = s"__pr_e_$tag"; val rC = s"__pr_r_$tag"
    val outCols = df.columns.toSeq.map(col)
    val sD = score.cast("double")
    val guarded = when(sD.isNull || isnan(sD) || sD === Double.PositiveInfinity ||
      sD === Double.NegativeInfinity, raise_error(lit(
      "percentileRank: score must be non-null and finite"))).otherwise(sD)
    val base = df.withColumn(kC, key).withColumn(sC, guarded)
    val stats = base.groupBy(col(kC)).agg(
      min(col(sC)).as(loC), max(col(sC)).as(hiC), count(lit(1)).as(nC))
    // AQE broadcasts the per-key stats (one row per key) — same
    // contract as tokenBudgetCap: high-cardinality keys degrade to a
    // shuffle join, never a driver OOM
    val withStats = base.join(stats, kC)
    val span = col(hiC) - col(loC)
    val bucketed = withStats.withColumn(bC,
      when(span === 0.0, lit(0)).otherwise(
        least(floor((col(sC) - col(loC)) / span * buckets).cast("int"), lit(buckets - 1))))
    val counts = bucketed.groupBy(col(kC), col(bC)).agg(count(lit(1)).as(cC))
    // exclusive prefix over ≤ `buckets` rows per key — the ONLY
    // per-key-partitioned window, on the counts frame, never the data
    val wPrefix = Window.partitionBy(col(kC)).orderBy(col(bC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = counts
      .withColumn(eC, sum(col(cC)).over(wPrefix) - col(cC))
      .select(col(kC).as(kC + "_r"), col(bC).as(bC + "_r"), col(eC))
    // exact min-rank inside each (key, bucket) slice: rank() ties
    // share the min, matching percent_rank semantics
    val wRank = Window.partitionBy(col(kC), col(bC)).orderBy(col(sC).asc)
    bucketed
      .join(prefixes, col(kC) === col(kC + "_r") && col(bC) === col(bC + "_r"))
      .withColumn(rC, col(eC) + rank().over(wRank))
      .withColumn(outCol,
        when(col(nC) === 1, lit(0.0))
          .otherwise((col(rC) - 1).cast("double") / (col(nC) - 1).cast("double")))
      .select(outCols :+ col(outCol): _*)
  }

  /** Per-key cap: keep at most `k` rows per key, best-first by (score
    * desc, id asc) — the per-domain document cap of web-crawl curation
    * (no single site may dominate the corpus). Returns the surviving
    * rows of `df` unchanged.
    *
    * Scale shape: the bounded [[TopKByScore]] aggregator, not a
    * `row_number` window — partial top-k buffers reduce each partition
    * to ≤ k candidates per key BEFORE the shuffle, so a hot domain
    * ships O(k × partitions) rows instead of all of them, and no
    * per-key full sort ever runs. Winners then semi-join back by id
    * (id-only shuffle; AQE broadcasts when k × |keys| is small).
    *
    * Contract: `id` must cast to long, be non-null, and be UNIQUE
    * across the frame (it is the join-back key). Rows with null scores
    * never win; NaN scores rank worst (the aggregator's NaN rule).
    */
  /** Deterministic UNIFORM k-per-key sample: keep exactly min(k, n)
    * rows per key, chosen by content-hash order — the "k eval docs per
    * source" / "k examples per stratum" pick, with no RNG (re-executed
    * tasks, re-ingestions, and other engines all select the same
    * rows). Top-k by a uniform hash IS a uniform without-replacement
    * sample, so this inherits [[capPerKey]]'s scale shape verbatim:
    * bounded aggregator buffers, ≤ k candidates per (partition, key)
    * shuffled, no per-key window sort.
    *
    * `hashOn` must be a STRING column (the md5-portability contract of
    * [[stratifiedKeep]]); rows with NULL `hashOn` never win — callers
    * who consider empty content sampleable should `coalesce` first.
    * Byte-identical `hashOn` ties break by id, keeping the selection a
    * pure function of the data.
    */
  def uniformKPerKey(
      df: org.apache.spark.sql.DataFrame,
      key: Column,
      hashOn: Column,
      id: Column,
      k: Int): org.apache.spark.sql.DataFrame =
    capPerKey(df, key,
      md5Bucket32(md5(hashOn.cast("binary"))).cast("double"), id, k)

  /** WEIGHTED sampling without replacement, k per key (public
    * literature: Efraimidis & Spirakis 2006, "Weighted random sampling
    * with a reservoir" — the exponential-clocks / A-ES scheme): each
    * row draws a uniform u ∈ (0, 1] and ranks by `ln(u) / w`; the
    * top-k per key is then an EXACT weighted without-replacement
    * sample (equivalent to ranking by u^(1/w) — ln is monotone — with
    * selection probability proportional to weight at every draw).
    *
    * Like every sampler here, u is NOT an RNG: it derives from
    * md5(`hashOn`) (the [[stratifiedKeep]] portability contract), so
    * re-executed tasks, re-ingested corpora, and other engines select
    * the identical rows; `+1` keeps u strictly positive (ln(0)).
    * Weights must be strictly positive and non-null — a zero weight
    * has no defined clock and fails LOUDLY rather than silently
    * winning or losing. Scale shape inherits [[capPerKey]] verbatim:
    * bounded top-k aggregator buffers, ≤ k candidates per (partition,
    * key) shuffle, no per-key window sort.
    *
    * Oracle note: ln() is not bit-portable across engines, so gates
    * over this operator verify "true top-k within tolerance" (q57's
    * pattern), not key equality.
    */
  def weightedKPerKey(
      df: org.apache.spark.sql.DataFrame,
      key: Column,
      weight: Column,
      hashOn: Column,
      id: Column,
      k: Int): org.apache.spark.sql.DataFrame = {
    val w = when(weight.cast("double").isNull || weight.cast("double") <= 0.0,
      raise_error(lit("weightedKPerKey: weight must be non-null and > 0")))
      .otherwise(weight.cast("double"))
    val u = (md5Bucket32(md5(hashOn.cast("binary"))).cast("double") + lit(1.0)) /
      lit(4294967296.0)
    capPerKey(df, key, log(u) / w, id, k)
  }

  def capPerKey(
      df: org.apache.spark.sql.DataFrame,
      key: Column,
      score: Column,
      id: Column,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"capPerKey needs k >= 1, got $k")
    val guardedId = when(id.cast("long").isNull, raise_error(lit(
      "capPerKey: id is null or not castable to long — every row needs a non-null " +
        "integral id"))).otherwise(id.cast("long"))
    val tk = udaf(new TopKByScore(k))
    val winners = df
      .select(key.as("__k"), score.cast("double").as("__s"), guardedId.as("__i"))
      // null scores drop before the typed aggregator (its non-nullable
      // Double encoder would throw); dropping = "never wins", documented
      .filter(col("__s").isNotNull)
      .groupBy(col("__k"))
      .agg(tk(col("__s"), col("__i")).as("topk"))
      .select(explode(col("topk.items")).as("s"))
      .select(col("s._2").as("__winner_id"))
    df.join(winners, guardedId === col("__winner_id"), "left_semi")
  }

  /** DETERMINISTIC NEGATIVE SAMPLING for contrastive training — per
    * anchor (user), k items the user did NOT interact with, drawn
    * from a BOUNDED candidate pool (top-P popular items, a curated
    * hard-negative set — the caller's choice): the
    * positives:negatives example builder behind every two-tower /
    * matrix-factorization pipeline.
    *
    * Selection is content-addressed, no RNG: each (user, candidate)
    * ranks by the portable md5 bucket of "user:itemKey" (the
    * [[stratifiedKeep]] idiom — any engine reproduces it), ties by
    * item id, so re-runs, re-ingestion, and other engines emit the
    * identical negatives, and a user's draws are independent of
    * every other user's.
    *
    * Scale shape: the candidate pool is broadcast (bounded by a LOUD
    * `maxPool` guard — the U×P expansion is the deliberate cost, the
    * q29 bounded-side discipline), positives leave via an anti-join
    * on (user, item) BEFORE ranking, and the rank window is
    * partitioned per user over ≤ P rows — never a global frame.
    *
    * Output: (user, item, neg_rank) with neg_rank in 1..k.
    */
  def negativeSample(
      interactions: org.apache.spark.sql.DataFrame,
      user: Column,
      item: Column,
      pool: org.apache.spark.sql.DataFrame,
      poolItem: Column,
      poolKey: Column,
      k: Int,
      maxPool: Long = 100000L): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"negativeSample needs k >= 1, got $k")
    val uG = when(user.cast("long").isNull, raise_error(lit(
      "negativeSample: user must be a non-null integral id")))
      .otherwise(user.cast("long"))
    val poolG = pool.select(
      when(poolItem.cast("long").isNull, raise_error(lit(
        "negativeSample: pool item must be a non-null integral id")))
        .otherwise(poolItem.cast("long")).as("pi"),
      when(poolKey.cast("string").isNull, raise_error(lit(
        "negativeSample: pool key must be a non-null string")))
        .otherwise(poolKey.cast("string")).as("pk"))
    val guarded = poolG
      .crossJoin(broadcast(poolG.agg(count(lit(1)).as("__pc"))))
      .select(col("pi"),
        when(col("__pc") > maxPool, raise_error(lit(
          s"negativeSample: candidate pool exceeds $maxPool items — " +
            "the U×P expansion needs a bounded pool (top-P popular, " +
            "a curated set), never the full catalog")))
          .otherwise(col("pk")).as("pk"))
    // a null/uncastable item would become a null join key, silently
    // miss the anti-join, and let a user's REAL positive survive as a
    // "negative" — raise loudly like every other key column here
    val iG = when(item.cast("long").isNull, raise_error(lit(
      "negativeSample: item must be a non-null integral id")))
      .otherwise(item.cast("long"))
    val positives = interactions
      .select(uG.as("au"), iG.as("ai")).distinct()
    val cand = interactions.select(uG.as("u")).distinct()
      .crossJoin(broadcast(guarded))
      .join(positives,
        col("u") === col("au") && col("pi") === col("ai"), "left_anti")
      .withColumn("score", md5Bucket32(
        md5(concat(col("u").cast("string"), lit(":"), col("pk")).cast("binary"))))
    val wRank = Window.partitionBy(col("u"))
      .orderBy(col("score").asc, col("pi").asc)
    cand.withColumn("neg_rank", row_number().over(wRank).cast("long"))
      .filter(col("neg_rank") <= k.toLong)
      .select(col("u").as("user"), col("pi").as("item"), col("neg_rank"))
  }

  /** EXACT-COUNT stratified sample: exactly `total` rows, split across
    * strata PROPORTIONALLY to their sizes with
    * [[Allocation.largestRemainder]] seat arithmetic (Σ taken =
    * `total` exactly — the rate-based [[stratifiedKeep]] only
    * approximates counts), each stratum's quota filled in
    * content-hash order (deterministic, append-stable for the
    * non-selected remainder, no RNG). The "build me a 10k-example
    * eval set, proportionally by source" primitive.
    *
    * Selection = the first k_s rows of each stratum in
    * (hash60(content) as double, id) order, computed WITHOUT a
    * per-stratum global sort (hash keys are all-distinct, so the
    * [[percentileRank]] distinct-value trick degenerates — q48's
    * lesson): hashes bucket into 1024 fixed 2⁵⁰-wide cells, the
    * crossing bucket per stratum comes from a prefix window over the
    * ≤1024-row count frame, rows below it are kept outright, and the
    * exact in-bucket rank orders only the crossing bucket's ~n/1024
    * rows. The per-stratum take is exactly k_s by construction — the
    * double rounding of hash60 can only reorder WHICH rows fill the
    * quota (identically in every engine), never the count.
    *
    * `total` must not exceed the eligible row count (seats without
    * rows would silently under-fill — it raises instead). Strata are
    * few by nature (the [[stratifiedKeep]] contract); the allocation
    * frame is one row per stratum.
    *
    * Output: (stratum, id) of the selected rows.
    */
  def exactStratifiedTake(
      df: org.apache.spark.sql.DataFrame,
      stratum: Column,
      hashOn: Column,
      id: Column,
      total: Long): org.apache.spark.sql.DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    val base = df
      .select(stratum.as("g"),
        KmvSketch.hash60(hashOn).cast("double").as("h"),
        id.cast("long").as("rid"))
      .filter(col("g").isNotNull && col("h").isNotNull && col("rid").isNotNull)
    val counts = base.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val alloc = Allocation.largestRemainder(
      counts, lit("__all"), col("g"), col("n"), total)
      .select(col("item").as("ag"), col("alloc").as("k"))
    // guard: seats must not exceed rows (largestRemainder keeps
    // k_s ≤ n_s whenever total ≤ N, so one global check suffices)
    val guarded = alloc.join(counts, col("ag") === col("g"))
      .select(col("ag"),
        when(col("k") > col("n"), raise_error(concat(
          lit("exactStratifiedTake: total exceeds the eligible row count "),
          lit("(stratum "), col("ag").cast("string"),
          lit(" allocated more seats than rows)")))).otherwise(col("k")).as("k"))
    val bucketed = base.withColumn("b",
      least(floor(col("h") / lit(1125899906842624.0)).cast("int"), lit(1023)))
    val bCounts = bucketed.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
    val wPrefix = Window.partitionBy(col("g")).orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bCounts.withColumn("cw", sum(col("c")).over(wPrefix))
      .join(guarded, col("g") === col("ag"))
    // the crossing bucket: first with cumulative ≥ k (unique per g)
    val cut = cum.filter(col("k") > 0L && col("cw") >= col("k") &&
      col("cw") - col("c") < col("k"))
      .select(col("g").as("cg"), col("b").as("cb"),
        (col("k") - (col("cw") - col("c"))).as("needAtCut"))
    val withCut = bucketed.join(cut, col("g") === col("cg"))
    val below = withCut.filter(col("b") < col("cb"))
      .select(col("g").as("stratum"), col("rid").as("id"))
    val wIn = Window.partitionBy(col("g"))
      .orderBy(col("h").asc, col("rid").asc)
    val atCut = withCut.filter(col("b") === col("cb"))
      .withColumn("rr", row_number().over(wIn))
      .filter(col("rr") <= col("needAtCut"))
      .select(col("g").as("stratum"), col("rid").as("id"))
    below.unionByName(atCut)
  }

  /** NEYMAN ALLOCATION of a sampling budget — the variance-optimal
    * stratified design (Neyman 1934): stratum h gets
    * n_h ∝ N_h·S_h (size × standard deviation), integerized by
    * [[Allocation.largestRemainder]] so Σ n_h = `total` exactly.
    *
    * `value` must be integer-valued (caller owns scaling; Σv² is
    * 2⁵³-guarded loudly); S_h is the unbiased SD from exact decimal
    * sums, the weight N_h·S_h is floored to a long (the identical
    * double both engines floor), and the seat assignment is the
    * exact largest-remainder arithmetic. Single-value strata (S = 0)
    * get weight 0 — they still appear with alloc from remainders
    * only. Output per stratum: (stratum, n_rows, weight, alloc).
    */
  def neymanAllocation(
      df: DataFrame,
      stratum: Column,
      value: Column,
      total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    def g(c: Column, name: String): Column =
      when(c.cast("long").isNull, raise_error(lit(
        s"neymanAllocation: $name must be a non-null integer")))
        .otherwise(c.cast("long"))
    val base = df.select(stratum.as("h"), g(value, "value").as("v"))
    val d19 = "decimal(19,0)"
    val st = base.groupBy(col("h")).agg(
      count(lit(1)).as("n"),
      sum(col("v").cast(d19)).cast("decimal(38,0)").as("s"),
      sum(col("v").cast(d19) * col("v").cast(d19))
        .cast("decimal(38,0)").as("q"))
    val twoP53 = 9007199254740992L
    def e(c: Column, what: String): Column =
      when(abs(c) > lit(twoP53), raise_error(lit(
        s"neymanAllocation: |$what| exceeds 2^53 — rescale the value")))
        .otherwise(c).cast("double")
    val nD = col("n").cast("double")
    val varU = (nD * e(col("q"), "the sum of squares") -
      e(col("s"), "the sum") * e(col("s"), "the sum")) /
      (nD * (nD - lit(1.0)))
    val weighted = st.select(col("h"), col("n"),
      when(col("n") > 1L && varU > 0.0,
        floor(nD * sqrt(varU)).cast("long")).otherwise(lit(0L)).as("w"))
    val alloc = Allocation.largestRemainder(
      weighted, lit("all"), col("h"), col("w"), total)
      .select(col("item").as("ah"), col("alloc"))
    weighted.join(alloc, col("h") === col("ah"))
      .select(col("h").as("stratum"), col("n").as("n_rows"),
        col("w").as("weight"), col("alloc"))
  }
}

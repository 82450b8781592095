package graft.tools

import java.io.{BufferedWriter, FileWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end wall-clock for the FULL bronze→silver→gold pipeline on a
  * ~1 GB synthetic MRF — the scale class of the reference's CI ingest
  * (`/root/reference/RUNME.py:42-97` streams a real ~1 GB index file;
  * its README publishes 5–7 GB/min for the ingest stage alone,
  * `README.md:111-113`). This drive measures the SAME deployment
  * shape, then keeps going where the reference's number stops:
  *
  *   1. ingest — `readStream.format("payer-mrf")` → parquet sink with
  *      checkpoint (the S9 path), Trigger.AvailableNow; GB/min here is
  *      the reference-comparable number.
  *   2. silver — `MrfPipeline.silver` over the bronze parquet, every
  *      silver table written to parquet (the demo's Delta writes,
  *      parquet-backed in this environment).
  *   3. gold — `shoppablePrices` from the WRITTEN silver tables
  *      (storage-backed end to end, not a fused in-memory plan).
  *
  * The document is deterministic (no RNG): provider groups 1..1000
  * with tin "TIN-g"; in_network items with billing_code "C"+(i%5000),
  * two negotiated_rates each (group refs (i+j)%1000+1 and
  * (i+j+500)%1000+1), one "negotiated" + one "percentage" price —
  * the q43 generation grammar scaled until the file crosses the byte
  * target, so every stage sees realistic fan-out (codes → rates →
  * prices → par-providers).
  *
  * Usage: runMain graft.tools.PipelineDrive [targetGB=1.0] [path]
  */
object PipelineDrive {

  /** Stream-write the document (no in-memory tree — the 1 GB target
    * must not need 1 GB of heap). ASCII-only → length == bytes.
    */
  def generate(path: String, targetBytes: Long): (Long, Int) = {
    val w = new BufferedWriter(new FileWriter(path), 8 << 20)
    var bytes = 0L
    def put(s: String): Unit = { w.write(s); bytes += s.length }
    put("""{"reporting_entity_name":"graft-drive-payer","reporting_entity_type":"payer",""")
    put(""""last_updated_on":"2026-01-01","version":"1.0.0","provider_references":[""")
    for (g <- 1 to 1000) {
      if (g > 1) put(",")
      put(s"""{"provider_group_id":$g,"provider_groups":[""" +
        s"""{"npi":[${g * 100 + 1},${g * 100 + 2}],"tin":{"type":"ein","value":"TIN-$g"}},""" +
        s"""{"npi":[${g * 100 + 3}],"tin":{"type":"ein","value":"TIN-$g"}}]}""")
    }
    put("""],"in_network":[""")
    var i = 0
    // stop adding items once past the target minus closing residue
    while (bytes < targetBytes - 64) {
      if (i > 0) put(",")
      val sb = new StringBuilder(1024)
      sb.append(s"""{"negotiation_arrangement":"ffs","name":"ITEM $i",""")
      sb.append(s""""billing_code_type":"CPT","billing_code_type_version":"2026",""")
      sb.append(s""""billing_code":"C${i % 5000}","description":"synthetic item $i",""")
      sb.append(""""negotiated_rates":[""")
      for (j <- 0 to 1) {
        if (j > 0) sb.append(",")
        val g1 = (i + j) % 1000 + 1
        val g2 = (i + j + 500) % 1000 + 1
        val rate = (i.toLong * 100 + j * 7) % 1000000 / 100.0
        sb.append(s"""{"provider_references":[$g1,$g2],"negotiated_prices":[""")
        sb.append(s"""{"negotiated_type":"negotiated","negotiated_rate":$rate,""")
        sb.append(""""expiration_date":"9999-12-31","service_code":["11","22"],""")
        sb.append(s""""billing_class":"institutional"},""")
        sb.append(s"""{"negotiated_type":"percentage","negotiated_rate":50.0,""")
        sb.append(""""expiration_date":"9999-12-31","billing_class":"professional"}]}""")
      }
      sb.append("]}")
      put(sb.toString)
      i += 1
    }
    put("]}")
    w.close()
    (bytes, i)
  }

  def main(args: Array[String]): Unit = {
    val targetGb = if (args.length > 0) args(0).toDouble else 1.0
    val path = if (args.length > 1) args(1) else "/tmp/graft_drive_1g.json"
    val targetBytes = (targetGb * 1e9).toLong

    val f = new java.io.File(path)
    // the item count drives the CLOSED-FORM gold expectation below, so
    // it must survive file reuse: a sidecar .meta records it, and a
    // file without one is regenerated rather than trusted
    val metaFile = new java.io.File(path + ".meta")
    val items: Int =
      if (!f.exists() || math.abs(f.length() - targetBytes) > targetBytes / 10 ||
          !metaFile.exists()) {
        val t = System.nanoTime()
        val (bytes, n) = generate(path, targetBytes)
        java.nio.file.Files.write(metaFile.toPath, n.toString.getBytes)
        println(f"generated ${bytes / 1e9}%.2f GB ($n in_network items) " +
          f"in ${(System.nanoTime() - t) / 1e9}%.1f s")
        n
      } else {
        val n = new String(java.nio.file.Files.readAllBytes(metaFile.toPath)).trim.toInt
        println(f"reusing $path (${f.length() / 1e9}%.2f GB, $n items)")
        n
      }
    require(items > 17, s"document too small for the C17 gold check ($items items)")
    val gb = f.length() / 1e9

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory(
      graft.queries.Scratch.base, "pipeline_drive_")
    val bronzeDir = work.resolve("bronze").toString
    val silverDir = work.resolve("silver").toString
    try {
      // ---- stage 1: ingest (streaming source → parquet + checkpoint)
      val t1 = System.nanoTime()
      val q = spark.readStream.format("payer-mrf").load(path)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", bronzeDir)
        .option("checkpointLocation", work.resolve("_ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(1200000), "ingest did not terminate within 1200s")
      val ingestSec = (System.nanoTime() - t1) / 1e9
      val bronzeRows = spark.read.parquet(bronzeDir).count()
      println(f"ingest: $gb%.2f GB → $bronzeRows bronze chunks in $ingestSec%.1f s " +
        f"= ${gb / (ingestSec / 60)}%.1f GB/min (reference publishes 5-7)")

      // ---- stage 2: silver (explicit-schema parse + normalization,
      // all tables written). The two parse pivots — codes (the
      // from_json + explode of the 8 MB payload chunks) and rates —
      // are CACHED so the eight table writes share ONE JSON parse;
      // without this, every derived table re-parses the full corpus
      // (measured: 28.3 s → re-parse-per-table vs one shared parse).
      // At fleet scale this is the "materialize the parsed layer once"
      // rule every warehouse bronze→silver job follows.
      val t2 = System.nanoTime()
      import graft.pipeline.MrfPipeline
      val bronze = spark.read.parquet(bronzeDir)
      val c = MrfPipeline.inNetworkCodes(bronze).cache()
      val r = MrfPipeline.inNetworkRates(c).cache()
      try {
        val h = MrfPipeline.header(bronze)
        val tables = Seq(
          "header" -> h,
          "providers_x_payer" -> MrfPipeline.providerReferencesXPayer(bronze, h),
          "codes" -> c.drop("negotiated_rates"),
          "rates" -> r.drop("rate"),
          "prices" -> MrfPipeline.inNetworkPrices(r),
          "par_providers" -> MrfPipeline.inNetworkParProviders(r),
          "rate_provider_groups" -> MrfPipeline.inNetworkRateProviderGroups(r),
          "bundled_codes" -> MrfPipeline.bundledCodes(c))
        tables.foreach { case (n, df) =>
          df.write.mode("overwrite").parquet(s"$silverDir/$n")
        }
      } finally { r.unpersist(); c.unpersist(); () }
      val silverSec = (System.nanoTime() - t2) / 1e9
      val priceRows = spark.read.parquet(s"$silverDir/prices").count()
      println(f"silver: 8 tables written ($priceRows price rows) in $silverSec%.1f s")

      // ---- stage 3: gold from the WRITTEN silver tables
      val t3 = System.nanoTime()
      val gold = graft.pipeline.MrfPipeline.shoppablePrices(
        spark.read.parquet(s"$silverDir/codes"),
        spark.read.parquet(s"$silverDir/prices"),
        spark.read.parquet(s"$silverDir/par_providers"),
        spark.read.parquet(s"$silverDir/providers_x_payer"),
        // items with billing_code C17 (i ≡ 17 mod 5000) reference
        // groups (i+j)%1000+1 ∈ {18, 19} and {518, 519} — TIN-18 is
        // in-network for that code by construction
        billingCode = "C17", tinValue = "TIN-18")
      // ---- gold CORRECTNESS, not just wall-clock: the generator is
      // deterministic, so the exact answer is known in closed form.
      // Items i ≡ 17 (mod 5000) carry billing_code C17; their j=0
      // rate references groups {18, 518} with ONE "negotiated" price
      // of (i·100 mod 10⁶)/100 (the j=1 rate hits groups {19, 519} —
      // never TIN-18); group 18 contributes TWO providers_x_payer
      // rows (npi [1801,1802] and [1803]). So gold(C17, TIN-18) must
      // be EXACTLY 2 rows per matching item with that rate, those npi
      // sets, tin TIN-18, group 18, and the header's entity name.
      val matching = 17 until items by 5000
      val expRates = matching.flatMap(i =>
        Seq.fill(2)((i.toLong * 100 % 1000000L) / 100.0)).sorted
      val got = gold.select(
        col("negotiated_rate"), col("npi"), col("tin.value"),
        col("provider_group_id"), col("billing_code"),
        col("reporting_entity_name")).collect()
      val goldRows = got.length.toLong
      val goldSec = (System.nanoTime() - t3) / 1e9
      require(goldRows == 2L * matching.size,
        s"gold row count $goldRows != expected ${2 * matching.size} — " +
          "generator/pipeline mismatch")
      val gotRates = got.map(_.getDouble(0)).sorted.toSeq
      require(gotRates == expRates,
        s"gold negotiated_rate multiset diverged (first mismatch at " +
          s"${gotRates.zip(expRates).indexWhere(p => p._1 != p._2)})")
      val npiSets = got.map(_.getSeq[Long](1).toSet)
      require(
        npiSets.count(_ == Set(1801L, 1802L)) == matching.size &&
          npiSets.count(_ == Set(1803L)) == matching.size,
        "gold npi sets diverged from the group-18 grammar")
      got.foreach { r =>
        require(
          r.getString(2) == "TIN-18" && r.getLong(3) == 18L &&
            r.getString(4) == "C17" &&
            r.getString(5) == "graft-drive-payer",
          s"gold row attribute mismatch: $r")
      }
      println(f"gold: shoppable(C17 @ TIN-18) = $goldRows rows in $goldSec%.1f s " +
        "— exact-match vs the generation grammar: PASS")

      val total = ingestSec + silverSec + goldSec
      println(f"""{"gb":$gb%.2f,"ingest_sec":$ingestSec%.1f,"ingest_gb_min":${gb / (ingestSec / 60)}%.1f,""" +
        f""""silver_sec":$silverSec%.1f,"gold_sec":$goldSec%.1f,"total_sec":$total%.1f,""" +
        f""""end_to_end_gb_min":${gb / (total / 60)}%.1f,"gold_checked":true}""")
    } finally {
      graft.queries.Scratch.deleteRecursively(work)
      spark.stop()
    }
  }
}

package graft.pipeline

import graft.SparkTestBase
import graft.sources.MrfFixtures
import org.apache.spark.sql.functions._

/** Silver/gold parity with the reference demo ETL on the synthesized FFS
  * fixture — the "minimum end-to-end slice" of SURVEY.md §7.1(3):
  * source → demux → parse → unnest → join → predicate, asserting the
  * fixture's known 123.45 rate for billing code 27447.
  */
class MrfPipelineSpec extends SparkTestBase {

  private lazy val bronze = {
    val p = MrfFixtures.writeTemp("ffs.json", MrfFixtures.ffs).getAbsolutePath
    spark.read.format("payer-mrf").load(p).cache()
  }

  test("header silver: one row per file with entity scalars") {
    val h = MrfPipeline.header(bronze)
    assert(h.count() == 1)
    val row = h.first()
    assert(row.getAs[String]("reporting_entity_name") == "graft health")
    assert(row.getAs[String]("plan_name") == "graft ppo")
    assert(row.getAs[String]("version") == "1.0.0")
  }

  test("providers silver: group rows with npi/tin + location variant") {
    import spark.implicits._
    val p = MrfPipeline.providerReferencesXPayer(bronze)
    assert(p.count() == 3) // 2 inline groups + 1 location-only
    val g100 = p.filter($"provider_group_id" === 100).first()
    assert(g100.getSeq[Long](g100.fieldIndex("npi")) == Seq(1111111111L, 2222222222L))
    assert(g100.getAs[org.apache.spark.sql.Row]("tin").getAs[String]("value") == "11-1111111")
    assert(g100.getAs[String]("reporting_entity_name") == "graft health")
    val g300 = p.filter($"provider_group_id" === 300).first()
    assert(g300.getAs[String]("location") != null && g300.isNullAt(g300.fieldIndex("npi")))
  }

  test("codes/rates/prices silver grain matches the fixture") {
    import spark.implicits._
    val s = MrfPipeline.silver(bronze)
    assert(s.codes.count() == 2) // 27447, 99213
    assert(s.rates.count() == 3) // 2 rates for 27447, 1 for 99213
    assert(s.prices.count() == 3)
    assert(s.parProviders.count() == 3) // refs [100,200] + [300]
    // deterministic surrogate keys: rebuilt pipeline yields identical keys
    val again = MrfPipeline.silver(bronze)
    assert(
      s.rates.select("sk_rate_id").collect().map(_.getLong(0)).toSet ==
        again.rates.select("sk_rate_id").collect().map(_.getLong(0)).toSet)
    // every price joins back to a code
    assert(
      s.prices.join(s.codes, "sk_in_network_id").count() == 3)
  }

  test("byte-identical duplicate in_network items dedupe instead of multiplying gold") {
    import spark.implicits._
    // the same item listed twice: identical content → identical
    // surrogate key. Left in, the rates × prices × providers chain
    // would emit 2×2 = 4+ gold rows per semantic row; the codes-level
    // dedup collapses the duplicate to exactly the single-item result
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(MrfFixtures.ffs)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val inNet = root.get("in_network")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    inNet.add(inNet.get(0).deepCopy[com.fasterxml.jackson.databind.JsonNode]())
    val p = MrfFixtures.writeTemp("dup.json", m.writeValueAsString(root)).getAbsolutePath
    val dupBronze = spark.read.format("payer-mrf").load(p)
    val s = MrfPipeline.silver(dupBronze)
    assert(s.codes.filter($"billing_code" === "27447").count() == 1,
      "duplicate item must collapse to one code row")
    val gold = MrfPipeline.shoppablePrices(
      s.codes, s.prices, s.parProviders, s.providersXPayer,
      billingCode = "27447", tinValue = "11-1111111")
    assert(gold.count() == 1, s"duplicate item multiplied gold rows: ${gold.count()}")
  }

  test("gold shoppable prices: knee replacement at TIN 11-1111111 = 123.45") {
    val s = MrfPipeline.silver(bronze)
    val gold = MrfPipeline.shoppablePrices(
      s.codes, s.prices, s.parProviders, s.providersXPayer,
      billingCode = "27447", tinValue = "11-1111111")
    val rows = gold.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Double]("negotiated_rate") == 123.45)
    assert(r.getAs[String]("billing_class") == "institutional")
    assert(r.getAs[Long]("provider_group_id") == 100L)
    assert(r.getAs[String]("reporting_entity_name") == "graft health")
  }

  test("pipeline works identically on perElement bronze") {
    val p = MrfFixtures.writeTemp("ffs.json", MrfFixtures.ffs).getAbsolutePath
    val perEl = spark.read.format("payer-mrf").option("perElement", "true").load(p)
    val s = MrfPipeline.silver(perEl)
    assert(s.codes.count() == 2 && s.prices.count() == 3)
    val gold = MrfPipeline.shoppablePrices(
      s.codes, s.prices, s.parProviders, s.providersXPayer, "27447", "11-1111111")
    assert(gold.collect().head.getAs[Double]("negotiated_rate") == 123.45)
  }

  test("pipeline works identically on payloadAsArray bronze") {
    val p = MrfFixtures.writeTemp("ffs.json", MrfFixtures.ffs).getAbsolutePath
    val arr = spark.read.format("payer-mrf").option("payloadAsArray", "true").load(p)
    val s = MrfPipeline.silver(arr)
    assert(s.codes.count() == 2 && s.prices.count() == 3)
  }

  test("capitation arrangement: covered_services survive the parse") {
    import spark.implicits._
    val p = MrfFixtures.writeTemp("cap.json", MrfFixtures.capitation).getAbsolutePath
    val b = spark.read.format("payer-mrf").load(p)
    val codes = MrfPipeline.inNetworkCodes(b)
    assert(codes.filter($"negotiation_arrangement" === "capitation").count() == 1)
    val covered = MrfPipeline.items(
      b, "in_network", graft.pipeline.MrfSchema.inNetworkItem)
      .select(explode($"item.covered_services").as("cs"))
      .select($"cs.billing_code").collect().map(_.getString(0)).toSet
    assert(covered == Set("99213", "99214"))
  }

  test("multiple-plans shape: no plan header members, in_network only") {
    import spark.implicits._
    val p = MrfFixtures.writeTemp("multi.json", MrfFixtures.multiPlan).getAbsolutePath
    val bronze = spark.read.format("payer-mrf").load(p)
    val h = MrfPipeline.header(bronze)
    assert(h.count() == 1)
    assert(h.first().getAs[String]("plan_name") == null)
    val s = MrfPipeline.silver(bronze)
    assert(s.codes.count() == 1 && s.prices.count() == 1)
    assert(s.parProviders.count() == 0) // inline groups, no int refs
    // the inline provider_groups variant surfaces through its own
    // silver table...
    assert(s.rateProviderGroups.count() == 1)
    val g = s.rateProviderGroups.first()
    assert(g.getAs[org.apache.spark.sql.Row]("tin").getAs[String]("value") == "55-5555555")
    // ...and reaches gold via the Silver-bundle overload (it used to
    // vanish: the refs-only join path sees no provider rows at all)
    val gold = MrfPipeline.shoppablePrices(s, billingCode = "71045", tinValue = "55-5555555")
    val rows = gold.collect()
    assert(rows.length == 1, s"inline-group price missing from gold: ${rows.toSeq}")
    assert(rows.head.getAs[Double]("negotiated_rate") == 55.0)
    assert(rows.head.getAs[String]("reporting_entity_name") == "graft multi")
    assert(rows.head.isNullAt(rows.head.fieldIndex("provider_group_id")))
    // a refs-variant file through the same overload is unchanged
    val ffsBronzeS = MrfPipeline.silver(
      spark.read.format("payer-mrf")
        .load(MrfFixtures.writeTemp("ffs.json", MrfFixtures.ffs).getAbsolutePath))
    val goldRefs = MrfPipeline.shoppablePrices(ffsBronzeS, "27447", "11-1111111")
    assert(goldRefs.collect().head.getAs[Double]("negotiated_rate") == 123.45)
  }

  test("bundle arrangement: bundled_codes survive the parse") {
    import spark.implicits._
    val p = MrfFixtures.writeTemp("bundle.json", MrfFixtures.bundle).getAbsolutePath
    val b = spark.read.format("payer-mrf").load(p)
    val codes = MrfPipeline.inNetworkCodes(b)
    assert(codes.filter($"negotiation_arrangement" === "bundle").count() == 1)
    val bundled = MrfPipeline.bundledCodes(codes)
    assert(bundled.select($"billing_code").collect().map(_.getString(0)).toSet ==
      Set("59400", "59409"))
    // bundled components join back to their parent bundle item
    assert(bundled.join(codes.drop("file_name", "billing_code", "billing_code_type",
      "billing_code_type_version", "description"), "sk_in_network_id").count() == 2)
  }

  test("q43 flagship: source → bronze → silver → gold matches the derivation") {
    // the oracle-checked catalog query, pinned here at sf0.001 so the
    // whole chain (JSON assembly, streaming source, pipeline) also runs
    // under the spec suite: billing code 7 = parts {7, 27}, each with
    // one rate referencing group 8 (j=0), two provider_groups entries
    // under TIN-8 → exactly 4 rows
    val q43 = graft.queries.QueryCatalog.queries("q43_mrf_gold_pipeline")
    val rows = q43(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 4)
    val byRateNpi = rows.map(r => (
      r.getAs[Double]("negotiated_rate"), r.getAs[String]("npi_csv"),
      r.getAs[String]("tin_value"), r.getAs[String]("billing_code"),
      r.getAs[Long]("provider_group_id"))).toSet
    assert(byRateNpi == Set(
      (7.0, "801,802", "TIN-8", "7", 8L),
      (7.0, "803", "TIN-8", "7", 8L),
      (27.0, "801,802", "TIN-8", "7", 8L),
      (27.0, "803", "TIN-8", "7", 8L)))
    assert(rows.forall(_.getAs[String]("reporting_entity_name") == "graft-test-payer"))
    assert(rows.forall(_.getAs[String]("service_code_csv") == "11,22"))
  }
}

package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit CMS Transparency-in-Coverage in-network-rates schema
  * (public CMSgov price-transparency-guide; field inventory catalogued
  * from the reference's fixtures and silver ETL —
  * /root/repo/FIXTURES.md §3, `/root/reference/01_payer_mrf_demo.py:
  * 148-213`).
  *
  * An explicit schema replaces the reference's two-pass
  * `spark.read.json(rdd)` inference (`01_payer_mrf_demo.py:127-129`) —
  * at 100 TB an inference pass is a full extra read of the data; with
  * `from_json` + this schema parsing is single-pass and the schema is
  * stable across files (inference would drift per-file as optional
  * branches appear/disappear). Every variant branch is nullable.
  */
object MrfSchema {

  val tin: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("value", StringType)))

  val providerGroup: StructType = StructType(Seq(
    StructField("npi", ArrayType(LongType)),
    StructField("tin", tin)))

  /** provider_references top-level array element — `provider_groups`
    * inline variant OR remote `location` variant.
    */
  val providerReference: StructType = StructType(Seq(
    StructField("provider_group_id", LongType),
    StructField("provider_groups", ArrayType(providerGroup)),
    StructField("location", StringType)))

  val negotiatedPrice: StructType = StructType(Seq(
    StructField("negotiated_type", StringType),
    StructField("negotiated_rate", DoubleType),
    StructField("expiration_date", StringType),
    StructField("service_code", ArrayType(StringType)),
    StructField("billing_class", StringType),
    StructField("billing_code_modifier", ArrayType(StringType)),
    StructField("additional_information", StringType)))

  /** negotiated_rates element — int refs into provider_references OR
    * inline provider_groups.
    */
  val negotiatedRate: StructType = StructType(Seq(
    StructField("provider_references", ArrayType(LongType)),
    StructField("provider_groups", ArrayType(providerGroup)),
    StructField("negotiated_prices", ArrayType(negotiatedPrice))))

  val bundledCode: StructType = StructType(Seq(
    StructField("billing_code_type", StringType),
    StructField("billing_code_type_version", StringType),
    StructField("billing_code", StringType),
    StructField("description", StringType)))

  val coveredService: StructType = bundledCode

  /** in_network top-level array element. */
  val inNetworkItem: StructType = StructType(Seq(
    StructField("negotiation_arrangement", StringType),
    StructField("name", StringType),
    StructField("billing_code_type", StringType),
    StructField("billing_code_type_version", StringType),
    StructField("billing_code", StringType),
    StructField("description", StringType),
    StructField("negotiated_rates", ArrayType(negotiatedRate)),
    StructField("bundled_codes", ArrayType(bundledCode)),
    StructField("covered_services", ArrayType(coveredService))))

  /** Top-level scalar header members (the `header_key=""` residue). */
  val header: StructType = StructType(Seq(
    StructField("reporting_entity_name", StringType),
    StructField("reporting_entity_type", StringType),
    StructField("plan_name", StringType),
    StructField("plan_id_type", StringType),
    StructField("plan_id", StringType),
    StructField("plan_market_type", StringType),
    StructField("last_updated_on", StringType),
    StructField("version", StringType)))
}

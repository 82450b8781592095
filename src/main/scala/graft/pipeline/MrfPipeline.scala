package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Bronze → silver → gold transforms over payer-mrf bronze rows,
  * re-expressing the reference's notebook ETL (`/root/reference/
  * 01_payer_mrf_demo.py:143-238`) as composable `DataFrame => DataFrame`
  * library functions.
  *
  * Differences by design:
  *  - explicit [[MrfSchema]] `from_json` instead of two-pass RDD
  *    inference (single-pass; see MrfSchema scaladoc);
  *  - DETERMINISTIC surrogate keys (`xxhash64` of natural keys +
  *    position) instead of `uuid()` (`01_payer_mrf_demo.py:165,180`) —
  *    nondeterministic keys break retries (a re-executed task mints new
  *    keys, corrupting downstream joins at scale), golden tests, and
  *    incremental rebuilds;
  *  - header attribution joins on `file_name` instead of a cross join,
  *    so the pipeline is correct over MANY files in one pass (the
  *    reference processes one file at a time; its `1=1` join at
  *    `:157-158` would cross-contaminate).
  *
  * All transforms work on any of the source's three output shapes
  * (chunk text, `payloadAsArray`, `perElement`).
  */
object MrfPipeline {

  /** One row per element of the given top-level array, with the element
    * parsed into `col("item")` using `schema`, `file_name` retained.
    * Unparseable payloads DROP in every input shape (the chunk path's
    * explode(null) did this implicitly; the per-element and array paths
    * filter explicitly) — a corrupt element must not flow into silver
    * as an all-null row with a degenerate surrogate key.
    */
  def items(bronze: DataFrame, headerKey: String, schema: StructType): DataFrame = {
    val payloadIsArray = bronze.schema("json_payload").dataType
      .isInstanceOf[ArrayType]
    val base = bronze.filter(col("header_key") === headerKey)
    val parsed =
      if (payloadIsArray) {
        // payloadAsArray: one JSON object string per element — explode
        // first, then parse (a generator cannot nest inside from_json)
        base.select(col("file_name"), explode(col("json_payload")).as("el"))
          .select(col("file_name"), from_json(col("el"), schema).as("item"))
      } else {
        // chunk text "[…]" OR perElement object text — branch per row;
        // only one parse executes per row under codegen
        base.select(
          col("file_name"),
          explode(
            when(
              startswith(col("json_payload"), lit("[")),
              from_json(col("json_payload"), ArrayType(schema)))
              .otherwise(array(from_json(col("json_payload"), schema))))
            .as("item"))
      }
    parsed.filter(col("item").isNotNull)
  }

  /** Silver: one row per source file with the header scalars
    * (`:148-159`'s header side, keyed by file for multi-file safety).
    */
  def header(bronze: DataFrame): DataFrame = {
    val payload =
      if (bronze.schema("json_payload").dataType.isInstanceOf[ArrayType])
        element_at(col("json_payload"), 1)
      else col("json_payload")
    bronze.filter(col("header_key") === "")
      .select(col("file_name"), from_json(payload, MrfSchema.header).as("h"))
      .select(col("file_name"), col("h.*"))
  }

  /** Silver: provider_references_x_payer — one row per (group id, inline
    * group), header entity columns attached (`01_payer_mrf_demo.py:
    * 148-159`). Remote `location` variants keep a row with null npi/tin.
    */
  def providerReferencesXPayer(bronze: DataFrame): DataFrame =
    providerReferencesXPayer(bronze, header(bronze))

  /** [[providerReferencesXPayer]] reusing an already-built [[header]]
    * frame — `silver()` passes its own, so one silver star plans one
    * header scan branch, not two.
    */
  def providerReferencesXPayer(bronze: DataFrame, hdr: DataFrame): DataFrame = {
    val refs = items(bronze, "provider_references", MrfSchema.providerReference)
      .select(
        col("file_name"),
        col("item.provider_group_id").as("provider_group_id"),
        col("item.location").as("location"),
        explode_outer(col("item.provider_groups")).as("g"))
      .select(
        col("file_name"), col("provider_group_id"), col("location"),
        col("g.npi").as("npi"), col("g.tin").as("tin"))
    val h = hdr
      .select(col("file_name"), col("reporting_entity_name"), col("reporting_entity_type"))
    // per-file attribution; broadcast — one small row per file
    refs.join(broadcast(h), Seq("file_name"), "left")
  }

  /** Deterministic surrogate key for one in_network item: natural keys
    * PLUS a hash of the full item content. Real MRFs repeat a billing
    * code (same arrangement/type/version/code/name, different rates) —
    * natural keys alone would give both items one key and cross-link
    * their rates/prices/providers downstream. Byte-identical duplicate
    * items still share a key and are DEDUPLICATED in [[inNetworkCodes]]
    * (they carry zero additional information, and left in, the
    * rates × prices × providers join chain would multiply their gold
    * rows combinatorially — 8× per duplicated item, not 2×).
    */
  private def skInNetwork: Column = xxhash64(
    col("file_name"), col("item.negotiation_arrangement"),
    col("item.billing_code_type"), col("item.billing_code_type_version"),
    col("item.billing_code"), col("item.name"),
    xxhash64(to_json(col("item"))))

  /** Silver: in_network_codes — one row per billing code item
    * (`01_payer_mrf_demo.py:161-174`), carrying the nested rates for
    * downstream normalizers.
    */
  def inNetworkCodes(bronze: DataFrame): DataFrame =
    items(bronze, "in_network", MrfSchema.inNetworkItem)
      .select(
        skInNetwork.as("sk_in_network_id"),
        col("file_name"),
        col("item.negotiation_arrangement").as("negotiation_arrangement"),
        col("item.name").as("name"),
        col("item.billing_code_type").as("billing_code_type"),
        col("item.billing_code_type_version").as("billing_code_type_version"),
        col("item.billing_code").as("billing_code"),
        col("item.description").as("description"),
        col("item.negotiated_rates").as("negotiated_rates"),
        col("item.bundled_codes").as("bundled_codes"))
      // byte-identical duplicate items collapse to ONE row (see
      // [[skInNetwork]]); the exchange this costs doubles as the
      // co-partitioning on sk_in_network_id that the downstream
      // rates/prices joins reuse
      .dropDuplicates("sk_in_network_id")

  /** Silver: in_network_rates — one row per negotiated_rates element
    * (`:176-188`); sk_rate_id = hash(parent key, position).
    */
  def inNetworkRates(codes: DataFrame): DataFrame =
    codes.select(
      col("sk_in_network_id"), col("file_name"),
      posexplode(col("negotiated_rates")).as(Seq("rate_pos", "rate")))
      .select(
        xxhash64(col("sk_in_network_id"), col("rate_pos")).as("sk_rate_id"),
        col("sk_in_network_id"), col("file_name"), col("rate_pos"), col("rate"))

  /** Silver: in_network_rates_prices — one row per negotiated price with
    * `negotiated_type='negotiated'` (`:190-201`).
    */
  def inNetworkPrices(rates: DataFrame): DataFrame =
    rates.select(
      col("sk_rate_id"), col("sk_in_network_id"), col("file_name"),
      explode(col("rate.negotiated_prices")).as("price"))
      .filter(col("price.negotiated_type") === "negotiated")
      .select(
        col("sk_rate_id"), col("sk_in_network_id"), col("file_name"),
        col("price.negotiated_type").as("negotiated_type"),
        col("price.negotiated_rate").as("negotiated_rate"),
        col("price.expiration_date").as("expiration_date"),
        col("price.service_code").as("service_code"),
        col("price.billing_class").as("billing_class"),
        col("price.billing_code_modifier").as("billing_code_modifier"))

  /** Silver: bundled codes — one row per (bundle item, component code)
    * for `negotiation_arrangement='bundle'` items (the shape the demo
    * leaves nested; normalized here so bundle queries join like FFS).
    */
  def bundledCodes(codes: DataFrame): DataFrame =
    codes
      .filter(col("bundled_codes").isNotNull)
      .select(
        col("sk_in_network_id"), col("file_name"),
        explode(col("bundled_codes")).as("bc"))
      .select(
        col("sk_in_network_id"), col("file_name"),
        col("bc.billing_code_type").as("billing_code_type"),
        col("bc.billing_code_type_version").as("billing_code_type_version"),
        col("bc.billing_code").as("billing_code"),
        col("bc.description").as("description"))

  /** Silver: in_network_rates_par_providers — one row per (rate,
    * referenced provider group id) (`:203-213`).
    */
  def inNetworkParProviders(rates: DataFrame): DataFrame =
    rates.select(
      col("sk_rate_id"), col("sk_in_network_id"), col("file_name"),
      explode(col("rate.provider_references")).as("provider_reference_id"))

  /** Silver: INLINE `provider_groups` carried directly on a rate — the
    * CMS variant WITHOUT the `provider_references` indirection
    * (`MrfSchema.negotiatedRate` models both). One row per (rate,
    * inline group). The reference's silver never surfaces this branch;
    * without it every price on an inline-group rate silently vanishes
    * from gold.
    */
  def inNetworkRateProviderGroups(rates: DataFrame): DataFrame =
    rates.select(
      col("sk_rate_id"), col("sk_in_network_id"), col("file_name"),
      explode(col("rate.provider_groups")).as("g"))
      .select(
        col("sk_rate_id"), col("sk_in_network_id"), col("file_name"),
        col("g.npi").as("npi"), col("g.tin").as("tin"))

  /** Gold: the reference's "shoppable prices" lookup
    * (`01_payer_mrf_demo.py:223-238`): for a billing code and a provider
    * TIN, every negotiated FFS price with the provider group's NPIs.
    *
    * Join strategy at scale: codes/prices/par_providers co-partition on
    * the surrogate keys they join on; the provider side is filtered to
    * one TIN before joining, so Catalyst broadcasts it.
    */
  /** The FFS code slice both gold variants start from — ONE definition,
    * so the reference-resolved and inline-group branches cannot drift
    * on the filter or the carried columns.
    */
  private def ffsProc(codes: DataFrame, billingCode: String): DataFrame =
    codes
      .filter(col("billing_code") === billingCode &&
        col("negotiation_arrangement") === "ffs")
      .select("sk_in_network_id", "file_name", "billing_code", "billing_code_type", "name")

  /** The gold 12-column projection shared by both variants; only the
    * provider_group_id expression differs (real column vs typed null).
    */
  private def goldColumns(providerGroupId: Column): Seq[Column] = Seq(
    col("file_name"), col("reporting_entity_name"), col("billing_code"),
    col("billing_code_type"), col("name"), col("negotiated_rate"),
    col("billing_class"), col("service_code"), col("expiration_date"),
    providerGroupId.as("provider_group_id"), col("npi"), col("tin"))

  def shoppablePrices(
      codes: DataFrame,
      prices: DataFrame,
      parProviders: DataFrame,
      providersXPayer: DataFrame,
      billingCode: String,
      tinValue: String): DataFrame = {
    val proc = ffsProc(codes, billingCode)
    val prov = providersXPayer
      .filter(col("tin.value") === tinValue)
      .select(
        col("file_name").as("p_file_name"), col("provider_group_id"),
        col("npi"), col("tin"), col("reporting_entity_name"))
    proc
      .join(prices.drop("file_name"), "sk_in_network_id")
      .join(parProviders.select("sk_rate_id", "provider_reference_id"), "sk_rate_id")
      .join(
        broadcast(prov),
        col("provider_reference_id") === col("provider_group_id") &&
          col("file_name") === col("p_file_name"))
      .select(goldColumns(col("provider_group_id")): _*)
  }

  /** Gold over a full [[Silver]] bundle: BOTH provider variants —
    * group-id references resolved through provider_references_x_payer,
    * AND inline per-rate provider_groups (provider_group_id is null on
    * those rows; entity attribution comes from the header by file).
    */
  def shoppablePrices(s: Silver, billingCode: String, tinValue: String): DataFrame = {
    val viaRefs = shoppablePrices(
      s.codes, s.prices, s.parProviders, s.providersXPayer, billingCode, tinValue)
    val h = s.header
      .select(col("file_name").as("h_file_name"), col("reporting_entity_name"))
    val inline = ffsProc(s.codes, billingCode)
      .join(s.prices.drop("file_name"), "sk_in_network_id")
      .join(
        s.rateProviderGroups
          .filter(col("tin.value") === tinValue)
          .select(col("sk_rate_id"), col("npi"), col("tin")),
        "sk_rate_id")
      .join(broadcast(h), col("file_name") === col("h_file_name"), "left")
      .select(goldColumns(lit(null).cast("long")): _*)
    viaRefs.unionByName(inline)
  }

  /** Convenience: all silver tables from one bronze frame. */
  final case class Silver(
      header: DataFrame,
      providersXPayer: DataFrame,
      codes: DataFrame,
      rates: DataFrame,
      prices: DataFrame,
      parProviders: DataFrame,
      rateProviderGroups: DataFrame,
      bundledCodes: DataFrame)

  def silver(bronze: DataFrame): Silver = {
    val c = inNetworkCodes(bronze)
    val r = inNetworkRates(c)
    val h = header(bronze)
    Silver(
      header = h,
      providersXPayer = providerReferencesXPayer(bronze, h),
      codes = c.drop("negotiated_rates"),
      rates = r.drop("rate"),
      prices = inNetworkPrices(r),
      parProviders = inNetworkParProviders(r),
      rateProviderGroups = inNetworkRateProviderGroups(r),
      bundledCodes = bundledCodes(c))
  }
}

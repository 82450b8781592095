package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCHEMA-DRIFT DETECTION over semi-structured payloads — the
  * guardrail a production MRF (or any JSON-feed) pipeline runs before
  * trusting `from_json` with an explicit schema: real-world payer
  * files add vendor extension fields and omit optional ones
  * (`/root/reference` fixtures show the `location` vs inline-groups
  * variants), and a fixed schema silently NULLs what it doesn't know.
  * This op makes the drift VISIBLE: for every (header_key, top-level
  * field) it reports how many elements carry the field and whether
  * the declared contract expects it — unexpected fields surface with
  * `is_expected = false`, contract fields missing from the whole
  * corpus surface with `n_elements = 0`.
  *
  * Scale: one pass over the per-element payloads (`json_object_keys`
  * only tokenizes the top level — no full parse), one narrow
  * aggregation on (header_key, field), then a full-outer join against
  * the literal contract table (broadcast, dozens of rows).
  */
object SchemaDrift {

  def fieldDrift(
      perElement: DataFrame,
      expected: Map[String, Seq[String]]): DataFrame = {
    require(expected.nonEmpty, "fieldDrift: empty contract")
    val spark = perElement.sparkSession
    import spark.implicits._
    val contract = expected.toSeq
      .flatMap { case (hk, fs) => fs.map(f => (hk, f)) }
      .toDF("header_key", "field")
      .withColumn("is_expected", lit(true))
    val observed = perElement
      .select(col("header_key"),
        explode(expr("json_object_keys(json_payload)")).as("field"))
      .groupBy(col("header_key"), col("field"))
      .agg(count(lit(1)).as("n_elements"))
    observed
      .join(broadcast(contract), Seq("header_key", "field"), "full_outer")
      .select(
        col("header_key"), col("field"),
        coalesce(col("n_elements"), lit(0L)).as("n_elements"),
        coalesce(col("is_expected"), lit(false)).as("is_expected"))
  }
}

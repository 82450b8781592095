package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `format("payer-mrf")` entry point (short name registered via
  * META-INF/services, the same stable mechanism as the reference:
  * `/root/reference/src/main/resources/META-INF/services/
  * org.apache.spark.sql.sources.DataSourceRegister:1`).
  *
  * Works for both `spark.read` and `spark.readStream`; the fixed 3-column
  * bronze schema is source-defined (`JsonMRFSourceProvider.scala:18-28`).
  */
final class MrfDataSource extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister {

  override def shortName(): String = "payer-mrf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MrfOptions(options).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = MrfOptions.fromProperties(properties)
    // the bronze schema is fixed by the source: a user-supplied schema
    // that differs must fail HERE, at planning time — accepting it
    // would make Spark treat the user's shape as the relation output
    // while the readers emit the source shape (per-row MatchError at
    // best, silently corrupt rows at worst)
    require(
      schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        opts.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"payer-mrf defines its own schema ${opts.schema.simpleString} " +
        s"(json_payload shape follows the payloadAsArray option); a user-supplied " +
        s"schema must match it exactly, got ${schema.simpleString}")
    new MrfTable(opts, new CaseInsensitiveStringMap(properties))
  }

  // the bronze schema is fixed by the source; a user-supplied schema is
  // accepted only if it matches (the reference silently ignored it)
  override def supportsExternalMetadata(): Boolean = true
}

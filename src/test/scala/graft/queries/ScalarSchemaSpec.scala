package graft.queries

import graft.SparkTestBase

/** Catalog-wide harness-compat gate: the driver's compare lexsorts the
  * RAW parquet result in pandas, so any array/map/struct output column
  * crashes it before values are compared (round-5 q58/q82/q83/q88
  * shipped red exactly this way while their Scala was correct). This
  * spec goes red the moment anyone adds a query whose result schema
  * the gate cannot sort — same rule `graft.Verify` enforces at dump
  * time, checked here before a round ships.
  *
  * Building each query's DataFrame at sf0.001 is plan construction
  * only for most queries (no action), but the streaming queries and
  * driver-side trainers (k-means, BPE, logistic GD) legitimately
  * execute bounded work — the whole suite runs in about a minute at
  * sf0.001, which is the price of the guard covering EVERY query
  * rather than a hand-picked subset.
  */
class ScalarSchemaSpec extends SparkTestBase {
  private val sfDir = "/root/testdata/sf0.001"

  QueryCatalog.modules.foreach { q =>
    test(s"${q.name} emits a scalar-only, driver-sortable schema") {
      graft.Verify.assertGateSortableSchema(q.name, q.fn(spark, sfDir).schema)
    }
  }

  test("the guard itself rejects array, map, and struct columns (negative cases)") {
    import org.apache.spark.sql.types._
    def bad(dt: DataType): StructType =
      StructType(Seq(StructField("id", LongType), StructField("v", dt)))
    Seq(
      ArrayType(DoubleType),
      MapType(StringType, LongType),
      StructType(Seq(StructField("x", DoubleType)))).foreach { dt =>
      val ex = intercept[IllegalArgumentException] {
        graft.Verify.assertGateSortableSchema("synthetic", bad(dt))
      }
      assert(ex.getMessage.contains("cannot sort") && ex.getMessage.contains("v"),
        s"${dt.simpleString}: ${ex.getMessage}")
    }
    // scalars (incl. binary/timestamp/decimal) pass
    graft.Verify.assertGateSortableSchema("synthetic", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", BinaryType), StructField("d", TimestampType),
      StructField("e", DecimalType(18, 6)))))
  }
}

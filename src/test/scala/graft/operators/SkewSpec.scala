package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Salting must redistribute work without changing results. */
class SkewSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet")
  }

  test("salted aggregate equals plain aggregate") {
    import spark.implicits._
    val plain = events.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,6)")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedAggregate(
      events,
      keys = Seq("event_type"),
      partialAggs = Seq(
        count(lit(1)).as("pn"),
        sum($"value".cast("decimal(18,6)")).as("pt")),
      finalAggs = Seq(sum($"pn").as("n"), sum($"pt").as("total")),
      salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val dim = events.select($"event_type").distinct()
      .withColumn("type_tag", concat(lit("tag_"), $"event_type"))
    val plain = events.join(dim, Seq("event_type"))
      .groupBy($"type_tag").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(events, dim, Seq("event_type"), salts = 8)
      .groupBy($"type_tag").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}

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

  test("saltFrom spreads byte-identical hot rows; content hash cannot") {
    import spark.implicits._
    // the canonical workload the content hash fails on: one hot key,
    // every row byte-identical, but each row has a unique id available
    val hot = spark.range(0, 10000)
      .select($"id", lit("hot").as("k"), lit(1L).as("v"))
    def saltSpread(saltFrom: Option[org.apache.spark.sql.Column]): Long =
      Skew.saltedAggregate(
        hot.select($"k", $"v", saltFrom.map(_ => $"id").getOrElse(lit(0L)).as("id")),
        keys = Seq("k"), partialAggs = Seq(count(lit(1)).as("pn")),
        finalAggs = Seq(sum($"pn").as("n")), salts = 8,
        saltFrom = saltFrom.map(_ => $"id"))
        .collect().head.getLong(1) // result row count check below
    // results identical either way
    assert(saltSpread(Some($"id")) == 10000L && saltSpread(None) == 10000L)
    // and the id-salted PARTIAL stage really uses >1 salt bucket while
    // the identical-row content hash collapses to exactly 1
    def partialGroups(saltFrom: Option[org.apache.spark.sql.Column]): Long = {
      val df = hot.select($"k", $"v", $"id")
      df.withColumn("__salt",
        pmod(xxhash64(saltFrom.map(Seq(_)).getOrElse(df.columns.toSeq.map(col)): _*), lit(8L)))
        .select($"__salt").distinct().count()
    }
    assert(partialGroups(Some($"id")) > 1, "unique-id salt should spread identical rows")
    // identical rows WITHOUT the id column share one salt — the caveat
    val allSame = hot.select($"k", $"v")
    val contentSalts = allSame.withColumn("__salt",
      pmod(xxhash64(allSame.columns.toSeq.map(col): _*), lit(8L)))
      .select($"__salt").distinct().count()
    assert(contentSalts == 1)
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

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed joins must produce identical results to plain joins while
  * planning with ZERO shuffle exchanges — asserted from the executed
  * plan, not assumed.
  */
class BucketingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without a shuffle") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", 4)
    try {
      // disable auto-broadcast so the join strategy is genuinely SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an exchange; the only shuffle
      // allowed is the final small aggregation on o_orderpriority
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"join shuffled the bucketed side:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"join shuffled the bucketed side:\n$plan")
      // results identical to the unbucketed join
      val expected = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}

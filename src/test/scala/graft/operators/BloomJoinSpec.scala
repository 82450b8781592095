package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BloomJoin: exactness vs the plain semi join, the no-false-negative
  * soundness of the pre-filter, the map-side plan shape, and the
  * filter-size guard.
  */
class BloomJoinSpec extends SparkTestBase {

  test("bloomSemiJoin is bit-identical to the plain semi join, even at high fpp") {
    import spark.implicits._
    val big = (1L to 2000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = Seq(3L, 500L, 501L, 1999L, 5000L).toDF("sk") // 5000 matches nothing
    // fpp 0.3: false positives are near-certain in the pre-filter; the
    // exact join must remove every one of them
    val got = BloomJoin.bloomSemiJoin(big, small, $"k", $"sk", fpp = 0.3)
      .orderBy($"k").collect().map(_.getLong(0)).toSeq
    val want = big.join(small, $"k" === $"sk", "left_semi")
      .orderBy($"k").collect().map(_.getLong(0)).toSeq
    assert(got == want)
    assert(got == Seq(3L, 500L, 501L, 1999L))
  }

  test("pre-filter soundness: every true match survives (no false negatives)") {
    import spark.implicits._
    val big = (1L to 5000L).toDF("k")
    val small = (1L to 5000L by 97).toDF("sk")
    val pre = BloomJoin.bloomPreFilter(big, small, $"k", $"sk")
      .collect().map(_.getLong(0)).toSet
    val matches = (1L to 5000L by 97).toSet
    assert(matches.subsetOf(pre), "bloom pre-filter dropped a true match")
    // and it actually filters: at fpp 0.01 on 5000 probes / 52 matches,
    // anywhere near the full probe side surviving means the filter is
    // not being applied at all
    assert(pre.size < 1000, s"pre-filter kept ${pre.size} of 5000 rows")
  }

  test("pre-filter plan is pure map-side: no exchange, no join") {
    import spark.implicits._
    val big = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val small = Seq(1L, 2L).toDF("sk")
    val plan = BloomJoin.bloomPreFilter(big, small, $"l_orderkey", $"sk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), s"probe missing from plan:\n$plan")
    assert(!plan.contains("Exchange"), s"pre-filter must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"pre-filter must not join:\n$plan")
  }

  test("semi-join plan: the bloom probe filters below the join") {
    import spark.implicits._
    val big = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val small = Seq(1L, 2L, 3L).toDF("sk")
    val plan = BloomJoin.bloomSemiJoin(big, small, $"l_orderkey", $"sk")
      .queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("graft_bloom_contains")
    val joinAt = plan.indexOf("Join")
    assert(probeAt >= 0 && joinAt >= 0, s"expected probe + join in plan:\n$plan")
    // executed-plan strings print operators top-down: the filter must
    // sit BELOW (after) the join operator it feeds
    assert(probeAt > joinAt, s"bloom probe must be below the join:\n$plan")
  }

  test("null keys: dropped from filter and never matched, like the equi-join") {
    import spark.implicits._
    val big = Seq[(java.lang.Long, String)]((1L, "a"), (null, "n"), (2L, "b"))
      .toDF("k", "payload")
    val small = Seq[java.lang.Long](1L, null).toDF("sk")
    val got = BloomJoin.bloomSemiJoin(big, small, $"k", $"sk")
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("a"))
  }

  test("filter-size cap throws instead of shipping an oversized literal") {
    import spark.implicits._
    val small = (1L to 100000L).toDF("sk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.buildKeyFilter(small, $"sk", fpp = 0.01, maxFilterBytes = 1024)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("blocked pre-filter soundness: every true match survives, and it filters") {
    import spark.implicits._
    val big = (1L to 5000L).toDF("k")
    val small = (1L to 5000L by 97).toDF("sk")
    // hash the keys like production call sites do (the filter expects
    // well-mixed 64-bit keys)
    val pre = BloomJoin.blockedBloomPreFilter(
      big, small, xxhash64($"k"), xxhash64($"sk"))
      .collect().map(_.getLong(0)).toSet
    val matches = (1L to 5000L by 97).toSet
    assert(matches.subsetOf(pre), "blocked bloom pre-filter dropped a true match")
    assert(pre.size < 1000, s"blocked pre-filter kept ${pre.size} of 5000 rows")
  }

  test("BlockedBloom kernel: no false negatives, low fp rate, merge works") {
    import graft.functions.BlockedBloom
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(200000)(rnd.nextLong())
    val a = BlockedBloom.create(keys.length)
    val b = BlockedBloom.create(keys.length)
    keys.take(100000).foreach(a.put)
    keys.drop(100000).foreach(b.put)
    val merged = a.mergeInPlace(b)
    assert(keys.forall(merged.mightContain), "false negative after merge")
    val keySet = keys.toSet
    val probes = Array.fill(200000)(rnd.nextLong())
    val fresh = probes.filterNot(keySet.contains)
    val fp = fresh.count(merged.mightContain).toDouble / fresh.length
    assert(fp < 0.03, s"fp rate $fp too high for 16 bits/key")
    // serialization round-trip is exact
    val back = BlockedBloom.deserialize(merged.serialized)
    assert(keys.forall(back.mightContain))
    assert(java.util.Arrays.equals(back.words, merged.words))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[MarketBasket.associationRules]] semantics on a hand-checkable
  * basket set: exact counts, metric arithmetic, duplicate-line
  * idempotence, null drops, and the confidence threshold.
  */
class MarketBasketSpec extends SparkTestBase {
  import spark.implicits._

  // 4 baskets: {A,B,C} {A,B} {A,C} {B} — pair counts AB=2 AC=2 BC=1
  private val items = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "B"))

  test("counts and metrics match the hand calculation") {
    val df = items.toDF("basket", "item")
    val got = MarketBasket.associationRules(df, col("basket"), col("item"),
        minPairCount = 2L, minConfidence = 0.0)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    // BC (count 1) pruned by minPairCount; both directions of AB, AC
    assert(got.keySet == Set(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")))
    val (pairN, anteN, consN, supp, conf, lift) = got(("A", "B"))
    assert(pairN == 2L && anteN == 3L && consN == 3L)
    assert(math.abs(supp - 2.0 / 4.0) < 1e-15)
    assert(math.abs(conf - 2.0 / 3.0) < 1e-15)
    // lift = (2/3) / (3/4) = 8/9
    assert(math.abs(lift - (2.0 / 3.0) / (3.0 / 4.0)) < 1e-15)
    // direction matters through ante/cons counts: B->A has conf 2/3 too
    assert(math.abs(got(("B", "A"))._5 - 2.0 / 3.0) < 1e-15)
  }

  test("duplicate (basket, item) lines count once; nulls drop") {
    val dup = (items ++ items).toDF("basket", "item")
    val withNulls = dup.unionByName(
      Seq((Option.empty[Long], Option("A")), (Option(9L), Option.empty[String]))
        .toDF("basket", "item"))
    val a = MarketBasket.associationRules(dup, col("basket"), col("item"), 2L, 0.0)
      .collect().map(_.toSeq).toSet
    val b = MarketBasket.associationRules(withNulls, col("basket"), col("item"), 2L, 0.0)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val base = MarketBasket.associationRules(items.toDF("basket", "item"),
      col("basket"), col("item"), 2L, 0.0).collect().map(_.toSeq).toSet
    assert(a == base)
  }

  test("minConfidence prunes rules below the threshold") {
    val got = MarketBasket.associationRules(items.toDF("basket", "item"),
        col("basket"), col("item"), minPairCount = 1L, minConfidence = 0.6)
      .select("antecedent", "consequent", "confidence").collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getDouble(2) >= 0.6, r.toString))
    // C->B (conf 1/2) must be gone, A->B (2/3) must survive
    val keys = got.map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys.contains(("A", "B")) && !keys.contains(("C", "B")))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Cf.itemCosineTopK]]: cosine arithmetic against hand counts,
  * duplicate-interaction idempotence, top-k rank determinism, and the
  * per-user cap's deterministic (portable-hash) truncation.
  */
class CfSpec extends SparkTestBase {
  import spark.implicits._

  // users × items: u1{A,B,C} u2{A,B} u3{A,C} u4{B,C}
  private val rows = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "B"), (4L, "C"))

  test("cosine and ranks match the hand calculation") {
    val got = Cf.itemCosineTopK(rows.toDF("u", "i"), col("u"), col("i"), k = 2, minCo = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getInt(2), r.getLong(3), r.getDouble(6)))
      .toMap
    // counts: A=3 B=3 C=3; co: AB=2 AC=2 BC=2 → all cosines 2/3
    got.foreach { case (_, (_, co, cos)) =>
      assert(co == 2L)
      assert(math.abs(cos - 2.0 / 3.0) < 1e-15)
    }
    // ties broken by neighbor id: A's rank-1 neighbor is B, rank-2 C
    assert(got(("A", "B"))._1 == 1 && got(("A", "C"))._1 == 2)
    assert(got(("B", "A"))._1 == 1 && got(("B", "C"))._1 == 2)
  }

  test("duplicate interactions count once; minCo prunes; k caps") {
    val dup = (rows ++ rows).toDF("u", "i")
    val a = Cf.itemCosineTopK(dup, col("u"), col("i"), k = 2, minCo = 1L)
      .collect().map(_.toSeq).toSet
    val b = Cf.itemCosineTopK(rows.toDF("u", "i"), col("u"), col("i"), k = 2, minCo = 1L)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val pruned = Cf.itemCosineTopK(rows.toDF("u", "i"), col("u"), col("i"), k = 2, minCo = 3L)
    assert(pruned.count() == 0)
    val k1 = Cf.itemCosineTopK(rows.toDF("u", "i"), col("u"), col("i"), k = 1, minCo = 1L)
      .collect()
    assert(k1.length == 3 && k1.forall(_.getInt(2) == 1))
  }

  test("maxItemsPerUser caps the pair fan-out deterministically") {
    // one bot user with 30 items swamps the pair table; capped at 5
    // its contribution is C(5,2)=10 pairs, chosen by the portable hash
    val bot = (1 to 30).map(i => (99L, f"I$i%02d"))
    val df = (rows ++ bot).toDF("u", "i")
    val capped = Cf.itemCosineTopK(df, col("u"), col("i"),
      k = 100, minCo = 1L, maxItemsPerUser = 5)
    // re-running yields the identical result (no RNG anywhere)
    val again = Cf.itemCosineTopK(df, col("u"), col("i"),
      k = 100, minCo = 1L, maxItemsPerUser = 5)
    assert(capped.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
    // the bot's surviving items form exactly C(5,2)=10 canonical pairs
    // → 20 directed bot-bot rows; the organic 4 users are untouched
    val botRows = capped.filter(col("item").startsWith("I")).collect()
    assert(botRows.length == 20, s"got ${botRows.length}")
  }
}

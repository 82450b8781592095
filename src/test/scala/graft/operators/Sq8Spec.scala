package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class Sq8Spec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (Long, Seq[Double])*) = rows.toDF("id", "v")

  test("trains exact per-dimension ranges and encodes the known codes") {
    val d = df(
      1L -> Seq(0.0, 10.0, -1.0),
      2L -> Seq(1.0, 20.0, -1.0),
      3L -> Seq(0.5, 15.0, -1.0))
    val (lo, hi) = Similarity.sq8Train(d, $"v")
    assert(lo.toSeq == Seq(0.0, 10.0, -1.0) && hi.toSeq == Seq(1.0, 20.0, -1.0))
    val codes = d.select($"id", Similarity.sq8Codes($"v", lo, hi).as("c"))
      .orderBy($"id").collect().map(_.getSeq[Int](1))
    // dim 0: x∈{0,1,.5} → 0, 255, floor(.5*255+.5)=128
    // dim 1: 10→0, 20→255, 15→128; dim 2 degenerate → 0
    assert(codes(0).toSeq == Seq(0, 0, 0))
    assert(codes(1).toSeq == Seq(255, 255, 0))
    assert(codes(2).toSeq == Seq(128, 128, 0))
  }

  test("training is repartition-invariant (min/max are order-free)") {
    val d = (1L to 100L).map(i => i -> Seq(i.toDouble, -i.toDouble, i * 0.5)).toDF("id", "v")
    val (lo1, hi1) = Similarity.sq8Train(d, $"v")
    val (lo2, hi2) = Similarity.sq8Train(d.repartition(13), $"v")
    assert(lo1.toSeq == lo2.toSeq && hi1.toSeq == hi2.toSeq)
  }

  test("ragged corpora, empty corpora, and wrong-length encode inputs fail loudly") {
    val ragged = df(1L -> Seq(1.0, 2.0), 2L -> Seq(1.0, 2.0, 3.0))
    val e1 = intercept[IllegalArgumentException](Similarity.sq8Train(ragged, $"v"))
    assert(e1.getMessage.contains("ragged"))
    intercept[IllegalArgumentException] {
      Similarity.sq8Train(df(), $"v")
    }
    val (lo, hi) = Similarity.sq8Train(df(1L -> Seq(1.0, 2.0), 2L -> Seq(3.0, 4.0)), $"v")
    val bad = df(1L -> Seq(1.0, 2.0, 3.0))
      .select(Similarity.sq8Codes($"v", lo, hi))
    val e2 = intercept[Exception](bad.collect())
    assert(e2.getMessage != null)
  }

  test("null vectors encode to null codes") {
    val d = Seq((1L, Some(Seq(1.0, 2.0))), (2L, Option.empty[Seq[Double]])).toDF("id", "v")
    val (lo, hi) = Similarity.sq8Train(d, $"v")
    val out = d.select($"id", Similarity.sq8Codes($"v", lo, hi).as("c"))
      .orderBy($"id").collect()
    assert(out(0).getSeq[Int](1) != null && out(1).isNullAt(1))
  }
}

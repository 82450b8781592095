package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Survival.kaplanMeier]] against textbook hand values (censoring
  * reduces risk sets without deaths, extinction zeroes the curve) and
  * [[Experiment.twoProportionZ]] arithmetic + assignment stability.
  */
class SurvivalExperimentSpec extends SparkTestBase {
  import spark.implicits._

  test("kaplanMeier matches the textbook example with censoring") {
    // durations: deaths at 1 (n=6) and 3 (n=4); censored at 2 and 3;
    // survivors censored at 4 — classic KM worksheet
    val rows = Seq(
      (1L, true), (1L, true),   // d=2 of 6 at t=1 → f=2/3
      (2L, false),              // censored, leaves risk set after 2
      (3L, true), (3L, false),  // d=1 of 3 at t=3 → f=2/3
      (4L, false))
    val got = Survival.kaplanMeier(rows.toDF("dur", "ev"), col("dur"), col("ev"))
      .orderBy(col("t")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got(1L)._1 == 6L && got(1L)._2 == 2L)
    assert(math.abs(got(1L)._4 - 2.0 / 3.0) < 1e-12)
    assert(got(2L)._1 == 4L && got(2L)._2 == 0L && got(2L)._3 == 1L)
    assert(math.abs(got(2L)._4 - 2.0 / 3.0) < 1e-12) // censor-only: flat
    assert(got(3L)._1 == 3L && got(3L)._2 == 1L && got(3L)._3 == 1L)
    assert(math.abs(got(3L)._4 - (2.0 / 3.0) * (2.0 / 3.0)) < 1e-12)
    assert(got(4L)._1 == 1L && math.abs(got(4L)._4 - 4.0 / 9.0) < 1e-12)
  }

  test("kaplanMeier: total extinction zeroes the curve (no ln(0) leak)") {
    val rows = Seq((1L, true), (2L, true), (2L, true)) // all die by t=2
    val got = Survival.kaplanMeier(rows.toDF("dur", "ev"), col("dur"), col("ev"))
      .orderBy(col("t")).collect()
    assert(math.abs(got(0).getDouble(4) - 2.0 / 3.0) < 1e-12)
    assert(got(1).getDouble(4) == 0.0)
    intercept[Exception] {
      Survival.kaplanMeier(Seq((-1L, true)).toDF("dur", "ev"), col("dur"), col("ev"))
        .collect()
    }
  }

  test("riskTable raises loudly on a continuous-grain duration axis") {
    // microsecond-grain durations: > 1M distinct values would
    // single-reducer the unpartitioned time-axis window — the guard
    // must raise instead of silently sorting the corpus
    val micros = spark.range(1000001L)
      .select(col("id").as("dur"), lit(true).as("ev"))
    val e = intercept[Exception] {
      Survival.kaplanMeier(micros, col("dur"), col("ev")).collect()
    }
    assert(e.getMessage.contains("distinct durations"),
      s"wrong failure: ${e.getMessage}")
    val e2 = intercept[Exception] {
      Survival.aalenJohansen(
        spark.range(1000001L).select(col("id").as("dur"),
          (col("id") % 2L + 1L).as("cause")),
        col("dur"), col("cause")).collect()
    }
    assert(e2.getMessage.contains("distinct durations"),
      s"wrong failure: ${e2.getMessage}")
  }

  test("twoProportionZ: arithmetic, stability, and degenerate NULLs") {
    val subjects = (1L to 400L).map(u => (u, u % 5 == 0))
    val r = Experiment.twoProportionZ(subjects.toDF("u", "c"), col("u"), col("c"))
      .collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb == 400L && ca + cb == 80L)
    // arms are hash-split, roughly balanced
    assert(na > 150 && nb > 150)
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val want = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(r.getDouble(6) == want, s"z=${r.getDouble(6)} want $want")
    // re-run identical (content-addressed arms, no RNG)
    val again = Experiment.twoProportionZ(subjects.toDF("u", "c"), col("u"), col("c"))
      .collect().head
    assert(r.toSeq == again.toSeq)
    // all-converted pool → NULL z
    val degenerate = Experiment.twoProportionZ(
      (1L to 10L).map((_, true)).toDF("u", "c"), col("u"), col("c")).collect().head
    assert(degenerate.isNullAt(6))
  }
}

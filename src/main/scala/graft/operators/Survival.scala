package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis: the Kaplan–Meier product-limit estimator over
  * right-censored durations — churn/retention's canonical statistic
  * (what fraction of subjects "survive" past each duration, with
  * still-active subjects contributing to risk sets but never to
  * deaths).
  *
  * Scale shape: subject durations reduce per-subject (one shuffle on
  * the subject key), then collapse to ONE ROW PER DISTINCT DURATION
  * — a time axis bounded by the observation window, not the corpus —
  * so the cumulative window that turns hazards into the survival
  * curve runs over days, not subjects. A billion users with a 90-day
  * window is a 90-row window frame.
  */
object Survival {

  /** Kaplan–Meier curve from per-subject (duration, event) rows:
    * one output row per distinct duration —
    * (duration, n_risk, n_death, n_censored, survival) with
    *
    *   S(t) = Π_{u ≤ t} (1 − d_u / n_u)
    *
    * `eventOccurred` true = the terminal event was observed (death /
    * churn); false = right-censored at that duration (subject still
    * alive when observation ended — it leaves the risk set AFTER its
    * duration, the standard KM convention). Null durations/flags and
    * negative durations fail loudly — silently dropping subjects
    * would bias every risk set. Hazard factors are exact rationals of
    * integer counts; the cumulative product is exp∘Σ∘ln (the one
    * libm step — oracles verify to tolerance, the q113 ln precedent).
    */
  /** Shared risk-table build: (t, n_death, n_censored, n_risk), one
    * row per distinct duration.
    */
  private def riskTable(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column,
      op: String): DataFrame = {
    val base = df.select(
      when(duration.cast("long").isNull || duration.cast("long") < 0,
        raise_error(lit(s"$op: duration must be a non-negative integer")))
        .otherwise(duration.cast("long")).as("t"),
      when(eventOccurred.cast("boolean").isNull,
        raise_error(lit(s"$op: event flag must be non-null")))
        .otherwise(eventOccurred.cast("boolean")).as("ev"))
    val byT = base.groupBy(col("t")).agg(
      sum(when(col("ev"), 1L).otherwise(0L)).as("n_death"),
      sum(when(col("ev"), 0L).otherwise(1L)).as("n_censored"))
    val total = byT.agg(sum(col("n_death") + col("n_censored")).as("__n"))
    // time axis only: the window frame is bounded by distinct
    // durations (the observation window), never by subject count
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("__n") - coalesce(sum(col("n_death") + col("n_censored")).over(wPrev), lit(0L)))
  }

  def kaplanMeier(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column): DataFrame = {
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskTable(df, duration, eventOccurred, "kaplanMeier")
      .withColumn("__f",
        lit(1.0) - col("n_death").cast("double") / col("n_risk").cast("double"))
      // a duration where EVERYONE at risk dies zeroes the curve; it
      // must not route through ln (Spark's log(0) is NULL, which a sum
      // would silently skip — turning extinction into survival)
      .withColumn("__hit0",
        max(when(col("n_death") > 0 && col("__f") === 0.0, 1).otherwise(0)).over(wCum))
      .withColumn("survival",
        when(col("__hit0") === 1, lit(0.0)).otherwise(
          exp(sum(when(col("n_death") > 0, log(col("__f"))).otherwise(lit(0.0)))
            .over(wCum))))
      .select("t", "n_risk", "n_death", "n_censored", "survival")
  }

  /** NELSON-AALEN cumulative hazard — [[kaplanMeier]]'s additive
    * sibling (Nelson 1972, Aalen 1978): H(t) = Σ_{u≤t} d_u/n_u, with
    * the standard variance estimate Σ d_u/n_u². Unlike KM's
    * exp∘Σ∘ln product there is NO libm step — each term is one
    * correctly-rounded division of exact integers and the cumulative
    * is a WINDOW running sum, whose additions happen in pinned
    * t-order in every engine — so the whole curve hash-matches
    * exactly. Same risk-table geometry (one row per distinct
    * duration). Output: (t, n_risk, n_death, n_censored, hazard,
    * hazard_var).
    */
  def nelsonAalen(
      df: DataFrame,
      duration: Column,
      eventOccurred: Column): DataFrame = {
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nD = col("n_risk").cast("double")
    riskTable(df, duration, eventOccurred, "nelsonAalen")
      .withColumn("hazard",
        sum(when(col("n_death") > 0, col("n_death").cast("double") / nD)
          .otherwise(lit(0.0))).over(wCum))
      .withColumn("hazard_var",
        sum(when(col("n_death") > 0,
          col("n_death").cast("double") / (nD * nD))
          .otherwise(lit(0.0))).over(wCum))
      .select("t", "n_risk", "n_death", "n_censored", "hazard", "hazard_var")
  }
}

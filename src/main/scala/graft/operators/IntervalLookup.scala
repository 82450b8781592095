package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval lookup join: attach to every fact row the label of
  * the (non-overlapping, sorted) dimension interval containing its
  * value — the IP→geo / rate-table / banding pattern. The naive plan
  * is a theta join (`lo <= v AND v < hi`), which Catalyst executes as
  * a broadcast NESTED-LOOP: O(m) probes per fact row. This operator
  * instead collects the (broadcast-small by contract) interval table
  * once, ships it as array literals, and resolves each row with the
  * codegen'd binary-search kernel
  * ([[graft.functions.SearchSorted]]): O(log m) per row, fully
  * map-side, ZERO join and ZERO shuffle in the plan at any fact-side
  * scale. Same small-side-collect precedent as the IVF centroid
  * literal and the unigram-LM vocab map.
  */
object IntervalLookup {

  /** Adds `outCol` (the matching interval's label, null when the value
    * falls in no interval or is null/NaN) to `facts`.
    *
    * `dims` must be a SMALL frame of `(lo, hi, label)` rows —
    * intervals are half-open `[lo, hi)`, must not overlap, and are
    * validated driver-side (sorted, lo < hi, hi ≤ next lo; violations
    * throw rather than silently mislabeling). Size is capped: a
    * dimension beyond `maxIntervals` should be a join, not a literal.
    */
  def lookupInterval(
      facts: DataFrame,
      dims: DataFrame,
      value: Column,
      lo: Column,
      hi: Column,
      label: Column,
      outCol: String,
      maxIntervals: Int = 100000): DataFrame = {
    require(!facts.columns.contains(outCol), s"output column $outCol already exists")
    val rows = dims.select(lo.cast("double").as("lo"), hi.cast("double").as("hi"),
        label.cast("string").as("label"))
      .limit(maxIntervals + 1).collect()
    require(rows.length <= maxIntervals,
      s"lookupInterval: dimension exceeds $maxIntervals intervals — use a join for " +
        "large dimensions; this operator trades a driver collect for a zero-shuffle plan")
    require(rows.nonEmpty, "lookupInterval: empty dimension table")
    rows.foreach(r => require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
      "lookupInterval: null lo/hi/label in dimension table"))
    val sorted = rows.map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
      .sortBy(_._1)
    sorted.foreach { case (l, h, lab) =>
      require(l < h, s"lookupInterval: empty/inverted interval [$l, $h) for '$lab'") }
    sorted.sliding(2).foreach {
      case Array((l1, h1, lab1), (l2, _, lab2)) =>
        require(h1 <= l2,
          s"lookupInterval: overlapping intervals '$lab1' [$l1, $h1) and '$lab2' [$l2, …)")
      case _ =>
    }
    val los = sorted.map(_._1).toSeq
    val his = sorted.map(_._2)
    val labels = sorted.map(_._3)
    val v = value.cast("double")
    // idx = number of lo-boundaries <= v; candidate interval is idx-1
    // (1-based idx for element_at), valid iff v < its hi. NaN probes
    // get idx 0 → null label.
    val idx = graft.functions.GraftFunctions.searchSorted(facts.sparkSession, v, los)
    val hiAt = element_at(array(his.map(lit): _*), idx)
    val labAt = element_at(array(labels.map(lit): _*), idx)
    // nested when: element_at(_, 0) errors under ANSI, and And does not
    // short-circuit — the inner branch only evaluates once idx >= 1
    facts.withColumn(outCol, when(idx >= 1, when(v < hiAt, labAt)))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level anti-pattern GATE — the audit the round verdicts run
  * by hand (zero UDFs, zero stubs, bounded driver collects), held as a
  * failing test instead of prose:
  *
  *  - no `udf(` anywhere in main source: scalar work belongs in
  *    codegen'd built-ins or native Catalyst expressions;
  *  - no `???` stubs;
  *  - every `.collect()` in main source is either SELF-EVIDENTLY
  *    bounded (the call or its preceding lines show an aggregation, a
  *    limit, or a documented cap/guard) or carries an entry in the
  *    exceptions census below with a reviewed justification. A new
  *    unbounded-looking collect fails this suite until it is bounded
  *    or consciously documented.
  *
  * The `graft/tools` directory is exempt: probes/benchmarks are
  * driver programs by design.
  */
class AntiPatternSpec extends AnyFunSuite {

  private val root = new java.io.File("src/main/scala/graft")

  private def sources(dir: java.io.File): Seq[java.io.File] = {
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
    fs.filter(_.isFile).filter(_.getName.endsWith(".scala")).toSeq ++
      fs.filter(_.isDirectory).filterNot(_.getName == "tools").flatMap(sources)
  }

  private def lines(f: java.io.File): Seq[String] = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().toVector finally src.close()
  }

  test("no udf() registrations in main source") {
    val hits = for {
      f <- sources(root)
      (l, i) <- lines(f).zipWithIndex
      if l.matches(""".*(^|[^\w.])udf\s*\(.*""") && !l.trim.startsWith("//")
    } yield s"${f.getPath}:${i + 1}: $l"
    assert(hits.isEmpty, s"udf() in main source:\n  ${hits.mkString("\n  ")}")
  }

  test("no ??? stubs in main source") {
    val hits = for {
      f <- sources(root)
      (l, i) <- lines(f).zipWithIndex
      if l.contains("???") && !l.trim.startsWith("//") && !l.trim.startsWith("*")
    } yield s"${f.getPath}:${i + 1}: $l"
    assert(hits.isEmpty, s"??? stubs in main source:\n  ${hits.mkString("\n  ")}")
  }

  /** Reviewed exceptions: (path suffix, 1-based line-ish key = the
    * collect's surrounding context snippet) → justification. Keyed by
    * a context substring, not a line number, so edits elsewhere in the
    * file do not invalidate the census.
    */
  private val reviewedCollects: Map[String, String] = Map.empty

  test("every .collect() in main source is bounded or consciously documented") {
    // evidence that the collected frame is aggregate-/cap-bounded,
    // searched on the call line and the 8 lines above it
    val boundedEvidence =
      """(?i)(\.agg\(|\.limit\(|groupBy|approx|first\(\)|bounded|maxBins|maxCells|maxVocab|maxTests|maxShards|maxBuckets|cap\b|guard|≤|<=\s*#|treeAggregate)""".r
    val bad = for {
      f <- sources(root)
      ls = lines(f)
      (l, i) <- ls.zipWithIndex
      if l.contains(".collect()") && !l.trim.startsWith("//")
      ctx = ls.slice(math.max(0, i - 8), i + 1).mkString("\n")
      if boundedEvidence.findFirstIn(ctx).isEmpty
      if !reviewedCollects.keys.exists(k => s"${f.getPath}:$l".contains(k))
    } yield s"${f.getPath}:${i + 1}: ${l.trim}"
    assert(bad.isEmpty,
      s"${bad.size} .collect() site(s) with no visible bound:\n  " +
        bad.mkString("\n  ") +
        "\nEither bound the frame (aggregate/limit/cap) with the evidence " +
        "near the call, or add a reviewed justification to " +
        "AntiPatternSpec.reviewedCollects.")
  }
}

package graft

/** Quiet-but-honest Spark teardown for the benchmark mains.
  *
  * Bounded tail captures of a bench run keep only the last few KB of
  * output; executor-pool shutdown fills that with benign
  * `RejectedExecutionException` traces (in-flight RPC futures failing
  * while their pools stop), displacing the metric line. Round 7/8
  * nulled stderr and swallowed uncaught exceptions wholesale, which
  * also hid any GENUINE teardown failure (a checkpoint-cleanup error,
  * a shutdown-hook crash). This guard keeps both properties: stderr is
  * BUFFERED (not discarded) across `stop()`, and after it returns the
  * buffer is scanned — if anything outside the known benign teardown
  * patterns appeared, the whole capture is replayed to the real stderr
  * so the failure is visible; otherwise the spam dies silently.
  */
object Teardown {

  private val benignMarkers = Seq(
    "RejectedExecutionException",
    "InterruptedException",
    "SparkListenerBus has already stopped",
    "Connection reset by peer",
    "shutdown in progress",
    "was locally checkpointed, its lineage has been truncated",
    "Broadcasting large task binary")

  // a captured line is noise iff it is blank, a stack frame or
  // ellipsis continuing a trace, a log-formatted WARN/INFO line, or
  // an exception header carrying a benign marker
  private[graft] def lineBenign(l: String): Boolean = {
    val t = l.trim
    t.isEmpty || t.startsWith("at ") || t.startsWith("... ") ||
      l.contains(" WARN ") || l.contains(" INFO ") ||
      benignMarkers.exists(l.contains)
  }

  /** Runs `stop` with stderr and uncaught-exception output buffered;
    * restores stderr afterwards and replays the capture iff it holds
    * any non-benign line. Returns true when something was replayed
    * (the caller's metric line still prints — a visible failure must
    * not also lose the measurement). The buffered uncaught handler
    * stays installed for the post-`stop` JVM exit, where daemon
    * threads dying mid-teardown are benign by construction.
    */
  def quietly(stop: () => Unit): Boolean = {
    System.err.flush()
    val real = System.err
    val buf = new java.io.ByteArrayOutputStream()
    val bufPs = new java.io.PrintStream(buf, true, "UTF-8")
    System.setErr(bufPs)
    Thread.setDefaultUncaughtExceptionHandler((t, e) => {
      bufPs.println(s"uncaught in thread ${t.getName}:")
      e.printStackTrace(bufPs)
    })
    try stop()
    finally {
      bufPs.flush()
      System.setErr(real)
    }
    val lines = buf.toString("UTF-8").linesIterator.toList
    val suspicious = lines.filterNot(lineBenign)
    if (suspicious.nonEmpty) {
      real.println(s"[teardown] ${suspicious.size} non-benign stderr line(s) " +
        "during shutdown; full capture follows:")
      lines.foreach(real.println)
      real.flush()
    }
    suspicious.nonEmpty
  }
}

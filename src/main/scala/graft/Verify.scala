package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [name-regex]")
      sys.exit(2)
    }
    val (Array(sfDir, outDirArg), rest) = args.splitAt(2)
    // optional 3rd arg (local iteration only — the driver passes 2):
    // regex, only matching query names are dumped
    val nameFilter = rest.headOption.map(_.r)
    def keep(n: String) = nameFilter.forall(_.findFirstIn(n).isDefined)
    // Soundness-style oracles read the emitted result back via DuckDB
    // `read_parquet` — they reference the output dir through the
    // `{{OUT}}` placeholder, substituted with the absolute path here.
    val outDir = Paths.get(outDirArg).toAbsolutePath.toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // allow co-partition reuse when a side is hash-partitioned on a
      // SUBSET of the join keys (the partitioned-checkpoint pattern:
      // a build side materialized by its pivot joins with no exchange)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see graft.Bench: session-artifact isolation turns every janino
      // class-name probe inside in-task codegen compiles into an RPC
      // round-trip to the driver; across the ~60-query gate that
      // overhead can dominate wall-clock (and once stalled the driver's
      // correctness run entirely). No artifacts are added — disable it.
      .config("spark.sql.artifact.isolation.enabled", "false")
      // 60+ distinct query plans blow the default 100-entry codegen
      // cache; evicted units recompile inside tasks
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      // shuffle/spill scratch on RAM-backed tmpfs where available (see
      // graft.Bench / graft.queries.Scratch): the gate must not be
      // hostage to a slow block device's fsyncs
      .config("spark.local.dir", graft.queries.Scratch.base.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val gateCompromised = new java.util.concurrent.atomic.AtomicBoolean(false)
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try {
        val df = fn(spark, sfDir)
        Verify.assertGateSortableSchema(name, df.schema)
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // delete any partial/stale result so the compare sees "no
        // spark output" and FAILS the query — the oracle entry stays
        // (dropping it would remove the query from the gate entirely
        // and a crashing query would ship as a silent pass; a stale
        // dir from a previous run would score a false pass)
        val dir = new java.io.File(s"$outDir/$name")
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(): Unit
          }
          rm(dir)
        }
        if (dir.exists()) {
          // undeletable stale dir (held handle, permissions): the
          // compare would validate the PREVIOUS run's output as a
          // false pass — flag the whole run instead of shipping it
          System.err.println(
            s"[verify] could not remove stale result $dir — gate integrity compromised")
          gateCompromised.set(true)
        }
      }
    // A few queries in flight at once: ~60 independent dumps on one
    // session is the documented concurrent-jobs pattern, and it keeps
    // the scheduler fed while any single query sits in a latency-bound
    // stage (codegen, tiny shuffles) — the gate must FINISH inside the
    // driver's timeout even on a noisy host, and sequential wall-clock
    // is the sum of every stall. Each query keeps its own failure
    // handling; a thread death surfaces as that query's loud FAIL.
    val parallelism = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    val pending = SparkEntry.queries.toSeq.filter { case (n, _) => keep(n) }.map {
      case (name, fn) =>
        pool.submit(new Runnable { def run(): Unit = runOne(name, fn) })
    }
    pending.foreach(_.get())
    pool.shutdown()
    // Every ATTEMPTED query keeps its oracle entry (a failed dump must
    // show up as a loud FAIL against its deleted result dir, never
    // disappear from the gate); only locally name-filtered queries are
    // omitted — their dirs were deliberately never written.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${JsonText.quote(k)}: ${JsonText.quote(v.replace("{{OUT}}", outDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the authoritative catalog count — COVERAGE.md and round-closing
    // commit messages quote this line instead of hand-counting
    // (round-9 shipped a "332 queries" miscount; q181 is a historical
    // numbering skip, so max(qNNN) ≠ |catalog|)
    println(s"catalog=${SparkEntry.queries.size} " +
      s"oracles=${SparkEntry.oracleSql.size} dumped=${pending.size}")
    spark.stop()
    if (gateCompromised.get()) sys.exit(1)
  }

  /** The driver's compare loads the raw parquet result into pandas and
    * lexsorts EVERY column before hashing; only scalar (atomic) types
    * are sortable there — one array/map/struct column crashes the gate
    * with "unhashable type: 'numpy.ndarray'" before a single value is
    * compared (round-5 q58/q82/q83/q88 all shipped red this way
    * despite correct Scala). Fail the dump loudly instead: a red row
    * with an actionable message beats a harness crash. Vector-valued
    * results must explode to (id, idx, value) rows or serialize to a
    * delimited string. ScalarSchemaSpec enforces the same rule over
    * the whole catalog at test time.
    */
  def assertGateSortableSchema(
      name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val bad = schema.fields.collect {
      case f if (f.dataType match {
            case _: ArrayType | _: MapType | _: StructType => true
            case _ => false
          }) =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
    require(bad.isEmpty,
      s"$name emits non-scalar column(s) the driver gate cannot sort " +
        s"(${bad.mkString(", ")}) — explode to one row per element " +
        "(id, idx, value) or serialize to a string column")
  }
}

/** JSON string escaping shared by the Verify and Bench emitters:
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in a
  * builder-authored SQL string (or a quote in a query name) would
  * otherwise make the driver's json.load fail and silently zero the
  * round's results.
  */
private[graft] object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

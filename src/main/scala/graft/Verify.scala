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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var gateCompromised = false
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
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
            gateCompromised = true
          }
        }
      }
    }
    // Every ATTEMPTED query keeps its oracle entry (a failed dump must
    // show up as a loud FAIL against its deleted result dir, never
    // disappear from the gate); only locally name-filtered queries are
    // omitted — their dirs were deliberately never written.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${JsonText.quote(k)}: ${JsonText.quote(v.replace("{{OUT}}", outDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (gateCompromised) sys.exit(1)
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

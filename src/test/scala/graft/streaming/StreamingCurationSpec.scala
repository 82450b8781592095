package graft.streaming

import graft.SparkTestBase
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-compatibility of the curation operators: every map-side
  * text op (tokenize, quality, language ID, repetition metrics, PII
  * redaction, fingerprint) must run unchanged inside a Structured
  * Streaming query — no op in the chain may require an unsupported
  * batch-only construct — and the streamed result must equal the
  * batch result row for row. This is the contract that lets a user
  * point the same curation chain at `readStream` for continuous
  * ingestion.
  */
class StreamingCurationSpec extends SparkTestBase {

  test("map-side curation chain: streamed result equals batch, end to end") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$src/documents.parquet").schema
    val name = "cur_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // the file-stream source reads a DIRECTORY; stage just documents
    // (the sf dir holds every table) via symlink, as q44 does
    val dir = java.nio.file.Files.createTempDirectory("cur_docs")
    val link = dir.resolve("documents.parquet")
    java.nio.file.Files.createSymbolicLink(
      link, java.nio.file.Paths.get(s"$src/documents.parquet"))

    def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select($"doc_id", $"text", TextAnalysis.tokens($"text").as("toks"))
        .select(
          $"doc_id",
          TextAnalysis.qualityScoreFromTokens($"text", $"toks").as("quality"),
          TextAnalysis.langIdFromTokens($"text", $"toks").as("lang_pred"),
          TextAnalysis.dupNgramFraction($"toks", 2).as("dup2"),
          TextAnalysis.topTokenShare($"toks").as("tts"),
          TextAnalysis.redactPii($"text").as("clean"),
          TextAnalysis.fingerprint($"text").as("fp"))

    try {
      val stream = spark.readStream.schema(schema).parquet(dir.toString)
        .transform(curate)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        // generous: one AvailableNow batch over one file is seconds of
        // work, but a contended host once blew a 300s limit here
        assert(stream.awaitTermination(600000), "curation stream did not finish in 600s")
      } finally stream.stop()
      try {
        val streamed = spark.table(name).collect().map(_.toSeq).toSet
        val batch = curate(spark.read.parquet(s"$src/documents.parquet"))
          .collect().map(_.toSeq).toSet
        assert(streamed == batch, "streamed curation diverged from batch")
        assert(batch.nonEmpty)
      } finally spark.catalog.dropTempView(name)
    } finally {
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}

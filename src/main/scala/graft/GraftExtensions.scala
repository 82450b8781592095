package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark-idiomatic library entry point: registers every graft_* native
  * function through the public extensions hook, so SQL-only users get
  * them session-wide with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder) — no
  * Scala API call required. The Scala `Column` API
  * ([[graft.functions.GraftFunctions]]) self-registers lazily and
  * remains usable without this class; both paths share one registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    import graft.functions._

    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two array<double>"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      info("graft_tokenize", "graft_tokenize(text) - lowercased unicode word tokens"),
      (exprs: Seq[Expression]) => TokenizeWords(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(array<string>, k) - k-permutation MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head, intArg(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash64"),
      info("graft_minhash64", "graft_minhash64(array<bigint>, k) - MinHash from pre-hashed elements"),
      (exprs: Seq[Expression]) => MinHashFromHashes(exprs.head, intArg(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(array<string>) - 64-bit SimHash"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(array<string>) - portable 60-bit md5 SimHash"),
      (exprs: Seq[Expression]) => PortableSimHash60(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(array<string>, n) - sorted distinct hashed n-gram shingles"),
      (exprs: Seq[Expression]) => HashedShingles(exprs.head, intArg(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_overlap"),
      info("graft_overlap", "graft_overlap(a, b) - intersection size of two sorted array<bigint>"),
      (exprs: Seq[Expression]) => SortedOverlapCount(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_buckets"),
      info("graft_hyperplane_buckets",
        "graft_hyperplane_buckets(v, bits, tables) - hyperplane-LSH bucket id per table"),
      (exprs: Seq[Expression]) => HyperplaneBuckets(exprs.head, intArg(exprs(1)), intArg(exprs(2)))))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.NativeExpressions._

/** SparkSessionExtensions entry point: registers graft's native kernels as
  * SQL functions so `spark.sql("SELECT simhash64(text) …")` works — the
  * standard way a Spark-native library ships custom expressions.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
object GraftExtensions {
  /** Register the same functions on an already-built session (extensions
    * only apply at build time; this covers notebooks/REPLs).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.GraftBridge.registerTempFunction
    val ext = new GraftExtensions
    // injectOptimizerRule only applies at session build; existing sessions
    // take the public experimental hook (idempotent — the rule itself is
    // conf-gated and off by default)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxDistinctRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ApproxDistinctRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxPercentileRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ApproxPercentileRewrite
    registerTempFunction(spark, "simhash64", args => SimHash64Expr(args.head))
    registerTempFunction(spark, "minhash_sig", args =>
      MinHashSigExpr(args.head, ext.intArg(args(1), "k"), ext.intArg(args(2), "n")))
    registerTempFunction(spark, "vec_dot", args => VecDotExpr(args.head, args(1)))
    registerTempFunction(spark, "shingle_hashes", args =>
      ShingleHashesExpr(args.head, ext.intArg(args(1), "n")))
    registerTempFunction(spark, "sorted_jaccard", args =>
      SortedJaccardExpr(args.head, args(1)))
    registerTempFunction(spark, "minhash_sig_md5", args =>
      PortableMinHashExpr(args.head, ext.intArg(args(1), "k"), ext.intArg(args(2), "n")))
    registerTempFunction(spark, "simhash_md5", args =>
      PortableSimHashExpr(args.head))
    registerTempFunction(spark, "md5_bucket", args =>
      Md5BucketExpr(args.head, ext.intArg(args(1), "buckets")))
    registerTempFunction(spark, "positional_shingle_hashes", args =>
      PositionalShingleHashesExpr(args.head, ext.intArg(args(1), "n")))
    registerTempFunction(spark, "md5_bucket_bigrams", args =>
      Md5BucketBigramsExpr(args.head, ext.intArg(args(1), "buckets")))
    registerTempFunction(spark, "xx_bucket_bigrams", args =>
      XxBucketBigramsExpr(args.head, ext.intArg(args(1), "buckets")))
    registerTempFunction(spark, "nfc_normalize", args =>
      NfcNormalizeExpr(args.head))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "misc_funcs", "1.0.0", "", "scala_udf")

  private[graft] def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in exact→approx COUNT(DISTINCT) / percentile rewrites (off
    // unless their spark.graft.*.enabled confs are set)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ApproxPercentileRewrite)

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of whitespace-tokenized text"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(text, k, n) - k-permutation MinHash signature over word n-gram shingles"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head, intArg(args(1), "k"), intArg(args(2), "n"))))

    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => VecDotExpr(args.head, args(1))))

    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(text, n) - sorted distinct word n-gram shingle hashes"),
      (args: Seq[Expression]) => ShingleHashesExpr(args.head, intArg(args(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard",
        "sorted_jaccard(a, b) - Jaccard similarity of two sorted distinct long arrays"),
      (args: Seq[Expression]) => SortedJaccardExpr(args.head, args(1))))

    // NearestCellsExpr and BloomMightContainExpr are deliberately NOT
    // SQL-registered: their payloads (centroid matrix, serialized bloom)
    // are runtime data, not literals a SQL call site could express.
    ext.injectFunction((
      FunctionIdentifier("minhash_sig_md5"),
      info("minhash_sig_md5",
        "minhash_sig_md5(text, k, n) - engine-portable md5 MinHash signature over word n-gram shingles"),
      (args: Seq[Expression]) =>
        PortableMinHashExpr(args.head, intArg(args(1), "k"), intArg(args(2), "n"))))

    ext.injectFunction((
      FunctionIdentifier("simhash_md5"),
      info("simhash_md5",
        "simhash_md5(text) - engine-portable md5-vote SimHash as a 16-hex-char string"),
      (args: Seq[Expression]) => PortableSimHashExpr(args.head)))

    ext.injectFunction((
      FunctionIdentifier("md5_bucket"),
      info("md5_bucket",
        "md5_bucket(s, buckets) - portable hash bucket (DuckDB md5_number_lower(s) % buckets)"),
      (args: Seq[Expression]) => Md5BucketExpr(args.head, intArg(args(1), "buckets"))))

    ext.injectFunction((
      FunctionIdentifier("positional_shingle_hashes"),
      info("positional_shingle_hashes",
        "positional_shingle_hashes(text, n) - word n-gram shingle hashes in token order (element i = span at token i)"),
      (args: Seq[Expression]) =>
        PositionalShingleHashesExpr(args.head, intArg(args(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("md5_bucket_bigrams"),
      info("md5_bucket_bigrams",
        "md5_bucket_bigrams(text, buckets) - portable md5 hash bucket per adjacent token bigram (DSIR featurize)"),
      (args: Seq[Expression]) =>
        Md5BucketBigramsExpr(args.head, intArg(args(1), "buckets"))))

    ext.injectFunction((
      FunctionIdentifier("xx_bucket_bigrams"),
      info("xx_bucket_bigrams",
        "xx_bucket_bigrams(text, buckets) - xxhash64 bucket per adjacent token bigram (fast DSIR featurize)"),
      (args: Seq[Expression]) =>
        XxBucketBigramsExpr(args.head, intArg(args(1), "buckets"))))

    // the text canon's NFC step (same name as the DuckDB builtin the
    // oracles replay with, so canon chains read identically in both
    // dialects)
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(text) - Unicode NFC composition (the dedup canon's first step)"),
      (args: Seq[Expression]) => NfcNormalizeExpr(args.head)))
  }
}

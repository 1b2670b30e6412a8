package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, ExpressionInfo, LessThan, Literal, Md5, RegExpReplace, Remainder, Substring}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

import graft.functions._

/** Spark-native integration point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same fused
  * hot-path operators the DataFrame API uses (SURVEY.md §7.3 — the
  * `SparkSessionExtensions` route, the same mechanism Delta/Iceberg-style
  * libraries use; no Spark internals are modified).
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Registered functions:
  *  - `cosine_sim(a array<float>, b array<float>) -> double`
  *  - `char_shingles(text string, n int) -> array<string>`
  *  - `minhash_bands(text string, n int, bands int, rows int) -> array<bigint>`
  *  - `simhash64(text string, n int) -> bigint`
  *  - `min_md5_shingles(text string, n int) -> string`
  *  - `ngram_jaccard(a string, b string, n int) -> double`
  *  - `token_ngrams(text string, n int) -> array<string>`
  *
  * Also registered (compositions of BUILT-IN expressions, exposed so the
  * SQL surface matches the Scala operator API exactly):
  *  - `redact_pii(text string) -> string` — [[graft.operators.Pii.redactPii]]
  *  - `shard_of(key any, n int) -> bigint` — [[graft.operators.Sampling.shardOf]]
  *  - `hash_gate(key any, fraction double) -> boolean` — [[graft.operators.Sampling.hashGate]]
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.TextHashImpl", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("char_shingles"),
      info("char_shingles", "char_shingles(text, n) - distinct character n-gram set"),
      (args: Seq[Expression]) => CharShinglesExpr(args(0),
        intLit(args(1), "char_shingles", "n"))))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(text, n, bands, rows) - LSH band bucket keys"),
      (args: Seq[Expression]) => MinHashBandsExpr(args(0),
        intLit(args(1), "minhash_bands", "n"),
        intLit(args(2), "minhash_bands", "bands"),
        intLit(args(3), "minhash_bands", "rows"))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text, n) - 64-bit SimHash over distinct shingles"),
      (args: Seq[Expression]) => SimHash64Expr(args(0),
        intLit(args(1), "simhash64", "n"))))
    ext.injectFunction((FunctionIdentifier("token_ngrams"),
      info("token_ngrams", "token_ngrams(text, n) - distinct token n-gram set"),
      (args: Seq[Expression]) => TokenNgramsExpr(args(0),
        intLit(args(1), "token_ngrams", "n"))))
    ext.injectFunction((FunctionIdentifier("min_md5_shingles"),
      info("min_md5_shingles", "min_md5_shingles(text, n) - winnowing fingerprint"),
      (args: Seq[Expression]) => MinMd5ShinglesExpr(args(0),
        intLit(args(1), "min_md5_shingles", "n"))))
    ext.injectFunction((FunctionIdentifier("ngram_jaccard"),
      info("ngram_jaccard", "ngram_jaccard(a, b, n) - exact character n-gram Jaccard"),
      (args: Seq[Expression]) => NgramJaccardExpr(args(0), args(1),
        intLit(args(2), "ngram_jaccard", "n"))))
    // —— built-in compositions mirroring the Scala operator API ——
    ext.injectFunction((FunctionIdentifier("redact_pii"),
      info("redact_pii", "redact_pii(text) - replace emails, phones, IPv4 with placeholders"),
      (args: Seq[Expression]) => {
        def rep(child: Expression, re: String, by: String): Expression =
          RegExpReplace(child, Literal(re), Literal(by))
        import graft.operators.Pii
        rep(rep(rep(args(0), Pii.EmailRe, "<EMAIL>"),
          Pii.PhoneRe, "<PHONE>"), Pii.IpRe, "<IP>")
      }))
    // md5-prefix arithmetic shared with Sampling.shardOf / hashGate: the
    // same key-pure determinism contract from SQL
    def md5Prefix8(key: Expression): Expression =
      Substring(Md5(Cast(key, StringType)), Literal(1), Literal(8))
    ext.injectFunction((FunctionIdentifier("shard_of"),
      info("shard_of", "shard_of(key, n) - deterministic md5-mod shard in [0, n)"),
      (args: Seq[Expression]) => Remainder(
        Cast(Conv(md5Prefix8(args(0)), Literal(16), Literal(10)), LongType),
        Cast(args(1), LongType))))
    // —— TABLE-VALUED functions over the standing-index read paths ——
    // each builder returns the SAME analyzed plan the Scala entry builds
    // (graft.GraftTableFunctions — plan-identity, not re-implementation)
    ext.injectTableFunction((FunctionIdentifier("graft_ivf_topk"),
      info("graft_ivf_topk",
        "graft_ivf_topk(path, queriesView, k, nprobe[, wCoarse]) - standing IVF probe"),
      GraftTableFunctions.ivfTopK _))
    ext.injectTableFunction((FunctionIdentifier("graft_pq_topk"),
      info("graft_pq_topk",
        "graft_pq_topk(path, queriesView, k) - standing PQ ADC probe"),
      GraftTableFunctions.pqTopK _))
    ext.injectTableFunction((FunctionIdentifier("graft_ivf_pq_topk"),
      info("graft_ivf_pq_topk",
        "graft_ivf_pq_topk(path, queriesView, k, nprobe[, wCoarse]) - composed probe"),
      GraftTableFunctions.ivfPqTopK _))
    ext.injectTableFunction((FunctionIdentifier("graft_bm25_topk"),
      info("graft_bm25_topk",
        "graft_bm25_topk(path, queriesView, k) - standing BM25 probe"),
      GraftTableFunctions.bm25TopK _))
    ext.injectTableFunction((FunctionIdentifier("graft_hybrid_rrf_topk"),
      info("graft_hybrid_rrf_topk",
        "graft_hybrid_rrf_topk(bm25Path, ivfPath, queriesView, k, rrfC) - hybrid RRF fusion"),
      GraftTableFunctions.hybridRrfTopK _))
    ext.injectTableFunction((FunctionIdentifier("graft_near_dup_probe"),
      info("graft_near_dup_probe",
        "graft_near_dup_probe(indexTable, corpusView, batchView, threshold) - band-index probe"),
      GraftTableFunctions.nearDupProbe _))
    ext.injectFunction((FunctionIdentifier("hash_gate"),
      info("hash_gate", "hash_gate(key, fraction) - keep key iff md5 prefix under fraction"),
      (args: Seq[Expression]) => {
        // SQL numeric literals arrive as Decimal (0.25), Double, or Int
        val frac = args(1) match {
          case Literal(v: Double, DoubleType) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case Literal(v: Int, IntegerType) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"hash_gate: fraction must be a numeric literal, got $other")
        }
        LessThan(md5Prefix8(args(0)),
          Literal(graft.operators.Sampling.thresholdHex(frac)))
      }))
  }
}

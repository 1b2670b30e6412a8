package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** BM25 lexical retrieval (builder-brief extension; no reference
  * analogue) — the term-based tier next to the embedding family: the
  * first `numQueries` documents act as queries against the corpus, scored
  * with Okapi BM25 at the standard (k1 = 1.2, b = 0.75) operating point.
  *
  * Engine-exact scoring, the same discipline as the LM/DSIR family: with
  * k1 = 6/5 and b = 3/4, the tf saturation term is a ratio of exact
  * integers —
  *   tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
  *     = 22·tf·L / (10·tf·L + 3·L + 9·dl·N)      (L = Σ dl, avgdl = L/N)
  * — so the only libm call is ln() inside idf, quantized to integer
  * micros PER TERM (vocabulary-sized, not corpus-sized, exposure); each
  * per-(doc, term) weight is then round(idf_micros·num/den), a fixed
  * double dag over exact integers that both engines evaluate bit-
  * identically, and per-doc scores are exact BIGINT sums of those.
  *
  * Scale shape: the query-term set is tiny and broadcasts twice (once to
  * prune the corpus explode to query terms before the (doc, term) tf
  * aggregate — the inverted-index access pattern — once to attach idf);
  * doc lengths ride a co-partitioned join on doc_id; N and L travel as a
  * 1-row broadcast. The corpus shuffles only the query-term-filtered
  * (doc, term) pairs. Top-k is the salted two-phase rank shared with the
  * vector family.
  */
object Bm25 {

  def bm25TopK(spark: SparkSession, sfDir: String, numQueries: Int = 3,
      k: Int = 10, salts: Int = 8): DataFrame = {
    val docs = spread(Tables.documents(spark, sfDir))
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
    val lens = docs.select($"doc_id", size($"toks").cast("long").as("dl"))
    // corpus stats pass (N, Σdl): the standard two-pass BM25 shape — ONE
    // bounded 1-row collect, then the constants fold into the scoring
    // expressions (a 1-row frame joined in would either cross-join (BNLJ,
    // the audit's target) or need a literal-key join Catalyst folds back
    // into one)
    val statsRow = lens.agg(
      count(lit(1)).as("n_docs"), sum($"dl").as("total_dl")).head()
    val nDocs = statsRow.getLong(0)
    val totalDl = statsRow.getLong(1)
    val exploded = docs.select($"doc_id", explode($"toks").as("term"))
    val qterms = exploded.filter($"doc_id" < numQueries).distinct()
      .select($"doc_id".as("query_id"), $"term")
    val qvocab = broadcast(qterms.select($"term").distinct())
    // inverted-index slice: only query-term postings survive the explode
    val postings = exploded.join(qvocab, "term")
    val dfTab = postings.distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val idf = broadcast(dfTab
      .select($"term", round(
        log((lit(nDocs) - $"df" + 0.5) / ($"df" + 0.5) + 1.0) * 1e6)
        .cast("long").as("idf_micros")))
    val tf = postings.groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val weights = tf
      .join(lens, "doc_id")
      .join(idf, "term")
      .select($"doc_id", $"term",
        round($"idf_micros" * (lit(22L) * $"tf" * lit(totalDl)).cast("double") /
          (lit(10L) * $"tf" * lit(totalDl) + lit(3L * totalDl) +
            lit(9L * nDocs) * $"dl").cast("double"))
          .cast("long").as("wm"))
    val scored = weights.join(qterms, "term")
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"wm").as("score_micros"))
      .select($"query_id", $"doc_id".as("vec_id"), $"score_micros")
    Similarity.topKPerQuery(scored, k, salts, "score_micros", asc = false)
      .select($"query_id", $"rk", $"vec_id".as("doc_id"), $"score_micros")
      .orderBy($"query_id", $"rk")
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the lexical
    * ([[bm25TopK]]) and semantic ([[Similarity.cosineTopK]]) rankings —
    * the standard two-tower serving fusion, scored as
    * Σ round(10⁶/(60+rank)) per contributing list (EXACT integers: the
    * 10⁶/(60+r) division is the same double dag over the same ints in
    * both engines, so micro-quantized contributions sum engine-exactly).
    * `n_lists` records whether a hit came from one ranker or both.
    *
    * Scale: both inputs are already queries×k-sized rankings — the fusion
    * itself is dashboard-sized regardless of corpus scale; all the heavy
    * lifting lives in (and is bounded by) the two component top-ks.
    */
  def hybridRrfTopK(spark: SparkSession, sfDir: String, numQueries: Int = 3,
      k: Int = 10, rrfC: Int = 60): DataFrame = {
    def contrib(rk: org.apache.spark.sql.Column) =
      round(lit(1e6) / (lit(rrfC) + rk)).cast("long")
    val lex = bm25TopK(spark, sfDir, numQueries, k)
      .select($"query_id", $"doc_id", contrib($"rk").as("c"))
    val sem = Similarity.cosineTopK(spark, sfDir, numQueries, k)
      .select($"query_id", $"vec_id".as("doc_id"), contrib($"rk").as("c"))
    lex.unionByName(sem)
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"c").as("rrf_micros"), count(lit(1)).as("n_lists"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"rrf_micros".desc, $"doc_id")).cast("long"))
      .filter($"rk" <= k)
      .select($"query_id", $"rk", $"doc_id", $"rrf_micros", $"n_lists")
      .orderBy($"query_id", $"rk")
  }
}

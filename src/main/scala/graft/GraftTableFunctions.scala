package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

/** SQL TABLE-VALUED surface over the standing-index read paths — the
  * extension tiers' `spark.sql` story (the reference's analytics stage is
  * SQL transcripts, README.md:98-198; a SQL-first user must be able to
  * probe a persisted index without dropping to Scala). Registered through
  * [[GraftExtensions]] (`injectTableFunction` — the same
  * SparkSessionExtensions route the scalar functions use; no Spark
  * internals modified), each builder returns THE SAME analyzed
  * [[LogicalPlan]] the Scala entry builds — `graft_ivf_topk('/idx',
  * 'queries_view', 10, 4)` IS [[graft.operators.Similarity
  * .queryStandingIvf]] over a [[graft.operators.Similarity
  * .prepareIvfIndex]] handle, plan-identical by construction, not a
  * re-implementation (the `ivf_topk_sql` entry shares `ivf_topk`'s oracle
  * to hash-check exactly that).
  *
  * Query batches arrive as a VIEW NAME (temp view or table): Spark's
  * injected table functions take scalar literal arguments only —
  * TABLE(...) arguments are reserved to built-ins — so the batch-frame
  * half of each probe resolves through the catalog, the same way the
  * reference passes table names through its SQL surface. Index handles
  * are prepared per call (the SQL surface is the convenience path; the
  * amortized standing handle remains the Scala/serving-loop path).
  *
  * Registered functions:
  *  - `graft_ivf_topk(path, queriesView, k, nprobe[, wCoarse])` —
  *    (query_id, vec_id, cosine, rk); two-level cell choice when the
  *    index persists a coarse quantizer.
  *  - `graft_pq_topk(path, queriesView, k)` — ADC top-k over a standing
  *    PQ index: (query_id, vec_id, adc, rk).
  *  - `graft_ivf_pq_topk(path, queriesView, k, nprobe[, wCoarse])` — the
  *    composed probe: (query_id, vec_id, adc, rk).
  *  - `graft_bm25_topk(path, queriesView, k)` — standing lexical probe:
  *    (query_id, doc_id, score_micros, rk); view carries (query_id, text).
  *  - `graft_hybrid_rrf_topk(bm25Path, ivfPath, queriesView, k, rrfC)` —
  *    RRF fusion of the lexical and semantic standing probes; view
  *    carries (query_id, text, embedding).
  *  - `graft_near_dup_probe(indexTable, corpusView, batchView, threshold)`
  *    — the standing band-index probe: verified (batch_doc_id,
  *    corpus_doc_id, jaccard) pairs.
  */
object GraftTableFunctions {

  private def strLit(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def dblLit(e: Expression, fn: String, arg: String): Double =
    e match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case Literal(v: Int, IntegerType) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a numeric literal, got $other")
    }

  private def view(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** The analyzed plan of a DataFrame the Scala API built — what every
    * builder returns, so the SQL surface and the Scala surface are ONE
    * plan, not two implementations. */
  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  def ivfTopK(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ivf_topk"
    require(args.length >= 4 && args.length <= 5,
      s"$fn(path, queriesView, k, nprobe[, wCoarse])")
    val spark = SparkSession.active
    val standing = graft.operators.Similarity.prepareIvfIndex(
      spark, strLit(args(0), fn, "path"))
    plan(graft.operators.Similarity.queryStandingIvf(standing,
      view(spark, strLit(args(1), fn, "queriesView")),
      k = intLit(args(2), fn, "k"), nprobe = intLit(args(3), fn, "nprobe"),
      wCoarse = args.lift(4).map(intLit(_, fn, "wCoarse")).getOrElse(2)))
  }

  def pqTopK(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_pq_topk"
    require(args.length == 3, s"$fn(path, queriesView, k)")
    val spark = SparkSession.active
    val standing = graft.operators.Pq.preparePqIndex(
      spark, strLit(args(0), fn, "path"))
    plan(graft.operators.Pq.queryStandingPq(standing,
      view(spark, strLit(args(1), fn, "queriesView")),
      k = intLit(args(2), fn, "k")))
  }

  def ivfPqTopK(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ivf_pq_topk"
    require(args.length >= 4 && args.length <= 5,
      s"$fn(path, queriesView, k, nprobe[, wCoarse])")
    val spark = SparkSession.active
    val standing = graft.operators.Pq.prepareIvfPqIndex(
      spark, strLit(args(0), fn, "path"))
    plan(graft.operators.Pq.queryStandingIvfPq(standing,
      view(spark, strLit(args(1), fn, "queriesView")),
      k = intLit(args(2), fn, "k"), nprobe = intLit(args(3), fn, "nprobe"),
      wCoarse = args.lift(4).map(intLit(_, fn, "wCoarse")).getOrElse(2)))
  }

  def bm25TopK(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_bm25_topk"
    require(args.length == 3, s"$fn(path, queriesView, k)")
    val spark = SparkSession.active
    plan(graft.operators.Bm25.queryBm25Index(spark,
      strLit(args(0), fn, "path"),
      view(spark, strLit(args(1), fn, "queriesView")),
      k = intLit(args(2), fn, "k")))
  }

  def hybridRrfTopK(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_hybrid_rrf_topk"
    require(args.length == 5,
      s"$fn(bm25Path, ivfPath, queriesView, k, rrfC)")
    val spark = SparkSession.active
    val queries = view(spark, strLit(args(2), fn, "queriesView"))
    val k = intLit(args(3), fn, "k")
    val lex = graft.operators.Bm25.queryBm25Index(spark,
        strLit(args(0), fn, "bm25Path"),
        queries.select(col("query_id"), col("text")), k)
      .select(col("query_id"), col("doc_id"), col("rk"))
    val sem = graft.operators.Similarity.queryStandingIvf(
        graft.operators.Similarity.prepareIvfIndex(spark,
          strLit(args(1), fn, "ivfPath")),
        queries.select(col("query_id").as("vec_id"), col("embedding")), k)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rk"))
    plan(graft.operators.Bm25.rrfFuse(lex, sem, k,
      rrfC = intLit(args(4), fn, "rrfC")))
  }

  def nearDupProbe(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_near_dup_probe"
    require(args.length == 4,
      s"$fn(indexTable, corpusView, batchView, threshold)")
    val spark = SparkSession.active
    plan(graft.operators.Dedup.incrementalNearDupIndexed(
      view(spark, strLit(args(1), fn, "corpusView")),
      strLit(args(0), fn, "indexTable"),
      view(spark, strLit(args(2), fn, "batchView")),
      threshold = dblLit(args(3), fn, "threshold")))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.sources.Tables
import graft.util.Cols._

/** Scalar quantization (SQ8) — the faiss-style `SQ8` compression tier for
  * embedding stores, sitting between raw floats and [[Pq]]'s product codes:
  * each DIMENSION maps to an 8-bit code on a per-dim uniform [min, max]
  * grid. 4× fewer scan bytes than float32 (vs PQ's ~32×), but the
  * compressed-domain distance is EXACT INTEGER arithmetic — no per-query
  * distance table, no float summation order to pin — so the ADC-style
  * ranking oracle replays bit-for-bit from the dumped codes alone, and the
  * quantization error is bounded per dimension by half a grid step instead
  * of a codeword residual.
  *
  * Pipeline shape (mirrors [[Pq]] deliberately): fit per-dim [min, max]
  * (one tiny aggregate), encode with the codegen
  * [[graft.functions.Sq8EncodeExpr]] (scan-side, no shuffle), rank in the
  * compressed domain against a broadcast query batch with the integer-L2
  * [[graft.functions.IntL2Expr]], exact-rerank a shortlist. At 100 TB the
  * fit is a columnar min/max the scan practically gives away, and the
  * compressed scan reads ~1/4 the bytes of the exact one.
  */
object Sq {

  /** Per-dimension affine grid: code = round((x − min)·scale), clamped. */
  final case class SqModel(mins: Array[Double], scales: Array[Double])

  /** Fit the per-dim grid over a (vec_id, embedding) frame: one
    * posexplode + dim-keyed min/max (dim-sized result, map-side partials
    * absorb everything). A constant dimension gets scale 0 → code 0. */
  def fit(emb: DataFrame): SqModel = {
    val rows = spread(emb)
      .select(posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"dim").agg(min($"x").as("mn"), max($"x").as("mx"))
      .collect().sortBy(_.getInt(0))
    val mins = rows.map(_.getFloat(1).toDouble)
    val scales = rows.map { r =>
      val (a, b) = (r.getFloat(1).toDouble, r.getFloat(2).toDouble)
      if (b > a) 255.0 / (b - a) else 0.0
    }
    SqModel(mins, scales)
  }

  /** Distributed encode: (vec_id, codes). One codegen pass, no shuffle. */
  def encode(emb: DataFrame, model: SqModel): DataFrame =
    emb.select($"vec_id",
      VectorExpressions.sq8Codes($"embedding", model.mins, model.scales)
        .as("codes"))

  private def fixtureModel(spark: SparkSession,
      sfDir: String): (DataFrame, SqModel) = {
    val emb = spread(Tables.embeddings(spark, sfDir))
      .select($"vec_id", $"embedding").filter($"embedding".isNotNull)
    (emb, fit(emb))
  }

  /** Registered rows-only dump: the fitted grid (audit surface). */
  def sqParamsEntry(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, model) = fixtureModel(spark, sfDir)
    spark.createDataFrame(
      model.mins.indices.map(i => (i, model.mins(i), model.scales(i))))
      .toDF("dim", "min_val", "scale")
  }

  /** Registered rows-only dump (it IS the oracle input): the SQ8-coded
    * corpus, codes comma-joined (the [[Pq.pqCodesEntry]] de-array rule). */
  def sqCodesEntry(spark: SparkSession, sfDir: String): DataFrame = {
    val (emb, model) = fixtureModel(spark, sfDir)
    encode(emb, model)
      .withColumn("codes",
        expr("array_join(transform(codes, x -> cast(x AS string)), ',')"))
  }

  /** The one SQ8 ranking core — integer squared-L2 of a coded corpus
    * against its own first `numQueries` codes broadcast (the [[Similarity
    * .cosineTopK]] fixture convention, self excluded), salted two-phase
    * rank ascending — shared by the in-memory and persisted-index entries
    * so the two can never drift. */
  private def adcRank(codes: DataFrame, numQueries: Int, k: Int,
      salts: Int): DataFrame = {
    val qcodes = codes.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"codes".as("qcodes"))
    val scored = codes.join(broadcast(qcodes), $"vec_id" =!= $"query_id")
      .withColumn("qdist", VectorExpressions.intL2($"codes", $"qcodes"))
      .select($"query_id", $"vec_id", $"qdist")
    Similarity.topKPerQuery(scored, k, salts, "qdist", asc = true)
  }

  /** Compressed-domain top-k: integer squared-L2 of the coded corpus
    * against the broadcast coded query batch, salted two-phase rank
    * ascending. Fully oracle-checked from the codes dump alone — the
    * metric is exact integer math. */
  def sqAdcTopK(spark: SparkSession, sfDir: String, numQueries: Int = 5,
      k: Int = 10, salts: Int = 8): DataFrame = {
    val (emb, model) = fixtureModel(spark, sfDir)
    adcRank(encode(emb, model), numQueries, k, salts)
  }

  /** Persist an SQ8 index for build-once / query-many use: the coded
    * corpus (narrow — dim bytes per vector as small ints) plus the fitted
    * grid as one tiny parquet — [[Pq.writePqIndex]]'s contract verbatim
    * for the 4× tier. The codes dir is the standing scan artifact; the
    * grid is what appends encode against. */
  def writeSqIndex(emb: DataFrame, model: SqModel, path: String): Unit = {
    val spark = emb.sparkSession
    encode(spread(emb), model).write.mode("overwrite").parquet(s"$path/codes")
    spark.createDataFrame(
      model.mins.indices.map(i => (i, model.mins(i), model.scales(i))))
      .toDF("dim", "min_val", "scale")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** Load the frozen grid of a persisted SQ8 index. */
  def loadSqModel(spark: SparkSession, path: String): SqModel = {
    val rows = spark.read.parquet(s"$path/params").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    SqModel(rows.map(_._2), rows.map(_._3))
  }

  /** Append new vectors WITHOUT refitting: encode with the FROZEN grid and
    * append into the codes dir — the add-after-train contract
    * ([[Pq.appendToPqIndex]]'s twin). A frozen grid CLAMPS out-of-range
    * arrivals to the boundary codes (the SQ8 saturation everyone accepts
    * for its simplicity); production watches the clamp rate and refits the
    * grid when the ingested range outgrows it — the same drift-watch shape
    * as the PQ reconstruction-error monitor, cheaper signal. */
  def appendToSqIndex(newVecs: DataFrame, path: String): Unit = {
    val model = loadSqModel(newVecs.sparkSession, path)
    encode(spread(newVecs), model).write.mode("append")
      .parquet(s"$path/codes")
  }

  /** tmpdir slot for the registered standing-index entry (the
    * [[Pq.pqAdcTopKIndexed]] scheme). */
  private def sqIndexPath(sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.util.TmpDirs.perProcessDir("graft_sq")}/$key"
  }

  /** Registered query: the AMORTIZED standing-index probe — integer-L2
    * top-k over the PERSISTED codes, grid loaded not fitted (build
    * absorbed by the bench's untimed warmup). Same rows as [[sqAdcTopK]]
    * on the same parameters — the index is an execution layout, not a
    * semantic — so it shares sq_adc_topk's oracle (the
    * [[Pq.pqAdcTopKIndexed]] pattern verbatim, closing the SQ8 tier's
    * standing-index gap). */
  def sqAdcTopKIndexed(spark: SparkSession, sfDir: String,
      numQueries: Int = 5, k: Int = 10, salts: Int = 8): DataFrame = {
    val path = sqIndexPath(sfDir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "params"))) {
      val (emb, model) = fixtureModel(spark, sfDir)
      writeSqIndex(emb, model, path)
    }
    adcRank(spark.read.parquet(s"$path/codes"), numQueries, k, salts)
  }

  /** Two-stage retrieval: compressed-domain shortlist (integer L2, size
    * `shortlist`), exact float rerank of the shortlist only (the
    * [[Pq.pqRerankTopK]] contract — rerank cost is shortlist-sized, the
    * full corpus is only ever scanned in the compressed domain). */
  def sqRerankTopK(spark: SparkSession, sfDir: String, numQueries: Int = 5,
      shortlist: Int = 50, k: Int = 10, salts: Int = 8): DataFrame = {
    val (emb, model) = fixtureModel(spark, sfDir)
    val codes = encode(emb, model)
    val qcodes = codes.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"codes".as("qcodes"))
    val scored = codes.join(broadcast(qcodes), $"vec_id" =!= $"query_id")
      .withColumn("qdist", VectorExpressions.intL2($"codes", $"qcodes"))
      .select($"query_id", $"vec_id", $"qdist")
    val sl = Similarity.topKPerQuery(scored, shortlist, salts, "qdist",
      asc = true).select($"query_id", $"vec_id")
    val qvecs = emb.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val reranked = sl
      .join(emb, "vec_id")
      .join(broadcast(qvecs), "query_id")
      .withColumn("l2sq",
        round(VectorExpressions.l2Sq($"embedding", $"q_emb"), 6))
      .select($"query_id", $"vec_id", $"l2sq")
    Similarity.topKPerQuery(reranked, k, salts, "l2sq", asc = true)
  }
}

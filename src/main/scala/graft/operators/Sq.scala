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

  /** Compressed-domain top-k: integer squared-L2 of the coded corpus
    * against the broadcast coded query batch (queries = the [[Similarity
    * .cosineTopK]] fixture convention, self excluded), salted two-phase
    * rank ascending. Fully oracle-checked from the codes dump alone —
    * the metric is exact integer math. */
  def sqAdcTopK(spark: SparkSession, sfDir: String, numQueries: Int = 5,
      k: Int = 10, salts: Int = 8): DataFrame = {
    val (emb, model) = fixtureModel(spark, sfDir)
    val codes = encode(emb, model)
    val qcodes = codes.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"codes".as("qcodes"))
    val scored = codes.join(broadcast(qcodes), $"vec_id" =!= $"query_id")
      .withColumn("qdist", VectorExpressions.intL2($"codes", $"qcodes"))
      .select($"query_id", $"vec_id", $"qdist")
    Similarity.topKPerQuery(scored, k, salts, "qdist", asc = true)
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

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

  /** The grid as a (dim, min_val, scale) frame — the dump, the persisted
    * params medium, and the broadcast side of the reconstruction-error
    * join, from ONE definition. */
  private def paramsDf(spark: SparkSession, model: SqModel): DataFrame =
    spark.createDataFrame(
      model.mins.indices.map(i => (i, model.mins(i), model.scales(i))))
      .toDF("dim", "min_val", "scale")

  /** Registered rows-only dump: the fitted grid (audit surface). */
  def sqParamsEntry(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, model) = fixtureModel(spark, sfDir)
    paramsDf(spark, model)
  }

  /** Per-(vector, dimension) grid reconstruction RESIDUAL d = x − decode
    * (decode = min + code/scale on the same frozen grid that encoded; a
    * constant dimension decodes to its min) — the one arithmetic behind
    * the oracle-checked [[sqQuantError]] entry AND the grid-drift
    * monitor's per-batch fold ([[graft.streaming.AnnStream]]'s SQ loop),
    * shared so the alarm evidence stays replayable by the same oracle.
    * One codegen encode pass + a dim-sized broadcast join; batch-scaled,
    * shuffle-free. */
  private[graft] def reconErr(emb: DataFrame, model: SqModel): DataFrame =
    emb
      .select($"vec_id", $"embedding",
        VectorExpressions.sq8Codes($"embedding", model.mins, model.scales)
          .as("codes"))
      .select($"vec_id",
        posexplode(arrays_zip($"embedding", $"codes")).as(Seq("dim", "z")))
      .select($"vec_id", $"dim",
        $"z.embedding".as("x"), $"z.codes".as("code"))
      .join(broadcast(paramsDf(emb.sparkSession, model)), "dim")
      .withColumn("d", $"x".cast("double") -
        when($"scale" > 0, $"min_val" + $"code" / $"scale")
          .otherwise($"min_val"))
      .select($"vec_id", $"dim", $"d")

  /** Registered query (HASH-CHECKED): per-dimension grid reconstruction
    * error — `pq_quant_error`'s shape for the 4× tier, replayed by DuckDB
    * from the `sq_codes` + `sq_params` dumps against the raw embeddings
    * (decode = min + code/scale, squared residual rounded 6 dp,
    * micro-quantized integer rollup, truncating mean). This is the
    * drift signal the SQ ops loop alarms on: a frozen grid CLAMPS
    * out-of-range arrivals, so distortion rises exactly like PQ codebook
    * drift — and because the arithmetic is [[reconErr]] + the pinned
    * micros quantization, the monitor's fold is oracle-replayed here by
    * construction. */
  def sqQuantError(spark: SparkSession, sfDir: String): DataFrame = {
    val (emb, model) = fixtureModel(spark, sfDir)
    reconErr(emb, model)
      .withColumn("err_micros", graft.util.Cols.micros6($"d" * $"d"))
      .groupBy($"dim".cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum($"err_micros").as("sum_err_micros"))
      .select($"dim", $"n_vecs", $"sum_err_micros",
        expr("sum_err_micros DIV n_vecs").as("mean_err_micros"))
      .orderBy($"dim")
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
    paramsDf(spark, model)
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

  /** Cheap change signature of the index's PARAMS directory — (name,
    * length, mtime) per file, one listing. A [[retrainSqIndex]] swap
    * rewrites the directory (new part-file names); appends never touch
    * the grid. The serving loop compares this per trigger — the
    * [[Similarity.centersSignature]] contract for the 4× tier. */
  private[graft] def paramsSignature(spark: SparkSession,
      path: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/params")
    p.getFileSystem(spark.sessionState.newHadoopConf()).listStatus(p)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
  }

  /** A PREPARED standing handle on a persisted SQ8 index — grid, codes
    * schema, and change signature resolved once; each probe re-lists the
    * codes directory freshly (frozen-grid appends stay visible — the
    * probe-while-ingest contract every standing tier here serves). */
  final case class StandingSq(spark: SparkSession, path: String,
      model: SqModel, codesSchema: org.apache.spark.sql.types.StructType,
      paramsSig: Seq[(String, Long, Long)])

  /** Resolve a persisted SQ8 index into a serving handle (signature read
    * FIRST — the [[Pq.preparePqIndex]] ordering, so a swap landing
    * mid-prepare is caught by the next trigger's check). */
  def prepareSqIndex(spark: SparkSession, path: String): StandingSq = {
    val sig = paramsSignature(spark, path)
    StandingSq(spark, path, loadSqModel(spark, path),
      spark.read.parquet(s"$path/codes").schema, sig)
  }

  /** Probe a prepared [[StandingSq]] with a (vec_id, embedding) query
    * FRAME — the serving path: queries encode IN-PLAN against the frozen
    * grid (one codegen pass — embeddings never pass through the driver),
    * the coded corpus scans once per probe (a fresh listing, so appends
    * are visible), integer squared-L2 scores against the broadcast query
    * codes, and ranking folds through the bounded top-k aggregate
    * (map-side partial — the serving twins' shared shape). Same rows as
    * [[sqAdcTopK]] on the same queries: qdist rides through the double-
    * scored buffer exactly (≤ 64·255² ≪ 2⁵³) and returns as the exact
    * BIGINT the batch path emits. */
  def queryStandingSq(standing: StandingSq, queryFrame: DataFrame,
      k: Int = 10): DataFrame = {
    val m = standing.model
    val qcodes = broadcast(queryFrame
      .select($"vec_id".as("query_id"),
        VectorExpressions.sq8Codes($"embedding", m.mins, m.scales)
          .as("qcodes")))
    // retractions fold out of the coded scan — the shared tombstone
    // contract ([[deleteFromSqIndex]])
    val codes = graft.util.Tombstones.antiJoin(
      standing.spark.read.schema(standing.codesSchema)
        .parquet(s"${standing.path}/codes"),
      standing.path, "vec_id")
    val scored = codes.join(qcodes, $"vec_id" =!= $"query_id")
      .withColumn("qdist",
        VectorExpressions.intL2($"codes", $"qcodes").cast("double"))
      .select($"query_id", $"vec_id", $"qdist")
    Similarity.topKViaAggregate(scored, k, "qdist", asc = true)
      .select($"query_id", $"vec_id", $"qdist".cast("long").as("qdist"),
        $"rk")
  }

  /** DELETE vectors from a persisted SQ8 index — the retraction contract
    * ([[graft.util.Tombstones]]; [[Pq.deleteFromPqIndex]]'s twin for the
    * 4× tier): one tombstone append; [[queryStandingSq]] (and therefore
    * the serving loop) anti-joins the ids out from its next probe on. */
  def deleteFromSqIndex(ids: DataFrame, path: String): Unit =
    graft.util.Tombstones.append(ids.select($"vec_id"), path)

  /** Physically ABSORB tombstoned vectors from a persisted SQ8 index —
    * [[Pq.absorbPqDeletes]]'s twin: `codes` and the raw refit corpus both
    * compact through the anti-join transform, tombstones retire only when
    * BOTH rewrites were carry-free, so a post-absorb [[retrainSqIndex]]
    * (which re-encodes from `raw`) resurrects nothing. */
  def absorbSqDeletes(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20,
      safeBatchFence: Option[Long] = None)
      : Seq[graft.util.Compaction.CompactionStats] =
    graft.util.Tombstones.absorbAll(spark, path, "vec_id",
      Seq(("codes", None), ("raw", None)), targetBytes, safeBatchFence)

  /** Re-fit the grid over a CURRENT raw corpus and swap the persisted
    * index in place — the SQ8 retrain-on-drift response
    * ([[Pq.retrainPqIndex]]'s protocol on the 4× tier): a frozen grid
    * CLAMPS out-of-range arrivals, so reconstruction error
    * ([[sqQuantError]]'s arithmetic) rises as the ingested range outgrows
    * the fit; this refits min/max, re-encodes everything, and swaps
    * codes + params together through the one staged protocol. Serving
    * ([[graft.streaming.AnnStream.sqSearchQuery]]) picks the swap up via
    * its per-trigger params signature check — no restart. */
  def retrainSqIndex(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val base = spread(emb).select($"vec_id", $"embedding")
      .filter($"embedding".isNotNull)
      .persist() // scanned by the fit's min/max and the re-encode
    try {
      // the raw corpus must COVER the index (the retrainPqIndex seeding
      // contract): refitting over a partial raw dir would swap in an
      // index that silently forgot the rest
      val rawCount = base.count()
      val codesCount = spark.read.parquet(s"$path/codes").count()
      require(rawCount >= codesCount,
        s"retrainSqIndex: raw corpus ($rawCount vecs) does not cover the " +
          s"index ($codesCount codes) at $path — was the raw dir seeded " +
          "with the initial corpus?")
      val staging = s"$path/retrain_staging"
      writeSqIndex(base, fit(base), staging)
      graft.util.IndexSwap.swapDirs(spark, path, "retrain_staging",
        Seq("codes", "params"))
    } finally { val _ = base.unpersist() }
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

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}
import graft.sources.Tables
import graft.streaming.AnnStream

/** The RESIDUAL composed tier's ops loop — the [[IvfPqAutoRetrainSpec]]
  * lifecycle through the [[AnnStream.IvfPqResidualRetrainMonitor]]
  * subclass: residual-encoded ingest, the RESIDUAL distortion signal
  * (`pq_residual_quant_error`'s arithmetic), the order-dependent
  * coarse-then-residual refit, and the residual serving stream following
  * the swap with no restart. One alarm direction suffices here: the OR
  * semantics and the crash/replay fencing are INHERITED code the parent
  * suite already pins in both directions — this suite pins what the
  * subclass CHANGES (encode, signal, response). */
class IvfPqResidualAutoRetrainSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private type MonitorRow = (Long, Long, Long, Long, Boolean, Boolean)

  /** The coarse signal's exact arithmetic, standalone (unchanged by the
    * subclass — folded against the same frozen centers). */
  private def coarseHealthOf(vecs: DataFrame,
      centers: Array[Array[Double]]): (Long, Long) = {
    val r = vecs
      .select($"embedding",
        graft.functions.VectorExpressions
          .nearestCenter($"embedding", centers).as("cell"))
      .join(broadcast(Similarity.centersFloatDf(spark, centers)), Seq("cell"))
      .withColumn("cos_micros",
        graft.util.Cols.micros6(Similarity.cosine($"embedding", $"centroid")))
      .agg(count(lit(1)), sum($"cos_micros")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The RESIDUAL distortion signal's exact arithmetic, standalone:
    * frozen-center cell, residual reconstruction errors, integer micros. */
  private def residualErrHealthOf(vecs: DataFrame,
      centers: Array[Array[Double]], model: Pq.PqModel): (Long, Long) = {
    val r = vecs
      .select($"embedding",
        graft.functions.VectorExpressions
          .nearestCenter($"embedding", centers).as("cell"))
      .select(posexplode(graft.functions.VectorExpressions
        .pqResidualReconErrs($"embedding", $"cell", centers, model.codebooks))
        .as(Seq("subspace", "err")))
      .select(graft.util.Cols.micros6($"err").as("err_micros"))
      .agg(count(lit(1)), coalesce(sum($"err_micros"), lit(0L))).head()
    (r.getLong(0) / model.numSubspaces, r.getLong(1))
  }

  test("residual distortion ceiling binds: alarm, coarse-then-residual retrain, residual serving follows, replay fenced") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-res-auto").toString
    val corpus = emb.filter($"vec_id" % 4 === 0)
    val index = Similarity.buildIvfIndex(corpus)
    val model = Pq.trainResidual(index)
    Pq.writeIvfPqResidualIndex(index, model, path)
    corpus.write.mode("overwrite").parquet(s"$path/raw")
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val corpusCount = corpus.count()
    val (n1, es1) = residualErrHealthOf(
      healthy.toDF("vec_id", "embedding"), index.centers, model)
    val (n2, es2) = residualErrHealthOf(
      drifted.toDF("vec_id", "embedding"), index.centers, model)
    val (cn1, cs1) = coarseHealthOf(
      healthy.toDF("vec_id", "embedding"), index.centers)
    val (cn2, cs2) = coarseHealthOf(
      drifted.toDF("vec_id", "embedding"), index.centers)
    assert(cn1 == n1 && cn2 == n2, "the two folds must count alike")
    val errHealthy = es1 / n1
    val errCumulative = (es1 + es2) / (n1 + n2)
    assert(errCumulative > errHealthy + 4,
      s"fixture drift invisible to the residual signal: $errHealthy vs $errCumulative")
    val cosHealthy = cs1 / cn1
    val cosCumulative = (cs1 + cs2) / (cn1 + cn2)
    // ceiling between healthy and drifted; coarse floor below any possible
    // cosine mean, so only the RESIDUAL distortion signal can fire
    val ceiling = (errHealthy + errCumulative) / 2
    val floor = -2000000L
    val monitor = AnnStream.prepareIvfPqResidualRetrainMonitor(spark, path,
      floor, ceiling, minVecsForAlarm = n1 + 1)
    val monitorRows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    val served = scala.collection.mutable.Set[(Long, Long, Double, Long)]()

    val ingest = MemoryStream[(Long, Seq[Float])]
    // the subclass IS an IvfPqRetrainMonitor: the composed loop entry
    // point serves it verbatim — durability written once, reused here
    val iq = AnnStream.autoRetrainIvfPqIngestQuery(
      ingest.toDF().toDF("vec_id", "embedding"), monitor) { (row, _) =>
      monitorRows ++= row.as[MonitorRow].collect()
    }.start()
    val probeQueries = healthy.take(4)
    val probes = MemoryStream[(Long, Seq[Float])]
    val sq = AnnStream.ivfPqResidualSearchQuery(
      probes.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      served ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      // trigger 1: healthy ingest — raw + RESIDUAL codes appended under
      // the frozen geometry, margin positive, no alarm
      ingest.addData(healthy: _*)
      iq.processAllAvailable()
      probes.addData(probeQueries.head) // serving warm on the OLD geometry
      sq.processAllAvailable()
      val margin1 = math.min(cosHealthy - floor, ceiling - errHealthy)
      val r1 = monitorRows.head
      assert(r1 == ((0L, n1, n1, margin1, false, false)), r1.toString)
      val codes0 = spark.read.parquet(s"$path/codes")
      assert(codes0.count() == corpusCount + n1)
      // the streamed codes ARE residual codes: spot-check one appended
      // vector against the fused expression's batch evaluation
      val (vid, vemb) = healthy.head
      val wantCodes = Seq((vid, vemb)).toDF("vec_id", "embedding")
        .select(graft.functions.VectorExpressions.pqResidualCodes(
          $"embedding",
          graft.functions.VectorExpressions
            .nearestCenter($"embedding", index.centers),
          index.centers, model.codebooks))
        .as[Seq[Int]].head()
      val gotCodes = codes0.filter($"vec_id" === vid)
        .select($"codes").as[Seq[Int]].head()
      assert(gotCodes == wantCodes, "ingest did not residual-encode")

      // trigger 2: drift — residual distortion crosses the ceiling, the
      // coarse fit refits FIRST and the residual codebooks refit against
      // the NEW cells, swapped as one unit
      val sigBefore = Pq.ivfPqSignature(spark, path)
      ingest.addData(drifted: _*)
      iq.processAllAvailable()
      val margin2 = math.min(cosCumulative - floor, ceiling - errCumulative)
      assert(margin2 == ceiling - errCumulative && margin2 < 0L,
        s"fixture must make the RESIDUAL margin bind: $margin2")
      val r2 = monitorRows(1)
      assert(r2 == ((1L, n2, n1 + n2, margin2, true, true)),
        s"alarm evidence wrong: $r2 (expected margin $margin2)")
      assert(monitor.retrains == 1L && monitor.totalVecs == 0L)
      assert(Pq.ivfPqSignature(spark, path) != sigBefore,
        "alarm fired but the index was not swapped")
      val codes = spark.read.parquet(s"$path/codes")
      assert(codes.count() == corpusCount + n1 + n2,
        "retrain did not re-encode the raw corpus")
      assert(codes.select($"vec_id").distinct().count() == codes.count())

      // residual serving answers under the NEW geometry, no restart
      served.clear()
      probes.addData(probeQueries: _*)
      sq.processAllAvailable()
      val expected = Pq.queryStandingIvfPqResidual(
        Pq.prepareIvfPqIndex(spark, path),
        probeQueries.toDF("vec_id", "embedding"))
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(served.toSet == expected && served.nonEmpty)

      // same-process replay of a folded batch id: all side effects skipped
      val rawRows = spark.read.parquet(s"$path/raw").count()
      val codeRows = codes.count()
      AnnStream.processIvfPqIngestBatch(monitor,
        drifted.toDF("vec_id", "embedding"), batchId = 1L) { (row, _) =>
        monitorRows ++= row.as[MonitorRow].collect()
      }
      assert(spark.read.parquet(s"$path/raw").count() == rawRows,
        "replayed batch re-appended raw vectors")
      assert(spark.read.parquet(s"$path/codes").count() == codeRows,
        "replayed batch re-encoded codes")
      val r3 = monitorRows(2)
      assert(r3._2 == 0L && !r3._5 && !r3._6,
        s"replayed batch must skip all side effects: $r3")
    } finally { iq.stop(); sq.stop() }
  }
}

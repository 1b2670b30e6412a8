package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}
import graft.sources.Tables
import graft.streaming.AnnStream

/** The COMPOSED tier's ops loop, end to end: ingest (raw + frozen
  * cell-partitioned codes) → the OR-alarm on the binding margin of the two
  * drift signals → [[Pq.retrainIvfPqIndex]] refits both stages and swaps
  * codes + centers + codebooks as one unit → the composed serving stream
  * answers under the new geometry, no restart. Two tests pin the two alarm
  * DIRECTIONS separately — the reconstruction-error ceiling and the
  * coarse-health floor — so the OR semantics are evidenced, not assumed. */
class IvfPqAutoRetrainSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private type MonitorRow = (Long, Long, Long, Long, Boolean, Boolean)

  /** The coarse signal's exact arithmetic, standalone. */
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

  /** The compressed signal's exact arithmetic, standalone. */
  private def errHealthOf(vecs: DataFrame, model: Pq.PqModel): (Long, Long) = {
    val r = vecs
      .select(posexplode(graft.functions.VectorExpressions
        .pqReconErrs($"embedding", model.codebooks)).as(Seq("subspace", "err")))
      .select(graft.util.Cols.micros6($"err").as("err_micros"))
      .agg(count(lit(1)), coalesce(sum($"err_micros"), lit(0L))).head()
    (r.getLong(0) / model.numSubspaces, r.getLong(1))
  }

  private final case class Fixture(path: String,
      healthy: Seq[(Long, Seq[Float])], drifted: Seq[(Long, Seq[Float])],
      corpusCount: Long, n1: Long, n2: Long,
      cosHealthy: Long, cosCumulative: Long,
      errHealthy: Long, errCumulative: Long)

  private def fixture(tag: String): Fixture = {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = java.nio.file.Files
      .createTempDirectory(s"graft-ivfpq-auto-$tag").toString
    val corpus = emb.filter($"vec_id" % 4 === 0)
    val index = Similarity.buildIvfIndex(corpus)
    val model = Pq.train(corpus)
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, path)
    corpus.write.mode("overwrite").parquet(s"$path/raw")
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (cn1, cs1) = coarseHealthOf(healthy.toDF("vec_id", "embedding"),
      index.centers)
    val (cn2, cs2) = coarseHealthOf(drifted.toDF("vec_id", "embedding"),
      index.centers)
    val (en1, es1) = errHealthOf(healthy.toDF("vec_id", "embedding"), model)
    val (en2, es2) = errHealthOf(drifted.toDF("vec_id", "embedding"), model)
    assert(cn1 == en1 && cn2 == en2, "the two folds must count alike")
    val f = Fixture(path, healthy, drifted, corpus.count(), cn1, cn2,
      cs1 / cn1, (cs1 + cs2) / (cn1 + cn2),
      es1 / en1, (es1 + es2) / (en1 + en2))
    // the drift injury must be visible to BOTH signals, or the OR tests
    // degenerate into testing the same signal twice
    assert(f.cosCumulative < f.cosHealthy - 4 &&
      f.errCumulative > f.errHealthy + 4,
      s"fixture lost its drift injury: $f")
    f
  }

  test("reconstruction-error ceiling binds: alarm, composed retrain, serving follows, replay fenced") {
    val f = fixture("err")
    // the err ceiling sits between healthy and cumulative-after-drift; the
    // coarse floor sits below any possible cosine mean (cos ≥ -1 ⇒ micros
    // ≥ -1e6), so only the err signal can fire
    val ceiling = (f.errHealthy + f.errCumulative) / 2
    val floor = -2000000L
    val monitor = AnnStream.prepareIvfPqRetrainMonitor(spark, f.path,
      floor, ceiling, minVecsForAlarm = f.n1 + 1)
    val monitorRows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    val served = scala.collection.mutable.Set[(Long, Long, Double, Long)]()

    val ingest = MemoryStream[(Long, Seq[Float])]
    val iq = AnnStream.autoRetrainIvfPqIngestQuery(
      ingest.toDF().toDF("vec_id", "embedding"), monitor) { (row, _) =>
      monitorRows ++= row.as[MonitorRow].collect()
    }.start()
    val probeQueries = f.healthy.take(4)
    val probes = MemoryStream[(Long, Seq[Float])]
    val sq = AnnStream.ivfPqSearchQuery(
      probes.toDF().toDF("vec_id", "embedding"), f.path) { (topk, _) =>
      served ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      // trigger 1: healthy ingest — raw + composed codes appended, margin
      // positive, no alarm
      ingest.addData(f.healthy: _*)
      iq.processAllAvailable()
      probes.addData(probeQueries.head) // serving warm on the OLD geometry
      sq.processAllAvailable()
      val margin1 = math.min(f.cosHealthy - floor, ceiling - f.errHealthy)
      val r1 = monitorRows.head
      assert(r1 == ((0L, f.n1, f.n1, margin1, false, false)), r1.toString)
      // the healthy batch's codes landed under the cell directories and a
      // concurrent probe sees them (probe-while-ingest on the composed index)
      val codes0 = spark.read.parquet(s"${f.path}/codes")
      assert(codes0.count() == f.corpusCount + f.n1)

      // trigger 2: the drift mode arrives — the err mean crosses its
      // ceiling, the binding margin goes negative, BOTH stages refit and
      // swap as one unit
      val sigBefore = Pq.ivfPqSignature(spark, f.path)
      ingest.addData(f.drifted: _*)
      iq.processAllAvailable()
      val margin2 = math.min(f.cosCumulative - floor,
        ceiling - f.errCumulative)
      assert(margin2 < 0L)
      val r2 = monitorRows(1)
      assert(r2 == ((1L, f.n2, f.n1 + f.n2, margin2, true, true)),
        s"alarm evidence wrong: $r2 (expected margin $margin2)")
      assert(monitor.retrains == 1L && monitor.totalVecs == 0L)
      val sigAfter = Pq.ivfPqSignature(spark, f.path)
      assert(sigAfter != sigBefore, "alarm fired but the index was not swapped")
      // the retrained index covers everything ingested, exactly once, and
      // its codes sit under cells assigned by the NEW coarse fit
      val codes = spark.read.parquet(s"${f.path}/codes")
      assert(codes.count() == f.corpusCount + f.n1 + f.n2,
        "retrain did not re-encode the raw corpus")
      assert(codes.select($"vec_id").distinct().count() == codes.count())

      // serving answers under the NEW geometry, no restart — row-identical
      // to a fresh batch probe of the swapped index
      served.clear()
      probes.addData(probeQueries: _*)
      sq.processAllAvailable()
      val expected = Pq.queryStandingIvfPq(
        Pq.prepareIvfPqIndex(spark, f.path),
        probeQueries.toDF("vec_id", "embedding"))
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(served.toSet == expected && served.nonEmpty)

      // same-process replay of an already-folded batch id: no raw append,
      // no encode, no fold, benign row out
      val rawRows = spark.read.parquet(s"${f.path}/raw").count()
      val codeRows = codes.count()
      AnnStream.processIvfPqIngestBatch(monitor,
        f.drifted.toDF("vec_id", "embedding"), batchId = 1L) { (row, _) =>
        monitorRows ++= row.as[MonitorRow].collect()
      }
      assert(spark.read.parquet(s"${f.path}/raw").count() == rawRows,
        "replayed batch re-appended raw vectors")
      assert(spark.read.parquet(s"${f.path}/codes").count() == codeRows,
        "replayed batch re-encoded codes")
      val r3 = monitorRows(2)
      assert(r3._2 == 0L && !r3._5 && !r3._6,
        s"replayed batch must skip all side effects: $r3")
    } finally { iq.stop(); sq.stop() }
  }

  test("coarse-health floor binds: the OTHER signal direction fires the same composed retrain") {
    val f = fixture("floor")
    // the coarse floor sits between cumulative-after-drift and healthy; the
    // err ceiling sits far above anything the fixture can produce, so only
    // the coarse signal can fire
    val floor = (f.cosHealthy + f.cosCumulative) / 2
    val ceiling = f.errCumulative + 1000000L
    val monitor = AnnStream.prepareIvfPqRetrainMonitor(spark, f.path,
      floor, ceiling, minVecsForAlarm = f.n1 + 1)
    val rows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    def sink(df: DataFrame, @annotation.unused id: Long): Unit =
      rows ++= df.as[MonitorRow].collect()

    AnnStream.processIvfPqIngestBatch(monitor,
      f.healthy.toDF("vec_id", "embedding"), 0L)(sink)
    val margin1 = math.min(f.cosHealthy - floor, ceiling - f.errHealthy)
    assert(rows.last == ((0L, f.n1, f.n1, margin1, false, false)))

    val sigBefore = Pq.ivfPqSignature(spark, f.path)
    AnnStream.processIvfPqIngestBatch(monitor,
      f.drifted.toDF("vec_id", "embedding"), 1L)(sink)
    val margin2 = math.min(f.cosCumulative - floor, ceiling - f.errCumulative)
    assert(margin2 == f.cosCumulative - floor && margin2 < 0L,
      s"fixture must make the COARSE margin bind: $margin2")
    assert(rows.last == ((1L, f.n2, f.n1 + f.n2, margin2, true, true)),
      s"coarse-floor alarm evidence wrong: ${rows.last}")
    assert(monitor.retrains == 1L)
    assert(Pq.ivfPqSignature(spark, f.path) != sigBefore,
      "coarse-floor alarm fired but the index was not swapped")
    val codes = spark.read.parquet(s"${f.path}/codes")
    assert(codes.count() == f.corpusCount + f.n1 + f.n2)
    assert(codes.select($"vec_id").distinct().count() == codes.count())
  }
}

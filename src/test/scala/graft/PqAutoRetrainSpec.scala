package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Pq
import graft.sources.Tables
import graft.streaming.AnnStream

/** The PQ tier's composed ops loop, end to end: ingest (raw + frozen-code
  * append) → reconstruction-error alarm → codebook retrain → the serving
  * stream answers under the new codebooks, no restart of either stream —
  * the compressed-index twin of IvfAutoRetrainSpec. */
class PqAutoRetrainSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** The monitor's exact health arithmetic, standalone: (n_vecs,
    * sum_err_micros) of a batch under the codebooks. */
  private def healthOf(vecs: DataFrame,
      model: Pq.PqModel): (Long, Long) = {
    val r = vecs
      .select(posexplode(graft.functions.VectorExpressions
        .pqReconErrs($"embedding", model.codebooks)).as(Seq("subspace", "err")))
      .select(graft.util.Cols.micros6($"err").as("err_micros"))
      .agg(count(lit(1)), coalesce(sum($"err_micros"), lit(0L))).head()
    (r.getLong(0) / model.numSubspaces, r.getLong(1))
  }

  test("ingest stream raises the reconstruction-error alarm, retrains the codebooks, and serving follows") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq-auto-retrain").toString
    val corpus = emb.filter($"vec_id" % 4 === 0)
    // the index + the rerank-tier raw corpus the retrain refits over
    Pq.writePqIndex(corpus, Pq.train(corpus), path)
    corpus.write.mode("overwrite").parquet(s"$path/raw")
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq

    // ceiling derived from measured means: healthy ingest must stay under
    // it, the cumulative mean after the drift batch must rise above
    val model0 = Pq.loadPqModel(spark, path)
    val (n1, s1) = healthOf(healthy.toDF("vec_id", "embedding"), model0)
    val (n2, s2) = healthOf(drifted.toDF("vec_id", "embedding"), model0)
    val healthyMean = s1 / n1
    val cumulativeMean = (s1 + s2) / (n1 + n2)
    assert(cumulativeMean > healthyMean + 4,
      s"fixture lost its drift injury: healthy $healthyMean, " +
        s"cumulative-after-drift $cumulativeMean")
    val ceiling = (healthyMean + cumulativeMean) / 2

    val monitor = AnnStream.preparePqRetrainMonitor(spark, path, ceiling,
      minVecsForAlarm = n1 + 1)
    val monitorRows =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Boolean, Boolean)]()
    val served = scala.collection.mutable.Set[(Long, Long, Double, Long)]()

    val ingest = MemoryStream[(Long, Seq[Float])]
    val iq = AnnStream.autoRetrainPqIngestQuery(
      ingest.toDF().toDF("vec_id", "embedding"), monitor) { (row, _) =>
      monitorRows ++= row.as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
    }.start()
    val probeQueries = healthy.take(4)
    val probes = MemoryStream[(Long, Seq[Float])]
    val sq = AnnStream.pqSearchQuery(
      probes.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      served ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      // trigger 1: healthy ingest — raw + codes appended, no alarm
      ingest.addData(healthy: _*)
      iq.processAllAvailable()
      probes.addData(probeQueries.head) // serving warm on the OLD codebooks
      sq.processAllAvailable()
      val r1 = monitorRows.head
      assert(r1._2 == n1 && r1._3 == n1 && r1._4 == healthyMean, r1.toString)
      assert(!r1._5 && !r1._6, s"healthy ingest must not alarm: $r1")

      // trigger 2: the drift mode arrives — the mean crosses the ceiling,
      // codebooks retrain over the raw corpus, codes re-encode, swap
      val sigBefore = Pq.codebooksSignature(spark, path)
      ingest.addData(drifted: _*)
      iq.processAllAvailable()
      val r2 = monitorRows(1)
      assert(r2._2 == n2 && r2._3 == n1 + n2, r2.toString)
      assert(r2._4 == cumulativeMean && r2._4 > ceiling,
        s"alarm evidence wrong: $r2 (ceiling $ceiling)")
      assert(r2._5 && r2._6, s"drift batch must alarm and retrain: $r2")
      assert(monitor.retrains == 1L && monitor.totalVecs == 0L)
      assert(Pq.codebooksSignature(spark, path) != sigBefore,
        "alarm fired but the codebooks were not swapped")
      // the retrained index covers everything ingested: corpus + both
      // batches, re-encoded under the new codebooks
      val codes = spark.read.parquet(s"$path/codes")
      assert(codes.count() ==
        corpus.count() + n1 + n2, "retrain did not re-encode the raw corpus")
      assert(codes.select($"vec_id").distinct().count() == codes.count())

      // serving answers under the NEW codebooks, no restart
      served.clear()
      probes.addData(probeQueries: _*)
      sq.processAllAvailable()
      val model1 = Pq.loadPqModel(spark, path)
      val expected = Pq.adcTopK(codes, model1, probeQueries)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(served.toSet == expected)
      assert(served.nonEmpty)

      // same-process replay of an already-folded batch id: no raw append,
      // no encode, no fold, benign row out
      val rawRows = spark.read.parquet(s"$path/raw").count()
      val codeRows = spark.read.parquet(s"$path/codes").count()
      AnnStream.processPqIngestBatch(monitor,
        drifted.toDF("vec_id", "embedding"), batchId = 1L) { (row, _) =>
        monitorRows ++= row.as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
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

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.AnnStream

/** The composed IVF ops loop, end to end: ingest → drift alarm → retrain →
  * serving answers from the new geometry, with no restart of either stream.
  * The parts are pinned separately (IvfRetrainSpec: the swap;
  * AnnStreamSpec: retrain-surviving serving; `ivf_retrain_health`: the
  * health arithmetic) — this spec pins the WIRING. */
class IvfAutoRetrainSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** The monitor's exact health arithmetic, computed standalone: the spec
    * derives its alarm floor from MEASURED healthy/drifted means instead of
    * a magic constant, so the test tracks the fixture data. */
  private def healthOf(vecs: DataFrame,
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

  test("ingest stream raises the drift alarm, retrains, and the serving stream follows") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-auto-retrain").toString
    // standing corpus: one mode (raw); the drift batch arrives REVERSED —
    // the planted second mode of the retrain fixture
    val corpus = emb.filter($"vec_id" % 4 === 0)
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(corpus), path)
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq

    // derive the floor from the measured means: healthy ingest must stay
    // above it, the cumulative mean after the drift batch must fall below
    val centers0 = Similarity.loadIvfIndex(spark, path).centers
    val (n1, s1) = healthOf(healthy.toDF("vec_id", "embedding"), centers0)
    val (n2, s2) = healthOf(drifted.toDF("vec_id", "embedding"), centers0)
    val healthyMean = s1 / n1
    val cumulativeMean = (s1 + s2) / (n1 + n2)
    assert(cumulativeMean < healthyMean - 4,
      s"fixture lost its drift injury: healthy $healthyMean, " +
        s"cumulative-after-drift $cumulativeMean")
    val floor = (healthyMean + cumulativeMean) / 2

    val monitor = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1) // warm-up: batch 1 alone can never alarm
    val monitorRows =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Boolean, Boolean)]()
    val served = scala.collection.mutable.Set[(Long, Long, Double, Long)]()

    val ingest = MemoryStream[(Long, Seq[Float])]
    val iq = AnnStream.autoRetrainIngestQuery(
      ingest.toDF().toDF("vec_id", "embedding"), monitor) { (row, _) =>
      monitorRows ++= row.as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
    }.start()
    val probeQueries = healthy.take(4)
    val probes = MemoryStream[(Long, Seq[Float])]
    val sq = AnnStream.ivfSearchQuery(
      probes.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      served ++= topk.as[(Long, Long, Double, Long)].collect()
    }.start()
    try {
      // trigger 1: healthy ingest — appended, scored, no alarm
      ingest.addData(healthy: _*)
      iq.processAllAvailable()
      probes.addData(probeQueries.head) // serving warm on the OLD geometry
      sq.processAllAvailable()
      assert(monitorRows.size == 1)
      val r1 = monitorRows.head
      assert(r1._2 == n1 && r1._3 == n1, s"batch-1 volume wrong: $r1")
      assert(r1._4 == healthyMean, s"batch-1 mean wrong: $r1")
      assert(!r1._5 && !r1._6, s"healthy ingest must not alarm: $r1")

      // trigger 2: the drift mode arrives — cumulative mean crosses the
      // floor, the loop retrains and swaps, totals reset
      val sigBefore = Similarity.centersSignature(spark, path)
      ingest.addData(drifted: _*)
      iq.processAllAvailable()
      assert(monitorRows.size == 2)
      val r2 = monitorRows(1)
      assert(r2._2 == n2 && r2._3 == n1 + n2, s"batch-2 volume wrong: $r2")
      assert(r2._4 == cumulativeMean && r2._4 < floor,
        s"alarm evidence wrong: $r2 (floor $floor)")
      assert(r2._5 && r2._6, s"drift batch must alarm and retrain: $r2")
      assert(monitor.retrains == 1L && monitor.totalVecs == 0L)
      assert(Similarity.centersSignature(spark, path) != sigBefore,
        "alarm fired but the index was not swapped")

      // the serving stream answers from the NEW geometry, no restart:
      // its next trigger must equal the batch probe of the retrained index
      served.clear()
      probes.addData(probeQueries: _*)
      sq.processAllAvailable()
      val expected = Similarity.queryIvfIndex(
        Similarity.loadIvfIndex(spark, path), probeQueries)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(served.toSet == expected)
      assert(served.nonEmpty)

      // trigger 3: healthy ingest against the refit geometry — fresh
      // totals, under warm-up again, no alarm
      ingest.addData(healthy.map { case (id, e) => (id + 1000000L, e) }: _*)
      iq.processAllAvailable()
      val r3 = monitorRows(2)
      assert(!r3._5 && !r3._6, s"post-retrain healthy ingest alarmed: $r3")
      assert(r3._3 == n1, s"totals must restart after the retrain: $r3")

      // at-least-once replay: re-delivering an already-folded batch id must
      // not append, fold, or retrain — same corpus rows, benign row out
      val corpusRows = spark.read.parquet(s"$path/corpus").count()
      AnnStream.processIngestBatch(monitor,
        drifted.toDF("vec_id", "embedding"), batchId = 1L) { (row, _) =>
        monitorRows ++= row.as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
      }
      assert(spark.read.parquet(s"$path/corpus").count() == corpusRows,
        "replayed batch was appended twice")
      val r4 = monitorRows(3)
      assert(r4._2 == 0L && !r4._5 && !r4._6,
        s"replayed batch must skip all side effects: $r4")
    } finally { iq.stop(); sq.stop() }
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.sources.Tables
import graft.streaming.SampleStream

/** Streaming weighted reservoir: micro-batch merges must equal the batch
  * A-ES top-n over everything seen, absorb re-arrivals, and only improve.
  */
class SampleStreamSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("reservoir equals the batch A-ES sample; re-arrivals and replays are no-ops") {
    val docs = Tables.documents(spark, sf)
    val snapshots = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Int, Long, Long, Long)]]
    val ms = MemoryStream[(Long, String)]
    val q = SampleStream.weightedReservoirQuery(
      ms.toDF().toDF("doc_id", "text"),
      size(graft.operators.TextAnalysis.tokens($"text")).cast("long"),
      "graft_test_reservoir", 100) { (res, _) =>
      snapshots += res.as[(Int, Long, Long, Long)].collect().toSeq
    }.start()
    try {
      val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      val thirds = rows.grouped(math.max(rows.length / 3 + 1, 1)).toSeq
      thirds.foreach { part =>
        ms.addData(part.toSeq: _*)
        q.processAllAvailable()
      }
      // final reservoir == the one-shot batch sample over the whole corpus
      val expected = Sampling.weightedSample(spark, sf)
        .as[(Int, Long, Long, Long)].collect().toSeq
      assert(snapshots.last == expected)
      // intermediate reservoirs are capped at n and only improve: the
      // worst kept priority is non-decreasing batch over batch
      assert(snapshots.forall(_.length <= 100))
      val worst = snapshots.map(_.map { case (_, _, w, lm) =>
        lm.toDouble / w }.min)
      assert(worst.zip(worst.tail).forall { case (a, b) => b >= a })
      // a full re-arrival of already-merged data changes nothing
      ms.addData(thirds.head.toSeq: _*)
      q.processAllAvailable()
      assert(snapshots.last == expected)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_test_reservoir")
    }
  }

  test("annealedMixtureQuery: each batch equals the batch mixture at corpus-so-far rates; rates anneal down") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect().sortBy(_._1)
    // a budget small enough that the dominant language crosses it
    // mid-stream: rates must anneal below 1 and keep falling
    val budgets = Map("en" -> 2000L)
    val standing = SampleStream.StandingMixture(budgets,
      scala.collection.mutable.Map.empty)
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Set[Long], Map[String, Double])]
    val ms = MemoryStream[(Long, String, String)]
    val q = SampleStream.annealedMixtureQuery(
      ms.toDF().toDF("doc_id", "lang", "text"), standing) { (kept, _) =>
      perBatch += ((kept.select($"doc_id").as[Long].collect().toSet,
        standing.rates))
    }.start()
    try {
      val thirds = docs.grouped(math.max(docs.length / 3 + 1, 1)).toSeq
      thirds.foreach { part =>
        ms.addData(part.toSeq: _*)
        q.processAllAvailable()
      }
      assert(perBatch.size == thirds.size)
      // parity with the batch twin: batch k's kept set equals the batch
      // operator run over the prefix up to and including batch k
      // (identical rate arithmetic + md5 gate), restricted to batch k
      thirds.zipWithIndex.foreach { case (part, k) =>
        val prefix = thirds.take(k + 1).flatten
        val prefixDf = prefix.toDF("doc_id", "lang", "text")
          .select($"doc_id", $"lang",
            size(graft.operators.TextAnalysis.tokens($"text"))
              .cast("long").as("n_tokens"))
        val ids = part.map(_._1).toSet
        val expected = Sampling.corpusMixtureOf(prefixDf, budgets)
          .select($"doc_id").as[Long].collect().toSet.intersect(ids)
        assert(perBatch(k)._1 == expected, s"batch $k parity")
      }
      // annealing: once over budget, the gated language's rate strictly
      // falls as its totals grow, and later batches actually drop docs
      val enRates = perBatch.map(_._2("en"))
      assert(enRates.last < 1.0)
      assert(enRates.zip(enRates.tail).forall { case (a, b) => b <= a })
      assert(enRates.head > enRates.last)
      // at-least-once replay idempotence: re-processing an already-folded
      // batchId must not double-count its tokens (rates unchanged) and
      // must emit exactly the rows the original delivery emitted
      val totalsBefore = standing.totals.toMap
      val lastId = perBatch.size - 1L
      var replayKept: Set[Long] = Set.empty
      SampleStream.processMixtureBatch(standing,
        thirds.last.toSeq.toDF("doc_id", "lang", "text"), lastId) { (kept, _) =>
        replayKept = kept.select($"doc_id").as[Long].collect().toSet
      }
      assert(standing.totals.toMap == totalsBefore, "replay folded twice")
      assert(replayKept == perBatch.last._1, "replay emitted different rows")
    } finally q.stop()
  }
}

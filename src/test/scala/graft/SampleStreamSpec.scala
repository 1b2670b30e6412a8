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
}

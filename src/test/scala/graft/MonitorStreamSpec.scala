package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.MonitorStream

/** Streaming vocab-drift monitor: per-batch scores must equal the batch
  * recomputation over the same split, the monitor is stateless across
  * triggers, and a novel-term burst tops the alarm. */
class MonitorStreamSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("drift equals the batch formula on the ingest split; stateless; novel terms alarm") {
    val docs = Tables.documents(spark, sf)
    val standing = docs.filter($"doc_id" % 10 =!= 1)
    val batchDocs = docs.filter($"doc_id" % 10 === 1)
    val profile = MonitorStream.prepareProfile(standing)
    val snapshots = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(String, Long, Long, Long)]]
    val ms = MemoryStream[(Long, String)]
    val q = MonitorStream.vocabDriftQuery(
      ms.toDF().toDF("doc_id", "text"), profile) { (top, _) =>
      snapshots += top.as[(String, Long, Long, Long)].collect().toSeq
    }.start()
    try {
      val rows = batchDocs.select($"doc_id", $"text").as[(Long, String)].collect()
      ms.addData(rows.toSeq: _*)
      q.processAllAvailable()
      // batch recomputation with the same exact-integer/micro arithmetic,
      // over the batch's terms (the monitor's documented scope)
      val bCounts = batchDocs
        .select(explode(TextAnalysis.tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("tf_b"))
      val tB = bCounts.agg(sum($"tf_b")).head.getLong(0)
      val (tC, v) = (profile.corpusTokens, profile.vocabSize)
      val expected = bCounts
        .join(profile.counts, Seq("term"), "left")
        .withColumn("tf_c", coalesce($"tf_c", lit(0L)))
        .withColumn("ln_micros", round(
          log((($"tf_b" + 1L) * lit(tC + v)).cast("double") /
            (($"tf_c" + 1L) * lit(tB + v)).cast("double")) * 1e6).cast("long"))
        .withColumn("drift_micros", round(
          (($"tf_b" + 1L) * $"ln_micros").cast("double") / lit((tB + v).toDouble))
          .cast("long"))
        .select($"term", $"tf_b", $"tf_c", $"drift_micros")
        .orderBy(abs($"drift_micros").desc, $"term").limit(20)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(snapshots.last == expected)
      assert(expected.nonEmpty)
      // stateless: replaying the same batch yields the same report
      ms.addData(rows.toSeq: _*)
      q.processAllAvailable()
      assert(snapshots.last == expected)
      // a burst of a never-seen term dominates the alarm with tf_c = 0
      ms.addData((999999L, Array.fill(50)("zzgraftnovel").mkString(" ")))
      q.processAllAvailable()
      val top = snapshots.last.head
      assert(top._1 == "zzgraftnovel" && top._3 == 0L && top._4 > 0L, top)
    } finally {
      q.stop()
      profile.unpersist()
    }
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Bm25
import graft.sources.Tables
import graft.streaming.LexStream

/** BM25 serving: stream ≡ batch over the standing index, and the
  * stats-signature currency check — appends change (N, Σdl), so the next
  * trigger must score with the refreshed constants, not just see the new
  * postings. */
class LexStreamSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("micro-batch probes equal the batch probe; appended docs searchable with refreshed stats") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bm25-stream").toString
    Bm25.writeBm25Index(corpus, path)
    val queries = docs.filter($"doc_id" % 10 === 0)
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(6)
      .map { case (id, t) => (id, String.valueOf(t)) } // null-safe
    def batchTopK(qs: Seq[(Long, String)]) =
      Bm25.queryBm25Index(spark, path,
        qs.toDF("query_id", "text"))
        .as[(Long, Long, Long, Long)].collect().toSet
    val results = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = LexStream.bm25SearchQuery(
      ms.toDF().toDF("query_id", "text"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Long, Long)].collect()
    }.start()
    try {
      // split delivery must union to the one-shot batch probe: the
      // standing handle's folded constants ≡ the batch probe's fold
      val (first, second) = queries.splitAt(3)
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
      assert(results.toSet == batchTopK(queries))
      assert(results.nonEmpty)
      // segment append UNDER the live stream: a new doc with the query's
      // exact text must (a) surface in the next trigger — new postings
      // files visible — and (b) the whole ranking must equal the
      // POST-append batch probe — (N, Σdl) re-folded via the signature
      // check, not served stale (scores shift for every doc when N does)
      val (qid, qtext) = queries.head
      Bm25.appendToBm25Index(Seq((990000L, qtext)).toDF("doc_id", "text"),
        path)
      results.clear()
      ms.addData((qid, qtext))
      q.processAllAvailable()
      assert(results.exists(_._3 == 990000L),
        s"appended doc not searchable: ${results.toSeq.sortBy(_._2).take(3)}")
      assert(results.toSet == batchTopK(Seq((qid, qtext))),
        "post-append serving ranking diverges from the post-append batch probe")
    } finally q.stop()
  }
}

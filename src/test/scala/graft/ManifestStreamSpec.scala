package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.ManifestStream

/** The append-only streaming training manifest: split ingest must produce
  * exactly what single-shot ingest produces for the prefix, continue the
  * per-(epoch, shard) tiling gap-free across the batch boundary, and
  * re-emit bit-identical rows on an at-least-once replay of the last
  * batch. */
class ManifestStreamSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val nEpochs = 2
  private val nShards = 4
  private val contextLen = 64

  private type MRow = (Long, Long, Long, Long, Long, Long, Long, Long)

  private def ingest(batches: Seq[Seq[(Long, String)]],
      standing: ManifestStream.StandingManifest)
      : Seq[Set[MRow]] = {
    val out = scala.collection.mutable.ArrayBuffer[Set[MRow]]()
    val ms = MemoryStream[(Long, String)]
    val q = ManifestStream.manifestQuery(
      ms.toDF().toDF("doc_id", "text"), standing) { (rows, _) =>
      out += rows.as[MRow].collect().toSet
    }.start()
    try {
      batches.foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    out.toSeq
  }

  test("split ingest: prefix-stable, gap-free tiling across batches, exactly once per epoch") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", coalesce($"text", lit("")).as("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(400)
    val (a, b) = docs.splitAt(250)

    val split = ingest(Seq(a, b),
      ManifestStream.prepareManifest(nEpochs, nShards, contextLen))
    val whole = ingest(Seq(a),
      ManifestStream.prepareManifest(nEpochs, nShards, contextLen))

    // append-only: batch A's rows are identical whether or not B follows
    assert(split.head == whole.head)
    assert(split.head.nonEmpty && split(1).nonEmpty)

    val union = (split.head ++ split(1)).toSeq
    // exactly once per (epoch, doc)
    assert(union.map(r => (r._1, r._5)).distinct.size ==
      nEpochs * docs.size)
    // per (epoch, shard): positions are 1..n gap-free and the token tiling
    // has no holes or overlaps across the batch boundary; pack arithmetic
    // is consistent with the tiling
    union.groupBy(r => (r._1, r._2)).foreach { case ((e, s), rows) =>
      val byPos = rows.sortBy(_._4)
      assert(byPos.map(_._4) == (1L to byPos.size.toLong),
        s"positions not gap-free in epoch $e shard $s")
      byPos.foldLeft(0L) { (expectStart, r) =>
        assert(r._7 == expectStart,
          s"tiling hole at epoch $e shard $s pos ${r._4}: " +
            s"start_tok ${r._7} != $expectStart")
        assert(r._3 == r._7 / contextLen && r._8 == r._7 % contextLen,
          s"pack arithmetic wrong: $r")
        expectStart + r._6
      }
    }
    // shard totals agree with the corpus (the batch-manifest invariant):
    // every doc's tokens land in its value-stable shard, once per epoch
    val expected = docs
      .toDF("doc_id", "text")
      .select(graft.operators.Sampling.shardOf($"doc_id", nShards).as("shard"),
        size(graft.operators.TextAnalysis.tokens($"text")).cast("long")
          .as("n_tokens"))
      .groupBy($"shard").agg(sum($"n_tokens").as("t"))
      .as[(Long, Long)].collect().toMap
    (0L until nEpochs.toLong).foreach { e =>
      val got = union.filter(_._1 == e).groupBy(_._2)
        .map { case (s, rows) => s -> rows.map(_._6).sum }
      assert(got == expected.filter(_._2 > 0L) ||
        got == expected, s"epoch $e shard totals drifted: $got vs $expected")
    }
  }

  test("at-least-once replay of the last batch re-emits identical rows without advancing the tiling") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", coalesce($"text", lit("")).as("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(200)
    val (a, b) = docs.splitAt(120)
    val standing = ManifestStream.prepareManifest(nEpochs, nShards, contextLen)
    val emitted = scala.collection.mutable.ArrayBuffer[Set[MRow]]()
    def deliver(batch: Seq[(Long, String)], id: Long): Unit =
      ManifestStream.processManifestBatch(standing,
        batch.toDF("doc_id", "text"), id) { (rows, _) =>
        emitted += rows.as[MRow].collect().toSet
      }
    deliver(a, 0L)
    deliver(b, 1L)
    val posAfter = standing.docsPerEpoch
    // crash-replay of the LAST batch: same rows, no state advance
    deliver(b, 1L)
    assert(emitted.size == 3)
    assert(emitted(2) == emitted(1), "replayed batch emitted different rows")
    assert(standing.docsPerEpoch == posAfter,
      "replay advanced the standing totals")
    // an OLDER id is not a valid engine replay: nothing is emitted
    deliver(a, 0L)
    assert(emitted.size == 3)
  }

  test("seeded standing continues exactly where a batch-manifested corpus ends") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", coalesce($"text", lit("")).as("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(300)
    val (a, b) = docs.splitAt(200)
    // standing seeded from corpus A via the one-shot agg...
    val seeded = ManifestStream.prepareManifest(
      a.toDF("doc_id", "text"), nEpochs, nShards, contextLen)
    val seededOut = ingest(Seq(b), seeded)
    // ...must emit for B exactly what streaming ingest of A-then-B emits
    val streamed = ingest(Seq(a, b),
      ManifestStream.prepareManifest(nEpochs, nShards, contextLen))
    assert(seededOut.head == streamed(1))
    assert(seededOut.head.nonEmpty)
  }
}

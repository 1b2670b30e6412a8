package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming corpus monitoring — the per-trigger twin of the batch
  * [[graft.operators.Profile.vocabDrift]] alarm: every micro-batch of
  * (doc_id, text) is scored for vocabulary drift against a STANDING corpus
  * profile, and the top drifting terms go to `sink` — the
  * scraper-gone-wrong alarm evaluated while the batch is still in flight,
  * not after it has already joined the corpus.
  *
  * Standing side: [[prepareProfile]] aggregates the corpus term counts
  * ONCE, pre-partitions them BY TERM and caches — the one corpus-wide
  * shuffle happens at prepare time, and every micro-batch join reuses the
  * cached partitioning (only the tiny batch-count side moves per trigger).
  * The corpus scalars (total tokens, vocabulary size) are one bounded
  * 1-row collect, frozen into the stream like the prepared benchmark of
  * [[DedupStream.decontaminationQuery]].
  *
  * Semantics note (deliberate, spec-pinned): the per-trigger report ranks
  * drift over the BATCH's terms (tf_b ≥ 1). Terms the batch never uses
  * contribute the same constant background every trigger — they belong in
  * the batch-twin's full report, not in a per-batch alarm whose job is
  * "what did THIS batch shift". The drift arithmetic itself is identical
  * to the batch twin: exact integer term counts, per-term micro-quantized
  * log ratio, one double dag per contribution.
  */
object MonitorStream {

  /** The frozen corpus side: per-term exact counts (term-partitioned and
    * cached) + the two scalars of the smoothed ratio. Call
    * [[StandingProfile.unpersist]] when the stream stops. */
  final case class StandingProfile(counts: DataFrame, corpusTokens: Long,
      vocabSize: Long) {
    def unpersist(): Unit = { val _ = counts.unpersist() }
  }

  def prepareProfile(corpus: DataFrame): StandingProfile = {
    val counts = corpus
      .select(explode(graft.operators.TextAnalysis.tokens(col("text")))
        .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf_c"))
      .repartition(col("term")) // the once-only corpus shuffle
      .persist()
    val r = counts.agg(sum(col("tf_c")), count(lit(1))).head()
    StandingProfile(counts, r.getLong(0), r.getLong(1))
  }

  /** Configure (not start) the drift monitor: per micro-batch, the top-k
    * (term, tf_b, tf_c, drift_micros) rows by |drift| over the batch's
    * terms, against the frozen profile. */
  def vocabDriftQuery(stream: DataFrame, profile: StandingProfile,
      topK: Int = 20)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bCounts = batch
          .select(explode(graft.operators.TextAnalysis.tokens(col("text")))
            .as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("tf_b"))
        val tB = bCounts.agg(coalesce(sum(col("tf_b")), lit(0L)))
          .head().getLong(0)
        val (tC, v) = (profile.corpusTokens, profile.vocabSize)
        val scored = bCounts
          .join(profile.counts, Seq("term"), "left")
          .withColumn("tf_c", coalesce(col("tf_c"), lit(0L)))
          .withColumn("ln_micros", round(
            log(((col("tf_b") + 1L) * lit(tC + v)).cast("double") /
              ((col("tf_c") + 1L) * lit(tB + v)).cast("double")) * 1e6)
            .cast("long"))
          .withColumn("drift_micros", round(
            ((col("tf_b") + 1L) * col("ln_micros")).cast("double") /
              lit((tB + v).toDouble)).cast("long"))
          .select(col("term"), col("tf_b"), col("tf_c"), col("drift_micros"))
          .orderBy(abs(col("drift_micros")).desc, col("term"))
          .limit(topK)
        sink(scored, batchId)
      }
}

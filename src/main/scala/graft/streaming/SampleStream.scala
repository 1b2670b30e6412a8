package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Sampling

/** Streaming weighted reservoir — A-ES (Efraimidis & Spirakis 2006) over a
  * firehose: the standing top-n by priority u^(1/w) IS a weighted sample
  * without replacement of everything seen so far, maintained exactly
  * across micro-batches because per-doc priorities are CONSTANTS (md5-derived,
  * [[Sampling.weightedSampleOf]]) and top-n is an associative, idempotent
  * merge: top-n(A ∪ B) = top-n(top-n(A) ∪ top-n(B)). Each batch therefore
  * reduces to its own top-n (TakeOrdered, batch never shuffles) before
  * touching the n-row standing table — the classic distributed-reservoir
  * contract, here with the streaming twin equal BY CONSTRUCTION to the
  * batch [[Sampling.weightedSampleOf]] over the union of all batches.
  *
  * Re-arrivals are absorbed: a doc_id seen twice contributes identical
  * (weight, priority) rows (weight is a pure function of its text; the
  * uniform is a pure function of its id), and the merge deduplicates before
  * the cut — so crash-replayed micro-batches are also idempotent: replaying
  * a batch against a reservoir that already merged it is a no-op.
  */
object SampleStream {

  /** Configure (not start) the reservoir stream: micro-batches of
    * (doc_id, …) rows score with `weight` (an expression over the batch's
    * columns), merge into the `reservoirTable` standing top-`n`, and the
    * post-merge reservoir (rk, doc_id, weight, ln_u_micros) goes to `sink`.
    * The table is created on first batch; callers drop it when done. */
  def weightedReservoirQuery(stream: DataFrame, weight: Column,
      reservoirTable: String, n: Int)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchTop = Sampling.weightedSampleOf(batch, weight, n)
          .select(col("doc_id"), col("weight"), col("ln_u_micros"))
        val merged = (if (spark.catalog.tableExists(reservoirTable))
            spark.table(reservoirTable).unionByName(batchTop)
          else batchTop)
          .distinct() // re-arrivals carry identical rows
          .orderBy((col("ln_u_micros").cast("double") / col("weight")).desc,
            col("doc_id"))
          .limit(n)
          // materialize + cut lineage BEFORE overwriting the table the
          // plan reads from
          .localCheckpoint()
        merged.write.mode(SaveMode.Overwrite).saveAsTable(reservoirTable)
        sink(spark.table(reservoirTable)
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy((col("ln_u_micros").cast("double") / col("weight")).desc,
                col("doc_id"))))
          .select(col("rk"), col("doc_id"), col("weight"),
            col("ln_u_micros")), batchId)
      }

  /** The standing side of the ANNEALED-MIXTURE stream: per-language exact
    * token totals plus the fixed budgets. Language count is small by
    * definition (the same boundedness contract as the IVF centroid matrix),
    * so the totals live as driver longs and the per-trigger update is one
    * language-count-sized collect — never a corpus-side state store. */
  final case class StandingMixture(budgets: Map[String, Long],
      totals: scala.collection.mutable.Map[String, Long]) {
    /** Highest batchId already folded into [[totals]] — foreachBatch is
      * at-least-once, and the totals fold is a side effect: without this
      * guard a crash-replayed micro-batch would count its tokens twice and
      * permanently depress every later keep-rate. A replayed id skips the
      * fold and re-gates at the rates the original delivery produced —
      * the same idempotent-replay contract as the reservoir stream. */
    private[streaming] var lastFoldedBatch: Long = -1L

    /** rate = min(1, budget / totals) — the [[Sampling.corpusMixture]]
      * arithmetic verbatim (same IEEE double division), so the gate
      * decisions are bit-identical to the batch twin's at equal totals.
      * Languages with total <= 0 are SKIPPED — the exact analogue of the
      * batch twin's `lang_tokens > 0` filter + inner join, which drops
      * every doc of a zero-total language (budget/0 would otherwise gate
      * at Infinity→1.0 for budgeted, NaN for unbudgeted languages). */
    def rates: Map[String, Double] = totals.iterator.collect {
      case (lang, t) if t > 0L =>
        lang -> math.min(1.0,
          budgets.getOrElse(lang, t).toDouble / t.toDouble)
    }.toMap
  }

  /** Prepare the standing totals from the corpus already ingested:
    * one hash-agg over (lang), language-count-sized result. */
  def prepareMixture(corpus: DataFrame,
      budgets: Map[String, Long]): StandingMixture = {
    val totals = corpus
      .select(col("lang"),
        size(graft.operators.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tokens"))
      .groupBy(col("lang")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    StandingMixture(budgets,
      scala.collection.mutable.Map(totals.toIndexedSeq: _*))
  }

  /** Streaming ANNEALED MIXTURE — the per-trigger twin of
    * [[Sampling.corpusMixture]] with keep-rates RE-DERIVED as the standing
    * corpus grows: each micro-batch of (doc_id, lang, text) first folds its
    * exact token counts into the standing per-language totals (so the
    * batch anneals against totals INCLUDING itself — a language crossing
    * its budget starts downsampling within the same trigger), then gates
    * its documents at rate = min(1, budget/totals) through the
    * deterministic [[Sampling.dynamicHashGate]]. Early batches of an
    * under-budget language keep everything; as ingest accumulates past the
    * budget the rate anneals toward budget/total — exactly the batch
    * operator's rates evaluated on the corpus-so-far prefix
    * (SampleStreamSpec pins per-batch equality with that batch twin).
    *
    * Scale per trigger: one map-side-combined hash-agg over the batch
    * (language-count-sized collect), a driver map update, then a broadcast
    * rates join + per-row md5 gate — the batch never shuffles and the
    * standing side never materializes per-doc state. Output rows are the
    * kept (doc_id, lang, n_tokens, rate). */
  def annealedMixtureQuery(stream: DataFrame, standing: StandingMixture)
      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processMixtureBatch(standing, batch, batchId)(sink)
      }

  /** One annealed-mixture micro-batch — the foreachBatch body, exposed so
    * the idempotent-replay contract is directly testable: the totals fold
    * runs only for a batchId not yet folded (see
    * [[StandingMixture.lastFoldedBatch]]); a replay re-derives the SAME
    * rates and therefore re-emits the SAME kept rows. */
  private[graft] def processMixtureBatch(standing: StandingMixture,
      batch: DataFrame, batchId: Long)
      (sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val docs = batch
      .select(col("doc_id"), col("lang"),
        size(graft.operators.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tokens"))
      .persist() // scanned twice: totals, then the gate
    try {
      if (batchId > standing.lastFoldedBatch) {
        docs.groupBy(col("lang")).agg(sum(col("n_tokens")).as("t"))
          .collect().foreach { r =>
            val lang = r.getString(0)
            standing.totals(lang) =
              standing.totals.getOrElse(lang, 0L) + r.getLong(1)
          }
        standing.lastFoldedBatch = batchId
      }
      val rateRows = standing.rates.toSeq
      if (rateRows.nonEmpty) {
        import spark.implicits._
        val rates = rateRows.toDF("lang", "rate")
        sink(docs.join(broadcast(rates), "lang")
          .filter(Sampling.dynamicHashGate(col("doc_id"), col("rate")))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("rate")),
          batchId)
      }
    } finally { val _ = docs.unpersist() }
  }
}

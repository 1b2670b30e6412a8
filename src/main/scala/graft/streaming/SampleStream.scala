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
}

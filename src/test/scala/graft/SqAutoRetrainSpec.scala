package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sq
import graft.sources.Tables
import graft.streaming.AnnStream

/** The SQ8 tier's lifecycle completion (round 15): serving twin, grid-drift
  * monitor, and retrain — the 4× tier now has the same build → append →
  * probe → serve → retrain → auto-retrain matrix as IVF/PQ/IVF×PQ, through
  * the same inherited [[AnnStream.DriftMonitor]] scaffold. */
class SqAutoRetrainSpec extends SparkTestBase {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def emb: DataFrame = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding").filter($"embedding".isNotNull)

  /** Window-ranked reference of the integer-L2 ADC ranking over `codes`
    * against `queries` encoded with `model` — independent of the serving
    * path's bounded-aggregate fold. */
  private def refRank(codes: DataFrame, queries: DataFrame,
      model: Sq.SqModel, k: Int = 10): Seq[(Long, Long, Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"qdist", $"vec_id")
    codes.join(broadcast(queries.select($"vec_id".as("query_id"),
        graft.functions.VectorExpressions
          .sq8Codes($"embedding", model.mins, model.scales).as("qcodes"))),
        $"vec_id" =!= $"query_id")
      .withColumn("qdist",
        graft.functions.VectorExpressions.intL2($"codes", $"qcodes"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"query_id", $"vec_id", $"qdist", $"rk")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
  }

  test("serving twin: micro-batch probes ≡ the batch ADC ranking; frozen-grid appends visible; a retrain swap followed via the params signature") {
    val base = emb.filter($"vec_id" % 4 === 0)
    val path = tmp("graft-sq-serve")
    Sq.writeSqIndex(base, Sq.fit(base), path)
    // seed the raw corpus next to the index (the retrain coverage contract)
    base.write.mode("overwrite").parquet(s"$path/raw")
    val queries = emb.filter($"vec_id" % 4 === 3).limit(4)
      .as[(Long, Seq[Float])].collect().toSeq
    val results = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.sqSearchQuery(
      ms.toDF().toDF("vec_id", "embedding"), path) { (topk, _) =>
      results ++= topk.as[(Long, Long, Long, Long)].collect()
    }.start()
    try {
      ms.addData(queries: _*)
      q.processAllAvailable()
      val model0 = Sq.loadSqModel(spark, path)
      assert(results.toSeq.sortBy(r => (r._1, r._4)) ==
        refRank(spark.read.parquet(s"$path/codes"),
          queries.toDF("vec_id", "embedding"), model0),
        "serving fold diverged from the window-ranked reference")
      // frozen-grid append: visible at the next trigger's fresh listing
      val extra = emb.filter($"vec_id" % 4 === 1)
      Sq.appendToSqIndex(extra, path)
      extra.write.mode("append").parquet(s"$path/raw")
      results.clear()
      ms.addData(queries: _*)
      q.processAllAvailable()
      assert(results.toSeq.sortBy(r => (r._1, r._4)) ==
        refRank(spark.read.parquet(s"$path/codes"),
          queries.toDF("vec_id", "embedding"), model0),
        "post-append serving diverged (frozen grid, union corpus)")
      // retrain swap under the live stream: the next trigger re-prepares
      // via the params signature and scores with the NEW grid
      Sq.retrainSqIndex(spark.read.parquet(s"$path/raw"), path)
      val model1 = Sq.loadSqModel(spark, path)
      assert(model1.mins.toSeq != model0.mins.toSeq ||
        model1.scales.toSeq != model0.scales.toSeq)
      results.clear()
      ms.addData(queries: _*)
      q.processAllAvailable()
      assert(results.toSeq.sortBy(r => (r._1, r._4)) ==
        refRank(spark.read.parquet(s"$path/codes"),
          queries.toDF("vec_id", "embedding"), model1),
        "post-retrain serving did not follow the grid swap")
    } finally q.stop()
  }

  test("ops loop: clamp-driven distortion crosses the ceiling → grid refit + staged swap; totals reset against the new signature") {
    val base = emb.filter($"vec_id" % 4 === 0)
    val path = tmp("graft-sq-ops")
    val model0 = Sq.fit(base)
    Sq.writeSqIndex(base, model0, path)
    base.write.mode("overwrite").parquet(s"$path/raw")
    val healthy = emb.filter($"vec_id" % 4 === 1)
    // drifted arrivals: 10× the fitted range — every dimension clamps to
    // the boundary code, reconstruction error explodes (the SQ8 failure
    // mode the monitor exists for)
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        expr("transform(embedding, x -> x * 10.0F)").as("embedding"))
    // ceiling between the two regimes, measured with the entry's own
    // arithmetic (Sq.reconErr — the oracle-replayed fold)
    def meanErr(vecs: DataFrame, m: Sq.SqModel): Long = {
      val h = Sq.reconErr(vecs, m)
        .select(graft.util.Cols.micros6($"d" * $"d").as("em"))
        .agg(count(lit(1)), sum($"em")).head()
      h.getLong(1) / (h.getLong(0) / m.mins.length)
    }
    val healthyMean = meanErr(healthy, model0)
    val driftedMean = meanErr(drifted, model0)
    assert(driftedMean > healthyMean * 4,
      s"fixture degenerate: $healthyMean vs $driftedMean")
    val ceiling = healthyMean + (driftedMean - healthyMean) / 4
    val monitor = AnnStream.prepareSqRetrainMonitor(spark, path,
      errCeilingMicros = ceiling)
    val rows = scala.collection.mutable
      .Buffer[(Long, Long, Long, Long, Boolean, Boolean)]()
    def drive(b: DataFrame, id: Long): Unit =
      AnnStream.processSqIngestBatch(monitor, b, id) { (r, _) =>
        rows ++= r.as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
      }
    drive(healthy, 0L)
    assert(rows.last._5 == false && rows.last._6 == false,
      s"healthy batch alarmed: ${rows.last}")
    val sigBefore = Sq.paramsSignature(spark, path)
    drive(drifted, 1L)
    // the cumulative mean crossed → retrain fired in the same trigger
    assert(rows.last._5 && rows.last._6, s"no alarm/retrain: ${rows.last}")
    assert(Sq.paramsSignature(spark, path) != sigBefore,
      "retrain did not swap the grid")
    // the refit covered base + both appended batches, totals reset
    assert(monitor.totalVecs == 0L)
    assert(spark.read.parquet(s"$path/codes").count() ==
      base.count() + healthy.count() + drifted.count())
    // post-retrain: the same drifted distribution now measures healthy
    // against the refit grid (it is inside the new range)
    val model1 = Sq.loadSqModel(spark, path)
    assert(meanErr(drifted, model1) < ceiling,
      "refit grid did not absorb the drifted range")
  }

  test("restart durability: a fresh monitor re-seeds fence + totals from the stateDir; the replayed batch republishes, never duplicates") {
    val base = emb.filter($"vec_id" % 4 === 0)
    val path = tmp("graft-sq-durable")
    Sq.writeSqIndex(base, Sq.fit(base), path)
    base.write.mode("overwrite").parquet(s"$path/raw")
    val stateDir = tmp("graft-sq-state")
    val m1 = AnnStream.prepareSqRetrainMonitor(spark, path,
      errCeilingMicros = Long.MaxValue, stateDir = Some(stateDir))
    val batch = emb.filter($"vec_id" % 4 === 1)
    AnnStream.processSqIngestBatch(m1, batch, 0L) { (r, _) =>
      val _ = r.count()
    }
    val (vecs1, mean1) = (m1.totalVecs, m1.meanErrMicros)
    assert(vecs1 > 0L)
    // the crash-restart: a new incarnation seeded from disk
    val m2 = AnnStream.prepareSqRetrainMonitor(spark, path,
      errCeilingMicros = Long.MaxValue, stateDir = Some(stateDir))
    assert(m2.lastFoldedBatch == 0L && m2.totalVecs == vecs1 &&
      m2.meanErrMicros == mean1,
      "persisted state did not restore the fold sequence")
    // the one replay a crash forces through: fenced — no side effects
    AnnStream.processSqIngestBatch(m2, batch, 0L) { (r, _) =>
      val _ = r.count()
    }
    assert(m2.totalVecs == vecs1, "fenced replay re-folded")
    val appended = spark.read.parquet(s"$path/codes")
      .join(batch.select($"vec_id"), "vec_id")
    assert(appended.count() == batch.count(),
      "replay duplicated or lost appended codes")
  }
}

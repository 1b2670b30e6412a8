package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}
import graft.sources.Tables
import graft.streaming.AnnStream
import graft.util.BatchAppend

/** CRASH-RESTART durability of the auto-retrain ops loops — the round-14
  * headline: a fresh monitor prepared from the persisted `stateDir` must
  * continue the dead incarnation's alarm sequence exactly (fence, totals,
  * ops counter), and the one replay that can run WITHOUT the fence (crash
  * after the append, before the fold persisted) must republish the same
  * files instead of duplicating vec_ids ([[graft.util.BatchAppend]]).
  * The same-process replay contract is pinned by IvfAutoRetrainSpec /
  * PqAutoRetrainSpec; this suite pins the ACROSS-PROCESS matrix those
  * specs' docstrings used to only promise. */
class MonitorDurabilitySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private type MonitorRow = (Long, Long, Long, Long, Boolean, Boolean)

  test("BatchAppend: a replayed tag republishes, never duplicates; divergent crashed attempts are cleaned everywhere") {
    val dir = s"${tmp("graft-batchappend")}/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("vec_id", "v")
    BatchAppend.append(b0, dir, BatchAppend.tag(0))
    BatchAppend.append(b0, dir, BatchAppend.tag(0)) // redelivery
    assert(spark.read.parquet(dir).count() == 2, "replay must not duplicate")
    BatchAppend.append(Seq((3L, "c")).toDF("vec_id", "v"), dir,
      BatchAppend.tag(1))
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")), "distinct tags must union")

    // partitioned target: a crashed attempt published into a partition the
    // replay no longer writes (geometry changed while down) — the replay
    // must clean it out of EVERY partition dir, not only the ones it
    // republishes into
    val pdir = s"${tmp("graft-batchappend")}/p"
    BatchAppend.append(Seq((9L, 7)).toDF("vec_id", "cell"), pdir,
      BatchAppend.tag(0), Some("cell")) // the dead attempt: cell=7 only
    BatchAppend.append(Seq((1L, 0), (2L, 1)).toDF("vec_id", "cell"), pdir,
      BatchAppend.tag(0), Some("cell")) // the replay: cells 0 and 1
    val rows = spark.read.parquet(pdir).select($"vec_id", $"cell".cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(rows == Set((1L, 0), (2L, 1)),
      s"dead attempt's orphan partition file survived the replay: $rows")
  }

  /** The IVF monitor's exact health arithmetic, standalone (the
    * IvfAutoRetrainSpec helper). */
  private def ivfHealthOf(vecs: DataFrame,
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

  private def ivfFixture(): (String, Seq[(Long, Seq[Float])],
      Seq[(Long, Seq[Float])], Long, Long, Long, Long, Long) = {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-durable-ivf")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 4 === 0)), path)
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val centers0 = Similarity.loadIvfIndex(spark, path).centers
    val (n1, s1) = ivfHealthOf(healthy.toDF("vec_id", "embedding"), centers0)
    val (n2, s2) = ivfHealthOf(drifted.toDF("vec_id", "embedding"), centers0)
    val healthyMean = s1 / n1
    val cumulativeMean = (s1 + s2) / (n1 + n2)
    assert(cumulativeMean < healthyMean - 4, "fixture lost its drift injury")
    (path, healthy, drifted, n1, n2, healthyMean, cumulativeMean,
      (healthyMean + cumulativeMean) / 2)
  }

  test("IVF loop: a restart re-seeds fence + totals + counter; the replayed batch appends nothing; the alarm sequence continues exactly") {
    val (path, healthy, drifted, n1, n2, healthyMean, cumulativeMean, floor) =
      ivfFixture()
    val stateDir = Some(s"${tmp("graft-durable-ivf-state")}/monitor")
    val rows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    def sink(df: DataFrame, @annotation.unused id: Long): Unit =
      rows ++= df.as[MonitorRow].collect()

    val m1 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    AnnStream.processIngestBatch(m1,
      healthy.toDF("vec_id", "embedding"), 0L)(sink)
    assert(rows.last == ((0L, n1, n1, healthyMean, false, false)))

    // CRASH: the process dies after the fold persisted but before the
    // checkpoint committed — the next incarnation is a FRESH monitor
    // seeded from stateDir, and the engine redelivers batch 0
    val m2 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    assert(m2.lastFoldedBatch == 0L, "fence must survive the restart")
    assert(m2.totalVecs == n1 && m2.weightedMeanMicros.contains(healthyMean),
      "health totals must survive a restart with unchanged geometry")
    val corpusBefore = spark.read.parquet(s"$path/corpus").count()
    AnnStream.processIngestBatch(m2,
      healthy.toDF("vec_id", "embedding"), 0L)(sink)
    assert(spark.read.parquet(s"$path/corpus").count() == corpusBefore,
      "restart-replayed batch was appended twice")
    assert(rows.last == ((0L, 0L, n1, healthyMean, false, false)),
      s"replay row must re-emit the folded state: ${rows.last}")

    // the drift batch now crosses the floor EXACTLY as an uninterrupted
    // run would — the cumulative mean spans the restart
    AnnStream.processIngestBatch(m2,
      drifted.toDF("vec_id", "embedding"), 1L)(sink)
    assert(rows.last == ((1L, n2, n1 + n2, cumulativeMean, true, true)),
      s"alarm continuity broken across the restart: ${rows.last}")
    assert(m2.retrains == 1L && m2.totalVecs == 0L)

    // a second restart lands AFTER the retrain: counter + fence + the
    // reset totals all come back; no vec_id was ever doubled
    val m3 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    assert(m3.lastFoldedBatch == 1L && m3.retrains == 1L && m3.totalVecs == 0L)
    val corpus = spark.read.parquet(s"$path/corpus")
    assert(corpus.count() ==
      corpus.select($"vec_id").distinct().count(), "duplicated vec_ids")
  }

  test("IVF loop: crash after the append, before the fold persisted — the fenceless replay republishes, never duplicates") {
    val (path, healthy, _, n1, _, healthyMean, _, floor) = ivfFixture()
    val stateDir = Some(s"${tmp("graft-durable-ivf-state2")}/monitor")
    val m1 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    val base = spark.read.parquet(s"$path/corpus").count()
    // the dead attempt got through the append only — no fold, no state
    m1.appendBatch(healthy.toDF("vec_id", "embedding"), BatchAppend.tag(0))
    assert(spark.read.parquet(s"$path/corpus").count() == base + n1)

    // restart: the state dir is empty, so the fence is fresh and the
    // engine's redelivery of batch 0 runs the FULL body — the append must
    // land exactly one copy (BatchAppend republish), the fold exactly once
    val m2 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    assert(m2.lastFoldedBatch == -1L)
    val rows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    AnnStream.processIngestBatch(m2,
      healthy.toDF("vec_id", "embedding"), 0L) { (df, _) =>
      rows ++= df.as[MonitorRow].collect()
    }
    val corpus = spark.read.parquet(s"$path/corpus")
    assert(corpus.count() == base + n1,
      "fenceless replay duplicated the dead attempt's append")
    assert(corpus.count() == corpus.select($"vec_id").distinct().count())
    assert(rows.last == ((0L, n1, n1, healthyMean, false, false)))
  }

  test("IVF loop: a checkpoint reset with surviving monitor state fails loudly instead of silently fencing every batch") {
    val (path, healthy, _, n1, _, healthyMean, _, floor) = ivfFixture()
    val stateDir = Some(s"${tmp("graft-durable-ivf-state3")}/monitor")
    val rows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    def sink(df: DataFrame, @annotation.unused id: Long): Unit =
      rows ++= df.as[MonitorRow].collect()
    val m1 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    AnnStream.processIngestBatch(m1,
      healthy.toDF("vec_id", "embedding"), 5L)(sink) // fence now 5

    // operator resets the query checkpoint but keeps the stateDir: the
    // fresh incarnation's first delivered id restarts at 0 — silently
    // fencing would skip appends for 5 batches with healthy-looking rows;
    // the monitor must fail loudly instead
    val m2 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    val e = intercept[IllegalArgumentException] {
      AnnStream.processIngestBatch(m2,
        healthy.toDF("vec_id", "embedding"), 0L)(sink)
    }
    assert(e.getMessage.contains("checkpoint was reset"), e.getMessage)

    // the LEGITIMATE restart replay — redelivery of the fence itself —
    // still re-emits benignly on a fresh incarnation
    val m3 = AnnStream.prepareRetrainMonitor(spark, path, floor,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    AnnStream.processIngestBatch(m3,
      healthy.toDF("vec_id", "embedding"), 5L)(sink)
    assert(rows.last == ((5L, 0L, n1, healthyMean, false, false)),
      s"fence redelivery must re-emit, not fail: ${rows.last}")
  }

  /** The PQ monitor's exact health arithmetic, standalone (the
    * PqAutoRetrainSpec helper). */
  private def pqHealthOf(vecs: DataFrame, model: Pq.PqModel): (Long, Long) = {
    val r = vecs
      .select(posexplode(graft.functions.VectorExpressions
        .pqReconErrs($"embedding", model.codebooks)).as(Seq("subspace", "err")))
      .select(graft.util.Cols.micros6($"err").as("err_micros"))
      .agg(count(lit(1)), coalesce(sum($"err_micros"), lit(0L))).head()
    (r.getLong(0) / model.numSubspaces, r.getLong(1))
  }

  test("PQ loop: restart continuity — fence, totals, counter; raw and codes never double across the crash matrix") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-durable-pq")
    val corpus = emb.filter($"vec_id" % 4 === 0)
    Pq.writePqIndex(corpus, Pq.train(corpus), path)
    corpus.write.mode("overwrite").parquet(s"$path/raw")
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val model0 = Pq.loadPqModel(spark, path)
    val (n1, s1) = pqHealthOf(healthy.toDF("vec_id", "embedding"), model0)
    val (n2, s2) = pqHealthOf(drifted.toDF("vec_id", "embedding"), model0)
    val healthyMean = s1 / n1
    val cumulativeMean = (s1 + s2) / (n1 + n2)
    assert(cumulativeMean > healthyMean + 4, "fixture lost its drift injury")
    val ceiling = (healthyMean + cumulativeMean) / 2
    val stateDir = Some(s"${tmp("graft-durable-pq-state")}/monitor")
    val rows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    def sink(df: DataFrame, @annotation.unused id: Long): Unit =
      rows ++= df.as[MonitorRow].collect()

    val m1 = AnnStream.preparePqRetrainMonitor(spark, path, ceiling,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    AnnStream.processPqIngestBatch(m1,
      healthy.toDF("vec_id", "embedding"), 0L)(sink)
    assert(rows.last == ((0L, n1, n1, healthyMean, false, false)))
    // crash BETWEEN the append and the fold of batch 1: the dead attempt
    // published raw+codes but persisted nothing
    m1.appendBatch(drifted.toDF("vec_id", "embedding"), BatchAppend.tag(1))

    // restart: fence is at batch 0, totals restored; the engine redelivers
    // batch 1 and the full body runs — appends republish, fold runs once,
    // and the cumulative mean crosses the ceiling exactly as uninterrupted
    val m2 = AnnStream.preparePqRetrainMonitor(spark, path, ceiling,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    assert(m2.lastFoldedBatch == 0L && m2.totalVecs == n1)
    assert(m2.meanErrMicros.contains(healthyMean))
    AnnStream.processPqIngestBatch(m2,
      drifted.toDF("vec_id", "embedding"), 1L)(sink)
    assert(rows.last == ((1L, n2, n1 + n2, cumulativeMean, true, true)),
      s"alarm continuity broken across the restart: ${rows.last}")
    assert(m2.retrains == 1L && m2.totalVecs == 0L)

    // the retrained index covers corpus + both batches exactly once each
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.count() == corpus.count() + n1 + n2,
      "codes must cover the corpus and both batches exactly once")
    assert(codes.select($"vec_id").distinct().count() == codes.count())
    val raw = spark.read.parquet(s"$path/raw")
    assert(raw.count() == corpus.count() + n1 + n2)
    assert(raw.select($"vec_id").distinct().count() == raw.count())

    // third incarnation: post-retrain state restored
    val m3 = AnnStream.preparePqRetrainMonitor(spark, path, ceiling,
      minVecsForAlarm = n1 + 1, stateDir = stateDir)
    assert(m3.lastFoldedBatch == 1L && m3.retrains == 1L && m3.totalVecs == 0L)
  }

  test("composed IVF×PQ loop: restart continuity — fence, BOTH signals' totals, counter; raw and codes never double") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-durable-ivfpq")
    val corpus = emb.filter($"vec_id" % 4 === 0)
    val index = Similarity.buildIvfIndex(corpus)
    val model = Pq.train(corpus)
    Pq.writeIvfPqIndex(index.bucketed, model, index.centers, path)
    corpus.write.mode("overwrite").parquet(s"$path/raw")
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (cn1, cs1) = ivfHealthOf(healthy.toDF("vec_id", "embedding"),
      index.centers)
    val (_, cs2) = ivfHealthOf(drifted.toDF("vec_id", "embedding"),
      index.centers)
    val (en1, es1) = pqHealthOf(healthy.toDF("vec_id", "embedding"), model)
    val (en2, es2) = pqHealthOf(drifted.toDF("vec_id", "embedding"), model)
    val errHealthy = es1 / en1
    val errCumulative = (es1 + es2) / (en1 + en2)
    assert(errCumulative > errHealthy + 4, "fixture lost its drift injury")
    val ceiling = (errHealthy + errCumulative) / 2
    val floor = -2000000L // non-binding: this run exercises the err direction
    val stateDir = Some(s"${tmp("graft-durable-ivfpq-state")}/monitor")
    val rows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    def sink(df: DataFrame, @annotation.unused id: Long): Unit =
      rows ++= df.as[MonitorRow].collect()

    val m1 = AnnStream.prepareIvfPqRetrainMonitor(spark, path, floor,
      ceiling, minVecsForAlarm = cn1 + 1, stateDir = stateDir)
    AnnStream.processIvfPqIngestBatch(m1,
      healthy.toDF("vec_id", "embedding"), 0L)(sink)
    val margin1 = math.min(cs1 / cn1 - floor, ceiling - errHealthy)
    assert(rows.last == ((0L, cn1, cn1, margin1, false, false)))
    // crash BETWEEN the append and the fold of batch 1: the dead attempt
    // published raw + composed codes but persisted nothing
    m1.appendBatch(drifted.toDF("vec_id", "embedding"), BatchAppend.tag(1))

    // restart: fence at batch 0, BOTH signals' totals restored; the
    // engine's redelivery of batch 1 republishes (never duplicates) and
    // the cumulative margin crosses exactly as an uninterrupted run would
    val m2 = AnnStream.prepareIvfPqRetrainMonitor(spark, path, floor,
      ceiling, minVecsForAlarm = cn1 + 1, stateDir = stateDir)
    assert(m2.lastFoldedBatch == 0L && m2.totalVecs == cn1)
    assert(m2.weightedMeanMicros.contains(cs1 / cn1) &&
      m2.meanErrMicros.contains(errHealthy),
      "both signals' totals must survive a restart with unchanged geometry")
    AnnStream.processIvfPqIngestBatch(m2,
      drifted.toDF("vec_id", "embedding"), 1L)(sink)
    val margin2 = math.min((cs1 + cs2) / (cn1 + en2) - floor,
      ceiling - errCumulative)
    assert(rows.last == ((1L, en2, cn1 + en2, margin2, true, true)),
      s"alarm continuity broken across the restart: ${rows.last}")
    assert(m2.retrains == 1L && m2.totalVecs == 0L)

    // the retrained index covers corpus + both batches exactly once each
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.count() == corpus.count() + cn1 + en2,
      "codes must cover the corpus and both batches exactly once")
    assert(codes.select($"vec_id").distinct().count() == codes.count())
    val raw = spark.read.parquet(s"$path/raw")
    assert(raw.count() == corpus.count() + cn1 + en2)
    assert(raw.select($"vec_id").distinct().count() == raw.count())

    // third incarnation: post-retrain state restored
    val m3 = AnnStream.prepareIvfPqRetrainMonitor(spark, path, floor,
      ceiling, minVecsForAlarm = cn1 + 1, stateDir = stateDir)
    assert(m3.lastFoldedBatch == 1L && m3.retrains == 1L && m3.totalVecs == 0L)
  }

  test("residual composed loop: the inherited durability holds through the subclass — fence, totals, no double residual codes across the crash window") {
    // the subclass overrides encode/signal/response only; this row pins
    // that the INHERITED persistence actually covers it end to end (the
    // crash-between-append-and-fold window publishes RESIDUAL codes, and
    // the fenceless replay must republish those, not duplicate them)
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-durable-ivfpq-res")
    val corpus = emb.filter($"vec_id" % 4 === 0)
    val index = Similarity.buildIvfIndex(corpus)
    val model = Pq.trainResidual(index)
    Pq.writeIvfPqResidualIndex(index, model, path)
    corpus.write.mode("overwrite").parquet(s"$path/raw")
    val healthy = emb.filter($"vec_id" % 4 === 1)
      .as[(Long, Seq[Float])].collect().toSeq
    val drifted = emb.filter($"vec_id" % 4 === 2)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    def resErrOf(vecs: DataFrame): (Long, Long) = {
      val r = vecs
        .select($"embedding", graft.functions.VectorExpressions
          .nearestCenter($"embedding", index.centers).as("cell"))
        .select(org.apache.spark.sql.functions.posexplode(
          graft.functions.VectorExpressions.pqResidualReconErrs(
            $"embedding", $"cell", index.centers, model.codebooks))
          .as(Seq("subspace", "err")))
        .select(graft.util.Cols.micros6($"err").as("err_micros"))
        .agg(count(lit(1)), coalesce(sum($"err_micros"), lit(0L))).head()
      (r.getLong(0) / model.numSubspaces, r.getLong(1))
    }
    val (n1, es1) = resErrOf(healthy.toDF("vec_id", "embedding"))
    val (n2, es2) = resErrOf(drifted.toDF("vec_id", "embedding"))
    val errHealthy = es1 / n1
    val errCumulative = (es1 + es2) / (n1 + n2)
    assert(errCumulative > errHealthy + 4, "fixture lost its drift injury")
    val ceiling = (errHealthy + errCumulative) / 2
    val floor = -2000000L
    val stateDir = Some(s"${tmp("graft-durable-ivfpq-res-state")}/monitor")
    val rows = scala.collection.mutable.ArrayBuffer[MonitorRow]()
    def sink(df: DataFrame, @annotation.unused id: Long): Unit =
      rows ++= df.as[MonitorRow].collect()

    val m1 = AnnStream.prepareIvfPqResidualRetrainMonitor(spark, path,
      floor, ceiling, minVecsForAlarm = n1 + 1, stateDir = stateDir)
    AnnStream.processIvfPqIngestBatch(m1,
      healthy.toDF("vec_id", "embedding"), 0L)(sink)
    assert(!rows.last._5 && rows.last._3 == n1)
    // crash BETWEEN the append and the fold of batch 1
    m1.appendBatch(drifted.toDF("vec_id", "embedding"), BatchAppend.tag(1))

    // restart into a FRESH residual monitor: fence + totals re-seeded,
    // redelivery republishes the dead attempt's raw + residual codes
    val m2 = AnnStream.prepareIvfPqResidualRetrainMonitor(spark, path,
      floor, ceiling, minVecsForAlarm = n1 + 1, stateDir = stateDir)
    assert(m2.lastFoldedBatch == 0L && m2.totalVecs == n1)
    assert(m2.meanErrMicros.contains(errHealthy),
      "residual signal totals must survive the restart")
    AnnStream.processIvfPqIngestBatch(m2,
      drifted.toDF("vec_id", "embedding"), 1L)(sink)
    assert(rows.last._5 && rows.last._6,
      s"alarm continuity broken across the restart: ${rows.last}")
    assert(m2.retrains == 1L && m2.totalVecs == 0L)
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.count() == corpus.count() + n1 + n2,
      "codes must cover the corpus and both batches exactly once")
    assert(codes.select($"vec_id").distinct().count() == codes.count())
    val raw = spark.read.parquet(s"$path/raw")
    assert(raw.count() == corpus.count() + n1 + n2)
    assert(raw.select($"vec_id").distinct().count() == raw.count())
  }
}

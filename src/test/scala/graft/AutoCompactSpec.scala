package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.AnnStream
import graft.util.{BatchAppend, Compaction}

/** AUTO-compaction — the fragmentation half of the drift-monitor ops loop
  * (round 15): the ingest loops watch their standing directories' file
  * counts per trigger and fire [[Compaction.compactDir]] from the
  * driver-sequenced maintenance slot when the ceiling is crossed, with the
  * safe batch fence derived from the monitor's own durability mode. This
  * suite pins the lifecycle: ceiling → rewrite → probe parity, the fence
  * split (durable fold ⇒ the folded batch compacts; in-memory fence ⇒ it
  * carries verbatim), and the persisted ops counter. */
class AutoCompactSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def copyDir(src: String, dst: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(conf)
    require(org.apache.hadoop.fs.FileUtil.copy(fs, p,
      fs, new org.apache.hadoop.fs.Path(dst), false, conf))
  }

  private def taggedLeaves(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(d: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(d).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (n.matches("^b\\d{19}-.*")) Seq(n) else Nil
      }
    walk(p)
  }

  private def probeOf(path: String): Seq[Seq[Any]] = {
    val queries = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 8 === 7).limit(5)
      .select($"vec_id", $"embedding")
    Similarity.queryStandingIvf(
        Similarity.prepareIvfIndex(spark, path), queries)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
  }

  test("durable monitor: ceiling → automatic rewrite in the ingest slot; the persisted fence lets the folded batch compact; probes and counter hold") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-autocompact-ivf")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 8 === 0)), path)
    // the UNCOMPACTED twin: identical centers (a byte copy), identical
    // batches appended WITHOUT the fragmentation watch — probe parity
    // against it is the rows-preserved claim
    val twin = s"${tmp("graft-autocompact-twin")}/index"
    copyDir(path, twin)
    val stateDir = tmp("graft-autocompact-state")
    // ceiling at the compacted floor (one file per cell): every appending
    // trigger crosses it, so the watch fires — and re-fires — under load
    val limit = 16L
    val monitor = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue, stateDir = Some(stateDir),
      autoCompactMaxFiles = Some(limit))
    val plain = AnnStream.prepareRetrainMonitor(spark, twin,
      healthFloorMicros = Long.MinValue)
    (0 to 2).foreach { b =>
      val batch = emb.filter($"vec_id" % 8 === b + 1)
      AnnStream.processIngestBatch(monitor, batch, b.toLong) { (r, _) =>
        val _ = r.count()
      }
      AnnStream.processIngestBatch(plain, batch, b.toLong) { (r, _) =>
        val _ = r.count()
      }
    }
    assert(monitor.compactions >= 1L, "fragmentation ceiling never fired")
    assert(plain.compactions == 0L)
    // the DURABLE fence (state persisted with each fold) means even the
    // just-folded batch can never replay unfenced — so nothing rides
    // above the fence and the layout holds at its compacted floor while
    // the un-watched twin keeps accruing per-batch fragments
    assert(taggedLeaves(s"$path/corpus").isEmpty,
      "durably-fenced batches should have compacted, not carried")
    assert(Compaction.dataFileCount(spark, s"$path/corpus") <
      Compaction.dataFileCount(spark, s"$twin/corpus"))
    // rows preserved: the compacted index serves the exact rows the
    // uncompacted twin serves
    assert(probeOf(path) == probeOf(twin),
      "probe through the auto-compacted layout diverged")
    // the ops counter is persisted state: a crash-restarted monitor
    // continues the count (the retrain-counter contract)
    val restarted = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue, stateDir = Some(stateDir),
      autoCompactMaxFiles = Some(limit))
    assert(restarted.compactions == monitor.compactions)
    assert(restarted.lastFoldedBatch == 2L)
  }

  test("auto-compaction ABSORBS standing tombstones in the rewrite it fires anyway: retracted rows drop physically, tombstones keep standing, probes unchanged") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .filter($"embedding".isNotNull)
    val path = tmp("graft-autocompact-absorb")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 8 === 0)), path)
    // the NEVER-JUNKED reference twin: identical centers (byte copy),
    // receives only the real batch — the post-absorb probe must equal it
    val twin = s"${tmp("graft-autocompact-absorb-twin")}/index"
    copyDir(path, twin)
    val stateDir = tmp("graft-autocompact-absorb-state")
    val monitor = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue, stateDir = Some(stateDir),
      autoCompactMaxFiles = Some(16L))
    // batch 0: junk vectors (disjoint ids) ingested, then RETRACTED —
    // fold-only, no rewrite
    val junk = emb.filter($"vec_id" % 8 === 1)
      .select(($"vec_id" + 5000000L).as("vec_id"), $"embedding")
    AnnStream.processIngestBatch(monitor, junk, 0L) { (r, _) =>
      val _ = r.count()
    }
    Similarity.deleteFromIvfIndex(junk.select($"vec_id"), path)
    def junkRows(): Long = spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" >= 5000000L).count()
    assert(junkRows() > 0L, "fixture degenerate: junk never landed")
    // batch 1 (real data, both indexes) crosses the ceiling → the watch's
    // rewrite runs with the anti-join transform: the retracted rows drop
    // DURING the compaction the loop was going to do anyway (the durable
    // fence covers batch 1 too, so nothing carries and the absorption is
    // complete)
    val real = emb.filter($"vec_id" % 8 === 2)
    AnnStream.processIngestBatch(monitor, real, 1L) { (r, _) =>
      val _ = r.count()
    }
    Similarity.appendToIvfIndex(real, twin)
    assert(monitor.compactions >= 1L, "fragmentation ceiling never fired")
    assert(junkRows() == 0L,
      "the maintenance-slot rewrite did not absorb the retracted rows")
    // NO retirement in the auto path: targets compact independently, so
    // only the explicit all-media absorbs may retire — the standing
    // tombstones keep masking whatever a sibling medium might still hold
    assert(graft.util.Tombstones.exists(spark, path),
      "auto-compaction must not retire tombstones")
    assert(probeOf(path) == probeOf(twin),
      "post-absorb probe diverged from the never-junked twin")
  }

  test("in-memory monitor: the folded batch is still replayable after a crash — its tagged files ride through the rewrite verbatim") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-autocompact-mem")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 8 === 0)), path)
    // fragment the base so the rewrite has eligible (untagged) files to
    // reduce even with the batch's own files carried
    Similarity.appendToIvfIndex(emb.filter($"vec_id" % 8 === 1), path)
    Similarity.appendToIvfIndex(emb.filter($"vec_id" % 8 === 2), path)
    val twin = s"${tmp("graft-autocompact-mem-twin")}/index"
    copyDir(path, twin)
    val before = Compaction.dataFileCount(spark, s"$path/corpus")
    val monitor = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue,
      autoCompactMaxFiles = Some(before)) // next append crosses
    val plain = AnnStream.prepareRetrainMonitor(spark, twin,
      healthFloorMicros = Long.MinValue)
    val batch = emb.filter($"vec_id" % 8 === 3)
    AnnStream.processIngestBatch(monitor, batch, 0L) { (r, _) =>
      val _ = r.count()
    }
    AnnStream.processIngestBatch(plain, batch, 0L) { (r, _) =>
      val _ = r.count()
    }
    assert(monitor.compactions == 1L)
    assert(Compaction.dataFileCount(spark, s"$path/corpus") < before)
    // fence = lastFolded - 1 without a stateDir: batch 0's files are still
    // replayable after a crash (nothing durable fenced them), so the
    // rewrite must have carried every one of them under its tag
    val carried = taggedLeaves(s"$path/corpus")
    val tag0 = BatchAppend.tag(0L)
    assert(carried.nonEmpty && carried.forall(_.startsWith(s"$tag0-")),
      s"replayable batch files missing or foreign: $carried")
    assert(probeOf(path) == probeOf(twin))
    // and the carried files really do replay cleanly: redeliver batch 0 —
    // the tagged protocol republishes over the carried files, no dupes
    AnnStream.processIngestBatch(monitor, batch, 0L) { (r, _) =>
      val _ = r.count()
    }
    val appended = spark.read.parquet(s"$path/corpus")
      .filter($"vec_id" % 8 === 3).select($"vec_id")
    assert(appended.count() == appended.distinct().count())
    assert(probeOf(path) == probeOf(twin))
  }

  test("tombstone pressure: a DELETES-ONLY stream triggers the all-media absorb below the fragmentation ceiling, retires the medium, and the counter persists") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-autocompact-ts")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 2 === 0)), path)
    val stateDir = tmp("graft-autocompact-ts-state")
    // NO fragmentation ceiling: the pressure bound must fire on its own
    val monitor = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue, stateDir = Some(stateDir),
      autoCompactMaxTombstones = Some(2L))
    val deadIds = Seq(0L, 2L, 4L)
    // three separate takedowns: three tombstone data files — past the bound
    deadIds.foreach { id =>
      Similarity.deleteFromIvfIndex(
        spark.createDataFrame(Seq(Tuple1(id))).toDF("vec_id"), path)
    }
    assert(graft.util.Tombstones.dataFiles(spark, path).size >= 3)
    // the stream carries NO vectors — only the maintenance slot runs
    val emptyBatch = emb.filter($"vec_id" < 0)
    AnnStream.processIngestBatch(monitor, emptyBatch, 0L) { (r, _) =>
      val _ = r.count()
    }
    assert(monitor.compactions == 1L,
      "tombstone pressure must fire the maintenance slot")
    assert(!graft.util.Tombstones.exists(spark, path),
      "carry-free all-media absorb must retire the tombstones")
    assert(spark.read.parquet(s"$path/corpus")
      .filter($"vec_id".isin(deadIds: _*)).count() == 0L,
      "absorb must drop the retracted rows physically")
    // the probe serves the retained corpus with a clean (no-anti-join)
    // hot path, and the next slot has no pressure to respond to
    assert(probeOf(path).nonEmpty)
    AnnStream.processIngestBatch(monitor, emptyBatch, 1L) { (r, _) =>
      val _ = r.count()
    }
    assert(monitor.compactions == 1L, "no pressure, no rewrite")
    // the ops counter persisted with the fold fence (crash-restart seed)
    val seeded = AnnStream.prepareRetrainMonitor(spark, path,
      healthFloorMicros = Long.MinValue, stateDir = Some(stateDir),
      autoCompactMaxTombstones = Some(2L))
    assert(seeded.compactions == 1L)
  }
}

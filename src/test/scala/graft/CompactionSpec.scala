package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables
import graft.util.{BatchAppend, Compaction}

/** Small-file compaction of standing indexes ([[graft.util.Compaction]]):
  * rows and probe results are invariant, file counts drop, the swap is the
  * shared staged protocol, and the `safeBatchFence` carry-through keeps
  * [[BatchAppend]]'s replay idempotency alive for batches that can still
  * redeliver. The hash-checked layout proof is the registered
  * `ivf_pq_topk_compacted` entry; this suite pins the mechanics. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def leafFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.startsWith(".") || f.getName.startsWith("_")) Nil
      else Seq(f)
    walk(new java.io.File(dir))
  }

  test("flat dir: many appended batches compact to ceil(bytes/target) files; rows are untouched") {
    val root = tmp("graft-compact-flat")
    (0 until 6).foreach { b =>
      BatchAppend.append(
        (0 until 100).map(i => (b * 100L + i, s"v$b-$i")).toDF("id", "v"),
        s"$root/t", BatchAppend.tag(b.toLong))
    }
    val before = spark.read.parquet(s"$root/t").as[(Long, String)]
      .collect().toSet
    val filesBefore = leafFiles(s"$root/t").size
    assert(filesBefore >= 6, s"fixture not fragmented: $filesBefore files")

    val stats = Compaction.compactDir(spark, root, "t")
    assert(stats.filesBefore == filesBefore && stats.filesAfter == 1L,
      s"tiny corpus must compact to one file: $stats")
    assert(stats.rows == 600L && stats.carriedFiles == 0L)
    val after = spark.read.parquet(s"$root/t").as[(Long, String)]
      .collect().toSet
    assert(after == before, "compaction changed the data")
    assert(leafFiles(s"$root/t").size == 1)
  }

  test("partitioned dir: one file per cell, pruning layout preserved, probe parity through an already-prepared handle") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-compact-ivf")
    // fragment the corpus the way ingest does: build on a quarter, append
    // three more frozen-center batches
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb.filter($"vec_id" % 4 === 0)), path)
    (1 to 3).foreach { r =>
      Similarity.appendToIvfIndex(emb.filter($"vec_id" % 4 === r), path)
    }
    val standing = Similarity.prepareIvfIndex(spark, path)
    val queries = emb.filter($"vec_id" < 4)
    val preProbe = Similarity.queryStandingIvf(standing, queries)
      .as[(Long, Long, Double, Long)].collect().toSet
    val preRows = spark.read.parquet(s"$path/corpus")
      .select($"vec_id", $"cell".cast("int")).as[(Long, Int)].collect().toSet
    val cellDirs = new java.io.File(s"$path/corpus").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))

    val stats = Compaction.compactDir(spark, path, "corpus",
      partitionCol = Some("cell"))
    assert(stats.filesAfter == cellDirs.toLong,
      s"expected one file per cell ($cellDirs), got $stats")
    assert(stats.filesAfter < stats.filesBefore)
    val postRows = spark.read.parquet(s"$path/corpus")
      .select($"vec_id", $"cell".cast("int")).as[(Long, Int)].collect().toSet
    assert(postRows == preRows,
      "compaction changed rows or cell assignments")
    // the handle prepared BEFORE the compaction keeps serving: it re-lists
    // its probed cell directories per call, and the swap kept the paths
    val postProbe = Similarity.queryStandingIvf(standing, queries)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(postProbe == preProbe, "probe results changed across compaction")
  }

  test("safeBatchFence: above-fence batches carry through verbatim and stay replay-safe; at-or-below-fence batches compact") {
    val root = tmp("graft-compact-fence")
    (0 until 4).foreach { b =>
      BatchAppend.append(
        (0 until 50).map(i => (b * 50L + i, b)).toDF("id", "b"),
        s"$root/t", BatchAppend.tag(b.toLong))
    }
    val before = spark.read.parquet(s"$root/t").as[(Long, Int)]
      .collect().toSet

    // batches 3 is still replayable (its fold never committed) — fence at 2
    val stats = Compaction.compactDir(spark, root, "t",
      safeBatchFence = Some(2L))
    assert(stats.carriedFiles >= 1L, s"no files carried: $stats")
    assert(stats.rows == 150L, s"only batches 0..2 should compact: $stats")
    val carried = leafFiles(s"$root/t")
      .filter(_.getName.startsWith(s"${BatchAppend.tag(3L)}-"))
    assert(carried.nonEmpty, "above-fence batch lost its tagged file names")
    assert(spark.read.parquet(s"$root/t").as[(Long, Int)].collect().toSet ==
      before, "fenced compaction changed the data")

    // the engine now redelivers batch 3 (fenceless — crash before its fold
    // persisted): BatchAppend's CLEAN still finds the tagged files and the
    // republish lands exactly one copy
    BatchAppend.append(
      (0 until 50).map(i => (3 * 50L + i, 3)).toDF("id", "b"),
      s"$root/t", BatchAppend.tag(3L))
    val after = spark.read.parquet(s"$root/t").as[(Long, Int)].collect()
    assert(after.length == 200 && after.toSet == before,
      "replay of the carried batch duplicated rows")

    // a batch at the fence compacts — by contract its redelivery is fenced
    // upstream (the durable monitor skips side effects at or below
    // lastFoldedBatch), so its tags may be absorbed
    assert(!leafFiles(s"$root/t")
      .exists(_.getName.startsWith(s"${BatchAppend.tag(2L)}-")),
      "at-fence batch should have been absorbed by the rewrite")
  }

  test("bucketed index table: compaction lands one file per bucket, probe pairs and graft properties survive") {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val corpusAll = docs.filter($"doc_id" % 10 =!= 0)
    // fragment the index the way ingest does: build on half, append the
    // other half in three verified batches
    Dedup.writeBandIndex(corpusAll.filter($"doc_id" % 2 === 1),
      "band_idx_compact", buckets = 4)
    (0 until 3).foreach { r =>
      Dedup.appendToBandIndex(
        corpusAll.filter($"doc_id" % 2 === 0 && $"doc_id" % 3 === r),
        "band_idx_compact")
    }
    def loc(): String = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("band_idx_compact")).location.getPath
    def files(): Int = leafFiles(loc()).size
    val filesBefore = files()
    assert(filesBefore > 4, s"fixture not fragmented: $filesBefore files")
    val rowsBefore = spark.table("band_idx_compact").count()
    val pairsBefore = Dedup
      .incrementalNearDupIndexed(corpusAll, "band_idx_compact", batch)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairsBefore.nonEmpty)
    // mark the table the way the hash index records its geometry — the
    // property must ride the compaction swap
    spark.sql("ALTER TABLE band_idx_compact SET TBLPROPERTIES " +
      "('graft.testProp'='42')")

    Dedup.compactIndexTable(spark, "band_idx_compact")
    assert(files() == 4,
      s"expected one file per bucket after compaction, got ${files()}")
    assert(spark.table("band_idx_compact").count() == rowsBefore)
    val pairsAfter = Dedup
      .incrementalNearDupIndexed(corpusAll, "band_idx_compact", batch)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairsAfter == pairsBefore, "probe pairs changed across compaction")
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("band_idx_compact"))
    assert(meta.properties.get("graft.testProp").contains("42"),
      "graft.* table property lost in the compaction swap")
    assert(meta.bucketSpec.exists(s =>
      s.numBuckets == 4 && s.bucketColumnNames == Seq("band", "bsig")),
      "bucket spec changed across compaction")
    // a second compaction ping-pongs back without nesting locations
    val locBefore = loc()
    Dedup.compactIndexTable(spark, "band_idx_compact")
    assert(loc() != locBefore && files() == 4)
    assert(!loc().endsWith("_swapa_swapb") && !loc().endsWith("_swapb_swapa"))
  }

  test("maintenance-slot sequencing: a batch appended between compactions lands intact and the next fence-aware compaction absorbs it") {
    // the concurrency contract: appends are DRIVER-SEQUENCED around
    // compactions (the same maintenance slot retrains run in), so the
    // supported interleave is append → compact → append → compact — each
    // step must preserve all rows and the replay-safety of whatever is
    // still above the fence
    val root = tmp("graft-compact-seq")
    (0 until 3).foreach { b =>
      BatchAppend.append(
        (0 until 50).map(i => (b * 50L + i, b)).toDF("id", "b"),
        s"$root/t", BatchAppend.tag(b.toLong))
    }
    val s1 = Compaction.compactDir(spark, root, "t",
      safeBatchFence = Some(1L)) // batch 2 still replayable: carried
    assert(s1.carriedFiles >= 1L && s1.rows == 100L, s1.toString)
    // the next trigger's append lands on the compacted layout
    BatchAppend.append(
      (0 until 50).map(i => (3 * 50L + i, 3)).toDF("id", "b"),
      s"$root/t", BatchAppend.tag(3L))
    // and a later compaction (fence advanced) absorbs what the first
    // carried plus the new batch, still losing nothing
    val s2 = Compaction.compactDir(spark, root, "t",
      safeBatchFence = Some(3L))
    assert(s2.carriedFiles == 0L, s2.toString)
    val rows = spark.read.parquet(s"$root/t").as[(Long, Int)].collect()
    assert(rows.length == 200 && rows.map(_._1).distinct.length == 200,
      s"sequenced append/compact interleave lost or duplicated rows: " +
        s"${rows.length}")
  }

  test("no-op when everything is above the fence: stats only, no swap") {
    val root = tmp("graft-compact-noop")
    BatchAppend.append(Seq((1L, "a")).toDF("id", "v"), s"$root/t",
      BatchAppend.tag(5L))
    val filesBefore = leafFiles(s"$root/t").map(_.getName).sorted
    val stats = Compaction.compactDir(spark, root, "t",
      safeBatchFence = Some(4L))
    assert(stats.filesBefore == stats.filesAfter &&
      stats.carriedFiles == stats.filesBefore && stats.rows == 0L)
    assert(leafFiles(s"$root/t").map(_.getName).sorted == filesBefore,
      "no-op compaction must not touch the layout")
  }
}

package graft.util

import org.apache.hadoop.fs.{FileStatus, FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** SMALL-FILE COMPACTION for standing parquet indexes — the maintenance
  * complement of every append-many path in the engine: [[BatchAppend]] and
  * the plain `mode("append")` index appends land one-or-more small files
  * per micro-batch, and a long-lived serving index (IVF corpus, PQ codes,
  * IVF×PQ cells, the raw rerank tier) degrades linearly with batch count —
  * per-trigger listings grow, every probe pays a file-open per fragment,
  * and at 100 TB the NameNode/object-store metadata itself becomes the
  * bottleneck. Compaction rewrites a directory into target-sized files and
  * swaps it in place through the one staged protocol ([[IndexSwap
  * .swapDirs]]), so a crash leaves the fragmented or the compacted layout
  * intact — never a mix — and live probes cover the swap window with the
  * retry-once contract they already have ([[graft.streaming.AnnStream]]).
  * Rows are untouched: compaction is an execution-layout operation, not a
  * semantic one (CompactionSpec pins row equality and probe parity; the
  * registered `ivf_pq_topk_compacted` entry hash-checks a probe THROUGH a
  * compacted layout against the uncompacted oracle).
  *
  * CONCURRENCY contract — the same discipline every index MUTATION in
  * this engine already follows:
  *  - concurrent PROBES are fine: standing handles re-list per call and
  *    retry once across the swap window ([[graft.streaming.AnnStream]]).
  *  - concurrent APPENDS are out of contract. Compaction takes the same
  *    DRIVER-SEQUENCED maintenance slot retrains already run in — the
  *    ops loops fire `fireRetrain` INSIDE the ingest foreachBatch
  *    precisely so index mutations never race appends, and a maintenance
  *    slot exists at every trigger boundary. A rewrite that raced a live
  *    publish would need a manifest-commit layer (what table formats
  *    exist for) to avoid losing the race's files; hand-rolling that
  *    recovery was reviewed and rejected as unsound.
  *  - `safeBatchFence`: even sequenced between triggers, the LAST
  *    uncommitted batch's files are still REPLAYABLE after a later crash,
  *    and compaction erases the per-batch tags [[BatchAppend]]'s replay
  *    CLEAN step keys on — so files tagged above the fence are carried
  *    through verbatim (copied into staging; the old layout stays whole
  *    until the swap) while files at or below it, and untagged files,
  *    compact. The safe fence is the highest batch id that can no longer
  *    replay unfenced: a durable drift monitor's persisted
  *    `lastFoldedBatch` (a redelivery of that id skips all side effects
  *    before ever reaching BatchAppend), or a bare checkpoint's last
  *    COMMITTED batch id. `None` compacts every tag — correct only when
  *    nothing is replayable (no checkpointed ingest, or all committed).
  *  - ZONED layouts ([[graft.operators.ZOrder]]) must compact through
  *    [[graft.operators.ZOrder.compactZoned]], not this: renaming every
  *    data file orphans every zone row. The probe's coverage check keeps
  *    a raw compactDir CORRECT (stale zone rows drop; rewritten files
  *    read unmapped) but degrades every probe to a full scan — the
  *    zone-map rebuild belongs inside the rewrite that invalidated it. */
object Compaction {

  /** Before/after evidence of one [[compactDir]] run — the ops audit row.
    * `carriedFiles` are the above-fence files preserved verbatim. */
  final case class CompactionStats(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long, rows: Long, carriedFiles: Long)

  /** Recursive data-file listing (skips hidden/metadata names — the same
    * files Spark's own listing skips). */
  private def leaves(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Seq[FileStatus] =
    fs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith(".") || n.startsWith("_")) Nil
      else if (st.isDirectory) leaves(fs, st.getPath)
      else Seq(st)
    }

  /** Recursive data-file count of a standing directory — the fragmentation
    * health signal the auto-compacting ingest loops watch per trigger (one
    * listing, the same cost the serving probes already pay). 0 for an
    * absent directory. */
  def dataFileCount(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L else leaves(fs, p).size.toLong
  }

  /** Rewrite `root/sub` into ~`targetBytes` files and swap it in place.
    *
    *  - `partitionCol`: for a partition-directory layout (`cell=N/…`) the
    *    rewrite repartitions BY the partition column — one task and hence
    *    one file per partition value (split by `maxRecordsPerFile` when a
    *    value outgrows the target), and the directory pruning that makes
    *    the layout fast is preserved. One shuffle of the compacted bytes —
    *    the price of a deterministic layout, paid offline.
    *  - flat layouts `coalesce` to `ceil(bytes / targetBytes)` — no
    *    shuffle at all.
    *  - `safeBatchFence`: [[BatchAppend]]-tagged files with batch id above
    *    the fence are carried through VERBATIM (see the object doc).
    *  - `transform`: a row-level rewrite applied to the eligible read —
    *    the [[Tombstones]] absorption hook (drop deleted rows during the
    *    rewrite compaction was going to do anyway). Identity by default;
    *    carried files do NOT pass through it (they ride verbatim), so
    *    absorbing callers must keep masking rows that may live above the
    *    fence ([[Tombstones]]' object doc owns that contract).
    *
    * No-op (stats only, no swap) when nothing is eligible to compact. */
  def compactDir(spark: SparkSession, root: String, sub: String,
      partitionCol: Option[String] = None,
      targetBytes: Long = 128L << 20,
      safeBatchFence: Option[Long] = None,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        identity): CompactionStats = {
    val raw = new Path(s"$root/$sub")
    val fs = raw.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = fs.makeQualified(raw) // listed leaf paths come back qualified;
    // basePath and the carry-through relativization must match them
    val all = leaves(fs, dir)
    val fence = safeBatchFence.map(BatchAppend.tag)
    val (carry, eligible) = all.partition { st =>
      fence.exists(f => BatchAppend.tagOf(st.getPath.getName).exists(_ > f))
    }
    val bytesBefore = all.map(_.getLen).sum
    if (eligible.isEmpty)
      return CompactionStats(all.size.toLong, bytesBefore, all.size.toLong,
        bytesBefore, 0L, carry.size.toLong)

    val eligibleBytes = eligible.map(_.getLen).sum
    // basePath keeps the partition column alive when reading leaf files
    val read = transform(spark.read.option("basePath", dir.toString)
      .parquet(eligible.map(_.getPath.toString): _*))
    val rows = read.count()
    val avgRowBytes = math.max(1L, eligibleBytes / math.max(rows, 1L))
    val maxRecords = math.max(1L, targetBytes / avgRowBytes)
    val stagingSub = "compact_staging"
    val staged = new Path(s"$root/$stagingSub/$sub")
    fs.delete(new Path(s"$root/$stagingSub"), true)
    val writer = partitionCol match {
      case Some(c) =>
        read.repartition(col(c)).write
          .option("maxRecordsPerFile", maxRecords)
          .partitionBy(c)
      case None =>
        val nFiles = math.max(1L,
          (eligibleBytes + targetBytes - 1L) / targetBytes).toInt
        read.coalesce(nFiles).write
          .option("maxRecordsPerFile", maxRecords)
    }
    writer.mode("overwrite").parquet(staged.toString)
    def relOf(p: Path): String =
      p.toString.stripPrefix(dir.toString).stripPrefix("/")
    // above-fence files ride into staging as COPIES: the live layout stays
    // whole until the swap, and the staged one is complete before it
    carry.foreach { st =>
      val dst = new Path(staged, relOf(st.getPath))
      fs.mkdirs(dst.getParent)
      require(FileUtil.copy(fs, st.getPath, fs, dst, false, true,
        spark.sessionState.newHadoopConf()),
        s"compaction: carry-through copy ${st.getPath} -> $dst failed")
    }

    // the ONE staged swap protocol — short-circuiting two-rename with the
    // crash contract every rebuildable index shares (old or new always
    // intact, recovery copies named in the failure message). Appends are
    // sequenced out by the concurrency contract above, so no file can
    // land in the live dir between the listing and this swap.
    IndexSwap.swapDirs(spark, root, stagingSub, Seq(sub))
    val after = leaves(fs, dir)
    CompactionStats(all.size.toLong, bytesBefore, after.size.toLong,
      after.map(_.getLen).sum, rows, carry.size.toLong)
  }
}

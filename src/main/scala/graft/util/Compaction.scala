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
  * CONCURRENT-INGEST contract, two halves:
  *  - `safeBatchFence`: compaction erases the per-batch file tags
  *    [[BatchAppend]]'s replay CLEAN step keys on, so a batch that is
  *    still REPLAYABLE must not be absorbed. Files tagged above the fence
  *    are carried through verbatim (copied into staging, so the old
  *    layout stays whole until the swap); files at or below it — and
  *    untagged files — compact. The safe fence is the highest batch id
  *    that can no longer replay unfenced: with a durable drift monitor
  *    that is its persisted `lastFoldedBatch` (a redelivery of that id
  *    skips all side effects before ever reaching BatchAppend); with a
  *    bare checkpoint it is the last COMMITTED batch id.
  *  - LATE ARRIVALS: the rewrite takes many micro-batch intervals, so
  *    batches published after compaction's listing snapshot exist only in
  *    the live dir; the swap recovers them from retired/ into the new
  *    layout before deleting anything (see the swap note in
  *    [[compactDir]]), and a publish racing the rename itself fails that
  *    batch BEFORE its fold fence persists, so the engine's replay
  *    republishes into the new dir. Nothing an ingest loop wrote is ever
  *    dropped on a rename-atomic filesystem.
  * `safeBatchFence = None` compacts every tag — correct only when no
  * ingest is in flight (late arrivals are still recovered). */
object Compaction {

  /** Before/after evidence of one [[compactDir]] run — the ops audit row.
    * `carriedFiles` are the above-fence files preserved verbatim. */
  final case class CompactionStats(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long, rows: Long, carriedFiles: Long)

  private val TaggedName = """^(b\d{19})-.*""".r

  private def tagOf(name: String): Option[String] = name match {
    case TaggedName(t) => Some(t)
    case _ => None
  }

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
    *
    * No-op (stats only, no swap) when nothing is eligible to compact. */
  def compactDir(spark: SparkSession, root: String, sub: String,
      partitionCol: Option[String] = None,
      targetBytes: Long = 128L << 20,
      safeBatchFence: Option[Long] = None): CompactionStats = {
    val raw = new Path(s"$root/$sub")
    val fs = raw.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = fs.makeQualified(raw) // listed leaf paths come back qualified;
    // basePath and the carry-through relativization must match them
    val all = leaves(fs, dir)
    val fence = safeBatchFence.map(BatchAppend.tag)
    val (carry, eligible) = all.partition { st =>
      fence.exists(f => tagOf(st.getPath.getName).exists(_ > f))
    }
    val bytesBefore = all.map(_.getLen).sum
    if (eligible.isEmpty)
      return CompactionStats(all.size.toLong, bytesBefore, all.size.toLong,
        bytesBefore, 0L, carry.size.toLong)

    val eligibleBytes = eligible.map(_.getLen).sum
    // basePath keeps the partition column alive when reading leaf files
    val read = spark.read.option("basePath", dir.toString)
      .parquet(eligible.map(_.getPath.toString): _*)
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

    // SWAP with LATE-ARRIVAL RECOVERY — the two-rename staged protocol
    // ([[IndexSwap.swapDirs]]'s shape) plus one extra step the concurrent-
    // ingest contract needs: the rewrite above can take many micro-batch
    // intervals, and a [[BatchAppend]] batch PUBLISHED into the live dir
    // after the initial listing is in neither `eligible` nor `carry` —
    // a plain swap would retire and delete it, silently losing rows the
    // batch's (already persisted) fold fence will never re-append. After
    // the renames, any file found under retired/ whose relative path was
    // NOT in the initial listing is a late arrival: it moves into the new
    // live dir before retired is deleted. The residual window — a publish
    // IN FLIGHT while the first rename executes — fails that publish's
    // rename (its target path just disappeared), which fails the batch
    // before its fold persists, and the engine's replay republishes into
    // the new dir: nothing is lost on rename-atomic filesystems. A crash
    // mid-swap leaves old (under retired/) or new (under staging/) intact,
    // same recovery contract as IndexSwap.
    val snapshot = all.map(st => relOf(st.getPath)).toSet
    val retired = new Path(s"$root/retired")
    fs.delete(retired, true)
    fs.mkdirs(retired)
    val retiredSub = new Path(retired, sub)
    val ok1 = fs.rename(dir, retiredSub)
    // a publish racing the gap between the two renames can RECREATE the
    // live dir (a parquet stage write creates its parents) — renaming
    // staged onto an existing dir would NEST instead of replace. Sweep any
    // recreated content into retired (real published files are picked up
    // by the late-arrival pass below; in-flight .stage dirs are abandoned,
    // their batch fails and replays) and verify the final landing by the
    // staged root's _SUCCESS marker.
    if (fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        val _ = fs.rename(st.getPath, new Path(retiredSub, st.getPath.getName))
      }
      fs.delete(dir, true)
    }
    val ok2 = fs.rename(staged, dir)
    require(ok1 && ok2 && fs.exists(new Path(dir, "_SUCCESS")),
      s"compaction swap failed mid-way at $root — old layout is under " +
        s"$root/retired, new under $root/$stagingSub")
    val retiredQ = fs.makeQualified(retiredSub)
    leaves(fs, retiredQ).foreach { st =>
      val r = st.getPath.toString.stripPrefix(retiredQ.toString)
        .stripPrefix("/")
      if (!snapshot.contains(r)) {
        val dst = new Path(dir, r)
        fs.mkdirs(dst.getParent)
        require(fs.rename(st.getPath, dst),
          s"compaction: late-arrival recovery ${st.getPath} -> $dst failed")
      }
    }
    fs.delete(retired, true)
    fs.delete(new Path(s"$root/$stagingSub"), true)
    val after = leaves(fs, dir)
    CompactionStats(all.size.toLong, bytesBefore, after.size.toLong,
      after.map(_.getLen).sum, rows, carry.size.toLong)
  }
}

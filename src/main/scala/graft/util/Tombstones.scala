package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** DELETE-BY-ID for standing indexes — the retraction half of the mutation
  * story (a real corpus retracts documents: takedowns, opt-outs, GDPR).
  * Every standing index here is append-many by design; physically rewriting
  * an index per delete would be a compaction-sized job on the hot path, so
  * deletes follow the LSM/Lucene shape instead:
  *
  *  1. APPEND a tombstone row (the id, plus whatever correction payload the
  *     tier needs) into `<index>/tombstones` — one tiny write, no index
  *     rewrite;
  *  2. FOLD at probe: standing probes anti-join their candidate slice
  *     against the tombstone ids (an equi-join on the id — Spark broadcasts
  *     the small side; the set is bounded by deletes, not corpus);
  *  3. ABSORB at compaction: [[Compaction.compactDir]]'s row transform
  *     drops tombstoned rows during the rewrite it was going to do anyway —
  *     compaction is the natural home for physical deletion, exactly like a
  *     Lucene merge dropping deleted docs.
  *
  * Fence interplay: files carried VERBATIM above a compaction fence keep
  * their tombstoned rows, so absorption must NOT retire tombstones while
  * any carried file might still hold masked rows — [[Compaction
  * .CompactionStats.carriedFiles]] is the signal; callers clear only on a
  * carry-free rewrite (the IVF absorb does), or keep tombstones
  * permanently as correction records (the BM25 contract, where they also
  * carry the (N, Σdl) correction no postings rewrite can express). */
object Tombstones {

  def dir(indexPath: String): String = s"$indexPath/tombstones"

  private def fs(spark: SparkSession, indexPath: String) =
    new Path(dir(indexPath))
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** True when any tombstone DATA file exists — a bare directory (a crash
    * inside a tagged append's clean→publish window leaves one) must read
    * as "no tombstones", not fail the next probe's schema inference. */
  def exists(spark: SparkSession, indexPath: String): Boolean = {
    val d = new Path(dir(indexPath))
    val f = fs(spark, indexPath)
    f.exists(d) && f.listStatus(d).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_")
    }
  }

  /** Append tombstone rows (schema is the tier's: at least the id column).
    * `batchTag` routes a streaming retraction through [[BatchAppend]]'s
    * replay-idempotent protocol; batch callers append plainly. */
  def append(rows: DataFrame, indexPath: String,
      batchTag: Option[String] = None): Unit = batchTag match {
    case Some(t) => BatchAppend.append(rows, dir(indexPath), t)
    case None => rows.write.mode("append").parquet(dir(indexPath))
  }

  /** The current tombstone frame (deduped on `idCol` — a double delete is
    * one tombstone), or None when no delete has ever landed — probes skip
    * the anti-join entirely then (one `exists` call, the no-delete hot
    * path unchanged). */
  def idsOf(spark: SparkSession, indexPath: String,
      idCol: String): Option[DataFrame] =
    if (!exists(spark, indexPath)) None
    else Some(spark.read.parquet(dir(indexPath)).select(col(idCol)).distinct())

  /** Fold tombstones into a candidate slice: anti-join on `idCol` — the
    * probe-side half of the delete. Reads the tombstone directory FRESHLY
    * (a delete is visible to the next probe, the append-visibility
    * contract applied to retraction). */
  def antiJoin(df: DataFrame, indexPath: String, idCol: String): DataFrame =
    idsOf(df.sparkSession, indexPath, idCol) match {
      case Some(ids) => df.join(ids, Seq(idCol), "left_anti")
      case None => df
    }

  /** The tombstone directory's DATA files (hidden/metadata names skipped —
    * the same filter [[exists]] applies), for callers that manage the
    * medium at file granularity: [[graft.operators.Bm25]]'s fold protocol
    * retires tombstones per-file (a fold commit record names the files it
    * folded, so readers exclude them and a crash between record and GC
    * double-counts nothing). Empty when the directory is absent. */
  def dataFiles(spark: SparkSession,
      indexPath: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val d = new Path(dir(indexPath))
    val f = fs(spark, indexPath)
    if (!f.exists(d)) Nil
    else f.listStatus(d).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_")
    }
  }

  /** Cheap change signature of the tombstone directory — the retraction
    * counterpart of the stats/centers signatures, so serving loops
    * re-prepare when a delete lands. Empty when no delete ever has. */
  def signature(spark: SparkSession,
      indexPath: String): Seq[(String, Long, Long)] = {
    val d = new Path(dir(indexPath))
    val f = fs(spark, indexPath)
    if (!f.exists(d)) Nil
    else f.listStatus(d)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
  }

  /** Retire the tombstone directory — callers do this ONLY after a
    * carry-free absorbing rewrite (see the object doc). */
  def clear(spark: SparkSession, indexPath: String): Unit = {
    val _ = fs(spark, indexPath).delete(new Path(dir(indexPath)), true)
  }

  /** Retire ONLY the named tombstone data files — the snapshot-scoped form
    * of [[clear]] for absorbs that listed their tombstone frame before the
    * rewrite started: a tombstone appended WHILE the absorb ran is not in
    * the snapshot, was not necessarily masked out of every medium, and
    * must stay live for the next absorb (deleting it would be a lost
    * takedown — the BM25 fold protocol's defended window, applied to every
    * snapshot-retiring caller). Idempotent: already-gone files skip. */
  def clearFiles(spark: SparkSession, indexPath: String,
      files: Seq[org.apache.hadoop.fs.FileStatus]): Unit = {
    val f = fs(spark, indexPath)
    files.foreach(st => if (f.exists(st.getPath)) {
      val _ = f.delete(st.getPath, false)
    })
  }

  /** The distinct ids held by a SPECIFIC set of tombstone data files —
    * the snapshot twin of [[idsOf]], for absorbs that must mask and
    * retire the SAME frame (files listed once, before any rewrite). */
  def idsOfFiles(spark: SparkSession,
      files: Seq[org.apache.hadoop.fs.FileStatus],
      idCol: String): Option[DataFrame] =
    if (files.isEmpty) None
    else Some(spark.read.parquet(files.map(_.getPath.toString): _*)
      .select(col(idCol)).distinct())

  /** Absorb one index's tombstones across ALL the media that hold its
    * rows — the multi-directory form of the IVF absorb, and the function
    * "production absorbs raw before refitting" names for the code tiers
    * ([[graft.operators.Pq.absorbPqDeletes]] /
    * [[graft.operators.Sq.absorbSqDeletes]]): every listed `(sub,
    * partitionCol)` target that exists compacts through
    * [[Compaction.compactDir]] with the anti-join as the row transform
    * (one staged rewrite per medium), and the tombstones retire ONLY when
    * EVERY rewrite was carry-free — a carried file in ANY medium may
    * still hold masked rows, and for the code tiers specifically the raw
    * corpus feeds retrains, so retiring tombstones while `raw` still
    * holds a retracted vector would let the next refit RESURRECT it into
    * fresh codes. Absent targets (an index keeping no raw tier) are
    * skipped — nothing there to mask. Returns the per-target stats in
    * input order (zeros for skipped targets).
    *
    * Snapshot scope: the tombstone FILES are listed ONCE, before the first
    * rewrite, every medium masks against that one frame, and on
    * all-carry-free ONLY the snapshot files retire ([[clearFiles]]) — a
    * tombstone landing mid-absorb (e.g. after a later medium's anti-join
    * resolved) stays live for the next absorb instead of being dropped
    * un-absorbed from the earlier media (a lost takedown). */
  def absorbAll(spark: SparkSession, indexPath: String, idCol: String,
      targets: Seq[(String, Option[String])],
      targetBytes: Long = 128L << 20,
      safeBatchFence: Option[Long] = None)
      : Seq[Compaction.CompactionStats] = {
    val conf = spark.sessionState.newHadoopConf()
    val snapshot = dataFiles(spark, indexPath)
    val snapIds = idsOfFiles(spark, snapshot, idCol)
    // mask with the snapshot frame; re-select the input's column ORDER (a
    // USING join moves the key to the front, and the rewrite's writer and
    // positional readers are order-sensitive)
    def mask(df: DataFrame): DataFrame = snapIds match {
      case Some(ids) =>
        df.join(ids, Seq(idCol), "left_anti").select(df.columns.map(col): _*)
      case None => df
    }
    val stats = targets.map { case (sub, pcol) =>
      val p = new Path(s"$indexPath/$sub")
      if (!p.getFileSystem(conf).exists(p))
        Compaction.CompactionStats(0L, 0L, 0L, 0L, 0L, 0L)
      else Compaction.compactDir(spark, indexPath, sub,
        partitionCol = pcol, targetBytes = targetBytes,
        safeBatchFence = safeBatchFence,
        transform = mask)
    }
    if (stats.forall(_.carriedFiles == 0L))
      clearFiles(spark, indexPath, snapshot)
    stats
  }
}

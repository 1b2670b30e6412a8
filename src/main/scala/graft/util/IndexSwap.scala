package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE staged-swap protocol shared by every rebuildable standing index
  * (IVF retrain — [[graft.operators.Similarity.retrainIvfIndex]] — and the
  * bucketed band-index rebuilds in [[graft.operators.Dedup]]): the new
  * index is FULLY MATERIALIZED into staging first, then the old state moves
  * aside and staging moves into place. A crash at any point leaves either
  * the old or the new index intact and recoverable, never a half-written
  * mix. The swap window is not atomic for CONCURRENT readers — the serving
  * contract is retry-once against a re-resolved handle
  * ([[graft.streaming.AnnStream]]'s signature check + probe retry; the
  * batch probes re-resolve their table per call), which covers the window
  * because the new index is complete before any old file moves.
  *
  * Two media, one protocol:
  *  - [[swapDirs]] for directory-of-parquet indexes (IVF corpus+centers);
  *  - [[swapTable]] for metastore-registered bucketed tables (band / hash /
  *    embedding indexes), where the rename is a catalog operation and the
  *    data directories ping-pong between two fixed locations
  *    ([[pingPongLocation]]).
  */
object IndexSwap {

  /** Two-rename directory swap under `root`: each name in `names` moves
    * `root/name` → `root/retired/name`, then `root/stagingSub/name` →
    * `root/name`; staging and retired are deleted only after every rename
    * succeeded. A name ABSENT on one side is skipped on that side only —
    * a rebuild may ADD a medium (a flat index crossing the coarse-tier
    * auto threshold stages `coarse/` where the live index has none) or
    * RETIRE one (an explicit flat retrain of a coarse index stages
    * nothing there, so the live copy moves to retired and nothing moves
    * back — the stale quantizer cannot survive the swap). Precondition:
    * every name present under `root/stagingSub` is fully materialized. On
    * a mid-way failure the require message points at both recovery
    * copies. */
  def swapDirs(spark: SparkSession, root: String, stagingSub: String,
      names: Seq[String]): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    def p(s: String) = new Path(rootPath, s)
    fs.delete(p("retired"), true)
    fs.mkdirs(p("retired"))
    val ok = names.forall(n =>
      !fs.exists(p(n)) || fs.rename(p(n), p(s"retired/$n"))) &&
      names.forall(n =>
        !fs.exists(p(s"$stagingSub/$n")) || fs.rename(p(s"$stagingSub/$n"), p(n)))
    require(ok,
      s"index swap failed mid-way at $root — old index is under " +
        s"$root/retired, new under $root/$stagingSub")
    fs.delete(p(stagingSub), true)
    fs.delete(p("retired"), true)
  }

  /** Metastore half of a bucketed-table rebuild: drop the serving name,
    * rename the (fully written) staging table into it. The gap between
    * drop and rename is this medium's two-rename window — a probe planned
    * in it sees TABLE_NOT_FOUND and retries; probes planned before keep
    * reading the old (external) data files, which the CALLER retires after
    * the swap. External locations survive both the drop and the rename. */
  def swapTable(spark: SparkSession, table: String,
      stagingTable: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $stagingTable RENAME TO $table")
  }

  /** The staging data location for a table rebuild: ping-pong between two
    * fixed siblings of the current location (`…_swapa` ↔ `…_swapb`), so
    * repeated rebuilds never nest suffixes and the retired location is
    * always exactly "the other one". Deterministic — no timestamps — so a
    * crashed rebuild's leftover staging dir is found and overwritten by
    * the retry. */
  def pingPongLocation(current: String): String = {
    val base = current.stripSuffix("_swapa").stripSuffix("_swapb")
    if (current.endsWith("_swapa")) s"${base}_swapb" else s"${base}_swapa"
  }
}

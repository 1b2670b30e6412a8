package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Z-order (Morton-curve) data layout (builder-brief extension; no
  * reference analogue — the technique behind Delta/Iceberg OPTIMIZE
  * ZORDER). Interleaving the bits of two sort keys gives a single value
  * whose RANGE partitions are small rectangles in (x, y) space, so a scan
  * filtered on EITHER dimension prunes most files — the data-layout lever
  * a 100 TB table has against multi-column predicates, where a plain sort
  * on (x, y) only helps x.
  *
  * The interleave is the classic mask-spread: 4 shift/or/and steps per
  * dimension, all built-in integer expressions — whole-stage codegen
  * keeps it in the scan's pipeline, and the DuckDB oracle replays the
  * identical arithmetic (the SQL form is generated from the same step
  * table, so the two engines cannot drift).
  */
object ZOrder {

  /** (shift, mask) steps spreading a 16-bit value so its bits occupy the
    * even positions of a 32-bit lane. Shared with the oracle-SQL
    * generator [[spreadSql]]. */
  private[graft] val spreadSteps: Seq[(Int, Long)] = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `c` across even bit positions. */
  def spreadBits16(c: Column): Column =
    spreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of (x, y): x on even bits, y on odd. */
  def zValue(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** The DuckDB twin of [[spreadBits16]], unrolled from the SAME step
    * table (used by SparkEntry's oracle SQL). */
  def spreadSql(expr: String): String =
    spreadSteps.foldLeft(s"($expr & 65535)") { case (x, (s, m)) =>
      s"(($x | ($x << $s)) & $m)"
    }

  /** Registered query: per-row Morton codes over lineitem's
    * (l_partkey, l_suppkey) — the layout key a part+supplier-filtered
    * workload would cluster by. Pure per-row integer arithmetic: no
    * shuffle, stays in the scan's codegen stage. */
  def zorderValues(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        zValue($"l_partkey", $"l_suppkey").as("zval"))

  /** Registered query: the locality audit of a 256-bucket Z-range layout —
    * per bucket (zval >> 24): row count and the bounding box of both
    * dimensions. Small boxes = a filter on either key prunes most
    * buckets; this table is exactly the pruning-effectiveness evidence a
    * layout job reports. Dashboard-sized output; one hash-agg. */
  def zorderLocality(spark: SparkSession, sfDir: String): DataFrame =
    zorderValues(spark, sfDir)
      .groupBy(shiftright($"zval", 24).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min($"l_partkey").as("min_part"), max($"l_partkey").as("max_part"),
        min($"l_suppkey").as("min_supp"), max($"l_suppkey").as("max_supp"))
      .orderBy($"zbucket")

  /** The write path: range-partition on the Morton code and write — each
    * output file covers one compact Z-range (a small (x, y) rectangle),
    * which is what makes min/max file statistics prunable on both
    * dimensions. `repartitionByRange` samples the zval distribution, so
    * buckets are equi-DEPTH (balanced files) rather than equi-width. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int = 16): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, $"_z")
      .sortWithinPartitions($"_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  // ------------------------------------------------------------------
  // Zone maps — the data-skipping CONSUMER of the Z-order layout (the
  // Delta/Iceberg file-statistics shape): one metadata row per data file
  // carrying row count + the bounding box of the layout keys; a range
  // probe intersects its predicate box with the zone boxes and reads
  // ONLY the overlapping files. Z-order is what makes the boxes small on
  // BOTH dimensions (zorder_locality is the audit; this is the payoff —
  // a 2-D predicate skips most files, where a linear sort-by-x layout
  // skips only on x). At 100 TB the zones table is still metadata-scale
  // (one row per file); production filters it distributively and
  // collects only the matching file list — bounded by the match, exactly
  // the Delta data-skipping read path.
  // ------------------------------------------------------------------

  /** Build the zone map of a flat parquet layout: per FILE, row count and
    * the (xCol, yCol) bounding box — one narrow scan grouped by
    * `input_file_name()` (file-count-sized output). Parquet footers carry
    * these stats per row group already; materializing them as a table is
    * what lets PLANNING skip whole files without touching any footer —
    * the listing-time analogue of the IVF cell / BM25 term-bucket prune,
    * for layouts where the predicate column is not a partition key. */
  def buildZoneMap(spark: SparkSession, tablePath: String,
      xCol: String, yCol: String): DataFrame =
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))

  /** File-skipping 2-D range scan: overlap-test the predicate box against
    * the zone map (file-count-sized collect), read ONLY the surviving
    * files, then apply the residual predicate (zone boxes over-approximate
    * — a surviving file can still hold non-matching rows). Row-identical
    * to a full-scan filter by construction; what changes is bytes read.
    *
    * The probe VERIFIES the coverage invariant instead of assuming it —
    * the three zone-map failure modes all reduce to correct (or loud)
    * behavior instead of silent row loss or duplication:
    *  - UNMAPPED data files (a crash between a data append and its zone
    *    append, or a layout rewrite that didn't rebuild the map —
    *    [[compactZoned]] is the rewrite that does) are detected by the
    *    listing-vs-zones anti-join and read UNCONDITIONALLY with the
    *    residual filter: a file without a box gets no skipping, never a
    *    silent skip;
    *  - DUPLICATED zone rows (a concurrent-append race mis-attributing
    *    the listing diff) collapse in the per-file set — a file is read
    *    once no matter how many zone rows claim it;
    *  - STALE zone rows pointing at files that no longer exist (a
    *    compaction that rewrote the layout) are dropped from the read
    *    set: their rows live in the rewrite's output files, which are
    *    unmapped and therefore read by the first rule.
    * Zone-row file identities compare by FILE NAME (part-file names are
    * globally unique per write): `input_file_name()` and the filesystem
    * listing render the same path with different URI spellings.
    *
    * Cost: one table-directory listing per probe (file-count-sized — the
    * same metadata scale as the zones collect itself; this is the Delta
    * read path's snapshot-vs-listing reconciliation, inlined). */
  def prunedRangeScan(spark: SparkSession, tablePath: String,
      zones: DataFrame, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    def nameOf(p: String): String =
      new org.apache.hadoop.fs.Path(p).getName
    val tp = new org.apache.hadoop.fs.Path(tablePath)
    val fs = tp.getFileSystem(spark.sessionState.newHadoopConf())
    // live data files by name (the coverage ground truth)
    val live = fs.listStatus(tp)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => st.getPath.getName -> st.getPath.toString).toMap
    // one metadata-sized collect: every zone row with its overlap verdict
    val zrows = zones.select(col("file"),
      (col("min_x") <= xHi && col("max_x") >= xLo &&
        col("min_y") <= yHi && col("max_y") >= yLo).as("hit")).collect()
    val mapped = zrows.map(r => nameOf(r.getString(0))).toSet
    val hit = zrows.filter(_.getBoolean(1))
      .map(r => nameOf(r.getString(0))).toSet
    val unmapped = live.keySet -- mapped // coverage breach → no skipping
    val toRead = ((hit & live.keySet) ++ unmapped).toSeq.sorted
      .map(live)
    if (toRead.isEmpty) {
      // the zone map fully determined the answer: every live file has an
      // overlap-free box — return an empty frame with the table schema
      // (one footer read) instead of scanning the whole layout
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        spark.read.parquet(tablePath).schema)
    } else
      spark.read.parquet(toRead: _*)
        .filter(col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi))
  }

  /** Append a slice to a zoned layout AND extend its zone map — the
    * segment-append contract of every standing artifact here, for the
    * data-skipping tier: the slice lands as new Z-ordered files (its own
    * compact Z-ranges; the EXISTING files' boxes are untouched and stay
    * valid), and zone rows are built for EXACTLY the new files and
    * appended.
    *
    * TWO publish modes, the same split every standing index here has:
    *  - `batchTag = Some(tag)` — the STREAMING ingest form: data files
    *    and zone rows both publish through [[graft.util.BatchAppend]]'s
    *    stage → clean → publish protocol under the tag, so a replayed
    *    batch (foreachBatch's at-least-once) re-publishes the SAME files
    *    and re-derives zone rows for exactly them — no duplicated rows,
    *    no duplicated zones, and the tag identifies the fresh files
    *    DETERMINISTICALLY (no listing diff to mis-attribute under
    *    concurrency).
    *  - `batchTag = None` — the BATCH form (plain appends): correct for
    *    driver-sequenced batch jobs; a replayed/duplicated call WILL
    *    duplicate rows (there is no idempotence key), so streaming
    *    ingest must pass a tag. The listing diff identifies fresh files;
    *    concurrent appends can mis-attribute or double-write zone rows —
    *    both now harmless at probe time ([[prunedRangeScan]] reads per
    *    FILE, deduped, and covers unmapped files), but the sequenced-
    *    caller contract stays the documented one.
    * In both modes a crash between the data publish and the zone publish
    * leaves unmapped data files — [[prunedRangeScan]]'s coverage check
    * reads them unconditionally, so no row can hide (the zone row is an
    * optimization record, not a commit record). */
  def appendZoned(df: DataFrame, xCol: String, yCol: String, dir: String,
      numFiles: Int = 4, batchTag: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val table = s"$dir/table"
    val tablePath = new org.apache.hadoop.fs.Path(table)
    val fs = tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    val arranged = df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
    def dataFiles(): Set[String] =
      fs.listStatus(tablePath)
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath.toString).toSet
    val fresh: Seq[String] = batchTag match {
      case Some(tag) =>
        graft.util.BatchAppend.append(arranged, table, tag)
        // the tag names the batch's files — deterministic, replay-stable
        dataFiles().filter(p =>
          new org.apache.hadoop.fs.Path(p).getName.startsWith(s"$tag-"))
          .toSeq.sorted
      case None =>
        val before = dataFiles()
        arranged.write.mode("append").parquet(table)
        (dataFiles() -- before).toSeq.sorted
    }
    require(fresh.nonEmpty, s"appendZoned: no new files landed under $table")
    val zoneRows = spark.read.parquet(fresh: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
    batchTag match {
      case Some(tag) =>
        graft.util.BatchAppend.append(zoneRows, s"$dir/zones", tag)
      case None =>
        zoneRows.write.mode("append").parquet(s"$dir/zones")
    }
  }

  /** Compact a ZONED layout — the zone-map-aware form of
    * [[graft.util.Compaction.compactDir]], which MUST be used for layouts
    * carrying a zone map: a raw compactDir renames every data file, which
    * orphans every zone row (the probe's coverage check keeps that
    * CORRECT — stale rows drop, rewritten files read unmapped — but the
    * layout would serve every probe as a full scan, silently losing the
    * entire skipping win). This rewrite re-derives BOTH artifacts and
    * swaps them as one unit:
    *
    *  1. eligible data files (at or below `safeBatchFence`, untagged
    *     included) re-Z-order into ~`targetBytes` files — compaction is
    *     the natural place to RESTORE locality appends eroded, since each
    *     append only Z-orders its own slice;
    *  2. above-fence files (still replayable — the [[graft.util
    *     .Compaction]] fence contract) copy through verbatim;
    *  3. a FRESH zone map builds over the complete staged table — full
    *     coverage by construction, no orphan window;
    *  4. table + zones swap together through the one staged protocol
    *     ([[graft.util.IndexSwap.swapDirs]]) — a crash leaves the old or
    *     the new PAIR intact, never a data layout with the other's map.
    *
    * Probes racing the swap retry under [[prunedRangeScan]]'s caller
    * contract (the serving loops' retry-once); concurrent appends are out
    * of contract exactly as for compactDir (the driver-sequenced
    * maintenance slot). Returns the same before/after audit row. */
  def compactZoned(spark: SparkSession, dir: String, xCol: String,
      yCol: String, targetBytes: Long = 128L << 20,
      safeBatchFence: Option[Long] = None)
      : graft.util.Compaction.CompactionStats = {
    import graft.util.{BatchAppend, Compaction}
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val table = fs.makeQualified(new org.apache.hadoop.fs.Path(s"$dir/table"))
    val all = fs.listStatus(table).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    val fence = safeBatchFence.map(BatchAppend.tag)
    // the ONE shared tag parser (BatchAppend.tagOf) — a tag-format change
    // must move every fence at once, or replayable batches compact away
    val (carry, eligible) = all.partition { st =>
      fence.exists(f => BatchAppend.tagOf(st.getPath.getName).exists(_ > f))
    }
    val bytesBefore = all.map(_.getLen).sum
    if (eligible.isEmpty)
      return Compaction.CompactionStats(all.size.toLong, bytesBefore,
        all.size.toLong, bytesBefore, 0L, carry.size.toLong)
    val eligibleBytes = eligible.map(_.getLen).sum
    val read = spark.read.parquet(eligible.map(_.getPath.toString): _*)
    val rows = read.count()
    val nFiles = math.max(1L,
      (eligibleBytes + targetBytes - 1L) / targetBytes).toInt
    val stagingSub = "compact_staging"
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$stagingSub"), true)
    // re-Z-order the eligible rows (locality restoration — see the doc)
    read.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(s"$dir/$stagingSub/table")
    carry.foreach { st =>
      val dst = new org.apache.hadoop.fs.Path(
        s"$dir/$stagingSub/table/${st.getPath.getName}")
      require(org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, dst,
        false, true, spark.sessionState.newHadoopConf()),
        s"compactZoned: carry-through copy ${st.getPath} -> $dst failed")
    }
    // fresh zone map over the COMPLETE staged table: coverage by
    // construction, carried files re-derived too (cheap relative to the
    // rewrite; avoids splicing old zone rows by name)
    buildZoneMap(spark, s"$dir/$stagingSub/table", xCol, yCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$stagingSub/zones")
    graft.util.IndexSwap.swapDirs(spark, dir, stagingSub,
      Seq("table", "zones"))
    val after = fs.listStatus(table).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    Compaction.CompactionStats(all.size.toLong, bytesBefore,
      after.size.toLong, after.map(_.getLen).sum, rows, carry.size.toLong)
  }

  private def zonedFixturePath(sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.util.TmpDirs.perProcessDir("graft_zonemap")}/$key"
  }

  /** The one zoned fixture layout per (process, sf dir): lineitem's four
    * key columns Z-ordered on (l_partkey, l_suppkey) into 16 files, plus
    * the zone map built next to it. */
  private[graft] def ensureZonedLineitem(spark: SparkSession,
      sfDir: String): String = {
    val dir = zonedFixturePath(sfDir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "zones"))) {
      writeZOrdered(Tables.lineitem(spark, sfDir)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
        "l_partkey", "l_suppkey", s"$dir/table")
      buildZoneMap(spark, s"$dir/table", "l_partkey", "l_suppkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/zones")
    }
    dir
  }

  /** Registered query (oracle-checked): the zone-map-pruned 2-D range scan
    * over the Z-ordered lineitem layout. The oracle is the PLAIN filter —
    * file skipping is an execution choice, not a semantic, so
    * hash-equality against the full-scan SQL is exactly the data-skipping
    * correctness contract (no row lost to an over-eager skip, none
    * duplicated). The skipping itself — files read ≪ files total, and ≪
    * what a linear layout reads for the same box — is pinned in
    * spec:ZOrderSpec, which owns the layout-dependent claims. */
  def zonemapPrunedScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureZonedLineitem(spark, sfDir)
    prunedRangeScan(spark, s"$dir/table",
      spark.read.parquet(s"$dir/zones"),
      "l_partkey", "l_suppkey", 20L, 60L, 2L, 8L)
  }
}

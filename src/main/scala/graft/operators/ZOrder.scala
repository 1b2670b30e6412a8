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
    * to a full-scan filter by construction; what changes is bytes read. */
  def prunedRangeScan(spark: SparkSession, tablePath: String,
      zones: DataFrame, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val files = zones
      .filter(col("min_x") <= xHi && col("max_x") >= xLo &&
        col("min_y") <= yHi && col("max_y") >= yLo)
      .select(col("file")).collect().map(_.getString(0))
    if (files.isEmpty) {
      // the zone map fully determined the answer: no file's box overlaps,
      // so the result is empty BY the coverage invariant — return an
      // empty frame with the table schema (one footer read) instead of
      // scanning the whole layout to filter out every row
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        spark.read.parquet(tablePath).schema)
    } else
      spark.read.parquet(files.toIndexedSeq: _*)
        .filter(col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi))
  }

  /** Append a slice to a zoned layout AND extend its zone map — the
    * segment-append contract of every standing artifact here, for the
    * data-skipping tier: the slice lands as new Z-ordered files (its own
    * compact Z-ranges; the EXISTING files' boxes are untouched and stay
    * valid), and zone rows are built for EXACTLY the new files and
    * appended. Probes after any number of appends keep the full-coverage
    * invariant — no row can hide from the overlap test — because every
    * data file always has its zone row published in the same call that
    * published it. */
  def appendZoned(df: DataFrame, xCol: String, yCol: String, dir: String,
      numFiles: Int = 4): Unit = {
    val spark = df.sparkSession
    val table = s"$dir/table"
    val tablePath = new org.apache.hadoop.fs.Path(table)
    val fs = tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(): Set[String] =
      fs.listStatus(tablePath)
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath.toString).toSet
    val before = dataFiles()
    df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("append").parquet(table)
    val fresh = (dataFiles() -- before).toSeq.sorted
    require(fresh.nonEmpty, s"appendZoned: no new files landed under $table")
    spark.read.parquet(fresh: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
      .write.mode("append").parquet(s"$dir/zones")
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

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
}

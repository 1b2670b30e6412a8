package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dataset profiling — the data-quality audit a pipeline runs before and
  * after every corpus build: per-column null counts, distinct counts, and
  * value ranges (builder-brief extension; no reference analogue).
  *
  * One scan computes every column's aggregates side by side (Spark plans
  * the distinct aggregates with Expand — still a single pass over the
  * data), and the wide single-row result is stacked to long form
  * driver-side-free with `stack`. At 100 TB the exact distinct counts are
  * the only heavy term (each adds an Expand replica of the scan); swap
  * `count_distinct` for `approx_count_distinct` there — same call shape,
  * HLL state (the same exact-vs-sketch split as distinct_parts /
  * distinct_parts_approx).
  *
  * min/max are emitted as strings so one long-form schema serves every
  * column type; restrict to non-float columns (float→string rendering is
  * engine-specific, and a profile of floats wants quantiles anyway —
  * [[EventAnalytics.valueQuantiles]]).
  */
object Profile {

  /** Long-form profile of `cols`: (column, n_nulls, n_distinct, min_value,
    * max_value), one row per profiled column, computed in one scan. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stacked) AS (column, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Registered query: the documents-table profile (every non-float column). */
  def documentsProfile(spark: SparkSession, sfDir: String): DataFrame =
    tableProfile(Tables.documents(spark, sfDir),
      Seq("doc_id", "text", "lang", "source", "n_chars"))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Sanitize
import graft.sources.Tables
import graft.util.Cols._

/** Reference-parity batch queries (SURVEY.md §2), re-expressed over the
  * driver's `documents`/`events` fixtures (`documents.text` stands in for
  * `tweet.text`, `documents.lang` for `user.lang` — FIXTURES.md role map).
  *
  * Every query is a declarative DataFrame plan: scans prune columns, filters
  * push to the parquet reader, aggregates get partial (map-side) combine from
  * Catalyst — nothing here would change shape on a 1000-executor cluster.
  * The oracle compare is order-insensitive (rows are sorted before hashing),
  * so no query sorts except under LIMIT, where ordering on a unique key is
  * what makes the prefix deterministic (TakeOrderedAndProject, not a global
  * sort).
  */
object Reference {

  /** A1 — `select count(*) from twitter_presi` (README.md:107). */
  def scanCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_rows"))

  /** A2 — `wordCounts.groupBy("text").count()` (README.md:149, quirk Q6):
    * tweet-text frequency table. Hash aggregate; partial combine means the
    * shuffle carries one row per distinct text per task, not the raw rows.
    */
  def groupByTextCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy($"text")
      .agg(count(lit(1)).as("n"))

  /** P8+L1 — `select text from twitter_presi where text is not null limit 2`
    * (README.md:126,156). The reference's bare LIMIT is nondeterministic;
    * pinned here by ordering on the unique key first (documented divergence).
    */
  def selectTextNotNullLimit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter($"text".isNotNull)
      .select($"doc_id", $"text")
      .orderBy($"doc_id")
      .limit(5)

  /** P1 — language filter: keep rows whose lang starts with "fr", null-safe
    * (TwitterStreamingCollector.scala:73-77). */
  def langFilterFr(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(coalesce($"lang", lit("")).startsWith("fr"))
      .select($"doc_id", $"text", $"lang")

  /** P5 — the `safeValue` sanitizer as a projection over document text
    * (TwitterStreamingCollector.scala:57-64). */
  def sanitizeProjection(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select($"doc_id", Sanitize.sanitize($"text").as("text_clean"))

  /** P4 — Hive legacy timestamp render (TwitterStreamingCollector.scala:45)
    * over the events stream stand-in. */
  def timestampFormat(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select($"event_id", Sanitize.formatCreatedAt($"ts").as("created_at_text"))
      .orderBy($"event_id")
      .limit(1000)

  /** P9 — Row→string map (README.md:156, quirk Q5): the reference mapped SQL
    * rows with `_.toString`, feeding `[bracketed]` renderings into its
    * featurizer. Preserved verbatim via a typed map (`Row.toString` =
    * `mkString("[", ",", "]")`); the clean alternative is `.as[String]` on
    * the single column (SURVEY.md §2.8 Q5). The typed map breaks whole-stage
    * codegen for exactly this narrow, stateless projection — acceptable for a
    * fidelity op, not a pattern for hot paths.
    */
  def rowStrings(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    Tables.documents(spark, sfDir)
      .filter($"text".isNotNull)
      .select($"text")
      .map(_.toString)
      .toDF("value")
  }

  /** P6 — pipe-join encode of the projected fields (the collector's
    * interchange line, TwitterStreamingCollector.scala:66-68), using events
    * value as a stand-in numeric pair. */
  def encodePipeLine(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        concat_ws("|", Sanitize.sanitize($"text"), coalesce($"lang", lit("")),
          coalesce($"source", lit(""))).as("line"))
}

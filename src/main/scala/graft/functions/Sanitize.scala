package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.tweets.TweetSchema

/** Column-helper re-expression of the reference's `safeValue`/`formatStatus`
  * scalar pipeline (TwitterStreamingCollector.scala:56-69).
  *
  * Pure compositions of built-in (codegen'd) expressions — no UDFs, no custom
  * Catalyst nodes needed (SURVEY.md §2.7 U1). Each helper stays inside
  * whole-stage codegen so the hot ingest path vectorizes at scale.
  *
  * Quirk decisions (SURVEY.md §2.8):
  *  - Q1: the reference's `.replace("[\r\n]", "")` is a *literal-string*
  *    replace, but the Scala compiler already processed the escapes in the
  *    source literal — so the removed needle is the 4-character sequence
  *    `[` + CR + LF + `]`, not the 6-character text `[\r\n]`. We reproduce
  *    exactly that: strip `[`+CR+LF+`]`, then the control-char regex catches
  *    any remaining bare CR/LF (matching the reference's later replaceAll).
  */
object Sanitize {

  /** Null→"", strip tab and double-quote, drop the 4-char sequence
    * `[`+CR+LF+`]` (Q1), comma→apostrophe, strip all Unicode control chars.
    * Mirrors TwitterStreamingCollector.scala:57-64 exactly.
    */
  def sanitize(c: Column): Column = {
    val nonNull = coalesce(c, lit(""))
    val noTabQuote = translate(nonNull, "\t\"", "")
    // quirk Q1: the reference removes the 4-char sequence [ + CR + LF + ]
    // (its source literal "[\r\n]" was escape-processed by scalac)
    val noLiteral = regexp_replace(noTabQuote, "\\[\r\n\\]", "")
    val noComma = regexp_replace(noLiteral, ",", "'")
    regexp_replace(noComma, "[\\p{C}]", "")
  }

  /** Null-safe geo render: missing float → empty string in the text form
    * (TwitterStreamingCollector.scala:50-51; SURVEY.md §2.2 P3). */
  def floatOrEmpty(c: Column): Column =
    coalesce(c.cast("string"), lit(""))

  /** Hive legacy text-timestamp render (TwitterStreamingCollector.scala:45). */
  def formatCreatedAt(c: Column): Column =
    date_format(c, TweetSchema.timestampPattern)

  /** Inverse of [[formatCreatedAt]] for reading the interchange text. */
  def parseCreatedAt(c: Column): Column =
    to_timestamp(c, TweetSchema.timestampPattern)

  /** Pipe-join encode of the 4 projected fields → one line per tweet
    * (TwitterStreamingCollector.scala:66-68; Utils.scala:9).
    *
    * NOTE: concat_ws skips NULLs, which would collapse separators; every
    * field is therefore pre-coalesced to "" (matching the reference, where
    * `safeValue` null-handling runs before the join).
    */
  def encodePipe(text: Column, lat: Column, lon: Column, ts: Column): Column =
    concat_ws(TweetSchema.separator,
      sanitize(text), floatOrEmpty(lat), floatOrEmpty(lon),
      coalesce(formatCreatedAt(ts), lit("")))

  /** Decode one interchange line back into the 4 typed columns. Empty-string
    * floats become NULL, matching the Hive external-table read the reference
    * relies on (README.md:98-101, 135).
    */
  def decodePipe(line: Column): Column = {
    val parts = split(line, "\\|")
    // try_cast, not cast: Spark 4 runs in ANSI mode, where CAST('' AS FLOAT)
    // throws; the reference's text format uses "" for absent floats.
    def floatAt(i: Int): Column =
      parts.getItem(i).try_cast(org.apache.spark.sql.types.FloatType)
    struct(
      when(parts.getItem(0) === "", lit(null)).otherwise(parts.getItem(0)).as("text"),
      floatAt(1).as("latitude"),
      floatAt(2).as("longitude"),
      parseCreatedAt(parts.getItem(3)).as("created_at"))
  }
}

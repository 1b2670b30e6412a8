package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** PII detection and redaction over a document corpus (builder-brief north
  * star; no reference-repo analogue). Published pre-training pipelines scrub
  * email addresses, phone numbers, and IP addresses from crawled text before
  * anything else sees it; this is that sweep as a Spark-first operator.
  *
  * Scale design: pure per-row `regexp_extract_all` / `regexp_replace`
  * column expressions — codegen'd, shuffle-free, embarrassingly parallel;
  * the whole sweep is one map over the corpus, the shape that scales
  * linearly to 100 TB. Patterns use the shared Java-regex/RE2 subset
  * (explicit ASCII classes, no lookaround, no backreferences) so the DuckDB
  * oracle executes the IDENTICAL pattern strings — and so the operator
  * itself never depends on engine-specific regex semantics.
  *
  * The driver fixture is synthetic word soup with no PII, so the entry
  * plants deterministic synthetic PII derived from `doc_id` arithmetic
  * ([[plantedDocs]]) — the SAME derivation the oracle SQL performs — and
  * then detects and redacts it. The redaction operators themselves
  * ([[redactPii]], count columns) take any text column.
  */
object Pii {

  /** Email: local part @ domain with a dotted TLD of 2+ letters. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** US-style 7-digit phone fragment NNN-NNNN on word boundaries (the
    * fixture's planted shape; a production sweep adds more variants). */
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 on word boundaries (permissive octets — a scrubber
    * prefers false positives over leaked addresses). */
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact all three PII classes, emails first (their local parts contain
    * digits that the later numeric patterns must never see as fragments). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** The fixture corpus with deterministic synthetic PII appended: every
    * doc_id divisible by 3 gains an email, by 5 a phone number, by 11 an IP
    * — all derived from doc_id arithmetic so the oracle SQL reconstructs
    * the identical text. Output: (doc_id, txt).
    */
  def plantedDocs(spark: SparkSession, sfDir: String): DataFrame =
    spread(Tables.documents(spark, sfDir)).select(
      $"doc_id",
      concat(
        coalesce($"text", lit("")),
        when($"doc_id" % 3 === 0,
          concat(lit(" contact user"), $"doc_id".cast("string"),
            lit("@example.com"))).otherwise(""),
        when($"doc_id" % 5 === 0,
          concat(lit(" call 555-"),
            lpad(($"doc_id" * 7 % 10000).cast("string"), 4, "0")))
          .otherwise(""),
        when($"doc_id" % 11 === 0,
          concat(lit(" from 192.168."), ($"doc_id" % 256).cast("string"),
            lit("."), ($"doc_id" * 3 % 256).cast("string"))).otherwise(""))
        .as("txt"))

  /** The sweep: per-document counts of each PII class (on the original
    * text) plus the fully redacted text. One shuffle-free pass.
    * Output: (doc_id, n_emails, n_phones, n_ips, text_redacted).
    */
  def piiRedaction(spark: SparkSession, sfDir: String): DataFrame =
    plantedDocs(spark, sfDir).select(
      $"doc_id",
      countOf($"txt", EmailRe).as("n_emails"),
      countOf($"txt", PhoneRe).as("n_phones"),
      countOf($"txt", IpRe).as("n_ips"),
      redactPii($"txt").as("text_redacted"))
}

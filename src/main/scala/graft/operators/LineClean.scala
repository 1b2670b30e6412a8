package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols.spread

/** Line-level corpus cleaning — the C4 (Raffel et al., 2020, §2.2) rule
  * tier of a pre-training build: drop low-signal LINES, then drop documents
  * left without enough surviving lines (north-star extension; the
  * reference's closest analogue is its null-text filter,
  * SparkStreamingTwitter-master README.md:126).
  *
  * Rules are parametric ([[Rules]]): the published C4 configuration is the
  * [[c4]] constant (terminal punctuation, ≥5 words/line, "javascript"
  * line-ban, ≥3 kept lines, "lorem ipsum"/brace page-bans); the fixture
  * entry runs [[fixtureRules]] — the same machinery with the thresholds
  * that discriminate on the synthetic single-line fixture corpus (no
  * punctuation exists there, so the punct rule would be vacuous-false;
  * the word floor is raised to 30 where the fixture's 10–99-word docs
  * actually split). The spec exercises the full C4 config on crafted
  * multi-line pages.
  *
  * Scale notes: one narrow codegen projection per document — split,
  * higher-order `filter`, `array_join`; no UDF, no shuffle, no explode
  * (the line array never leaves the row). At 100 TB this is a pure map
  * stage that composes in front of the dedup/decontamination tiers.
  */
object LineClean {

  /** One cleaning configuration. `minWordsPerLine`/`requireTerminalPunct`/
    * `lineBanSubstrings` drop lines; `minKeptLines`/`docBanSubstrings`
    * drop whole documents (bans are case-insensitive substring tests). */
  final case class Rules(
      requireTerminalPunct: Boolean,
      minWordsPerLine: Int,
      lineBanSubstrings: Seq[String],
      minKeptLines: Int,
      docBanSubstrings: Seq[String])

  /** The published C4 configuration (Raffel et al. 2020, §2.2). */
  val c4: Rules = Rules(
    requireTerminalPunct = true,
    minWordsPerLine = 5,
    lineBanSubstrings = Seq("javascript"),
    minKeptLines = 3,
    docBanSubstrings = Seq("lorem ipsum", "{"))

  /** Fixture-calibrated configuration (see object scaladoc). */
  val fixtureRules: Rules = Rules(
    requireTerminalPunct = false,
    minWordsPerLine = 30,
    lineBanSubstrings = Seq("javascript"),
    minKeptLines = 1,
    docBanSubstrings = Seq("lorem ipsum", "{"))

  private def keepLine(l: Column, rules: Rules): Column = {
    val words = size(split(trim(l), "\\s+")) >= rules.minWordsPerLine
    val punct =
      if (rules.requireTerminalPunct) l.rlike("[.!?\"]\\s*$") else lit(true)
    val bans = rules.lineBanSubstrings
      .map(b => !contains(lower(l), lit(b)))
      .foldLeft(lit(true))(_ && _)
    words && punct && bans
  }

  /** Clean any (doc_id, text) frame: per-document line counts + the
    * reassembled surviving text. Documents that fail the doc-level rules
    * are dropped (the gate composes like the other corpus filters). */
  def cleanLines(docs: DataFrame, rules: Rules): DataFrame = {
    val text = coalesce(col("text"), lit(""))
    val kept = filter(split(text, "\n"), l => keepLine(l, rules))
    val docBans = rules.docBanSubstrings
      .map(b => !contains(lower(text), lit(b)))
      .foldLeft(lit(true))(_ && _)
    docs
      .withColumn("__lines", split(text, "\n"))
      .withColumn("__kept", kept)
      .where(size(col("__kept")) >= rules.minKeptLines && docBans)
      .select(
        col("doc_id"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_lines_kept"),
        array_join(col("__kept"), "\n").as("cleaned_text"))
  }

  /** Registered query: [[fixtureRules]] over the `documents` table —
    * full DuckDB oracle (every rule is plain SQL in both engines). */
  def lineCleanedCorpus(spark: SparkSession, sfDir: String): DataFrame =
    cleanLines(spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text")), fixtureRules)
}

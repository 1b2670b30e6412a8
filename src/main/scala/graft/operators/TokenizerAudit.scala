package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols.spread

/** Cross-tokenizer audit over the triad ([[Bpe]], [[Wordpiece]],
  * [[UnigramLm]]) — the comparison table a tokenizer evaluation reads:
  * per algorithm, total tokens over the corpus, fertility (tokens per
  * word, exact integer micros — no float division), and how many distinct
  * pieces actually fire. Lower fertility at equal vocab budget = better
  * compression; pieces-used vs vocab size = budget utilization.
  *
  * Scale: three single-row aggregates over the per-doc token counts (the
  * standing tokenized tables) plus one over the corpus word counts — every
  * input is a partial-agg to one row; nothing corpus-sized moves. Oracle:
  * DuckDB re-aggregates the same three tokenized dumps.
  */
object TokenizerAudit {

  def fertilityCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val totalWords = spread(Tables.documents(spark, sfDir))
      .agg(sum(size(TextAnalysis.tokens(col("text")))).cast("long"))
      .head.getLong(0)
    // one exploded pass per tokenizer: the non-empty token count IS
    // sum(n_tokens), so totals and distinct-pieces come from a single
    // partial-aggregated count/count-distinct — no list collection
    def row(name: String, tokenized: DataFrame): DataFrame =
      tokenized
        .select(explode(split(col("tokenized"), " ")).as("token"))
        .filter(col("token") =!= "")
        .agg(count(lit(1)).cast("long").as("total_tokens"),
          count_distinct(col("token")).as("pieces_used"))
        .select(lit(name).as("tokenizer"), col("total_tokens"),
          expr(s"total_tokens * 1000000 DIV $totalWords")
            .as("fertility_micros"),
          col("pieces_used"))
    row("bpe", Bpe.tokenizedEntry(spark, sfDir))
      .unionByName(row("unigram", UnigramLm.tokenizedEntry(spark, sfDir)))
      .unionByName(row("wordpiece", Wordpiece.tokenizedEntry(spark, sfDir)))
  }
}

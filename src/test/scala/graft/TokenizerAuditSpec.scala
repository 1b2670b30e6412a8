package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TokenizerAudit, UnigramLm, Wordpiece}

/** Cross-tokenizer audit: totals and pieces must agree with each
  * tokenizer's own tables; fertility is the exact integer division. */
class TokenizerAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("fertilityCompare: one row per tokenizer, consistent with the standing tables") {
    val rows = TokenizerAudit.fertilityCompare(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("bpe", "unigram", "wordpiece"))
    val totalWords = graft.sources.Tables.documents(spark, sf)
      .agg(sum(size(graft.operators.TextAnalysis.tokens($"text"))).cast("long"))
      .head.getLong(0)
    def check(name: String, tokenized: org.apache.spark.sql.DataFrame,
        usage: org.apache.spark.sql.DataFrame): Unit = {
      val (total, fert, pieces) = rows(name)
      assert(total == tokenized.agg(sum($"n_tokens")).head.getLong(0),
        s"$name total")
      assert(fert == total * 1000000L / totalWords, s"$name fertility")
      assert(pieces == usage.count(), s"$name pieces")
      // fertility ≥ 1 token per word by construction (no tokenizer maps a
      // word to zero tokens)
      assert(fert >= 1000000L, s"$name fertility under 1: $fert")
    }
    check("bpe", Bpe.tokenizedEntry(spark, sf), Bpe.vocabUsageEntry(spark, sf))
    check("unigram", UnigramLm.tokenizedEntry(spark, sf),
      UnigramLm.vocabUsageEntry(spark, sf))
    check("wordpiece", Wordpiece.tokenizedEntry(spark, sf),
      Wordpiece.vocabUsageEntry(spark, sf))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.Cols._

/** Composed training-data pipelines: the operator families are most useful
  * chained, and this is the chain a real corpus build runs — deduplicate,
  * score, language-gate, emit the clean slice.
  */
object Pipelines {

  /** Clean-corpus selection: keep each exact-duplicate family's canonical
    * document, require a minimum quality score, and gate on detected
    * language.
    *
    * Plan shape: all three inputs key on doc_id, so after the first shuffle
    * the joins are co-partitioned (Catalyst reuses the exchange); the dedup
    * branch contributes one extra hash-agg shuffle on the content hash. At
    * 100 TB nothing here is pairwise — it is two hash-aggregates and
    * co-partitioned joins, all linear in the corpus.
    */
  def cleanCorpus(spark: SparkSession, sfDir: String,
      minQuality: Double = 0.45, lang: String = "en"): DataFrame = {
    val keep = Dedup.exactDedup(spark, sfDir)
      .select($"keep_doc_id".as("doc_id"))
    val quality = TextAnalysis.textStats(spark, sfDir)
      .select($"doc_id", $"quality_score")
    val language = TextAnalysis.langId(spark, sfDir)
      .select($"doc_id", $"lang_guess")
    keep
      .join(quality, "doc_id")
      .join(language, "doc_id")
      .filter($"quality_score" >= minQuality && $"lang_guess" === lang)
      .select($"doc_id", $"lang_guess", $"quality_score")
  }
}

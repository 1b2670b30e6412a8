package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols.spread

/** Byte-pair-encoding tokenization, learn + apply (Sennrich et al. 2016 —
  * the algorithm behind GPT/Llama-family tokenizers; north-star extension:
  * [[TextAnalysis.bpePairCounts]] exposed the first learn step as a
  * standalone count table, this is the full tokenizer).
  *
  * Scale design, the same split sentencepiece/HF trainers use:
  *  - **Learn** runs over the WORD-COUNT table, not the corpus: one
  *    corpus-wide `groupBy(word).count()` (linear, map-side combined),
  *    top-V collected to the driver (bounded: V·avg_word_len bytes), then
  *    the merge loop is pure driver-side arithmetic over ≤V entries.
  *    At 100 TB the corpus pass is one shuffle of distinct words; the
  *    iterative part never touches the cluster.
  *  - **Apply** broadcasts the merge-rank map (numMerges entries) and maps
  *    each document once — no shuffle, no driver involvement. Words repeat
  *    zipfian-style, so the per-partition memo cache turns most lookups
  *    into hash hits.
  *
  * Determinism: word counts are exact longs; each merge step picks the
  * max-count pair with lexicographic tie-break; top-V selection orders by
  * (count desc, word asc). No floats anywhere in learn or apply.
  *
  * Oracle strategy: BOTH stages are HASH-CHECKED. The LEARN loop is
  * replayed by a recursive CTE over the wrapped per-word segmentation
  * states (one round per merge, argmax pair by (count DESC, pair) — see
  * SparkEntry.learnLoopCtes; rows-only until r12). APPLY is a
  * deterministic single-path walk over the STATIC rank table, so the
  * per-doc tokenization is also replayed: DuckDB replays the greedy
  * lowest-rank-leftmost merging with a recursive CTE per distinct word
  * and reassembles documents by word ordinal (the [[Wordpiece]] replay
  * shape). The vocab-usage rollup re-aggregates the tokenized table. The
  * partition invariant (tokens concatenate back to the exact word stream)
  * is pinned in spec.
  */
object Bpe {

  /** Learn `numMerges` merges from a (word → count) table. Returns merges
    * in application order. */
  def learnMerges(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // each word as its current symbol sequence, weighted by count
    var words: Seq[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) i = numMerges
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += merged; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, c)
          }
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Apply learned merges to one word — classic greedy lowest-rank loop. */
  def applyMerges(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length >= 2) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        rank.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  private val defaultMerges = 50
  private val defaultVocab = 10000

  /** The ONE fixture learn per (process, sf dir): merges, tokenized dump,
    * and usage rollup must see the SAME table (the standing-model pattern). */
  private val standing =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, String)]]

  private def fixtureMerges(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    standing.getOrElseUpdate(sfDir, {
      import spark.implicits._
      val counts = spread(Tables.documents(spark, sfDir))
        .select(explode(TextAnalysis.tokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word")
        .limit(defaultVocab) // bounded driver footprint by construction
        .as[(String, Long)].collect().toSeq
      learnMerges(counts, defaultMerges)
    })

  /** Registered dump: the learned merge table in application order. */
  def mergesEntry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    fixtureMerges(spark, sfDir).zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Tokenize any (doc_id, text) frame with the given merges: per-doc
    * token count + the space-joined token stream (BPE sub-tokens come
    * from whitespace-split words, so they never contain a space). */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    docs.select($"doc_id", TextAnalysis.tokens($"text").as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val rank = rankB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        rows.map { case (id, words) =>
          val toks = words.flatMap(w => memo.getOrElseUpdate(w, applyMerges(w, rank)))
          (id, toks.length.toLong, toks.mkString(" "))
        }
      }
      .toDF("doc_id", "n_tokens", "tokenized")
  }

  /** Registered dump ({OUT}-oracle input): the fixture corpus tokenized
    * with the standing merges. */
  def tokenizedEntry(spark: SparkSession, sfDir: String): DataFrame =
    tokenize(spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text")), fixtureMerges(spark, sfDir))

  /** Registered query: corpus-wide vocab usage of the learned tokenizer —
    * which BPE tokens actually fire and how often (the table a tokenizer
    * audit reads). Oracle: DuckDB re-explodes the tokenized dump. */
  def vocabUsageEntry(spark: SparkSession, sfDir: String): DataFrame =
    tokenizedEntry(spark, sfDir)
      .select(explode(split(col("tokenized"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
}

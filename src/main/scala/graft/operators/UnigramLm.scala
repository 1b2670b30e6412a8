package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols.spread

/** Unigram-LM tokenization, learn + apply (Kudo 2018 — the SentencePiece
  * unigram model; with [[Bpe]] and [[Wordpiece]] this completes the three
  * subword families production tokenizers draw from).
  *
  * Same scale split as the siblings: **learn** is EM over the bounded
  * word-count table on the driver (one corpus `groupBy(word).count()`
  * shuffle; the lattice forward-backward never touches the cluster),
  * **apply** broadcasts the final piece log-probs and Viterbi-segments
  * each document in one map pass (zipfian memo per partition).
  *
  * Learn (simplified but faithful EM shape):
  *  1. seed = every substring (len ≤ 8) of the top-V words, scored by
  *     frequency·(len−1), capped at `seedSize` — plus all single chars
  *     (kept un-prunable so every word stays segmentable, the
  *     `character_coverage=1.0` contract);
  *  2. E-step: per word, forward-backward over the segmentation lattice
  *     accumulates each piece's expected count under the current probs;
  *  3. M-step: renormalize; prune the weakest multi-char pieces (lowest
  *     expected count, lexicographic tie-break) down the schedule until
  *     `vocabSize` remains.
  *
  * Apply = Viterbi with INTEGER micro log-probs (`round(ln p · 1e6)`, the
  * exact-BIGINT convention of [[Bm25]]/[[Sampling]]): dp over positions,
  * ties broken toward the smallest split point (= the longest final
  * piece). No float enters the apply, so the segmentation is bit-stable.
  *
  * Oracle strategy (the [[Wordpiece]] escalation, one step further): the
  * EM learn is a dump (mutating expected-count tables), but Viterbi is
  * dynamic programming over the STATIC dumped log-prob table, so the
  * per-doc segmentation is HASH-CHECKED — DuckDB carries the dp vector as
  * a LIST through a recursive CTE (one char per step), extracts piece
  * scores from a map built off the dump, reconstructs the argmax path with
  * the same smallest-i tie-break, and reassembles docs by word ordinal.
  */
object UnigramLm {

  /** Learn the unigram piece table. Returns (piece, logProbMicros),
    * log-probs micro-quantized for the exact-integer apply. */
  def learnVocab(wordCounts: Seq[(String, Long)], vocabSize: Int = 120,
      seedSize: Int = 2000, emRounds: Int = 4,
      maxPieceLen: Int = 8): Seq[(String, Long)] = {
    val chars = wordCounts.flatMap(_._1.toSeq).distinct.map(_.toString)
    // seed: substring pool scored by count·(len−1), single chars always in
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 2
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          subCounts(s) = subCounts.getOrElse(s, 0L) + c * (j - i - 1)
          j += 1
        }
        i += 1
      }
    }
    val seed = subCounts.toSeq
      .sortBy { case (s, c) => (-c, s) }.take(seedSize).map(_._1)
    var pieces: Set[String] = seed.toSet ++ chars
    // uniform init, then EM with a prune schedule down to vocabSize
    var probs: Map[String, Double] =
      pieces.iterator.map(p => p -> 1.0 / pieces.size).toMap
    var round = 0
    def prunable = pieces.size > vocabSize && pieces.exists(_.length > 1)
    while (round < emRounds || prunable) {
      // E-step: expected piece counts via forward-backward per word
      val expected = scala.collection.mutable.HashMap.empty[String, Double]
      wordCounts.foreach { case (w, c) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(0.0); alpha(0) = 1.0
        val beta = Array.fill(n + 1)(0.0); beta(n) = 1.0
        for (k <- 1 to n; i <- math.max(0, k - maxPieceLen) until k)
          probs.get(w.substring(i, k)).foreach(p => alpha(k) += alpha(i) * p)
        for (k <- n - 1 to 0 by -1;
            j <- k + 1 to math.min(n, k + maxPieceLen))
          probs.get(w.substring(k, j)).foreach(p => beta(k) += p * beta(j))
        val z = alpha(n)
        if (z > 0) {
          for (i <- 0 until n;
              j <- i + 1 to math.min(n, i + maxPieceLen)) {
            val s = w.substring(i, j)
            probs.get(s).foreach { p =>
              expected(s) = expected.getOrElse(s, 0.0) +
                c * alpha(i) * p * beta(j) / z
            }
          }
        }
      }
      // M-step: renormalize over surviving pieces
      val kept = pieces.iterator
        .map(p => p -> math.max(expected.getOrElse(p, 0.0), 1e-12)).toMap
      val total = kept.values.sum
      probs = kept.map { case (p, e) => p -> e / total }
      // prune the weakest 20% of multi-char pieces per round, never
      // overshooting vocabSize and never touching single chars
      if (prunable) {
        val multi = pieces.filter(_.length > 1).toSeq
          .sortBy(p => (probs(p), p)) // ascending: weakest first
        val nDrop = math.min(math.max(multi.size / 5, 1),
          pieces.size - vocabSize)
        val toDrop = multi.take(nDrop)
        pieces = pieces -- toDrop
        probs = probs -- toDrop
        val z2 = probs.values.sum
        probs = probs.map { case (p, v) => p -> v / z2 }
      }
      round += 1
    }
    pieces.toSeq.sorted
      .map(p => (p, math.round(math.log(probs(p)) * 1e6)))
  }

  /** Viterbi segmentation with integer micro log-probs; ties toward the
    * smallest split start (= longest last piece). `Seq("[UNK]")` only when
    * some character is outside the piece table. */
  def segment(word: String, lp: collection.Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val NEG = Long.MinValue / 4
    val dp = Array.fill(n + 1)(NEG); dp(0) = 0L
    val back = Array.fill(n + 1)(-1)
    var k = 1
    while (k <= n) {
      var i = math.max(0, k - maxPieceLen)
      while (i < k) {
        if (dp(i) > NEG) lp.get(word.substring(i, k)).foreach { s =>
          // strict > keeps the FIRST (smallest i) achiever — the tie-break
          // the DuckDB replay's list_position(first-occurrence) mirrors
          if (dp(i) + s > dp(k)) { dp(k) = dp(i) + s; back(k) = i }
        }
        i += 1
      }
      k += 1
    }
    if (dp(n) <= NEG) return Seq("[UNK]")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += word.substring(back(pos), pos); pos = back(pos) }
    out.reverse.toSeq
  }

  private val defaultVocabWords = 10000

  /** The ONE fixture learn per (process, sf dir) — the standing-model
    * pattern shared with [[Bpe]]/[[Wordpiece]]. */
  private val standing =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, Long)]]

  private def fixtureVocab(spark: SparkSession,
      sfDir: String): Seq[(String, Long)] =
    standing.getOrElseUpdate(sfDir, {
      import spark.implicits._
      val counts = spread(Tables.documents(spark, sfDir))
        .select(explode(TextAnalysis.tokens($"text")).as("word"))
        // defensive: an empty word contributes no chars and no substrings
        // to the seed, yet would occupy a top-V slot and shift the learned
        // probs — filter it before it can diverge the model hash
        .filter(length($"word") > 0)
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word")
        .limit(defaultVocabWords) // bounded driver footprint by construction
        .as[(String, Long)].collect().toSeq
      learnVocab(counts)
    })

  /** Registered dump (it IS the oracle input): the learned piece table
    * with micro-quantized log-probs. */
  def vocabEntry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    fixtureVocab(spark, sfDir).toDF("piece", "logp_micros")
  }

  /** Tokenize any (doc_id, text) frame: per-doc token count + the
    * space-joined Viterbi segmentation (whitespace words segment
    * independently; pieces never contain a space). */
  def tokenize(docs: DataFrame, vocab: Seq[(String, Long)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val maxLen = vocab.iterator.map(_._1.length).foldLeft(1)(math.max)
    val vb = spark.sparkContext.broadcast((vocab.toMap, maxLen))
    docs.select($"doc_id", TextAnalysis.tokens($"text").as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val (lp, ml) = vb.value
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        rows.map { case (id, words) =>
          val toks = words.flatMap(w =>
            memo.getOrElseUpdate(w, segment(w, lp, ml)))
          (id, toks.length.toLong, toks.mkString(" "))
        }
      }
      .toDF("doc_id", "n_tokens", "tokenized")
  }

  /** Registered query (HASH-CHECKED Viterbi replay — object scaladoc). */
  def tokenizedEntry(spark: SparkSession, sfDir: String): DataFrame =
    tokenize(spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text")), fixtureVocab(spark, sfDir))

  /** Registered query: corpus-wide piece usage (the audit rollup; the
    * tokenizer triad's entries share this shape). */
  def vocabUsageEntry(spark: SparkSession, sfDir: String): DataFrame =
    tokenizedEntry(spark, sfDir)
      .select(explode(split(col("tokenized"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
}

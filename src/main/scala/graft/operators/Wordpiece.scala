package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols.spread

/** WordPiece tokenization, learn + apply (Schuster & Nakajima 2012; the
  * greedy longest-match-first segmenter behind the BERT-family tokenizers;
  * north-star extension alongside [[Bpe]] — the two dominant subword
  * families a training-data pipeline meters text with).
  *
  * Same scale split as [[Bpe]] (the sentencepiece/HF trainer shape):
  *  - **Learn** runs over the corpus word-count table (one linear,
  *    map-side-combined `groupBy(word).count()`), top-V collected to the
  *    driver (bounded by construction), then the merge loop is driver-side
  *    arithmetic over ≤V entries. WordPiece's merge objective differs from
  *    BPE's: it picks the pair maximizing the LIKELIHOOD score
  *    `count(ab) / (count(a)·count(b))` rather than the raw pair count.
  *    The comparison is done in exact integer cross-multiplication
  *    (`BigInt(p₁)·c₂ₗ·c₂ᵣ vs BigInt(p₂)·c₁ₗ·c₁ᵣ`) — no float ever enters
  *    the learn, so the learned vocab is bit-stable across platforms.
  *  - **Apply** broadcasts the piece vocabulary and maps each document
  *    once — no shuffle, no driver involvement; zipfian word repetition
  *    makes the per-partition memo mostly hash hits.
  *
  * Apply semantics (the HF `WordpieceTokenizer` contract): per word, take
  * the LONGEST vocab piece matching at the cursor (continuation pieces —
  * dumped with `is_cont = 1`, conventionally spelled `##x` — match
  * everywhere except position 0); any position with no match, or a word
  * longer than `maxCharsPerWord`, maps the WHOLE word to `[UNK]`.
  *
  * Oracle strategy — stronger than [[Bpe]]'s: greedy longest-match is a
  * deterministic single-path recursion, so the per-doc tokenization is
  * HASH-CHECKED, not a dump. The vocab table is the oracle input
  * (the `ivf_assignments` contract) and DuckDB replays the exact greedy
  * walk with a recursive CTE (one row per (word, cursor), `QUALIFY` keeps
  * the longest matching piece), then reassembles documents by word
  * ordinal. Since r12 the LEARN stage is hash-checked too: the merge loop
  * replays round by round (SparkEntry.learnLoopCtes), with the BigInt
  * likelihood comparison reproduced as an exact scaled-HUGEINT floor
  * ratio (exactness argument at the wordpiece_vocab oracle).
  */
object Wordpiece {

  /** Learn a WordPiece vocabulary from a (word → count) table: initial
    * alphabet (first-position chars as plain pieces, the rest as
    * continuations) plus `numMerges` likelihood-scored merges. Returns
    * (piece, isCont) pairs, piece text WITHOUT the `##` spelling. */
  def learnVocab(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, Int)] = {
    // internal symbol spelling: continuations carry a "##" prefix
    var words: Seq[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else "##" + ch
      }.toArray, c)
    }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach { case (syms, _) => syms.foreach(vocab += _) }
    var i = 0
    while (i < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length) {
          symCounts(syms(j)) = symCounts.getOrElse(syms(j), 0L) + c
          if (j < syms.length - 1) {
            val k = (syms(j), syms(j + 1))
            pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          }
          j += 1
        }
      }
      if (pairCounts.isEmpty) i = numMerges
      else {
        // argmax of count(ab)/(count(a)*count(b)) by exact integer
        // cross-multiplication; lexicographic tie-break
        val best = pairCounts.toSeq.reduceLeft { (x, y) =>
          val ((xa, xb), xc) = x
          val ((ya, yb), yc) = y
          val lhs = BigInt(xc) * symCounts(ya) * symCounts(yb)
          val rhs = BigInt(yc) * symCounts(xa) * symCounts(xb)
          val cmp = lhs.compare(rhs)
          val tie = Ordering.Tuple2[String, String].compare((xa, xb), (ya, yb))
          if (cmp > 0 || (cmp == 0 && tie < 0)) x else y
        }._1
        val merged = best._1 + best._2.stripPrefix("##")
        vocab += merged
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 &&
                syms(j + 1) == best._2) { out += merged; j += 2 }
              else { out += syms(j); j += 1 }
            }
            (out.toArray, c)
          }
        }
        i += 1
      }
    }
    vocab.toSeq.map { s =>
      if (s.startsWith("##")) (s.substring(2), 1) else (s, 0)
    }
  }

  /** Greedy longest-match-first segmentation of one word. Pieces are the
    * (plain, continuation) sets WITHOUT `##` spelling; output tokens carry
    * the `##` spelling on continuations; failure → `Seq("[UNK]")`. */
  def segment(word: String, plain: Set[String], cont: Set[String],
      maxPieceLen: Int, maxCharsPerWord: Int = 100): Seq[String] = {
    if (word.length > maxCharsPerWord) return Seq("[UNK]")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val set = if (pos == 0) plain else cont
      var len = math.min(maxPieceLen, word.length - pos)
      var hit: String = null
      while (len >= 1 && hit == null) {
        val cand = word.substring(pos, pos + len)
        if (set(cand)) hit = cand else len -= 1
      }
      if (hit == null) return Seq("[UNK]")
      out += (if (pos == 0) hit else "##" + hit)
      pos += hit.length
    }
    out.toSeq
  }

  private val defaultMerges = 50
  private val defaultVocabWords = 10000

  /** The ONE fixture learn per (process, sf dir) — the standing-model
    * pattern shared with [[Bpe]]: vocab dump, tokenized table, and usage
    * rollup must all see the same learned pieces. */
  private val standing =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, Int)]]

  private def fixtureVocab(spark: SparkSession,
      sfDir: String): Seq[(String, Int)] =
    standing.getOrElseUpdate(sfDir, {
      import spark.implicits._
      val counts = spread(Tables.documents(spark, sfDir))
        .select(explode(TextAnalysis.tokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word")
        .limit(defaultVocabWords) // bounded driver footprint by construction
        .as[(String, Long)].collect().toSeq
      learnVocab(counts, defaultMerges)
    })

  /** Registered dump (it IS the oracle input): the learned piece table,
    * (piece, is_cont), piece text without the `##` spelling. */
  def vocabEntry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    fixtureVocab(spark, sfDir).toDF("piece", "is_cont")
  }

  /** Tokenize any (doc_id, text) frame with the given vocab: per-doc
    * token count + the space-joined token stream (whitespace-split words
    * segment independently; sub-tokens never contain a space). */
  def tokenize(docs: DataFrame, vocab: Seq[(String, Int)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val plain = vocab.collect { case (p, 0) => p }.toSet
    val cont = vocab.collect { case (p, 1) => p }.toSet
    val maxLen = vocab.iterator.map(_._1.length).foldLeft(1)(math.max)
    val vb = spark.sparkContext.broadcast((plain, cont, maxLen))
    docs.select($"doc_id", TextAnalysis.tokens($"text").as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val (pl, co, ml) = vb.value
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        rows.map { case (id, words) =>
          val toks = words.flatMap(w =>
            memo.getOrElseUpdate(w, segment(w, pl, co, ml)))
          (id, toks.length.toLong, toks.mkString(" "))
        }
      }
      .toDF("doc_id", "n_tokens", "tokenized")
  }

  /** Registered query (HASH-CHECKED — see object scaladoc): the fixture
    * corpus tokenized with the standing vocab. */
  def tokenizedEntry(spark: SparkSession, sfDir: String): DataFrame =
    tokenize(spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text")), fixtureVocab(spark, sfDir))

  /** Registered query: corpus-wide usage of the learned pieces — which
    * WordPiece tokens fire and how often (incl. `[UNK]`, the table that
    * tells a tokenizer audit its OOV rate). Oracle: DuckDB re-explodes the
    * tokenized dump. */
  def vocabUsageEntry(spark: SparkSession, sfDir: String): DataFrame =
    tokenizedEntry(spark, sfDir)
      .select(explode(split(col("tokenized"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
}

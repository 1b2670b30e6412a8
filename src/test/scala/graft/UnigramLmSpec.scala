package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, UnigramLm}

/** Unigram-LM (SentencePiece) learn + Viterbi apply: hand-checked dp,
  * tie-break, [UNK], learn invariants, fixture partition invariant. */
class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("segment: Viterbi argmax, smallest-split tie-break, [UNK] coverage") {
    val lp = Map("ab" -> -1000000L, "c" -> -2000000L, "a" -> -2500000L,
      "b" -> -2500000L, "abc" -> -3800000L)
    def seg(w: String) = UnigramLm.segment(w, lp, 3)
    // ab+c (-3.0M) beats abc (-3.8M) and a+b+c (-7.0M)
    assert(seg("abc") == Seq("ab", "c"))
    assert(seg("c") == Seq("c"))
    assert(seg("") == Seq.empty)
    // uncovered char anywhere → whole word [UNK]
    assert(seg("abq") == Seq("[UNK]"))
    // tie: "ab"+"ab" vs "a"+"b"+"ab"... construct an exact tie and pin the
    // smallest-split (longest-last-piece) winner: with x=-1M for both "d"
    // and "dd", "dd" can be d+d (-2M) or dd (-1M) — no tie; use equal
    // two-path scores: "ee" with e=-1M, ee=-2M ties d(e,e) vs (ee): the
    // dp max is -2M via BOTH paths; smallest split start i=1 picks "ee"
    val tie = Map("e" -> -1000000L, "ee" -> -2000000L)
    assert(UnigramLm.segment("ee", tie, 2) == Seq("ee"))
  }

  test("learnVocab: single chars kept, vocab capped, repetitive pieces survive EM") {
    val vocab = UnigramLm.learnVocab(
      Seq(("ababab", 50L), ("abab", 30L), ("xyz", 2L)), vocabSize = 12)
    val pieces = vocab.map(_._1).toSet
    // every char of the corpus stays segmentable
    assert(Set("a", "b", "x", "y", "z").subsetOf(pieces))
    assert(vocab.size <= 12)
    // EM keeps at least one multi-char "ab"-family piece for the
    // overwhelmingly repetitive corpus
    assert(pieces.exists(p => p.length > 1 && p.contains("ab")))
    // log-probs are valid (negative) micros and the dump is sorted+distinct
    assert(vocab.forall(_._2 < 0L))
    assert(vocab.map(_._1) == vocab.map(_._1).distinct.sorted)
  }

  test("fixture tokenize: partition invariant, no [UNK], usage conservation") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = UnigramLm.tokenizedEntry(spark, sf)
    assert(out.count() == docs.count())
    val joined = docs
      .select($"doc_id", TextAnalysis.tokens($"text").as("words"))
      .join(out, "doc_id")
      .as[(Long, Seq[String], Long, String)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, words, n, tokenized) =>
      val toks = if (tokenized.isEmpty) Seq.empty[String]
        else tokenized.split(" ").toSeq
      assert(toks.length.toLong == n, s"doc $id token count")
      // pieces concatenate back to the exact word stream: consume words
      // greedily (single-char coverage ⇒ no [UNK] on the learn corpus)
      val stream = words.mkString("")
      assert(toks.mkString("") == stream, s"doc $id reconstruction")
    }
    val usage = UnigramLm.vocabUsageEntry(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(!usage.exists(_._1 == "[UNK]"))
    assert(usage.map(_._2).sum == out.agg(sum($"n_tokens")).head.getLong(0))
    assert(usage.exists(_._1.length > 1)) // multi-char pieces actually fire
  }
}

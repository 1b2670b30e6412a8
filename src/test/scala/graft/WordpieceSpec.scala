package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, Wordpiece}

/** WordPiece learn + greedy apply: hand-computed likelihood merges,
  * longest-match-first semantics (incl. the greedy≠optimal case), [UNK]
  * rules, and the fixture partition invariant. */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  test("learnVocab: likelihood argmax with exact-integer compare and lexicographic ties") {
    // words: aab×4, ab×2. Initial counts a:6, ##a:4, ##b:6.
    // round 1: (a,##a)=4/(6·4) ties (##a,##b)=4/(4·6); lexicographic min is
    // ("##a","##b") ('#' < 'a') → piece ("ab", cont).
    // round 2: (a,##ab)=4/(6·4) ties (a,##b)=2/(6·2); "##ab" < "##b" →
    // piece ("aab", plain).
    val vocab = Wordpiece.learnVocab(Seq(("aab", 4L), ("ab", 2L)), 2)
    assert(vocab == Seq(("a", 0), ("a", 1), ("b", 1), ("ab", 1), ("aab", 0)))
  }

  test("segment: greedy longest-match-first, continuation gating, [UNK] rules") {
    val plain = Set("un", "u", "hap", "ab", "abc")
    val cont = Set("happi", "ly", "n", "h", "a", "p", "i", "l", "y", "d", "cd")
    def seg(w: String) = Wordpiece.segment(w, plain, cont, 5)
    assert(seg("unhappily") == Seq("un", "##happi", "##ly"))
    // greedy takes the longest FIRST piece even when a shorter one would
    // compose better later: abc+##d beats ab+##cd
    assert(seg("abcd") == Seq("abc", "##d"))
    // no plain piece starts 'x' → whole word is [UNK]
    assert(seg("xab") == Seq("[UNK]"))
    // stuck mid-word (no continuation 'q') → whole word is [UNK]
    assert(seg("unq") == Seq("[UNK]"))
    // over maxCharsPerWord → [UNK] without matching
    assert(Wordpiece.segment("ab" * 51, plain, cont, 5) == Seq("[UNK]"))
    // a plain piece never matches off position 0
    assert(seg("uun") == Seq("[UNK]"))
  }

  test("fixture tokenize: partition invariant and usage rollup consistency") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = Wordpiece.tokenizedEntry(spark, sf)
    assert(out.count() == docs.count())
    // every token stream re-concatenates to the word stream, word by word
    // ([UNK] absorbs exactly one word); n_tokens equals the stream length
    val joined = docs
      .select($"doc_id", TextAnalysis.tokens($"text").as("words"))
      .join(out, "doc_id")
      .as[(Long, Seq[String], Long, String)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, words, n, tokenized) =>
      val toks = if (tokenized.isEmpty) Seq.empty[String]
        else tokenized.split(" ").toSeq
      assert(toks.length.toLong == n, s"doc $id token count")
      // fold the stream back into words: a non-## token starts a word
      val rebuilt = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
      toks.foreach { t =>
        if (t.startsWith("##")) rebuilt.last.append(t.substring(2))
        else rebuilt += new StringBuilder(t)
      }
      assert(rebuilt.length == words.length, s"doc $id word count")
      rebuilt.map(_.toString).zip(words).foreach { case (r, w) =>
        assert(r == w || r == "[UNK]", s"doc $id: $r != $w")
      }
    }
    // the corpus was learned on itself with a full initial alphabet, so
    // nothing is OOV — and the usage rollup conserves the token count
    val usage = Wordpiece.vocabUsageEntry(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(!usage.exists(_._1 == "[UNK]"))
    assert(usage.map(_._2).sum ==
      out.agg(sum($"n_tokens")).head.getLong(0))
    // merges actually fire: some multi-char piece is used
    assert(usage.exists(u => u._1.stripPrefix("##").length > 1))
  }
}

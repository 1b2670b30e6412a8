package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SetOpsImpl, TextHashImpl}

/** Pins the sorted-merge verify core introduced in optimization round 18:
  * the *Sorted producers emit the SAME SET as their first-occurrence-order
  * twins (ascending), and `sortedIntersectSize` over them equals the
  * HashSet-based `intersectSize` over the originals — so every Jaccard
  * verify that switched producers computes bit-identical `inter`/`size`
  * arithmetic. Deterministic pseudo-random corpus incl. multi-byte UTF-8,
  * repeats, short/empty texts. */
class SortedSetOpsSpec extends AnyFunSuite {

  private def strings(ad: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)

  private val texts: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde éß👍 xyz"
    (0 until 200).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "ab", "aaaaa", "the the the the", "é👍é👍é👍é👍")
  }

  test("shinglesSorted: same set as shingles, ascending order") {
    for (t <- texts; n <- Seq(3, 5)) {
      val u = UTF8String.fromString(t)
      val plain = strings(TextHashImpl.shingles(u, n))
      val sorted = strings(TextHashImpl.shinglesSorted(u, n))
      assert(sorted == plain.sorted, s"set/order mismatch on '$t'")
      assert(sorted.toSet == plain.toSet)
    }
  }

  test("tokenNgramsSorted: same set as tokenNgrams, ascending order") {
    for (t <- texts; n <- Seq(2, 3)) {
      val u = UTF8String.fromString(t)
      val plain = strings(TextHashImpl.tokenNgrams(u, n))
      val sorted = strings(TextHashImpl.tokenNgramsSorted(u, n))
      assert(sorted == plain.sorted, s"set/order mismatch on '$t'")
    }
  }

  test("sortedIntersectSize == intersectSize on every text pair") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 300).map { _ =>
      (texts(rnd.nextInt(texts.length)), texts(rnd.nextInt(texts.length)))
    }
    for ((a, b) <- pairs) {
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val viaHash = SetOpsImpl.intersectSize(
        TextHashImpl.shingles(ua, 5), TextHashImpl.shingles(ub, 5))
      val viaMerge = SetOpsImpl.sortedIntersectSize(
        TextHashImpl.shinglesSorted(ua, 5), TextHashImpl.shinglesSorted(ub, 5))
      assert(viaMerge == viaHash, s"intersect mismatch on '$a' vs '$b'")
      val gHash = SetOpsImpl.intersectSize(
        TextHashImpl.tokenNgrams(ua, 3), TextHashImpl.tokenNgrams(ub, 3))
      val gMerge = SetOpsImpl.sortedIntersectSize(
        TextHashImpl.tokenNgramsSorted(ua, 3), TextHashImpl.tokenNgramsSorted(ub, 3))
      assert(gMerge == gHash, s"gram intersect mismatch on '$a' vs '$b'")
    }
  }
}

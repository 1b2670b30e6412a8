package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` extensions (SURVEY.md §2.7 — the one custom-agg
  * surface the engine exposes; everything else is built-ins).
  */
object Aggregators {

  /** One candidate held by [[BottomKByHash]]: the md5 hex of the value and
    * the value itself (hash first so tuple ordering is the sample order). */
  final case class HashEntry(h: String, v: String)

  /** Deterministic per-group sample: the `k` values with the smallest
    * `md5(value)` — the group-level counterpart of the row-level hash gate
    * ([[graft.operators.Sampling.hashGate]]). Because md5 is uniform, the
    * result is a uniform sample of the group's distinct values, yet a pure
    * function of the value set: stable across runs, partitionings, and
    * engines (DuckDB reproduces it as a row_number over md5 ordering).
    *
    * Scale: this is a MERGEABLE partial aggregate — each task keeps at most
    * k entries per group and merges are take-k of a merge-sort, so the
    * shuffle carries O(groups × k), not O(distinct values). The window
    * (`row_number() OVER (ORDER BY md5)` ≤ k) formulation computes the same
    * rows but must shuffle-sort EVERY distinct value to its group first —
    * the same partial-vs-total distinction as partial top-k vs global sort.
    * Feed it pre-distinct input: duplicate values would occupy multiple of
    * the k slots (entries dedupe exactly, so exact dups collapse, but that
    * is a guarantee about ties, not a distinct-ness guarantee).
    *
    * The buffer is kept sorted, distinct, and ≤ k at all times, so `reduce`
    * is a bounded O(k) insertion (usually an O(1) reject once the group has
    * seen k small hashes) and `merge` is a single merge-take-k pass — no
    * per-row re-sort or `distinct` allocation.
    */
  final class BottomKByHash(k: Int) extends Aggregator[String, Seq[HashEntry], Seq[String]] {
    require(k > 0, s"k must be positive, got $k")

    private val ord: Ordering[HashEntry] = Ordering.by((e: HashEntry) => (e.h, e.v))

    private def md5hex(s: String): String = {
      val d = MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(32)
      d.foreach { b =>
        sb.append(Character.forDigit((b >> 4) & 0xf, 16))
        sb.append(Character.forDigit(b & 0xf, 16))
      }
      sb.toString
    }

    override def zero: Seq[HashEntry] = Nil

    override def reduce(b: Seq[HashEntry], v: String): Seq[HashEntry] = {
      if (v == null) return b
      val e = HashEntry(md5hex(v), v)
      // Full buffer and e doesn't beat the current worst: reject without
      // touching the buffer (equality with the worst is an exact dup).
      if (b.length == k && ord.gteq(e, b.last)) return b
      val i = b.indexWhere(x => ord.gteq(x, e))
      if (i >= 0 && b(i) == e) b // exact dup collapses
      else {
        val pos = if (i < 0) b.length else i
        val grown = (b.take(pos) :+ e) ++ b.drop(pos)
        if (grown.length > k) grown.take(k) else grown
      }
    }

    override def merge(a: Seq[HashEntry], b: Seq[HashEntry]): Seq[HashEntry] = {
      // Both sides satisfy the sorted-distinct-≤k invariant; one merge pass.
      val out = scala.collection.mutable.ArrayBuffer.empty[HashEntry]
      var i = 0
      var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        if (j >= b.length) { out += a(i); i += 1 }
        else if (i >= a.length) { out += b(j); j += 1 }
        else {
          val c = ord.compare(a(i), b(j))
          if (c < 0) { out += a(i); i += 1 }
          else if (c > 0) { out += b(j); j += 1 }
          else { out += a(i); i += 1; j += 1 } // same entry on both sides
        }
      }
      out.toSeq
    }
    override def finish(b: Seq[HashEntry]): Seq[String] = b.map(_.v)
    override def bufferEncoder: Encoder[Seq[HashEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashEntry]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** One SpaceSaving counter: estimated count (an OVERestimate) and the
    * maximum overestimation error (true count ∈ [count − err, count]). */
  final case class SSCounter(item: String, count: Long, err: Long)

  /** SpaceSaving heavy-hitter sketch (Metwally et al. 2005) — the
    * bounded-memory scale path of the exact wordcount: each task tracks at
    * most `capacity` counters over its partition of the stream; when a new
    * item arrives at a full buffer it takes over the MINIMUM counter
    * (count+1, err = that minimum) — the classic guarantee: every item with
    * true frequency > N/capacity is present, and each tracked count
    * overestimates by at most its recorded `err`.
    *
    * This is a MERGEABLE partial aggregate in the Agarwal et al. 2012
    * "Mergeable Summaries" sense: `merge` pointwise-sums (count, err) over
    * the union (overestimates stay overestimates) and truncates back to
    * `capacity` keeping the largest counts — so the shuffle carries
    * O(tasks × capacity), never O(distinct items), which is the whole point
    * at 100 TB vocabulary scale (the exact form must shuffle every distinct
    * token). Truncation drops only counters whose count is below the
    * capacity-th largest — items a heavy hitter can't be hiding under once
    * capacity ≳ 2-4× the wanted top-K.
    *
    * Determinism: eviction picks the (count, item)-smallest counter and
    * truncation keeps the (−count, item)-first `capacity`, so ties never
    * depend on map iteration order. Results are exactly the true counts
    * (err 0) whenever a task sees ≤ `capacity` distinct items — in that
    * regime the sketch is partition-order independent and byte-stable
    * (the registered entry's fixture regime; the eviction regime is pinned
    * by spec with error-bound assertions instead).
    */
  final class SpaceSavingTopK(capacity: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[SSCounter]] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(b: Map[String, (Long, Long)], v: String): Map[String, (Long, Long)] = {
      if (v == null) return b
      b.get(v) match {
        case Some((c, e)) => b.updated(v, (c + 1, e))
        case None if b.size < capacity => b.updated(v, (1L, 0L))
        case None =>
          // take over the minimum counter (deterministic tie: smallest item)
          val (mi, (mc, _)) = b.minBy { case (i, (c, _)) => (c, i) }
          (b - mi).updated(v, (mc + 1, mc))
      }
    }

    override def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      val union = (a.keySet ++ b.keySet).iterator.map { k =>
        val (c1, e1) = a.getOrElse(k, (0L, 0L))
        val (c2, e2) = b.getOrElse(k, (0L, 0L))
        k -> (c1 + c2, e1 + e2)
      }.toMap
      if (union.size <= capacity) union
      else union.toSeq
        .sortBy { case (i, (c, _)) => (-c, i) }
        .take(capacity).toMap
    }

    override def finish(b: Map[String, (Long, Long)]): Seq[SSCounter] =
      b.toSeq.sortBy { case (i, (c, _)) => (-c, i) }
        .map { case (i, (c, e)) => SSCounter(i, c, e) }

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[SSCounter]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSCounter]]()
  }

}

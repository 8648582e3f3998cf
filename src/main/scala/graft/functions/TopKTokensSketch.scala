package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bounded-memory top-k tokens: the space-saving / Misra-Gries
  * summary (Metwally, Agrawal, El Abbadi 2005) behind the same
  * Aggregator interface as the exact [[TopKTokens]] — the documented
  * sketch swap for open vocabularies, where the exact count map
  * grows with |distinct tokens| but this buffer never exceeds
  * `capacity` entries.
  *
  * Single-stream guarantees (capacity m, stream length N): every
  * token with true count > N/m is present, and each kept estimate
  * overcounts its true count by at most the recorded `err` ≤ N/m.
  * Merging partition summaries (Agarwal et al. 2012, mergeable
  * summaries) adds the two sketches and re-prunes to capacity,
  * preserving count-error ≤ N/m of the COMBINED stream. Estimates
  * (not exact counts) — rank ties near the error bound can reorder
  * vs exact; choose capacity ≫ k (e.g. 8-16x) so the head is stable.
  */
case class TopKTokensSketch(k: Int, capacity: Int)
  extends Aggregator[String, mutable.HashMap[String, (Long, Long)], Seq[TokenEstimate]] {
  require(capacity >= k, "capacity must be at least k")

  /** token → (estimated count, max overcount error) */
  override def zero: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, (Long, Long)],
                      a: String): mutable.HashMap[String, (Long, Long)] = {
    if (a != null) {
      b.get(a) match {
        case Some((n, e)) => b.update(a, (n + 1L, e))
        case None if b.size < capacity => b.update(a, (1L, 0L))
        case None =>
          // evict the current minimum; the newcomer inherits its
          // estimate as upper bound (the space-saving step)
          val (minTok, (minN, _)) = b.minBy { case (t, (n, _)) => (n, t) }
          b.remove(minTok)
          b.update(a, (minN + 1L, minN))
      }
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, (Long, Long)],
                     b2: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // Space-saving invariant: in a FULL buffer, any absent token's
    // true count in that buffer's substream is <= the buffer's
    // minimum estimate (it was evicted at or below it, or never
    // entered). A token present in only one buffer may therefore
    // have up to `floor(other)` uncounted occurrences in the other
    // substream — credit it (to est AND err) or the documented
    // `true <= est` upper bound breaks on multi-partition data.
    def floor(b: mutable.HashMap[String, (Long, Long)]): Long =
      if (b.size >= capacity) b.valuesIterator.map(_._1).min else 0L
    val f1 = floor(b1)
    val f2 = floor(b2)
    val out = mutable.HashMap.empty[String, (Long, Long)]
    b1.foreach { case (t, (n1, e1)) =>
      b2.get(t) match {
        case Some((n2, e2)) => out.update(t, (n1 + n2, e1 + e2))
        case None => out.update(t, (n1 + f2, e1 + f2))
      }
    }
    b2.foreach { case (t, (n2, e2)) =>
      if (!b1.contains(t)) out.update(t, (n2 + f1, e2 + f1))
    }
    if (out.size > capacity) {
      // keep the `capacity` largest estimates; every entry has
      // est >= f1 + f2, so the post-prune minimum still upper-bounds
      // any absent token's combined true count — the invariant holds
      // inductively for further merges.
      val sorted = out.toSeq.sortBy { case (t, (n, _)) => (-n, t) }(
        Ordering.Tuple2(Ordering.Long, TokenOrder.utf8))
      out.clear()
      sorted.take(capacity).foreach { case (t, v) => out.update(t, v) }
    }
    out
  }

  override def finish(b: mutable.HashMap[String, (Long, Long)]): Seq[TokenEstimate] =
    b.toSeq.sortBy { case (t, (n, _)) => (-n, t) }(
        Ordering.Tuple2(Ordering.Long, TokenOrder.utf8)).take(k)
      .map { case (t, (n, e)) => TokenEstimate(t, n, e) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, (Long, Long)]] =
    Encoders.kryo[mutable.HashMap[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[TokenEstimate]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenEstimate]]()
}

/** `est` upper-bounds the true count; `est - err` lower-bounds it. */
case class TokenEstimate(token: String, est: Long, err: Long)

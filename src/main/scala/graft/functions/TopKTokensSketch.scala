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
    b2.foreach { case (t, (n2, e2)) =>
      b1.get(t) match {
        case Some((n1, e1)) => b1.update(t, (n1 + n2, e1 + e2))
        case None => b1.update(t, (n2, e2))
      }
    }
    if (b1.size > capacity) {
      // keep the `capacity` largest estimates; survivors absorb the
      // largest evicted estimate into their error bound
      val sorted = b1.toSeq.sortBy { case (t, (n, _)) => (-n, t) }
      val evictedMax = sorted.drop(capacity).headOption.map(_._2._1).getOrElse(0L)
      b1.clear()
      sorted.take(capacity).foreach { case (t, (n, e)) =>
        b1.update(t, (n, math.min(e + evictedMax, n - 1L).max(e)))
      }
    }
    b1
  }

  override def finish(b: mutable.HashMap[String, (Long, Long)]): Seq[TokenEstimate] =
    b.toSeq.sortBy { case (t, (n, _)) => (-n, t) }.take(k)
      .map { case (t, (n, e)) => TokenEstimate(t, n, e) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, (Long, Long)]] =
    Encoders.kryo[mutable.HashMap[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[TokenEstimate]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenEstimate]]()
}

/** `est` upper-bounds the true count; `est - err` lower-bounds it. */
case class TokenEstimate(token: String, est: Long, err: Long)

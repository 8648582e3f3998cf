package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed `Aggregator[IN, BUF, OUT]` demonstrating the custom
  * aggregate tier: exact per-group top-k items by count.
  *
  * Buffer = exact count map merged associatively, so the result is
  * independent of partitioning/arrival order (unlike space-saving
  * sketches); output is deterministically ordered (count desc, then
  * item). Memory is bounded by distinct items per group — for
  * open-ended domains at 100 TB swap the buffer for a space-saving /
  * count-min sketch behind the same Aggregator interface.
  */
case class TopKTokens(k: Int) extends Aggregator[String, mutable.HashMap[String, Long], Seq[TokenCount]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
    if (a != null) b.update(a, b.getOrElse(a, 0L) + 1L)
    b
  }

  override def merge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, n) => b1.update(t, b1.getOrElse(t, 0L) + n) }
    b1
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[TokenCount] =
    b.toSeq.sortBy { case (t, n) => (-n, t) }(
        Ordering.Tuple2(Ordering.Long, TokenOrder.utf8)).take(k)
      .map { case (t, n) => TokenCount(t, n) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenCount]]()
}

case class TokenCount(token: String, n: Long)

/** Tie-break ordering for token strings: UTF-8 byte order (= code
  * POINT order), matching Spark SQL's UTF8String comparison and
  * DuckDB's binary collation. Java's String.compareTo sorts by
  * UTF-16 code UNITS, which disagrees for supplementary-plane
  * characters vs U+E000..U+FFFF — a latent divergence between an
  * aggregator-side sort and a `ORDER BY n DESC, token` oracle.
  */
object TokenOrder {
  val utf8: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

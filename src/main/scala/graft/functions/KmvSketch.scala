package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
  * theta-sketch family, Dasgupta et al. 2016) — the mergeable
  * distinct-count summary that, unlike HLL, also supports SET
  * OPERATIONS: union, and crucially INTERSECTION overlap estimates
  * across segments ("distinct customers active in BOTH halves").
  *
  * The sketch is the k smallest xxhash64 values of the key set,
  * kept in unsigned order. Fully deterministic: the hash is fixed
  * and min-k is order-independent, so merge order across partitions
  * cannot change the result — estimates are bit-stable run to run
  * (unlike sampled sketches). Values are stored sign-flipped
  * (`h ^ Long.MinValue`) so SIGNED ordering — what array_sort and
  * `<` give us in SQL — equals unsigned ordering of the raw hash.
  *
  * Estimators (θ = k-th min as a fraction of the hash space):
  *  - distinct(A) = (k-1)/θ_A, RSE ≈ 1/√(k-2);
  *  - sketches with fewer than k entries hold EVERY distinct hash →
  *    the estimate is exact (modulo 64-bit collisions);
  *  - A∩B: count common hashes below the union sketch's θ, divide
  *    by θ — the theta-sketch intersection.
  *
  * Post-aggregation set ops are plain array HOFs over ≤k-element
  * arrays on a handful of grouped rows — CodegenFallback there is
  * irrelevant; the per-row hot path is just xxhash64 feeding a
  * bounded TreeSet. At 100 TB: per-shard sketches persist as
  * array<bigint> columns and roll up with [[Kmv.unionSketch]] —
  * the pre-aggregated-sketch-table pattern HLL columns support for
  * counts but not for overlaps.
  */
case class KmvSketch(k: Int)
  extends Aggregator[java.lang.Long, mutable.HashSet[Long], Seq[Long]] {
  require(k >= 16, "k < 16 has useless variance")

  // Buffer is an UNSORTED distinct set compacted to the k smallest
  // whenever it reaches 4k — O(1) amortized per row (a tree insert
  // per row would be the hot-path cost; Kryo also round-trips
  // HashSet faithfully where sorted sets lose their class).
  private def compact(b: mutable.HashSet[Long]): mutable.HashSet[Long] =
    if (b.size <= k) b
    else {
      val kept = b.toArray
      java.util.Arrays.sort(kept)
      val out = mutable.HashSet.empty[Long]
      var i = 0
      while (i < k) { out += kept(i); i += 1 }
      out
    }

  override def zero: mutable.HashSet[Long] = mutable.HashSet.empty[Long]

  override def reduce(b: mutable.HashSet[Long], h: java.lang.Long): mutable.HashSet[Long] = {
    if (h != null) {
      b += (h.longValue ^ Long.MinValue)
      if (b.size >= 4 * k) compact(b) else b
    } else b
  }

  override def merge(a: mutable.HashSet[Long], b: mutable.HashSet[Long]): mutable.HashSet[Long] =
    compact(a ++= b)

  /** Ascending (unsigned-order) flipped hashes, ≤ k of them. */
  override def finish(b: mutable.HashSet[Long]): Seq[Long] = {
    val arr = compact(b).toArray
    java.util.Arrays.sort(arr)
    arr.toSeq
  }

  override def bufferEncoder: Encoder[mutable.HashSet[Long]] =
    Encoders.kryo[mutable.HashSet[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object Kmv {

  /** Aggregation column: KMV sketch of `key`'s distinct values.
    * Nulls are skipped (consistent with [[sketchIf]] and with
    * `count(distinct …)` semantics): xxhash64 never returns null —
    * hashing a null yields the seed — so the null test must gate the
    * hash, or a null key would count as one phantom distinct value.
    */
  def sketch(key: Column, k: Int): Column =
    udaf(KmvSketch(k)).apply(when(key.isNotNull, xxhash64(key)))

  /** Conditional sketch in a single aggregation pass — rows failing
    * `cond` contribute a null hash, which the aggregator skips. The
    * hash is applied INSIDE the when (xxhash64 itself never returns
    * null — hashing a null yields the seed — so the condition must
    * gate the hash, not the key).
    */
  def sketchIf(cond: Column, key: Column, k: Int): Column =
    udaf(KmvSketch(k)).apply(when(cond, xxhash64(key)))

  /** Fraction of the hash space below a flipped hash value — θ. */
  private def frac(flipped: Column): Column =
    (flipped.cast("double") + lit(9.223372036854775808e18)) /
      lit(1.8446744073709551616e19)

  /** Merged sketch of two sketches (the rollup op): distinct-union,
    * re-sorted, trimmed back to k.
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Distinct-count estimate. Sketches smaller than k saw every
    * distinct hash → return the exact size.
    */
  def estimate(s: Column, k: Int): Column =
    when(size(s) < k, size(s).cast("double"))
      .otherwise(lit((k - 1).toDouble) / frac(element_at(s, k)))

  /** Theta-sketch intersection estimate |A∩B|: common hashes below
    * the union's θ (STRICTLY below — θ itself is the first value
    * known to be outside the k-sample, so a common hash equal to the
    * boundary must not count), scaled by 1/θ. Exact when both sides
    * are undersampled (sketches < k ⇒ θ = 1 and every hash is
    * present). The raw estimator is unbiased but unbounded above —
    * one lucky common hash under a tiny θ can imply an intersection
    * larger than either side — so the estimate is clamped to
    * `min(estimate(a), estimate(b))`, which the true cardinality can
    * never exceed; KmvSpec property-tests 0 ≤ est ≤ min(estimates)
    * across adversarial overlap fractions.
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val u = unionSketch(a, b, k)
    val common = array_intersect(a, b)
    when(size(u) < k, size(common).cast("double"))
      .otherwise {
        val boundary = element_at(u, k)
        least(
          size(filter(common, x => x < boundary)).cast("double") / frac(boundary),
          estimate(a, k), estimate(b, k))
      }
  }

  /** Union distinct-count estimate from the merged sketch. */
  def unionEstimate(a: Column, b: Column, k: Int): Column =
    estimate(unionSketch(a, b, k), k)
}

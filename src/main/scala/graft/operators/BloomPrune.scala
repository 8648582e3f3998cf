package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — drop fact rows whose join key
  * cannot match BEFORE the shuffle, so the exchange moves only rows
  * that stand a chance of surviving the join.
  *
  * This is the manual, composable form of Spark's own runtime bloom
  * filter (`spark.sql.optimizer.runtime.bloomFilter.*`, which only
  * fires when the build side is already being shuffled and passes its
  * selectivity heuristics). We reuse the engine's matched insert/probe
  * pair — [[BloomFilterAggregate]] to build, [[BloomFilterMightContain]]
  * to probe — so the probe is the same codegen'd predicate the
  * injected runtime filter uses, and hashing (xxhash64 on both sides)
  * is consistent by construction.
  *
  * Scale model (100 TB fact, selective dim): the bloom is built with a
  * distributed aggregation over the dim keys (one tiny shuffle of
  * partial sketches), lands on the driver as a single bounded binary
  * (`optimalNumOfBits(n, fpp)` bits ≈ 1.2 MB per 1M keys at 1% fpp —
  * the same order as Spark's own runtime-filter cap of 8 MB), and is
  * embedded in the plan as a foldable literal, so every fact-scan task
  * probes it with zero extra exchanges. False positives only cost
  * wasted shuffle bytes — the join itself removes them, so results are
  * EXACTLY the plain join's (q141's oracle is that plain join).
  * There are no false negatives: every true key was inserted.
  */
object BloomPrune {

  /** Build a serialized bloom filter over `small`'s `key` column.
    * Distributed build: partial sketches merge in one aggregation;
    * only the final ~`optimalNumOfBits(expected, fpp)`-bit sketch is
    * collected (bounded metadata, not data).
    */
  def bloomOf(small: DataFrame, key: String,
              expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val hashed = XxHash64(Seq(GraftShim.expression(col(key))), 42L)
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // Null dim keys never join, so they must not be inserted: XxHash64
    // is non-nullable (null hashes to the seed), and an inserted seed
    // hash would make every null fact key "might match".
    val row = small.filter(col(key).isNotNull)
      .select(GraftShim.column(agg).as("bf")).head()
    row.getAs[Array[Byte]]("bf")
  }

  /** Codegen'd membership probe: `might_contain(bloom, xxhash64(key))`
    * with the sketch embedded as a foldable binary literal (the same
    * plan shape Spark's InjectRuntimeFilter produces, minus the
    * scalar subquery). The probe is explicitly null-guarded: XxHash64
    * never returns null (a null key hashes to the seed), so without
    * the guard a null fact key could probe `true` on a false positive.
    * `when(isNotNull, …)` yields null for null keys → `filter` drops
    * them, honoring inner-equi-join semantics (null never joins).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    when(key.isNotNull, GraftShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(GraftShim.expression(key)), 42L))))

  /** `big` minus the rows whose `bigKey` is provably absent from the
    * bloom. Pure narrow filter — sits under the downstream exchange.
    */
  def prune(big: DataFrame, bloom: Array[Byte], bigKey: String): DataFrame =
    big.filter(mightContain(bloom, col(bigKey)))

  /** The full pattern: bloom the dim keys, prune the fact, then join.
    * Equals `big.join(small, bigKey === smallKey)` row-for-row (inner
    * join absorbs bloom false positives).
    */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = bloomOf(small, smallKey, expectedItems, fpp)
    prune(big, bf, bigKey)
      .join(small, col(bigKey) === col(smallKey))
  }

  /** Selectivity report for sizing decisions: fact rows before/after
    * the prune and the pass rate. Run this at a sampled scale before
    * committing to a fpp/size at 100 TB.
    */
  def pruneStats(big: DataFrame, bloom: Array[Byte], bigKey: String): DataFrame =
    big.agg(
      count(lit(1)).as("rows_in"),
      sum(when(mightContain(bloom, col(bigKey)), 1L).otherwise(0L)).as("rows_kept"))
      .select(col("rows_in"), col("rows_kept"),
        (col("rows_kept").cast("double") / col("rows_in")).as("pass_rate"))
}

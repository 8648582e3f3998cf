package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing (pandas `qcut`): assign each row the quartile/
  * decile/... bucket of a numeric column.
  *
  * The textbook Spark form is `ntile(k)` over a global ORDER BY —
  * which plans a SINGLE-partition window: every row funnels through
  * one task, the exact shape that dies first at 100 TB. This is the
  * scale-safe equivalent: one distributed aggregate computes the
  * k-1 exact quantile thresholds (`percentile`, the same linear
  * interpolation as pandas/DuckDB `quantile_cont`), then bucketing
  * is a pure map-side comparison — no global sort, no row movement
  * at all beyond the threshold aggregate's own reduction.
  *
  * Semantics vs ntile: ntile balances COUNTS exactly (splitting ties
  * arbitrarily across buckets); qcut buckets by VALUE thresholds, so
  * ties land in one bucket and bucket sizes wobble with ties —
  * that is pandas' qcut behavior and the deterministic one (a row's
  * bucket depends only on its value, not on partition layout).
  */
object QCut {

  /** Add `bucketCol` (1..k, LongType) bucketing `valueCol` by its
    * exact k-quantile thresholds: bucket = 1 + |{i : v > q_i}| for
    * the k-1 interior quantiles. Null values get a null bucket.
    */
  def qcut(df: DataFrame, valueCol: Column, k: Int, bucketCol: String): DataFrame = {
    require(k >= 2, s"qcut needs k >= 2, got $k")
    val qs = (1 until k).map(i => i.toDouble / k)
    def thresholdAggs = qs.zipWithIndex.map { case (q, i) =>
      expr(s"percentile(__qcut_v, $q)").as(s"__q$i")
    }
    // the thresholds frame is ONE row — broadcast it to every task
    // and classify map-side
    val withV = df.withColumn("__qcut_v", valueCol)
    val joined = withV.crossJoin(broadcast(
      withV.select(col("__qcut_v")).agg(thresholdAggs.head, thresholdAggs.tail: _*)))
    val bucket = (0 until k - 1).foldLeft(lit(1L)) { case (acc, i) =>
      acc + when(col("__qcut_v") > col(s"__q$i"), 1L).otherwise(0L)
    }
    joined
      .withColumn(bucketCol, when(col("__qcut_v").isNotNull, bucket))
      .drop((0 until k - 1).map(i => s"__q$i") :+ "__qcut_v": _*)
  }
}

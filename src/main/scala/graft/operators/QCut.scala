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
  def qcut(df: DataFrame, valueCol: Column, k: Int, bucketCol: String): DataFrame =
    qcutMany(df, Seq((valueCol, bucketCol)), k)

  /** [[qcut]] over several columns at once — ONE threshold aggregate
    * computes every column's k-1 quantiles in a single scan of `df`
    * (chained single-column qcuts would each re-scan), then one
    * broadcast of the 1-row threshold frame serves all the map-side
    * classifications.
    */
  def qcutMany(df: DataFrame, cuts: Seq[(Column, String)], k: Int): DataFrame = {
    require(k >= 2, s"qcut needs k >= 2, got $k")
    require(cuts.nonEmpty, "qcut needs at least one (value, bucket) pair")
    val qs = (1 until k).map(i => i.toDouble / k)
    val withV = cuts.zipWithIndex.foldLeft(df) { case (d, ((v, _), c)) =>
      d.withColumn(s"__qcut_v$c", v)
    }
    val thresholdAggs = cuts.indices.flatMap { c =>
      qs.zipWithIndex.map { case (q, i) =>
        expr(s"percentile(__qcut_v$c, $q)").as(s"__q${c}_$i")
      }
    }
    // the thresholds frame is ONE row — broadcast it to every task
    // and classify map-side
    val joined = withV.crossJoin(broadcast(
      withV.select(cuts.indices.map(c => col(s"__qcut_v$c")): _*)
        .agg(thresholdAggs.head, thresholdAggs.tail: _*)))
    val bucketed = cuts.zipWithIndex.foldLeft(joined) { case (d, ((_, b), c)) =>
      val bucket = (0 until k - 1).foldLeft(lit(1L)) { case (acc, i) =>
        acc + when(col(s"__qcut_v$c") > col(s"__q${c}_$i"), 1L).otherwise(0L)
      }
      d.withColumn(b, when(col(s"__qcut_v$c").isNotNull, bucket))
    }
    bucketed.drop(cuts.indices.flatMap(c =>
      (0 until k - 1).map(i => s"__q${c}_$i") :+ s"__qcut_v$c"): _*)
  }
}

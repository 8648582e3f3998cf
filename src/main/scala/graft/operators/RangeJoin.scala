package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join (range join) via bucketing. Spark plans a
  * bare `a.start <= b.end AND b.start <= a.end` join as
  * BroadcastNestedLoopJoin — O(|A|·|B|) and a non-starter when both
  * sides are large. The scalable form maps every interval to the
  * fixed-width buckets it spans, equi-joins on the bucket (a plain
  * shuffled hash join), then applies the exact overlap predicate.
  *
  * Duplicate elimination is FREE: a qualifying pair would meet in
  * every bucket both intervals span, so the join keeps it only in
  * the FIRST shared bucket — `bucket == max(floor(aStart/w),
  * floor(bStart/w))` — and no post-join `distinct` (a second
  * shuffle of the result) is needed.
  *
  * Cost model at 100 TB: each interval is replicated
  * ceil(span/width) times; pick `bucketWidth` near the typical span
  * so replication stays O(1) per row while buckets stay selective.
  * Skewed hot buckets (everything overlaps one hour) fall back to
  * AQE skew-join splitting on the equi-join.
  */
object RangeJoin {

  /** All pairs of `left` × `right` intervals that overlap
    * (inclusive bounds: `lStart <= rEnd && rStart <= lEnd`), joined
    * as equi-join on span buckets. Interval bounds are integral
    * (e.g. epoch seconds); output = left columns + right columns,
    * one row per overlapping pair. Column names must not clash
    * (rename before calling).
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def bucketed(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__b",
        explode(sequence(floor(col(s) / bucketWidth).cast("long"),
          floor(col(e) / bucketWidth).cast("long"))))
    val l = bucketed(left, lStart, lEnd)
    val r = bucketed(right, rStart, rEnd).withColumnRenamed("__b", "__rb")
    l.join(r,
        col("__b") === col("__rb") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__b") === greatest(
          floor(col(lStart) / bucketWidth).cast("long"),
          floor(col(rStart) / bucketWidth).cast("long")))
      .drop("__b", "__rb")
  }
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-column clustering — the layout lever
  * when scans filter on MORE THAN ONE column. [[Load.writeClustered]]
  * gives perfect pruning on a single range key but none on a second
  * dimension; interleaving the bits of per-column quantized ranks
  * places rows near in ALL dimensions into the same files, so
  * parquet footer min/max stats prune a multi-column box predicate
  * to O(box volume) of the files instead of O(1 dimension's slice).
  *
  * Quantization is linear min/max scaling to `bits` per column (the
  * min/max pass is one tiny aggregate). Linear scaling is
  * skew-sensitive — a heavy-tailed column wastes z-resolution — but
  * needs no global sort per column; for skewed data pass a
  * pre-transformed column (log, rank bucket) instead. At 100 TB the
  * write is one range-shuffle on the z-value (same cost as any
  * clustered rewrite); reads need no z machinery at all, they just
  * benefit from tighter footers.
  */
object ZOrder {

  /** The interleaved z-value of `cols`, each quantized to `bits`
    * buckets via linear min/max scaling with the supplied bounds.
    * Total bits (cols × bits) must fit a long; nulls sort first
    * (bucket 0).
    */
  def zValue(cols: Seq[Column], bounds: Seq[(Double, Double)],
             bits: Int): Column = {
    require(cols.nonEmpty && cols.size == bounds.size)
    require(bits * cols.size <= 62, s"${cols.size} cols × $bits bits overflows a long")
    val maxBucket = (1L << bits) - 1
    val buckets = cols.zip(bounds).map { case (c, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      val scaled = floor((c.cast("double") - lit(lo)) / lit(span) * lit(maxBucket.toDouble))
      coalesce(greatest(lit(0L), least(lit(maxBucket), scaled.cast("long"))), lit(0L))
    }
    (0 until bits).foldLeft(lit(0L)) { case (acc, b) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (bucket, c)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bucket, b).bitwiseAND(lit(1L)),
          b * cols.size + c))
      }
    }
  }

  /** Per-column (min, max) for the quantization — one aggregate job. */
  def columnBounds(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"),
        max(col(c).cast("double")).as(s"__hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
  }

  /** Z-order-clustered atomic rewrite: range-shuffle on the z-value
    * into `numFiles` files, z-sorted within each so footer min/max
    * stay tight. Same crash-safe swap as every maintenance write.
    */
  def writeZOrdered(spark: SparkSession, df: DataFrame, byCols: Seq[String],
                    bits: Int, numFiles: Int, path: String): Unit = {
    val z = zValue(byCols.map(col), columnBounds(df, byCols), bits)
    Load.writeAtomic(spark,
      df.withColumn("__z", z)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z"),
      path)
  }
}

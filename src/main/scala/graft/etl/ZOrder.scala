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
      // clamp in DOUBLE space and squash NaN before the long cast —
      // ANSI mode throws on cast(NaN/overflow as long), so a single
      // rogue value must not abort a whole-table rewrite
      val clamped = greatest(lit(0.0), least(lit(maxBucket.toDouble),
        when(isnan(scaled), lit(0.0)).otherwise(scaled)))
      coalesce(clamped.cast("long"), lit(0L))
    }
    (0 until bits).foldLeft(lit(0L)) { case (acc, b) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (bucket, c)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bucket, b).bitwiseAND(lit(1L)),
          b * cols.size + c))
      }
    }
  }

  /** Per-column (min, max) for the quantization — one aggregate job.
    * NaNs are excluded from the bounds (Spark's max would otherwise
    * return NaN and poison every bucket); an empty or all-null/NaN
    * column degenerates to (0, 1), which buckets its rows to 0.
    */
  def columnBounds(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      val clean = when(isnan(v), lit(null)).otherwise(v)
      Seq(min(clean).as(s"__lo_$c"), max(clean).as(s"__hi_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (row.isNullAt(2 * i)) (0.0, 1.0)
      else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
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

package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: the pandas `resample` / `asfreq` /
  * `ffill` / `bfill` surface (reference `main.py` is a pandas
  * pipeline; these are the time-series capabilities that stack
  * implies), re-expressed as distributed plans.
  *
  * Scale design: a calendar spine is generated with
  * `sequence(min, max, interval)` — for the GLOBAL spine that is one
  * tiny 1-row aggregate exploded into |days| rows (days are bounded
  * by wall-clock years, not data volume, so the spine side of the
  * fill join is always broadcastable); for the PER-KEY grid the
  * sequence runs inside each key's row after a groupBy(key) — the
  * explode distributes with the keys, no single-task hotspot, no
  * driver loop. Fills are one window per key ordered by time: the
  * same single-shuffle shape as [[graft.operators.AsOfJoin]].
  */
object Resample {

  /** Fill calendar gaps in an already-aggregated daily frame: every
    * day in [min(dayCol), max(dayCol)] appears exactly once, missing
    * days taking `defaults` (column -> fill value). `dayCol` must be
    * a DateType column with one row per present day.
    *
    * The spine join is a broadcast: |days| is years × 365 — small
    * forever — while the daily frame is itself post-aggregation
    * output, so neither side shuffles.
    */
  def calendarFill(daily: DataFrame, dayCol: String,
                   defaults: Map[String, Column]): DataFrame = {
    val spine = daily
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as(dayCol))
    val joined = broadcast(spine).join(daily, Seq(dayCol), "left")
    defaults.foldLeft(joined) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), d))
    }
  }

  /** Per-key day grid (pandas `groupby(key).resample('D')`): for each
    * key, every day in that key's [min, max] activity span appears
    * exactly once; days the key was absent get null value columns
    * (fill with [[ffill]]/[[bfill]] or defaults afterwards).
    * `df` must have one row per (key, day); `dayCol` DateType.
    *
    * The grid generation is a groupBy(key) whose output rows each
    * explode into that key's span — fully distributed by key. The
    * grid⋈df join re-shuffles both sides on (key, day); at scale the
    * join is the dominant cost and is exactly one shuffle of each.
    */
  def gridFill(df: DataFrame, keyCols: Seq[String], dayCol: String): DataFrame = {
    val grid = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as(dayCol): _*)
    grid.join(df, keyCols :+ dayCol, "left")
  }

  /** Forward-fill (pandas `ffill`): each null in `fillCols` takes the
    * most recent non-null value within its key, in `orderCols` order.
    * One shuffle on the keys; all fill columns share the window.
    */
  def ffill(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
            fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { case (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Linear interpolation (pandas `interpolate(method='linear')` on
    * the interior): each null in `valueCol` between two non-null
    * neighbors (within its key, positions from numeric `posCol`)
    * takes the straight-line value between them; leading/trailing
    * nulls — no neighbor on one side — STAY null (compose with
    * [[ffill]]/[[bfill]] to extend the edges).
    *
    * Two windows over the SAME key partitioning (forward + backward
    * frame), so the whole fill is one shuffle; the arithmetic is a
    * fixed sequence of IEEE double ops, reproducible across engines.
    */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String], posCol: String,
                        valueCol: String): DataFrame = {
    val fwd = Window.partitionBy(keyCols.map(col): _*).orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(keyCols.map(col): _*).orderBy(col(posCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val knownPos = when(v.isNotNull, col(posCol))
    val out = df
      .withColumn("__pv", last(v, ignoreNulls = true).over(fwd))
      .withColumn("__pt", last(knownPos, ignoreNulls = true).over(fwd))
      .withColumn("__nv", first(v, ignoreNulls = true).over(bwd))
      .withColumn("__nt", first(knownPos, ignoreNulls = true).over(bwd))
      .withColumn(valueCol,
        when(v.isNotNull, v)
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (col(posCol).cast("double") - col("__pt").cast("double")) /
              (col("__nt").cast("double") - col("__pt").cast("double"))))
    out.drop("__pv", "__pt", "__nv", "__nt")
  }

  /** Backward-fill (pandas `bfill`): nulls take the NEXT non-null
    * value within the key. Same single-shuffle shape as [[ffill]]
    * (the reversed frame reuses the same hash partitioning, so the
    * ffill+bfill composition still shuffles once).
    */
  def bfill(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
            fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    fillCols.foldLeft(df) { case (d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
  }
}

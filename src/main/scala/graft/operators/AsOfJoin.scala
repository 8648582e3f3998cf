package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: attach to each probe row the most recent
  * build row of the same key at-or-before the probe's time. Spark
  * has no native ASOF JOIN; the naive formulations are a range
  * self-join (quadratic blow-up per key) or a per-key collect
  * (driver-bound). This is the scalable union-and-forward-fill
  * form:
  *
  *   1. union both sides, tagged (`__side` 0 = build, 1 = probe);
  *   2. one window per key ordered by (time, side, tie-breaks),
  *      forward-filling the build payload into the probe rows that
  *      follow it;
  *   3. keep the probe rows.
  *
  * Cost at 100 TB: ONE shuffle of (probe ∪ build) hash-partitioned
  * by key + a per-partition sort — the same price as a single
  * sort-merge join, with no row multiplication regardless of how
  * many build rows precede a probe. Build rows at exactly the probe
  * time sort BEFORE the probe (side 0 < 1), so "at-or-before" is
  * inclusive; among same-time build rows the last by `tieCols`
  * wins.
  */
object AsOfJoin {

  /** `probe` keeps all its columns; `build` contributes `payload`
    * columns (renamed by the caller if they clash with probe's).
    * Both sides must share `keyCols` and `timeCol`; `tieCols` order
    * same-time build rows (must exist in `build`). The payloads are
    * packed in ONE struct before the fill, so every output row's
    * payload values come from the same (single, latest) build row —
    * never a column-wise mix. Probe rows with no preceding build
    * row get null payloads.
    */
  def asOf(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
           timeCol: String, tieCols: Seq[String],
           payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val pSide = probe.columns.map(col) :+ lit(1).as("__side") :+
      lit(null).cast(build.select(payload.map(col): _*)
        .withColumn("__p", struct(payload.map(col): _*))
        .schema("__p").dataType).as("__p")
    // tie columns only order BUILD rows (the probe/build interleave is
    // fixed by __side first) — probe sides missing one carry a null slot
    val pTagged = tieCols.filterNot(probe.columns.contains)
      .foldLeft(probe.select(pSide.toIndexedSeq: _*)) { case (df, c) =>
        df.withColumn(c, lit(null).cast(build.schema(c).dataType))
      }
    val bBase = build
      .select(((keyCols :+ timeCol) ++ tieCols).distinct.map(col) :+
        lit(0).as("__side") :+ struct(payload.map(col): _*).as("__p"): _*)
    // null slots for probe-only columns so the union lines up
    val bTagged = probe.columns.toSeq
      .filterNot(((keyCols :+ timeCol) ++ tieCols).contains)
      .foldLeft(bBase) { case (df, c) =>
        df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
      }
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(timeCol, "__side") ++ tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = pTagged.unionByName(bTagged)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payload.foldLeft(filled) { case (df, c) =>
      df.withColumn(c, col("__p").getField(c))
    }.drop("__side", "__p")
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-constrained greedy selection: order documents by
  * (score desc, id asc) and keep the prefix whose cumulative token
  * count fits a budget — "take the best B tokens", the selection
  * step between quality scoring and training-set assembly.
  *
  * Scale shape: the naive form is a GLOBAL sort + running sum (one
  * partition, dead at corpus scale). This is the two-pass band
  * refinement: (1) histogram tokens per score BAND (floor(score/C) —
  * contiguous in score order), cumulate over the tiny band frame to
  * find the single band the budget boundary crosses; (2) the exact
  * running sum is computed per band (each band its own window
  * partition — distributed, no global order), and only the boundary
  * band's running sum decides keeps: bands above keep everything,
  * bands below drop everything. The greedy prefix is reproduced
  * exactly because floor-bands partition the (score desc, id) order
  * contiguously and the within-band order matches the global order.
  * `bandWidth` trades band-frame size against the boundary band's
  * sort size (a degenerate all-one-score corpus still sorts one
  * band; pick C below the score spread).
  *
  * Exactness: scores and tokens are integers; the floor division
  * uses the pmod identity `(a − ((a % C + C) % C)) / C` so negative
  * scores band identically in every engine (long `div` truncates
  * toward zero and would break band monotonicity at 0); the budget
  * compare is a long compare, never a float.
  */
object BudgetSelect {

  /** Exact floor(x / c) for possibly-negative integer x. */
  def floorDiv(x: Column, c: Long): Column =
    (x - ((x % c + c) % c)) / c

  /** Append `keep` (1L/0L) to `docs`: greedy (score desc, id asc)
    * prefix under the constant `budgetCol` total tokens (attach it
    * with `crossJoin(broadcast(<1-row aggregate>))` — the repo's
    * scalar-stats idiom). `scoreCol`/`tokCol` must be integral;
    * `idCol` unique.
    */
  def withKeep(docs: DataFrame, idCol: String, scoreCol: String,
               tokCol: String, budgetCol: String,
               bandWidth: Long = 100L): DataFrame = {
    val base = BarrierCache.track(
      docs.withColumn("__band", floorDiv(col(scoreCol), bandWidth)))
    // pass 1: per-band token totals — |bands| rows of metadata; the
    // desc cumsum runs on that tiny frame (its single-partition
    // window is bounded like a centroid collect, not corpus-sized)
    val wB = Window.orderBy(col("__band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cut = base.groupBy(col("__band"), col(budgetCol).as("__budget"))
      .agg(sum(col(tokCol)).as("__btoks"))
      .withColumn("__cum", sum(col("__btoks")).over(wB))
      .withColumn("__above", col("__cum") - col("__btoks"))
      // the ONE band the boundary crosses; when everything fits the
      // frame is empty and the aggregate below yields nulls
      .filter(col("__above") <= col("__budget") && col("__cum") > col("__budget"))
      .agg(max(col("__band")).as("__cutband"),
        max(col("__budget") - col("__above")).as("__room"))
    // pass 2: running sums per band partition (distributed); only
    // the boundary band's sum decides — others keep/drop wholesale
    val wIn = Window.partitionBy("__band")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.crossJoin(broadcast(cut))
      .withColumn("__incum", sum(col(tokCol)).over(wIn))
      .withColumn("keep",
        when(col("__cutband").isNull, 1L)
          .when(col("__band") > col("__cutband"), 1L)
          .when(col("__band") === col("__cutband"),
            when(col("__incum") <= col("__room"), 1L).otherwise(0L))
          .otherwise(0L))
      .drop("__band", "__cutband", "__room", "__incum")
  }
}

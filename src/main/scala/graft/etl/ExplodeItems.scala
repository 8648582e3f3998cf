package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G1-G3: the reference's core data-model move — one row per order
  * with a comma-packed `Products` string becomes one row per line
  * item (reference `main.py:107-109`).
  *
  * Spark-first: `split` + `explode` are built-in Catalyst
  * generators, fully codegen'd; the post-explode empty filter (G3)
  * reproduces pandas' keep-empty-then-drop semantics for trailing
  * commas.
  */
object ExplodeItems {
  /** G1: `Products` string → array on ','. */
  def splitItems(c: Column): Column = split(c, ",")

  /** G1+G2+G3 composed: explode `srcCol` into `itemCol`, dropping
    * empty fragments (trailing commas / double commas).
    */
  def explodeItems(df: DataFrame, srcCol: String, itemCol: String): DataFrame =
    df.withColumn(itemCol, explode(splitItems(col(srcCol))))
      .filter(trim(col(itemCol)) =!= "")
      .withColumn(itemCol, trim(col(itemCol)))
}

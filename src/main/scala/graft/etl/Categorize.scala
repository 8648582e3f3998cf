package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1-M3: categorical mapping (reference `main.py:186-354`).
  *
  * The reference uses ~120-entry / 17-entry Python dicts mapped
  * row-by-row. Spark-first form: a broadcast hash join against a
  * small dimension DataFrame — identical O(1)-per-row semantics,
  * but it scales (dim can grow to millions of rows before the
  * broadcast threshold matters) and matches the star-schema intent
  * (`README.md:33`). Misses stay null after the left join; M3/P5
  * fills them with 'Uncategorized'.
  */
object Categorize {

  /** Two-level dim for the testdata domain: p_type → (sub_category,
    * category). Mirrors the reference's product→sub-category (M1)
    * and sub-category→category (M2) dict chain, folded into one
    * dimension table (SURVEY.md §2.5).
    */
  val typeDim: Seq[(String, String, String)] = Seq(
    ("ECONOMY",  "Economy",      "Budget"),
    ("PROMO",    "Promotional",  "Budget"),
    ("SMALL",    "Small",        "Mid"),
    ("MEDIUM",   "Medium",       "Mid"),
    ("STANDARD", "Standard",     "Mid"),
    ("LARGE",    "Large",        "Premium"))

  def typeDimDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    typeDim.toDF("p_type", "sub_category", "category")
  }

  /** M1+M2: left broadcast join mapping `keyCol` through the dim. */
  def withCategories(df: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    df.join(broadcast(dim), Seq(keyCol), "left")

  /** M3/P5: miss-handling — unmapped ⇒ 'Uncategorized'
    * (`main.py:402-403`).
    */
  def fillUncategorized(df: DataFrame, cols: Seq[String] = Seq("sub_category", "category")): DataFrame =
    df.na.fill("Uncategorized", cols)

  /** Generic dict-as-column mapping for small literal maps (the
    * `typedLit(Map)` form — equivalent to the join for tiny dims;
    * kept for the corrections-map shape).
    */
  def mapLiteral(c: Column, m: Map[String, String], default: Column): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    } match { case mapped => coalesce(mapped, default) }
}

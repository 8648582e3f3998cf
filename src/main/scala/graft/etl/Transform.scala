package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E2: the reference's core transform (`main.py:95-407`) as one
  * declarative Catalyst plan — header strip → split/explode/filter →
  * regex extraction layer → clean-item rename → categorical
  * broadcast joins → payment derivation → projection/rename →
  * numeric coercion → validation split.
  *
  * Catalyst collapses the ~15 sequential projections into a single
  * whole-stage-codegen'd stage over the scan; the only shuffle in
  * the whole pipeline is the explode-free aggregation a caller adds
  * afterwards (the dim joins broadcast).
  *
  * Divergences from the reference, by design (SURVEY.md §2.7):
  *  - validation runs BEFORE the 'Uncategorized' fill, so
  *    unmappable items quarantine (the README.md:117-119 reprocess
  *    story) instead of being masked by the fill;
  *  - the footer drop is predicate-based upstream (Pos synthesizes
  *    no footer).
  */
object Transform {

  /** The reference's real product dimension (M1+M2 folded, keyed on
    * exact clean-item strings — see [[Categorize.referenceDim]]).
    */
  def dimDF(spark: SparkSession): DataFrame = Categorize.referenceDimDF(spark)

  /** Raw POS frame → item-level fact frame (pre-validation).
    *
    * The dim join is on the EXACT `clean_item` string, pre-title-case
    * — precisely the reference's `Clean_Item.map(dict)` at
    * `main.py:356`, which runs before the `str.title()` at
    * `main.py:385` (so "Biscoff tiramisu" maps, then displays
    * title-cased).
    */
  /** The raw-sheet input contract (post-header-strip names): exactly
    * the columns `transform` consumes. Enforced strictly at entry so
    * schema drift fails with a contract error naming the missing
    * columns, not a deep unresolved-attribute analysis error.
    */
  val rawContract: Seq[String] = Seq(
    "Order ID", "Products", "Product amount", "Received amount",
    "Payment time", "Cash", "Gcash", "Type/Channel")

  def transform(raw: DataFrame, dim: DataFrame): DataFrame = {
    // P1 then P3 (strict): enforce + prune to the contract columns,
    // so the scan reads only what the pipeline consumes.
    val stripped = Sanitize.project(Sanitize.stripHeaders(raw), rawContract)
    val exploded = ExplodeItems.explodeItems(stripped, "Products", "item")
    val it = col("item")
    val extracted = exploded
      .withColumn("size", Extract.size(it))
      .withColumn("variation", Extract.variation(it))
      .withColumn("flavor", Extract.flavor(it))
      .withColumn("sugar_level", Extract.sugarLevel(it))
      .withColumn("spice_level", Extract.spiceLevel(it))
      .withColumn("quantity", Extract.quantity(it))
      // clean_item is the one EXPENSIVE extract (nested rlike +
      // alternation extracts + corrections), referenced by the R12
      // filter, the dim-join key, and the initcap display column.
      // Spark 4.1's optimizer keeps ONE evaluating node (verified
      // A/B: a forced non-deterministic barrier changes nothing at
      // steady state); PlanQualitySpec pins that node count so an
      // optimizer/plan change can't silently re-inline the chain
      // into every consumer.
      .withColumn("clean_item", Extract.cleanItem(it))
    val mapped = Categorize.withCategories(extracted, dim, "clean_item")
    mapped
      .filter(col("clean_item").isNotNull) // R12 (null-model form)
      .select(
        col("Order ID").as("order_id"),
        initcap(col("clean_item")).as("items"), // R11
        col("sub_category"), col("category"),
        col("flavor"), col("variation"), col("size"),
        col("quantity"),
        col("sugar_level"), col("spice_level"),
        Extract.toNumber(col("Product amount")).as("total_order_amount"), // R13+P4
        Extract.toNumber(col("Received amount")).as("received_amount"),
        col("Payment time").as("payment_time"),
        PaymentType.paymentType(col("Cash"), col("Gcash")).as("payment_type"), // U1
        col("Type/Channel").as("order_type")) // P4
  }

  final case class FactSplit(clean: DataFrame, quarantine: DataFrame)

  /** F5 validity over the fact-frame contract columns. */
  def factValidity: org.apache.spark.sql.Column =
    Validate.validExpr(
      items = col("items"), subCategory = col("sub_category"),
      category = col("category"), quantity = col("quantity"),
      totalAmount = col("total_order_amount"),
      receivedAmount = col("received_amount"))

  /** Route an already-transformed fact frame (useful when the caller
    * caches the fact and derives both sides from one materialization).
    */
  def route(fact: DataFrame): FactSplit = {
    val s = Validate.split(fact, factValidity)
    FactSplit(Categorize.fillUncategorized(s.clean), s.quarantine)
  }

  /** Full E2+F5: transform then route every row to exactly one of
    * clean (fact path, misses filled 'Uncategorized') or quarantine
    * (kept raw for reprocessing).
    */
  def run(raw: DataFrame, dim: DataFrame): FactSplit =
    route(transform(raw, dim))
}

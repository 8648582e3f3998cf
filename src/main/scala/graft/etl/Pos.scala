package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic POS raw report (FIXTURES.md §A contract)
  * built from the driver testdata. One row per order, with the whole
  * order packed into a comma-separated `Products` string — the
  * reference's input shape (`README.md:28`, reference
  * `main.py:107`) — using the reference's real token vocabulary
  * (sizes, Hot/Cold, sugar/spice levels, pastry names) so the
  * R1-R13 extraction layer is exercised on its true patterns.
  *
  * Every derivation is keyed on stable integer columns (mod
  * arithmetic), so the same frame is constructible in DuckDB SQL for
  * the end-to-end oracle.
  */
object Pos {

  val drinkFlavors = Seq("Spanish Latte", "Americano", "Mango Lemonade", "Cheese Fries")
  val sizes = Seq("Solo", "Duo", "Medio", "Familia")
  val pastryCats = Seq("Croissant", "Croffle", "Cookie")
  val pastryFlavors = Seq("Biscoff", "Nutella", "Ube", "Almond", "Matcha")
  val sugars = Seq("Sugar 20%", "Sugar 50%", "Sugar 75%", "Sugar 100%")
  val spices = Seq("Mild (1/4)", "Regular (2/4)", "Spicy (3/4)")

  private def pick(seq: Seq[String], key: org.apache.spark.sql.Column) =
    element_at(array(seq.map(lit): _*), (key % seq.size).cast("int") + 1)

  /** Raw POS frame: `Order ID, Products, Product amount,
    * Received amount, Payment time, Cash, Gcash, Type/Channel` —
    * amounts are comma-grouped strings (R13 fodder), `Cash`/`Gcash`
    * follow the reference's '-'/'0.00' conventions (U1 fodder).
    */
  def rawReport(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, dir)

    val isPastry = col("l_partkey") % 4 === 0
    val isMystery = col("l_partkey") % 41 === 0
    val drink = concat(
      pick(sizes, col("l_partkey")), lit(" "),
      when(col("l_suppkey") % 2 === 0, "Hot").otherwise("Cold"), lit(" "),
      pick(drinkFlavors, col("l_suppkey")), lit(" "),
      when(col("l_partkey") % 3 === 0, pick(sugars, col("l_partkey")))
        .otherwise(pick(spices, col("l_partkey"))))
    val pastry = concat(
      pick(pastryFlavors, col("l_suppkey")), lit(" "),
      pick(pastryCats, col("l_orderkey")))
    val item = concat(
      when(isMystery, lit("Mystery Box")).when(isPastry, pastry).otherwise(drink),
      lit(" x"), col("l_linenumber").cast("string"))

    val items = li.withColumn("item", item)
      .groupBy("l_orderkey")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("l_linenumber"), col("item")))),
          s => s.getField("item")),
        ",").as("products"))

    // thousand-separator insertion without lookahead (mirrors in RE2)
    def grouped(c: org.apache.spark.sql.Column) =
      regexp_replace(c.cast("decimal(12,2)").cast("string"),
        "^(\\d+)(\\d{3}\\.)", "$1,$2")

    val amount = when(col("o_orderkey") % 97 === 0, lit(-1.0) * col("o_totalprice"))
      .otherwise(col("o_totalprice"))
    o.join(items, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderkey").cast("string").as("Order ID"),
        col("products").as("Products"),
        grouped(amount).as("Product amount"),
        grouped(col("o_totalprice")).as("Received amount"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("Payment time"),
        when(col("o_orderstatus") === "F", lit("0.00"))
          .when(col("o_orderstatus") === "O", grouped(col("o_totalprice")))
          .otherwise(lit("-")).as("Cash"),
        when(col("o_orderstatus") === "P" && col("o_orderkey") % 2 === 0,
          grouped(col("o_totalprice"))).otherwise(lit("-")).as("Gcash"),
        when(col("o_orderkey") % 3 === 0, "Dine-in")
          .when(col("o_orderkey") % 3 === 1, "Take-out")
          .otherwise(lit("Delivery")).as("Type/Channel"))
  }
}

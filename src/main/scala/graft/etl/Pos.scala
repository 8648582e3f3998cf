package graft.etl

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic POS raw report (FIXTURES.md §A contract)
  * built from the driver testdata. One row per order, with the whole
  * order packed into a comma-separated `Products` string — the
  * reference's input shape (`README.md:28`, reference
  * `main.py:107`) — using the reference's REAL product vocabulary
  * (`main.py:146-153` flavors, `main.py:186-330` product dict), so
  * the R1-R13 extraction layer and the M1/M2 dictionary joins are
  * exercised on their true patterns:
  *  - beverages carry paren-wrapped modifiers
  *    ("Spanish Latte (Solo) (Hot) (Sugar 50%) x2") — the cleanup
  *    regex (`main.py:171-175`) must strip them down to the exact
  *    dict key;
  *  - pastries are "<flavor> <category>" ("Almond Nutella Croffle")
  *    — the two-part rename (`main.py:140-169`) must rebuild
  *    "Croffle - Almond Nutella";
  *  - deterministic slices exercise the miss paths: 'Mystery Box'
  *    (dict miss → quarantine), 'Croissant - Matcha' (pastry dict
  *    miss), 'Durian <cat>' (unknown flavor → null clean item →
  *    dropped, `main.py:384`), and the corrections entry
  *    'Fruit Lemonade w/Popping Pearls' (`main.py:177-182`).
  *
  * Every derivation is keyed on stable integer columns (mod
  * arithmetic), so the same frame is constructible in DuckDB SQL for
  * the end-to-end oracle.
  */
object Pos {

  val beverages = Seq("Spanish Latte", "Americano", "Caramel Macchiato",
    "Matcha", "Chocolate", "Oreo Milk", "Strawberry Yakult",
    "Fruit Lemonade w/Popping Pearls")
  val foods = Seq("Carbonara", "Clubhouse", "Nachos", "French Fries",
    "French Fries (Cheese)", "Spicy Tuna Pasta", "Extra Rice",
    "Biscoff tiramisu", "Ube Cheesecake",
    "Candle + Topper Set - Big Candle + Big Bday T.")
  val pastryCats = Seq("Croissant", "Croffle", "Cookies")
  // Per-category flavor rotations: all dict-valid except 'Matcha'
  // for Croissant (only "Croffle - Matcha" exists → deterministic
  // quarantine slice).
  val croissantFlavors = Seq("Almond Nutella", "Biscoff", "Caramel",
    "Chocolate", "Oreo", "Plain", "Spam and Egg", "Matcha")
  val croffleFlavors = Seq("Almond Nutella", "Biscoff", "Caramel",
    "Chocolate", "Matcha", "Oreo", "Plain", "Smores", "Strawberry Cream")
  val cookieFlavors = Seq("Biscoff", "Chip and Chunk",
    "Chip and Chunk Walnut", "Nutella Pecan", "Red Velvet", "Smores", "Dubai")
  val sizes = Seq("Solo", "Duo", "Medio", "Familia")
  val sugars = Seq("Sugar 20%", "Sugar 50%", "Sugar 75%", "Sugar 100%")
  val spices = Seq("Mild (1/4)", "Regular (2/4)", "Spicy (3/4)")

  private def pick(seq: Seq[String], key: Column) =
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

    val isMystery = col("l_partkey") % 41 === 0
    val isPastry = col("l_partkey") % 4 === 0
    val isFood = col("l_partkey") % 4 === 1

    val cat = pick(pastryCats, col("l_orderkey"))
    val pastryFlavor = when(col("l_partkey") % 48 === 0, lit("Durian"))
      .when(cat === "Croissant", pick(croissantFlavors, col("l_suppkey")))
      .when(cat === "Croffle", pick(croffleFlavors, col("l_suppkey")))
      .otherwise(pick(cookieFlavors, col("l_suppkey")))
    val pastry = concat(pastryFlavor, lit(" "), cat)

    // spice/sugar/size pick keys deliberately differ from their
    // gating predicates' keys so the rotation isn't collapsed to a
    // constant by the gate (e.g. partkey%3==0 fixing partkey%3).
    val spiceSuffix = when(col("l_partkey") % 3 === 0,
      concat(lit(" ("), pick(spices, col("l_suppkey")), lit(")"))).otherwise(lit(""))
    val food = concat(pick(foods, col("l_suppkey")), spiceSuffix)

    val sugarSuffix = when(col("l_partkey") % 3 === 0,
      concat(lit(" ("), pick(sugars, col("l_suppkey")), lit(")"))).otherwise(lit(""))
    val drink = concat(
      pick(beverages, col("l_suppkey")),
      lit(" ("), pick(sizes, col("l_linenumber")), lit(")"),
      when(col("l_suppkey") % 2 === 0, lit(" (Hot)")).otherwise(lit(" (Cold)")),
      sugarSuffix)

    // R6: most items carry an explicit 'x<n>' quantity; every 7th
    // line omits it to exercise the default-1.0 path.
    val qtySuffix = when(col("l_linenumber") % 7 === 0, lit(""))
      .otherwise(concat(lit(" x"), col("l_linenumber").cast("string")))
    val item = concat(
      when(isMystery, lit("Mystery Box"))
        .when(isPastry, pastry)
        .when(isFood, food)
        .otherwise(drink),
      qtySuffix)

    val items = li.withColumn("item", item)
      .groupBy("l_orderkey")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("l_linenumber"), col("item")))),
          s => s.getField("item")),
        ",").as("products"))

    // thousand-separator insertion without lookahead (mirrors in RE2)
    def grouped(c: Column) =
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

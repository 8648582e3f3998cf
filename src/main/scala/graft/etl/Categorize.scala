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

  /** M1: the reference's real product→sub-category dict
    * (`main.py:186-330`), transcribed verbatim and in order. Keys are
    * EXACT clean-item strings in the vendor's original casing — the
    * reference maps `Clean_Item` through this dict BEFORE the final
    * title-case (`main.py:356` precedes `main.py:385`), so quirks
    * like "Biscoff tiramisu" (lowercase t) only match pre-title-case
    * input. Section comments mirror the reference's.
    */
  val productToSubCategory: Seq[(String, String)] = Seq(
    // Add-Ons
    "Candle - Big" -> "Add-Ons (Cake)",
    "Candle" -> "Add-Ons (Cake)",
    "Candle - Small" -> "Add-Ons (Cake)",
    "Candle + Topper Set" -> "Add-Ons (Cake)",
    "Candle + Topper Set - Big Candle + Big Bday T." -> "Add-Ons (Cake)",
    "Candle + Topper Set - Small Candle+ Small Bday T." -> "Add-Ons (Cake)",
    "Extra Aioli Dip" -> "Food Add-Ons",
    "Extra Cheese Sauce" -> "Food Add-Ons",
    "Extra Egg" -> "Food Add-Ons",
    "Extra Rice" -> "Food Add-Ons",
    // Food
    "Bacon with Rice and Egg" -> "All Day Breakfast",
    "Corned Beef with Rice and Egg" -> "All Day Breakfast",
    "Spam with Rice and Egg" -> "All Day Breakfast",
    "Sunrise Breakfast Plate" -> "All Day Breakfast",
    "Cheese Sticks" -> "Appetizers",
    "Chicken Fingers" -> "Appetizers",
    "French Fries" -> "Appetizers",
    "French Fries Overload" -> "Appetizers",
    "French Fries Platter" -> "Appetizers",
    "Mojos" -> "Appetizers",
    "Nachos" -> "Appetizers",
    "Spring Rolls" -> "Appetizers",
    "Carbonara" -> "Pasta",
    "Chicken Aglio Olio" -> "Pasta",
    "Chicken Pesto" -> "Pasta",
    "Creamy Lasagna" -> "Pasta",
    "Shrimp Aglio Olio" -> "Pasta",
    "Spaghetti Meatballs" -> "Pasta",
    "Spicy Tuna Pasta" -> "Pasta",
    "Chicken Salpicao" -> "Rice Meals",
    "Pad Kra Pao" -> "Rice Meals",
    "Spicy Pork Stir Fry" -> "Rice Meals",
    "Bacon and Egg Sandwich" -> "Sandwiches",
    "Clubhouse" -> "Sandwiches",
    "Crispy Chicken Sandwich" -> "Sandwiches",
    "Spam and Egg Sandwich" -> "Sandwiches",
    // Beverages
    "Coffee Jelly Blended" -> "Blended Coffee",
    "Hazelnut Blended" -> "Blended Coffee",
    "Java Chip Blended" -> "Blended Coffee",
    "Mocha Blended" -> "Blended Coffee",
    "White Mocha Blended" -> "Blended Coffee",
    "Biscoff Blended" -> "Blended Cream",
    "Biscoff Cream" -> "Blended Cream",
    "Caramel Blended" -> "Blended Cream",
    "Caramel Cream" -> "Blended Cream",
    "Chocolate Chip Cream" -> "Blended Cream",
    "Chocolate Cream" -> "Blended Cream",
    "Matcha Cream" -> "Blended Cream",
    "Nutella Blended" -> "Blended Cream",
    "Nutella Cream" -> "Blended Cream",
    "Oreo Cream" -> "Blended Cream",
    "Strawberry Cream" -> "Blended Cream",
    "Vanilla Cream" -> "Blended Cream",
    "White Chocolate Cream" -> "Blended Cream",
    "Amantes" -> "Coffee Based",
    "Americano" -> "Coffee Based",
    "Biscoff Latte" -> "Coffee Based",
    "Cappuccino" -> "Coffee Based",
    "Caramel Macchiato" -> "Coffee Based",
    "Flavored Latte" -> "Coffee Based",
    "Latte" -> "Coffee Based",
    "Matcha Espresso" -> "Coffee Based",
    "Mocha" -> "Coffee Based",
    "Nutella Latte" -> "Coffee Based",
    "Salted Caramel Latte" -> "Coffee Based",
    "Spanish Latte" -> "Coffee Based",
    "Vietnamese" -> "Coffee Based",
    "White Mocha" -> "Coffee Based",
    "White Mocha Hazelnut" -> "Coffee Based",
    "Blueberry Yakult" -> "Fruit Based",
    "Fruit Lemonade w/ Popping Pearls" -> "Fruit Based",
    "Green Apple Fruit Tea" -> "Fruit Based",
    "Mango Yakult" -> "Fruit Based",
    "Passion Fruit" -> "Fruit Based",
    "Passion Fruit Cooler" -> "Fruit Based",
    "Strawberry Yakult" -> "Fruit Based",
    "Chamomile" -> "Hot Tea",
    "Peppermint" -> "Hot Tea",
    "Biscoff Milk" -> "Milk Based",
    "Blueberry Milk" -> "Milk Based",
    "Chocolate" -> "Milk Based",
    "Matcha" -> "Milk Based",
    "Nutella Milk" -> "Milk Based",
    "Oreo Matcha" -> "Milk Based",
    "Oreo Milk" -> "Milk Based",
    "Strawberry Matcha" -> "Milk Based",
    "Strawberry Milk" -> "Milk Based",
    "White Chocolate" -> "Milk Based",
    "White Chocolate Chip" -> "Pastries",
    // Desserts
    "Biscoff Cheesecake" -> "Cheesecakes",
    "Blueberry Cheesecake" -> "Cheesecakes",
    "Mango Cheesecake" -> "Cheesecakes",
    "New York Cheesecake" -> "Cheesecakes",
    "Nutella Cheesecake" -> "Cheesecakes",
    "Oreo Cheesecake" -> "Cheesecakes",
    "Strawberry Cheesecake" -> "Cheesecakes",
    "Ube Cheesecake" -> "Cheesecakes",
    "Biscoff tiramisu" -> "Cheesecakes",
    "Choco Almond" -> "Moist Cakes",
    "Choco Caramel" -> "Moist Cakes",
    "Garnet Velvet" -> "Moist Cakes",
    "Pecan Walnut Carrot" -> "Moist Cakes",
    "Signature Chocolate" -> "Moist Cakes",
    "Banana Bread" -> "Pastries",
    "Crookie" -> "Pastries",
    "Cookies - Biscoff" -> "Pastries",
    "Cookies - Chip and Chunk" -> "Pastries",
    "Cookies - Chip and Chunk Walnut" -> "Pastries",
    "Cookies - Nutella Pecan" -> "Pastries",
    "Cookies - Red Velvet" -> "Pastries",
    "Cookies - Smores" -> "Pastries",
    "Cookies - Dubai" -> "Pastries",
    "Crinkles" -> "Pastries",
    "Croffle - Almond Nutella" -> "Pastries",
    "Croffle - Biscoff" -> "Pastries",
    "Croffle - Caramel" -> "Pastries",
    "Croffle - Chocolate" -> "Pastries",
    "Croffle - Matcha" -> "Pastries",
    "Croffle - Oreo" -> "Pastries",
    "Croffle - Plain" -> "Pastries",
    "Croffle - Smores" -> "Pastries",
    "Croffle - Strawberry Cream" -> "Pastries",
    "Croissant - Almond Nutella" -> "Pastries",
    "Croissant - Biscoff" -> "Pastries",
    "Croissant - Caramel" -> "Pastries",
    "Croissant - Chocolate" -> "Pastries",
    "Croissant - Oreo" -> "Pastries",
    "Croissant - Plain" -> "Pastries",
    "Croissant - Spam and Egg" -> "Pastries",
    // Others
    "Bottled Water" -> "Others",
    "Coke in Can" -> "Others")

  /** M2: sub-category→category dict (`main.py:333-354`), verbatim. */
  val subCategoryToCategory: Map[String, String] = Map(
    "Add-Ons (Cake)" -> "Add-Ons",
    "Food Add-Ons" -> "Add-Ons",
    "All Day Breakfast" -> "Food",
    "Appetizers" -> "Food",
    "Pasta" -> "Food",
    "Rice Meals" -> "Food",
    "Sandwiches" -> "Food",
    "Blended Coffee" -> "Beverages",
    "Blended Cream" -> "Beverages",
    "Coffee Based" -> "Beverages",
    "Fruit Based" -> "Beverages",
    "Hot Tea" -> "Beverages",
    "Milk Based" -> "Beverages",
    "Pastries" -> "Desserts",
    "Cheesecakes" -> "Desserts",
    "Moist Cakes" -> "Desserts",
    "Others" -> "Others")

  /** M1+M2 folded: (clean_item, sub_category, category). The two-hop
    * dict chain collapses into one broadcast dimension — identical
    * per-row semantics (Clean_Item → sub → cat), one join instead of
    * two.
    */
  val referenceDim: Seq[(String, String, String)] =
    productToSubCategory.map { case (p, sc) => (p, sc, subCategoryToCategory(sc)) }

  def referenceDimDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    referenceDim.toDF("clean_item", "sub_category", "category")
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

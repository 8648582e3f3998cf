package graft

import graft.etl.{Pos, Transform, Validate}
import org.apache.spark.sql.functions._

/** E2/F5 end-to-end over a hand-written raw report (golden rows) and
  * the synthetic Pos frame (invariants).
  */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    // order 1: two drinks (real dict keys under paren modifiers, incl.
    // the corrections entry) + trailing comma; Cash used
    ("1", "Spanish Latte (Solo) (Hot) (Sugar 50%) x2,Fruit Lemonade w/Popping Pearls (Familia) (Cold),", "1,250.00", "1,250.00", "2026-01-01 10:00:00", "1250.00", "-", "Dine-in"),
    // order 2: pastry rename + unmapped item; free voucher
    ("2", "Biscoff Croffle x1,UFO Catcher Prize", "300.00", "300.00", "2026-01-02 11:00:00", "0.00", "-", "Take-out"),
    // order 3: mapped item, negative amount → quarantine; Gcash
    ("3", "Americano (Duo) (Hot) (Mild (1/4))", "-80.00", "80.00", "2026-01-03 12:00:00", "-", "80.00", "Delivery")
  ).toDF(" Order ID ", "Products", "Product amount", "Received amount",
    "Payment time", "Cash", "Gcash", "Type/Channel")

  private lazy val split = Transform.run(raw, Transform.dimDF(spark))
  private lazy val clean = split.clean.cache()
  private lazy val quarantine = split.quarantine.cache()

  test("golden clean rows: extraction, mapping, payment, coercion") {
    val rows = clean
      .select("order_id", "items", "sub_category", "category", "size",
        "variation", "flavor", "sugar_level", "quantity",
        "total_order_amount", "payment_type", "order_type")
      .orderBy("order_id", "items")
      .collect().map(_.toSeq).toSeq
    assert(rows === Seq(
      // initcap runs AFTER the dict match: 'w/ Popping' displays 'W/'
      Seq("1", "Fruit Lemonade W/ Popping Pearls", "Fruit Based", "Beverages",
        "Familia", "Cold", null, null, 1.0, 1250.0, "Cash", "Dine-in"),
      Seq("1", "Spanish Latte", "Coffee Based", "Beverages",
        "Solo", "Hot", null, "Sugar 50%", 2.0, 1250.0, "Cash", "Dine-in"),
      Seq("2", "Croffle - Biscoff", "Pastries", "Desserts",
        null, null, null, null, 1.0, 300.0, "Free/Voucher/Discounted", "Take-out")))
  }

  test("quarantine routes unmapped items and negative amounts") {
    val q = quarantine.select("order_id", "items", "category", "total_order_amount")
      .orderBy("order_id", "items").collect().map(_.toSeq).toSeq
    assert(q === Seq(
      Seq("2", "Ufo Catcher Prize", null, 300.0),
      // mapped fine (R9 strips all parentheticals) but amount < 0
      Seq("3", "Americano", "Beverages", -80.0)))
  }

  test("F5 invariant on synthetic Pos frame: clean ⊎ quarantine = all, disjoint") {
    val all = Transform.transform(Pos.rawReport(spark, sf), Transform.dimDF(spark))
    val s = Transform.run(Pos.rawReport(spark, sf), Transform.dimDF(spark))
    val total = all.count()
    val c = s.clean.count()
    val q = s.quarantine.count()
    assert(c + q === total)
    assert(c > 0 && q > 0)
    // key-level disjointness (order_id, items, quantity is unique here)
    val overlap = s.clean.select("order_id", "items", "quantity")
      .intersect(s.quarantine.select("order_id", "items", "quantity")).count()
    assert(overlap === 0)
  }

  test("clean side never has null category (fill after split)") {
    assert(clean.filter(col("category").isNull || col("sub_category").isNull).count() === 0)
  }

  test("P3 strict contract: missing input column fails with contract error") {
    // drift (a renamed Products column) must fail at transform ENTRY
    // with the contract message, not a deep unresolved-column error
    val drifted = raw.withColumnRenamed("Products", "Items Sold")
    val e = intercept[IllegalArgumentException] {
      Transform.transform(drifted, Transform.dimDF(spark))
    }
    assert(e.getMessage.contains("contract violation"))
    assert(e.getMessage.contains("Products"))
  }

  test("validity expression treats null amounts as clean (pandas NaN<0 parity)") {
    val df = Seq(("i", "s", "c", null.asInstanceOf[java.lang.Double]))
      .toDF("items", "sub", "cat", "amt")
    val v = Validate.validExpr(col("items"), col("sub"), col("cat"),
      lit(1.0), col("amt"), lit(0.0))
    assert(df.filter(v).count() === 1)
  }
}

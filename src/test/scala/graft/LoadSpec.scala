package graft

import graft.etl.{Load, Transform}
import org.apache.spark.sql.functions._

/** S4/S5/S6/S8 sink semantics over the parquet-backed table
  * stand-in.
  */
class LoadSpec extends SparkSpec {
  import spark.implicits._

  test("scrub maps NaN/±Inf to null, leaves values") {
    val df = Seq(1.5, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x")
    val got = Load.scrub(df).as[Option[Double]].collect().toSeq
    assert(got === Seq(Some(1.5), None, None, None))
  }

  test("upsert: insert then latest-wins update on the business key") {
    val path = tmpDir("fact") + "/t"
    val v1 = Seq(("o1", "a", 1.0), ("o2", "b", 2.0)).toDF("Order ID", "Items", "Amount")
    Load.upsert(spark, v1, path, Seq("order_id", "items"))
    val v2 = Seq(("o1", "a", 9.0), ("o3", "c", 3.0)).toDF("Order ID", "Items", "Amount")
    Load.upsert(spark, v2, path, Seq("order_id", "items"))
    val got = spark.read.parquet(path)
      .orderBy("order_id").as[(String, String, Double)].collect().toSeq
    assert(got === Seq(("o1", "a", 9.0), ("o2", "b", 2.0), ("o3", "c", 3.0)))
    // idempotent: re-upserting the same batch changes nothing
    Load.upsert(spark, v2, path, Seq("order_id", "items"))
    assert(spark.read.parquet(path).count() === 3)
  }

  test("S6/J1 star normalization: all-integer fact, FK integrity") {
    val clean = Seq(
      ("1", "Latte", 2.0, 10.0, 10.0, "t1", "Cash", "Dine-in"),
      ("2", "Croffle", 1.0, 5.0, 5.0, "t2", "Gcash", "Take-out"))
      .toDF("order_id", "items", "quantity", "total_order_amount",
        "received_amount", "payment_time", "payment_type", "order_type")
    val star = Load.normalizeStar(clean)
    assert(star.fact.count() === 2)
    assert(star.dimItem.count() === 2)
    // every fact FK resolves
    val joined = star.fact
      .join(star.dimItem, Seq("item_id"))
      .join(star.dimPayment, Seq("payment_type_id"))
      .join(star.dimOrderType, Seq("order_type_id"))
    assert(joined.count() === 2)
    // surrogates are stable across runs (hash, not sequence)
    val again = Load.normalizeStar(clean)
    assert(star.dimItem.orderBy("items").collect().toSeq
      === again.dimItem.orderBy("items").collect().toSeq)
  }

  test("S8 reprocess: quarantined rows promote after the dim learns the item") {
    import spark.implicits._
    val base = tmpDir("reproc")
    val factPath = base + "/fact"
    val qPath = base + "/quarantine"
    val raw = Seq(
      ("1", "Spanish Latte (Solo) (Hot) x1", "100.00", "100.00", "t", "100.00", "-", "Dine-in"),
      ("2", "Halo-Halo Special x1", "50.00", "50.00", "t", "50.00", "-", "Dine-in"))
      .toDF("Order ID", "Products", "Product amount", "Received amount",
        "Payment time", "Cash", "Gcash", "Type/Channel")
    val split = Transform.run(raw, Transform.dimDF(spark))
    Load.upsert(spark, split.clean, factPath, Seq("order_id", "items"))
    Load.appendQuarantine(split.quarantine, qPath)
    assert(spark.read.parquet(factPath).count() === 1)
    assert(spark.read.parquet(qPath).count() === 1)
    // dim unchanged → nothing promotes
    val (p0, r0) = Load.reprocessQuarantine(spark, qPath, factPath,
      Transform.dimDF(spark), Seq("order_id", "items"))
    assert(p0 === 0 && r0 === 1)
    // teach the dim the quarantined product → row promotes to fact
    val dim2 = Transform.dimDF(spark)
      .unionByName(Seq(("Halo-Halo Special", "Ice Cream", "Desserts"))
        .toDF("clean_item", "sub_category", "category"))
    val (p1, r1) = Load.reprocessQuarantine(spark, qPath, factPath, dim2,
      Seq("order_id", "items"))
    assert(p1 === 1 && r1 === 0)
    assert(spark.read.parquet(factPath).count() === 2)
    assert(spark.read.parquet(qPath).count() === 0)
  }
}

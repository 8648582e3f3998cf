package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted join/aggregate equivalence with the unsalted plans, on a
  * deliberately skewed key distribution.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the shape AQE alone can't spread
  private lazy val skewed = (1 to 2000).map { i =>
    (if (i <= 1800) "HOT" else s"k${i % 50}", i.toDouble)
  }.toDF("key", "v")

  private lazy val dim = Seq(("HOT", "hot-dim"), ("k1", "d1"), ("k2", "d2"))
    .toDF("key", "attr")

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, Seq("key"))
      .orderBy("key", "v").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "key", salts = 8)
      .select("key", "v", "attr")
      .orderBy("key", "v").collect().toSeq
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("saltedAggregate equals the plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("key").as[(String, Double, Long)].collect().toSeq
    val salted = Skew.saltedAggregate(skewed, Seq("key"), "v", salts = 8)
      .orderBy("key").as[(String, Double, Long)].collect().toSeq
    assert(salted.map(r => (r._1, r._3)) === plain.map(r => (r._1, r._3)))
    // sums of doubles can differ in association order; compare at 1e-6
    salted.zip(plain).foreach { case (a, b) =>
      assert(math.abs(a._2 - b._2) < 1e-6)
    }
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(skewed, "key", 1).collect().head
    assert(top.getString(0) === "HOT")
    assert(top.getLong(1) === 1800L)
  }

  test("approx skewReport matches the exact report within rank tolerance") {
    val orders = Tables.orders(spark, sf)
    val exact = Skew.skewReport(orders, "o_custkey").collect().head
    val approx = Skew.skewReport(orders, "o_custkey", exact = false).collect().head
    // the count/max/ratio columns are identical — only the two
    // percentiles are sketched
    assert(approx.getLong(0) === exact.getLong(0))   // n_keys
    assert(approx.getLong(1) === exact.getLong(1))   // total
    assert(approx.getLong(2) === exact.getLong(2))   // max_per_key
    assert(approx.getDouble(5) === exact.getDouble(5)) // skew_ratio
    // per-key order counts are small integers; at accuracy=10000 the
    // GK sketch is exact-at-integer for this cardinality, so allow
    // at most one count of slack
    assert(math.abs(approx.getDouble(3) - exact.getDouble(3)) <= 1.0, "p50")
    assert(math.abs(approx.getDouble(4) - exact.getDouble(4)) <= 1.0, "p99")
    // same schema — the documented swap contract
    assert(Skew.skewReport(orders, "o_custkey", exact = false).schema ===
      Skew.skewReport(orders, "o_custkey").schema)
  }

  test("approx skewReport plans approx_percentile — no per-key value buffer") {
    val plan = Skew.skewReport(Tables.orders(spark, sf), "o_custkey", exact = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile"), plan)
    // no EXACT percentile aggregate anywhere (approx_percentile
    // itself contains the substring, hence the lookbehind)
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty, plan)
  }
}

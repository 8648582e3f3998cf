package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

/** Bloom semi-join pruning: exactness vs the plain join, the
  * no-false-negative guarantee, real selectivity on disjoint keys,
  * and the plan shape (probe is a narrow filter under the exchange).
  */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1 to 5000).map(i => (i.toLong % 500, i.toDouble))
    .toDF("fk", "v")
  // dim covers only keys 0..49 — a 10% pass rate on the fact
  private lazy val dim = (0L until 50L).map(k => (k, s"d$k")).toDF("pk", "attr")

  test("prunedJoin equals the plain inner join row-for-row") {
    val plain = fact.join(dim, col("fk") === col("pk"))
      .select("fk", "v", "attr").orderBy("fk", "v").collect().toSeq
    val pruned = BloomPrune.prunedJoin(fact, dim, "fk", "pk",
        expectedItems = 1000, fpp = 0.01)
      .select("fk", "v", "attr").orderBy("fk", "v").collect().toSeq
    assert(pruned === plain)
    assert(plain.size === 500)
  }

  test("no false negatives: every dim key survives the prune") {
    val bf = BloomPrune.bloomOf(dim, "pk", expectedItems = 1000)
    val kept = BloomPrune.prune(fact, bf, "fk")
      .select("fk").distinct().as[Long].collect().toSet
    assert((0L until 50L).forall(kept.contains))
  }

  test("prune is selective on mostly-non-matching keys") {
    val bf = BloomPrune.bloomOf(dim, "pk", expectedItems = 1000, fpp = 0.01)
    val stats = BloomPrune.pruneStats(fact, bf, "fk").collect().head
    assert(stats.getAs[Long]("rows_in") === 5000L)
    val passRate = stats.getAs[Double]("pass_rate")
    // true pass rate is 10%; allow bloom fp slack well beyond 1%
    assert(passRate >= 0.10 && passRate < 0.15, s"pass_rate=$passRate")
  }

  test("null fact keys are dropped, matching inner-join semantics") {
    val withNulls = fact.withColumn("fk",
      when(col("v") <= 10.0, lit(null)).otherwise(col("fk")))
    // a null DIM key too: before the guard this always leaked null
    // fact rows (both sides hashed to the seed); now it must not —
    // bloomOf skips null dim keys and the probe is null-guarded
    val dimWithNull = dim.unionByName(
      Seq((Option.empty[Long], "dnull")).toDF("pk", "attr"))
    val bf = BloomPrune.bloomOf(dimWithNull, "pk", expectedItems = 1000)
    val pruned = BloomPrune.prune(withNulls, bf, "fk")
    assert(pruned.filter(col("fk").isNull).count() === 0L)
    val plain = withNulls.join(dimWithNull, col("fk") === col("pk")).count()
    val viaPrune = pruned.join(dimWithNull, col("fk") === col("pk")).count()
    assert(viaPrune === plain)
  }

  test("plan: might_contain probe sits below the join, on the fact scan") {
    // parquet-backed inputs — ConvertToLocalRelation folds the probe
    // away entirely on in-memory relations (correct, but invisible)
    val li = Tables.lineitem(spark, sf).select("l_suppkey", "l_extendedprice")
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_name")
    val pruned = BloomPrune.prunedJoin(li, sup, "l_suppkey", "s_suppkey",
      expectedItems = 1000)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain probe in:\n$plan")
    // the probe must be a Filter on the fact side, below the join in
    // tree print order — not a post-join predicate
    val probeIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe should sit under the join node:\n$plan")
  }
}

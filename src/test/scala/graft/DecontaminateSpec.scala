package graft

import graft.llm.Decontaminate
import org.apache.spark.sql.functions._

/** Benchmark decontamination: overlap semantics + broadcast plan. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")

  test("flags exactly the docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "x alpha beta gamma delta y"), // shares "alpha beta gamma delta"
      (2L, "alpha beta gamma x delta"),   // longest shared run is 3 < 4
      (3L, "unrelated words only here"),
      (4L, "beta gamma delta epsilon z")  // shares the tail 4-gram
    ).toDF("doc_id", "text")
    val got = Decontaminate.contaminated(train, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 4L))
  }

  test("docs shorter than n never match; empty benchmark flags nothing") {
    val train = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(train, bench, "doc_id", "text", n = 4).isEmpty)
    val noBench = bench.filter(col("doc_id") < 0L)
    val t2 = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(t2, noBench, "doc_id", "text", n = 4).isEmpty)
  }

  test("bloom-pruned variant is row-identical to the exact form") {
    graft.llm.BarrierCache.sweep(spark)
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val b = docs.filter(col("doc_id") % 23 === 0)
    val exact = Decontaminate.contaminated(train, b, "doc_id", "text", n = 4)
      .as[Long].collect().sorted.toSeq
    // tiny capacity + high fpp floods the prune with false positives;
    // the exact verify stage must still clear every one of them
    val bloom = Decontaminate.contaminatedBloom(train, b, "doc_id", "text",
        n = 4, expectedItems = 64L, fpp = 0.5)
      .as[Long].collect().sorted.toSeq
    assert(bloom === exact)
    assert(exact.nonEmpty, "construction should plant real contamination")
    graft.llm.BarrierCache.sweep(spark)
  }

  test("containment grades the overlap fraction of the BENCH doc") {
    // bench doc has 2 4-grams; train 1 contains both (containment 1.0),
    // train 2 contains one (0.5), train 3 none
    val b = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma delta epsilon y"),
      (2L, "alpha beta gamma delta zz unrelated run"),
      (3L, "nothing shared at all here")
    ).toDF("doc_id", "text")
    val got = Decontaminate.containmentReport(train, b, "doc_id", "text",
        n = 4, threshold = 0.5)
      .select("train_id", "bench_ngrams", "inter", "containment")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5)))
  }

  test("containment: bench docs shorter than n cannot appear") {
    val b = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val train = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(Decontaminate.containmentReport(train, b, "doc_id", "text",
      n = 4, threshold = 0.0).isEmpty)
  }

  test("the benchmark side broadcasts (corpus shingles never shuffle)") {
    graft.llm.BarrierCache.sweep(spark)
    val train = Tables.documents(spark, sf).filter(col("doc_id") % 23 =!= 0)
    val b = Tables.documents(spark, sf).filter(col("doc_id") % 23 === 0)
    val plan = Decontaminate.contaminated(train, b, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    graft.llm.BarrierCache.sweep(spark)
  }
}

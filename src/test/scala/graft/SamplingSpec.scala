package graft

import graft.llm.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling: the properties that make a 100 TB corpus
  * mix reproducible — membership is a pure function of the row id,
  * independent of partitioning, stable under appends.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val w = Map("a" -> 0.5, "b" -> 1.0)

  test("membership is partitioning-independent and append-stable") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = Sampling.weightedSample(df, "id", "grp", w)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(df.repartition(13), "id", "grp", w)
      .select("id").as[Long].collect().toSet
    assert(s1 === s2, "repartition changed the sample")
    // appending rows never flips existing membership
    val bigger = (1L to 3000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s3 = Sampling.weightedSample(bigger, "id", "grp", w)
      .select("id").as[Long].collect().toSet
    assert(s3.filter(_ <= 2000L) === s1, "append changed old membership")
  }

  test("realized fractions track the weights; unknown groups drop") {
    val df = (1L to 4000L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt)))
      .toDF("id", "grp")
    val got = Sampling.weightedSample(df, "id", "grp", w)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    val totals = df.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(!got.contains("c")) // no weight -> dropped
    assert(got("b") === totals("b")) // weight 1.0 keeps everything
    val fA = got("a").toDouble / totals("a")
    assert(math.abs(fA - 0.5) < 0.06, s"fraction $fA drifted from 0.5")
  }

  test("weightedBottomK: exact size, partition-invariant, weight-biased") {
    // 29 groups (coprime with the 5 weight classes, so weights VARY
    // within each group — i%30 would freeze one weight per group)
    val df = (1 to 2900).map(i => (i.toLong, s"g${i % 29}")).toDF("id", "g")
      .withColumn("wt", lit(1L) + pmod(col("id"), lit(5L)))
    def pick(parts: Int) =
      Sampling.weightedBottomK(df.repartition(parts), "id", "g", col("wt"), k = 2)
        .select("g", "id", "rnk").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val sel = pick(1)
    assert(sel === pick(17), "repartition changed the weighted sample")
    assert(sel.size === 29 * 2, "every group must yield exactly k rows")
    // selection probability ∝ weight: the selected rows' mean weight
    // must sit well above the population mean of 3 (E[w|top-1] =
    // Σw²/Σw ≈ 3.67 for weights 1..5). Deterministic data + md5 ⇒
    // this is a fixed number, the margin just documents the bias.
    val meanSel = Sampling.weightedBottomK(df, "id", "g", col("wt"), k = 2)
      .agg(avg("wt")).head().getDouble(0)
    assert(meanSel > 3.2, s"selected mean weight $meanSel shows no weight bias")
  }

  test("weightedBottomK excludes null and non-positive weights") {
    val df = Seq[(Long, String, java.lang.Long)](
      (1L, "g", 3L), (2L, "g", 0L), (3L, "g", -2L), (4L, "g", null),
      (5L, "h", null), (6L, "h", 0L))
      .toDF("id", "g", "wt")
    val got = Sampling.weightedBottomK(df, "id", "g", col("wt"), k = 2)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // only the one positively-weighted row holds a ticket; group h
    // (no eligible rows) yields nothing rather than null-priority picks
    assert(got === Seq(("g", 1L)))
  }

  test("stratifiedK keeps exactly k per stratum, short strata intact") {
    val df = ((1L to 100L).map((_, "big")) ++ (101L to 103L).map((_, "small")))
      .toDF("id", "g")
    val got = Sampling.stratifiedK(df, "id", "g", k = 10)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got === Map("big" -> 10L, "small" -> 3L))
    // ranks are dense 1..k
    val ranks = Sampling.stratifiedK(df, "id", "g", k = 10)
      .filter(col("g") === "big").select("rnk").as[Long].collect().sorted
    assert(ranks === (1L to 10L).toArray)
  }

  test("stratifiedK is deterministic under repartitioning") {
    val df = (1L to 500L).map(i => (i, (i % 7).toString)).toDF("id", "g")
    def pick(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedK(d, "id", "g", k = 5)
        .select("g", "rnk", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pick(df) === pick(df.repartition(13)))
  }

  test("stratifiedK pushes the limit below the shuffle (WindowGroupLimit)") {
    val df = (1L to 500L).map(i => (i, (i % 7).toString)).toDF("id", "g")
    val plan = Sampling.stratifiedK(df, "id", "g", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("uniform() covers [0,1) roughly uniformly") {
    val u = (1L to 10000L).toDF("id")
      .select(Sampling.uniform(col("id")).as("u"))
    val buckets = u.select(floor(col("u") * 10).cast("int").as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(buckets.keySet === (0 to 9).toSet)
    buckets.values.foreach(n => assert(math.abs(n - 1000L) < 200, s"bucket size $n"))
  }
}

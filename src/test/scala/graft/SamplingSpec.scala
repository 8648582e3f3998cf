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

  test("uniform() covers [0,1) roughly uniformly") {
    val u = (1L to 10000L).toDF("id")
      .select(Sampling.uniform(col("id")).as("u"))
    val buckets = u.select(floor(col("u") * 10).cast("int").as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(buckets.keySet === (0 to 9).toSet)
    buckets.values.foreach(n => assert(math.abs(n - 1000L) < 200, s"bucket size $n"))
  }
}

package graft

import graft.llm.Importance
import org.apache.spark.sql.functions._

/** DSIR importance weights: exact-zero self-comparison, direction on
  * the real corpus, hashed-bucket production path invariants, and
  * partition invariance of the integer weight sums.
  */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("self-comparison weights are exactly zero (string and hashed)") {
    for (buckets <- Seq(0, 256)) {
      val w = Importance.logWeights(docs, docs, "doc_id", "text", buckets)
      assert(w.filter(col("logw9") =!= 0L).count() === 0, s"buckets=$buckets")
      assert(w.count() > 0)
    }
  }

  test("English-target weights rank English docs above the rest") {
    val w = Importance.logWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val Seq((avgEn, avgOther)) = w
      .agg(
        avg(when(col("lang") === "en", col("logw9"))),
        avg(when(col("lang") =!= "en", col("logw9"))))
      .as[(Double, Double)].collect().toSeq
    assert(avgEn > avgOther,
      s"en mean $avgEn should exceed non-en mean $avgOther")
  }

  test("hashed path agrees with itself across partitionings") {
    val a = Importance.logWeights(docs.repartition(1),
        docs.filter(col("lang") === "en").repartition(1), "doc_id", "text", 128)
      .orderBy("doc_id").collect().toSeq
    val b = Importance.logWeights(docs.repartition(7),
        docs.filter(col("lang") === "en").repartition(3), "doc_id", "text", 128)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("docs without bigrams are absent; weights cover the rest") {
    val tiny = Seq((1L, "solo"), (2L, "a b a"), (3L, "a b")).toDF("doc_id", "text")
    val w = Importance.logWeights(tiny, tiny.filter(col("doc_id") === 2L),
      "doc_id", "text")
    val ids = w.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L, 3L))
  }
}

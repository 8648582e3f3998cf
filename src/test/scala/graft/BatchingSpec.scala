package graft

import graft.llm.Batching
import org.apache.spark.sql.functions._

/** Length-bucketed dynamic batching: assignment math, padding
  * accounting, and the bounded-window plan shape.
  */
class BatchingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Int): (Long, String) =
    (id, Seq.fill(words)("w").mkString(" "))

  test("batch cuts at batchSize inside a (bucket, salt) partition") {
    // 5 docs, all 10 tokens → bucket 0; single salt; batches of 2
    val docs = (1L to 5L).map(doc(_, 10)).toDF("doc_id", "text")
    val got = Batching.plan(docs, "doc_id", "text",
        bucketWidth = 16, batchSize = 2, nSalts = 1)
      .select("batch", "n_docs").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((0L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("padding waste is n_docs*max_len - total against the batch max") {
    // one batch: lengths 4 and 10 → pad = 2*10 - 14 = 6, frac 0.3
    val docs = Seq(doc(1L, 4), doc(2L, 10)).toDF("doc_id", "text")
    val r = Batching.plan(docs, "doc_id", "text",
        bucketWidth = 16, batchSize = 8, nSalts = 1)
      .select("n_docs", "max_len", "total_tokens", "pad_tokens", "pad_frac")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r === ((2L, 10L, 14L, 6L, 0.3)))
  }

  test("docs land in floor(len/bucketWidth) buckets; salt = id mod nSalts") {
    val docs = Seq(doc(10L, 15), doc(11L, 16), doc(12L, 33)).toDF("doc_id", "text")
    val got = Batching.plan(docs, "doc_id", "text",
        bucketWidth = 16, batchSize = 8, nSalts = 4)
      .select("bucket", "salt").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 2L), (1L, 3L), (2L, 0L)))
  }

  test("no global window: every window partitions by (bucket, salt)") {
    val docs = (1L to 40L).map(doc(_, 10)).toDF("doc_id", "text")
    val plan = Batching.plan(docs, "doc_id", "text", 16, 8, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.contains("SinglePartition"),
      plan.take(2000))
  }
}

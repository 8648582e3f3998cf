package graft

import graft.llm.Relevance
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark joins shuffle data across the cluster"),
    (2L, "broadcast joins avoid the shuffle for small tables"),
    (3L, "columnar scans prune columns and push filters"),
    (4L, "shuffle shuffle shuffle shuffle shuffle shuffle shuffle shuffle"),
    (5L, "an unrelated sentence about gardening and soil")
  ).toDF("doc_id", "text")

  private def scores(terms: Seq[String]): Map[Long, Double] =
    Relevance.bm25(corpus, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("documents without any query term score exactly zero") {
    val s = scores(Seq("shuffle"))
    assert(s(3L) === 0.0)
    assert(s(5L) === 0.0)
  }

  test("matching documents outrank non-matching; rarer terms weigh more") {
    val s = scores(Seq("shuffle", "joins"))
    assert(s(1L) > 0.0 && s(2L) > 0.0 && s(4L) > 0.0)
    assert(s(5L) === 0.0)
    // doc 1 and 2 hit both terms, doc 4 only one (with heavy tf
    // saturation + length penalty): both-term docs must win
    assert(s(1L) > s(4L) && s(2L) > s(4L))
  }

  test("term-frequency saturation: 8x tf does not give 8x score") {
    val one = Relevance.bm25(
      Seq((1L, "shuffle pad pad pad pad pad pad pad"),
          (2L, "shuffle shuffle shuffle shuffle shuffle shuffle shuffle shuffle"))
        .toDF("doc_id", "text"),
      "doc_id", "text", Seq("shuffle"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(one(2L) > one(1L))
    assert(one(2L) < 4.0 * one(1L), "tf must saturate, not scale linearly")
  }

  test("hand-computed BM25 on a 2-doc corpus matches to 1e-6") {
    // corpus: d1 = "a b", d2 = "b b"; query = ["b"]
    // N=2, avgdl=2, df(b)=2, idf = ln(1 + 0.5/2.5)
    // d1: tf=1 -> idf * (1*2.25) / (1 + 1.25*(0.25+0.75*2/2)) = idf * 2.25/2.25
    // d2: tf=2 -> idf * (2*2.25) / (2 + 1.25*1.0) = idf * 4.5/3.25
    val idf = math.log(1.0 + 0.5 / 2.5)
    val got = Relevance.bm25(
      Seq((1L, "a b"), (2L, "b b")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(1L) - idf) < 1e-6)
    assert(math.abs(got(2L) - idf * 4.5 / 3.25) < 1e-6)
  }

  test("plan: one-row stats attach via broadcast, no wide shuffle join") {
    val plan = Relevance.bm25(corpus, "doc_id", "text", Seq("shuffle"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge join expected:\n$plan")
  }

  test("index-served BM25 over a parquet round-trip is bit-identical to the scan form") {
    val terms = Seq("shuffle", "joins", "columns")
    val root = tmpDir("bm25_idx")
    graft.etl.Load.writeAtomic(spark,
      Relevance.indexPostings(corpus, "doc_id", "text"), s"$root/post")
    graft.etl.Load.writeAtomic(spark,
      Relevance.indexDocLens(corpus, "doc_id", "text"), s"$root/len")
    val served = Relevance.bm25FromIndex(
        graft.etl.Load.readTable(spark, s"$root/post"),
        graft.etl.Load.readTable(spark, s"$root/len"),
        "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val scan = Relevance.bm25(corpus, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(served === scan)
  }

  test("incremental postings append equals a full rebuild") {
    val base = corpus.filter(col("doc_id") <= 3L)
    val fresh = corpus.filter(col("doc_id") > 3L)
    val appended = Relevance.indexPostings(base, "doc_id", "text")
      .unionByName(Relevance.indexPostings(fresh, "doc_id", "text"))
    val full = Relevance.indexPostings(corpus, "doc_id", "text")
    assert(appended.exceptAll(full).count() === 0L)
    assert(full.exceptAll(appended).count() === 0L)
    // doc lengths likewise
    val lens = Relevance.indexDocLens(base, "doc_id", "text")
      .unionByName(Relevance.indexDocLens(fresh, "doc_id", "text"))
    assert(lens.exceptAll(Relevance.indexDocLens(corpus, "doc_id", "text")).count() === 0L)
  }
}

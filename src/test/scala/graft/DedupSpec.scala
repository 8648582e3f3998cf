package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** A8 dedup family: exact, MinHash-vs-exact equivalence, SimHash
  * precision, skew cap.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("exact dedup keeps min id per content hash") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (3L, 1L)))
  }

  test("shingles: distinct word n-grams, short docs yield none") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val got = Dedup.shingles(df, "doc_id", "text", 3)
      .orderBy("doc_id", "shingle").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "a b c"), (1L, "b c d")))
  }

  test("MinHash+LSH reproduces the exact Jaccard pair set (no lost dups)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_i", "id_j", "inter", "sz_union")
      .orderBy("id_i", "id_j").collect().toSeq
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 0.8)
      .select("id_i", "id_j", "inter", "sz_union")
      .orderBy("id_i", "id_j").collect().toSeq
    assert(exact.nonEmpty)
    assert(lsh === exact)
  }

  test("SimHash pairs are high-Jaccard (precision against exact pairs)") {
    val sim = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 3)
      .select("id_i", "id_j").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_i", "id_j").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty)
    val precision = sim.count(exact.contains).toDouble / sim.size
    assert(precision >= 0.9, s"simhash precision $precision over ${sim.size} pairs")
  }

  test("hot-shingle cap bounds the join without losing planted dups") {
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, maxDocFreq = 50)
      .select("id_i", "id_j").as[(Long, Long)].collect().toSet
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_i", "id_j").as[(Long, Long)].collect().toSet
    // near-dup pairs share many rare shingles; capping hot ones may
    // only shrink intersection counts, never invent pairs
    assert(capped.subsetOf(full))
  }
}

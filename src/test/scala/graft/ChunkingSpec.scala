package graft

import graft.llm.Chunking
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[(Long, String, Long)] =
    Chunking.chunk(Seq(Tuple1(text)).toDF("text"), col("text"), size, overlap)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("short documents yield one chunk; empty documents none") {
    assert(chunksOf("a b c", 5, 2) === Seq((0L, "a b c", 3L)))
    assert(chunksOf("   ", 5, 2) === Seq.empty)
    assert(chunksOf("", 5, 2) === Seq.empty)
  }

  test("windows step by size-overlap and share exactly overlap tokens") {
    val got = chunksOf("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", size = 4, overlap = 1)
    assert(got === Seq(
      (0L, "t0 t1 t2 t3", 4L),
      (1L, "t3 t4 t5 t6", 4L),
      (2L, "t6 t7 t8 t9", 4L)))
  }

  test("the final partial chunk reaches the last token, never empty") {
    val got = chunksOf("t0 t1 t2 t3 t4 t5 t6 t7", size = 4, overlap = 1)
    assert(got.last === (2L, "t6 t7", 2L))
    // every token appears in some chunk
    val covered = got.flatMap(_._2.split(" ")).toSet
    assert(covered === (0 to 7).map("t" + _).toSet)
  }

  test("random lengths: full coverage and exact overlap invariants") {
    val docs = (1 to 40).map { i =>
      (i.toLong, (0 until (i * 7 % 23) + 1).map("w" + _).mkString(" "))
    }
    val out = Chunking.chunk(docs.toDF("id", "text"), col("text"), 6, 2)
      .groupBy("id")
      .agg(sum("n_tokens").as("tok_sum"), count(lit(1)).as("n_chunks"),
        max("n_tokens").as("max_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (id, tokSum, nChunks, maxTok) =>
      val nTok = docs.find(_._1 == id).get._2.split(" ").length.toLong
      // each chunk after the first re-counts `overlap` shared tokens
      assert(tokSum === nTok + 2L * (nChunks - 1),
        s"doc $id: token accounting off (nTok=$nTok chunks=$nChunks sum=$tokSum)")
      assert(maxTok <= 6L)
    }
  }

  test("plan: chunking is shuffle-free projection + generate") {
    val df = (1 to 10).map(i => (i.toLong, "a b c d e f g h")).toDF("id", "text")
    val plan = Chunking.chunk(df, col("text"), 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle\n$plan")
  }
}

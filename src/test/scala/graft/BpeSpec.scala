package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** BPE train + apply: the classic hand-checkable corpus reproduces
  * the known merge sequence, apply follows greedy lowest-rank
  * semantics, and the corpus-trained tokenizer round-trips real
  * documents.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. 2016 running example: {low:5, lower:2, newest:6,
  // widest:3}. Pair counts: (e,s)=9, (s,t)=9 tie → lexicographic
  // picks (e,s); then (es,t)=9; then (l,o)=7.
  private val sennrich = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("training reproduces the classic merge sequence with deterministic ties") {
    val merges = Bpe.train(sennrich, nMerges = 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")))
    // full run is deterministic end to end
    assert(Bpe.train(sennrich, nMerges = 10) === Bpe.train(sennrich, nMerges = 10))
  }

  test("encode applies merges greedily by rank, all occurrences, leftmost-first") {
    val merges = Bpe.train(sennrich, nMerges = 3)
    val got = Seq("lowest newest low")
      .toDF("text")
      .select(Bpe.encode(col("text"), merges))
      .head().getSeq[String](0)
    // lowest → lo w est; newest → n e w est; low → lo w
    assert(got === Seq("lo", "w", "est", "n", "e", "w", "est", "lo", "w"))
    // unknown characters pass through as single code points
    val raw = Seq("zzz").toDF("text")
      .select(Bpe.encode(col("text"), merges)).head().getSeq[String](0)
    assert(raw === Seq("z", "z", "z"))
  }

  test("empty and multi-space text encode cleanly; nulls propagate") {
    val merges = Bpe.train(sennrich, nMerges = 3)
    val df = Seq(Some(""), Some("  low  "), None).toDF("text")
      .select(Bpe.encode(col("text"), merges).as("s"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) === Seq.empty)
    assert(rows(1).getSeq[String](0) === Seq("lo", "w"))
    assert(rows(2).isNullAt(0))
  }

  test("corpus-trained tokenizer round-trips and compresses real documents") {
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.trainFromCorpus(docs, "text", maxWords = 500, nMerges = 50)
    assert(merges.nonEmpty && merges.size <= 50)
    val checked = docs.select(
        Bpe.encode(col("text"), merges).as("sub"),
        regexp_replace(col("text"), " ", "").as("strip"),
        size(filter(llm.TextStats.tokens(col("text")), t => length(t) > 0)).as("nw"))
      .select(
        (concat_ws("", col("sub")) === col("strip")).as("rt"),
        (size(col("sub")) <= length(col("strip")) &&
          size(col("sub")) >= col("nw")).as("cp"),
        (size(col("sub")) < length(col("strip"))).as("shrunk"))
    assert(checked.filter(!col("rt")).count() === 0, "roundtrip identity")
    assert(checked.filter(!col("cp")).count() === 0, "subword count bounds")
    // trained merges must actually compress a meaningful share of docs
    assert(checked.filter(col("shrunk")).count() > 0, "no merge ever applied")
  }
}

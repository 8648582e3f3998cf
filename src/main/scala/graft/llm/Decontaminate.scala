package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share an
  * n-gram with an evaluation/benchmark set, so they can be dropped
  * before training (the standard "13-gram overlap" test-set leak
  * check, parameterized n).
  *
  * Scale shape: the benchmark side is small by construction (eval
  * suites are thousands of documents; the corpus is the 100 TB
  * side), so its distinct shingle set is BROADCAST and the corpus
  * pays one scan + flatMap + broadcast left-semi join — no shuffle
  * of corpus shingles. Only the matched doc ids (a tiny set) are
  * shuffled for the final distinct. Shingles compare as xxhash64
  * int64s — same collision trade as [[Dedup.hashedShingles]].
  */
object Decontaminate {

  /** Ids of `train` docs sharing at least one word n-gram with any
    * `bench` doc. Output column: the id column, one row per
    * contaminated doc.
    */
  def contaminated(train: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    val benchShingles = Dedup.hashedShingles(bench, idCol, textCol, n)
      .select("h").distinct()
    Dedup.hashedShingles(train, idCol, textCol, n)
      .join(broadcast(benchShingles), Seq("h"), "left_semi")
      .select(idCol).distinct()
  }

  /** [[contaminated]] for a benchmark side too big to broadcast as
    * an exact hash set (a full eval-suite union can carry hundreds
    * of millions of distinct shingles — tens of GB exact, but tens
    * of MB as a Bloom filter at 1% fpp). Two stages:
    *
    *   1. broadcast the BLOOM of the bench shingles; corpus
    *      shingles that miss it are definitively clean (no false
    *      negatives) and never shuffle;
    *   2. the surviving candidates (true hits + ~fpp false
    *      positives) go through the exact SHUFFLED semi-join, which
    *      clears the false positives.
    *
    * Result is row-identical to [[contaminated]]; the corpus-side
    * shuffle shrinks from every-shingle to ~(hit-rate + fpp) of the
    * corpus. The membership probe is a Scala UDF (off-codegen), but
    * it is one long→boolean call applied pre-shuffle — the scan
    * stays I/O-bound.
    */
  def contaminatedBloom(train: DataFrame, bench: DataFrame,
                        idCol: String, textCol: String, n: Int,
                        expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val benchShingles = Dedup.hashedShingles(bench, idCol, textCol, n)
      .select("h").distinct()
    val bloom = benchShingles.stat.bloomFilter("h", expectedItems, fpp)
    val bloomB = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomB.value.mightContainLong(h))
    Dedup.hashedShingles(train, idCol, textCol, n)
      .filter(mightContain(col("h")))
      .join(benchShingles, Seq("h"), "left_semi") // shuffled, not broadcast
      .select(idCol).distinct()
  }
}

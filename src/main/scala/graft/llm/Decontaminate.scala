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

  /** Graded contamination: per (train doc, bench doc) n-gram
    * CONTAINMENT score — |shingles(train) ∩ shingles(bench)| /
    * |shingles(bench)| — the fraction of the benchmark document
    * present verbatim in the training document. [[contaminated]]'s
    * any-overlap flag is the cheap screen; this is the graded form
    * the published decontamination protocols actually threshold on
    * (a single shared n-gram is noise; 80% of an eval question
    * reproduced is a leak).
    *
    * Output: (bench_id, train_id, bench_ngrams, inter, containment)
    * for pairs with containment >= threshold. Bench docs shorter
    * than n tokens have no shingles and cannot appear.
    *
    * Scale shape: inverted-index equi-join on the 8-byte shingle
    * hash — candidate pairs only ever materialize for docs that
    * share at least one shingle, the (train,bench) aggregate is
    * map-side partial, and the bench-size join key is the bench id
    * (tiny side). Nothing is all-pairs and nothing broadcasts the
    * corpus; a big bench set degrades gracefully into an ordinary
    * shuffled join.
    */
  def containmentReport(train: DataFrame, bench: DataFrame,
                        idCol: String, textCol: String, n: Int,
                        threshold: Double): DataFrame = {
    val benchSh = Dedup.hashedShingles(bench, idCol, textCol, n)
      .select(col(idCol).as("bench_id"), col("h"))
    val benchSz = benchSh.groupBy("bench_id")
      .agg(count(lit(1)).as("bench_ngrams"))
    val trainSh = Dedup.hashedShingles(train, idCol, textCol, n)
      .select(col(idCol).as("train_id"), col("h"))
    trainSh.join(benchSh, Seq("h"))
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("inter"))
      .join(benchSz, Seq("bench_id"))
      .withColumn("containment",
        col("inter").cast("double") / col("bench_ngrams").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("bench_id"), col("train_id"), col("bench_ngrams"),
        col("inter"),
        // integer half-up, not round(double, 6): see ExactRound
        expr(ExactRound.round6Expr("inter", "bench_ngrams"))
          .as("containment"))
  }
}

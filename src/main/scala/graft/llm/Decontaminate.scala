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
}

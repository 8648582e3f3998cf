package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAIN + APPLY (Sennrich et al. 2016)
  * — the real LLM-pipeline operator upgrading
  * [[TextStats.subwordTokens]]'s regex heuristic.
  *
  * Scale split: the distributed part is ONE corpus scan producing the
  * word-frequency table (explode → groupBy word → top-`maxWords`
  * TakeOrdered — bounded output regardless of corpus rows); training
  * then runs driver-side over that bounded table, exactly how
  * production BPE trainers work (merge decisions need global pair
  * counts every iteration — iterating distributed would mean
  * `nMerges` corpus shuffles for a result that fits in kilobytes).
  * Apply is a pure per-row expression ([[graft.functions.BpeEncode]])
  * — scan-projection parallel, no shuffle.
  *
  * Determinism: the word table orders by (count desc, word asc); each
  * merge picks the highest-count pair with lexicographic (left,
  * right) tie-break; merging rewrites all occurrences leftmost-first.
  * Same corpus → same merge list, bit-for-bit.
  */
object Bpe {

  /** Classic BPE training over a word-frequency table: repeatedly
    * merge the highest-total-count adjacent symbol pair. Stops early
    * when no pair occurs at least `minCount` times (default 2 — a
    * merge seen once compresses nothing).
    */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int,
            minCount: Long = 2L): Seq[(String, String)] = {
    def codePoints(w: String): Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        out += w.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, n) => (codePoints(w), n) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.size < nMerges && !stop) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, n) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      // highest count, ties to the lexicographically smallest pair
      var bc = -1L; var ba: String = null; var bb: String = null
      pc.foreach { case ((a, b), c) =>
        if (c > bc || (c == bc && (a < ba || (a == ba && b < bb)))) {
          bc = c; ba = a; bb = b
        }
      }
      if (bc < minCount) stop = true
      else {
        merges += ((ba, bb))
        val merged = ba + bb
        words = words.map { case (s, n) =>
          if (s.length < 2) (s, n)
          else {
            val next = new scala.collection.mutable.ArrayBuffer[String](s.length)
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == ba && s(j + 1) == bb) {
                next += merged; j += 2
              } else {
                next += s(j); j += 1
              }
            }
            (next.toArray, n)
          }
        }
      }
    }
    merges.toSeq
  }

  /** The one distributed step: word-frequency table capped at
    * `maxWords` (count desc, word asc — a TakeOrdered, no global
    * sort), collected as bounded metadata, then driver-side
    * [[train]].
    */
  def trainFromCorpus(docs: DataFrame, textCol: String,
                      maxWords: Int = 2000, nMerges: Int = 200): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = docs
      .select(explode(TextStats.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)].collect().toSeq
    train(wc, nMerges)
  }

  /** Apply a merge list: flat subword array (see
    * [[graft.functions.BpeEncode]]).
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.{GraftShim => EU}
    EU.column(graft.functions.BpeEncode(EU.expression(text), merges))
  }
}

package graft

import graft.llm.QualityRules
import org.apache.spark.sql.Row

/** Gopher rule battery: each rule's boundary behavior on crafted docs. */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: (Long, String)*) =
    QualityRules.report(rows.toDF("doc_id", "text"), "doc_id", "text",
      minWords = 5L, maxWords = 10L)

  test("word-count bounds are inclusive") {
    val got = report(
      (1L, "a b c d"),            // 4 words < 5
      (2L, "a b c d e"),          // exactly min
      (3L, "a b c d e f g h i j"),           // exactly max
      (4L, "a b c d e f g h i j k"))         // 11 > max
      .select("doc_id", "words_ok").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> false))
  }

  test("mean word length rule: (chars - words + 1) / words in [3,10]") {
    val short = report((1L, "ab ab ab ab ab"))        // mwl 2 → fail
      .select("wordlen_ok").as[Boolean].head()
    val ok = report((2L, "abcd abcd abcd abcd abcd")) // mwl 4 → pass
      .select("wordlen_ok").as[Boolean].head()
    assert(!short && ok)
  }

  test("symbol ratio counts '#' and '...' against words") {
    val r = report((1L, "alpha# beta... gamma delta epsilon"))
      .select("symbol_ratio", "symbol_ok").as[(Double, Boolean)].head()
    assert(r._1 === 0.4 && !r._2) // 2 symbols / 5 words
  }

  test("alpha fraction: words need at least one letter") {
    val r = report((1L, "one two 123 456 five"))
      .select("alpha_frac", "alpha_ok").as[(Double, Boolean)].head()
    assert(r._1 === 0.6 && !r._2)
  }

  test("stop rule wants >= 2 DISTINCT stop words (dups count once)") {
    val one = report((1L, "the cat the dog the fox"))
      .select("stop_ok").as[Boolean].head()
    val two = report((2L, "the cat and dog go far"))
      .select("stop_ok").as[Boolean].head()
    assert(!one && two)
  }

  test("pass is the conjunction of all five rules") {
    val Row(pass: Boolean) = report(
      (1L, "the quick brown fox jumps over and over again"))
      .select("pass").head()
    assert(pass)
  }
}

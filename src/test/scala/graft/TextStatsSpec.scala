package graft

import graft.llm.TextStats
import org.apache.spark.sql.functions._

/** A9 text-analysis primitives: token counts, diversity, lang-ID
  * argmax determinism, quality band edges, fingerprint normalization.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def one(texts: String*)(c: org.apache.spark.sql.Column): Seq[Any] =
    texts.toDF("text").select(c.as("v")).collect().map(_.get(0)).toSeq

  test("token and char counts") {
    assert(one("a b c", "single")(TextStats.tokenCount(col("text"))) === Seq(3, 1))
    assert(one("abc de")(TextStats.charCount(col("text"))) === Seq(6))
  }

  test("type-token ratio reflects repetition") {
    val Seq(uniq, repeated) =
      one("a b c d", "a a a a")(TextStats.typeTokenRatio(col("text")))
    assert(uniq === 1.0)
    assert(repeated === 0.25)
  }

  test("lang guess: stopword argmax, first-wins ties, unknown when no hits") {
    assert(one("the fast table", "der und nicht zoo", "xyzzy qwerty")(
      TextStats.langGuess(col("text")))
      === Seq("en", "de", "unknown"))
    // tie between en ('the') and de ('der') → earlier profile wins
    assert(one("the der")(TextStats.langGuess(col("text")))  === Seq("en"))
  }

  test("quality score stays in [0,1]; degenerate docs score low") {
    val scores = Tables.documents(spark, sf)
      .select(TextStats.qualityScoreRaw(col("text")).as("q"))
      .agg(min("q"), max("q")).collect().head
    assert(scores.getDouble(0) >= 0.0 && scores.getDouble(1) <= 1.0)
    val Seq(degenerate) = one("a a")(TextStats.qualityScoreRaw(col("text")))
    assert(degenerate.asInstanceOf[Double] < 0.5)
  }

  test("fingerprint is stable under punctuation/case noise") {
    val fps = one("Hello,  World!", "hello world")(TextStats.fingerprint(col("text")))
    assert(fps.distinct.size === 2) // double space ≠ single (regex is literal, not semantic)
    val fps2 = one("hello world!", "hello world.")(TextStats.fingerprint(col("text")))
    assert(fps2.distinct.size === 1)
  }

  test("subword tokens split on punctuation boundaries") {
    val toks = Seq("don't-stop").toDF("text")
      .select(TextStats.subwordTokens(col("text"))).collect().head.getSeq[String](0)
    assert(toks === Seq("don", "'", "t", "-", "stop"))
  }

  test("bigrams: adjacent pairs; singleton and repeated docs") {
    val got = Seq("a b c b c", "solo").toDF("text")
      .select(TextStats.bigrams(col("text")).as("b"),
        TextStats.distinctBigramCount(col("text")).as("d"),
        TextStats.topTokenCount(col("text")).as("m"))
      .collect()
    assert(got(0).getSeq[String](0) === Seq("a b", "b c", "c b", "b c"))
    assert(got(0).getInt(1) === 3) // "b c" repeats
    assert(got(0).getInt(2) === 2) // b (and c) occur twice
    assert(got(1).getSeq[String](0) === Seq.empty)
    assert(got(1).getInt(1) === 0)
    assert(got(1).getInt(2) === 1)
  }

  test("subwordCount equals alnum-runs + non-alnum-chars (the RE2 oracle form)") {
    // edge shapes: leading/trailing punctuation, consecutive
    // delimiters, pure punctuation, empty-ish strings
    val cases = Seq("don't-stop", "!ab", "ab, cd", ",,", "plain", "a  b!")
    val got = cases.toDF("text")
      .select(TextStats.subwordCount(col("text")).as("sw"),
        (size(regexp_extract_all(col("text"), lit("[a-zA-Z0-9]+"), lit(0))) +
          length(col("text")) -
          length(regexp_replace(col("text"), "[^a-zA-Z0-9]", ""))).as("closed"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }
}

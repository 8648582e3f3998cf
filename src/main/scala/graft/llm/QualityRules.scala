package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", appendix A1.1 — public paper): the standard rule battery
  * a pretraining curation pipeline applies BEFORE model-based
  * filtering. Unlike [[TextStats.qualityScore]] (a blended scalar),
  * this emits the per-rule verdicts, so a pipeline can tune or audit
  * each rule independently — the form the paper actually describes.
  *
  * Implemented rules (the document-shape subset; the paper's
  * line-level rules need multi-line documents, which this corpus'
  * single-line docs cannot exercise — noted, not silently skipped):
  *   - word count within [minWords, maxWords]          (paper: 50..100k)
  *   - mean word length within [3, 10] characters
  *   - symbol-to-word ratio ("#" or "...") <= 0.1
  *   - fraction of words with an alphabetic char >= 0.80
  *   - >= 2 distinct stop words present (the paper's 8-word list)
  *
  * Scale shape: one scan projection — every rule is a codegen'd
  * expression over the token array (no UDF, no shuffle, no join).
  * At 100 TB this is the cheapest possible pass: filter pushes to
  * the scan, and the only cost is the tokenizer the other per-doc
  * queries already pay. Every emitted double is an [[ExactRound]]
  * integer-half-up of a ratio of exact integers, so the DuckDB
  * oracle reproduces it bit-for-bit at any scale — and every rule
  * verdict thresholds on the SAME 10⁶-scaled integer the displayed
  * ratio derives from, so flag and value can never disagree.
  */
object QualityRules {

  /** The paper's stop-word presence list (A1.1). */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule report. Output columns:
    * (id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stops,
    *  words_ok, wordlen_ok, symbol_ok, alpha_ok, stop_ok, pass).
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val toks = TextStats.tokens(t)
    // exact integer counts first (Catalyst collapses the two
    // projections back into one scan-side stage); the rounded ratios
    // are then integer-half-up via ExactRound — round(double, 6)
    // diverges across engines at exact decimal midpoints
    val base = docs.select(col(idCol),
      length(t).cast("long").as("__nchars"),
      TextStats.tokenCount(t).cast("long").as("n_words"),
      (regexp_count(t, lit("#")) +
        regexp_count(t, lit("\\.\\.\\."))).cast("long").as("__nsym"),
      size(filter(toks, x => x.rlike("[a-zA-Z]"))).cast("long").as("__nalpha"),
      TextStats.stopwordHits(t, gopherStops).cast("long").as("n_stops"))
    val nW = col("n_words")
    // one 10⁶-scaled half-up integer per ratio drives BOTH the
    // displayed value and its verdict — a flag thresholded on the
    // unrounded double could disagree with the emitted rounded
    // ratio at boundaries (mean_word_len showing 3.0 with
    // wordlen_ok=false), which is a lie to an auditor
    val withMicros = base
      // chars-per-word excluding separators: (len - (n-1)) / n
      .withColumn("__mwl_u",
        expr(ExactRound.micro6Expr("__nchars - n_words + 1", "n_words")))
      .withColumn("__sym_u", expr(ExactRound.micro6Expr("__nsym", "n_words")))
      .withColumn("__alpha_u", expr(ExactRound.micro6Expr("__nalpha", "n_words")))
    val wordsOk = nW.between(minWords, maxWords)
    val wordlenOk = col("__mwl_u").between(3000000L, 10000000L)
    val symbolOk = col("__sym_u") <= 100000L
    val alphaOk = col("__alpha_u") >= 800000L
    val stopOk = col("n_stops") >= 2L
    withMicros.select(col(idCol), nW,
      (col("__mwl_u").cast("double") / 1e6).as("mean_word_len"),
      (col("__sym_u").cast("double") / 1e6).as("symbol_ratio"),
      (col("__alpha_u").cast("double") / 1e6).as("alpha_frac"),
      col("n_stops"),
      wordsOk.as("words_ok"), wordlenOk.as("wordlen_ok"),
      symbolOk.as("symbol_ok"), alphaOk.as("alpha_ok"),
      stopOk.as("stop_ok"),
      (wordsOk && wordlenOk && symbolOk && alphaOk && stopOk).as("pass"))
  }
}

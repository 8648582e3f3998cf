package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north star;
  * no reference analogue — SURVEY.md §2.9). All pure Column
  * expressions over `documents.text`: they run inside the scan
  * projection, no shuffle, and scale linearly with input.
  */
object TextStats {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Space-joined word n-grams of a token array, built as a chain of
    * `zip_with(acc, slice(toks, k, …), concat)` steps instead of the
    * tempting `transform(sequence(0, size−n), i → join(slice(toks,
    * i+1, n)))`.
    *
    * WHY: in the transform form the lambda body references `toks`,
    * and after Catalyst collapses projections that reference is the
    * full tokenizer subtree (`split(text)`) — re-evaluated PER
    * ELEMENT, turning gram construction O(tokens² · chars) per
    * document (measured: q131/q132 at 5–6 s on 5 k docs where the
    * whole shape should cost well under a second). In the zip_with
    * chain every lambda touches only its own arguments; `toks`
    * appears only as argument expressions, evaluated once per ROW.
    *
    * Trailing positions where the shifted array runs out produce
    * null (concat null-propagates), so the tail filter leaves
    * exactly the size−n+1 grams, in order, duplicates preserved —
    * byte-identical output to the transform form.
    */
  def wordGrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val chained = (2 to n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), size(toks)), (a, b) => concat(a, lit(" "), b))
    }
    if (n == 1) toks else filter(chained, x => x.isNotNull)
  }

  /** BPE-ish subword split: word-boundary + punctuation aware regex
    * (the container has no real tokenizer; this is the standard
    * regex fallback counting sub-word units).
    */
  def subwordTokens(text: Column): Column =
    split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Non-empty subword count (empties appear at leading/trailing
    * boundaries of the zero-width split). Equivalent closed form:
    * #alphanumeric-runs + #non-alphanumeric-chars — which is how the
    * RE2-bound DuckDB oracle mirrors it (RE2 has no lookarounds).
    */
  def subwordCount(text: Column): Column =
    size(filter(subwordTokens(text), t => length(t) > 0))

  def charCount(text: Column): Column = length(text)

  /** Type-token ratio — vocabulary diversity (int/int division is
    * double in both Spark and DuckDB).
    */
  def typeTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / size(tokens(text))

  /** Mean token length. */
  def avgTokenLen(text: Column): Column =
    (length(text) - size(tokens(text)) + 1).cast("double") / size(tokens(text))

  /** Adjacent word bigrams as an array (n_tok - 1 entries; empty for
    * single-token docs). Pure per-row HOF — no explode, no shuffle:
    * the scale-friendly form of repetition analysis (a groupBy over
    * (doc, ngram) would shuffle the whole corpus).
    */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    val n1 = greatest(size(t) - 1, lit(0))
    // zip_with pads to the LONGER array (nulls), so both sides must
    // be sliced to exactly n-1 entries.
    zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
  }

  def distinctBigramCount(text: Column): Column =
    size(array_distinct(bigrams(text)))

  /** Highest single-token occurrence count in the doc (Gopher-style
    * "top word mass" numerator). O(distinct · n) per row via HOFs —
    * bounded by doc length, still projection-only.
    */
  def topTokenCount(text: Column): Column = {
    val t = tokens(text)
    coalesce(
      array_max(transform(array_distinct(t),
        d => size(filter(t, x => x === d)))),
      lit(0))
  }

  /** Stopword hit count for a language profile. */
  def stopwordHits(text: Column, stops: Seq[String]): Column =
    size(array_intersect(tokens(text),
      array(stops.map(lit): _*))) // distinct stopwords present

  /** n-gram-heuristic language ID: score a few language profiles by
    * stopword presence, argmax with deterministic tie-break (profile
    * order). Profiles are tiny literal arrays → stays in codegen.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "fast", "slow"),
    "de" -> Seq("der", "die", "und", "nicht"),
    "es" -> Seq("el", "la", "que", "de"),
    "fr" -> Seq("le", "la", "et", "les"),
    "zh" -> Seq.empty)

  def langGuess(text: Column): Column = {
    val scored = langProfiles.filter(_._2.nonEmpty).map { case (lang, stops) =>
      (lang, stopwordHits(text, stops))
    }
    // argmax, first-wins on ties; all-zero ⇒ 'unknown'
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, sc)) =>
        (when(sc > bs, lit(lang)).otherwise(bl), greatest(sc, bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("unknown"))
  }

  /** Quality score in [0,1]: blend of vocabulary diversity, token
    * shape, and length (heuristics a pretraining filter would use).
    */
  def qualityScoreRaw(text: Column): Column = {
    val ttr = typeTokenRatio(text)
    val lenOk = when(tokenCount(text).between(8, 256), 1.0).otherwise(0.0)
    val wordShape = when(avgTokenLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    ttr * 0.5 + lenOk * 0.25 + wordShape * 0.25
  }

  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Content fingerprint: md5 over punctuation-stripped, lowercased,
    * whitespace-collapsed text (rolling-hash stand-in; md5 is
    * available and identical in Spark and DuckDB).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9 ]|\\s+", " ")))
}

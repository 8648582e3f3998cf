package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style REPETITION rules (Rae et al. 2021, appendix A1.1 —
  * public paper): the other half of the paper's quality battery,
  * complementing [[QualityRules]] (document-shape rules). A document
  * that repeats itself — the same bigram over and over, long
  * duplicated phrases — is boilerplate/spam with high probability,
  * and repetition is the one pathology length/stopword rules can't
  * see.
  *
  * Emitted per document and n:
  *   - top n-gram char fraction (n = 2, 3, 4): characters covered by
  *     occurrences of the single most-repeated n-gram, / total chars.
  *     "Most-repeated" is defined as max over grams of
  *     occurrences·len(gram) — the n-gram covering the most
  *     characters — which is tie-free (the paper's "most frequent"
  *     is ambiguous when two grams tie on count with different
  *     lengths, and an ambiguous metric can't be oracle-checked).
  *   - duplicate n-gram char fraction (n = 5, 6, 7): characters
  *     covered by occurrences of every n-gram that appears ≥ 2
  *     times, / total chars. Overlapping occurrences are counted
  *     per-occurrence (not position-deduplicated as the paper's
  *     interval-union variant), so a pathological doc can exceed
  *     1.0 — documented, deterministic, and strictly more
  *     repetition-sensitive.
  *
  * Thresholds follow the paper's table: top 2/3/4-gram ≤
  * 0.20/0.18/0.16, duplicate 5/6/7-gram ≤ 0.15/0.14/0.13; `rep_ok`
  * is the conjunction. Every fraction is an [[ExactRound]]
  * integer-half-up of exact integer char counts, and each verdict
  * thresholds on the same 10⁶-scaled integer the displayed ratio
  * derives from, so flag and value can never disagree and the
  * DuckDB oracle replays bit-for-bit (q131).
  *
  * Scale shape: one explode of the token stream per n (the paper's
  * battery inherently reads every n-gram occurrence), then two
  * hash aggregations keyed (doc, n, gram) → (doc, n) — map-side
  * partial aggregation applies to both, nothing is windowed, no
  * driver state, and the widest shuffle row is one n-gram with a
  * count. Cost is ∝ Σ_n (tokens − n + 1) ≈ |ns| · corpus tokens,
  * linear at any corpus size.
  */
object Repetition {

  /** (n → threshold·10⁶) for top-gram (2..4) and dup-gram (5..7). */
  val topThresholdsMicro: Map[Int, Long] =
    Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L)
  val dupThresholdsMicro: Map[Int, Long] =
    Map(5 -> 150000L, 6 -> 140000L, 7 -> 130000L)

  private def grams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Per-document repetition report. Output:
    * (id, n_chars, top2_frac, top3_frac, top4_frac,
    *  dup5_frac, dup6_frac, dup7_frac, rep_ok).
    */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val topNs = topThresholdsMicro.keys.toSeq.sorted
    val dupNs = dupThresholdsMicro.keys.toSeq.sorted
    val ns = topNs ++ dupNs
    val toks = TextStats.tokens(col(textCol))
    val base = docs.select(col(idCol).as("__id"),
      length(col(textCol)).cast("long").as("n_chars"), toks.as("__toks"))

    // one (doc, n, gram) occurrence stream for every n in the battery
    val occ = base.select(col("__id"),
        explode(array(ns.map(n =>
          struct(lit(n).as("n"), grams(col("__toks"), n).as("gs"))): _*)).as("a"))
      .select(col("__id"), col("a.n").as("n"), explode(col("a.gs")).as("g"))

    val counts = occ.groupBy("__id", "n", "g")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("chars", col("cnt") * length(col("g")).cast("long"))

    val perN = counts.groupBy("__id", "n").agg(
      max(col("chars")).as("top_chars"),
      sum(when(col("cnt") >= 2L, col("chars")).otherwise(0L)).as("dup_chars"))

    // pivot the fixed battery into columns; docs shorter than n
    // tokens have no (doc, n) row — coalesce to 0 covered chars
    val wideCols =
      topNs.map(n => coalesce(max(when(col("n") === n, col("top_chars"))), lit(0L))
        .as(s"__top${n}_chars")) ++
        dupNs.map(n => coalesce(max(when(col("n") === n, col("dup_chars"))), lit(0L))
          .as(s"__dup${n}_chars"))
    val wide = perN.groupBy("__id").agg(wideCols.head, wideCols.tail: _*)

    val joined = base.select("__id", "n_chars")
      .join(wide, Seq("__id"), "left")
    val filled = (topNs.map(n => s"__top${n}_chars") ++
        dupNs.map(n => s"__dup${n}_chars"))
      .foldLeft(joined)((d, c) => d.withColumn(c, coalesce(col(c), lit(0L))))

    val withMicros = (topNs.map(n => (s"top$n", s"__top${n}_chars")) ++
        dupNs.map(n => (s"dup$n", s"__dup${n}_chars")))
      .foldLeft(filled) { case (d, (tag, src)) =>
        d.withColumn(s"__${tag}_u", expr(ExactRound.micro6Expr(src, "n_chars")))
      }

    val ok = topNs.map(n => col(s"__top${n}_u") <= topThresholdsMicro(n))
      .++(dupNs.map(n => col(s"__dup${n}_u") <= dupThresholdsMicro(n)))
      .reduce(_ && _)

    withMicros.select(
      col("__id").as(idCol) +: col("n_chars") +:
        (topNs.map(n => (col(s"__top${n}_u").cast("double") / 1e6).as(s"top${n}_frac")) ++
          dupNs.map(n => (col(s"__dup${n}_u").cast("double") / 1e6).as(s"dup${n}_frac")) :+
          ok.as("rep_ok")): _*)
  }
}

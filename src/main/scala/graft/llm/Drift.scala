package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift monitor: compare the token distributions of two
  * corpus snapshots (yesterday's crawl vs today's, reference mix vs
  * candidate mix) and report how far they moved — the standing
  * data-quality check a training pipeline runs before letting a new
  * snapshot into the mix, and the first diagnostic read when a
  * downstream eval shifts.
  *
  * Metric: total-variation distance over MICRO-QUANTIZED unigram
  * distributions. Each side's token probability is first rounded
  * half-up to an integer count-per-million (p_micro = round(a·10⁶/n)
  * — [[ExactRound.micro6Expr]], the repo's standard exact-rational
  * rounding), then
  *
  *   tv_microsum = Σ_t |p_micro(t) − q_micro(t)|,
  *   tv_dist     = tv_microsum / (2·10⁶)  ∈ [0, 1].
  *
  * Quantizing BEFORE the sum is the deliberate scale choice, not a
  * shortcut: per-million integers are ≤ 10⁶ regardless of corpus
  * size, so the mover deltas and their sum (≤ vocab·10⁶) stay in
  * long range at ANY scale — 100 TB included — where the exact
  * rational form Σ|a·m − b·n| overflows 64-bit once n·m·a exceeds
  * ~10¹⁹ (a few billion tokens per side). The price is a
  * quantization error bounded by |vocab|·10⁻⁶/2 on tv_dist,
  * documented here and negligible against any drift worth acting
  * on. Every emitted number is an exact integer (or an ExactRound
  * ratio of them), so the DuckDB oracle replays bit-for-bit.
  *
  * Scale shape: one hash aggregation per side keyed on token
  * (map-side combine: shuffle traffic is |vocab|, not |tokens|), a
  * full-outer vocab join, a 1-row totals broadcast per side, and a
  * final |vocab|-row aggregation (q133) or top-k (q134) — no
  * windows, no driver state beyond the 1-row totals.
  */
object Drift {

  /** Unigram counts of a document frame: (tok, <cntName>) — the
    * count-level input [[deltasFromCounts]] consumes, also produced
    * incrementally by the streaming twin
    * ([[graft.streaming.Ingest.driftMonitorAvailableNow]]).
    */
  def sideCounts(df: DataFrame, textCol: String, cntName: String): DataFrame =
    df.select(explode(TextStats.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as(cntName))

  /** Per-token drift frame: (tok, a, b, p_micro, q_micro,
    * delta_micro) with a/b the raw counts (0 where absent) and
    * p/q the per-million quantizations of each side's distribution.
    */
  def tokenDeltas(ref: DataFrame, cur: DataFrame, textCol: String): DataFrame =
    deltasFromCounts(sideCounts(ref, textCol, "a"), sideCounts(cur, textCol, "b"))

  /** Count-level form: `a`/`b` are (tok, a) / (tok, b) frames.
    * Precondition: both sides non-empty — a zero-token side has no
    * distribution to compare (and the exact-rational rounding would
    * divide by zero under ANSI).
    */
  def deltasFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.join(b, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
    val totals = joined.agg(
      sum("a").as("n_ref"), sum("b").as("n_cur"),
      sum(when(col("a") > 0L, 1L).otherwise(0L)).as("vocab_ref"),
      sum(when(col("b") > 0L, 1L).otherwise(0L)).as("vocab_cur"),
      count(lit(1)).as("vocab_union"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_micro", expr(ExactRound.micro6Expr("a", "n_ref")))
      .withColumn("q_micro", expr(ExactRound.micro6Expr("b", "n_cur")))
      .withColumn("delta_micro", abs(col("p_micro") - col("q_micro")))
  }

  /** q133 shape: one summary row — totals, vocab sizes, and the
    * quantized TV distance.
    */
  def summary(ref: DataFrame, cur: DataFrame, textCol: String): DataFrame =
    summarize(tokenDeltas(ref, cur, textCol))

  /** Summary over a prebuilt deltas frame (see [[deltasFromCounts]]). */
  def summarize(deltas: DataFrame): DataFrame =
    deltas
      .groupBy("n_ref", "n_cur", "vocab_ref", "vocab_cur", "vocab_union")
      .agg(sum("delta_micro").as("tv_microsum"))
      .withColumn("tv_dist",
        expr(ExactRound.round6Expr("tv_microsum", "2000000")))
      .select("n_ref", "n_cur", "vocab_ref", "vocab_cur", "vocab_union",
        "tv_microsum", "tv_dist")

  /** q134 shape: the top-k moving tokens by |delta|, deterministic
    * order (delta desc, tok asc) — the "what changed" report read
    * alongside the summary number.
    */
  def topMovers(ref: DataFrame, cur: DataFrame, textCol: String,
                k: Int = 20): DataFrame =
    tokenDeltas(ref, cur, textCol)
      .select("tok", "a", "b", "p_micro", "q_micro", "delta_micro")
      .orderBy(col("delta_micro").desc, col("tok").asc)
      .limit(k)
}

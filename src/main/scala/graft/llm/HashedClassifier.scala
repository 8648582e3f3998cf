package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier — the model-based quality
  * filter of production LLM curation stacks (fasttext-style: hash
  * each token into a fixed bucket space, score = Σ weight[bucket],
  * keep docs above threshold). Complements the rule-based
  * (QualityRules), heuristic (TextStats.qualityScore), generative
  * (LangModel) and importance-sampling (Importance) scorers already
  * in the tier.
  *
  * Scale shape: the score is ONE codegen'd scan projection — a HOF
  * `aggregate` over the token array, each term an O(1) lookup into a
  * plan-literal weight array. No explode, no shuffle, no UDF; cost
  * is linear in corpus tokens and embarrassingly parallel, so the
  * operator is a pure map at any corpus size. Trained weights plug
  * in as `Array[Long]` (fixed-point ints — exact, order-independent
  * sums; float weights would make the reduce order observable);
  * 2^10–2^21 buckets × 8 bytes rides the closure/plan literal the
  * same way a broadcast dim would, with no join.
  *
  * Feature hash: decimal value of the first 6 hex chars of
  * md5(token), mod nBuckets — md5 is the repo's cross-engine hash
  * (TextStats.fingerprint precedent), so a SQL oracle replays
  * bucketing exactly. [[seededWeights]] provides the deterministic
  * stand-in model used by q124 (multiplicative-hash ints in
  * [-1001, +1001]); a real training run swaps its output for learned
  * coefficients through the same seam.
  */
object HashedClassifier {

  /** Deterministic pseudo-random integer weights in [-1001, 1001]:
    * w(b) = (b · 2654435761) mod 2003 − 1001 (Knuth multiplicative
    * constant, prime modulus). Closed-form ⇒ a SQL oracle can replay
    * scores without shipping the array.
    */
  def seededWeights(nBuckets: Int): Array[Long] =
    Array.tabulate(nBuckets)(b => (b.toLong * 2654435761L) % 2003L - 1001L)

  /** Bucket of one token: first 6 hex chars of md5 as an integer,
    * mod nBuckets.
    */
  def bucket(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 6), 16, 10).cast("long") % nBuckets

  /** Exact integer document score: Σ over whitespace tokens of
    * weights[bucket(token)] — tf-weighted by construction (every
    * occurrence contributes).
    */
  def score(text: Column, weights: Array[Long]): Column = {
    val w = typedlit(weights)
    aggregate(split(text, " "), lit(0L),
      (acc, t) => acc + element_at(w, bucket(t, weights.length).cast("int") + 1))
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data builds (the reference has
  * no sampling; this is part of the LLM-pipeline tier — corpus
  * mixing with per-source weights is how training mixtures are
  * specified, and at 100 TB the sample must be REPRODUCIBLE: a
  * rebuild, an incremental top-up, or an audit has to select exactly
  * the same rows).
  *
  * Spark's `df.sample`/`rand(seed)` are partition-order dependent —
  * a repartition or file-split change silently yields a different
  * sample. Keying the decision on a pure integer function of the row
  * ID makes the sample a property of the DATA: engine-independent
  * (reproducible in plain SQL), partitioning-independent, and stable
  * under incremental appends (old rows never change membership).
  */
object Sampling {

  /** Deterministic uniform in [0,1) from an integer id: Knuth
    * multiplicative hashing on the low 31 bits (2654435761 =
    * ⌊2³²/φ⌋; products stay under 2⁶³, so ANSI mode never overflows).
    * For ids wider than 31 bits, pre-fold with xxhash64 — at the cost
    * of SQL reproducibility.
    */
  def uniform(id: Column): Column = mulHash(id, 2654435761L)

  /** A second deterministic uniform from a different multiplier
    * (xxhash PRIME32_2), for decisions that must not correlate with
    * [[uniform]]'s (e.g. holdout split after sampling). Both are
    * linear in the id, so this is decorrelation-in-practice, not
    * independence — a production build wanting provable independence
    * would salt a full 64-bit hash instead (losing plain-SQL
    * reproducibility).
    */
  def uniformSplit(id: Column): Column = mulHash(id, 2246822519L)

  private def mulHash(id: Column, mult: Long): Column =
    pmod(pmod(id.cast("long"), lit(1L << 31)) * lit(mult), lit(1L << 32))
      .cast("double") / lit(4294967296.0)

  /** Deterministic train/validation/test assignment from the row id:
    * the same row lands in the same split on every rebuild and under
    * any partitioning.
    */
  def splitOf(id: Column, trainFrac: Double = 0.9,
              valFrac: Double = 0.05): Column = {
    val u = uniformSplit(id)
    when(u < trainFrac, "train")
      .when(u < trainFrac + valFrac, "val")
      .otherwise("test")
  }

  /** Weighted corpus mix: keep each row with its group's fraction
    * (deterministic per row id). Groups absent from `weights` drop.
    */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     weights: Map[String, Double]): DataFrame = {
    val fracs = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.filter(uniform(col(idCol)) <
      coalesce(element_at(fracs, col(groupCol)), lit(0.0)))
  }

  /** Fixed-SIZE weight-proportional sample: the `k` rows per group
    * with the smallest priority key, where a row of integer weight w
    * gets key = min of w deterministic uniforms (md5 of "id:j",
    * compared as fixed-width hex — string order == numeric order).
    * P(row holds the group minimum) = w/Σw, the exponential-race /
    * A-Res selection scheme restricted to integer weights so the
    * whole decision stays transcendental-free: exact, reproducible
    * in plain SQL, partitioning- and append-stable like every
    * sampler here. Cost: one scan (the w md5s run in an array HOF —
    * keep weights small integers, the per-row array is w elements)
    * + one per-group top-k window (WindowGroupLimit pushes the limit
    * below the shuffle). Output adds `rnk` (1..k).
    *
    * Rows with null or non-positive weight hold no ticket and are
    * EXCLUDED (a group of only such rows yields no sample) — the
    * same rows a DuckDB `range(0, wt)` mirror drops. Without the
    * guard, Spark's descending-default `sequence(0, -1)` would hand
    * weight-0 rows two draws, and null priorities would sort first,
    * outranking every real candidate.
    */
  def weightedBottomK(df: DataFrame, idCol: String, groupCol: String,
                      weight: Column, k: Int): DataFrame = {
    require(k > 0)
    val priority = array_min(transform(
      sequence(lit(0L), weight.cast("long") - 1),
      j => md5(concat(col(idCol).cast("string"), lit(":"), j.cast("string"))
        .cast("binary"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__pri"), col(idCol))
    df.filter(coalesce(weight.cast("long"), lit(0L)) >= 1L)
      .withColumn("__pri", priority)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .drop("__pri")
  }

  /** Exact-K-per-stratum deterministic sample: the k rows of each
    * group with the smallest [[uniform]] hash (id tiebreak). Unlike
    * fraction sampling this guarantees the per-stratum COUNT — the
    * shape training-data mixes are specified in ("20k docs per
    * language"), and unlike `ORDER BY rand()` it is reproducible,
    * append-stable for surviving rows' ranks relative to each other,
    * and partitioning-independent. One per-group window whose limit
    * pushes below the shuffle (WindowGroupLimit): each map task
    * forwards at most k rows per group, so the shuffle carries
    * O(tasks·k·groups), not the corpus. Output adds `rnk` (1..k).
    */
  def stratifiedK(df: DataFrame, idCol: String, groupCol: String,
                  k: Int): DataFrame = {
    require(k > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(uniform(col(idCol)), col(idCol))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}

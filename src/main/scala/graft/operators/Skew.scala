package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale joins/aggregations.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin`, on by
  * default in Spark 4), which splits skewed shuffle partitions at
  * runtime. These helpers cover the cases AQE can't fix:
  *  - a broadcast-ineligible join where a handful of keys dominate
  *    (AQE splits partitions, but one monster key still lands in one
  *    task) → [[saltedJoin]] spreads each key over `salts` subkeys by
  *    replicating the smaller side;
  *  - high-cardinality two-phase aggregation with hot groups →
  *    [[saltedAggregate]] does an explicit partial → final split for
  *    non-algebraic pipelines (plain groupBy/agg already gets partial
  *    aggregation from Spark; use this when composing with UDAF-like
  *    state that doesn't).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key
    * over `salts` sub-partitions. The big side gets a deterministic
    * salt from its row (hash of all columns — stable, no rand());
    * the small side is replicated `salts`× via explode. Result equals
    * the plain inner join row-for-row.
    *
    * Cost model: small side shuffles `salts`× its size; big side's
    * hottest key now occupies `salts` tasks instead of one. Pick
    * `salts` ≈ (hot-key rows / target rows-per-task).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) sum/count aggregation with explicit
    * salting of the hot group keys: phase 1 groups by (keys, salt)
    * spreading hot groups across tasks, phase 2 merges partials.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], valueCol: String,
                      salts: Int): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).cast("long").as("n"))
  }

  /** Diagnostic: per-key row counts of the top-n heaviest keys —
    * what you run before deciding salts.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topN)

  /** Key-skew profile (the q99 report): per-key counts reduced to
    * `(n_keys, total, max_per_key, p50_per_key, p99_per_key,
    * skew_ratio)`.
    *
    * `exact = true` uses Spark's exact `percentile` — its aggregation
    * buffer holds one entry per DISTINCT per-key count value, fine
    * for oracle-checked runs at bench scale but unbounded in the
    * worst case. `exact = false` swaps in `approx_percentile`
    * (Greenwald-Khanna), whose state is O(accuracy) REGARDLESS of
    * key cardinality and merges across partials — the 100 TB path.
    * Same report schema either way (approx results cast to double);
    * error is bounded by `1/accuracy` rank resolution
    * (SkewSpec pins equivalence-at-tolerance and the plan shape).
    */
  def skewReport(df: DataFrame, key: String,
                 exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val per = df.groupBy(key).agg(count(lit(1)).as("n"))
    val (p50, p99) =
      if (exact)
        (expr("percentile(n, 0.5)"), expr("percentile(n, 0.99)"))
      else
        (expr(s"approx_percentile(n, 0.5, $accuracy)").cast("double"),
          expr(s"approx_percentile(n, 0.99, $accuracy)").cast("double"))
    per.agg(count(lit(1)).as("n_keys"),
        sum(col("n")).as("total"),
        max(col("n")).as("max_per_key"),
        p50.as("p50_per_key"),
        p99.as("p99_per_key"))
      .select(col("n_keys"), col("total"), col("max_per_key"),
        col("p50_per_key"), col("p99_per_key"),
        (col("max_per_key").cast("double") /
          (col("total").cast("double") / col("n_keys"))).as("skew_ratio"))
  }
}

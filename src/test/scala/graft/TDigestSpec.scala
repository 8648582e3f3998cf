package graft

import graft.functions.{Digest, TDigestAgg, TDigestCore, TDigestMergeAgg}
import org.apache.spark.sql.functions._

/** t-digest: core compress/quantile invariants, accuracy against
  * exact quantiles, bounded centroid count, and the two-level shard
  * rollup matching a single direct digest within tolerance.
  */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  test("core: compress keeps total weight and mean; stays sorted") {
    val n = 5000
    val means = Array.tabulate(n)(i => ((i * 2654435761L) % 10007).toDouble)
    val weights = Array.fill(n)(1.0)
    val sum0 = means.sum
    val out = TDigestCore.compress(means, weights, n, 200)
    assert(out < n / 4, s"expected real compression, got $out centroids")
    val wTot = weights.take(out).sum
    assert(math.abs(wTot - n) < 1e-6)
    val wm = means.take(out).zip(weights.take(out)).map { case (m, w) => m * w }.sum
    assert(math.abs(wm - sum0) / sum0 < 1e-9, "weighted mean must be preserved")
    assert(means.take(out).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("core: quantiles within 1% rank error on uniform data") {
    val n = 50000
    val means = Array.tabulate(n)(i => ((i * 48271L) % n).toDouble)
    val weights = Array.fill(n)(1.0)
    val cnt = TDigestCore.compress(means, weights, n, 200)
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = TDigestCore.quantile(means, weights, cnt, q)
      // uniform 0..n-1: value ≈ rank, so value error IS rank error
      assert(math.abs(est - q * n) <= 0.01 * n, s"q=$q est=$est")
    }
  }

  test("aggregator: digest of a column tracks exact percentiles") {
    val df = (1 to 20000).map(i => ((i * 7919) % 1000).toDouble).toDF("v")
    val d = df.agg(udaf(TDigestAgg(200)).apply(col("v")).as("d"))
      .select(col("d.means").as("means"), col("d.weights").as("weights"))
      .as[Digest].head()
    val m = d.means.toArray; val w = d.weights.toArray
    val p50 = TDigestCore.quantile(m, w, m.length, 0.5)
    val p99 = TDigestCore.quantile(m, w, m.length, 0.99)
    assert(math.abs(p50 - 500.0) <= 15.0, s"p50=$p50")
    assert(math.abs(p99 - 990.0) <= 15.0, s"p99=$p99")
    assert(m.length <= 8 * 200, s"digest must stay bounded, got ${m.length}")
  }

  test("two-level shard rollup matches the direct digest within tolerance") {
    val df = (1 to 30000)
      .map(i => (i % 8, math.pow(1.0003, i % 9000))) // skewed values
      .toDF("shard", "v")
    val dig = udaf(TDigestAgg(200))
    val mrg = udaf(TDigestMergeAgg(200, Seq(0.5, 0.9, 0.99)))
    val rolled = df.groupBy("shard").agg(dig(col("v")).as("d"))
      .agg(mrg(col("d.means"), col("d.weights")).as("qs")).as[Seq[Double]].head()
    val exact = df.agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"),
      expr("percentile(v, 0.99)")).head()
    for (i <- 0 until 3) {
      val ex = exact.getDouble(i)
      assert(math.abs(rolled(i) - ex) <= math.max(0.05 * ex, 0.01),
        s"prob idx $i: rolled=${rolled(i)} exact=$ex")
    }
  }

  test("digest survives a parquet round-trip and still rolls up") {
    val dir = tmpDir("tdigest")
    val df = (1 to 10000).map(i => (i % 4, (i % 100).toDouble)).toDF("g", "v")
    df.groupBy("g").agg(udaf(TDigestAgg(200)).apply(col("v")).as("d"))
      .write.mode("overwrite").parquet(s"$dir/digests")
    val back = spark.read.parquet(s"$dir/digests")
    val qs = back.agg(udaf(TDigestMergeAgg(200, Seq(0.5))).apply(col("d.means"), col("d.weights")).as("qs"))
      .as[Seq[Double]].head()
    assert(math.abs(qs.head - 49.5) <= 3.0, s"p50 after round-trip: ${qs.head}")
  }
}

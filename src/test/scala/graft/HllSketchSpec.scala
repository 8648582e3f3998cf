package graft

import org.apache.spark.sql.functions._

/** Mergeable HLL (Datasketches) partials: union-of-shard-sketches
  * must equal the direct whole-data sketch regardless of how the
  * data was sharded — the property that lets a 100 TB pipeline
  * persist per-shard sketches and answer distinct-count queries
  * without re-scanning raw data.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1 to 5000).map(i => (i.toLong % 1800, i % 7))
    .toDF("id", "shard")

  test("every sharding and partitioning merges within the envelope") {
    // The union estimate is NOT bit-identical across shardings OR
    // partition counts: hll_sketch_agg itself merges per-partition
    // partials, and sparse partials union exactly while dense ones
    // estimate via slot-max + the composite estimator (the direct
    // sketch's HIP estimate differs again). The durable guarantee —
    // what q72's flags rely on — is that EVERY merge path lands
    // within the accuracy envelope, whose 5% margin dwarfs the
    // lgK=12 rsd of ~1.6%.
    val exact = ids.select(countDistinct(col("id"))).as[Long].head()
    for (parts <- Seq(1, 3, 32); shardKey <- Seq("shard", "id"); mod <- Seq(4, 11)) {
      val est = ids.repartition(parts)
        .groupBy(col(shardKey) % mod)
        .agg(hll_sketch_agg(col("id"), 12).as("sk"))
        .agg(hll_sketch_estimate(
          hll_union_agg(col("sk"), allowDifferentLgConfigK = false)).as("est"))
        .as[Long].head()
      assert(math.abs(est - exact).toDouble <= exact * 0.05,
        s"(parts=$parts $shardKey%$mod) est=$est exact=$exact beyond envelope")
    }
  }

  test("estimate lands within the lgK=12 accuracy envelope") {
    val exact = ids.select(countDistinct(col("id"))).as[Long].head()
    val est = ids.agg(
      hll_sketch_estimate(hll_sketch_agg(col("id"), 12)).as("est"))
      .as[Long].head()
    assert(math.abs(est - exact).toDouble <= exact * 0.05,
      s"est=$est exact=$exact drifted beyond 5%")
  }

  test("sketches survive a persist round-trip as binary columns") {
    val dir = tmpDir("hll")
    val partials = ids.groupBy(col("shard"))
      .agg(hll_sketch_agg(col("id"), 12).as("sk"))
    partials.write.mode("overwrite").parquet(dir)
    def unionEst(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), allowDifferentLgConfigK = false))).as[Long].head()
    assert(unionEst(spark.read.parquet(dir)) === unionEst(partials))
  }
}

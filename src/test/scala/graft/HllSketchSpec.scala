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

  test("union of shard partials equals the direct sketch, any sharding") {
    val direct = ids.agg(
      hll_sketch_estimate(hll_sketch_agg(col("id"), 12)).as("est"))
      .as[Long].head()
    for (parts <- Seq(1, 3, 32); shardKey <- Seq("shard", "id")) {
      val merged = ids.repartition(parts)
        .groupBy(col(shardKey) % 4)
        .agg(hll_sketch_agg(col("id"), 12).as("sk"))
        .agg(hll_sketch_estimate(
          hll_union_agg(col("sk"), allowDifferentLgConfigK = false)).as("est"))
        .as[Long].head()
      assert(merged === direct,
        s"parts=$parts shardKey=$shardKey: merged partials diverged from direct")
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
    ids.groupBy(col("shard"))
      .agg(hll_sketch_agg(col("id"), 12).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val direct = ids.agg(
      hll_sketch_estimate(hll_sketch_agg(col("id"), 12))).as[Long].head()
    val fromDisk = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), allowDifferentLgConfigK = false))).as[Long].head()
    assert(fromDisk === direct)
  }
}

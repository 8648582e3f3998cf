package graft

import graft.etl.{Load, Metrics}
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observed metrics arrive with the action, no extra scan") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val (obs, handle) = {
      val (d, o) = Metrics.observed(df, "stage",
        "rows" -> count(lit(1)),
        "total" -> sum(col("v").cast("decimal(18,4)")).cast("double"))
      (d, o)
    }
    assert(obs.count() === 3L)
    val m = handle.get
    assert(m("rows") === 3L)
    assert(m("total") === 60.0)
  }

  test("metrics survive a filter stage and report the post-filter flow") {
    val df = (1 to 100).map(i => (i.toLong, i % 7 == 0)).toDF("k", "keep")
    val (observedDf, obs) = Metrics.observed(df.filter(col("keep")), "kept",
      "rows" -> count(lit(1)))
    observedDf.write.mode("overwrite").parquet(tmpDir("metrics") + "/t")
    assert(obs.get("rows") === (1 to 100).count(_ % 7 == 0).toLong)
  }

  test("an upsert write reports its merged-row metrics in one pass") {
    val dir = tmpDir("metricsUpsert") + "/t"
    Load.upsert(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      dir, Seq("id"))
    val inc = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    // DISTINCT aggregates are rejected by CollectMetrics (metrics
    // must merge map-side); the HLL form is the mergeable one
    val (observedInc, obs) = Metrics.observed(inc, "batch",
      "rows_in" -> count(lit(1)), "keys" -> approx_count_distinct(col("id")))
    Load.upsert(spark, observedInc, dir, Seq("id"))
    assert(obs.get("rows_in") === 2L && obs.get("keys") === 2L)
    val table = Load.readTable(spark, dir).orderBy("id")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(table === Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer arithmetic.
  *
  * Ranks are kept in pico-units (1.0 ≡ 10^12) as longs and every
  * step is integer math: contribution = `w · (r div out_deg)`,
  * next = `base + (85 · Σcontrib) div 100` — no floats anywhere, so
  * the result is bit-identical across engines, partitionings, and
  * retries (the property float PageRank famously lacks), and a
  * DuckDB recursive CTE can replay it exactly. Truncation loses at
  * most `out_deg` pico-units per node per step — irrelevant at 10^12
  * scale and perfectly mirrored by the oracle.
  *
  * Dangling nodes keep the damping base only (their mass is not
  * redistributed — the standard simplification); zero-weight self
  * edges keep every node present in each iteration without a second
  * reference to the rank relation, which is exactly the shape a
  * recursive CTE permits.
  *
  * 100 TB design: each iteration is one join of the rank table
  * against the edge table (co-partitioned on `src` when both are
  * bucketed by node) plus one aggregation by `dst` — the classic
  * distributed PageRank step. Iterations chain lineage; callers
  * running many iterations should pass `checkpointEvery` (uses
  * `localCheckpoint`, the [[graft.llm.Cluster]] pattern) to stop
  * plan growth.
  *
  * @param edges     directed edge list
  * @param srcCol    source node column (integral)
  * @param dstCol    destination node column (integral)
  * @param nodes     one-column universe of nodes (must cover every
  *                  endpoint; isolated nodes get the base rank)
  * @param iters     fixed iteration count
  * @return (node LONG, rank_pico LONG) after `iters` steps
  */
object PageRank {
  val One: Long = 1000000000000L   // 1.0 in pico-units
  val Base: Long = 150000000000L   // 0.15 damping base

  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            nodes: DataFrame, iters: Int,
            checkpointEvery: Int = Int.MaxValue): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val nodeCol = nodes.columns.head
    val uni = nodes.select(col(nodeCol).cast("long").as("node")).distinct()
    val real = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = real.groupBy("src").agg(count(lit(1)).as("degs"))
    // zero-weight self edges keep every node flowing through the
    // single join+agg step (no union with the rank table needed)
    val ee = real.join(deg, "src")
      .select(col("src"), col("dst"), lit(1L).as("w"), col("degs"))
      .unionByName(uni.select(col("node").as("src"), col("node").as("dst"),
        lit(0L).as("w"), lit(1L).as("degs")))
    var r = uni.withColumn("r", lit(One))
    for (i <- 1 to iters) {
      r = ee.join(r, col("src") === col("node"))
        .select(col("dst"), (col("w") * expr("r div degs")).as("ctr"))
        .groupBy("dst").agg(sum(col("ctr")).as("inc"))
        .select(col("dst").as("node"),
          expr(s"$Base + (85 * inc) div 100").as("r"))
      if (i % checkpointEvery == 0) r = r.localCheckpoint(false)
    }
    r.select(col("node"), col("r").as("rank_pico"))
  }
}

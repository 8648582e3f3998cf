package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting on an undirected simple graph — the
  * clustering-coefficient / community-density primitive, companion
  * to [[PageRank]] (centrality) and
  * [[graft.llm.Cluster]] (connected components) in the graph tier.
  *
  * Degree-oriented wedge join (Schank–Wagner / Cohen's MapReduce
  * form): orient every edge from its lower-(degree, id) endpoint to
  * the higher one. Each triangle then has EXACTLY one vertex with
  * out-edges to the other two (its minimum in that total order), so
  *
  *   triangles = |{ (u→v, u→w, v→w) : ord(v) < ord(w) }|
  *
  * counted with one self-join on the out-source plus one semi-join
  * back to the oriented edge set — no per-triangle dedup, no
  * all-pairs stage. The orientation is the whole scale story: wedge
  * work is Σ outdeg(u)², and out-degrees under degree-orientation
  * are O(√m) even on power-law graphs where raw degrees are O(n)
  * (the hub's edges all point INTO it, so the hub generates no
  * wedges). All shuffles are hash-partitioned equi-joins on vertex
  * ids; AQE's skew split covers residual imbalance.
  */
object Triangles {

  /** @param edges distinct undirected edges, one row per edge with
    *   `srcCol < dstCol` (callers canonicalize + dedup).
    * @return one row: `(n_vertices, n_edges, n_triangles)`.
    */
  def countTriangles(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    // every intermediate below has 2-3 consumers (the wedge self-join
    // reads `o` twice, the semi-join a third time; `e` feeds degrees,
    // orientation and the edge count) — barrier-cache them so the
    // caller's edge DERIVATION (often the expensive part: a fact
    // self-join) runs once, not once per consumer branch
    val e = graft.llm.BarrierCache.track(
      edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v")))
    val deg = graft.llm.BarrierCache.track(
      e.select(col("u").as("x"))
        .unionAll(e.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d")))
    val withDeg = e
      .join(deg.toDF("u", "du"), Seq("u"))
      .join(deg.toDF("v", "dv"), Seq("v"))
    val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    // oriented edge s->t, keeping t's order key for the wedge order
    val o = graft.llm.BarrierCache.track(withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("s"),
      when(fwd, col("v")).otherwise(col("u")).as("t"),
      when(fwd, col("dv")).otherwise(col("du")).as("dt")))
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.s") === col("e2.s") &&
          struct(col("e1.dt"), col("e1.t")) < struct(col("e2.dt"), col("e2.t")))
      .select(col("e1.t").as("s"), col("e2.t").as("t"))
    val tri = wedges.join(o.select("s", "t"), Seq("s", "t"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val vs = deg.agg(count(lit(1)).as("n_vertices"))
    val es = e.agg(count(lit(1)).as("n_edges"))
    // three 1-row frames; broadcast by construction
    vs.crossJoin(es).crossJoin(tri)
  }
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline telemetry via Spark's `Observation` API — the engine's
  * answer to the reference's per-stage row-count logging: named
  * aggregate metrics attached to a frame are computed MAP-SIDE while
  * the next action streams past (a `CollectMetrics` node in the
  * plan), so "how many rows / how much revenue passed this stage"
  * costs zero extra scans — unlike the `count()`-then-`write()`
  * double-execution anti-pattern, which re-runs the whole upstream
  * plan per metric.
  *
  * Works identically at any scale (metrics merge like any partial
  * aggregate) and on streaming frames (surfaced per micro-batch via
  * `StreamingQueryListener.QueryProgressEvent.observedMetrics`).
  */
object Metrics {

  /** Attach `metrics` (name → aggregate Column) to `df` under
    * `name`. The returned Observation yields the values after the
    * next action on the returned frame: `obs.get("rows")`.
    * Metrics must be map-side-mergeable aggregates — DISTINCT forms
    * are rejected by the analyzer (use `approx_count_distinct`, the
    * mergeable HLL form, for key counts).
    */
  def observed(df: DataFrame, name: String,
               metrics: (String, Column)*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observed needs at least one metric")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}

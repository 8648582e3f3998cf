package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.QDot

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst functions available in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the standard way to ship
  * planner/function extensions with a library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("qdot64"),
      new ExpressionInfo(classOf[QDot].getName, "qdot64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QDot(exprs(0), exprs(1))))
    // declarative HOF dot products silently upgrade to the codegen'd
    // expression (observation-equivalent; see RewriteQuantizedDot)
    e.injectOptimizerRule(_ => graft.functions.RewriteQuantizedDot)
    // snapshot tables as SQL tables: FROM snap.`/path` [VERSION AS OF n
    // | TIMESTAMP AS OF ts] resolves to the manifest-listed,
    // stats-skipping, dv-aware scan (see plans.ResolveSnapshotTable)
    e.injectResolutionRule(s => graft.plans.ResolveSnapshotTable(s))
  }
}

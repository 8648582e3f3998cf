package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session: one JVM-wide SparkSession (suites run in a
  * single forked JVM; getOrCreate reuses it).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the library's shipped extensions, installed the way a user
    // installs them — SnapshotSqlSpec proves plain spark.sql sees
    // snapshot tables through the injected resolution rule
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def sf: String = TestSpark.sf

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Execute `df` and return (result row count, total rows emitted by
    * every join node in the executed plan, via SQLMetrics). The probe
    * the skew/pile-up tests use to assert a join layer stays linear:
    * a quadratic candidate explosion shows up in the join output
    * metric even when the final result is small.
    */
  def countWithJoinOutput(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val qe = df.queryExecution
    val n = qe.toRdd.count() // drives THIS execution, populating its metrics
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(flatten)
    }
    val joinOut = flatten(qe.executedPlan)
      .filter(_.nodeName.toLowerCase.contains("join"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .sum
    (n, joinOut)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.Snapshots

/** Dev utility: capture the PHYSICAL PLAN of every SQL execution a
  * snapshot-tier statement launches (SparkListenerSQLExecutionStart's
  * formatted description), so the engine-INTERNAL plans — the stats
  * index write, the merge rewrite — are checkable as files. The
  * registered queries' final frames never show these (the statements
  * run eagerly inside the query bodies).
  *
  * Usage: runMain graft.PlanDumpSnap <outDir> <prefix> [sfDir]
  * Writes <outDir>/<prefix>_<statement>_<i>.txt per execution.
  */
object PlanDumpSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val prefix = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onOtherEvent(
            e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
              if record => plans.add(s.physicalPlanDescription); ()
          case _ => ()
        }
      })
    def capture(label: String)(f: => Unit): Unit = {
      plans.clear(); record = true
      f
      Thread.sleep(400); record = false
      var i = 0
      plans.forEach { p =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(f"$outDir/${prefix}_${label}_$i%02d.txt"),
          p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
      println(s"[plandumpsnap] $label: $i executions")
    }
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val base = java.nio.file.Files.createTempDirectory("graft_pds").toString
    val root = s"$base/t"
    capture("commit_with_stats")(
      Snapshots.commitWithStats(spark,
        o.filter(col("o_orderkey") <= 20000L)
          .repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"), root, Seq("o_orderkey")))
    capture("append")(
      Snapshots.append(spark, o.filter(
        col("o_orderkey") > 20000L && col("o_orderkey") <= 40000L),
        root, Seq("o_orderkey")): Unit)
    capture("merge_clauses")(
      Snapshots.mergeClauses(spark,
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + lit(1.0)).as("o_totalprice")),
        root, "o_orderkey", Seq("o_orderkey"), "t", "u",
        matched = Seq(Snapshots.MatchedUpdate(None, None)),
        insertCond = Some(None)): Unit)
    spark.stop()
  }
}

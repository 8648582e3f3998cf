package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: capture `.explain("formatted")` for named queries into
  * files (plans/r16 evidence). Usage:
  *   runMain graft.PlanDump <outDir> <sfDir> <query1> [query2 ...]
  * Also dumps the ENGINE-INTERNAL change-feed plans (append-step and
  * replace-step CDF diffs) when the pseudo-name `_cdf` is passed —
  * the r16 claims live in those internal plans, not only in the
  * registered queries' final frames.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2).toSeq
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
    def write(name: String, body: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    names.foreach {
      case "_cdf" =>
        import org.apache.spark.sql.functions.col
        import graft.etl.Snapshots
        val s = spark; import s.implicits._
        val root = java.nio.file.Files
          .createTempDirectory("graft_plandump").toString + "/t"
        Snapshots.commitWithStats(spark,
          Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1),
          root, Seq("id"))
        Snapshots.append(spark,
          Seq((3L, "c")).toDF("id", "s").coalesce(1), root)
        val app = Snapshots.changes(spark, root, 1L, 2L).df
        write("cdf_append_step",
          app.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        Snapshots.commit(spark,
          Seq((1L, "a"), (4L, "d")).toDF("id", "s").coalesce(1), root)
        val rep = Snapshots.changes(spark, root, 2L, 3L).df
        write("cdf_replace_step",
          rep.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        val keyedApp = Snapshots.changesKeyed(spark, root, 1L, 2L, "id").df
        write("cdf_keyed_append_step",
          keyedApp.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      case q =>
        try {
          val df = SparkEntry.queries(q)(spark, sfDir)
          write(q, df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          println(s"[plandump] $q ok")
        } catch { case e: Throwable =>
          println(s"[plandump] $q FAILED: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}

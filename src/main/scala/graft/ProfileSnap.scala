package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.Snapshots

/** Dev utility: per-job attribution INSIDE individual snapshot-tier
  * statements (commit, append, merge, deleteWhere, changesKeyed,
  * CDC-apply mergeClauses) — job wall time + the launching stage's
  * name (which carries the action's callsite), so the per-statement
  * job diet is visible line by line.
  *
  * Usage: runMain graft.ProfileSnap [sfDir]
  */
object ProfileSnap {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("SPARK_GRAFT_FOC_V", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0s = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val name = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          val site = js.stageInfos.lastOption.map(_.details)
            .map(_.linesIterator.filter(_.contains("graft."))
              .take(2).mkString(" <- "))
            .filter(_.nonEmpty).getOrElse("")
          t0s(js.jobId) = (System.nanoTime(), s"$name | $site")
        }
        override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          t0s.remove(je.jobId).foreach { case (t0, site) =>
            println(f"  [job] ${(System.nanoTime() - t0) / 1e6}%6.0f ms  $site")
          }
      })
    def t[A](label: String)(f: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(150) // drain job-end events
      println(f"[t] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${jobs.get() - j0}%4d jobs")
      r
    }
    val s = spark
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    (1 to 2).foreach { pass =>
      println(s"== pass $pass")
      val base = java.nio.file.Files.createTempDirectory("graft_psnap").toString
      val src = s"$base/src"
      t("commitWithStats v1")(Snapshots.commitWithStats(s,
        o.filter(col("o_orderkey") <= 20000L)
          .repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"), src, Seq("o_orderkey")))
      t("append v2")(Snapshots.append(s, o.filter(
        col("o_orderkey") > 20000L && col("o_orderkey") <= 40000L),
        src, Seq("o_orderkey")))
      val baseRows = o.filter(col("o_orderkey") <= 40000L)
      t("merge v3")(Snapshots.merge(s,
        baseRows.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + lit(1.0)).as("o_totalprice"))
          .unionByName(baseRows.filter(col("o_orderkey") % 7 === 0)
            .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
              lit("Z").as("o_orderstatus"),
              (col("o_totalprice") * lit(2.0)).as("o_totalprice"))),
        src, "o_orderkey", Seq("o_orderkey")))
      t("deleteWhere v4")(
        Snapshots.deleteWhere(s, src, col("o_orderkey") % 10 === 3))
      val feed = t("changesKeyed v2->v3 consume") {
        val f = Snapshots.changesKeyed(s, src, 2L, 3L, "o_orderkey").df
          .filter(col("_change_type") =!= "update_preimage")
          .persist()
        f.count()
        f
      }
      val dst = s"$base/dst"
      t("bootstrap dst")(Snapshots.append(s,
        Snapshots.read(s, src, Some(2L)), dst, Seq("o_orderkey"),
        tag = Some(2L)))
      t("cdc mergeClauses apply") {
        val dataCols = feed.columns.toSeq.filterNot(_ == "_change_type")
        Snapshots.mergeClauses(s, feed, dst, "o_orderkey",
          Seq("o_orderkey"), "t", "u",
          matched = Seq(
            Snapshots.MatchedDelete(Some(col("u._change_type") === "delete")),
            Snapshots.MatchedUpdate(Some(col("u._change_type") =!= "delete"),
              Some(dataCols.filterNot(_ == "o_orderkey")
                .map(c => c -> col(s"u.$c"))))),
          insertCond = None,
          inserts = Seq(Snapshots.InsertClause(
            Some(col("u._change_type") =!= "delete"),
            Some(dataCols.map(c => c -> col(s"u.$c"))))),
          tag = Some(3L))
      }
      feed.unpersist()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.Snapshots
import graft.queries.QueryDefs.sameMultiset

/** Dev utility: statement-level timing of q212's body (the heaviest
  * bench entry) — which engine statement owns the time.
  */
object ProfileQ212 {
  val jobs = new java.util.concurrent.atomic.AtomicLong
  def t[A](label: String)(f: => A): A = {
    val j0 = jobs.get()
    val t0 = System.nanoTime()
    val r = f
    println(f"[t] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${jobs.get() - j0}%4d jobs")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val verbose = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t0s = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (verbose.get()) {
            val site = js.stageInfos.headOption.map(_.details)
              .flatMap(_.linesIterator.filter(_.contains("graft."))
                .take(2).mkString(" <- ") match {
                  case "" => None; case x => Some(x) })
              .orElse(js.stageInfos.headOption.map(_.name))
              .getOrElse("?")
            t0s(js.jobId) = (System.nanoTime(), site)
          }
        }
        override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          t0s.remove(je.jobId).foreach { case (t0, site) =>
            println(f"  [job] ${(System.nanoTime() - t0) / 1e6}%6.0f ms  $site")
          }
      })
    val s = spark
    (1 to 2).foreach { i =>
      println(s"== pass $i")
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files.createTempDirectory("graft_q212p").toString
      val src = s"$base/src"; val dst = s"$base/dst"
      t("commitWithStats src v1")(Snapshots.commitWithStats(s,
        o.filter(col("o_orderkey") <= 20000L)
          .repartitionByRange(8, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"), src, Seq("o_orderkey")))
      t("append src v2")(Snapshots.append(s, o.filter(
        col("o_orderkey") > 20000L && col("o_orderkey") <= 40000L),
        src, Seq("o_orderkey")))
      t("cdcApply run1 (bootstrap+v2)")(
        graft.streaming.Ingest.snapshotCdcApplyAvailableNow(s, src,
          s"$base/chk", dst, "o_orderkey", Seq("o_orderkey"),
          maxFilesPerTrigger = Some(1)))
      val baseRows = o.filter(col("o_orderkey") <= 40000L)
      t("merge src v3")(Snapshots.merge(s,
        baseRows.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + lit(1.0)).as("o_totalprice"))
          .unionByName(baseRows.filter(col("o_orderkey") % 7 === 0)
            .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
              lit("Z").as("o_orderstatus"),
              (col("o_totalprice") * lit(2.0)).as("o_totalprice"))),
        src, "o_orderkey", Seq("o_orderkey")))
      t("deleteWhere src v4")(
        Snapshots.deleteWhere(s, src, col("o_orderkey") % 10 === 3))
      if (i == 2) verbose.set(true)
      t("cdcApply resume (v3+v4)")(
        graft.streaming.Ingest.snapshotCdcApplyAvailableNow(s, src,
          s"$base/chk", dst, "o_orderkey", Seq("o_orderkey")))
      verbose.set(false)
      t("cdcApply fresh-chk replay")(
        graft.streaming.Ingest.snapshotCdcApplyAvailableNow(s, src,
          s"$base/chk2", dst, "o_orderkey", Seq("o_orderkey")))
      val srcF = Snapshots.read(s, src); val dstF = Snapshots.read(s, dst)
      val equiv = t("sameMultiset pin")(sameMultiset(srcF, dstF))
      t("final agg")(dstF.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          graft.queries.QueryDefs.moneySum(col("o_totalprice")).as("price_sum"))
        .withColumn("derived_equals_source", lit(equiv))
        .orderBy("o_orderstatus").count())
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Dev utility: run one named query and attribute Spark-job wall time
  * to the engine callsite that launched each job (first `graft.` frame
  * of the job's callsite, falling back to the Spark callsite string).
  * Also reports the gap between query wall time and the sum of job
  * times — driver-side work (planning, metadata I/O) lives there.
  *
  * Usage: runMain graft.ProfileJobs <queryName> [sfDir] [iters]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobStart = TrieMap.empty[Int, (Long, String)]
    val agg = TrieMap.empty[String, (Long, Long)] // site -> (totalMs, nJobs)
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.long")))
          .flatMap(_.linesIterator.find(_.contains("graft.")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("unknown")
          .trim.replaceAll("^at ", "")
        jobStart(js.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (record) {
        jobStart.remove(je.jobId).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1000000L
          val (tot, n) = agg.getOrElse(site, (0L, 0L))
          agg(site) = (tot + ms, n + 1)
        }
      }
    })

    // warm once (JIT + shared caches), then profile
    try SparkEntry.queries(name)(spark, sfDir).count()
    catch { case e: Throwable => println(s"warm failed: ${e.getMessage}") }
    (1 to iters).foreach { i =>
      agg.clear(); jobStart.clear()
      record = true
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      // let the last jobEnd event drain
      Thread.sleep(300)
      record = false
      val rows = agg.toSeq.sortBy(-_._2._1)
      val jobMs = rows.map(_._2._1).sum
      val jobs = rows.map(_._2._2).sum
      println(f"== $name run$i wall=${wallMs}ms jobs=$jobs jobTime=${jobMs}ms driverGap=${wallMs - jobMs}ms")
      rows.take(30).foreach { case (site, (ms, n)) =>
        println(f"   $ms%7d ms  $n%4d jobs  $site")
      }
    }
    spark.stop()
  }
}

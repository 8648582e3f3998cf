package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: replay the bench's sorted query order up to a target
  * query, then time the target several times — reproduces order-
  * dependent pollution the standalone profile can't see.
  * Usage: runMain graft.ProfileBenchTail <target> [sfDir] [upTo]
  */
object ProfileBenchTail {
  def main(args: Array[String]): Unit = {
    val target = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("warm")) {
      val t0 = System.nanoTime()
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
      }
      graft.queries.PosQueries.clearCache()
      graft.llm.BarrierCache.sweep(spark)
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(1000); System.gc()
      println(f"[warm] all queries at sf0.001 + reset ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != target)
    val keep = if (args.length > 2) names.filter(_ <= args(2)) else names
    keep.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[pre] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(target)(spark, sfDir).count()
      println(f"[target] $target run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}

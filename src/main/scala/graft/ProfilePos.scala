package graft

import graft.etl.{Pos, Transform}
import org.apache.spark.sql.SparkSession

/** Dev utility: stage-by-stage timing of the POS pipeline. */
object ProfilePos {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warm
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    t("rawReport") { Pos.rawReport(spark, sfDir).count() }
    t("rawReport(again)") { Pos.rawReport(spark, sfDir).count() }
    t("transform") { Transform.transform(Pos.rawReport(spark, sfDir), Transform.dimDF(spark)).count() }
    // stage breakdown of the transform's cost
    locally {
      import org.apache.spark.sql.functions._
      import graft.etl.{ExplodeItems, Extract, Sanitize}
      val raw = Pos.rawReport(spark, sfDir)
      val exploded = ExplodeItems.explodeItems(Sanitize.stripHeaders(raw), "Products", "item")
      val it = col("item")
      t("explode only") { exploded.count() }
      t("+simple extracts") {
        exploded
          .withColumn("size", Extract.size(it))
          .withColumn("variation", Extract.variation(it))
          .withColumn("flavor", Extract.flavor(it))
          .withColumn("sugar_level", Extract.sugarLevel(it))
          .withColumn("spice_level", Extract.spiceLevel(it))
          .withColumn("quantity", Extract.quantity(it))
          .select(max(length(col("size"))), max(col("quantity"))).count()
      }
      t("+cleanItem only") {
        exploded.withColumn("clean_item", Extract.cleanItem(it))
          .select(max(length(col("clean_item")))).count()
      }
      t("pastryFlavor only") {
        exploded.withColumn("f", Extract.pastryFlavor(it))
          .select(max(length(col("f")))).count()
      }
      t("cleanup only") {
        exploded.withColumn("c", Extract.cleanupItem(it))
          .select(max(length(col("c")))).count()
      }
    }
    t("transform+agg") {
      Transform.transform(Pos.rawReport(spark, sfDir), Transform.dimDF(spark))
        .groupBy("category").count().count()
    }
    spark.stop()
  }
}

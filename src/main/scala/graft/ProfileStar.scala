package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the q42 star-schema route
  * (normalizeStar + dim re-attach + countDistinct aggregate) with
  * the POS fact cache hot — isolates which leg pays what.
  */
object ProfileStar {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("q37 (cache build)") {
      graft.queries.PosQueries.queries("q37_pos_pipeline")(spark, sfDir).count()
    }
    val star = {
      val t0 = System.nanoTime()
      val s = graft.etl.Load.normalizeStar(
        graft.queries.PosQueries.routes(spark, sfDir).clean)
      println(f"[profile] normalizeStar (lazy)        ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      s
    }
    t("dimItem.count") { star.dimItem.count() }
    t("dimPayment.count") { star.dimPayment.count() }
    t("dimOrderType.count") { star.dimOrderType.count() }
    t("fact.count") { star.fact.count() }
    t("fact.count again") { star.fact.count() }
    val joined = star.fact
      .join(broadcast(star.dimItem), Seq("item_id"))
      .join(broadcast(star.dimPayment), Seq("payment_type_id"))
      .join(broadcast(star.dimOrderType), Seq("order_type_id"))
    t("joined.count") { joined.count() }
    t("agg (full q42)") {
      graft.queries.PosQueries.queries("q42_star_schema")(spark, sfDir).count()
    }
    t("agg again") {
      graft.queries.PosQueries.queries("q42_star_schema")(spark, sfDir).count()
    }
    spark.stop()
  }
}

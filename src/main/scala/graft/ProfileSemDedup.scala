package graft

import graft.llm.SemDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for SemDeDup (diagnostic): flat n·k assignment
  * vs the two-level coarse-quantizer route, on the q116 planted
  * corpus at the given SF dir. The `routeAbove` knob selects the
  * path — Int.MaxValue replays the round-6 flat scan for the
  * before/after record in SCALE.md.
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // optional corpus multiplier: disjoint id-shifted replicas push
    // kEff up m× to expose the n·k vs n·√k assignment asymptote
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val emb0 = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val emb = (0 until mult).map { m =>
      emb0.select((col("vec_id") + m * 40000000L).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val copies = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 20000000).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(copies)
    corpus.count() // warm the scan
    for (pass <- 1 to 2) {
      graft.llm.BarrierCache.sweepOnNewScope(spark, dir + s"#flat$pass")
      val flat = SemDedup.semanticDups(corpus, "vec_id", "embedding",
        threshold = 0.95, k = 8, iters = 3, routeAbove = Int.MaxValue)
      t(s"flat n*k (pass $pass)")(flat.count())
      graft.llm.BarrierCache.sweepOnNewScope(spark, dir + s"#routed$pass")
      val routed = SemDedup.semanticDups(corpus, "vec_id", "embedding",
        threshold = 0.95, k = 8, iters = 3)
      t(s"routed 2-level (pass $pass)")(routed.count())
    }
    spark.stop()
  }
}

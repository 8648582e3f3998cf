package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the MinHash near-dup query (diagnostic). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, dir)
    val p = Dedup.MinHashParams()
    // warm the input scan
    docs.count()
    val sh = Dedup.hashedShingles(docs, "doc_id", "text", 3)
    t("shingle index")(sh.count())
    t("shingle index(2)")(sh.count())
    val sigs = Dedup.minhashSignatures(sh, "doc_id", p)
    t("signatures")(sigs.count())
    val cands = Dedup.minhashCandidates(sigs, "doc_id", p)
    t("sig+candidates")(cands.count())
    val full = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 0.8)
    t("full q32")(full.count())
    t("full q32 (2)")(full.count())
    spark.stop()
  }
}

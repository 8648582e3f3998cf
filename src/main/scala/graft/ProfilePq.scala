package graft

import graft.llm.{Pq, Similarity}
import graft.llm.Pq.PqParams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/latency sweep for the PQ-ADC ANN path (diagnostic, feeds
  * the q138 floor and PqSpec pins): brute-force ground truth vs
  * full-ADC PQ and IVFADC at the given SF dir, across shortlist and
  * ksub settings.
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir).cache()
    val probes = emb.filter(col("vec_id") % 100 === 0)
    println(s"[pq] corpus=${emb.count()} probes=${probes.count()}")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val brute = t("brute") {
      Similarity.bruteTopK(emb, probes, "vec_id", "embedding", 10)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recall(name: String, p: PqParams): Unit = {
      val got = t(name) {
        Pq.pqTopK(emb, probes, "vec_id", "embedding", 10, p)
          .select("query_id", "cand_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      println(f"[pq] $name%-40s recall=${brute.count(got.contains).toDouble / brute.size}%.3f")
    }
    recall("adc m8 k16", PqParams())
    recall("adc m8 k32", PqParams(ksub = 32))
    recall("adc m8 k64", PqParams(ksub = 64))
    recall("ivfadc m8 k16 c64p8", PqParams(coarse = Some(Similarity.IvfParams())))
    spark.stop()
  }
}

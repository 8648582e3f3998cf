package graft

import graft.llm.HashedClassifier
import org.apache.spark.sql.functions._

class HashedClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bruteScore(text: String, w: Array[Long]): Long =
    text.split(" ", -1).map { tok =>
      val b = (java.lang.Long.parseLong(md5hex(tok).take(6), 16) % w.length).toInt
      w(b)
    }.sum

  test("score == per-token md5-bucket brute force (tf-weighted)") {
    val w = HashedClassifier.seededWeights(1024)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the the the the",          // tf weighting: 4x one bucket
      "unicode snowman ☃ ok",
      "single")
    val got = texts.toDF("text")
      .select(col("text"), HashedClassifier.score(col("text"), w).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t => assert(got(t) === bruteScore(t, w), s"text: $t") }
  }

  test("trained-weights seam: a custom weight array is honored") {
    // all-zero weights except the bucket "hello" hashes into
    val n = 64
    val hb = (java.lang.Long.parseLong(md5hex("hello").take(6), 16) % n).toInt
    val w = Array.fill(n)(0L).updated(hb, 7L)
    val got = Seq("hello world hello").toDF("text")
      .select(HashedClassifier.score(col("text"), w)).as[Long].head()
    // "world" may or may not share the bucket — compute honestly
    assert(got === bruteScore("hello world hello", w))
    assert(got >= 14L)
  }

  test("plan: scoring is a pure scan projection, no Exchange") {
    val w = HashedClassifier.seededWeights(1024)
    val plan = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), HashedClassifier.score(col("text"), w).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier scan must not shuffle:\n$plan")
  }
}

package graft

import graft.functions.QVec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Native QDot expression vs the HOF reference formulation —
  * bit-identical on real embeddings, plus SQL registration and
  * null/length-mismatch behavior.
  */
class QVecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("QDot matches the HOF quantized dot bit-for-bit on all embeddings") {
    val pair = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(broadcast(emb.filter(col("vec_id") === 7).select(col("embedding").as("b"))))
    val diff = pair.select(
        QVec.qdot64(col("a"), col("b")).as("native"),
        Similarity.qdotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff === 0)
  }

  test("negative exact midpoints round HALF_UP, agreeing with the HOF") {
    // -0.0234375f * 1e6 = -23437.5 exactly (24-bit mantissa × 10⁶
    // fits 38 bits): away-from-zero gives -23438; Math.round's
    // half-toward-+∞ would give -23437 and diverge from both the
    // HOF and the DuckDB oracle's round()
    val df = Seq((Seq(-0.0234375f), Seq(2.0f))).toDF("a", "b")
    val (native, hof) = df.select(
        QVec.qdot64(col("a"), col("b")).as("n"),
        Similarity.qdotHof(col("a"), col("b")).as("h"))
      .as[(Long, Long)].head()
    assert(native === -23438L * 2000000L)
    assert(native === hof)
  }

  test("QDot is callable from SQL after registration") {
    QVec.register(spark)
    emb.createOrReplaceTempView("qvec_emb")
    val n = spark.sql(
      "SELECT qdot64(embedding, embedding) AS n2 FROM qvec_emb WHERE vec_id = 3")
      .as[Long].head()
    val hof = emb.filter(col("vec_id") === 3)
      .select(Similarity.qdotHof(col("embedding"), col("embedding"))).as[Long].head()
    assert(n === hof)
  }

  test("null array yields null; mismatched lengths use the common prefix") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f, 5.0f))),
      (None, Some(Seq(1.0f)))
    ).toDF("a", "b")
    val got = df.select(QVec.qdot64(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    // (1e6*3e6 + 2e6*4e6) = 11e12
    assert(got(0) === 11e12.toLong)
    assert(got(1) === null)
  }
}

package graft

import graft.functions.{QDotStrict, RewriteQuantizedDot}
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The HOF→native optimizer rule: it must FIRE on the declarative
  * quantized-dot shape, must NOT fire on lookalikes, and the rewrite
  * must be observation-equivalent on every input class (well-formed,
  * ragged, null-holed, empty, null) — the soundness bar for an
  * always-on optimizer rule.
  */
class RewriteQuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteQuantizedDot
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteQuantizedDot)
  }

  private val edgeRows: Seq[(Option[Seq[Option[Float]]], Option[Seq[Option[Float]]])] = Seq(
    (Some(Seq(Some(1.5f), Some(-2.25f))), Some(Seq(Some(3.0f), Some(0.5f)))), // well-formed
    (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f)))),               // ragged
    (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))),         // null element
    (Some(Seq.empty), Some(Seq.empty)),                                        // empty
    (None, Some(Seq(Some(1.0f)))),                                             // null array
    // NEGATIVE EXACT MIDPOINT: -0.0234375f·10⁶ = -23437.5 exactly;
    // HALF_UP (away from zero) must give -23438 on both paths
    (Some(Seq(Some(-0.0234375f))), Some(Seq(Some(1.0f)))))

  test("rule fires: the optimized plan carries qdot64_strict, not a HOF") {
    withRule {
      val df = Tables.embeddings(spark, sf)
        .select(Similarity.qdotHof(col("embedding"), col("embedding")).as("d"))
      val opt = df.queryExecution.optimizedPlan
      val fired = opt.expressions.exists(_.exists(_.isInstanceOf[QDotStrict]))
      assert(fired, s"expected QDotStrict in\n$opt")
      assert(!opt.toString.contains("aggregate("), s"HOF survived in\n$opt")
    }
  }

  test("rewrite is observation-equivalent on every input class") {
    val df = edgeRows.toDF("a", "b")
    val hof = df.select(Similarity.qdotHof(col("a"), col("b"))).collect().map(_.get(0))
    val rewritten = withRule {
      df.select(Similarity.qdotHof(col("a"), col("b"))).collect().map(_.get(0))
    }
    assert(rewritten.toSeq === hof.toSeq)
    // construction check: the edge classes behave as documented
    assert(hof(1) == null && hof(2) == null && hof(4) == null, hof.toSeq)
    assert(hof(3) === 0L)
    assert(hof(5) === -23438L * 1000000L, "negative midpoint must round away from zero")
  }

  test("overflow fails loudly on both the HOF and the rewritten path") {
    // qx = qy = 4e9; qx*qy = 1.6e19 > Long.MaxValue — ANSI Multiply
    // throws on the HOF path, QMath.mulAdd throws on the native path
    val df = Seq((Seq(4000.0f), Seq(4000.0f))).toDF("a", "b")
    val plain = intercept[Throwable] {
      df.select(Similarity.qdotHof(col("a"), col("b"))).collect()
    }
    val fast = intercept[Throwable] {
      withRule { df.select(Similarity.qdotHof(col("a"), col("b"))).collect() }
    }
    def arithmetic(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[ArithmeticException])
    assert(arithmetic(plain), s"HOF path: $plain")
    assert(arithmetic(fast), s"rewritten path: $fast")
  }

  test("ragged + NaN throws on both paths (zip_with materializes every product)") {
    // x longer than y, NaN in x's unpaired tail: the HOF still
    // evaluates qi(x_i) there (Multiply's LEFT), so ANSI throws —
    // NULL-for-ragged must not swallow the error on the native path
    val df = Seq((Seq(Some(1.0f), Some(Float.NaN)), Seq(Some(1.0f))))
      .toDF("a", "b")
    def arithmetic(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[ArithmeticException])
    val plain = intercept[Throwable] {
      df.select(Similarity.qdotHof(col("a"), col("b"))).collect()
    }
    val fast = intercept[Throwable] {
      withRule { df.select(Similarity.qdotHof(col("a"), col("b"))).collect() }
    }
    assert(arithmetic(plain), s"HOF path: $plain")
    assert(arithmetic(fast), s"rewritten path: $fast")
  }

  test("a null (or padded) left element shields a NaN right: NULL on both paths") {
    // Multiply short-circuits on a null LEFT, so qi(NaN) on the right
    // is never evaluated — both paths must return NULL, not throw
    val rows: Seq[(Option[Seq[Option[Float]]], Option[Seq[Option[Float]]])] = Seq(
      (Some(Seq(None)), Some(Seq(Some(Float.NaN)))),            // null element shields
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(Float.NaN))))) // padding shields
    val df = rows.toDF("a", "b")
    val hof = df.select(Similarity.qdotHof(col("a"), col("b"))).collect().map(_.get(0))
    val fast = withRule {
      df.select(Similarity.qdotHof(col("a"), col("b"))).collect().map(_.get(0))
    }
    assert(hof.toSeq === Seq(null, null))
    assert(fast.toSeq === hof.toSeq)
  }

  test("rule does not fire outside ANSI mode (LEGACY arithmetic wraps, QDotStrict throws)") {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      withRule {
        val df = Tables.embeddings(spark, sf)
          .select(Similarity.qdotHof(col("embedding"), col("embedding")).as("d"))
        val opt = df.queryExecution.optimizedPlan
        assert(!opt.expressions.exists(_.exists(_.isInstanceOf[QDotStrict])),
          s"rule must not fire with ansi off\n$opt")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("rule does not fire on a lookalike with a different scale") {
    withRule {
      val other = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b,
            (x, y) => (round(x.cast("double") * lit(1000.0), 0).cast("long")) *
              (round(y.cast("double") * lit(1000.0), 0).cast("long"))),
          lit(0L), (s, v) => s + v)
      val df = Tables.embeddings(spark, sf).select(other(col("embedding"), col("embedding")).as("d"))
      val opt = df.queryExecution.optimizedPlan
      assert(!opt.expressions.exists(_.exists(_.isInstanceOf[QDotStrict])),
        s"rule must not match a 1e3-scale aggregation\n$opt")
    }
  }

  test("rewritten result equals the corpus-wide HOF values bit-for-bit") {
    val emb = Tables.embeddings(spark, sf)
    val pair = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(broadcast(emb.filter(col("vec_id") === 11).select(col("embedding").as("b"))))
    val plain = pair.select(col("vec_id"), Similarity.qdotHof(col("a"), col("b")).as("d"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val fast = withRule {
      pair.select(col("vec_id"), Similarity.qdotHof(col("a"), col("b")).as("d"))
        .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    }
    assert(fast === plain)
  }
}

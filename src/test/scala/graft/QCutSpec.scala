package graft

import graft.operators.QCut
import org.apache.spark.sql.functions._

class QCutSpec extends SparkSpec {
  import spark.implicits._

  test("quartiles of 1..8 split evenly; thresholds are interpolated") {
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val got = QCut.qcut(df, col("v"), 4, "b")
      .orderBy("v").select("b").as[Long].collect().toSeq
    // thresholds 2.75 / 4.5 / 6.25 -> two values per bucket
    assert(got === Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
  }

  test("ties land in one bucket (value-deterministic, unlike ntile)") {
    val df = Seq(1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 9.0).toDF("v")
    val buckets = QCut.qcut(df, col("v"), 4, "b")
      .filter(col("v") === 2.0).select("b").as[Long].collect().toSet
    assert(buckets.size === 1, s"tied values split across buckets: $buckets")
  }

  test("bucket assignment is partitioning-invariant and null-safe") {
    val vals = Seq.tabulate(500)(i => if (i % 17 == 0) None else Some((i * 37 % 101).toDouble))
    def run(parts: Int) =
      QCut.qcut(vals.toDF("v").repartition(parts), col("v"), 10, "b")
        .orderBy(col("v").asc_nulls_first).select("b").collect()
        .map(r => Option(r.get(0)).map(_.asInstanceOf[Long])).toSeq
    val a = run(1)
    assert(a === run(11))
    assert(vals.count(_.isEmpty) === a.count(_.isEmpty), "null v must give null bucket")
  }

  test("qcutMany matches chained single-column qcuts in one scan") {
    val df = Seq.tabulate(100)(i => ((i * 7 % 53).toDouble, (i * 11 % 31).toDouble))
      .toDF("x", "y")
    val many = QCut.qcutMany(df, Seq((col("x"), "bx"), (col("y"), "by")), 4)
      .orderBy("x", "y").select("bx", "by").collect().map(_.toSeq).toSeq
    val chained = QCut.qcut(QCut.qcut(df, col("x"), 4, "bx"), col("y"), 4, "by")
      .orderBy("x", "y").select("bx", "by").collect().map(_.toSeq).toSeq
    assert(many === chained)
  }

  test("plan: no single-partition window — classification is map-side") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val plan = QCut.qcut(df, col("v"), 4, "b")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "qcut must not plan a window")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "thresholds should broadcast")
  }
}

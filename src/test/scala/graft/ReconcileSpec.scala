package graft

import graft.etl.Reconcile
import org.apache.spark.sql.functions._

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged") {
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val cur = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "x", 40.0),
      (5L, "e", 50.0)).toDF("k", "s", "v")
    val got = Reconcile.diff(prev, cur, Seq("k"), Seq("s", "v"))
      .select("k", "diff_status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "changed", 5L -> "added"))
  }

  test("null compare values are null-safe: null==null is unchanged") {
    val prev = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "s")
    val cur = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val got = Reconcile.diff(prev, cur, Seq("k"), Seq("s"))
      .select("k", "diff_status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("prev/cur value columns surface on both sides") {
    val prev = Seq((2L, 20.0)).toDF("k", "v")
    val cur = Seq((2L, 25.0), (5L, 50.0)).toDF("k", "v")
    val rows = Reconcile.diff(prev, cur, Seq("k"), Seq("v"))
      .orderBy("k")
      .select("k", "v_prev", "v_cur").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(rows === Seq((2L, Some(20.0), Some(25.0)), (5L, None, Some(50.0))))
  }

  test("plan: one full-outer sort-merge join, no nested loop") {
    val prev = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    val cur = (50 to 150).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val plan = Reconcile.diff(prev, cur, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), "expected a full-outer join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "no nested loop")
  }
}

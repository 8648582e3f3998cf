package graft

import graft.operators.RangeJoin

/** Bucketed interval-overlap join: equivalence with the naive theta
  * join, exactly-once pair emission across bucket spans, and plan
  * shape (no nested-loop join).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the naive theta join on random intervals") {
    val rnd = new scala.util.Random(7)
    def intervals(n: Int, tag: String) = (1 to n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"$tag$i", s, s + rnd.nextInt(50))
    }
    val l = intervals(200, "L").toDF("lid", "ls", "le")
    val r = intervals(200, "R").toDF("rid", "rs", "re")
    val naive = l.join(r,
        l("ls") <= r("re") && r("rs") <= l("le"))
      .select("lid", "rid").collect().map(x => (x.getString(0), x.getString(1)))
      .toSet
    for (width <- Seq(7L, 64L, 1000L)) {
      val fast = RangeJoin.overlapJoin(l, r, "ls", "le", "rs", "re", width)
        .select("lid", "rid").collect().map(x => (x.getString(0), x.getString(1)))
      assert(fast.length === fast.toSet.size,
        s"width=$width: a pair was emitted more than once")
      assert(fast.toSet === naive, s"width=$width: pair set mismatch")
    }
  }

  test("zero-length and touching intervals are inclusive") {
    val l = Seq(("a", 10L, 10L)).toDF("lid", "ls", "le")
    val r = Seq(("x", 10L, 10L), ("y", 5L, 10L), ("z", 11L, 12L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 4L)
      .select("rid").collect().map(_.getString(0)).toSet
    assert(got === Set("x", "y")) // [10,10] meets [10,10] and [5,10]; not [11,12]
  }

  test("plan: shuffled equi-join on the bucket, no nested loop") {
    val l = Seq(("a", 10L, 20L)).toDF("lid", "ls", "le")
    val r = Seq(("x", 15L, 25L)).toDF("rid", "rs", "re")
    val plan = RangeJoin.overlapJoin(l, r, "ls", "le", "rs", "re", 8L)
      .queryExecution.executedPlan
    val nested = plan.collect {
      case j if j.nodeName.contains("BroadcastNestedLoop") ||
        j.nodeName.contains("CartesianProduct") => j
    }
    assert(nested.isEmpty, "range join must never degrade to a nested loop")
  }
}

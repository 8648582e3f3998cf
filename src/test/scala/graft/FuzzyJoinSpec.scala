package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(left: Seq[(Long, String)], right: Seq[(Long, String)],
                    maxDist: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for {
      (li, ls) <- left.toSet if ls != null && ls.nonEmpty
      (ri, rs) <- right if rs != null && rs.nonEmpty
      dist = lev(ls, rs) if dist <= maxDist
    } yield (li, ri, dist)
  }

  test("blocked join == brute force across short/boundary/long strings") {
    // maxDist=2 -> sentinel band <= 8, boundary band 9-10, grams-only > 10
    val left = Seq(1L -> "ab", 2L -> "abcdefgh", 3L -> "abcdefghi",
      4L -> "chocolate croissant", 5L -> "x")
    val right = Seq(10L -> "ba", 11L -> "abcdefgx", 12L -> "abcdefghij",
      13L -> "chocolate croissont", 14L -> "unrelated string here",
      15L -> "abcdefghixx")
    val got = FuzzyJoin.join(left.toDF("lid", "ls"), "lid", "ls",
        right.toDF("rid", "rs"), "rid", "rs", maxDist = 2)
      .select("lid", "rid", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute(left, right, 2))
  }

  test("a short probe still meets a boundary-length build (sentinel band)") {
    // mixed lengths across the segment/sentinel boundary: len 7 has
    // full d+1=3 nonempty segments, len 9 partner differs by 2
    val left = Seq(1L -> "abcdefg").toDF("lid", "ls")
    val right = Seq(2L -> "abcdefgxy").toDF("rid", "rs")
    val got = FuzzyJoin.join(left, "lid", "ls", right, "rid", "rs", 2)
      .select("dist").as[Int].collect().toSeq
    assert(got === Seq(2))
  }

  test("length <= 2d strings meet via the sentinel block") {
    // d=2: "ab" (len 2 <= 2d) can't fill 3 nonempty segments; its
    // partners within d have length <= 4, which also carry the
    // sentinel — every such pair must meet there
    val left = Seq(1L -> "ab", 2L -> "a").toDF("lid", "ls")
    val right = Seq(10L -> "abcd", 11L -> "ba", 12L -> "b").toDF("rid", "rs")
    val got = FuzzyJoin.join(left, "lid", "ls", right, "rid", "rs", 2)
      .select("lid", "rid", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute(Seq(1L -> "ab", 2L -> "a"),
      Seq(10L -> "abcd", 11L -> "ba", 12L -> "b"), 2))
  }

  test("maxDist=0 degenerates to an exact equi-join") {
    val left = Seq(1L -> "same", 2L -> "other").toDF("lid", "ls")
    val right = Seq(9L -> "same", 8L -> "Same").toDF("rid", "rs")
    val got = FuzzyJoin.join(left, "lid", "ls", right, "rid", "rs", 0)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 9L)))
  }

  test("joinStrings dedups to distinct string pairs; join re-expands ids") {
    // 3 left ids and 2 right ids share one matched string pair:
    // string level = 1 row, id level = 3 x 2 = 6 rows
    val left = Seq(1L -> "alpha", 2L -> "alpha", 3L -> "alpha").toDF("lid", "ls")
    val right = Seq(7L -> "alphb", 8L -> "alphb").toDF("rid", "rs")
    val strs = FuzzyJoin.joinStrings(left, "ls", right, "rs", 1)
    assert(strs.count() === 1L)
    assert(strs.columns.toSeq === Seq("ls", "rs", "dist"))
    assert(FuzzyJoin.join(left, "lid", "ls", right, "rid", "rs", 1).count() === 6L)
  }

  test("null and empty strings never match") {
    val left = Seq((1L, null: String), (2L, ""), (3L, "ok")).toDF("lid", "ls")
    val right = Seq((9L, null: String), (8L, ""), (7L, "ok")).toDF("rid", "rs")
    val got = FuzzyJoin.join(left, "lid", "ls", right, "rid", "rs", 2)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((3L, 7L)))
  }

  test("plan: equi-join on segment signatures, no cartesian product") {
    val l = (1 to 50).map(i => (i.toLong, s"some product name $i")).toDF("lid", "ls")
    val r = (1 to 50).map(i => (i.toLong, s"some product name ${i + 1}")).toDF("rid", "rs")
    val plan = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "fuzzy join must block, not cross")
  }
}

package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join: backward-inclusive match, tie rules, null payloads,
  * struct-consistent fill, single-shuffle plan, and equivalence with
  * the quadratic reference implementation.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probe = Seq(
    ("u1", 10L, 100L), ("u1", 20L, 101L), ("u1", 5L, 102L),
    ("u2", 50L, 103L)
  ).toDF("k", "t", "pid")

  private lazy val build = Seq(
    ("u1", 10L, 1L, 1.0), ("u1", 15L, 2L, 2.0), ("u1", 15L, 3L, 3.0),
    ("u3", 1L, 4L, 4.0)
  ).toDF("k", "t", "bid", "v")

  private def joined = AsOfJoin.asOf(
    probe, build.withColumnRenamed("t", "bt").withColumn("t", col("bt")),
    Seq("k"), "t", Seq("bid"), Seq("bt", "v"))

  test("backward-inclusive, latest tie wins, no-match is null") {
    val rows = joined.select("k", "t", "pid", "bt", "v")
      .orderBy("pid").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq
    assert(rows === Seq(
      // t=10: build at exactly 10 qualifies (inclusive)
      ("u1", 10L, 100L, Some(10L), Some(1.0)),
      // t=20: two builds at 15 — the later bid (3) wins
      ("u1", 20L, 101L, Some(15L), Some(3.0)),
      // t=5: nothing at or before → null payloads
      ("u1", 5L, 102L, None, None),
      // u2 has no build rows at all
      ("u2", 50L, 103L, None, None)))
  }

  test("matches the quadratic reference join on random data") {
    val rnd = new scala.util.Random(42)
    val p = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val b = (1 to 200).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i.toLong, rnd.nextDouble()))
      .toDF("k", "t", "bid", "v")
    val fast = AsOfJoin.asOf(
        p, b.withColumnRenamed("t", "bt").withColumn("t", col("bt")),
        Seq("k"), "t", Seq("bid"), Seq("bt", "v"))
      .select("pid", "bt", "v").orderBy("pid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    // reference: per probe row, the max-(t, bid) build row at or before
    val bRows = b.as[(String, Long, Long, Double)].collect().toSeq
    val slow = p.as[(String, Long, Long)].collect().toSeq.map { case (k, t, pid) =>
      val cands = bRows.filter { case (bk, bt, _, _) => bk == k && bt <= t }
      if (cands.isEmpty) (pid, None, None)
      else {
        val best = cands.maxBy { case (_, bt, bid, _) => (bt, bid) }
        (pid, Some(best._2), Some(best._4))
      }
    }.sortBy(_._1)
    assert(fast === slow)
  }

  test("plan: one shuffle, no join node") {
    val p = joined.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n === 1, s"as-of must cost one shuffle, saw $n in:\n${p.take(2000)}")
    assert(!p.toLowerCase.contains("join"), "as-of must not plan a physical join")
  }
}

package graft

import graft.llm.BudgetSelect
import org.apache.spark.sql.functions._

/** Band-refined greedy budget selection vs the brute-force global
  * order, including negative scores (floor-banding), band-boundary
  * budgets, everything-fits, and zero budget.
  */
class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long, Long)], budget: Long): Map[Long, Long] = {
    var cum = 0L
    rows.sortBy { case (id, score, _) => (-score, id) }.map { case (id, _, tok) =>
      cum += tok
      id -> (if (cum <= budget) 1L else 0L)
    }.toMap
  }

  private def run(rows: Seq[(Long, Long, Long)], budget: Long,
                  bandWidth: Long): Map[Long, Long] =
    BudgetSelect.withKeep(
        rows.toDF("id", "score", "tok").withColumn("budget", lit(budget)),
        "id", "score", "tok", "budget", bandWidth)
      .select("id", "keep").as[(Long, Long)].collect().toMap

  test("matches brute-force greedy on seeded random corpora") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val rows = (1L to 200L).map(id =>
        (id, rnd.nextInt(4001).toLong - 2000L, 1L + rnd.nextInt(50)))
      val total = rows.map(_._3).sum
      for (budget <- Seq(0L, total / 10, total / 2, total - 1, total, total + 100))
        for (bw <- Seq(1L, 100L, 10000L))
          assert(run(rows, budget, bw) === brute(rows, budget),
            s"trial=$trial budget=$budget bandWidth=$bw")
    }
  }

  test("ties on score break by ascending id, exactly at the boundary") {
    val rows = Seq((5L, 10L, 3L), (2L, 10L, 3L), (9L, 10L, 3L), (1L, 0L, 3L))
    // budget 6 fits exactly two of the three score-10 docs: ids 2, 5
    assert(run(rows, 6L, 100L) ===
      Map(2L -> 1L, 5L -> 1L, 9L -> 0L, 1L -> 0L))
  }
}

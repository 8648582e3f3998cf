package graft

import graft.etl.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC change-log apply: tombstone semantics, late-data resolution
  * by version (not arrival), and the incremental-fold invariant —
  * folding ANY split of the log batch-by-batch equals the one-shot
  * replay, because retained tombstones keep delete ordering
  * information across batches.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, version, op, payload)
  private def df(rows: Seq[(Long, Long, String, String)]): DataFrame =
    rows.toDF("k", "ver", "op", "payload")

  private def snap(d: DataFrame): Set[(Long, Long, String)] =
    Cdc.snapshot(d, "op", "D").select("k", "ver", "payload")
      .as[(Long, Long, String)].collect().toSet

  test("latest op per key wins; a winning delete removes the key") {
    val log = df(Seq(
      (1L, 1L, "U", "a"), (1L, 2L, "U", "b"),
      (2L, 1L, "U", "x"), (2L, 2L, "D", ""),
      (3L, 5L, "D", ""), (3L, 7L, "U", "reborn")))
    val s = snap(Cdc.state(log, Seq("k"), Seq("ver")))
    assert(s === Set((1L, 2L, "b"), (3L, 7L, "reborn")))
  }

  test("a late update OLDER than a delete cannot resurrect the key") {
    val b1 = df(Seq((9L, 10L, "U", "v10"), (9L, 20L, "D", "")))
    val b2 = df(Seq((9L, 15L, "U", "late"))) // arrives after, versioned before
    val folded = Cdc.mergeBatch(Cdc.state(b1, Seq("k"), Seq("ver")), b2,
      Seq("k"), Seq("ver"))
    assert(snap(folded) === Set.empty)
  }

  test("equal-version conflicts resolve deterministically and fold-invariantly") {
    // ties break over the remaining columns (op, payload) DESC:
    // key 1: ("U","a") beats ("D","") -> survives; key 2: "y" beats "x"
    val rows = Seq((1L, 5L, "U", "a"), (1L, 5L, "D", ""),
      (2L, 3L, "U", "x"), (2L, 3L, "U", "y"))
    val oneShot = snap(Cdc.state(df(rows), Seq("k"), Seq("ver")))
    assert(oneShot === Set((1L, 5L, "a"), (2L, 3L, "y")))
    // conflicting rows split across batches must agree
    val folded = Cdc.mergeBatch(
      Cdc.state(df(Seq(rows(1), rows(3))), Seq("k"), Seq("ver")),
      df(Seq(rows(0), rows(2))), Seq("k"), Seq("ver"))
    assert(snap(folded) === oneShot)
  }

  test("fold over arbitrary seeded splits equals one-shot replay") {
    val rnd = new scala.util.Random(23)
    // versions drawn from a small range so same-key ties occur —
    // the fold must stay deterministic through the tie-break
    val log = (1L to 300L).map { i =>
      val k = rnd.nextInt(20).toLong
      val op = if (rnd.nextDouble() < 0.25) "D" else "U"
      (k, rnd.nextInt(60).toLong, op, s"p$i")
    }
    val oneShot = snap(Cdc.state(df(log), Seq("k"), Seq("ver")))
    for (trial <- 1 to 4) {
      // random batch assignment — deliberately NOT time-ordered
      val parts = log.groupBy(_ => rnd.nextInt(4)).values.toSeq
      val folded = parts.tail.foldLeft(Cdc.state(df(parts.head), Seq("k"), Seq("ver"))) {
        (st, b) => Cdc.mergeBatch(st, df(b), Seq("k"), Seq("ver"))
      }
      assert(snap(folded) === oneShot, s"trial $trial")
    }
  }

  test("snapshot drops the op column; state keeps it") {
    val log = df(Seq((1L, 1L, "U", "a")))
    val st = Cdc.state(log, Seq("k"), Seq("ver"))
    assert(st.columns.contains("op"))
    assert(!Cdc.snapshot(st, "op", "D").columns.contains("op"))
  }

  test("composite versions resolve lexicographically") {
    val log = Seq((1L, 1L, 5L, "U", "old"), (1L, 2L, 1L, "U", "new"))
      .toDF("k", "major", "minor", "op", "payload")
    val st = Cdc.state(log, Seq("k"), Seq("major", "minor"))
    assert(st.select("payload").as[String].collect().toSeq === Seq("new"))
  }
}

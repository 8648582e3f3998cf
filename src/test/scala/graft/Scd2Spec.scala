package graft

import graft.etl.Scd2
import org.apache.spark.sql.functions._

/** SCD2 change-log collapse: versioning, consecutive-repeat merge,
  * null-attribute handling, interval chaining, plan shape.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, ts, status) change log with repeats and a null status
  private lazy val log = Seq(
    ("a", 10L, Some("new")),
    ("a", 20L, Some("new")),      // repeat — collapses into v1
    ("a", 30L, Some("active")),
    ("a", 40L, None),             // null is a real value change
    ("a", 50L, None),             // repeated null — collapses
    ("a", 60L, Some("active")),   // re-activation opens a NEW version
    ("b", 15L, Some("new"))
  ).toDF("k", "ts", "status")

  private def history =
    Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("ts"), Seq("status"))

  test("collapses repeats, versions change points, chains intervals") {
    val rows = history
      .select("k", "status", "valid_from", "valid_to", "version", "is_current")
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), r.getBoolean(5)))
      .toSeq
    assert(rows === Seq(
      ("a", Some("new"), 10L, Some(30L), 1L, false),
      ("a", Some("active"), 30L, Some(40L), 2L, false),
      ("a", None, 40L, Some(60L), 3L, false),
      ("a", Some("active"), 60L, None, 4L, true),
      ("b", Some("new"), 15L, None, 1L, true)))
  }

  test("validity intervals tile each key's timeline with no gaps") {
    val byKey = history.select("k", "valid_from", "valid_to", "version")
      .collect()
      .groupBy(_.getString(0))
    byKey.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev.get(2) === next.getLong(1),
            "valid_to must equal the next version's valid_from")
        case _ =>
      }
      assert(sorted.last.isNullAt(2) && sorted.count(_.isNullAt(2)) === 1,
        "exactly one open (current) version per key")
    }
  }

  test("multi-attribute tracking: any attr change opens a version") {
    val two = Seq(
      ("k", 1L, "x", 1), ("k", 2L, "x", 2), ("k", 3L, "x", 2), ("k", 4L, "y", 2)
    ).toDF("k", "ts", "a1", "a2")
    val h = Scd2.fromChangeLog(two, Seq("k"), "ts", Seq("ts"), Seq("a1", "a2"))
    assert(h.count() === 3) // ts=1 (a2=1), ts=2 (a2=2), ts=4 (a1=y)
  }

  test("applyBatch folds batches into history == full recompute") {
    val fullLog = Seq(
      ("a", 10L, Some("new")), ("a", 20L, Some("active")),
      ("b", 15L, Some("new")),
      // batch 2: a repeats (no new version), b changes, c appears
      ("a", 30L, Some("active")), ("b", 35L, Some("idle")), ("c", 32L, Some("new")),
      // batch 3: a re-activates via null, c repeats, d appears
      ("a", 40L, None), ("c", 45L, Some("new")), ("d", 41L, Some("new"))
    )
    def df(rows: Seq[(String, Long, Option[String])]) =
      rows.toDF("k", "ts", "status")
    val batches = Seq(fullLog.take(3), fullLog.slice(3, 6), fullLog.drop(6))
    val incremental = batches.tail.foldLeft(
      Scd2.fromChangeLog(df(batches.head), Seq("k"), "ts", Seq("ts"), Seq("status"))
        .localCheckpoint(true)) { (h, b) =>
      Scd2.applyBatch(h, df(b), Seq("k"), "ts", Seq("ts"), Seq("status"))
        .localCheckpoint(true)
    }
    val full = Scd2.fromChangeLog(df(fullLog), Seq("k"), "ts", Seq("ts"), Seq("status"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "status", "valid_from", "valid_to", "version", "is_current")
        .orderBy("k", "version").collect()
        .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getBoolean(5)))
        .toSeq
    assert(rows(incremental) === rows(full))
  }

  test("applyBatch chains a null business key like fromChangeLog") {
    val log1 = Seq((Option.empty[String], 1L, "x"), (Some("k"), 2L, "y"))
      .toDF("k", "ts", "status")
    val log2 = Seq((Option.empty[String], 5L, "z"))
      .toDF("k", "ts", "status")
    val h0 = Scd2.fromChangeLog(log1, Seq("k"), "ts", Seq("ts"), Seq("status"))
      .localCheckpoint(true)
    val inc = Scd2.applyBatch(h0, log2, Seq("k"), "ts", Seq("ts"), Seq("status"))
    val full = Scd2.fromChangeLog(log1.unionByName(log2),
      Seq("k"), "ts", Seq("ts"), Seq("status"))
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("k", "status", "valid_from", "valid_to", "version", "is_current")
      .orderBy(col("k").asc_nulls_first, col("version")).collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getBoolean(5)))
      .toSeq
    assert(rows(inc) === rows(full))
    // exactly one current row for the null-key chain, version 2
    assert(rows(inc).count(r => r._1.isEmpty && r._6) === 1)
  }

  test("applyBatch with only repeated observations changes nothing") {
    val h0 = Scd2.fromChangeLog(
      Seq(("k", 1L, "x")).toDF("k", "ts", "status"),
      Seq("k"), "ts", Seq("ts"), Seq("status")).localCheckpoint(true)
    val h1 = Scd2.applyBatch(h0,
      Seq(("k", 2L, "x"), ("k", 3L, "x")).toDF("k", "ts", "status"),
      Seq("k"), "ts", Seq("ts"), Seq("status"))
    val got = h1.select("k", "status", "valid_from", "valid_to", "version", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.isNullAt(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got === Seq(("k", "x", 1L, true, 1L, true)))
  }

  test("plan: one exchange serves both window passes") {
    val p = history.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n === 1, s"SCD2 must shuffle the change log exactly once, saw $n in:\n${p.take(2000)}")
  }
}

package graft

import graft.etl.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("calendarFill inserts every missing day with the defaults") {
    val daily = Seq((d("2024-01-01"), 5L), (d("2024-01-04"), 7L))
      .toDF("day", "n")
    val got = Resample.calendarFill(daily, "day", Map("n" -> lit(0L)))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(got === Seq(("2024-01-01", 5L), ("2024-01-02", 0L),
      ("2024-01-03", 0L), ("2024-01-04", 7L)))
  }

  test("gridFill builds each key's own span; absent days carry nulls") {
    val df = Seq(("a", d("2024-01-01"), 1.0), ("a", d("2024-01-03"), 3.0),
      ("b", d("2024-02-10"), 9.0))
      .toDF("k", "day", "v")
    val got = Resample.gridFill(df, Seq("k"), "day")
      .orderBy("k", "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    assert(got === Seq(
      ("a", "2024-01-01", Some(1.0)), ("a", "2024-01-02", None),
      ("a", "2024-01-03", Some(3.0)), ("b", "2024-02-10", Some(9.0))))
  }

  test("ffill and bfill match a per-key scan reference") {
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some(40.0)), ("b", 1L, None), ("b", 2L, Some(2.0)))
      .toDF("k", "t", "v")
    val ff = Resample.ffill(df, Seq("k"), Seq("t"), Seq("v"))
      .orderBy("k", "t").select("v").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    assert(ff === Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0),
      None, Some(2.0)))
    val bf = Resample.bfill(df, Seq("k"), Seq("t"), Seq("v"))
      .orderBy("k", "t").select("v").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    assert(bf === Seq(Some(10.0), Some(40.0), Some(40.0), Some(40.0),
      Some(2.0), Some(2.0)))
  }

  test("interpolateLinear fills interior gaps; edges stay null") {
    val df = Seq(
      ("a", 0L, None), ("a", 1L, Some(10.0)), ("a", 2L, None),
      ("a", 3L, None), ("a", 4L, Some(40.0)), ("a", 5L, None),
      ("b", 1L, Some(7.0)))
      .toDF("k", "t", "v")
    val got = Resample.interpolateLinear(df, Seq("k"), "t", "v")
      .orderBy("k", "t").select("v").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    // interior gap at t=2,3 interpolates 10→40 over positions 1..4;
    // the leading t=0 and trailing t=5 have one-sided neighbors only
    assert(got === Seq(None, Some(10.0), Some(20.0), Some(30.0),
      Some(40.0), None, Some(7.0)))
  }

  test("interpolateLinear respects uneven position spacing") {
    val df = Seq(("a", 0L, Some(0.0)), ("a", 10L, None), ("a", 40L, Some(80.0)))
      .toDF("k", "t", "v")
    val got = Resample.interpolateLinear(df, Seq("k"), "t", "v")
      .filter(col("t") === 10L).select("v").as[Double].head()
    assert(got === 20.0) // 0 + 80 * (10/40)
  }

  test("ffill result is partitioning-invariant") {
    val df = Seq.tabulate(200) { i =>
      ("k" + i % 7, i.toLong, if (i % 3 == 0) Some(i.toDouble) else None)
    }.toDF("k", "t", "v")
    def run(parts: Int) =
      Resample.ffill(df.repartition(parts), Seq("k"), Seq("t"), Seq("v"))
        .orderBy("k", "t").collect().map(_.toSeq).toSeq
    assert(run(1) === run(13))
  }

  test("gridFill + ffill compose into one window shuffle after the join") {
    val df = Seq(("a", d("2024-01-01"), 1.0), ("a", d("2024-01-05"), 5.0))
      .toDF("k", "day", "v")
    val filled = Resample.ffill(
      Resample.gridFill(df, Seq("k"), "day"), Seq("k"), Seq("day"), Seq("v"))
    val got = filled.orderBy("day").select("v").as[Double].collect().toSeq
    assert(got === Seq(1.0, 1.0, 1.0, 1.0, 5.0))
  }
}

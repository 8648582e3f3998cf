package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench headline output contract (round-4 regression: a
  * too-long final stdout line made the driver record `parsed: null`).
  * The ladder must keep the line inside the driver's ~2000-char tail
  * window — with sbt's trailing "[success]" line budgeted — at any
  * query count, degrading per-query precision and finally eliding the
  * per-query map entirely rather than overflowing.
  */
class BenchSpec extends AnyFunSuite {

  private def queries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%03d_some_query_name" -> (i * 0.123)))

  test("current-suite-sized headline keeps the full per-query map") {
    val line = Bench.headlineLine(65.613, queries(115), iters = 3,
      errs = Nil, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"len=${line.length}")
    assert(line.contains("\"q001\":"), line.take(200))
    assert(line.contains("\"q115\":"))
    assert(line.startsWith("""{"metric":"total","value":65.613"""))
  }

  test("200 queries still fit the window (totals-only fallback is bounded)") {
    val line = Bench.headlineLine(123.456, queries(200), iters = 3,
      errs = Nil, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"len=${line.length}")
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"value\":123.456"))
  }

  test("1000 queries with many errors still fit the window") {
    val errs = (1 to 50).map(i => f"q$i%03d_some_query_name")
    val line = Bench.headlineLine(999.999, queries(1000), iters = 3,
      errs = errs, sfDir = "/root/testdata/sf1-generated/with/a/longer/path")
    assert(line.length <= 1900, s"len=${line.length}")
    // partial step keeps the most expensive queries and says how many
    // cheap-tail entries were elided
    assert(line.contains("\"queries_elided\":"), line)
    assert(line.contains("\"q1000\":"), line.take(300)) // costliest kept
    assert(!line.contains("\"q001\":"), line.take(300)) // cheapest elided
    assert(line.contains("+50 more"), line)
  }

  test("oversized suite keeps a cost-descending partial per-query map") {
    // 221 queries (the real round-16 suite size) cannot fit in full —
    // the partial step must keep the expensive head at 2 decimals,
    // elide only the cheap tail, and stay inside the window
    val line = Bench.headlineLine(284.5, queries(221), iters = 3,
      errs = Nil, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"len=${line.length}")
    assert(line.contains("\"q221\":27.18"), line.take(300))
    val elided = "\"queries_elided\":(\\d+)".r
      .findFirstMatchIn(line).map(_.group(1).toInt)
    assert(elided.exists(e => e > 0 && e < 120), s"elided=$elided")
  }

  test("duplicate short keys fail loudly instead of silently dropping a query") {
    val dup = Seq("q01_first" -> 1.0, "q01_second" -> 2.0)
    val e = intercept[IllegalArgumentException] {
      Bench.headlineLine(3.0, dup, iters = 3, errs = Nil, sfDir = "x")
    }
    assert(e.getMessage.contains("q01"))
  }

  test("NaN medians render as JSON null at every ladder step") {
    val line = Bench.headlineLine(1.0, Seq("q01_x" -> Double.NaN), iters = 3,
      errs = Seq("q01_x"), sfDir = "x")
    assert(line.contains("\"q01\":null"), line)
  }

  test("detail line carries the full attribution telemetry per query") {
    val results = Seq(
      "q01_ok" -> Bench.QStat(median = 1.5, cold = 2.25, gcMs = 120L,
        storMb = 33.5, peakHeapMb = 2048.75),
      "q02_failed" -> Bench.QStat(Double.NaN, Double.NaN, 0L, 33.5, 0.0))
    val line = Bench.detailLine(results, coldTotal = 2.25, iters = 3, sfDir = "/d/sf0.1")
    // valid single-line JSON with every telemetry map present
    for (k <- Seq("\"median\":", "\"cold\":", "\"cold_total\":2.250",
        "\"gc_ms\":", "\"storage_mb\":", "\"peak_heap_mb\":",
        "\"iters\":3", "\"sf\":\"/d/sf0.1\""))
      assert(line.contains(k), s"missing $k in $line")
    assert(!line.contains('\n'))
    // FULL query names (not the shortened headline keys), NaN → null
    assert(line.contains("\"q01_ok\":1.500"))
    assert(line.contains("\"q02_failed\":null"))
    assert(line.contains("\"q01_ok\":2048.750"))
    assert(line.contains("\"q01_ok\":120"))
  }

  test("detail line carries the per-pass host-noise sentinel (calib_sec)") {
    val results = Seq("q01_ok" -> Bench.QStat(1.5, 2.25, 0L, 0.0, 0.0))
    val line = Bench.detailLine(results, coldTotal = 2.25, iters = 3,
      sfDir = "/d/sf0.1", calib = Seq(0.31, 0.305, 0.29))
    // one entry per pass, pass order, %.3f — the normalization basis
    // for cross-round host-drift attribution
    assert(line.contains("\"calib_sec\":[0.310,0.305,0.290]"), line)
    // absent sentinel (legacy logs) still renders valid JSON
    val bare = Bench.detailLine(results, 2.25, 3, "/d/sf0.1")
    assert(bare.contains("\"calib_sec\":[]"), bare)
  }

  test("detail line persists to the durable artifact file verbatim") {
    // round 8's lesson: the driver keeps only the last ~2000 chars of
    // stdout, so the detail telemetry must ALSO land in a file —
    // writeDetail is the seam Bench.main uses for BENCH_DETAIL.json
    val results = Seq("q01_ok" -> Bench.QStat(1.5, 2.25, 120L, 33.5, 2048.75))
    val line = Bench.detailLine(results, 2.25, 3, "/d/sf0.1", Seq(0.3))
    val tmp = java.nio.file.Files.createTempFile("bench_detail", ".json")
    try {
      Bench.writeDetail(tmp, line)
      val back = new String(java.nio.file.Files.readAllBytes(tmp),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(back === line + "\n")
      // the file is a full-fidelity copy: telemetry survives intact
      assert(back.contains("\"peak_heap_mb\":") && back.contains("\"calib_sec\":[0.300]"))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

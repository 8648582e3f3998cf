package graft

import graft.llm.Spans
import org.apache.spark.sql.functions._

/** Duplicated n-gram span coverage: hand-built fixtures for the
  * interval algebra (overlap merge, adjacency merge, intra-doc
  * repeats), then a seeded randomized cross-check against a local
  * reference implementation of the same semantics.
  */
class SpansSpec extends SparkSpec {
  import spark.implicits._

  private def report(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long, Long, Double)] =
    Spans.dupSpanReport(docs.toDF("id", "text"), "id", "text", n)
      .select("id", "n_tokens", "dup_tokens", "n_spans", "dup_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map { case (id, nt, dt, ns, f) => id -> (nt, dt, ns, f) }.toMap

  test("cross-doc shared 3-gram covers both occurrences") {
    val r = report(Seq(1L -> "a b c d e f", 2L -> "x x a b c y"), n = 3)
    // "a b c" appears in both: doc 1 covers [0,2], doc 2 covers [2,4]
    assert(r(1L) === ((6L, 3L, 1L, 0.5)))
    assert(r(2L) === ((6L, 3L, 1L, 0.5)))
  }

  test("intra-doc repetition counts: a periodic doc is fully covered") {
    val r = report(Seq(1L -> "p q r p q r p q r", 2L -> "u v w x y z"), n = 3)
    assert(r(1L) === ((9L, 9L, 1L, 1.0)))
    assert(r(2L) === ((6L, 0L, 0L, 0.0)))
  }

  test("overlapping and adjacent hits merge into one maximal run") {
    // docs 1/2 share "a b c" (doc1 [0,2]) and "d e f" (doc1 [3,5]):
    // adjacent intervals -> ONE span of 6
    val r = report(Seq(
      1L -> "a b c d e f",
      2L -> "a b c q q d e f"), n = 3)
    assert(r(1L) === ((6L, 6L, 1L, 1.0)))
    // doc 2: [0,2] and [5,7], gap at 3..4 -> two spans
    assert(r(2L) === ((8L, 6L, 2L, 0.75)))
  }

  test("docs shorter than n contribute and receive nothing") {
    val r = report(Seq(1L -> "a b", 2L -> "a b c", 3L -> "a b c"), n = 3)
    assert(r(1L) === ((2L, 0L, 0L, 0.0)))
    assert(r(2L) === ((3L, 3L, 1L, 1.0)))
    assert(r(3L) === ((3L, 3L, 1L, 1.0)))
  }

  test("exact copy of a doc is fully covered on both sides") {
    val text = "m n o p q r s t"
    val r = report(Seq(1L -> text, 2L -> text, 3L -> "zz yy xx ww vv uu tt ss"), n = 4)
    assert(r(1L) === ((8L, 8L, 1L, 1.0)))
    assert(r(2L) === ((8L, 8L, 1L, 1.0)))
    assert(r(3L) === ((8L, 0L, 0L, 0.0)))
  }

  /** Local reference: same semantics, driver-side. */
  private def local(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long, Long)] = {
    val shingled = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      id -> (toks.length, toks.sliding(n).zipWithIndex
        .filter(_._1.length == n).map { case (w, i) => (w.mkString(" "), i) }.toSeq)
    }
    val occ = shingled.flatMap(_._2._2.map(_._1))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    shingled.map { case (id, (nt, sh)) =>
      val covered = sh.filter(s => occ(s._1) > 1)
        .flatMap { case (_, i) => i until (i + n) }.toSet
      // maximal runs over the covered-token set
      val runs =
        if (covered.isEmpty) 0
        else covered.toSeq.sorted.foldLeft((0, -2)) { case ((cnt, prev), x) =>
          (if (x == prev + 1) cnt else cnt + 1, x)
        }._1
      id -> ((nt.toLong, covered.size.toLong, runs.toLong))
    }.toMap
  }

  test("matches the local reference on seeded random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val docs = (1L to 30L).map { id =>
        id -> Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = report(docs, n = 3).map { case (id, (nt, dt, ns, _)) => id -> ((nt, dt, ns)) }
      assert(got === local(docs, n = 3), s"trial $trial")
    }
  }

  test("report is partition-count invariant") {
    val docs = (1L to 40L).map(i => i -> s"t${i % 7} u${i % 5} v${i % 3} w x y z${i % 2}")
    val df1 = Spans.dupSpanReport(docs.toDF("id", "text").repartition(1), "id", "text", 3)
    val df7 = Spans.dupSpanReport(docs.toDF("id", "text").repartition(7), "id", "text", 3)
    assert(df1.orderBy("id").collect().toSeq === df7.orderBy("id").collect().toSeq)
  }
}

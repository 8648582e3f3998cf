package graft

import graft.functions.{TopKTokens, TopKTokensSketch}
import org.apache.spark.sql.functions._

/** Space-saving top-k vs the exact Aggregator: head agreement on a
  * skewed stream, error-bound soundness, and bounded buffer size —
  * the properties that let the sketch replace the exact map on open
  * vocabularies at scale.
  */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch recovers the exact head on a skewed token stream") {
    // zipf-ish: token i appears ~ 3000/i times — the realistic shape
    // (natural-language token frequencies are heavy-tailed)
    val tokens = (1 to 60).flatMap(i => Seq.fill(3000 / i)(f"tok$i%02d"))
    val df = tokens.toDF("token").repartition(8) // merge across partitions
    val exact = udaf(TopKTokens(10))
    val sketch = udaf(TopKTokensSketch(10, capacity = 80))
    val e = df.agg(exact(col("token"))).as[Seq[(String, Long)]].head()
    val s = df.agg(sketch(col("token"))).as[Seq[(String, Long, Long)]].head()
    // identical head tokens in identical order, despite the bounded buffer
    assert(s.map(_._1) === e.map(_._1))
    // estimate bounds hold: true ≤ est, true ≥ est - err
    val truth = e.toMap
    s.foreach { case (t, est, err) =>
      assert(truth(t) <= est, s"$t est $est below true ${truth(t)}")
      assert(truth(t) >= est - err, s"$t lower bound violated")
    }
  }

  test("buffer never exceeds capacity even with distinct-heavy input") {
    val distinct = (1 to 10000).map(i => s"u$i")
    val agg = TopKTokensSketch(5, capacity = 32)
    var buf = agg.zero
    distinct.foreach(t => buf = agg.reduce(buf, t))
    assert(buf.size <= 32)
    // merge of two full buffers re-prunes to capacity
    var buf2 = agg.zero
    (1 to 10000).map(i => s"v$i").foreach(t => buf2 = agg.reduce(buf2, t))
    assert(agg.merge(buf, buf2).size <= 32)
  }

  test("merge keeps est upper bound when per-partition evictions happen") {
    // distinct count (2000) >> capacity (48): every partition's
    // reduce phase evicts constantly, so cross-partition merge must
    // credit one-sided survivors with the other buffer's eviction
    // floor — the case a no-eviction test can never trigger.
    val heavy = (1 to 5).flatMap(i => Seq.fill(900 - 50 * i)(s"H$i"))
    val noise = (1 to 2000).map(i => s"n${i % 997}_$i")
    val stream = scala.util.Random.javaRandomToRandom(new java.util.Random(13))
      .shuffle(heavy ++ noise)
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val df = stream.toDF("token").repartition(8)
    val sketch = udaf(TopKTokensSketch(5, capacity = 48))
    val s = df.agg(sketch(col("token"))).as[Seq[(String, Long, Long)]].head()
    // the five heavies are all above N/capacity -> guaranteed present
    assert(s.map(_._1).toSet === (1 to 5).map(i => s"H$i").toSet)
    s.foreach { case (t, est, err) =>
      assert(truth(t) <= est, s"$t: est $est below true ${truth(t)} (merge lost mass)")
      assert(truth(t) >= est - err, s"$t: lower bound est-err violated")
    }
    // sequential (single-buffer) run agrees on the same guarantee
    val agg = TopKTokensSketch(5, capacity = 48)
    var buf = agg.zero
    stream.foreach(t => buf = agg.reduce(buf, t))
    agg.finish(buf).foreach { te => assert(truth(te.token) <= te.est) }
  }

  test("guaranteed presence: counts above N/capacity always survive") {
    // one heavy token in a sea of distincts — the Misra-Gries promise
    val heavy = Seq.fill(4000)("HEAVY")
    val noise = (1 to 8000).map(i => s"n$i")
    val stream = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(heavy ++ noise)
    val agg = TopKTokensSketch(3, capacity = 64)
    var buf = agg.zero
    stream.foreach(t => buf = agg.reduce(buf, t))
    val out = agg.finish(buf)
    assert(out.head.token === "HEAVY")
    assert(out.head.est >= 4000L) // estimate upper-bounds the truth
  }
}

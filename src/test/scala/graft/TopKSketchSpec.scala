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

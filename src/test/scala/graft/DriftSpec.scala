package graft

import graft.llm.Drift

/** Corpus drift monitor (llm/Drift): hand-computed quantized-TV
  * arithmetic, identity and bounds invariants, mover determinism.
  */
class DriftSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("identical sides have zero drift and full vocab overlap") {
    val side = df((1L, "a b c a"), (2L, "d e"))
    val r = Drift.summary(side, side, "text").collect().head
    assert(r.getAs[Long]("tv_microsum") === 0L)
    assert(r.getAs[Double]("tv_dist") === 0.0)
    assert(r.getAs[Long]("vocab_ref") === r.getAs[Long]("vocab_union"))
  }

  test("disjoint vocabularies drift to ~1 (quantized TV)") {
    val r = Drift.summary(df((1L, "a a b")), df((2L, "x y z")), "text")
      .collect().head
    // every token's mass is unmatched; thirds round to 333333 so the
    // cur side sums to 999999: Σ|p−q| = (666667+333333) + 3·333333
    assert(r.getAs[Long]("tv_microsum") === 1999999L)
    // half-up of 1999999/2000000 at 6 decimals is exactly 1.0
    assert(r.getAs[Double]("tv_dist") === 1.0)
    assert(r.getAs[Long]("vocab_union") === 5L)
  }

  test("hand-computed quantized TV on a small shift") {
    // ref: a×3 b×1 → p(a)=750000, p(b)=250000
    // cur: a×1 b×3 → q(a)=250000, q(b)=750000
    // tv_microsum = 500000+500000 = 1e6; tv_dist = 1e6/2e6 = 0.5
    val r = Drift.summary(df((1L, "a a a b")), df((2L, "a b b b")), "text")
      .collect().head
    assert(r.getAs[Long]("tv_microsum") === 1000000L)
    assert(r.getAs[Double]("tv_dist") === 0.5)
    assert(r.getAs[Long]("n_ref") === 4L && r.getAs[Long]("n_cur") === 4L)
  }

  test("movers are deterministic and carry exact integer columns") {
    val ref = df((1L, "a a a a b c"), (2L, "d d"))
    val cur = df((3L, "b b b c e"))
    val rows = Drift.topMovers(ref, cur, "text", k = 3).collect()
    assert(rows.length === 3)
    // delta desc, token asc — re-derive the expected order
    val deltas = rows.map(r => (r.getAs[Long]("delta_micro"), r.getAs[String]("tok")))
    assert(deltas === deltas.sortBy { case (d, t) => (-d, t) })
    // p_micro of "a": 4/8 → 500000; q_micro 0
    val a = rows.find(_.getAs[String]("tok") == "a")
    assert(a.isDefined && a.get.getAs[Long]("delta_micro") === 500000L)
  }

  test("tv_dist is bounded by 1 + vocab quantization slack on varied corpora") {
    val ref = df((1L, "the quick brown fox"), (2L, "jumps over the dog"))
    val cur = df((3L, "an entirely different sentence here"), (4L, "the end"))
    val r = Drift.summary(ref, cur, "text").collect().head
    val tv = r.getAs[Double]("tv_dist")
    assert(tv >= 0.0 && tv <= 1.0 + r.getAs[Long]("vocab_union") * 1e-6 / 2)
  }

  test("property: quantized TV is within the documented vocab·1e-6/2 bound " +
    "of the exact TV on random corpora") {
    // The scaladoc (Drift.scala:27-29) claims the price of quantizing
    // BEFORE the sum is an error on tv_dist bounded by |vocab|·10⁻⁶/2.
    // Check it against the exact rational TV on seeded random corpora
    // (the manual sampler idiom of PropertySpec — the scalatest-
    // scalacheck bridge is not in the offline cache). The final
    // round6 of tv_dist itself adds ≤ 5e-7 on top of the sum bound.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "fff", "ggg", "hh",
      "i", "jj", "kkk", "lmn")
    val docGen = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val corpus = Gen.nonEmptyListOf(docGen)
    (0 until 12).foreach { i =>
      val refDocs = corpus.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val curDocs = corpus.pureApply(Gen.Parameters.default, Seed(2000L + i))
      val ref = df(refDocs.zipWithIndex.map { case (t, j) => (j.toLong, t) }: _*)
      val cur = df(curDocs.zipWithIndex.map { case (t, j) => (j.toLong, t) }: _*)
      val r = Drift.summary(ref, cur, "text").collect().head
      val refCounts = refDocs.flatMap(_.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val curCounts = curDocs.flatMap(_.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val n = refCounts.values.sum.toDouble
      val m = curCounts.values.sum.toDouble
      val vocab = (refCounts.keySet ++ curCounts.keySet)
      val exactTv = vocab.toSeq.map { t =>
        math.abs(refCounts.getOrElse(t, 0L) / n - curCounts.getOrElse(t, 0L) / m)
      }.sum / 2.0
      val tv = r.getAs[Double]("tv_dist")
      assert(r.getAs[Long]("vocab_union") === vocab.size.toLong)
      val bound = vocab.size * 1e-6 / 2 + 5e-7
      assert(math.abs(tv - exactTv) <= bound,
        f"seed $i: |$tv%.7f - $exactTv%.7f| > $bound%.7f (vocab=${vocab.size})")
    }
  }
}

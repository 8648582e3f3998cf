package graft

import graft.llm.Repetition

/** Gopher repetition battery (llm/Repetition): covered-char
  * arithmetic against hand-computed documents, short-doc edge cases,
  * and the flag-equals-displayed-ratio invariant.
  */
class RepetitionSpec extends SparkSpec {

  private def report(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Repetition.report(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r)).toMap
  }

  test("top-gram and dup-gram char fractions match hand computation") {
    // "a b a b a b": tokens=6, n_chars=11
    //   2-grams: "a b"×3, "b a"×2 → top covered = 3·3=9 chars
    //   5-grams: "a b a b a"×1, "b a b a b"×1 → no dup → 0
    val got = report(Seq((1L, "a b a b a b")))
    val r = got(1L)
    val top2 = r.getAs[Double]("top2_frac")
    // round(9/11, 6) = 0.818182 (2·9e6+11) div 22 = 818182 (exact int side)
    assert(math.abs(top2 - 0.818182) < 1e-9, s"top2=$top2")
    assert(r.getAs[Double]("dup5_frac") === 0.0)
    assert(!r.getAs[Boolean]("rep_ok")) // 0.818 > 0.20
  }

  test("duplicate n-gram fraction counts every occurrence of repeated grams") {
    // "x y z w v x y z w v x y z w v" is periodic with period 5:
    // every one of the 11 5-gram occurrences belongs to a gram that
    // appears >= 2 times ("x y z w v" x3, each rotation x2)
    val text = "x y z w v x y z w v x y z w v"
    val got = report(Seq((1L, text)))
    val r = got(1L)
    // n_chars = 29; 5-gram occurrences: 11 total; grams with cnt>=2:
    //   "x y z w v"×3 (9 chars each), and each of the 4 rotations ×2
    //   → dup chars = 3·9 + 4·2·9 = 99
    val expected = (2L * 99 * 1000000L + 29) / (2 * 29)
    assert(r.getAs[Double]("dup5_frac") === expected.toDouble / 1e6)
    assert(!r.getAs[Boolean]("rep_ok"))
  }

  test("docs shorter than n tokens get zero fractions, not missing rows") {
    val got = report(Seq((1L, "one two"), (2L, "solo")))
    for (id <- Seq(1L, 2L)) {
      val r = got(id)
      for (c <- Seq("top4_frac", "dup5_frac", "dup6_frac", "dup7_frac"))
        assert(r.getAs[Double](c) === 0.0, s"id=$id $c")
    }
    // "one two" has one 2-gram occurrence ("one two", 7 chars, n_chars=7)
    assert(got(1L).getAs[Double]("top2_frac") === 1.0)
    assert(got(2L).getAs[Double]("top2_frac") === 0.0)
    // a varied short doc passes every rule
    assert(got(2L).getAs[Boolean]("rep_ok"))
  }

  test("a pathological doc exceeds 1.0 — the documented per-occurrence choice") {
    // Repetition.scala:27-29: occurrences are counted per-occurrence,
    // not position-deduplicated, so a doc that is ONE token repeated
    // can cover more characters than it has. "z z z ... z" (12×):
    // every 5-gram occurrence (8 of them, 9 chars each) belongs to
    // the single gram with count 8 → dup chars = 72 > n_chars = 23.
    val got = report(Seq((1L, Seq.fill(12)("z").mkString(" "))))
    val r = got(1L)
    val expected = (2L * 72 * 1000000L + 23) / (2 * 23) // micro6(72, 23)
    assert(r.getAs[Double]("dup5_frac") === expected.toDouble / 1e6)
    assert(r.getAs[Double]("dup5_frac") > 1.0,
      "per-occurrence counting must exceed 1.0 here — the documented case")
    assert(!r.getAs[Boolean]("rep_ok"))
  }

  test("property: rolling-hash report equals exact-string recomputation " +
    "on random docs (collision insensitivity)") {
    // Gram identity inside Repetition is a 64-bit FNV rolling hash;
    // the scaladoc argues a collision must land inside one (doc, n)
    // group to perturb anything. Strongest checkable form: on seeded
    // random docs, the hashed pipeline must agree EXACTLY with a
    // naive exact-string-gram recomputation of every fraction.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def micro6(num: Long, den: Long): Long = (2L * num * 1000000L + den) / (2L * den)
    def naive(text: String): Map[String, Double] = {
      val toks = text.split(" ", -1)
      val den = math.max(text.length.toLong, 1L)
      (2 to 7).map { n =>
        val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        val byGram = grams.groupBy(identity).view.mapValues(_.size.toLong)
        val top = if (byGram.isEmpty) 0L else byGram.map { case (g, c) => c * g.length }.max
        val dup = byGram.collect { case (g, c) if c >= 2 => c * g.length }.sum
        val key = if (n <= 4) s"top${n}_frac" else s"dup${n}_frac"
        val v = if (n <= 4) top else dup
        key -> micro6(v, den).toDouble / 1e6
      }.toMap
    }
    val word = Gen.oneOf("a", "b", "ab", "ba", "x", "xy", "longword", "q7")
    val docGen = Gen.chooseNum(1, 40).flatMap(k => Gen.listOfN(k, word))
      .map(_.mkString(" "))
    (0 until 10).foreach { i =>
      val texts = Gen.nonEmptyListOf(docGen)
        .pureApply(Gen.Parameters.default, Seed(7000L + i))
      val got = report(texts.zipWithIndex.map { case (t, j) => (j.toLong, t) })
      texts.zipWithIndex.foreach { case (t, j) =>
        val want = naive(t)
        val r = got(j.toLong)
        want.foreach { case (kk, v) =>
          assert(r.getAs[Double](kk) === v, s"seed=$i doc=$j col=$kk text='$t'")
        }
      }
    }
  }

  test("verdict always agrees with the displayed rounded ratios") {
    val texts = Seq(
      (1L, "a b a b a b"),
      (2L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (3L, "p q r s t u v w x y z aa bb cc dd"))
    for ((id, r) <- report(texts)) {
      val pass =
        r.getAs[Double]("top2_frac") <= 0.20 &&
          r.getAs[Double]("top3_frac") <= 0.18 &&
          r.getAs[Double]("top4_frac") <= 0.16 &&
          r.getAs[Double]("dup5_frac") <= 0.15 &&
          r.getAs[Double]("dup6_frac") <= 0.14 &&
          r.getAs[Double]("dup7_frac") <= 0.13
      assert(r.getAs[Boolean]("rep_ok") === pass, s"id=$id flag/value disagree")
    }
  }
}

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

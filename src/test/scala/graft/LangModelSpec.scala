package graft

import graft.llm.LangModel
import org.apache.spark.sql.functions._

/** Bigram LM scoring: hand-computed probabilities on a toy corpus,
  * exact agreement with a local reference (the integer-scaled ln
  * pipeline leaves no tolerance to hide behind), and partition
  * invariance of the integer sums.
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] =
    LangModel.bigramLogProb(docs.toDF("id", "text"), "id", "text")
      .select("id", "n_bigrams", "sum_lp9", "avg_logprob")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, s, a) => id -> (n, s, a) }.toMap

  private def local(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val bigs = docs.map { case (id, t) =>
      id -> t.split(" ", -1).toSeq.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
    }
    val all = bigs.flatMap(_._2)
    val cg = all.groupBy(identity).map { case (k, v) => k -> v.size }
    val cp = all.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = docs.flatMap(_._2.split(" ", -1)).distinct.size
    bigs.filter(_._2.nonEmpty).map { case (id, bs) =>
      val s = bs.map { b =>
        math.round(math.log((cg(b) + 1).toDouble / (cp(b._1) + v)) * 1e9)
      }.sum
      id -> ((bs.size.toLong, s))
    }.toMap
  }

  test("hand-computed two-doc corpus") {
    // corpus: "a b a" + "a b" -> bigrams: (a,b)x2, (b,a)x1
    // C(a,b)=2 C(b,a)=1; prefix C(a.)=2 C(b.)=1; V={a,b} -> 2
    val r = score(Seq(1L -> "a b a", 2L -> "a b"))
    val lpAB = math.round(math.log(3.0 / 4.0) * 1e9)  // (2+1)/(2+2)
    val lpBA = math.round(math.log(2.0 / 3.0) * 1e9)  // (1+1)/(1+2)
    assert(r(1L)._1 === 2L)
    assert(r(1L)._2 === lpAB + lpBA)
    val avg2 = BigDecimal(lpAB.toDouble / 1e9 / 1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(2L) === ((1L, lpAB, avg2)))
  }

  test("single-token and empty docs are absent; others unaffected") {
    val r = score(Seq(1L -> "solo", 2L -> "x y", 3L -> ""))
    assert(!r.contains(1L) && !r.contains(3L) && r.contains(2L))
  }

  test("memorized transitions score higher than novel ones") {
    val docs = (1L to 20L).map(i => i -> "the quick fox") :+
      (21L -> "quick the zz")
    val r = score(docs)
    assert(r(1L)._3 > r(21L)._3,
      s"boilerplate ${r(1L)._3} should outscore novel ${r(21L)._3}")
  }

  test("matches the local reference on seeded random corpora") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 4) {
      val docs = (1L to 25L).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = score(docs).map { case (id, (n, s, _)) => id -> ((n, s)) }
      assert(got === local(docs), s"trial $trial")
    }
  }

  test("integer sums are partition-count invariant") {
    val docs = (1L to 30L).map(i => i -> s"w${i % 4} w${i % 3} w${i % 2} w${i % 5}")
    val a = LangModel.bigramLogProb(docs.toDF("id", "text").repartition(1), "id", "text")
      .orderBy("id").collect().toSeq
    val b = LangModel.bigramLogProb(docs.toDF("id", "text").repartition(8), "id", "text")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }
}

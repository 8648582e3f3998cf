package graft

import graft.operators.SetSimJoin
import org.apache.spark.sql.functions._

/** Prefix-filtered exact Jaccard join: boundary behavior at the
  * threshold, losslessness vs a brute-force local reference on
  * seeded random set families, and agreement with the exhaustive
  * inverted-index formulation on the real corpus.
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def join(sets: Map[Long, Set[Long]], num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    val post = sets.toSeq.flatMap { case (id, es) => es.map(id -> _) }
    SetSimJoin.jaccardJoin(post.toDF("id", "e"), "id", "e", num, den)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  private def brute(sets: Map[Long, Set[Long]], num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size.toLong
      union = (sets(i) | sets(j)).size.toLong
      if den * inter >= num * union
    } yield (i, j, inter, union)).toSet
  }

  test("pair exactly AT the threshold is included; just below is excluded") {
    val sets = Map(
      1L -> Set(1L, 2L, 3L, 4L),      // vs 2: inter 4, union 5 -> 0.8
      2L -> Set(1L, 2L, 3L, 4L, 5L),
      3L -> Set(1L, 2L, 3L, 9L))      // vs 1: inter 3, union 5 -> 0.6
    assert(join(sets, 4, 5) === Set((1L, 2L, 4L, 5L)))
  }

  test("identical sets match at tau = 1") {
    val sets = Map(1L -> Set(7L, 8L), 2L -> Set(7L, 8L), 3L -> Set(7L, 9L))
    assert(join(sets, 1, 1) === Set((1L, 2L, 2L, 2L)))
  }

  test("size-incompatible sets never pair (den*min < num*max)") {
    // |A|=2, |B|=10: even full containment gives J = 2/10 < 0.5
    val sets = Map(1L -> Set(1L, 2L), 2L -> (1L to 10L).toSet)
    assert(join(sets, 1, 2) === Set.empty)
  }

  test("matches brute force on seeded random set families") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val sets = (1L to 40L).map { id =>
        // cluster around 8 prototypes so near-dup pairs actually form
        val proto = (0 until 12).map(i => (id % 8) * 100 + i).map(_.toLong).toSet
        val mutated = proto.filter(_ => rnd.nextDouble() > 0.15) ++
          Seq.fill(rnd.nextInt(3))(1000L + rnd.nextInt(20))
        id -> mutated
      }.toMap.filter(_._2.nonEmpty)
      for ((num, den) <- Seq((4, 5), (1, 2), (7, 10)))
        assert(join(sets, num, den) === brute(sets, num, den),
          s"trial $trial tau=$num/$den")
    }
  }

  test("agrees with the exhaustive inverted-index join on the corpus") {
    import graft.llm.Dedup
    val docs = Tables.documents(spark, sf)
    val post = Dedup.hashedShingles(docs, "doc_id", "text", n = 3)
    val prefix = SetSimJoin.jaccardJoin(post, "doc_id", "h", num = 4, den = 5)
      .orderBy("id_i", "id_j").collect().toSeq
    val exhaustive = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy("id_i", "id_j").collect().toSeq
    assert(prefix.nonEmpty, "corpus should contain planted near-dups")
    assert(prefix === exhaustive)
  }

  test("probe join == full join restricted to fresh-touching pairs") {
    // random families (the brute-force fixture), fresh = every 3rd id
    val rnd = new scala.util.Random(11)
    val sets = (1L to 40L).map { id =>
      val proto = (0 until 12).map(i => (id % 8) * 100 + i).map(_.toLong).toSet
      id -> (proto.filter(_ => rnd.nextDouble() > 0.15) ++
        Seq.fill(rnd.nextInt(3))(1000L + rnd.nextInt(20)))
    }.toMap.filter(_._2.nonEmpty)
    val post = sets.toSeq.flatMap { case (id, es) => es.map(id -> _) }
      .toDF("id", "e")
    val fresh = sets.keys.filter(_ % 3 == 0).toSeq.toDF("id")
    for ((num, den) <- Seq((4, 5), (1, 2))) {
      val got = SetSimJoin.jaccardProbeJoin(post, fresh, "id", "e", num, den)
        .as[(Long, Long, Long, Long)].collect().toSet
      val expect = brute(sets, num, den)
        .filter { case (i, j, _, _) => i % 3 == 0 || j % 3 == 0 }
      assert(got === expect, s"tau=$num/$den")
    }
  }

  test("probe join with every id fresh reproduces the full join") {
    val sets = Map(1L -> Set(1L, 2L, 3L, 4L, 5L), 2L -> Set(1L, 2L, 3L, 4L, 6L),
      3L -> Set(10L, 11L), 4L -> Set(10L, 11L))
    val post = sets.toSeq.flatMap { case (id, es) => es.map(id -> _) }
      .toDF("id", "e")
    val all = sets.keys.toSeq.toDF("id")
    val got = SetSimJoin.jaccardProbeJoin(post, all, "id", "e", 4, 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === brute(sets, 4, 5))
  }
}

package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting: closed-form small graphs, the
  * hub shape the orientation exists for, a seeded random cross-check
  * against a local adjacency-set reference, and partition
  * invariance.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    Triangles.countTriangles(edges.toDF("u", "v"), "u", "v")
      .as[(Long, Long, Long)].collect().head

  test("single triangle") {
    assert(count(Seq((1L, 2L), (1L, 3L), (2L, 3L))) === ((3L, 3L, 1L)))
  }

  test("K4 has 4 triangles, K5 has 10") {
    def clique(n: Long) =
      for (i <- 1L to n; j <- (i + 1) to n) yield (i, j)
    assert(count(clique(4)) === ((4L, 6L, 4L)))
    assert(count(clique(5)) === ((5L, 10L, 10L)))
  }

  test("stars and paths are triangle-free") {
    val star = (2L to 20L).map(i => (1L, i))
    assert(count(star) === ((20L, 19L, 0L)))
    val path = (1L to 19L).map(i => (i, i + 1))
    assert(count(path) === ((20L, 19L, 0L)))
  }

  test("two triangles sharing an edge") {
    assert(count(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))) ===
      ((4L, 5L, 2L)))
  }

  test("hub plus leaf-ring (the power-law shape orientation handles)") {
    // hub 0 joined to every ring vertex; ring 1-2-...-12-1: each ring
    // edge closes exactly one triangle through the hub
    val ring = (1L to 11L).map(i => (i, i + 1)) :+ (1L, 12L)
    val spokes = (1L to 12L).map(i => (0L, i))
    assert(count(ring ++ spokes) === ((13L, 24L, 12L)))
  }

  private def local(edges: Seq[(Long, Long)]): Long = {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    edges.map { case (u, v) => (adj(u) & adj(v)).size.toLong }.sum / 3
  }

  test("matches the local adjacency reference on seeded random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 30
      val edges = (for {
        u <- 1L to n.toLong; v <- (u + 1) to n.toLong
        if rnd.nextDouble() < 0.2
      } yield (u, v)).toSeq
      assert(count(edges)._3 === local(edges), s"trial $trial")
    }
  }

  test("count is partition-count invariant") {
    val edges = (for (u <- 1L to 20L; v <- (u + 1) to 20L if (u + v) % 3 != 0)
      yield (u, v)).toSeq
    val df = edges.toDF("u", "v")
    val a = Triangles.countTriangles(df.repartition(1), "u", "v").collect().toSeq
    val b = Triangles.countTriangles(df.repartition(9), "u", "v").collect().toSeq
    assert(a === b)
  }
}

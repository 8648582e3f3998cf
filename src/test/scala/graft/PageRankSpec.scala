package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long],
                  iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst",
        nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("symmetric complete graph stays uniform at 1.0") {
    val nodes = Seq(1L, 2L, 3L)
    val edges = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    val got = run(edges, nodes, 4)
    // every node sends r/2 to each of 2 peers and receives the same
    // back: 0.15 + 0.85 * 1.0 = 1.0 forever (exact in pico-units)
    assert(got === Map(1L -> PageRank.One, 2L -> PageRank.One, 3L -> PageRank.One))
  }

  test("hand-computed 2-node chain: source decays, sink accumulates then drains") {
    // 1 -> 2, node 2 dangling
    val got1 = run(Seq((1L, 2L)), Seq(1L, 2L), 1)
    // after 1 iter: node1 = base only; node2 = base + 0.85 * 1.0
    assert(got1(1L) === PageRank.Base)
    assert(got1(2L) === PageRank.Base + 850000000000L)
    val got2 = run(Seq((1L, 2L)), Seq(1L, 2L), 2)
    // node2 now receives 0.85 * r1 = 0.85 * 0.15
    assert(got2(1L) === PageRank.Base)
    assert(got2(2L) === PageRank.Base + (85L * PageRank.Base) / 100L)
  }

  test("isolated nodes keep the damping base; zero iterations keep 1.0") {
    val got0 = run(Seq((1L, 2L)), Seq(1L, 2L, 9L), 0)
    assert(got0(9L) === PageRank.One)
    val got = run(Seq((1L, 2L)), Seq(1L, 2L, 9L), 3)
    assert(got(9L) === PageRank.Base)
    assert(got.size === 3)
  }

  test("a hub receiving from everyone outranks the spokes") {
    val spokes = (2L to 6L)
    val edges = spokes.map(s => (s, 1L)) ++ spokes.map(s => (1L, s))
    val got = run(edges, 1L +: spokes.toSeq, 5)
    spokes.foreach(s => assert(got(1L) > got(s),
      s"hub must outrank spoke $s: ${got(1L)} vs ${got(s)}"))
  }

  test("deterministic under repartitioning (exact integer math)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val a = run(edges, nodes, 5)
    val b = PageRank.ranks(edges.toDF("src", "dst").repartition(7), "src", "dst",
        nodes.toDF("node").repartition(3), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}

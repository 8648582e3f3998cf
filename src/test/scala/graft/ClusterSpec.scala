package graft

import graft.llm.Cluster
import org.apache.spark.sql.functions._

/** Connected components (near-dup clustering): cross-checked against
  * a local union-find on random graphs, plus the shapes that break
  * naive label propagation.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    Cluster.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq

  /** Reference union-find, driver-side. */
  private def ccLocal(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(k => k -> find(k)).sorted
  }

  test("two triangles joined by a bridge") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L))
    assert(cc(e) === (1L to 3L).map(_ -> 1L) ++ Seq(10L, 11L, 12L).map(_ -> 1L))
  }

  test("chain graph (worst case for plain label propagation) converges") {
    val e = (1L until 60L).map(i => (i, i + 1))
    assert(cc(e) === (1L to 60L).map(_ -> 1L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val e = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (7L, 9L), (9L, 7L))
    assert(cc(e) === Seq(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("empty edge list yields an empty labeling") {
    assert(cc(Seq.empty) === Seq.empty)
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 80
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) === ccLocal(edges))
    }
  }

  test("hot-node star graph (worst-case degree skew) converges in few rounds") {
    // one node adjacent to 5000 others — the degree-skew shape that
    // stresses the groupBy(u) in the star steps
    val e = (1L to 5000L).map(i => (0L, i))
    assert(cc(e) === (0L to 5000L).map(_ -> 0L))
  }

  test("clusters the corpus near-dup pairs with min-id canonicals") {
    val pairs = graft.llm.Dedup.jaccardPairs(
      Tables.documents(spark, sf), "doc_id", "text", n = 3, threshold = 0.8)
    val labels = Cluster.connectedComponents(pairs, "id_i", "id_j").cache()
    val byComp = labels.groupBy("component").agg(min("id").as("lo"))
    // component id IS the minimum member id
    assert(byComp.filter(col("component") =!= col("lo")).isEmpty)
    // every paired doc is labeled
    val paired = pairs.select(col("id_i").as("id"))
      .union(pairs.select(col("id_j").as("id"))).distinct()
    assert(labels.count() === paired.count())
    labels.unpersist()
  }
}

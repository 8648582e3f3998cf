package graft

import graft.llm.{SemDedup, Similarity}
import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup: deterministic k-means recovers planted
  * cluster structure, the within-cluster prune equals brute force
  * restricted to clusters, and the whole pipeline is bit-stable.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated direction groups in 8-dim, small per-vector
  // jitter on a non-dominant axis: k-means with k=3 must put each
  // group in one cluster
  private def grouped() = {
    val base = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f))
    (0 until 30).map { i =>
      val g = i % 3
      val v = base(g).clone()
      v(7) = 0.01f * (i / 3) // jitter, cosine within group stays ~1
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("k-means recovers planted group structure deterministically") {
    val df = grouped()
    val a1 = SemDedup.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 3)
      .as[(Long, Long)].collect().toMap
    // same group → same cluster; different group → different cluster
    for (i <- 0L until 30L; j <- 0L until 30L) {
      if (i % 3 == j % 3) assert(a1(i) === a1(j), s"$i,$j split a group")
      else assert(a1(i) !== a1(j), s"$i,$j merged two groups")
    }
    val a2 = SemDedup.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a1 === a2)
  }

  test("semanticDups equals brute force restricted to the cluster assignment") {
    val df = grouped()
    val got = SemDedup.semanticDups(df, "vec_id", "embedding",
        threshold = 0.95, k = 3, iters = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val assign = SemDedup.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 3)
      .withColumnRenamed("vec_id", "bid").withColumnRenamed("cluster", "bcl")
    val a = df.select(col("vec_id").as("ia"), col("embedding").as("va"),
      Similarity.qnorm2(col("embedding")).as("na"))
    val b = df.select(col("vec_id").as("ib"), col("embedding").as("vb"),
      Similarity.qnorm2(col("embedding")).as("nb"))
    val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
      .join(assign, col("ia") === col("bid"))
      .withColumnRenamed("bcl", "ca").drop("bid")
      .join(assign, col("ib") === col("bid"))
      .filter(col("ca") === col("bcl"))
      .withColumn("qdot", Similarity.qdot(col("va"), col("vb")))
      .withColumn("cos", Similarity.cosine(col("qdot"), col("na"), col("nb")))
      .filter(col("cos") >= 0.95)
      .select(col("ia"), col("ib"), col("qdot"), col("na"), col("nb"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty, "construction: jittered group members must pair")
  }

  test("planted exact copies are recovered with full recall on real embeddings") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val copies = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 20000000).as("vec_id"), col("embedding"))
    val got = SemDedup.semanticDups(emb.unionByName(copies), "vec_id", "embedding",
        threshold = 0.95, k = 8, iters = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    val expected = emb.filter(col("vec_id") % 7 === 0)
      .select("vec_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet === expected, "every planted source pairs with its copy")
    assert(got.forall(p => p._2 === p._1 + 20000000), got.take(5).mkString(","))
    assert(got.forall(p => p._3 === p._4 && p._4 === p._5),
      "identical vectors: qdot = n2_i = n2_j (cosine exactly 1)")
  }

  test("two-level routed assignment recovers planted groups and never drops rows") {
    val df = grouped()
    // routeAbove = 1 forces the coarse-quantizer path even at k = 3
    val routed = SemDedup.kmeansAssign(df, "vec_id", "embedding",
        k = 3, iters = 3, routeAbove = 1)
      .as[(Long, Long)].collect().toMap
    assert(routed.size === 30, "routing must assign every corpus row")
    for (i <- 0L until 30L; j <- 0L until 30L) {
      if (i % 3 == j % 3) assert(routed(i) === routed(j), s"$i,$j split a group")
    }
    // identical embeddings co-route and co-assign at every level —
    // the dedup contract the routed path must preserve
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val copies = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 20000000).as("vec_id"), col("embedding"))
    val got = SemDedup.semanticDups(emb.unionByName(copies), "vec_id", "embedding",
        threshold = 0.95, k = 8, iters = 3, routeAbove = 1)
      .filter(col("id_drop") === col("id_keep") + 20000000L)
      .as[(Long, Long, Long, Long, Long)].collect()
    val expected = emb.filter(col("vec_id") % 7 === 0)
      .select("vec_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet === expected,
      "routed path keeps full planted-copy recall")
    assert(got.forall(p => p._3 === p._4 && p._4 === p._5))
  }

  test("routing recall on planted NEAR-pairs is measured and floored (q136 contract)") {
    // q136's construction: component-0-negated copies are genuinely
    // DIFFERENT directions (cos in [0.7, 1)), so unlike the
    // identical-copy tests above, neither co-assignment under flat
    // k-means nor co-routing under the two-level path is structural.
    // This is the measurement the IVF approximation contract
    // (SemDedup.nearestRouted scaladoc) promises: routed recall
    // relative to the unrouted exact assignment, floored here and
    // gauged in-plan by q136's routed_ok flag.
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val negFirst = transform(col("embedding"),
      (x, i) => when(i === 0, -x).otherwise(x))
    val near = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 30000000L).as("vec_id"), negFirst.as("embedding"))
    val corpus = emb.unionByName(near)
    val truth = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        Similarity.cosine(Similarity.qdot(col("embedding"), negFirst),
          Similarity.qnorm2(col("embedding")),
          Similarity.qnorm2(negFirst)).as("cos"))
      .filter(col("cos") >= 0.9).select("vec_id").as[Long].collect().toSet
    def found(routeAbove: Int): Set[Long] =
      SemDedup.semanticDups(corpus, "vec_id", "embedding", threshold = 0.9,
          k = 8, iters = 3, routeAbove = routeAbove, initHash = Some(true))
        .filter(col("id_drop") === col("id_keep") + 30000000L)
        .select("id_keep").as[Long].collect().toSet.intersect(truth)
    val exact = found(Int.MaxValue)
    val routed = found(4)
    assert(truth.nonEmpty, "construction: some negated pairs must clear cos 0.9")
    val exactRecall = exact.size.toDouble / truth.size
    val routedVsExact = if (exact.isEmpty) 1.0 else routed.size.toDouble / exact.size
    info(f"truth=${truth.size} exact=${exact.size} routed=${routed.size} " +
      f"exactRecall=$exactRecall%.3f routedVsExact=$routedVsExact%.3f")
    assert(exactRecall >= 0.6, f"flat-assignment recall $exactRecall%.3f under floor")
    assert(routedVsExact >= 0.9, f"routing recall $routedVsExact%.3f under floor")
  }
}

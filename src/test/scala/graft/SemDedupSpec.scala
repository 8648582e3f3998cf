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
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster document embeddings with k-means, then
  * prune near-identical pairs WITHIN each cluster by cosine — the
  * shape that catches paraphrase duplicates the lexical family
  * (n-gram / MinHash / SimHash) misses, at a per-cluster quadratic
  * cost instead of an all-pairs one.
  *
  * Determinism: centroids init by deterministic farthest-first
  * traversal (hash-anchored first seed; or the single-pass IVF
  * codebook idiom via `initHash` at large k); Lloyd runs a FIXED
  * number of iterations; assignments order by exact-integer cosine with
  * centroid-id tie-break; centroid updates are exact integer
  * component sums with one IEEE division per component. Every step
  * is a pure function of the input set — bit-identical across
  * partitionings, retries, and engines.
  *
  * Scale: the codebook is k rows (bounded, broadcast); assignment is
  * one corpus scan per iteration against the broadcast codebook —
  * never a corpus×corpus product; the centroid update is a
  * (cluster, component) hash aggregate whose result (k·dim longs) is
  * bounded driver metadata, independent of corpus rows. The
  * within-cluster pair join is an equi-join on cluster id:
  * [[semanticDups]] auto-scales k ≈ N/targetCell, so Σ|cluster|²
  * stays ~N·targetCell — linear in corpus rows — the documented
  * SemDeDup trade. At 100 TB nothing in the shape changes.
  */
object SemDedup {

  private def qi(x: Column): Column =
    round(x.cast("double") * lit(1000000.0), 0).cast("long")

  /** One assignment pass: nearest centroid by exact-integer cosine,
    * ties to the lowest cent_id. `cents`: (cent_id, centv, centn2).
    * Argmax is a `max_by` hash aggregate, not a window: partial
    * aggregation collapses the n·k broadcast-product rows to n
    * map-side, where the row_number form shuffled and sorted all
    * n·k. The (sim, −cent_id) struct key reproduces the
    * (sim desc, cent_id asc) order exactly — keys never collide
    * because cent_id is unique, so the argmax is deterministic.
    */
  private def nearest(corpusQ: DataFrame, cents: DataFrame): DataFrame = {
    corpusQ
      .crossJoin(broadcast(cents))
      .withColumn("sim",
        Similarity.cosine(Similarity.qdot(col("__v"), col("centv")),
          col("__n2"), col("centn2")))
      .groupBy("__id")
      .agg(first(col("__v")).as("__v"), first(col("__n2")).as("__n2"),
        expr("max_by(cent_id, struct(sim, -cent_id))").as("cluster"))
      .select(col("__id"), col("__v"), col("__n2"), col("cluster"))
  }

  /** Deterministic farthest-first seeding (Gonzalez 1985): seed 1 is
    * the smallest id-hash; each next seed is the point with the
    * LOWEST best-cosine to the chosen seeds (ties to the lowest id)
    * — one bounded scan of the cached working set per seed, so well-
    * separated groups each get a seed and Lloyd cannot start from a
    * one-group degenerate codebook. k seeds of driver metadata.
    */
  private def farthestInit(corpusQ: DataFrame, k: Int): Seq[(Long, Seq[Float], Long)] = {
    val spark = corpusQ.sparkSession
    import spark.implicits._
    val seed0 = corpusQ
      .withColumn("__h", xxhash64(col("__id")))
      .orderBy("__h", "__id").limit(1)
      .select(col("__id"), col("__v"), col("__n2"))
      .as[(Long, Seq[Float], Long)].head()
    val seeds = scala.collection.mutable.ArrayBuffer(seed0)
    while (seeds.size < k) {
      val cents = broadcast(seeds.toSeq.toDF("cent_id", "centv", "centn2"))
      val next = corpusQ
        .join(cents.select(col("cent_id").as("__id")), Seq("__id"), "left_anti")
        .crossJoin(cents)
        .withColumn("sim",
          Similarity.cosine(Similarity.qdot(col("__v"), col("centv")),
            col("__n2"), col("centn2")))
        .groupBy("__id").agg(max(col("sim")).as("best"), first(col("__v")).as("__v"),
          first(col("__n2")).as("__n2"))
        .orderBy(col("best").asc, col("__id").asc).limit(1)
        .select(col("__id"), col("__v"), col("__n2"))
        .as[(Long, Seq[Float], Long)].collect()
      if (next.isEmpty) return seeds.toSeq // corpus smaller than k
      seeds += next.head
    }
    seeds.toSeq
  }

  /** Deterministic fixed-iteration Lloyd k-means over an embedding
    * column. Returns (idCol, cluster). Init is farthest-first by
    * default (k bounded scans — robust seed spread); `initHash`
    * switches to the single-pass smallest-id-hash codebook idiom
    * ([[Similarity.ivfCodebook]]) for large k, trading seed quality
    * for one scan. Empty cells simply drop out (no re-seeding —
    * determinism over cluster-count vanity).
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, iters: Int = 3, initHash: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // quantized working set feeds every init/assignment scan —
    // barrier-cache it
    val corpusQ = BarrierCache.track(
      corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        Similarity.qnorm2(col(vecCol)).as("__n2")))
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    var cents =
      if (initHash)
        corpusQ
          .withColumn("__h", xxhash64(col("__id")))
          .orderBy("__h", "__id")
          .limit(k)
          .withColumn("cent_id",
            row_number().over(Window.orderBy("__h", "__id")).cast("long"))
          .select(col("cent_id"), col("__v").as("centv"), col("__n2").as("centn2"))
      else
        broadcast(farthestInit(corpusQ, k).zipWithIndex
          .map { case ((_, v, n2), i) => (i + 1L, v, n2) }
          .toDF("cent_id", "centv", "centn2"))
    for (_ <- 1 to iters) {
      val assigned = nearest(corpusQ, cents)
      // exact integer component sums per (cluster, position); the
      // collected result is k·dim rows of bounded metadata, never
      // corpus data
      val sums = assigned
        .select(col("cluster"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(qi(col("x"))).as("sq"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getLong(0))
      val newCents = byCluster.toSeq.sortBy(_._1).map { case (cid, rows) =>
        val v = new Array[Float](dim)
        rows.foreach { r =>
          v(r.getInt(1)) = (r.getLong(2).toDouble / (r.getLong(3) * 1000000.0)).toFloat
        }
        (cid, v.toSeq)
      }
      cents = broadcast(newCents.toDF("cent_id", "centv")
        .withColumn("centn2", Similarity.qnorm2(col("centv"))))
    }
    nearest(corpusQ, cents).select(col("__id").as(idCol), col("cluster"))
  }

  /** The SemDeDup prune: within-cluster pairs with cosine ≥
    * `threshold`, keep-lowest-id rule. Output (id_keep, id_drop,
    * cosine) — id_drop is the semantic duplicate to remove.
    *
    * Occupancy-targeted cluster count (the RP-LSH nBits idiom,
    * [[Dedup.embeddingNearDups]]): a FIXED k makes cells grow
    * linearly with the corpus and the within-cell verify quadratic
    * (measured: the n²/2k pair count dominated the sf1 wall). With
    * k ≈ n/targetCell the verify cost pins at ~n·targetCell/2 —
    * linear in corpus rows — and assignment stays one broadcast
    * scan per iteration (n·k dots, k·dim centroid metadata).
    * Output-invariant for the dedup contract: identical embeddings
    * see identical centroid cosines and tie-breaks at ANY k, so
    * true copies always co-assign; near-miss recall vs k is the
    * documented SemDeDup trade (Abbas et al. §3: larger k = finer
    * cells = cheaper + slightly lossier). Large auto-k switches to
    * the single-pass hash init — farthest-first's k sequential
    * scans are the right price only at small k.
    */
  def semanticDups(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, k: Int = 8, iters: Int = 3,
                   targetCell: Int = 512): DataFrame = {
    val n = corpus.count()
    val kEff = math.max(k, ((n + targetCell - 1) / targetCell).toInt)
    val assign = kmeansAssign(corpus, idCol, vecCol, kEff, iters,
      initHash = kEff > 16)
    val side = BarrierCache.track(
      corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
          Similarity.qnorm2(col(vecCol)).as("__n2"))
        .join(assign.select(col(idCol).as("__id"), col("cluster")), Seq("__id")))
    val i = side.select(col("cluster"), col("__id").as("id_keep"),
      col("__v").as("vi"), col("__n2").as("ni"))
    val j = side.select(col("cluster"), col("__id").as("id_drop"),
      col("__v").as("vj"), col("__n2").as("nj"))
    // equi-join on cluster — the cartesian stays inside each cell
    i.join(j, Seq("cluster"))
      .filter(col("id_keep") < col("id_drop"))
      .withColumn("cos",
        Similarity.cosine(Similarity.qdot(col("vi"), col("vj")), col("ni"), col("nj")))
      .filter(col("cos") >= threshold)
      .select(col("id_keep"), col("id_drop"), round(col("cos"), 6).as("cosine"))
  }
}

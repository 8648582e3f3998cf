package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  * ANN pruning uses random-hyperplane LSH (Charikar 2002); the
  * multi-table bit-subset pool follows the standard LSH
  * amplification construction (Indyk-Motwani 1998).
  *
  * Numeric design: components are quantized to int64 at 1e-6
  * resolution before any arithmetic. Integer dot products are exact
  * and order-independent, so scores (and therefore top-k rankings)
  * are bit-identical across engines, partitionings, and retries —
  * no float-summation drift. The cosine itself is one IEEE division
  * at the end. Quantization error (~1e-6 relative) is far below any
  * meaningful similarity resolution.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set and scans
  *    the corpus once — the right baseline up to ~10⁶ candidates per
  *    executor-second;
  *  - the LSH path (random-hyperplane signatures, multi-table
  *    bucketed candidates, exact re-rank) prunes the scan for
  *    corpus×corpus or large-query workloads: candidates come from
  *    bucket equi-joins, never a cartesian product.
  */
object Similarity {

  /** Quantize a float component to int64 at 1e-6 resolution. */
  private def qi(x: Column): Column =
    round(x.cast("double") * lit(1000000.0), 0).cast("long")

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd Expression (graft.functions.QDot); the HOF
    * formulation (`aggregate(zip_with(...))`) computes the identical
    * value but evaluates interpreted lambdas per element.
    */
  def qdot(a: Column, b: Column): Column = graft.functions.QVec.qdot64(a, b)

  /** Exact integer squared norm. */
  def qnorm2(a: Column): Column = graft.functions.QVec.qnorm2_64(a)

  /** Reference HOF formulation, kept for cross-checking the native
    * expression in tests.
    */
  def qdotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => qi(x) * qi(y)), lit(0L), (s, v) => s + v)

  /** Cosine similarity from exact integer parts (one IEEE division). */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** Brute-force cosine top-k: broadcast the query set, scan the
    * corpus once, window-rank per query. Deterministic: scores are
    * exact, ties break on candidate id.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      qnorm2(col(vecCol)).as("cn2"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      qnorm2(col(vecCol)).as("qn2"))
    val scored = cand.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(qdot(col("qv"), col("cv")), col("qn2"), col("cn2")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    // barrier: the result is k rows per probe while the scan above
    // reads the whole corpus — the exact-top-k query and both ANN
    // twins (whose recall flags join against this exact frame) build
    // the identical plan, so one materialization serves all three.
    BarrierCache.track(scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), round(col("cos"), 6).as("cosine")))
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits of
    * hyperplane dot products. Planes are a deterministic seeded
    * pseudo-random matrix, shipped as literal arrays (tiny).
    */
  final case class RpLshParams(nBits: Int = 6, nTables: Int = 24, dim: Int = 64,
                               nBase: Int = 48, seed: Long = 42L) {
    private val rnd = new scala.util.Random(seed)
    /** base hyperplanes(bit)(component) ∈ {-1, +1} (Rademacher —
      * cheap and effective for cosine LSH). Tables draw their bits
      * from this shared pool, so the expensive projections are
      * computed once per row, not once per (table, bit).
      */
    val planes: Array[Array[Int]] =
      Array.fill(nBase, dim)(if (rnd.nextBoolean()) 1 else -1)
    /** tableBits(table) = which base bits form that table's bucket. */
    val tableBits: Array[Array[Int]] =
      Array.fill(nTables)(rnd.shuffle((0 until nBase).toList).take(nBits).toArray)
  }

  /** Add a per-table bucket-id array column: quantize once, project
    * onto the shared hyperplane pool once (materialized as a real
    * column — inlining the 48-projection expression into every
    * table-bit reference would duplicate it ~150x), then assemble
    * each table's bucket from its bit subset.
    */
  def withBuckets(df: DataFrame, vecCol: String, out: String,
                  p: RpLshParams): DataFrame = {
    // each base bit = sign of a native codegen'd quantized dot
    // against a ±1 hyperplane shipped as a literal float array
    // (sign(Σ qi(x)·(±1e6)) == sign of the ±1 projection)
    val baseBits = (0 until p.nBase).map { b =>
      val plane = array(p.planes(b).map(c => lit(c.toFloat)): _*)
      when(graft.functions.QVec.qdot64(col(vecCol), plane) > 0, lit(1L)).otherwise(0L)
    }
    val tableBuckets = (0 until p.nTables).map { t =>
      p.tableBits(t).zipWithIndex.map { case (b, j) =>
        element_at(col("__bits"), b + 1) * lit(1L << j)
      }.reduce(_ + _)
    }
    // cache barrier: CollapseProject would otherwise inline the
    // 48-projection __bits expression into all nTables*nBits
    // references (plan text grows to megabytes, eval cost x144).
    val based = BarrierCache.track(df.withColumn("__bits", array(baseBits: _*)))
    based.withColumn(out, array(tableBuckets: _*)).drop("__bits")
  }

  /** IVF-flat parameters: a FIXED-size codebook of `nCells` coarse
    * cells drawn as a deterministic uniform sample of corpus vectors
    * (the `nCells` smallest `xxhash64(id)` values — size-independent
    * of corpus rows, so the broadcast codebook and the O(N·nCells)
    * assignment cost stay bounded at any scale; a production
    * pipeline would train k-means offline and broadcast that
    * codebook instead). Queries probe the `nProbe` nearest cells.
    */
  final case class IvfParams(nCells: Int = 64, nProbe: Int = 8)

  /** Deterministic fixed-size codebook: the `nCells` corpus vectors
    * with the smallest seeded id-hash. orderBy+limit plans as a
    * distributed TakeOrdered (per-partition top-k, merged) — no
    * global sort materialization.
    */
  def ivfCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                  nCells: Int): DataFrame =
    corpus
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"),
        qnorm2(col(vecCol)).as("centn2"), xxhash64(col(idCol)).as("__h"))
      .orderBy("__h", "cent_id")
      .limit(nCells)
      .drop("__h")

  /** IVF-flat ANN top-k: assign every vector to its nearest sampled
    * centroid (broadcast codebook scan — the standard IVF build),
    * probe the query's nProbe nearest cells, exact re-rank within
    * probed cells. Cost per query ≈ (nProbe / nCells) of the corpus
    * instead of a full scan; recall grows with nProbe.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, p: IvfParams = IvfParams()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = ivfCodebook(corpus, idCol, vecCol, p.nCells)
    def nearestCells(df: DataFrame, outId: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(outId).orderBy(col("sim").desc, col("cent_id"))
      df.select(col(idCol).as(outId), col(vecCol).as("v"), qnorm2(col(vecCol)).as("n2"))
        .crossJoin(broadcast(cents))
        .withColumn("sim", cosine(qdot(col("v"), col("centv")), col("n2"), col("centn2")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= keep)
        .select(col(outId), col("cent_id"))
    }
    val cells = nearestCells(corpus, "cand_id", 1)
    val probes = nearestCells(queries, "query_id", p.nProbe)
    val pairs = probes.join(cells, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id").distinct()
    val cv = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      qnorm2(col(vecCol)).as("cn2"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      qnorm2(col(vecCol)).as("qn2"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    pairs
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("cand_id"))
      .withColumn("cos", cosine(qdot(col("qv"), col("cv")), col("qn2"), col("cn2")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), round(col("cos"), 6).as("cosine"))
  }

  /** LSH-pruned cosine top-k: candidates share ≥1 bucket in ≥1
    * table with the query; exact re-rank on the pruned set. Recall
    * < 1 by construction (tested against [[bruteTopK]]); cost scales
    * with bucket occupancy, not corpus size × query count.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, p: RpLshParams = RpLshParams()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // candidate generation on ids only — shuffling 64-float vectors
    // through the bucket join dominates cost otherwise; vectors are
    // re-attached after pair dedup via broadcast lookups
    val cand = withBuckets(corpus, vecCol, "__bk", p)
      .select(col(idCol).as("cand_id"), posexplode(col("__bk")))
      .toDF("cand_id", "table", "bucket")
    val q = withBuckets(queries, vecCol, "__bk", p)
      .select(col(idCol).as("query_id"), posexplode(col("__bk")))
      .toDF("query_id", "table", "bucket")
    val pairs = cand.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id")
      .dropDuplicates("query_id", "cand_id")
    val cv = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      qnorm2(col(vecCol)).as("cn2"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      qnorm2(col(vecCol)).as("qn2"))
    val scored = pairs
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("cand_id"))
      .withColumn("cos", cosine(qdot(col("qv"), col("cv")), col("qn2"), col("cn2")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("cand_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Symmetric per-vector int8 quantization: scale each vector by
    * 127/max|v_i| and round — the standard 4× memory shrink before
    * an ANN index is built (int8 dot products then run in SIMD
    * integer units; scores rescale by the two stored scales). Pure
    * per-row HOF projection: no shuffle, partition-parallel, exactly
    * what a 100 TB re-quantization pass needs. A zero vector (no
    * max) quantizes to all zeros. By construction every |q_i| ≤ 127
    * and the max |q_i| is exactly 127 for any nonzero vector — q66
    * emits those invariants as driver-checked columns.
    */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    val scale = lit(127.0) / maxAbs
    when(maxAbs > 0.0, transform(vec, x => round(x.cast("double") * scale).cast("int")))
      .otherwise(transform(vec, x => lit(0)))
  }
}

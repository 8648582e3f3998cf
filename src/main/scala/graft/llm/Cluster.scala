package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step a
  * training-data pipeline runs AFTER pairwise near-dup detection
  * ([[Dedup.jaccardPairs]] / [[Dedup.minhashNearDups]]): near-dup
  * pairs are edges, each connected component is one duplicate
  * cluster, and the minimum id in a component is its canonical
  * document (every other member is dropped or down-weighted).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) —
  * converges in O(log² n) rounds on any graph (O(log n) in
  * practice), each round is two hash shuffles keyed on node id, and
  * NO graph state ever lives on the driver (the per-round
  * convergence check is a 2-value aggregate). That is the shape that
  * survives a 100 TB corpus with billions of pair edges; the
  * alternative — label propagation to a fixpoint — needs O(diameter)
  * rounds and degenerates on chain-shaped dup clusters.
  *
  * Each iteration is cut from the previous one's lineage with an
  * eager `localCheckpoint` (plans otherwise double per round and
  * analysis time dominates after ~10 iterations). On a real cluster
  * a lost executor invalidates local checkpoints and fails the job —
  * acceptable for an idempotent batch job that simply re-runs; swap
  * in reliable `checkpoint` (HDFS-backed) when retries must resume
  * mid-computation.
  */
object Cluster {

  /** (id, component) for every node that appears in `edges`, where
    * `component` is the minimum node id reachable from `id`.
    * Self-loops are ignored; isolated nodes never appear (callers
    * union them back as their own singleton component if needed).
    *
    * @throws IllegalStateException if the star rounds do not
    *   converge within `maxIter` (never observed below hundreds of
    *   millions of nodes; the bound exists so a regression fails
    *   loudly instead of looping).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    // Lazy localCheckpoint: the signature aggregate right after is
    // the round's ONLY action — it materializes the checkpoint as a
    // side effect, so each star round costs one job, not two.
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    var sig = signature(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint(false)
      val s2 = signature(e)
      converged = s2 == sig
      sig = s2
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter star rounds")
    // At the fixpoint the edge set is a union of stars (member ->
    // component-min); roots appear only on the v side.
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Order-insensitive fingerprint of the edge set: (row count,
    * xxhash64 sum as decimal — ANSI mode forbids wraparound long
    * sums). Two equal fingerprints on consecutive rounds ⇒ the star
    * transforms reached their fixpoint.
    */
  private def signature(e: DataFrame): (Long, BigDecimal) = {
    val r = e.agg(count(lit(1)),
      sum(xxhash64(col("u"), col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
    (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
  }

  /** Large-star: every neighbor LARGER than u re-attaches to the
    * minimum of u's closed neighborhood. One groupBy(u) + one join —
    * two shuffles on node id.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every neighbor SMALLER than u (and u itself)
    * attaches to the minimum of u's smaller neighborhood.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = dir.groupBy("u").agg(min("v").as("m"))
    dir.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (the AllPairs /
  * PPJoin candidate scheme): all pairs of sets with Jaccard ≥ τ,
  * with no approximation anywhere — the lossless sibling of the
  * MinHash-LSH path ([[graft.llm.Dedup.minhashNearDups]]) and of
  * the hot-shingle-capped inverted index
  * ([[graft.llm.Dedup.jaccardPairs]] with `maxDocFreq`).
  *
  * Prefix-filter principle: order every set by a global total order
  * (ascending document frequency, rarest first — ties by element).
  * If J(A,B) ≥ τ = num/den, then A and B must share at least one
  * element among their first `|A| − ⌈τ·|A|⌉ + 1` (resp. B's)
  * elements in that order. So the candidate join runs ONLY over the
  * short rare-element prefixes, never the full posting lists — the
  * frequent elements (the join-skew killers at corpus scale) are
  * exactly the ones the prefixes exclude.
  *
  * τ is taken as a RATIONAL num/den and every bound is integer
  * arithmetic: a float ⌈τ·|A|⌉ that rounds up one too far would
  * SHORTEN the prefix and silently drop true pairs; integer ceil
  * `(num·sz + den − 1) div den` cannot.
  *
  * Cost at scale: df-rank + prefix selection is one window keyed by
  * set id; the candidate self-join touches Σ|prefix|² per element
  * (bounded because prefixes hold only rare elements); verification
  * joins each DISTINCT candidate pair back to the two full posting
  * lists — O(|A|+|B|) per candidate, shuffled by id, never a
  * cross-join. Same output contract as [[graft.llm.Dedup.jaccardPairs]]:
  * `(id_i, id_j, inter, sz_union)`, all integers.
  */
object SetSimJoin {

  /** Shared derivation for both join forms: normalized postings,
    * per-set sizes, and the rare-element prefix under the global
    * (df, elem) order, each barrier-cached. Built through ONE code
    * path so the full join and the probe join construct IDENTICAL
    * plans — Spark's CacheManager then shares one materialization
    * when both run in a session (q102 + q127).
    */
  private def prefixFrames(postings: DataFrame, idCol: String,
                           elemCol: String, num: Int, den: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(num > 0 && num <= den, s"need 0 < num/den <= 1, got $num/$den")
    val post = graft.llm.BarrierCache.track(
      postings.select(col(idCol).as("__id"), col(elemCol).as("__e")))
    val sizes = graft.llm.BarrierCache.track(
      post.groupBy("__id").agg(count(lit(1)).as("__sz")))
    val dfreq = post.groupBy("__e").agg(count(lit(1)).as("__df"))
    // global order (df, elem) ascending; prefix length
    // p = sz - ceil(tau*sz) + 1, all-integer ceil
    val ranked = post.join(dfreq, "__e")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__df"), col("__e"))))
      .join(sizes, "__id")
    val prefix = graft.llm.BarrierCache.track(ranked
      .filter(col("__rn") <= col("__sz") -
        expr(s"(${num}L * __sz + ${den - 1}L) div ${den}L") + 1)
      .select(col("__id"), col("__e"), col("__sz")))
    (post, sizes, prefix)
  }

  /** Verify + emit: exact intersection of each DISTINCT candidate
    * pair via the full posting lists, union from sizes, integer
    * threshold compare.
    */
  private def verify(cand: DataFrame, post: DataFrame, sizes: DataFrame,
                     num: Int, den: Int): DataFrame = {
    val inter = cand
      .join(post.toDF("id_i", "__e"), Seq("id_i"))
      .join(post.toDF("id_j", "__e"), Seq("id_j", "__e"))
      .groupBy("id_i", "id_j").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_i", "sz_i"), Seq("id_i"))
      .join(sizes.toDF("id_j", "sz_j"), Seq("id_j"))
      .withColumn("sz_union", col("sz_i") + col("sz_j") - col("inter"))
      // integer form of inter/union >= num/den: no float compare
      .filter(lit(den.toLong) * col("inter") >= lit(num.toLong) * col("sz_union"))
      .select(col("id_i"), col("id_j"), col("inter"), col("sz_union"))
  }

  /** @param postings DISTINCT `(idCol, elemCol)` rows (one row per
    *   set member; callers dedup, e.g. [[graft.llm.Dedup.hashedShingles]]).
    * @param num,den   Jaccard threshold τ = num/den (0 < num ≤ den).
    */
  def jaccardJoin(postings: DataFrame, idCol: String, elemCol: String,
                  num: Int, den: Int): DataFrame = {
    val (post, sizes, prefix) = prefixFrames(postings, idCol, elemCol, num, den)
    // candidates: share a prefix element + size-compatibility
    // (den*min >= num*max, else Jaccard < tau even at full overlap)
    val cand = prefix.toDF("id_i", "__e", "sz_i")
      .join(prefix.toDF("id_j", "__e", "sz_j"), Seq("__e"))
      .filter(col("id_i") < col("id_j") &&
        lit(den.toLong) * least(col("sz_i"), col("sz_j")) >=
          lit(num.toLong) * greatest(col("sz_i"), col("sz_j")))
      .select("id_i", "id_j").distinct()
    verify(cand, post, sizes, num, den)
  }

  /** INCREMENTAL form: exactly the pairs of the full join that touch
    * at least one id in `probeIds` — the daily-append shape (compare
    * a fresh batch against the indexed corpus AND itself, never
    * re-run corpus×corpus). Candidate cost is Σ over the FRESH
    * side's prefix elements of |element bucket| — proportional to
    * batch size for a fixed index, zero existing-existing work.
    *
    * Losslessness is the same two-sided prefix principle: the global
    * (df, elem) order is computed over the WHOLE index, so a
    * qualifying pair shares an element inside both prefixes, and the
    * probe side's prefix join finds it. The post/sizes/prefix frames
    * are built by the same code path as [[jaccardJoin]], so running
    * both in one session shares ONE materialization of each; in a
    * production pipeline the df table and prefixes are maintained
    * incrementally as index state. Output contract and verification
    * are identical to [[jaccardJoin]], ids canonicalized
    * `id_i < id_j`.
    */
  def jaccardProbeJoin(postings: DataFrame, probeIds: DataFrame,
                       idCol: String, elemCol: String,
                       num: Int, den: Int): DataFrame = {
    val (post, sizes, prefix) = prefixFrames(postings, idCol, elemCol, num, den)
    val fresh = graft.llm.BarrierCache.track(
      probeIds.select(col(idCol).as("__id")).distinct())
    val isFresh = fresh.withColumn("__fresh", lit(true))
    // probe side = fresh prefixes only; partner side = every prefix.
    // fresh-fresh pairs would be found from both ends — the id rule
    // keeps one; fresh-existing pairs only ever probe from fresh.
    val cand = prefix.join(isFresh, Seq("__id"), "left_semi")
      .select(col("__id").as("id_f"), col("__e"), col("__sz").as("sz_f"))
      .join(prefix.join(isFresh, Seq("__id"), "left")
        .select(col("__id").as("id_p"), col("__e"), col("__sz").as("sz_p"),
          coalesce(col("__fresh"), lit(false)).as("p_fresh")), Seq("__e"))
      .filter(col("id_f") =!= col("id_p") &&
        (!col("p_fresh") || col("id_f") < col("id_p")) &&
        lit(den.toLong) * least(col("sz_f"), col("sz_p")) >=
          lit(num.toLong) * greatest(col("sz_f"), col("sz_p")))
      .select(least(col("id_f"), col("id_p")).as("id_i"),
        greatest(col("id_f"), col("id_p")).as("id_j"))
      .distinct()
    verify(cand, post, sizes, num, den)
  }
}

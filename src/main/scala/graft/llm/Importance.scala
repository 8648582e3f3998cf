package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection: n-gram importance resampling ("Data
  * Selection for Language Models via Importance Resampling", Xie et
  * al. 2023). Every document gets a log importance weight
  *
  *   log w(doc) = Σ_features count(f) · (ln p_target(f) − ln p_raw(f))
  *
  * over bigram features with add-one smoothing. Documents whose
  * features look more like the target corpus than the raw corpus get
  * positive weights and are kept/up-sampled — domain matching
  * without training a classifier.
  *
  * Feature space: `buckets = 0` uses the raw corpus's bigram
  * vocabulary directly (exact, DuckDB-reproducible — the q114
  * contract); `buckets > 0` hashes bigrams into a fixed space
  * (xxhash64 mod buckets) — DSIR's production form for open
  * vocabularies, where the two count "models" become fixed-size
  * vectors (broadcastable by construction). Same scoring algebra
  * either way (ImportanceSpec pins the hashed path's invariants:
  * self-comparison is exactly zero, weights are partition-invariant).
  *
  * Determinism (QueryDefs discipline): each feature's
  * `ln p_t − ln p_r` is computed once, by one fixed op sequence on
  * exact integer counts, scaled ×10⁹ and rounded to a LONG; per-doc
  * weights are then pure integer sums — order-independent and
  * bit-equal across engines and partitionings.
  *
  * Scale shape: feature extraction is projection+generate; the two
  * models are map-side-partial aggregates keyed by feature; scoring
  * is one equi-join of the feature stream against the delta table —
  * no broadcast is forced (open-vocabulary string features can
  * exceed broadcast size; hashed buckets cannot, and Catalyst
  * chooses from stats).
  */
object Importance {

  /** `(id, f)` — one row per bigram occurrence; `f` is the bigram
    * string (`buckets = 0`) or its hash bucket.
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int): DataFrame = {
    val bi = LangModel.bigrams(docs, idCol, textCol)
    if (buckets > 0)
      bi.select(col(idCol),
        pmod(xxhash64(col("w1"), col("w2")), lit(buckets.toLong))
          .cast("string").as("f"))
    else
      bi.select(col(idCol), concat_ws(" ", col("w1"), col("w2")).as("f"))
  }

  /** `(id, f, m)` — per-doc DISTINCT features with multiplicity,
    * derived from the shared [[LangModel.docBigramCounts]] index:
    * scoring traffic shrinks to |distinct features| and the
    * underlying bigram materialization is the same cache q107/q108
    * hit.
    */
  def featureCounts(docs: DataFrame, idCol: String, textCol: String,
                    buckets: Int): DataFrame = {
    val db = LangModel.docBigramCounts(docs, idCol, textCol)
    val keyed =
      if (buckets > 0)
        db.select(col(idCol),
          pmod(xxhash64(col("w1"), col("w2")), lit(buckets.toLong))
            .cast("string").as("f"), col("m"))
      else
        db.select(col(idCol), concat_ws(" ", col("w1"), col("w2")).as("f"), col("m"))
    // distinct bigrams can collapse further under bucket hashing
    keyed.groupBy(idCol, "f").agg(sum(col("m")).as("m"))
  }

  /** Per-document DSIR log importance weights of `raw` against
    * `target`: `(id, n_feats, logw9, logw)` — `logw9` the exact
    * ×10⁹-scaled long, `logw` its rounded double. Smoothing
    * denominators add the RAW feature-space size (fixed `buckets`,
    * or |raw bigram vocabulary|).
    */
  def logWeights(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 0): DataFrame = {
    // raw and target usually share lineage (target is a filter of
    // raw), so every derived frame gets its own column names — a
    // shared-name using-join over shared-exprId lineages is how
    // AMBIGUOUS_REFERENCE happens on self-join shapes like this.
    // Distinct-feature counts (id, f, m): occurrence totals become
    // Σm, per-doc sums weight delta9 by m — identical values with
    // |distinct| join traffic, over the shared bigram cache.
    val rawF = BarrierCache.track(featureCounts(raw, idCol, textCol, buckets))
    // three consumers each (model + total + scoring) — cache both
    val tgtF = BarrierCache.track(featureCounts(target, idCol, textCol, buckets))
    val rawM = rawF.groupBy("f").agg(sum(col("m")).as("nr")).toDF("rf", "nr")
    val tgtM = tgtF.groupBy("f").agg(sum(col("m")).as("nt")).toDF("tf", "nt")
    // NOTE: column resolution is case-INSENSITIVE by default, so
    // totals must not reuse nr/nt/f in any capitalization
    val totals = rawF.agg(coalesce(sum(col("m")), lit(0L)).as("totR")).crossJoin(
      tgtF.agg(coalesce(sum(col("m")), lit(0L)).as("totT"))).crossJoin(
      (if (buckets > 0) rawF.sparkSession.range(1).select(lit(buckets.toLong).as("nFeat"))
       else rawM.agg(count(lit(1)).as("nFeat"))))
    // deltas over RAW's observed features (only they can score a raw
    // doc); one fixed ln/round sequence per feature
    val deltas = rawM
      .join(tgtM, col("rf") === col("tf"), "left")
      .na.fill(0L, Seq("nt"))
      .crossJoin(broadcast(totals))
      .select(col("rf").as("df"),
        round((log((col("nt") + 1).cast("double") /
            (col("totT") + col("nFeat")).cast("double")) -
          log((col("nr") + 1).cast("double") /
            (col("totR") + col("nFeat")).cast("double"))) * 1e9)
          .cast("long").as("delta9"))
    rawF.join(deltas, col("f") === col("df"))
      .groupBy(idCol)
      .agg(sum(col("m")).as("n_feats"),
        sum(col("m") * col("delta9")).as("logw9"))
      // exact half-up at 6 decimals from the INTEGER logw9: round()
      // on the double quotient rounds Double.toString's shortest
      // decimal (Spark/BigDecimal) where DuckDB rounds the binary
      // value — they disagree on exact midpoints (first hit at sf1,
      // logw9 = 258535500 → 0.258536 vs 0.258535). Integer rounding
      // of the true rational is engine-independent; the final /1e6
      // is one exact-input IEEE division both engines replay.
      .withColumn("logw",
        expr("CASE WHEN logw9 < 0 THEN -1L ELSE 1L END" +
          " * ((abs(logw9) + 500L) div 1000L)").cast("double") / 1e6)
  }
}

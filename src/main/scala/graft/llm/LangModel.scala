package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the
  * perplexity-style quality signal LLM data pipelines use to filter
  * documents (KenLM-filtering in the CCNet/Gopher lineage): train
  * add-one-smoothed bigram statistics ON the corpus itself, then
  * score every document by its average token log-probability. Low
  * scores flag text whose local token transitions the corpus has
  * never seen (gibberish, encoding damage); anomalously HIGH scores
  * flag boilerplate (transitions the corpus has memorized).
  *
  * Determinism contract (QueryDefs): a per-doc float sum of ln's
  * would be IEEE-order-dependent and could never hash-match another
  * engine, so each bigram's log-probability is computed by ONE
  * identical op sequence — integer counts → one division → ln →
  * scale by 1e9 → round — and materialized as a LONG. The per-doc
  * aggregation then sums integers (exact, order-independent); the
  * reported average divides once at the end.
  *
  * Scale shape: bigram extraction is a projection+generate (no
  * shuffle); everything downstream works on the PER-DOC DISTINCT
  * bigram index `(id, w1, w2, m)` — natural-language bigrams repeat
  * heavily, so join traffic is |per-doc distinct bigrams|, not the
  * full occurrence stream, and the model aggregates (Σm by key) see
  * pre-shrunk input. The index is barrier-cached: q107 scoring, the
  * q108 feature store, and q114's DSIR raw side build the identical
  * plan, so one materialization serves all three (the q31/q32
  * shingle-index precedent). Vocabulary tables join by token key —
  * they can exceed broadcast size at corpus scale, so nothing forces
  * a broadcast; |V| is a 1-row broadcast.
  */
object LangModel {

  /** `(id, w1, w2)` — consecutive token pairs per document. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val bi = when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("w1"),
            element_at(toks, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    docs.select(col(idCol), explode(bi).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  /** Barrier-cached per-doc distinct bigram index
    * `(id, w1, w2, m)` — `m` the within-doc occurrence count. The
    * shared materialization behind q107/q108/q114: identical calls
    * build the identical plan and hit one cache.
    */
  def docBigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    BarrierCache.track(
      bigrams(docs, idCol, textCol)
        .groupBy(idCol, "w1", "w2").agg(count(lit(1)).as("m")))

  /** Per-document add-one bigram LM score:
    * `(id, n_bigrams, sum_lp9, avg_logprob)` where
    * `sum_lp9 = Σ round(1e9 · ln((C(w1,w2)+1)/(C(w1·)+|V|)))` (exact
    * long) and `avg_logprob = sum_lp9 / 1e9 / n_bigrams` rounded to
    * 6 places. Documents with fewer than 2 tokens are absent.
    * Computed over the distinct-bigram index: each distinct bigram's
    * lp9 is one long multiplied by its exact multiplicity, so the
    * result is bit-identical to scoring the full stream while the
    * scoring join moves |distinct| rows.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val db = docBigramCounts(docs, idCol, textCol)
    val cg = db.groupBy("w1", "w2").agg(sum(col("m")).as("cnt"))
    val cp = db.groupBy("w1").agg(sum(col("m")).as("pc"))
    val v = docs.select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    db
      .join(cg, Seq("w1", "w2"))
      .join(cp, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("lp9",
        round(log((col("cnt") + 1).cast("double") /
          (col("pc") + col("v")).cast("double")) * 1e9).cast("long"))
      .groupBy(idCol)
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("lp9")).as("sum_lp9"))
      // integer half-up of the true rational sum_lp9/(1e9·n) at 6
      // decimals — see Importance.logWeights for the midpoint
      // divergence round(double, 6) carries across engines
      .withColumn("avg_logprob",
        expr("CASE WHEN sum_lp9 < 0 THEN -1L ELSE 1L END" +
          " * ((2L * abs(sum_lp9) + 1000L * n_bigrams)" +
          " div (2000L * n_bigrams))").cast("double") / 1e6)
  }
}

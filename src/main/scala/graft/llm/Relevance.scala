package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword-relevance scoring over a document corpus — the
  * lexical-retrieval half of a training-data / RAG pipeline (the
  * embedding half is [[Similarity]]).
  *
  * Reference scope: the reference pipeline has no search layer; this
  * is part of the LLM-data-pipeline tier the engine adds on top
  * (prompt mandate), using the classic Robertson/Spärck Jones BM25
  * formulation with the Lucene `ln(1 + (N-df+0.5)/(df+0.5))`
  * non-negative idf.
  *
  * 100 TB design: scoring is ONE corpus scan. Per-document term
  * frequencies and length are computed in the scan projection
  * (`size(filter(tokens, _ == term))` — codegen'd, no explode, no
  * shuffle); the corpus statistics (N, Σdl, per-term df) reduce to a
  * SINGLE row which re-attaches by broadcast, so the whole plan is
  * scan → 1-row broadcast join → projection, and a top-k consumer
  * collapses to TakeOrderedAndProject. Nothing here is proportional
  * to |vocabulary| or |query|×|corpus| beyond the scan itself.
  *
  * Oracle determinism (QueryDefs rules): tf/df/dl/N are exact longs;
  * every double is produced by ONE fixed sequence of IEEE ops
  * mirrored token-for-token in the DuckDB oracle, and `k1`/`b` must
  * be binary-exact doubles (defaults 1.25/0.75) so the SQL literal
  * parses to the identical value — `1.2` would not survive DuckDB's
  * decimal literal typing. The final score is rounded to 6 decimals
  * on both engines (the single `ln` is the only last-ulp risk, same
  * budget as q80's stddev).
  */
object Relevance {

  /** Score every document against a bag-of-terms query.
    *
    * @param docs    corpus; one row per document
    * @param idCol   document id column name
    * @param textCol whitespace-tokenizable text column name
    * @param terms   query terms (exact-match tokens)
    * @param k1      term-frequency saturation (binary-exact double)
    * @param b       length normalization (binary-exact double)
    * @return (idCol, doc_len, score) — score rounded to 6 decimals
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = TextStats.tokens(col(textCol))
    val tfCols = terms.indices.map { i =>
      size(filter(toks, t => t === lit(terms(i)))).cast("long").as(s"__tf$i")
    }
    val base = docs.select(
      (col(idCol) +: size(toks).cast("long").as("__dl") +: tfCols): _*)
    // one-row corpus stats: N, Σdl, df per term — reduce + broadcast
    val statAggs =
      count(lit(1)).as("__n") +: sum(col("__dl")).as("__sumdl") +:
        terms.indices.map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val joined = base.crossJoin(broadcast(stats))
    // fixed IEEE op sequence, mirrored verbatim in the SQL oracle
    val perTerm = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val df = col(s"__df$i")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("__dl").cast("double") /
            (col("__sumdl").cast("double") / col("__n"))))
    }
    joined.select(col(idCol), col("__dl").as("doc_len"),
      round(perTerm.reduceLeft(_ + _), 6).as("score"))
  }

  /** One Reciprocal-Rank-Fusion contribution: `1/(c + rank)`, 0 when
    * the document is absent from this ranking. The division is the
    * only float op (integer add first), so fused scores are
    * bit-identical across engines.
    */
  def rrfTerm(rank: org.apache.spark.sql.Column, c: Long = 60L): org.apache.spark.sql.Column =
    when(rank.isNotNull, lit(1.0) / (lit(c) + rank).cast("double"))
      .otherwise(lit(0.0))
}

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
    score(base, idCol, terms.size, k1, b)
  }

  /** Shared scoring tail over a (id, __dl, __tf0..__tfN) base —
    * ONE float-op sequence for the scan form and the index form, so
    * the two are bit-identical and both mirror the SQL oracle.
    */
  private def score(base: DataFrame, idCol: String, nTerms: Int,
                    k1: Double, b: Double): DataFrame = {
    // one-row corpus stats: N, Σdl, df per term — reduce + broadcast
    val statAggs =
      count(lit(1)).as("__n") +: sum(col("__dl")).as("__sumdl") +:
        (0 until nTerms).map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val joined = base.crossJoin(broadcast(stats))
    // fixed IEEE op sequence, mirrored verbatim in the SQL oracle
    val perTerm = (0 until nTerms).map { i =>
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

  /** The INVERTED-INDEX artifacts a production search pipeline
    * persists instead of rescanning text (q159): sparse postings
    * (id, tok, tf) — one row per distinct (document, term) — and
    * per-document lengths. Index size tracks corpus token variety,
    * not raw bytes; building is one explode + hash aggregate.
    */
  def indexPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextStats.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))

  /** Per-document token counts (the BM25 length-normalization side
    * of the index). Kept separate from postings so dl covers ALL
    * tokens (including empties the postings drop) — identical to
    * the scan form's `size(tokens)`.
    */
  def indexDocLens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(TextStats.tokens(col(textCol))).cast("long").as("dl"))

  /** BM25 served from the PERSISTED index: pivot the query terms'
    * postings back to per-document tf columns (left join on doclens
    * keeps zero-match documents at tf 0, exactly the scan form's
    * semantics), then the shared scoring tail. The corpus text is
    * never touched — N, Σdl, and df all derive from the index
    * tables, which is what makes incremental appends cheap: tokenize
    * only the new batch, append its postings/lengths, and the next
    * query's stats are automatically corpus-wide.
    */
  def bm25FromIndex(postings: DataFrame, doclens: DataFrame, idCol: String,
                    terms: Seq[String], k1: Double = 1.25,
                    b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tfAggs = terms.indices.map { i =>
      sum(when(col("tok") === lit(terms(i)), col("tf")).otherwise(lit(0L)))
        .as(s"__tf$i")
    }
    val pivoted = postings.filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol)).agg(tfAggs.head, tfAggs.tail: _*)
    val base = doclens.select(col(idCol), col("dl").as("__dl"))
      .join(pivoted, Seq(idCol), "left")
      .na.fill(0L, terms.indices.map(i => s"__tf$i"))
    score(base, idCol, terms.size, k1, b)
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

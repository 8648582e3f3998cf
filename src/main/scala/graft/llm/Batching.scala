package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed dynamic batching plan — the "group by similar
  * length" batch assignment every training loader uses to bound
  * padding waste (public recipe: bucketed/dynamic batching, e.g.
  * fairseq/tensor2tensor). Documents are grouped into coarse length
  * buckets, ordered by exact length inside each bucket, and cut into
  * fixed-size batches; the report prices each batch's padding
  * overhead (pad-to-max within the batch).
  *
  * Scale shape: the only shuffle is the window partitioned by
  * (bucket, salt). A GLOBAL length sort would be the naive
  * formulation — one total order, one single-partition window, a
  * driver-shaped cliff at corpus scale. Bucketing first makes the
  * order local, and the deterministic salt (id mod nSalts) caps any
  * single window partition at |bucket|/nSalts rows, so executor
  * memory bounds the batch assignment at any corpus size — batches
  * never need GLOBAL contiguity, only similar lengths, which the
  * bucket already guarantees to `bucketWidth` tokens.
  *
  * Output is integer-exact except `pad_frac`, an [[ExactRound]]
  * integer-half-up ratio of exact longs (engine-identical).
  */
object Batching {

  /** Per-(bucket, salt, batch) padding report:
    * (bucket, salt, batch, n_docs, max_len, total_tokens, pad_tokens,
    * pad_frac), where pad_tokens = n_docs·max_len − total_tokens.
    */
  def plan(docs: DataFrame, idCol: String, textCol: String,
           bucketWidth: Int, batchSize: Int, nSalts: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0 && nSalts > 0)
    val n = TextStats.tokenCount(col(textCol)).cast("long")
    val base = docs.select(col(idCol), n.as("n_tokens"))
      // Column./ is double division — floor() it back to the long
      // bucket ordinal (exact below 2^53 tokens/doc)
      .withColumn("bucket", floor(col("n_tokens") / bucketWidth).cast("long"))
      .withColumn("salt", pmod(col(idCol), lit(nSalts.toLong)))
    val w = Window.partitionBy("bucket", "salt")
      .orderBy(col("n_tokens"), col(idCol))
    base.withColumn("batch",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy("bucket", "salt", "batch")
      .agg(count(lit(1)).as("n_docs"), max("n_tokens").as("max_len"),
        sum("n_tokens").as("total_tokens"))
      .withColumn("pad_tokens",
        col("n_docs") * col("max_len") - col("total_tokens"))
      // integer half-up, not round(double, 6): see ExactRound
      .withColumn("pad_frac",
        expr(ExactRound.round6Expr("pad_tokens", "n_docs * max_len")))
  }
}

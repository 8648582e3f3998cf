package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split each document into overlapping
  * token-window chunks — the unit-of-work transform feeding context-
  * window-bounded training and retrieval pipelines (long documents
  * don't fit a model context; chunk overlap preserves boundary
  * continuity).
  *
  * Pure per-row column algebra: tokenize once, explode one
  * `sequence(0, kMax)` of window indices, slice the token array per
  * index — no shuffle at all (chunks inherit the document's
  * partition), no UDF, fully codegen'd. Output size is
  * rows × ceil(tokens/step), the inherent chunk count.
  */
object Chunking {

  /** Chunk `textCol` into windows of `size` whitespace tokens
    * stepping by `size - overlap`. Every token lands in at least one
    * chunk; consecutive chunks share exactly `overlap` tokens (the
    * final chunk may be shorter but never empty and always reaches
    * the last token). Documents with no tokens yield no rows.
    * Output adds `chunk_id` (0-based), `chunk_text`, `n_tokens`.
    */
  def chunk(df: DataFrame, textCol: Column, size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val step = size - overlap
    val toks = split(trim(textCol), "\\s+")
    val base = df
      .withColumn("__toks", toks)
      .withColumn("__ntok", size_(col("__toks")))
      .filter(col("__ntok") > 0 && length(trim(textCol)) > 0)
    base
      .withColumn("__kmax",
        when(col("__ntok") <= size, lit(0L))
          .otherwise(ceil((col("__ntok") - size).cast("double") / step).cast("long")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__kmax"))))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"),
          (col("chunk_id") * step + 1).cast("int"), lit(size)), " "))
      .withColumn("n_tokens",
        least(lit(size.toLong), col("__ntok") - col("chunk_id") * step).cast("long"))
      .drop("__toks", "__ntok", "__kmax")
  }

  // size() clashes with Column.size via functions._ at some call
  // sites; a private alias keeps intent clear
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}

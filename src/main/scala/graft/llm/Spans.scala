package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicated n-gram SPAN detection — the substring-level form of
  * training-data dedup ("Deduplicating Training Data Makes Language
  * Models Better", Lee et al. 2022): instead of dropping whole
  * near-duplicate documents, find the exact token spans that are
  * repeated VERBATIM anywhere else in the corpus (another document,
  * or another position of the same document), so a curation pipeline
  * can cut or down-weight just those spans.
  *
  * The reference pipeline has no notion of this (its unit of work is
  * a whole row, `main.py:108`); this is a north-star LLM-curation
  * operator built Spark-first.
  *
  * Scale shape (nothing is all-pairs, nothing collects):
  *   1. positioned n-gram postings `(doc, start, hash)` — a pure
  *      projection + generate (no shuffle);
  *   2. repeated-shingle set = hash-aggregate on the 8-byte hash
  *      with `count > 1` — shuffle traffic is |distinct shingles|,
  *      and the aggregate is map-side partial first;
  *   3. postings ⋈ repeated-set on the hash — an equi-join whose
  *      build side is only the repeated shingles (tiny for natural
  *      corpora: random text repeats nothing, boilerplate repeats a
  *      lot, which is exactly the signal);
  *   4. per-doc interval union (gaps-and-islands over ONE window
  *      shuffle keyed by doc): merge overlapping-or-adjacent
  *      [start, start+n-1] hits into maximal covered runs.
  *
  * Shingle identity is xxhash64 of the n-gram text — the same
  * 64-bit-collision trade [[Dedup.hashedShingles]] documents.
  */
object Spans {

  /** All n-gram occurrences with their token offsets:
    * `(id, start, h)`, `start` 0-based; docs shorter than n tokens
    * contribute nothing.
    */
  def positionedShingles(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    require(n >= 2, s"shingle width must be >= 2, got $n")
    val toks = split(col(textCol), " ")
    val sh = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), posexplode(sh))
      .select(col(idCol), col("pos").cast("long").as("start"),
        xxhash64(col("col")).as("h"))
  }

  /** Per-document duplicated-span report:
    * `(id, n_tokens, dup_tokens, n_spans, dup_frac)` — tokens covered
    * by at least one corpus-repeated n-gram, as maximal merged runs.
    * Every document appears (zero-coverage docs report 0 / 0.0).
    */
  def dupSpanReport(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    // two consumers (the repeated-shingle aggregate and the hit
    // join) — barrier-cache so the tokenize+shingle+hash projection
    // over the whole corpus runs once, not twice
    val pos = BarrierCache.track(positionedShingles(docs, idCol, textCol, n))
    val repeated = pos.groupBy("h").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1).select("h")
    val hits = pos.join(repeated, Seq("h")).select(col(idCol), col("start"))
    // gaps-and-islands: a hit opens a new covered run iff its
    // interval [start, start+n-1] neither overlaps nor touches the
    // running max end of all previous hits. Both window functions
    // share one (partition, order) spec -> one shuffle + one sort.
    val byDoc = Window.partitionBy(idCol).orderBy("start")
    val prevEnd = max(col("start") + (n - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val runs = hits
      .withColumn("newRun",
        when(prevEnd.isNull || col("start") > prevEnd + 1, 1L).otherwise(0L))
      .withColumn("run", sum(col("newRun"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("run"))
      .agg(min(col("start")).as("s"), max(col("start") + (n - 1)).as("e"))
      .groupBy(idCol)
      .agg(sum(col("e") - col("s") + 1).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(runs, Seq(idCol), "left")
      .na.fill(0L, Seq("dup_tokens", "n_spans"))
      // long/long -> one IEEE division on exactly-equal integer
      // inputs, rounded to a fixed place (QueryDefs determinism)
      .withColumn("dup_frac",
        round(col("dup_tokens") / col("n_tokens"), 6))
  }
}

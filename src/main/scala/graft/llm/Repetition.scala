package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gopher-style REPETITION rules (Rae et al. 2021, appendix A1.1 —
  * public paper): the other half of the paper's quality battery,
  * complementing [[QualityRules]] (document-shape rules). A document
  * that repeats itself — the same bigram over and over, long
  * duplicated phrases — is boilerplate/spam with high probability,
  * and repetition is the one pathology length/stopword rules can't
  * see.
  *
  * Emitted per document and n:
  *   - top n-gram char fraction (n = 2, 3, 4): characters covered by
  *     occurrences of the single most-repeated n-gram, / total chars.
  *     "Most-repeated" is defined as max over grams of
  *     occurrences·len(gram) — the n-gram covering the most
  *     characters — which is tie-free (the paper's "most frequent"
  *     is ambiguous when two grams tie on count with different
  *     lengths, and an ambiguous metric can't be oracle-checked).
  *   - duplicate n-gram char fraction (n = 5, 6, 7): characters
  *     covered by occurrences of every n-gram that appears ≥ 2
  *     times, / total chars. Overlapping occurrences are counted
  *     per-occurrence (not position-deduplicated as the paper's
  *     interval-union variant), so a pathological doc can exceed
  *     1.0 — documented, deterministic, and strictly more
  *     repetition-sensitive.
  *
  * Thresholds follow the paper's table: top 2/3/4-gram ≤
  * 0.20/0.18/0.16, duplicate 5/6/7-gram ≤ 0.15/0.14/0.13; `rep_ok`
  * is the conjunction. Every fraction is an [[ExactRound]]
  * integer-half-up of exact integer char counts, and each verdict
  * thresholds on the same 10⁶-scaled integer the displayed ratio
  * derives from, so flag and value can never disagree and the
  * DuckDB oracle replays bit-for-bit (q131).
  *
  * SCALE SHAPE — why this is a mapPartitions pass and not a
  * groupBy: every statistic here is a function of ONE document.
  * The relational form (explode n-grams → groupBy (doc, n, gram) →
  * groupBy (doc, n)) shuffles the entire per-document n-gram stream
  * across the cluster only to route each gram back to the document
  * it came from — a corpus-sized exchange carrying information that
  * never needed to leave its row. (It is also interpreted-speed on
  * the build side: higher-order-function lambdas are
  * CodegenFallback, measured 5–7 s on 5 k docs.) The honest shape
  * is a single codegen-adjacent scan projection: per document, one
  * local pass over ~|tokens|·|ns| rolling-hash counters, zero
  * exchanges, embarrassingly parallel at any corpus size. Gram
  * identity is a 64-bit FNV-style rolling hash — a collision must
  * land inside one (doc, n) group (~hundreds of grams) to perturb a
  * count, the same vanishing trade [[Dedup.hashedShingles]]
  * documents.
  */
object Repetition {

  /** (n → threshold·10⁶) for top-gram (2..4) and dup-gram (5..7). */
  val topThresholdsMicro: Map[Int, Long] =
    Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L)
  val dupThresholdsMicro: Map[Int, Long] =
    Map(5 -> 150000L, 6 -> 140000L, 7 -> 130000L)

  private val topNs = topThresholdsMicro.keys.toSeq.sorted
  private val dupNs = dupThresholdsMicro.keys.toSeq.sorted

  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Exact integer half-up of num/den · 10⁶ (num ≥ 0, den > 0) —
    * the executor-side twin of [[ExactRound.micro6Expr]].
    */
  private def micro6(num: Long, den: Long): Long =
    (2L * num * 1000000L + den) / (2L * den)

  /** Per-document repetition report. Output:
    * (id, n_chars, top2_frac, top3_frac, top4_frac,
    *  dup5_frac, dup6_frac, dup7_frac, rep_ok).
    */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idField = docs.schema(idCol)
    val outSchema = StructType(
      idField.copy(name = idCol) +:
        StructField("n_chars", LongType, nullable = false) +:
        (topNs.map(n => StructField(s"top${n}_frac", DoubleType, nullable = false)) ++
          dupNs.map(n => StructField(s"dup${n}_frac", DoubleType, nullable = false)) :+
          StructField("rep_ok", BooleanType, nullable = false)))
    val idIdx = docs.schema.fieldIndex(idCol)
    val textIdx = docs.schema.fieldIndex(textCol)
    val allNs = topNs ++ dupNs
    val maxN = allNs.max

    docs.select(col(idCol), col(textCol)).mapPartitions { it =>
      // scratch reused across rows: one counter map per n
      val maps = Array.fill(maxN + 1)(new java.util.HashMap[Long, Array[Long]]())
      it.map { row =>
        val text = row.getString(1)
        val toks = text.split(" ", -1)
        val nToks = toks.length
        val nChars = text.length.toLong
        val denChars = math.max(nChars, 1L) // empty doc: all fractions 0, no div-by-0
        val th = new Array[Long](nToks)
        val tl = new Array[Long](nToks)
        var i = 0
        while (i < nToks) { th(i) = fnv64(toks(i)); tl(i) = toks(i).length.toLong; i += 1 }
        // rolling per-position gram hash/len, extended n-1 → n in place
        val gh = th.clone()
        val gl = tl.clone()
        val micro = new Array[Long](maxN + 1) // micro(n) for emitted ns
        val dupMicro = new Array[Long](maxN + 1)
        var n = 2
        while (n <= maxN) {
          val m = nToks - n + 1 // grams of this n
          var p = 0
          while (p < m) {
            gh(p) = gh(p) * 0x100000001b3L ^ th(p + n - 1)
            gl(p) = gl(p) + tl(p + n - 1) + 1L
            p += 1
          }
          if (allNs.contains(n)) {
            val counter = maps(n)
            counter.clear()
            p = 0
            while (p < m) {
              val e = counter.get(gh(p))
              if (e == null) counter.put(gh(p), Array(1L, gl(p)))
              else e(0) += 1L
              p += 1
            }
            var topChars = 0L
            var dupChars = 0L
            val vit = counter.values.iterator()
            while (vit.hasNext) {
              val e = vit.next()
              val chars = e(0) * e(1)
              if (chars > topChars) topChars = chars
              if (e(0) >= 2L) dupChars += chars
            }
            micro(n) = micro6(topChars, denChars)
            dupMicro(n) = micro6(dupChars, denChars)
          }
          n += 1
        }
        val ok = topNs.forall(k => micro(k) <= topThresholdsMicro(k)) &&
          dupNs.forall(k => dupMicro(k) <= dupThresholdsMicro(k))
        Row.fromSeq(
          row.get(0) +: nChars +:
            (topNs.map(k => micro(k).toDouble / 1e6) ++
              dupNs.map(k => dupMicro(k).toDouble / 1e6) :+ ok))
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }
}

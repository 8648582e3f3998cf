package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic banded near-dup join over a 64-bit signature stored as
  * two non-negative 32-bit halves — the shared engine behind the
  * perceptual-fingerprint dedup family: images (aHash, q153) and
  * audio (zero-crossing fingerprint, q156) both pair through this
  * one implementation; only the hash columns differ.
  *
  * Scale shape: identical to SimHash ([[Dedup.simhashNearDups]]) —
  * the 64 bits split into 8 blocks of 8; any pair within Hamming
  * distance ≤ 7 must agree exactly on ≥ 1 block (pigeonhole), so
  * candidates come from 8 equi-joins (one shuffle on
  * (block, value)), never all-pairs. Candidate count tracks true
  * near-dup count (random 8-bit block agreement is ~2⁻⁸).
  */
object SigDedup {

  /** Hamming distance between two (hi, lo) hash-half pairs. */
  def hamming(hiA: Column, loA: Column, hiB: Column, loB: Column): Column =
    bit_count(hiA.bitwiseXOR(hiB)) + bit_count(loA.bitwiseXOR(loB))

  /** Normalized (id, hi, lo) signature rows — undecodable payloads
    * (null hashes) skipped, behind a cache barrier: the hash columns
    * come from the (expensive) decode mapPartitions, and without the
    * barrier the decode would re-run for every block column and
    * again for the post-join verify.
    */
  private def sigOf(df: DataFrame, idCol: String,
                    hiCol: String, loCol: String): DataFrame =
    BarrierCache.track(
      df.filter(col(hiCol).isNotNull && col(loCol).isNotNull)
        .select(col(idCol), col(hiCol).as("hi"), col(loCol).as("lo")))

  /** One row per (signature row, block): the 8 pigeonhole bands,
    * 8 bits each — 4 from each half.
    */
  private def blocksOf(sig: DataFrame, idCol: String): DataFrame = {
    val blockCols = array((0 until 8).map { b =>
      val half = if (b < 4) col("lo") else col("hi")
      shiftrightunsigned(half, (b % 4) * 8).bitwiseAND(lit(0xFFL))
    }: _*)
    sig.select(col(idCol), col("hi"), col("lo"), posexplode(blockCols))
      .toDF(idCol, "hi", "lo", "block", "bval")
  }

  /** Near-dup pairs with Hamming distance ≤ `maxDist` over the
    * 64-bit signature, exact by pigeonhole (requires maxDist ≤ 7:
    * 8 blocks of 8 bits ⇒ any qualifying pair shares a block).
    * Rows with null hashes (undecodable payloads) are skipped.
    * Output: (id_i, id_j, dist), id_i < id_j, distinct.
    */
  def bandedNearDups(signed: DataFrame, idCol: String,
                     hiCol: String, loCol: String,
                     maxDist: Int = 7): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"maxDist=$maxDist: 8×8-bit blocks guarantee recall only up to 7")
    val blocks = blocksOf(sigOf(signed, idCol, hiCol, loCol), idCol)
    val l = blocks.toDF("id_i", "hi_i", "lo_i", "block", "bval")
    val r = blocks.toDF("id_j", "hi_j", "lo_j", "block", "bval")
    l.join(r, Seq("block", "bval"))
      .filter(col("id_i") < col("id_j"))
      .select(col("id_i"), col("id_j"),
        hamming(col("hi_i"), col("lo_i"), col("hi_j"), col("lo_j")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** INCREMENTAL near-dup pairing for corpus appends — the daily
    * production shape (the [[graft.operators.SetSimJoin]] probe-join
    * pattern, fingerprint tier): signatures are 16 bytes/row, so a
    * pipeline PERSISTS the signature table once and, per batch,
    * pairs only the fresh clips — fresh×existing and fresh×fresh,
    * never existing×existing (that work was done when those rows
    * were themselves fresh). Candidate cost ∝ batch size × band
    * occupancy; the full corpus is never re-paired and the raw
    * media is never re-decoded.
    *
    * Exactness: a fresh-touching pair within `maxDist` shares ≥ 1
    * block (same pigeonhole as [[bandedNearDups]]), and every
    * candidate here has ≥ 1 fresh side, so the result is provably
    * the full pair graph restricted to fresh-touching pairs.
    * Output: (id_i, id_j, dist), id_i < id_j, distinct; ids must be
    * unique across the union of both frames.
    */
  def incrementalNearDups(existing: DataFrame, fresh: DataFrame,
                          idCol: String, hiCol: String, loCol: String,
                          maxDist: Int = 7): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"maxDist=$maxDist: 8×8-bit blocks guarantee recall only up to 7")
    val freshSig = sigOf(fresh, idCol, hiCol, loCol)
    val allBlocks = blocksOf(
        sigOf(existing, idCol, hiCol, loCol).unionByName(freshSig), idCol)
      .toDF("id_a", "hi_a", "lo_a", "block", "bval")
    val freshBlocks = blocksOf(freshSig, idCol)
      .toDF("id_f", "hi_f", "lo_f", "block", "bval")
    allBlocks.join(freshBlocks, Seq("block", "bval"))
      .filter(col("id_a") =!= col("id_f"))
      .select(
        least(col("id_a"), col("id_f")).as("id_i"),
        greatest(col("id_a"), col("id_f")).as("id_j"),
        hamming(col("hi_a"), col("lo_a"), col("hi_f"), col("lo_f")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}

/** Near-duplicate detection for IMAGES via the exact average-hash
  * ([[graft.sources.Multimodal.decodeImages]]'s `ahash_hi`/`ahash_lo`
  * halves): the perceptual analogue of the text-side SimHash dedup
  * ([[Dedup.simhashNearDups]]) — re-encoded, brightness-shifted, or
  * slightly-edited copies of the same picture land within a few
  * Hamming bits of each other, while byte-level content hashes (q30's
  * exact dedup) see completely different files. The missing modality
  * in the dedup tier: exact/MinHash/SimHash/embedding cover text,
  * this covers the image corpus through the REAL decode path.
  *
  * Reference behavior: the pipeline fetches each staged file's raw
  * bytes and treats it as an opaque payload, with FILE IDENTITY the
  * only dedup key (main.py:438-439 `get_media` → BytesIO,
  * main.py:465-469 archive-by-file-id); this is the content-aware
  * upgrade a training-data pipeline needs — byte- or id-level dedup
  * misses the same photo saved twice at different quality.
  * At 100 TB of images the decode is embarrassingly parallel and the
  * hash is 16 bytes/row; pairing is [[SigDedup.bandedNearDups]].
  */
object ImageDedup {

  /** Hamming distance between two (hi, lo) hash-half pairs. */
  def hamming(hiA: Column, loA: Column, hiB: Column, loB: Column): Column =
    SigDedup.hamming(hiA, loA, hiB, loB)

  /** Near-dup image pairs over the decode path's aHash halves —
    * see [[SigDedup.bandedNearDups]] for the contract.
    */
  def phashNearDups(decoded: DataFrame, idCol: String,
                    hiCol: String = "ahash_hi", loCol: String = "ahash_lo",
                    maxDist: Int = 7): DataFrame =
    SigDedup.bandedNearDups(decoded, idCol, hiCol, loCol, maxDist)
}

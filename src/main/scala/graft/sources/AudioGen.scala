package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Deterministic synthetic audio corpus: one 16-bit mono PCM WAV per
  * input id, whose samples are a closed-form function of (id, i).
  * The test-vector generator for the audio half of the multimodal
  * path — a plain SQL oracle can replay the EXPECTED decode
  * statistics (sample count, exact integer energy, zero crossings,
  * peak) without being able to parse RIFF itself, which is what
  * makes [[Multimodal.decodeAudio]] driver-checkable end-to-end
  * (q126) rather than spec-only (the q122/ImageGen pattern).
  *
  * Determinism: PCM is uncompressed, the RIFF container is written
  * byte-for-byte here, and the JDK reader returns the raw frames —
  * encode→decode is exact on every run, partition, and JVM.
  * Generation is per-row CPU work with no shuffle.
  *
  * Construction (all arithmetic nonnegative, `%` = `mod`):
  *   sample_rate = 8000 Hz, mono, 16-bit signed little-endian
  *   n_samples(id) = 800 + (id % 37) · 16
  *   sample(id,i)  = (73·i + 131·id) % 4001 − 2000   ∈ [−2000, 2000]
  */
object AudioGen {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  val SampleRate = 8000

  def nSamples(id: Long): Int = (800 + (id % 37) * 16).toInt

  def sample(id: Long, i: Int): Int =
    ((73L * i + 131L * id) % 4001L - 2000L).toInt

  private def render(id: Long, gain: Int): Array[Byte] = {
    val n = nSamples(id)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(SampleRate)
      .putInt(SampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort((sample(id, i) * gain).toShort); i += 1 }
    bb.array()
  }

  /** (doc_id, content) with one synthetic WAV per id in `ids(idCol)`.
    * Per-partition batched like the decode side; no shuffle.
    *
    * `gain` renders an amplitude-scaled VARIANT of the same clip
    * (every sample × gain; base samples are ±2000, so gain ≤ 16
    * stays inside int16): a different byte stream and 4× the energy
    * at gain 2, but the SAME sign sequence — the planted
    * "re-mastered copy" construction for the zero-crossing
    * fingerprint dedup (q156).
    */
  def syntheticWav(ids: DataFrame, idCol: String, gain: Int = 1): DataFrame = {
    require(gain >= 1 && gain <= 16, s"gain $gain would clip int16")
    val idx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idx)
        Row(id, render(id, gain))
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
  }
}

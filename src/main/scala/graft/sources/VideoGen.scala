package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Deterministic synthetic video corpus: one GVID clip per input id,
  * whose frame pixels are a closed-form function of (id, f, x, y).
  * The test-vector generator for the video half of the multimodal
  * path — a plain SQL oracle can replay the EXPECTED frame-sample
  * statistics (dimensions, exact-integer luma sum over sampled
  * frames, inter-frame motion) without being able to parse the
  * container itself, which is what makes
  * [[Multimodal.sampleVideoFrames]] driver-checkable end-to-end
  * (q130) rather than spec-only — the q122/ImageGen and
  * q126/AudioGen pattern extended to video.
  *
  * GVID is this repo's own trivial uncompressed container (the JDK
  * ships no video codec, and no third-party one is available here):
  *   bytes 0..3   : magic "GVID" (US-ASCII)
  *   4 × int32 BE : width, height, fps, n_frames
  *   frames       : n_frames × (width·height·3) bytes, row-major RGB
  * [[Codec]] is a REAL parser for it — header validation, bounds
  * checks, truncation detection — implementing the production
  * [[Multimodal.VideoCodec]] seam, so everything except the codec
  * binding itself (an external ffmpeg/JNI wrapper in a real
  * deployment) is exercised by tests and the q130 oracle.
  *
  * Determinism: the container is written byte-for-byte here and
  * frames are raw RGB, so encode→decode is exact on every run,
  * partition, and JVM. Generation is per-row CPU work with no
  * shuffle.
  *
  * Construction (all arithmetic nonnegative, `%` = `mod`):
  *   width    = 8 + id % 9,  height = 8 + id % 7
  *   fps      = 10 + id % 5, n_frames = 6 + id % 5
  *   r(f,x,y) = ( 7x + 13y + 11f +  id) % 256
  *   g(f,x,y) = ( 3x +  5y + 17f + 2id) % 256
  *   b(f,x,y) = (  x +   y + 23f + 3id) % 256
  */
object VideoGen {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  def width(id: Long): Int = (8 + id % 9).toInt
  def height(id: Long): Int = (8 + id % 7).toInt
  def fps(id: Long): Int = (10 + id % 5).toInt
  def nFrames(id: Long): Int = (6 + id % 5).toInt

  /** Packed 0xRRGGBB pixel of (id, frame, x, y) — the formula the
    * q130 oracle replays in SQL.
    */
  def pixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val r = ((7L * x + 13L * y + 11L * f + id) % 256).toInt
    val g = ((3L * x + 5L * y + 17L * f + 2 * id) % 256).toInt
    val b = ((x.toLong + y + 23L * f + 3 * id) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private val Magic = "GVID".getBytes("US-ASCII")
  private val HeaderLen = 4 + 4 * 4

  def render(id: Long): Array[Byte] = render(id, 0)

  /** `delta` renders a brightness-perturbed VARIANT of the same clip
    * (every channel `min(base + delta, 255)` — the ImageGen q153
    * construction): byte-wise a different file, visually the same
    * video, and the clamped add stays SQL-replayable.
    */
  def render(id: Long, delta: Int): Array[Byte] = {
    // one-sided clamp (min(v + delta, 255)): a negative delta would
    // wrap to large unsigned bytes on decode — reject, as ImageGen/
    // AudioGen do
    require(delta >= 0 && delta <= 255, s"delta=$delta must be in [0, 255]")
    val w = width(id)
    val h = height(id)
    val nf = nFrames(id)
    val bb = java.nio.ByteBuffer.allocate(HeaderLen + nf * w * h * 3)
    bb.put(Magic).putInt(w).putInt(h).putInt(fps(id)).putInt(nf)
    var f = 0
    while (f < nf) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = pixel(id, f, x, y)
          bb.put(math.min(((p >> 16) & 0xFF) + delta, 255).toByte)
          bb.put(math.min(((p >> 8) & 0xFF) + delta, 255).toByte)
          bb.put(math.min((p & 0xFF) + delta, 255).toByte)
          x += 1
        }
        y += 1
      }
      f += 1
    }
    bb.array()
  }

  /** The GVID binding of the production codec seam: real header
    * parsing with bounds checks; a payload shorter than its declared
    * frame data yields `frame = None` for the missing frames
    * (truncation), and a bad magic/header yields `probe = None` —
    * both mark the row, never the task.
    */
  object Codec extends Multimodal.VideoCodec {
    override def probe(bytes: Array[Byte]): Option[Multimodal.VideoMeta] = {
      if (bytes.length < HeaderLen) return None
      var i = 0
      while (i < 4) { if (bytes(i) != Magic(i)) return None; i += 1 }
      val bb = java.nio.ByteBuffer.wrap(bytes, 4, 16)
      val w = bb.getInt; val h = bb.getInt; val fp = bb.getInt; val nf = bb.getInt
      if (w <= 0 || h <= 0 || fp <= 0 || nf <= 0 ||
          w.toLong * h * 3 > Int.MaxValue / math.max(nf, 1)) None
      else Some(Multimodal.VideoMeta(w, h, fp, nf))
    }

    override def frame(bytes: Array[Byte], meta: Multimodal.VideoMeta,
                       idx: Int): Option[Array[Int]] = {
      val frameBytes = meta.width * meta.height * 3
      val off = HeaderLen + idx.toLong * frameBytes
      if (idx < 0 || idx >= meta.nFrames || off + frameBytes > bytes.length) None
      else {
        val out = new Array[Int](meta.width * meta.height)
        var i = 0
        var o = off.toInt
        while (i < out.length) {
          out(i) = ((bytes(o) & 0xFF) << 16) | ((bytes(o + 1) & 0xFF) << 8) |
            (bytes(o + 2) & 0xFF)
          i += 1
          o += 3
        }
        Some(out)
      }
    }
  }

  /** (doc_id, content) with one synthetic GVID clip per id in
    * `ids(idCol)`. Per-partition batched like the decode side; no
    * shuffle.
    */
  def syntheticGvid(ids: DataFrame, idCol: String, delta: Int = 0): DataFrame = {
    val idx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idx)
        Row(id, render(id, delta))
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
  }
}

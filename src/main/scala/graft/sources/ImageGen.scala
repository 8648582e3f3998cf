package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Deterministic synthetic image corpus: one PNG per input id, whose
  * pixel values are a closed-form function of (id, x, y). This is the
  * test-vector generator for the multimodal path — it lets a plain
  * SQL oracle replay the EXPECTED decode statistics (dimensions,
  * exact-integer luma sum, histogram bin count) without being able to
  * decode PNG itself, which is what makes [[Multimodal.decodeImages]]
  * driver-checkable end-to-end (q122) rather than spec-only.
  *
  * Determinism: PNG is lossless and the JDK encoder is deterministic,
  * so encode→decode returns exactly the constructed pixels on every
  * run, every partition, every JVM. Generation is per-row CPU work
  * with no shuffle — embarrassingly parallel at any corpus size.
  *
  * Construction (all arithmetic nonnegative, `%` = `mod`):
  *   width  = 16 + id % 17,  height = 16 + id % 13
  *   r(x,y) = (7x + 13y +  id) % 256
  *   g(x,y) = (3x + 5y  + 2id) % 256
  *   b(x,y) = ( x +  y  + 3id) % 256
  */
object ImageGen {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  def width(id: Long): Int = (16 + id % 17).toInt
  def height(id: Long): Int = (16 + id % 13).toInt

  private def render(id: Long, delta: Int): Array[Byte] = {
    // the clamp below is one-sided (min(v + delta, 255)) — a negative
    // delta would let sign bits bleed across the RGB packing and
    // silently diverge from the SQL-replayable least(v + delta, 255)
    // contract, so reject it here (AudioGen guards its gain the same way)
    require(delta >= 0 && delta <= 255, s"delta=$delta must be in [0, 255]")
    val w = width(id)
    val h = height(id)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.min(((7L * x + 13L * y + id) % 256).toInt + delta, 255)
        val g = math.min(((3L * x + 5L * y + 2 * id) % 256).toInt + delta, 255)
        val b = math.min(((x.toLong + y + 3 * id) % 256).toInt + delta, 255)
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(bi, "png", out)
    require(ok, "JDK PNG writer unavailable")
    out.toByteArray
  }

  /** (doc_id, content) with one synthetic PNG per id in `ids(idCol)`.
    * Per-partition batched like the decode side; no shuffle.
    *
    * `delta` renders a brightness-perturbed VARIANT of the same
    * image: every channel value becomes `min(base + delta, 255)` —
    * clamped add, so the perturbation stays SQL-replayable
    * (`least(v + delta, 255)`) and a small delta shifts every cell
    * mean and the global mean nearly in lockstep, the planted
    * near-duplicate construction for the perceptual-hash dedup
    * (q153): visually the same image, byte-wise a different file.
    */
  def syntheticPng(ids: DataFrame, idCol: String, delta: Int = 0): DataFrame = {
    val idx = ids.schema.fieldIndex(idCol)
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val id = row.getLong(idx)
        Row(id, render(id, delta))
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
  }
}

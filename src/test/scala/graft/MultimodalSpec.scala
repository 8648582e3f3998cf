package graft

import graft.sources.Multimodal
import java.nio.file.{Files, Paths}

/** Multimodal binary-column plumbing: binaryFile source, magic-byte
  * sniffing, stub feature extraction determinism, batched map shape.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("mm")
    def w(name: String, bytes: Array[Byte]) =
      Files.write(Paths.get(d, name), bytes)
    w("a.png", Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2, 3))
    w("b.jpg", Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9, 9))
    w("c.wav", "RIFF....WAVEdata".getBytes("US-ASCII"))
    w("d.mp4", Array[Byte](0, 0, 0, 0x18) ++ "ftypisom".getBytes("US-ASCII"))
    w("e.bin", Array[Byte](1, 2, 3, 4, 5))
    d
  }

  test("binaryFile source + magic-byte format sniffing") {
    val df = Multimodal.withMetadata(Multimodal.readBinary(spark, dir))
    val got = df.select("path", "meta.format").collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(got("a.png") === "png")
    assert(got("b.jpg") === "jpeg")
    assert(got("c.wav") === "riff")
    assert(got("d.mp4") === "mp4")
    assert(got("e.bin") === "unknown")
  }

  test("metadata carries size + stable content hash") {
    val df = Multimodal.withMetadata(Multimodal.readBinary(spark, dir))
    val row = df.filter(org.apache.spark.sql.functions.col("path").endsWith("e.bin"))
      .select("meta.n_bytes", "meta.content_hash").collect().head
    assert(row.getLong(0) === 5L)
    val again = Multimodal.withMetadata(Multimodal.readBinary(spark, dir))
      .filter(org.apache.spark.sql.functions.col("path").endsWith("e.bin"))
      .select("meta.content_hash").collect().head.getLong(0)
    assert(row.getLong(1) === again)
  }

  test("stub decode yields deterministic fixed-dim features; batched map preserves rows") {
    val df = Multimodal.stubDecodeFeatures(
      Multimodal.withMetadata(Multimodal.readBinary(spark, dir)), dim = 8)
    val feats = df.select("features").collect().map(_.getSeq[Double](0))
    assert(feats.forall(_.length === 8))
    assert(feats.forall(_.forall(v => v >= 0.0 && v < 1.0)))
    val n = df.count()
    assert(Multimodal.mapBatches(df.drop("features"), batchSize = 2).count() === n)
  }
}

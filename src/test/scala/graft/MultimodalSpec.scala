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

  // real image fixtures, generated deterministically through the
  // JDK's own encoders (the same codec family the decode path uses)
  private lazy val imgDir: String = {
    val d = tmpDir("mm-img")
    import java.awt.image.BufferedImage
    def write(name: String, fmt: String, bi: BufferedImage): Unit = {
      val ok = javax.imageio.ImageIO.write(bi, fmt, new java.io.File(d, name))
      assert(ok, s"JDK writer missing for $fmt")
    }
    // solid RGB(100,150,200): luma = (299·100+587·150+114·200)/1000
    // = 140.75 exactly; entropy 0 (one histogram bin)
    val solid = new BufferedImage(20, 10, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      solid.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
    write("solid.png", "png", solid)
    write("solid.bmp", "bmp", solid)
    write("solid.jpg", "jpg", solid)
    // two-tone 16×16: left half black, right half white — entropy
    // exactly 1 bit, mean 127.5, and the 4×4 grid pooling splits
    // into two black and two white columns
    val duo = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      duo.setRGB(x, y, if (x < 8) 0x000000 else 0xFFFFFF)
    write("duo.png", "png", duo)
    write("duo.gif", "gif", duo)
    // truncated header-only "png" + plain garbage: decode must mark,
    // not throw
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "trunc.png"),
      Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2))
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "junk.bin"),
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    d
  }

  test("ImageIO decode: dimensions, channels, exact luma stats on lossless formats") {
    val df = Multimodal.decodeImages(
      Multimodal.withMetadata(Multimodal.readBinary(spark, imgDir)), batchSize = 2)
    val by = df.select("path", "image.*").collect()
      .map(r => (r.getString(0).split('/').last, r)).toMap
    for (f <- Seq("solid.png", "solid.bmp")) {
      val r = by(f)
      assert(r.getBoolean(1), f)                    // decode_ok
      assert(r.getInt(2) === 20 && r.getInt(3) === 10, f) // w×h
      assert(r.getInt(4) === 3, f)                  // RGB channels
      assert(r.getDouble(5) === 140.75, f)          // exact BT.601 luma
      assert(r.getDouble(6) === 0.0, f)             // single-bin entropy
    }
    // JPEG is lossy: near, not exact
    val j = by("solid.jpg")
    assert(j.getBoolean(1) && j.getInt(2) === 20 && j.getInt(3) === 10)
    assert(math.abs(j.getDouble(5) - 140.75) < 3.0, j.getDouble(5))
    // two-tone: entropy exactly 1 bit, mean exactly 127.5 (png + gif)
    for (f <- Seq("duo.png", "duo.gif")) {
      val r = by(f)
      assert(r.getBoolean(1), f)
      assert(r.getDouble(5) === 127.5, f)
      assert(r.getDouble(6) === 1.0, f)
    }
    // corrupt payloads mark the row instead of failing the task
    assert(!by("trunc.png").getBoolean(1))
    assert(!by("junk.bin").getBoolean(1))
  }

  test("grid-pooled luma features: deterministic, correct on the two-tone image") {
    val df = Multimodal.decodeImages(
      Multimodal.withMetadata(Multimodal.readBinary(spark, imgDir)), grid = 4)
    val duo = df.filter(org.apache.spark.sql.functions.col("path").endsWith("duo.png"))
      .select("features").collect().head.getSeq[Float](0)
    assert(duo.length === 16)
    // columns 0-1 of each grid row black (0.0), columns 2-3 white (1.0)
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val v = duo(gy * 4 + gx)
      if (gx < 2) assert(v === 0f, s"($gy,$gx)") else assert(v === 1f, s"($gy,$gx)")
    }
    // failed decodes carry null features; decode is bit-deterministic
    val junk = df.filter(org.apache.spark.sql.functions.col("path").endsWith("junk.bin"))
      .select("features").collect().head
    assert(junk.isNullAt(0))
    val again = Multimodal.decodeImages(
      Multimodal.withMetadata(Multimodal.readBinary(spark, imgDir)), grid = 4)
      .select("path", "features").collect().map(r => (r.getString(0), r.getSeq[Float](1))).toMap
    df.select("path", "features").collect().foreach { r =>
      assert(again(r.getString(0)) === r.getSeq[Float](1))
    }
  }

  test("decoded features flow into the A10 similarity family") {
    val feats = Multimodal.decodeImages(
        Multimodal.withMetadata(Multimodal.readBinary(spark, imgDir)))
      .filter("image.decode_ok")
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("features").as("embedding"))
    // brute cosine top-k over the image features: the two solid
    // lossless encodings must be each other's nearest neighbor
    import org.apache.spark.sql.functions._
    val a = feats.filter(col("path").endsWith("solid.png"))
      .select(col("embedding").as("qe"))
    import graft.llm.Similarity.{cosine, qdot}
    val sims = feats.crossJoin(broadcast(a))
      .select(col("path"),
        cosine(qdot(col("embedding"), col("qe")),
          qdot(col("embedding"), col("embedding")),
          qdot(col("qe"), col("qe"))).as("cos"))
      .filter(!col("path").endsWith("solid.png"))
      .orderBy(col("cos").desc)
      .collect()
    assert(sims.head.getString(0).endsWith("solid.bmp") ||
      sims.head.getString(0).endsWith("solid.jpg"), sims.map(_.toString).mkString(","))
  }

  test("synthetic round trip: decode stats equal ImageGen's closed form (q122 contract)") {
    import spark.implicits._
    val idSeq = Seq(0L, 97L, 485L)
    val got = Multimodal.decodeImages(
        graft.sources.ImageGen.syntheticPng(idSeq.toDF("doc_id"), "doc_id"), "content")
      .select("doc_id", "image.decode_ok", "image.width", "image.height",
        "image.channels", "image.n_px", "image.luma_sum", "image.luma_bins")
      .collect().map(r => (r.getLong(0), r)).toMap
    for (id <- idSeq) {
      val w = 16 + (id % 17).toInt
      val h = 16 + (id % 13).toInt
      var sum = 0L
      val bins = collection.mutable.Set[Long]()
      for (y <- 0 until h; x <- 0 until w) {
        val l = 299L * ((7L * x + 13L * y + id) % 256) +
          587L * ((3L * x + 5L * y + 2 * id) % 256) +
          114L * ((x.toLong + y + 3 * id) % 256)
        sum += l
        bins += l / 1000
      }
      val r = got(id)
      assert(r.getBoolean(1), s"id=$id decode failed")
      assert(r.getInt(2) === w && r.getInt(3) === h && r.getInt(4) === 3, s"id=$id dims")
      assert(r.getLong(5) === w.toLong * h, s"id=$id n_px")
      assert(r.getLong(6) === sum, s"id=$id luma_sum: PNG round trip not lossless?")
      assert(r.getInt(7) === bins.size, s"id=$id luma_bins")
    }
  }

  test("WAV decode: stats equal AudioGen's closed form (q126 contract)") {
    import spark.implicits._
    val idSeq = Seq(0L, 89L, 445L)
    val got = Multimodal.decodeAudio(
        graft.sources.AudioGen.syntheticWav(idSeq.toDF("doc_id"), "doc_id"), "content")
      .select("doc_id", "audio.decode_ok", "audio.sample_rate", "audio.channels",
        "audio.n_samples", "audio.sq_sum", "audio.zero_crossings", "audio.peak")
      .collect().map(r => (r.getLong(0), r)).toMap
    for (id <- idSeq) {
      val n = graft.sources.AudioGen.nSamples(id)
      val samples = (0 until n).map(i => graft.sources.AudioGen.sample(id, i))
      val sq = samples.map(s => s.toLong * s).sum
      val zc = samples.sliding(2).count { case Seq(a, b) => (a >= 0) != (b >= 0) }
      val r = got(id)
      assert(r.getBoolean(1), s"id=$id decode failed")
      assert(r.getInt(2) === 8000 && r.getInt(3) === 1, s"id=$id format meta")
      assert(r.getLong(4) === n.toLong, s"id=$id n_samples")
      assert(r.getLong(5) === sq, s"id=$id sq_sum: PCM round trip not exact?")
      assert(r.getLong(6) === zc.toLong, s"id=$id zero_crossings")
      assert(r.getInt(7) === samples.map(math.abs).max, s"id=$id peak")
    }
  }

  test("WAV decode: corrupt and non-PCM16 payloads mark the row, never fail") {
    import spark.implicits._
    // truncated RIFF header + plain garbage + an 8-bit PCM wav
    val eightBit: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      bb.put("data".getBytes("US-ASCII")).putInt(4).put(Array[Byte](1, 2, 3, 4))
      bb.array()
    }
    val rows = Seq(
      (1L, "RIFF".getBytes("US-ASCII")),
      (2L, Array[Byte](0, 1, 2, 3, 4, 5)),
      (3L, eightBit))
    val got = Multimodal.decodeAudio(rows.toDF("doc_id", "content"), "content")
      .select("doc_id", "audio.decode_ok")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> false))
  }

  test("video seam: sampled-frame stats equal VideoGen's closed form (q130 contract)") {
    import spark.implicits._
    import graft.sources.VideoGen
    val idSeq = Seq(0L, 101L, 404L)
    val stride = 2
    val got = Multimodal.sampleVideoFrames(
        VideoGen.syntheticGvid(idSeq.toDF("doc_id"), "doc_id"),
        VideoGen.Codec, "content", frameStride = stride)
      .select("doc_id", "video.decode_ok", "video.width", "video.height",
        "video.fps", "video.n_frames", "video.n_sampled", "video.n_px",
        "video.luma_sum", "video.motion_abs")
      .collect().map(r => (r.getLong(0), r)).toMap
    for (id <- idSeq) {
      val w = VideoGen.width(id); val h = VideoGen.height(id)
      val nf = VideoGen.nFrames(id)
      val sampled = 0 until nf by stride
      def frameSum(f: Int): Long =
        (for (y <- 0 until h; x <- 0 until w) yield {
          val p = VideoGen.pixel(id, f, x, y)
          (299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) + 114L * (p & 0xFF))
        }).sum
      val sums = sampled.map(frameSum)
      val motion = sums.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }.sum
      val r = got(id)
      assert(r.getBoolean(1), s"id=$id decode failed")
      assert((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)) ===
        ((w, h, VideoGen.fps(id), nf)), s"id=$id container meta")
      assert(r.getLong(6) === sampled.size.toLong, s"id=$id n_sampled")
      assert(r.getLong(7) === sampled.size.toLong * w * h, s"id=$id n_px")
      assert(r.getLong(8) === sums.sum, s"id=$id luma_sum")
      assert(r.getLong(9) === motion, s"id=$id motion_abs")
    }
  }

  test("video seam: stride 1 samples every frame; static clip has zero motion") {
    import spark.implicits._
    import graft.sources.VideoGen
    val all = Multimodal.sampleVideoFrames(
        VideoGen.syntheticGvid(Seq(7L).toDF("doc_id"), "doc_id"),
        VideoGen.Codec, "content", frameStride = 1)
      .select("video.n_sampled", "video.n_frames").collect().head
    assert(all.getLong(0) === all.getInt(1).toLong)
    // a hand-built 2-frame clip with identical frames: motion must be 0
    val w = 3; val h = 2
    val bb = java.nio.ByteBuffer.allocate(20 + 2 * w * h * 3)
    bb.put("GVID".getBytes("US-ASCII")).putInt(w).putInt(h).putInt(10).putInt(2)
    for (_ <- 0 until 2; _ <- 0 until w * h) bb.put(50.toByte).put(60.toByte).put(70.toByte)
    val static = Multimodal.sampleVideoFrames(
        Seq((1L, bb.array())).toDF("doc_id", "content"),
        VideoGen.Codec, "content", frameStride = 1)
      .select("video.decode_ok", "video.motion_abs", "video.luma_sum").collect().head
    assert(static.getBoolean(0))
    assert(static.getLong(1) === 0L)
    assert(static.getLong(2) === 2L * w * h * (299L * 50 + 587L * 60 + 114L * 70))
  }

  test("video seam: bad magic, bad header, and truncation mark the row, never fail") {
    import spark.implicits._
    import graft.sources.VideoGen
    val good = VideoGen.render(5L)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val truncated = good.take(good.length - 7) // mid-frame cut
    val zeroDims = {
      val bb = java.nio.ByteBuffer.allocate(20)
      bb.put("GVID".getBytes("US-ASCII")).putInt(0).putInt(4).putInt(10).putInt(1)
      bb.array()
    }
    val rows = Seq((1L, badMagic), (2L, truncated), (3L, zeroDims),
      (4L, Array[Byte](1, 2)), (5L, good))
    // stride 1 so the truncated tail frame is actually sampled — a
    // cut inside an UNSAMPLED frame is invisible by design (the
    // sampler only touches frames 0, s, 2s, …)
    val got = Multimodal.sampleVideoFrames(
        rows.toDF("doc_id", "content"), VideoGen.Codec, "content", frameStride = 1)
      .select("doc_id", "video.decode_ok")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true))
  }

  test("video seam is codec-agnostic: a second binding drives the same sampler") {
    import spark.implicits._
    // a deliberately different container: "SOLO" + w + h + packed
    // RGB, exactly one solid frame — no frame array, no fps field.
    // Binding it proves sampleVideoFrames depends only on the trait,
    // not on GVID specifics (the production ffmpeg/JNI binding slots
    // in the same way).
    object SoloCodec extends Multimodal.VideoCodec {
      private val M = "SOLO".getBytes("US-ASCII")
      override def probe(bytes: Array[Byte]) = {
        if (bytes.length < 16 || !bytes.take(4).sameElements(M)) None
        else {
          val bb = java.nio.ByteBuffer.wrap(bytes, 4, 12)
          val w = bb.getInt; val h = bb.getInt
          if (w <= 0 || h <= 0) None
          else Some(Multimodal.VideoMeta(w, h, fps = 1, nFrames = 1))
        }
      }
      override def frame(bytes: Array[Byte], m: Multimodal.VideoMeta, idx: Int) =
        if (idx != 0) None
        else {
          val px = java.nio.ByteBuffer.wrap(bytes, 12, 4).getInt
          Some(Array.fill(m.width * m.height)(px & 0xFFFFFF))
        }
    }
    def solo(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.put("SOLO".getBytes("US-ASCII")).putInt(w).putInt(h).putInt(rgb)
      bb.array()
    }
    val rows = Seq((1L, solo(4, 3, (10 << 16) | (20 << 8) | 30)),
      (2L, graft.sources.VideoGen.render(9L))) // foreign format → marked row
    val got = Multimodal.sampleVideoFrames(
        rows.toDF("doc_id", "content"), SoloCodec, "content", frameStride = 1)
      .select("doc_id", "video.decode_ok", "video.n_px", "video.luma_sum",
        "video.motion_abs")
      .collect().map(r => (r.getLong(0), r)).toMap
    val ok = got(1L)
    assert(ok.getBoolean(1))
    assert(ok.getLong(2) === 12L)
    assert(ok.getLong(3) === 12L * (299 * 10 + 587 * 20 + 114 * 30))
    assert(ok.getLong(4) === 0L) // single frame: no motion
    assert(!got(2L).getBoolean(1), "GVID payload must not decode under SoloCodec")
  }

  test("gvid magic is sniffed in the scan projection") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Tuple1(graft.sources.VideoGen.render(3L))).toDF("content")
    assert(df.select(Multimodal.sniffFormat(col("content")).as("f"))
      .collect().head.getString(0) === "gvid")
  }
}

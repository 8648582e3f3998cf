package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata (north-star requirement). The whole path is
  * real: binaryFile source, magic-byte sniffing in the scan
  * projection, and a batched per-partition image decode built on the
  * JDK's `javax.imageio` (PNG/JPEG/GIF/BMP — no external
  * dependency), emitting dimensions, channel count, BT.601 luma
  * statistics, a 256-bin-histogram entropy, and a deterministic
  * grid-pooled luma feature vector usable with the A10 similarity
  * family.
  *
  * Scale notes: `binaryFile` splits by file, so parallelism = file
  * count; `maxPartitionBytes`/`filesMaxPartitionBytes` govern packing;
  * feature extraction is a per-partition batched pass (the Scala
  * analogue of `mapInPandas`) so decoder configuration is amortized
  * across a batch, not re-created per row, and one corrupt payload
  * marks its row (`decode_ok=false`) instead of failing the task —
  * the F1 skip contract extended to pixels.
  */
object Multimodal {

  /** S2: binary file source — (path, modificationTime, length,
    * content) per file.
    */
  def readBinary(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Real magic-byte container sniffing over the binary payload —
    * pure Column expressions, runs in the scan projection.
    */
  def sniffFormat(content: Column): Column = {
    val m4 = hex(substring(content, 1, 4))
    when(m4 === "89504E47", "png")
      .when(m4.startsWith("FFD8FF"), "jpeg")
      .when(m4 === "52494646", "riff") // wav/avi/webp share RIFF
      .when(m4 === "47494638", "gif")
      .when(m4 === "664C6143", "flac")
      .when(m4 === "47564944", "gvid") // the synthetic test-vector container
      .when(substring(content, 5, 4) === lit("ftyp".getBytes("UTF-8")), "mp4")
      .otherwise("unknown")
  }

  /** Typed multimodal record: payload + metadata struct. */
  def withMetadata(bin: DataFrame): DataFrame =
    bin.select(
      col("path"),
      col("content"),
      struct(
        sniffFormat(col("content")).as("format"),
        col("length").as("n_bytes"),
        xxhash64(col("content")).as("content_hash")).as("meta"))

  /** Schema of the decoded-image struct appended by [[decodeImages]].
    * Stats are nullable: a payload ImageIO can't decode yields
    * `decode_ok=false` with null stats, never a task failure.
    */
  val imageStruct: StructType = StructType(Seq(
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("luma_mean", DoubleType, nullable = true),
    StructField("luma_entropy", DoubleType, nullable = true),
    // exact-integer accumulators (luma_mean = luma_sum/(1000·n_px)):
    // the bit-portable form downstream SQL can re-derive and an
    // oracle can replay closed-form — see q122
    StructField("luma_sum", LongType, nullable = true),
    StructField("n_px", LongType, nullable = true),
    StructField("luma_bins", IntegerType, nullable = true)))

  private def round6(v: Double): Double = math.rint(v * 1e6) / 1e6

  private val failedImage: Row = Row(false, 0, 0, 0, null, null, null, null, null)

  /** Exact average-hash halves from the grid accumulators: bit `c`
    * (row-major cell order, c < min(64, grid²)) is set when cell
    * `c`'s mean luma exceeds the whole image's mean —
    * `gSum(c)·nPx > lumaSum·gCnt(c)` compared in BigInt so the bit
    * is exact at ANY image size (the cross-products overflow a long
    * past ~30 MP). Bits 0–31 pack into `lo`, 32–63 into `hi`; both
    * stay in the non-negative 32-bit range, which is what keeps the
    * oracle replay trivial (no sign-bit games in SQL — DuckDB builds
    * the same halves with HUGEINT cross-products and a CASE sum).
    * Classic aHash (average hash) — the perceptual fingerprint that
    * survives re-encoding, resizing, and small brightness shifts,
    * unlike the byte-level content hash.
    */
  private def ahashHalves(gSum: Array[Long], gCnt: Array[Long],
                          lumaSum: Long, nPx: Long): (Long, Long) = {
    val n = math.min(64, gSum.length)
    val bigN = BigInt(nPx)
    val bigL = BigInt(lumaSum)
    var hi = 0L
    var lo = 0L
    var c = 0
    while (c < n) {
      if (gCnt(c) > 0 && BigInt(gSum(c)) * bigN > bigL * gCnt(c)) {
        if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
      }
      c += 1
    }
    (hi, lo)
  }

  /** Decode one payload: dimensions + channel count from the codec,
    * BT.601 luma (299r+587g+114b, exact ×1000 integer accumulation —
    * bit-deterministic regardless of row or partition order), Shannon
    * entropy over the 256-bin luma histogram (bits), and a
    * `grid`×`grid` box-average luma pooling in [0,1] — the
    * resize/feature-extract step as one pass over the pixel rows.
    */
  private def decodeOne(bytes: Array[Byte], grid: Int)
      : (Row, Seq[Float], java.lang.Long, java.lang.Long) = {
    try {
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (bi == null || bi.getWidth <= 0 || bi.getHeight <= 0)
        (failedImage, null, null, null)
      else {
        val w = bi.getWidth
        val h = bi.getHeight
        val channels = bi.getColorModel.getNumComponents
        val hist = new Array[Long](256)
        val cells = grid * grid
        val gSum = new Array[Long](cells)
        val gCnt = new Array[Long](cells)
        var lumaSum = 0L
        val buf = new Array[Int](w)
        var y = 0
        while (y < h) {
          // getRGB converts any raster/palette layout to sRGB ARGB —
          // one row at a time keeps the buffer cache-resident
          bi.getRGB(0, y, w, 1, buf, 0, w)
          val gy = y.toLong * grid / h
          var x = 0
          while (x < w) {
            val p = buf(x)
            val lumaMilli = 299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)
            hist(lumaMilli / 1000) += 1
            lumaSum += lumaMilli
            val gi = (gy * grid + x.toLong * grid / w).toInt
            gSum(gi) += lumaMilli
            gCnt(gi) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val mean = lumaSum.toDouble / (1000.0 * n)
        var entropy = 0.0
        var i = 0
        while (i < 256) {
          if (hist(i) > 0) {
            val p = hist(i).toDouble / n
            entropy -= p * (math.log(p) / math.log(2.0))
          }
          i += 1
        }
        val feats = (0 until cells).map { c =>
          if (gCnt(c) == 0) 0f
          else (gSum(c).toDouble / (255000.0 * gCnt(c))).toFloat
        }
        var bins = 0
        i = 0
        while (i < 256) { if (hist(i) > 0) bins += 1; i += 1 }
        val (hh, hl) = ahashHalves(gSum, gCnt, lumaSum, n)
        (Row(true, w, h, channels, round6(mean), round6(entropy),
          lumaSum, n, bins), feats, Long.box(hh), Long.box(hl))
      }
    } catch {
      // corrupt/truncated payloads mark the row, never kill the task
      case _: Exception => (failedImage, null, null, null)
    }
  }

  /** Per-partition batched image decode (the mapInPandas analogue):
    * appends an `image` stats struct and a grid-pooled `features`
    * vector (array<float>, `grid`² dims, null when not decodable).
    * Rows process in `batchSize` chunks with per-partition codec
    * configuration (`ImageIO.setUseCache(false)` — no executor temp
    * files), so decoder setup is amortized across a batch. All
    * arithmetic is integer-accumulated, so the output is
    * bit-identical across partitionings — safe under the driver's
    * hash compare and across cluster re-runs.
    */
  def decodeImages(df: DataFrame,
                   contentCol: String = "content",
                   grid: Int = 4,
                   batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add(StructField("image", imageStruct, nullable = false))
      .add(StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
      // exact average-hash halves (bits 32–63 / 0–31 of the aHash
      // over min(64, grid²) cells) — null when not decodable
      .add(StructField("ahash_hi", LongType, nullable = true))
      .add(StructField("ahash_lo", LongType, nullable = true))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val (img, feats, hh, hl) = decodeOne(row.getAs[Array[Byte]](idx), grid)
          Row.fromSeq(row.toSeq :+ img :+ feats :+ hh :+ hl)
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Schema of the decoded-audio struct appended by [[decodeAudio]].
    * Same contract as [[imageStruct]]: undecodable payloads (or
    * non-PCM-16 encodings, which would break the exact-integer
    * stats) yield `decode_ok=false` with null stats, never a task
    * failure.
    */
  val audioStruct: StructType = StructType(Seq(
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    // exact-integer accumulators over channel 0 (mean_square =
    // sq_sum/n_samples) — bit-portable, oracle-replayable (q126)
    StructField("n_samples", LongType, nullable = true),
    StructField("sq_sum", LongType, nullable = true),
    StructField("zero_crossings", LongType, nullable = true),
    StructField("peak", IntegerType, nullable = true)))

  private val failedAudio: Row = Row(false, 0, 0, null, null, null, null)

  /** Decode one WAV payload via the JDK's `javax.sound.sampled` (no
    * external dependency): format metadata from the parser, then one
    * pass over channel-0 frames accumulating exact integers — energy
    * (Σ s²), sign changes (s≥0 flips), and peak |s|. Only
    * PCM-signed 16-bit is accepted; anything else (float PCM, µ-law,
    * 8/24-bit) marks the row, keeping every emitted stat exact.
    */
  private def decodeWavOne(bytes: Array[Byte])
      : (Row, java.lang.Long, java.lang.Long) = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) (failedAudio, null, null)
      else {
        val frameSize = fmt.getFrameSize
        val data = ais.readAllBytes()
        val nFrames = data.length / frameSize
        val big = fmt.isBigEndian
        var i = 0
        var sq = 0L
        var zc = 0L
        var peak = 0
        var prevNonNeg = false
        // per-window sign-flip counts for the zero-crossing
        // fingerprint: pair (i-1, i) belongs to window (i·64)/n
        val wz = new Array[Long](64)
        val wn = new Array[Long](64)
        while (i < nFrames) {
          val o = i * frameSize // channel 0 is the first sample of the frame
          val s =
            if (big) (data(o) << 8) | (data(o + 1) & 0xFF)
            else (data(o + 1) << 8) | (data(o) & 0xFF)
          sq += s.toLong * s
          val nonNeg = s >= 0
          if (i > 0) {
            val w = (i.toLong * 64 / nFrames).toInt
            wn(w) += 1
            if (nonNeg != prevNonNeg) { zc += 1; wz(w) += 1 }
          }
          prevNonNeg = nonNeg
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        // exact fingerprint bits: window w's crossing RATE above the
        // clip average — wz(w)·(n−1) > zc·wn(w), pure long arithmetic
        // (≤ 2^31 cross-products at any sane clip length; a 16-bit
        // mono hour is 2.3e8 pairs × counts ≤ pairs → < 2^63).
        // Amplitude-scale-invariant by construction (gain never
        // flips a sign), which is what byte hashes and energy stats
        // are not.
        var hi = 0L
        var lo = 0L
        val pairs = math.max(nFrames - 1, 0).toLong
        var w = 0
        while (w < 64) {
          if (wn(w) > 0 && wz(w) * pairs > zc * wn(w)) {
            if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
          }
          w += 1
        }
        (Row(true, fmt.getSampleRate.toInt, fmt.getChannels,
          nFrames.toLong, sq, zc, peak), Long.box(hi), Long.box(lo))
      }
    } catch {
      case _: Exception => (failedAudio, null, null)
    }
  }

  /** Per-partition batched audio decode — the audio twin of
    * [[decodeImages]]: appends an `audio` stats struct per row. All
    * stats are integer-accumulated in frame order, so output is
    * bit-identical across partitionings and re-runs.
    */
  def decodeAudio(df: DataFrame,
                  contentCol: String = "content",
                  batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("audio", audioStruct, nullable = false))
      // zero-crossing fingerprint halves (64 windows, bits 32–63 /
      // 0–31) — null when not decodable; see decodeWavOne
      .add(StructField("afp_hi", LongType, nullable = true))
      .add(StructField("afp_lo", LongType, nullable = true))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val (a, hh, hl) = decodeWavOne(row.getAs[Array[Byte]](idx))
          Row.fromSeq(row.toSeq :+ a :+ hh :+ hl)
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Container metadata a [[VideoCodec]] reports from a payload's
    * header, before any frame is decoded.
    */
  final case class VideoMeta(width: Int, height: Int, fps: Int, nFrames: Int)

  /** The video decode seam. The JDK ships no video codec, so unlike
    * the image (`javax.imageio`) and audio (`javax.sound.sampled`)
    * paths this is a pluggable interface: a production deployment
    * binds an external decoder (an ffmpeg/JNI wrapper on the executor
    * image) to this trait; the test-vector binding is
    * [[VideoGen.Codec]], a real parser for the deterministic GVID
    * container, so the Spark-side plumbing — schema, batching,
    * frame-stride sampling, corrupt-row contract — is exercised
    * end-to-end (q130) even though no third-party codec ships.
    * [[FfmpegCodec]] is the deployment-shaped binding: it shells out
    * to the ffmpeg CLI when present (FfmpegCodecSpec cancels cleanly
    * when it is not), proving the seam accepts a real codec unchanged.
    *
    * Implementations must be cheap to construct/serialize (one is
    * shipped per task) and `frame` must be safe to call repeatedly
    * on the same payload (the sampler calls it once per sampled
    * frame index).
    */
  trait VideoCodec extends Serializable {
    /** Parse container metadata; None = not this codec's format. */
    def probe(bytes: Array[Byte]): Option[VideoMeta]
    /** Decode frame `idx` (0-based) as packed 0xRRGGBB ints,
      * row-major. None = frame missing/corrupt (e.g. truncated
      * payload) — the caller marks the ROW failed, never the task.
      */
    def frame(bytes: Array[Byte], meta: VideoMeta, idx: Int): Option[Array[Int]]
  }

  /** Schema of the sampled-video struct appended by
    * [[sampleVideoFrames]]. Same contract as [[imageStruct]]:
    * unparseable or truncated payloads yield `decode_ok=false` with
    * null stats, never a task failure. Stats are exact integers over
    * the SAMPLED frames: `n_px`/`luma_sum` accumulate the BT.601
    * ×1000 luma across every sampled pixel, and `motion_abs` is
    * Σ|lumaSum(f) − lumaSum(prev sampled f)| — a codec-independent
    * inter-frame change measure (0 for a static clip), accumulated
    * in frame order so output is bit-identical across partitionings.
    */
  val videoStruct: StructType = StructType(Seq(
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_sampled", LongType, nullable = true),
    StructField("n_px", LongType, nullable = true),
    StructField("luma_sum", LongType, nullable = true),
    StructField("motion_abs", LongType, nullable = true)))

  private val failedVideo: Row = Row(false, 0, 0, 0, 0, null, null, null, null)

  private def sampleOne(codec: VideoCodec, bytes: Array[Byte], stride: Int)
      : (Row, java.lang.Long, java.lang.Long) = {
    try {
      codec.probe(bytes) match {
        case None => (failedVideo, null, null)
        case Some(m) =>
          var f = 0
          var nSampled = 0L
          var nPx = 0L
          var lumaSum = 0L
          var motion = 0L
          var prevFrameSum = -1L
          var ok = true
          // time-averaged spatial grid for the video fingerprint:
          // 8×8 cells over each frame, luma accumulated across all
          // SAMPLED frames — the aHash construction applied to the
          // clip's time-average image
          val gSum = new Array[Long](64)
          val gCnt = new Array[Long](64)
          while (ok && f < m.nFrames) {
            codec.frame(bytes, m, f) match {
              case None => ok = false // truncated mid-stream: whole row fails
              case Some(px) =>
                var s = 0L
                var i = 0
                while (i < px.length) {
                  val p = px(i)
                  val l = 299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)
                  s += l
                  val x = i % m.width
                  val y = i / m.width
                  val gi = (y.toLong * 8 / m.height * 8 + x.toLong * 8 / m.width).toInt
                  gSum(gi) += l
                  gCnt(gi) += 1
                  i += 1
                }
                if (prevFrameSum >= 0) motion += math.abs(s - prevFrameSum)
                prevFrameSum = s
                lumaSum += s
                nPx += px.length
                nSampled += 1
            }
            f += stride
          }
          if (!ok) (failedVideo, null, null)
          else {
            val (hh, hl) = ahashHalves(gSum, gCnt, lumaSum, math.max(nPx, 1L))
            (Row(true, m.width, m.height, m.fps, m.nFrames,
              nSampled, nPx, lumaSum, motion), Long.box(hh), Long.box(hl))
          }
      }
    } catch {
      case _: Exception => (failedVideo, null, null)
    }
  }

  /** Per-partition batched frame sampling — the video member of the
    * [[decodeImages]]/[[decodeAudio]] family: decodes every
    * `frameStride`-th frame (0, s, 2s, …) through the pluggable
    * [[VideoCodec]] and appends a `video` stats struct per row.
    * Sampling-not-exhaustive is the honest production shape: at
    * 100 TB nobody decodes every frame of every clip; the stride is
    * the knob, and cost is (frames/stride)·pixels per row with no
    * shuffle. Corrupt or truncated payloads mark the row
    * (`decode_ok=false`), extending the F1 skip contract to video.
    */
  def sampleVideoFrames(df: DataFrame,
                        codec: VideoCodec,
                        contentCol: String = "content",
                        frameStride: Int = 2,
                        batchSize: Int = 64): DataFrame = {
    require(frameStride >= 1, s"frameStride must be >= 1, got $frameStride")
    val outSchema = df.schema.add(StructField("video", videoStruct, nullable = false))
      // time-averaged spatial aHash halves over the sampled frames
      // (the q157 video fingerprint) — null when not decodable
      .add(StructField("vfp_hi", LongType, nullable = true))
      .add(StructField("vfp_lo", LongType, nullable = true))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val (v, hh, hl) = sampleOne(codec, row.getAs[Array[Byte]](idx), frameStride)
          Row.fromSeq(row.toSeq :+ v :+ hh :+ hl)
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }
}

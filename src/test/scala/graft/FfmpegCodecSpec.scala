package graft

import graft.sources.{FfmpegCodec, Multimodal}
import java.nio.file.{Files, Paths}

/** The ffmpeg-CLI binding of the video seam — exercised end to end
  * when `ffmpeg`/`ffprobe` are on PATH, cancelled cleanly otherwise
  * (the sandbox ships no codec; a deployment image does). The
  * synthetic clip comes from ffmpeg itself (lavfi `testsrc` →
  * yuv4mpegpipe — raw container, no external encoder involved), so
  * the test is self-contained wherever the binaries exist.
  */
class FfmpegCodecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val present = FfmpegCodec.available

  private def synthClip(path: String, frames: Int, w: Int, h: Int,
                        fps: Int): Boolean =
    try {
      val p = new ProcessBuilder("ffmpeg", "-v", "error",
        "-f", "lavfi", "-i", s"testsrc=size=${w}x$h:rate=$fps",
        "-frames:v", frames.toString, "-pix_fmt", "yuv420p",
        "-f", "yuv4mpegpipe", "-y", path)
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  test("ffmpeg binding: probe + frame decode + full sampler path") {
    assume(present, "ffmpeg/ffprobe not on PATH — binding skipped")
    val dir = tmpDir("ffv")
    val clip = dir + "/clip.y4m"
    assume(synthClip(clip, frames = 10, w = 64, h = 48, fps = 10),
      "ffmpeg could not synthesize the lavfi test clip")
    val bytes = Files.readAllBytes(Paths.get(clip))
    val codec = new FfmpegCodec()

    val meta = codec.probe(bytes)
    assert(meta === Some(Multimodal.VideoMeta(64, 48, 10, 10)))

    val f0 = codec.frame(bytes, meta.get, 0)
    assert(f0.exists(_.length === 64 * 48), "frame 0 decodes to w*h pixels")
    assert(codec.frame(bytes, meta.get, 10) === None, "past-end frame is None")

    // the sampler path, unchanged from the GVID binding: good row
    // gets stats, garbage row is marked — the F1 contract through a
    // REAL codec
    val rows = Multimodal.sampleVideoFrames(
        Seq((1L, bytes), (2L, "not a video".getBytes("UTF-8")))
          .toDF("doc_id", "content"),
        codec, "content", frameStride = 2)
      .select("doc_id", "video.decode_ok", "video.width", "video.height",
        "video.fps", "video.n_frames", "video.n_sampled", "video.n_px",
        "video.luma_sum")
      .collect().map(r => r.getLong(0) -> r).toMap
    val good = rows(1L)
    assert(good.getBoolean(1))
    assert((good.getInt(2), good.getInt(3), good.getInt(4), good.getInt(5)) ===
      ((64, 48, 10, 10)))
    assert(good.getLong(6) === 5L, "stride 2 over 10 frames samples 5")
    assert(good.getLong(7) === 5L * 64 * 48, "n_px = sampled * w * h")
    assert(good.getLong(8) > 0L, "testsrc frames are not black")
    val bad = rows(2L)
    assert(!bad.getBoolean(1), "garbage payload marks the row")
  }

  test("ffmpeg binding: probe rejects non-video bytes") {
    assume(present, "ffmpeg/ffprobe not on PATH — binding skipped")
    val codec = new FfmpegCodec()
    assert(codec.probe("GVID but not really".getBytes("UTF-8")) === None)
    assert(codec.probe(Array.empty[Byte]) === None)
  }

  test("binding availability probe never throws, even with bogus binaries") {
    // the `available` gate and a misconfigured binary path must both
    // degrade to false/None, not an exception — runs everywhere
    val missing = new FfmpegCodec("definitely-not-ffprobe", "definitely-not-ffmpeg")
    assert(missing.probe(Array[Byte](1, 2, 3)) === None)
    assert(missing.frame(Array[Byte](1, 2, 3),
      Multimodal.VideoMeta(2, 2, 1, 1), 0) === None)
  }
}

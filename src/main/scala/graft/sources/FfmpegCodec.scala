package graft.sources

import java.nio.file.{Files, Path}

/** Real-codec [[Multimodal.VideoCodec]] binding: shells out to the
  * ffmpeg CLI (`ffprobe` for container metadata, `ffmpeg` for frame
  * decode to raw RGB24) when the binaries are on the executor image's
  * PATH. This is the deployment-shaped third binding of the video
  * seam — the GVID parser ([[VideoGen.Codec]]) and the spec-level
  * alternate container prove codec-agnosticism with synthetic
  * formats; this one proves the SAME trait absorbs an actual
  * production decoder without touching [[Multimodal.sampleVideoFrames]]
  * (schema, batching, stride, corrupt-row contract all unchanged).
  *
  * The sandbox ships no ffmpeg, so FfmpegCodecSpec `assume`s the
  * binaries and cancels cleanly when absent; on a host with ffmpeg it
  * synthesizes a clip (lavfi `testsrc` → yuv4mpegpipe, no external
  * encoder needed) and drives the full sampler path.
  *
  * Mechanics: each call materializes the payload to a temp file
  * (ffmpeg's demuxers need seekable input for most containers) and
  * invokes the CLI with no shell in between (ProcessBuilder arg
  * vector — content never passes through a shell parser). Every
  * failure mode — missing binary, non-zero exit, short output —
  * returns None, which [[Multimodal.sampleOne]] turns into a marked
  * row (`decode_ok=false`), never a task failure: the F1 contract.
  * Per-call temp-file cost is the simple-and-correct baseline; a
  * throughput deployment would decode all sampled frames of a
  * payload in ONE process invocation (`select='not(mod(n,s))'`) —
  * the seam leaves that optimization inside the codec, invisible to
  * the sampler.
  */
final class FfmpegCodec(ffprobeBin: String = "ffprobe",
                        ffmpegBin: String = "ffmpeg")
    extends Multimodal.VideoCodec {

  private def withTemp[T](bytes: Array[Byte])(f: Path => Option[T]): Option[T] = {
    val tmp = Files.createTempFile("graft-ffv", ".bin")
    try { Files.write(tmp, bytes); f(tmp) }
    catch { case _: Exception => None }
    finally Files.deleteIfExists(tmp)
  }

  /** Run a CLI command; Some(stdout) on exit 0, None otherwise. */
  private def run(cmd: Seq[String]): Option[Array[Byte]] =
    try {
      val p = new ProcessBuilder(cmd: _*)
        .redirectError(ProcessBuilder.Redirect.DISCARD).start()
      p.getOutputStream.close()
      val out = p.getInputStream.readAllBytes()
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Exception => None }

  /** "30000/1001" → 30 (nearest-int rational); None on junk. */
  private def parseFps(s: String): Option[Int] = s.split('/') match {
    case Array(n, d) =>
      for (nn <- n.toLongOption; dd <- d.toLongOption if dd > 0)
        yield ((nn + dd / 2) / dd).toInt
    case Array(n) => n.toLongOption.map(_.toInt)
    case _ => None
  }

  override def probe(bytes: Array[Byte]): Option[Multimodal.VideoMeta] =
    withTemp(bytes) { tmp =>
      // -count_frames decodes the stream for an exact frame count —
      // nb_frames alone is absent from many containers' headers;
      // key=value output (`default` writer) is field-order-stable
      run(Seq(ffprobeBin, "-v", "error", "-select_streams", "v:0",
        "-count_frames", "-show_entries",
        "stream=width,height,r_frame_rate,nb_read_frames",
        "-of", "default=noprint_wrappers=1", tmp.toString)).flatMap { out =>
        val kv = new String(out, "UTF-8").linesIterator.flatMap { line =>
          line.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }.toMap
        for {
          w <- kv.get("width").flatMap(_.toIntOption) if w > 0
          h <- kv.get("height").flatMap(_.toIntOption) if h > 0
          fps <- kv.get("r_frame_rate").flatMap(parseFps) if fps > 0
          nf <- kv.get("nb_read_frames").flatMap(_.toIntOption) if nf > 0
          if w.toLong * h * 3 <= Int.MaxValue / math.max(nf, 1)
        } yield Multimodal.VideoMeta(w, h, fps, nf)
      }
    }

  override def frame(bytes: Array[Byte], meta: Multimodal.VideoMeta,
                     idx: Int): Option[Array[Int]] = {
    if (idx < 0 || idx >= meta.nFrames) return None
    withTemp(bytes) { tmp =>
      // `\,` keeps the comma inside the filter expression (the -vf
      // string's own parser, not a shell, would split on it)
      run(Seq(ffmpegBin, "-v", "error", "-i", tmp.toString,
        "-vf", s"select=eq(n\\,$idx)", "-frames:v", "1",
        "-f", "rawvideo", "-pix_fmt", "rgb24", "-")).flatMap { raw =>
        val expect = meta.width * meta.height * 3
        if (raw.length != expect) None
        else {
          val out = new Array[Int](meta.width * meta.height)
          var i = 0
          var o = 0
          while (i < out.length) {
            out(i) = ((raw(o) & 0xFF) << 16) | ((raw(o + 1) & 0xFF) << 8) |
              (raw(o + 2) & 0xFF)
            i += 1
            o += 3
          }
          Some(out)
        }
      }
    }
  }
}

object FfmpegCodec {
  /** True when both CLI binaries respond on this host's PATH —
    * FfmpegCodecSpec's `assume` gate.
    */
  def available: Boolean = Seq("ffprobe", "ffmpeg").forall { bin =>
    try {
      val p = new ProcessBuilder(bin, "-version")
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: Exception => false }
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.llm.ImageDedup
import graft.sources.{ImageGen, Multimodal}

/** Perceptual-fingerprint dedup across the modality triad: exact
  * aHash / zero-crossing / time-average bits, perturbation
  * invariance, pigeonhole recall, incremental and streaming
  * contracts, corrupt-payload skip.
  */
class FingerprintDedupSpec extends SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  private def decode(df: org.apache.spark.sql.DataFrame) =
    Multimodal.decodeImages(df, "content", grid = 8)

  test("aHash is identical across partitionings and re-decodes") {
    val imgs = ImageGen.syntheticPng(ids(12), "doc_id")
    val a = decode(imgs).select("doc_id", "ahash_hi", "ahash_lo")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = decode(imgs.repartition(7)).select("doc_id", "ahash_hi", "ahash_lo")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a === b)
    // halves stay in the non-negative 32-bit range (the oracle's
    // no-sign-bit contract)
    a.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi <= 0xFFFFFFFFL)
      assert(lo >= 0L && lo <= 0xFFFFFFFFL)
    }
  }

  test("brightness-perturbed re-render lands within Hamming 7 of the original") {
    val base = ImageGen.syntheticPng(ids(10), "doc_id")
    val pert = ImageGen.syntheticPng(ids(10), "doc_id", delta = 2)
      .select((col("doc_id") + 1000L).as("doc_id"), col("content"))
    // bytes differ (the exact-dedup view), hashes agree (the
    // perceptual view)
    val bBytes = base.select("doc_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val pBytes = pert.select("doc_id", "content").collect()
      .map(r => r.getLong(0) - 1000L -> r.getAs[Array[Byte]](1)).toMap
    assert((0L until 10L).forall(i => !java.util.Arrays.equals(bBytes(i), pBytes(i))))
    val pairs = ImageDedup.phashNearDups(
        decode(base.unionByName(pert)), "doc_id", maxDist = 7)
      .filter(col("id_j") - col("id_i") === 1000L)
      .collect().map(r => r.getLong(0)).toSet
    assert(pairs === (0L until 10L).toSet,
      s"every planted variant must pair with its original, got $pairs")
  }

  test("pigeonhole band join equals all-pairs Hamming filter") {
    val dec = decode(ImageGen.syntheticPng(ids(40), "doc_id"))
    val sig = dec.select(col("doc_id"), col("ahash_hi"), col("ahash_lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (for {
      (i, hi1, lo1) <- sig; (j, hi2, lo2) <- sig if i < j
      d = java.lang.Long.bitCount(hi1 ^ hi2) + java.lang.Long.bitCount(lo1 ^ lo2)
      if d <= 7
    } yield (i, j, d.toLong)).toSet
    val got = ImageDedup.phashNearDups(dec, "doc_id", maxDist = 7)
      .select(col("id_i"), col("id_j"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("corrupt payloads decode to null hashes and are skipped, never thrown") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val junk = spark.createDataFrame(
      java.util.Arrays.asList(Row(900L, Array[Byte](1, 2, 3, 4))), schema)
    val dec = decode(ImageGen.syntheticPng(ids(5), "doc_id").unionByName(junk))
    val bad = dec.filter(col("doc_id") === 900L)
      .select("image.decode_ok", "ahash_hi", "ahash_lo").collect().head
    assert(bad.getBoolean(0) === false)
    assert(bad.isNullAt(1) && bad.isNullAt(2))
    // the pair join runs clean over the mixed frame
    val n = ImageDedup.phashNearDups(dec, "doc_id", maxDist = 7).count()
    assert(n >= 0L)
  }

  test("audio fingerprint is amplitude-scale-invariant; energy is not") {
    import graft.sources.AudioGen
    val base = AudioGen.syntheticWav(ids(8), "doc_id")
    val loud = AudioGen.syntheticWav(ids(8), "doc_id", gain = 4)
    def fp(df: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeAudio(df, "content")
        .select("doc_id", "afp_hi", "afp_lo", "audio.sq_sum")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val a = fp(base)
    val b = fp(loud)
    (0L until 8L).foreach { i =>
      assert((a(i)._1, a(i)._2) === (b(i)._1, b(i)._2),
        s"fingerprint must survive gain, clip $i")
      assert(b(i)._3 === 16L * a(i)._3, s"energy scales 16x at gain 4, clip $i")
    }
  }

  test("audio near-dup pairing finds every planted re-master") {
    import graft.sources.AudioGen
    val base = AudioGen.syntheticWav(ids(9), "doc_id")
    val loud = AudioGen.syntheticWav(ids(9), "doc_id", gain = 2)
      .select((col("doc_id") + 500L).as("doc_id"), col("content"))
    val dec = Multimodal.decodeAudio(base.unionByName(loud), "content")
    val pairs = graft.llm.SigDedup.bandedNearDups(
        dec, "doc_id", "afp_hi", "afp_lo", maxDist = 7)
      .filter(col("id_j") - col("id_i") === 500L)
      .collect().map(r => r.getLong(0)).toSet
    assert(pairs === (0L until 9L).toSet)
  }

  test("video fingerprint survives brightness shift; planted re-encodes pair up") {
    import graft.sources.VideoGen
    val base = VideoGen.syntheticGvid(ids(8), "doc_id")
    val shifted = VideoGen.syntheticGvid(ids(8), "doc_id", delta = 3)
      .select((col("doc_id") + 700L).as("doc_id"), col("content"))
    val dec = Multimodal.sampleVideoFrames(
      base.unionByName(shifted), VideoGen.Codec, "content", frameStride = 2)
    val planted = graft.llm.SigDedup.bandedNearDups(
        dec, "doc_id", "vfp_hi", "vfp_lo", maxDist = 7)
      .filter(col("id_j") - col("id_i") === 700L)
      .collect().map(r => r.getLong(0)).toSet
    assert(planted === (0L until 8L).toSet)
    // halves stay in the non-negative 32-bit range
    dec.select("vfp_hi", "vfp_lo").collect().foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 0xFFFFFFFFL)
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 0xFFFFFFFFL)
    }
  }

  test("truncated video payloads yield null fingerprints") {
    import graft.sources.VideoGen
    val whole = VideoGen.render(5L)
    // cut deep enough to truncate a SAMPLED frame (stride 2 skips
    // odd frames, so clipping only the tail frame is legitimately
    // not a decode failure): drop the last two frames plus a bit
    val frameBytes = VideoGen.width(5L) * VideoGen.height(5L) * 3
    val cut = java.util.Arrays.copyOf(whole, whole.length - 2 * frameBytes - 1)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(5L, cut)), schema)
    val r = Multimodal.sampleVideoFrames(df, VideoGen.Codec, "content")
      .select("video.decode_ok", "vfp_hi", "vfp_lo").collect().head
    assert(r.getBoolean(0) === false)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("incremental pairing equals the full pair graph restricted to fresh") {
    val base = decode(ImageGen.syntheticPng(ids(30), "doc_id"))
      .select("doc_id", "ahash_hi", "ahash_lo")
    val fresh = decode(ImageGen.syntheticPng(ids(30), "doc_id", delta = 2)
        .select((col("doc_id") + 1000L).as("doc_id"), col("content")))
      .select("doc_id", "ahash_hi", "ahash_lo")
    val full = ImageDedup.phashNearDups(
        base.unionByName(fresh), "doc_id", maxDist = 7)
      .filter(col("id_j") >= 1000L) // fresh-touching (fresh ids are +1000)
      .select(col("id_i"), col("id_j"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = graft.llm.SigDedup.incrementalNearDups(
        base, fresh, "doc_id", "ahash_hi", "ahash_lo", maxDist = 7)
      .select(col("id_i"), col("id_j"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("streaming phash dedup: batch slicing does not change the pair union") {
    import graft.streaming.Ingest
    val base = ImageGen.syntheticPng(ids(20), "doc_id")
    val pert = ImageGen.syntheticPng(ids(20), "doc_id", delta = 2)
      .select((col("doc_id") + 1000L).as("doc_id"), col("content"))
    def run(slices: Seq[org.apache.spark.sql.DataFrame], tag: String) = {
      val d = tmpDir(s"sphash_$tag")
      Ingest.stageOrderedParquet(spark, slices, s"$d/staging")
      Ingest.phashDedupAvailableNow(spark, s"$d/staging", s"$d/chk",
        s"$d/store", s"$d/out", maxFilesPerTrigger = Some(1))
      spark.read.parquet(s"$d/out")
        .select(col("id_i"), col("id_j"), col("dist").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val threeBatches = run(Seq(base,
      pert.filter(col("doc_id") % 2 === 0),
      pert.filter(col("doc_id") % 2 =!= 0)), "a")
    // a long stream must not accrete per-batch cached plans: every
    // trigger's signature cache and barrier caches are dropped at
    // batch end
    assert(spark.sparkContext.getPersistentRDDs.size <= cachedBefore,
      "streaming batches leaked cached plans")
    val oneBatch = run(Seq(base.unionByName(pert)), "b")
    assert(threeBatches === oneBatch)
    // and both equal the one-shot batch dedup
    val oneShot = ImageDedup.phashNearDups(
        decode(base.unionByName(pert)), "doc_id", maxDist = 7)
      .select(col("id_i"), col("id_j"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(threeBatches === oneShot)
    assert(oneShot.nonEmpty)
  }

  test("streaming phash dedup: a full replay over the same sinks is idempotent") {
    import graft.streaming.Ingest
    val d = tmpDir("sphash_replay")
    val base = ImageGen.syntheticPng(ids(12), "doc_id")
    val pert = ImageGen.syntheticPng(ids(12), "doc_id", delta = 2)
      .select((col("doc_id") + 1000L).as("doc_id"), col("content"))
    Ingest.stageOrderedParquet(spark, Seq(base, pert), s"$d/staging")
    def run(chk: String) = {
      Ingest.phashDedupAvailableNow(spark, s"$d/staging", chk,
        s"$d/store", s"$d/out", maxFilesPerTrigger = Some(1))
      spark.read.parquet(s"$d/out")
        .select(col("id_i"), col("id_j"), col("dist").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val first = run(s"$d/chk1")
    // a fresh checkpoint replays every batch against the ALREADY
    // POPULATED store and out sinks — the batch_id partition
    // overwrite + current-batch store exclusion must make the
    // replay a no-op, not a duplicate-pair explosion
    val second = run(s"$d/chk2")
    assert(first === second)
    assert(first.nonEmpty)
  }

  test("identical-signature pile-up stays linear: 10k same-aHash files never go quadratic through the bands") {
    import graft.llm.SigDedup
    // real-image grounding: solid-color thumbnails — endemic in
    // crawls — all collapse to ONE aHash (every cell mean equals the
    // global mean), the worst case the banded join must survive
    val solid = (0 until 3).map { i =>
      val bi = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) bi.setRGB(x, y, 0x808080 + i)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", out)
      Row(i.toLong, out.toByteArray)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val solidSigs = decode(spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(solid).asJava, schema))
      .select("ahash_hi", "ahash_lo").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(solidSigs.distinct.length === 1,
      "solid thumbnails must share one aHash — the pile-up is real, not synthetic")
    // the pile-up at scale: 10k rows carrying that one signature plus
    // a spread tail. The old per-band member join emitted 8·(n+k)²
    // ≈ 800M rows here; the distinct-signature design must keep total
    // join output within a whisker of the OUTPUT-inherent C(n,2)
    val n = 10000L
    val (hotHi, hotLo) = solidSigs.head
    val hot = spark.range(n).select(col("id").as("doc_id"),
      lit(hotHi).as("hi"), lit(hotLo).as("lo"))
    val spreadTail = spark.range(20).select((col("id") + 100000L).as("doc_id"),
      (col("id") * 255L + 7L).as("hi"), (col("id") * 1021L + 9L).as("lo"))
    val pairs = SigDedup.bandedNearDups(
      hot.unionByName(spreadTail), "doc_id", "hi", "lo", maxDist = 7)
    val (cnt, joinOut) = countWithJoinOutput(pairs)
    assert(cnt >= n * (n - 1) / 2, "every identical-signature pair must be emitted")
    assert(joinOut <= n * (n - 1) / 2 + 200L * n,
      s"joins emitted $joinOut rows — the band join is quadratic in the hot group again")
    // the capped form excludes the degenerate group entirely — and
    // reports it (no silent caps)
    val capped = SigDedup.bandedNearDups(
        hot.unionByName(spreadTail), "doc_id", "hi", "lo",
        maxDist = 7, maxSigFreq = 100)
      .filter(col("id_j") < 100000L) // hot-group-internal pairs
    assert(capped.count() === 0L)
    val dropped = SigDedup.sigGroupSizes(
        hot.unionByName(spreadTail), "doc_id", "hi", "lo")
      .filter(col("m") > 100).collect()
    assert(dropped.length === 1 && dropped.head.getAs[Long]("m") === n)
  }

  test("incremental pairing with a hot store group scans no store×store pairs") {
    import graft.llm.SigDedup
    // 5k store rows share one signature; the fresh batch carries 10
    // spread rows plus 5 members of the hot group. Store×store dist-0
    // pairs (C(5000,2) ≈ 12.5M) must never be materialized — join
    // output stays proportional to the fresh-touching pair count.
    val m = 5000L
    val store = spark.range(m).select(col("id").as("doc_id"),
      lit(0x5A5AL).as("hi"), lit(0xA5A5L).as("lo"))
    val fresh = spark.range(5).select((col("id") + 100000L).as("doc_id"),
        lit(0x5A5AL).as("hi"), lit(0xA5A5L).as("lo"))
      .unionByName(spark.range(10).select((col("id") + 200000L).as("doc_id"),
        (col("id") * 511L + 3L).as("hi"), (col("id") * 127L + 11L).as("lo")))
    val inc = SigDedup.incrementalNearDups(
      store, fresh, "doc_id", "hi", "lo", maxDist = 7)
    val (cnt, joinOut) = countWithJoinOutput(inc)
    // 5 fresh hot members × 5000 store + C(5,2) fresh×fresh (plus
    // whatever organic near-collisions the spread tail contributes)
    assert(cnt >= 5L * m + 10L)
    assert(inc.filter(col("id_j") < 200000L).count() === 5L * m + 10L)
    assert(joinOut <= 4L * (5L * m) + 1000L,
      s"joins emitted $joinOut rows — store×store leaked into the expansion")
  }

  test("non-PCM / corrupt audio payloads yield null fingerprints") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val junk = spark.createDataFrame(
      java.util.Arrays.asList(Row(7L, "RIFFgarbage".getBytes("US-ASCII"))), schema)
    val r = Multimodal.decodeAudio(junk, "content")
      .select("audio.decode_ok", "afp_hi", "afp_lo").collect().head
    assert(r.getBoolean(0) === false)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}

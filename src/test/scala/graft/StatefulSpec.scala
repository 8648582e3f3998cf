package graft

import graft.streaming.Stateful
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** flatMapGroupsWithState: state accumulates across micro-batches and
  * survives a query restart through the checkpoint. (foreachBatch
  * sink — the memory sink cannot recover from a checkpoint.)
  */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("running per-user stats accumulate across restarted batches") {
    val base = tmpDir("stateful")
    val in = base + "/in"; val chk = base + "/chk"
    Files.createDirectories(Paths.get(in))

    def run(): Seq[(Long, Long, Double)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, value DOUBLE")
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = Stateful.runningUserStats(stream)
        .writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.UserAgg], _: Long) =>
          buf.synchronized {
            buf ++= batch.collect().map(u => (u.user_id, u.n_events, u.total))
          }
          ()
        }
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // last emitted row per user across this run's batches
      buf.groupBy(_._1).map(_._2.last).toSeq.sortBy(_._1)
    }

    Seq((1L, 10.0), (1L, 5.0), (2L, 1.0)).toDF("user_id", "value")
      .write.mode("append").parquet(in)
    assert(run() === Seq((1L, 2L, 15.0), (2L, 1L, 1.0)))

    // second file, restarted query, same checkpoint → state restored
    // and only the new file is processed
    Seq((1L, 2.0), (3L, 7.0)).toDF("user_id", "value")
      .write.mode("append").parquet(in)
    assert(run() === Seq((1L, 3L, 17.0), (3L, 1L, 7.0)))
  }

  test("state TTL evicts idle keys via processing-time timeout") {
    // ProcessingTimeTimeout makes the stateful operator request a
    // batch every trigger (to fire timers), so AvailableNow would
    // never terminate — the TTL path needs a continuous trigger,
    // stopped explicitly. (That's also why TTL is opt-in.)
    val base = tmpDir("ttl")
    val in = base + "/in"; val chk = base + "/chk"
    Files.createDirectories(Paths.get(in))
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Boolean)]
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, value DOUBLE")
    val stream = spark.readStream.schema(schema).parquet(in)
    val q = Stateful.runningUserStats(stream, ttl = Some("50 milliseconds"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.UserAgg], _: Long) =>
        buf.synchronized {
          buf ++= batch.collect().map(u => (u.user_id, u.n_events, u.total, u.expired))
        }
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    def awaitRow(row: (Long, Long, Double, Boolean)): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!buf.synchronized(buf.contains(row))) {
        assert(System.nanoTime() < deadline,
          s"timed out waiting for $row in ${buf.synchronized(buf.toList)}")
        Thread.sleep(50)
      }
    }

    try {
      Seq((1L, 10.0)).toDF("user_id", "value").write.mode("append").parquet(in)
      awaitRow((1L, 1L, 10.0, false))
      // idle past TTL → the timer batch evicts with a tombstone
      awaitRow((1L, 1L, 10.0, true))
      // a re-appearing evicted key restarts from zero — the bounded-
      // state trade, asserted so it stays deliberate
      Seq((1L, 5.0)).toDF("user_id", "value").write.mode("append").parquet(in)
      awaitRow((1L, 1L, 5.0, false))
    } finally q.stop()
  }

  test("spike alerts match the batch fold and are batch-slicing invariant") {
    // readings: key 1 flat then a spike; key 2 always flat
    val readings = Seq(
      (1L, 1L, 1000L), (1L, 2L, 1100L), (1L, 3L, 900L),
      (1L, 4L, 5000L), // > 1.5 * mean(1000,1100,900)=1000 -> spike
      (1L, 5L, 1000L), // baseline now includes the spike; 1000 is quiet
      (2L, 1L, 500L), (2L, 2L, 600L))
    // reference: plain Scala fold of the same contract
    val expected = readings.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      var n = 0L; var sum = 0L
      rs.sortBy(_._2).map { case (_, seq, cents) =>
        val mean = if (n > 0) sum.toDouble / n else 0.0
        val row = (k, seq, cents, n, mean, n > 0 && cents > 1.5 * mean)
        n += 1; sum += cents
        row
      }
    }.sortBy(r => (r._1, r._2))
    assert(expected.count(_._6) === 1, "construction: exactly the one planted spike")

    def run(slices: Seq[Seq[(Long, Long, Long)]]): Seq[(Long, Long, Long, Long, Double, Boolean)] = {
      val base = tmpDir("spikes")
      val in = base + "/in"; val chk = base + "/chk"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double, Boolean)]
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "key BIGINT, seq BIGINT, cents BIGINT")
      slices.foreach { slice =>
        slice.toDF("key", "seq", "cents").write.mode("append").parquet(in)
        val q = Stateful.spikeAlerts(spark.readStream.schema(schema).parquet(in))
          .writeStream.outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[Stateful.Alert], _: Long) =>
            buf.synchronized {
              buf ++= b.collect().map(a =>
                (a.key, a.seq, a.cents, a.n_baseline, a.baseline_mean_cents, a.is_spike))
            }
            ()
          }
          .option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      buf.sortBy(r => (r._1, r._2)).toSeq
    }

    // one batch vs. three restarted batches: identical alerts, both
    // equal to the reference fold (state restored via checkpoint)
    val oneShot = run(Seq(readings))
    val sliced = run(Seq(readings.take(3), readings.slice(3, 5), readings.drop(5)))
    assert(oneShot === expected)
    assert(sliced === expected)
  }

  test("streaming CDC state equals the batch replay under any slicing") {
    val rnd = new scala.util.Random(17)
    // random upsert/delete log over 12 keys; versions drawn small so
    // same-key conflicts occur and exercise the shared tie-break
    val log = (1L to 120L).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong,
        if (rnd.nextDouble() < 0.25) "D" else "U", s"p$i")
    }
    // batch truth: etl.Cdc over the full log, tombstones retained
    val batch = graft.etl.Cdc.state(
        log.toDF("k", "ver", "op", "payload"), Seq("k"), Seq("ver"))
      .select("k", "ver", "op", "payload")
      .as[(Long, Long, String, String)].collect().toSet

    def run(slices: Seq[Seq[(Long, Long, String, String)]]): Set[(Long, Long, String, String)] = {
      val base = tmpDir("cdc")
      val in = base + "/in"; val chk = base + "/chk"
      Files.createDirectories(Paths.get(in))
      // last emitted resolved row per key wins (Update-mode stream)
      val last = scala.collection.mutable.Map.empty[Long, (Long, Long, String, String)]
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, ver BIGINT, op STRING, payload STRING")
      slices.foreach { slice =>
        slice.toDF("k", "ver", "op", "payload").write.mode("append").parquet(in)
        val q = Stateful.cdcResolved(spark.readStream.schema(schema).parquet(in))
          .writeStream.outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[Stateful.KeyState], _: Long) =>
            last.synchronized {
              b.collect().foreach(s => last(s.k) = (s.k, s.ver, s.op, s.payload))
            }
            ()
          }
          .option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      last.values.toSet
    }

    // one shot, and a deliberately NON-chronological 3-batch split
    // (late data lands in the last batch) — both must equal batch
    val oneShot = run(Seq(log))
    val shuffled = rnd.shuffle(log)
    val sliced = run(Seq(shuffled.take(40), shuffled.slice(40, 80), shuffled.drop(80)))
    assert(oneShot === batch)
    assert(sliced === batch)
    // live view: tombstoned keys disappear exactly as in Cdc.snapshot
    assert(oneShot.filter(_._3 != "D").map(_._1) ===
      batch.filter(_._3 != "D").map(_._1))
  }

  test("streaming doc feature store equals the batch recompute under any slicing") {
    import org.apache.spark.sql.functions._
    import graft.llm.{Pii, TextStats}
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    // batch truth: the q108 incremental-subset columns + fp copy count
    val t = col("text")
    val base = docs.select(col("doc_id"), col("lang"),
      TextStats.tokenCount(t).cast("long").as("n_tokens"),
      TextStats.qualityScore(t).as("quality"),
      (Pii.emailCount(t) + Pii.phoneCount(t) + Pii.ipCount(t))
        .cast("long").as("n_pii"),
      TextStats.fingerprint(t).as("fp"))
    val batch = base
      .join(base.groupBy("fp").agg(count(lit(1)).as("n_fp_copies")), Seq("fp"))
      .select("doc_id", "lang", "n_tokens", "quality", "n_pii", "fp", "n_fp_copies")
      .as[(Long, String, Long, Double, Long, String, Long)].collect().toSet

    val all = docs.as[(Long, String, String)].collect().toSeq
    def run(slices: Seq[Seq[(Long, String, String)]]): Set[(Long, String, Long, Double, Long, String, Long)] = {
      val baseDir = tmpDir("featstore")
      val in = baseDir + "/in"; val chk = baseDir + "/chk"
      Files.createDirectories(Paths.get(in))
      val last = scala.collection.mutable.Map.empty[Long, (Long, String, Long, Double, Long, String, Long)]
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, lang STRING, text STRING")
      slices.foreach { slice =>
        slice.toDF("doc_id", "lang", "text").write.mode("append").parquet(in)
        val q = Stateful.docFeatures(spark.readStream.schema(schema).parquet(in))
          .writeStream.outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[Stateful.DocFeat], _: Long) =>
            last.synchronized {
              b.collect().foreach(f => last(f.doc_id) =
                (f.doc_id, f.lang, f.n_tokens, f.quality, f.n_pii, f.fp, f.n_fp_copies))
            }
            ()
          }
          .option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      last.values.toSet
    }

    val oneShot = run(Seq(all))
    val sliced = run(Seq(all.take(100), all.slice(100, 150), all.drop(150)))
    assert(oneShot === batch)
    assert(sliced === batch)
    assert(batch.nonEmpty)
  }

  test("CDC equal-version tie-break matches batch on supplementary-plane payloads") {
    // U+1F600 (😀, surrogate pair D83D DE00 in UTF-16) vs U+FFFD:
    // Scala's UTF-16 Ordering says 😀 < U+FFFD (0xD83D < 0xFFFD),
    // Spark's UTF8String code-point order says 😀 > U+FFFD — the
    // streaming fold must use the latter or streaming != batch here
    val log = Seq(
      (1L, 5L, "U", "😀"),
      (1L, 5L, "U", "�"))
    val batch = graft.etl.Cdc.state(
        log.toDF("k", "ver", "op", "payload"), Seq("k"), Seq("ver"))
      .select("k", "ver", "op", "payload")
      .as[(Long, Long, String, String)].collect().toSet
    assert(batch.map(_._4) === Set("😀"),
      "construction: batch must pick the UTF8-binary max payload")

    val base = tmpDir("cdc-utf8")
    val in = base + "/in"; val chk = base + "/chk"
    Files.createDirectories(Paths.get(in))
    val last = scala.collection.mutable.Map.empty[Long, (Long, Long, String, String)]
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ver BIGINT, op STRING, payload STRING")
    log.toDF("k", "ver", "op", "payload").write.mode("append").parquet(in)
    val q = Stateful.cdcResolved(spark.readStream.schema(schema).parquet(in))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Stateful.KeyState], _: Long) =>
        last.synchronized {
          b.collect().foreach(s => last(s.k) = (s.k, s.ver, s.op, s.payload))
        }
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(last.values.toSet === batch)
  }
}

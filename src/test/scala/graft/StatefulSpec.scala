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
}

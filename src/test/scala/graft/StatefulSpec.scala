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
}

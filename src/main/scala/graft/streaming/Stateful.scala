package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A7 custom state: per-user running statistics via
  * `flatMapGroupsWithState` — the arbitrary-stateful-processing API
  * (state survives across micro-batches through the checkpoint).
  * State is one small tuple per key, so memory is bounded by
  * |distinct users|, not event volume; at scale the state store
  * shards with the shuffle partitioning on the group key.
  */
object Stateful {

  final case class EventIn(user_id: Long, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total: Double)

  def runningUserStats(events: DataFrame): Dataset[UserAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value").as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventIn], state: GroupState[(Long, Double)]) =>
          var (n, total) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { e => n += 1; total += e.value }
          state.update((n, total))
          Iterator(UserAgg(user, n, total))
      }
  }
}

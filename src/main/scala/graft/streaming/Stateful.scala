package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** A7 custom state: per-user running statistics via
  * `flatMapGroupsWithState` — the arbitrary-stateful-processing API
  * (state survives across micro-batches through the checkpoint).
  * State is one small tuple per key, so memory is bounded by
  * |distinct users|, not event volume; at scale the state store
  * shards with the shuffle partitioning on the group key.
  *
  * With `ttl` set, state carries a processing-time timeout: a key
  * idle longer than the TTL has its state evicted (tombstone row,
  * `expired = true`), so long-lived streams don't accumulate state
  * for users that stopped appearing; a user seen again after
  * eviction restarts from zero — the documented trade of bounded
  * state for open-keyspace streams. TTL is OPT-IN because a pending
  * processing-time timer keeps a `Trigger.AvailableNow` query alive
  * until the timer fires — a cron-style batch run wants NoTimeout,
  * a long-running continuous query wants a TTL.
  */
object Stateful {

  final case class EventIn(user_id: Long, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total: Double, expired: Boolean)

  final case class Reading(key: Long, seq: Long, cents: Long)
  final case class Alert(key: Long, seq: Long, cents: Long, n_baseline: Long,
                         baseline_mean_cents: Double, is_spike: Boolean)

  /** Streaming spike alerting — the continuous sibling of the batch
    * q93 detector: each reading compares against `factor` × the
    * running mean of every EARLIER reading of its key (a reading
    * never dilutes its own baseline), with the baseline carried as
    * exact integer state (n, Σcents) so the only float op is one
    * division per reading — bit-stable across batch slicings,
    * restarts, and partitionings like the batch twin.
    *
    * Rows inside a micro-batch fold in `seq` order (the handler
    * sorts its group's slice), and state persists across batches via
    * the checkpoint, so feeding the same readings as one batch or
    * many yields identical alerts (StatefulSpec pins this). Memory:
    * two longs per key, sharded with the state store; the per-batch
    * sort is per-key-per-batch, not global.
    */
  def spikeAlerts(readings: DataFrame, factor: Double = 1.5): Dataset[Alert] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings.selectExpr("key", "seq", "cents").as[Reading]
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), Alert](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Reading], state: GroupState[(Long, Long)]) =>
          var (n, sum) = state.getOption.getOrElse((0L, 0L))
          val out = rows.toSeq.sortBy(_.seq).map { r =>
            val mean = if (n > 0) sum.toDouble / n else 0.0
            val spike = n > 0 && r.cents > factor * mean
            val alert = Alert(key, r.seq, r.cents, n, mean, spike)
            n += 1
            sum += r.cents
            alert
          }
          state.update((n, sum))
          out.iterator
      }
  }

  final case class Change(k: Long, ver: Long, op: String, payload: String)

  /** The equal-version tie-break must order strings exactly as the
    * batch replay's `orderBy(desc)` does — Spark compares strings as
    * UTF8String (UTF-8 byte / code-point order), which disagrees with
    * Scala's UTF-16 `Ordering[String]` when supplementary characters
    * (U+10000+) mix with U+E000–U+FFFF. Compare via UTF8String so the
    * streaming==batch invariant holds on non-ASCII payloads too.
    */
  private val utf8Ord: Ordering[String] =
    (a: String, b: String) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  private val candOrd: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
    override def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
      val c1 = java.lang.Long.compare(a._1, b._1)
      if (c1 != 0) c1
      else {
        val c2 = utf8Ord.compare(a._2, b._2)
        if (c2 != 0) c2 else utf8Ord.compare(a._3, b._3)
      }
    }
  }
  final case class KeyState(k: Long, ver: Long, op: String, payload: String)

  /** Streaming CDC apply — the continuous sibling of
    * [[graft.etl.Cdc]]: per key, keep the highest-version change
    * seen so far and emit the key's resolved state whenever it
    * CHANGES. Tombstones stay IN state (exactly the batch
    * invariant): a late change versioned before a delete cannot
    * resurrect the key, across any micro-batch slicing. Equal-version
    * conflicts break deterministically by (op, payload) descending —
    * the same rule `Cdc.state` applies — so feeding the
    * same log as one batch or many yields the same final state as
    * `Cdc.state` over the whole log (StatefulSpec pins this);
    * consumers filter `op != deleteOp` for the live view, as with
    * `Cdc.snapshot`. Memory: one resolved row per key, sharded with
    * the state store on the group key.
    */
  def cdcResolved(changes: DataFrame): Dataset[KeyState] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.selectExpr("k", "ver", "op", "payload").as[Change]
      .groupByKey(_.k)
      .flatMapGroupsWithState[(Long, String, String), KeyState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[Change], state: GroupState[(Long, String, String)]) =>
          val cur = state.getOption
          // same winner rule as Cdc.state: version first, then the
          // remaining columns (op, payload — name-sorted) as a
          // deterministic tie-break in Spark's UTF8 binary string
          // order, so a conflicted feed resolves identically here
          // and in the batch replay
          val best = rows.foldLeft(cur) { (acc, r) =>
            val cand = (r.ver, r.op, r.payload)
            if (acc.exists(a => candOrd.gteq(a, cand))) acc
            else Some(cand)
          }
          best match {
            case Some(b) if !cur.contains(b) =>
              state.update(b)
              Iterator(KeyState(k, b._1, b._2, b._3))
            case _ => Iterator.empty
          }
      }
  }

  final case class DocFeatIn(doc_id: Long, lang: String, n_tokens: Long,
                             quality: Double, n_pii: Long, fp: String)
  final case class DocFeat(doc_id: Long, lang: String, n_tokens: Long,
                           quality: Double, n_pii: Long, fp: String,
                           n_fp_copies: Long)

  /** Streaming twin of the q108 per-doc curation feature store for
    * its INCREMENTALLY-MAINTAINABLE signals: the scan projections
    * (token count, quality blend, PII counts, content fingerprint —
    * the exact q108 column expressions, applied before the stateful
    * stage) plus the fingerprint copy count, kept as per-fp state.
    * When an append adds a doc to a fingerprint group, every doc in
    * that group re-emits with the new copy count — Update-mode
    * consumers keep the latest row per doc_id, so after ANY slicing
    * of the input the latest emissions equal the batch recompute
    * (StatefulSpec pins this). Re-delivered doc_ids overwrite their
    * previous entry (replay-idempotent).
    *
    * The corpus-TRAINED q108 signals (bigram-LM score, duplicated-
    * span fraction) are deliberately absent: every append shifts
    * them for every document, so "incremental" maintenance IS the
    * batch recompute — a pipeline refreshes those on a schedule
    * while this twin keeps the per-doc columns fresh per append.
    * State: one small tuple per doc, sharded by fingerprint with the
    * state store; fingerprint groups are copy-sets (tiny by nature).
    */
  def docFeatures(docs: DataFrame): Dataset[DocFeat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.llm.{Pii, TextStats}
    val t = col("text")
    docs.select(col("doc_id"), col("lang"),
        TextStats.tokenCount(t).cast("long").as("n_tokens"),
        TextStats.qualityScore(t).as("quality"),
        (Pii.emailCount(t) + Pii.phoneCount(t) + Pii.ipCount(t))
          .cast("long").as("n_pii"),
        TextStats.fingerprint(t).as("fp"))
      .as[DocFeatIn]
      .groupByKey(_.fp)
      .flatMapGroupsWithState[List[(Long, String, Long, Double, Long)], DocFeat](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[DocFeatIn],
         state: GroupState[List[(Long, String, Long, Double, Long)]]) =>
          val prev = state.getOption.getOrElse(Nil)
          val add = rows.map(r => (r.doc_id, r.lang, r.n_tokens, r.quality, r.n_pii)).toList
          if (add.isEmpty) Iterator.empty
          else {
            // latest delivery per doc wins; deterministic emission order
            val merged = (prev ++ add)
              .foldLeft(scala.collection.immutable.ListMap.empty[Long, (Long, String, Long, Double, Long)]) {
                (m, r) => m.updated(r._1, r)
              }.values.toList.sortBy(_._1)
            state.update(merged)
            val n = merged.size.toLong
            merged.iterator.map { case (id, lang, nt, q, np) =>
              DocFeat(id, lang, nt, q, np, fp, n)
            }
          }
      }
  }

  def runningUserStats(events: DataFrame,
                       ttl: Option[String] = None): Dataset[UserAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.selectExpr("user_id", "value").as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserAgg](
        OutputMode.Update, timeout) {
        (user: Long, rows: Iterator[EventIn], state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            // idle past TTL: emit a tombstone, drop the state
            val (n, total) = state.get
            state.remove()
            Iterator(UserAgg(user, n, total, expired = true))
          } else {
            var (n, total) = state.getOption.getOrElse((0L, 0.0))
            rows.foreach { e => n += 1; total += e.value }
            state.update((n, total))
            ttl.foreach(state.setTimeoutDuration)
            Iterator(UserAgg(user, n, total, expired = false))
          }
      }
  }
}

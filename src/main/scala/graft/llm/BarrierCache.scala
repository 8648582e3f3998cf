package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for the plan-barrier caches the LSH/SimHash operators
  * need (a `.cache()` stops CollapseProject from inlining an
  * expensive projection into its many consumers, and dedupes
  * computation across self-join branches).
  *
  * The caches are per-query scratch, but `unpersist` can't be called
  * inline — the returned DataFrame is lazy and still references the
  * cached plan. Instead every tracked cache is registered here and
  * swept when the session constructs its NEXT llm query (by which
  * point the prior query's result has been consumed; if a caller
  * does hold an unconsumed frame, unpersist is still safe — Spark
  * just recomputes). Bounds cache footprint to one query's barriers
  * in long-lived sessions instead of accumulating forever.
  */
object BarrierCache {

  private val tracked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, List[DataFrame]]
  private val lastScope =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  /** Cache `df` and register it for the session's next sweep.
    * Spark's CacheManager dedupes semantically-equal plans, so two
    * queries over the same inputs SHARE one materialization (e.g.
    * the shingle index across the Jaccard and MinHash queries) —
    * which is why eviction is scope-driven, not per-query.
    */
  def track(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    tracked.synchronized {
      tracked.put(s, df :: tracked.getOrElse(s, Nil))
    }
    df.cache()
  }

  /** Evict the session's barrier caches when work moves to a new
    * scope (data dir): within one scope, plan-identical caches are
    * shared; across scopes they can never hit again and would
    * accumulate forever. Unpersist of a still-referenced plan is
    * safe — Spark just recomputes.
    */
  def sweepOnNewScope(s: SparkSession, scope: String): Unit = {
    val stale = tracked.synchronized {
      dropStoppedSessions()
      if (lastScope.put(s, scope).contains(scope)) Nil
      else tracked.remove(s).getOrElse(Nil)
    }
    stale.foreach(_.unpersist())
  }

  /** Drop registry entries for sessions whose SparkContext has
    * stopped: their cached plans are already gone with the context,
    * but the map entries would otherwise pin the session objects for
    * the JVM's lifetime (long-lived processes that create many
    * sessions). Called under `tracked.synchronized`.
    */
  private def dropStoppedSessions(): Unit = {
    val dead = (tracked.keysIterator ++ lastScope.keysIterator)
      .filter(_.sparkContext.isStopped).toSet
    dead.foreach { s => tracked.remove(s); lastScope.remove(s) }
  }

  /** A point-in-time mark of the session's tracked-cache list, for
    * [[sweepSince]]: `val m = mark(s); …; sweepSince(s, m)` drops
    * only the caches tracked in between. The streaming foreachBatch
    * loops use this — a batch's caches die with the batch, while the
    * SESSION's shared caches (the shingle index a whole query suite
    * amortizes on) survive.
    */
  def mark(s: SparkSession): Int =
    tracked.synchronized(tracked.getOrElse(s, Nil).size)

  /** Unpersist the caches tracked since `mark` (they sit at the head
    * of the prepend-ordered list), keeping everything older.
    */
  def sweepSince(s: SparkSession, mark: Int): Unit = {
    val newer = tracked.synchronized {
      val all = tracked.getOrElse(s, Nil)
      val n = all.size - mark
      if (n <= 0) Nil
      else {
        tracked.put(s, all.drop(n))
        all.take(n)
      }
    }
    newer.foreach(_.unpersist())
  }

  /** Unpersist every barrier cache tracked for `s`. */
  def sweep(s: SparkSession): Unit = {
    val removed = tracked.synchronized {
      dropStoppedSessions()
      lastScope.remove(s)
      tracked.remove(s)
    }
    removed.foreach(_.foreach(_.unpersist()))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-only bench entries — the READ/serve stage of the
  * persisted-artifact lifecycles, timed against PREBUILT state.
  *
  * The registered lifecycle queries (q152/q154/q159/q155) are
  * deliberately end-to-end: train + store round-trips + truth
  * recomputation + lifecycle flags, so their bench medians measure
  * the HARNESS, not what a production pipeline pays per query once
  * the artifact exists. These entries split that out: each builds
  * its persisted state ONCE per (entry, sfDir) — memoized, so under
  * the bench harness's round-robin passes the first pass pays the
  * build (visible in the `cold` column) and later passes time the
  * serve stage alone (the `median`). The artifact then reports
  * "index serving" as the serving cost.
  *
  * Not registered in [[SparkEntry.queries]]: these have no oracle
  * (their correctness twins are q152/q154/q155/q159); they exist
  * only on the bench surface ([[Bench]] times
  * `SparkEntry.queries ++ ServingBench.queries`).
  */
object ServingBench {

  private val ctxs =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** Run `setup` once per (entry, sfDir), returning its scratch root
    * on every call — the prebuilt-state memo behind the serve-only
    * timing.
    */
  private def ctx(name: String, dir: String)(setup: String => Unit): String =
    ctxs.getOrElseUpdate((name, dir), {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_serve_$name").toString
      setup(root)
      root
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q154's serve stage: ADC top-k against persisted codebooks +
    // codes (LUT build, code join, hash-agg, capped exact re-rank) —
    // never retrains, never scans corpus floats beyond the shortlist.
    "serve01_ann_adc" -> ((s, dir) => {
      import graft.llm.Pq
      val p = Pq.PqParams(ksub = 64)
      val root = ctx("ann", dir) { root =>
        // serving must not lean on training's cached frames — but
        // sweep ONLY them (scoped), not the session's shared caches
        // the surrounding bench suite amortizes on
        val mark = graft.llm.BarrierCache.mark(s)
        val emb = Tables.embeddings(s, dir)
        val cents = Pq.trainCodebooks(emb, "vec_id", "embedding", p)
        graft.etl.Load.writeAtomic(s, cents, s"$root/cb")
        graft.etl.Load.writeAtomic(s,
          Pq.encode(emb, "vec_id", "embedding", cents, p), s"$root/codes")
        graft.llm.BarrierCache.sweepSince(s, mark)
      }
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") % 100 === 0)
      Pq.indexTopK(graft.etl.Load.readTable(s, s"$root/cb"),
        graft.etl.Load.readTable(s, s"$root/codes"),
        emb, probes, "vec_id", "embedding", 10, p)
    }),

    // q159's serve stage: BM25 ranking from persisted postings +
    // doclens — corpus text never touched, stats derive from the
    // index tables.
    "serve02_bm25" -> ((s, dir) => {
      import graft.llm.Relevance
      val root = ctx("bm25", dir) { root =>
        val docs = Tables.documents(s, dir)
        graft.etl.Load.writeAtomic(s,
          Relevance.indexPostings(docs, "doc_id", "text"), s"$root/postings")
        graft.etl.Load.writeAtomic(s,
          Relevance.indexDocLens(docs, "doc_id", "text"), s"$root/doclens")
      }
      Relevance.bm25FromIndex(
          graft.etl.Load.readTable(s, s"$root/postings"),
          graft.etl.Load.readTable(s, s"$root/doclens"),
          "doc_id", Seq("vector", "filter", "merge"))
        .orderBy(desc("score"), col("doc_id")).limit(15)
    }),

    // q152's serve stage: percentile rollup by MERGING persisted
    // per-period t-digests — the fact table is never re-scanned.
    "serve03_sketch_rollup" -> ((s, dir) => {
      import graft.functions.{TDigestAgg, TDigestMergeAgg}
      val root = ctx("sketch", dir) { root =>
        val dig = udaf(TDigestAgg(200))
        val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
          col("l_quantity"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long").as("period"))
        graft.etl.Load.writeSharded(s,
          li.groupBy("l_returnflag", "period")
            .agg(dig(col("l_quantity")).as("digest")),
          "period", None, s"$root/digests")
      }
      val mrg = udaf(TDigestMergeAgg(200, Seq(0.5, 0.9, 0.99)))
      graft.etl.Load.readSharded(s, s"$root/digests")
        .groupBy("l_returnflag")
        .agg(mrg(col("digest.means"), col("digest.weights")).as("qs"),
          count(lit(1)).as("n_periods"))
    }),

    // q155's serve stage: a range aggregate through the persisted
    // stats index — file-list pruning from one metadata read, then
    // the candidate-file scan.
    "serve04_stats_pruned" -> ((s, dir) => {
      import graft.etl.{Load, StatsIndex}
      val root = ctx("stats", dir) { root =>
        val li = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_shipdate", "l_returnflag",
            "l_quantity", "l_extendedprice")
        Load.writeClustered(s, li, "l_shipdate", 16, s"$root/li")
        StatsIndex.buildAndSave(s, s"$root/li", Seq("l_shipdate"),
          s"$root/stats")
      }
      val (pruned, _, _) = StatsIndex.prunedRead(
        s, s"$root/li", Load.readTable(s, s"$root/stats"), "l_shipdate",
        Some(lit("1997-01-01").cast("timestamp")),
        Some(lit("1997-12-31").cast("timestamp")))
      pruned.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
    }),

    // q184's serve stage: a plain-SQL range aggregate over a PREBUILT
    // snapshot table — what a user pays per query once the table
    // exists: the snap.` ` resolution, the planning-time stats prune,
    // and the candidate-file scan (the q173-q186 registered queries
    // all pay table CONSTRUCTION inside their timing; this is the
    // steady-state read).
    "serve05_snapshot_sql" -> ((s, dir) => {
      import graft.etl.Snapshots
      val root = ctx("snapsql", dir) { root =>
        val li = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_shipdate", "l_returnflag",
            "l_quantity", "l_extendedprice")
        Snapshots.commitWithStats(s,
          li.repartitionByRange(16, col("l_orderkey"))
            .sortWithinPartitions("l_orderkey"), s"$root/t",
          Seq("l_orderkey"))
      }
      graft.plans.SnapshotSql.sql(s,
        s"""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q
           |FROM snap.`$root/t`
           |WHERE l_orderkey BETWEEN 1000 AND 3000
           |GROUP BY l_returnflag""".stripMargin)
    }),

    // q173's serve stage: the change-feed read between two PREBUILT
    // versions — cost ∝ churned files (the merge rewrote a key-local
    // handful), never the table; the registered q173 pays two table
    // builds + an optimize inside its timing.
    "serve06_change_feed" -> ((s, dir) => {
      import graft.etl.Snapshots
      val root = ctx("cdf", dir) { root =>
        val o = Tables.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        Snapshots.commitWithStats(s,
          o.repartitionByRange(16, col("o_orderkey"))
            .sortWithinPartitions("o_orderkey"), s"$root/t",
          Seq("o_orderkey"))
        Snapshots.merge(s,
          o.filter(col("o_orderkey") <= 500L)
            .withColumn("o_totalprice", col("o_totalprice") + lit(1.0)),
          s"$root/t", "o_orderkey", Seq("o_orderkey"))
      }
      Snapshots.changes(s, s"$root/t", 1L, 2L).df
        .groupBy("_change_type", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
    }),

    // q197's serve stage: the repeated large-large join against
    // PREBUILT co-bucketed tables — the steady-state cost a bucketed
    // layout buys (neither side shuffles, query after query; the
    // build cost is paid once at commit time, not here).
    "serve07_bucketed_join" -> ((s, dir) => {
      import graft.etl.Snapshots
      import graft.etl.Snapshots.Bucketing
      val root = ctx("bucketed", dir) { root =>
        Snapshots.commit(s,
          Tables.orders(s, dir)
            .select("o_orderkey", "o_custkey", "o_totalprice"),
          s"$root/o", bucketBy = Some(Bucketing(16, Seq("o_custkey"))))
        Snapshots.commit(s,
          Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          s"$root/c", bucketBy = Some(Bucketing(16, Seq("c_custkey"))))
      }
      graft.plans.SnapshotSql.sql(s,
        s"""SELECT c_mktsegment, count(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           |    AS price_sum
           |FROM snap.`$root/o` o JOIN snap.`$root/c` c
           |ON o.o_custkey = c.c_custkey
           |GROUP BY c_mktsegment""".stripMargin)
    })
  )
}

package graft.queries

import graft.Tables
import graft.etl.Categorize
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDefs._

/** Analytics surface (SURVEY.md §2.9 / A1-A6, A11): the downstream
  * query capabilities the reference's BI layer implies. All shapes
  * are shuffle-minimal: partial aggregation (map-side combine) is
  * free with groupBy/agg; dims broadcast; windows partition on the
  * natural key so one shuffle serves the whole window stage.
  */
object AnalyticsQueries {

  /** Urgent-order co-purchase graph shared by q103 (triangles) and
    * q110 (degree profile): canonical `u < v` long edges,
    * barrier-cached so both queries — and every consumer branch
    * inside each — read ONE materialization of the lineitem
    * self-join instead of maintaining two hand-copied derivations.
    */
  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val li = Tables.lineitem(s, dir)
      .join(urgent, Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_partkey").distinct()
    graft.llm.BarrierCache.track(li.toDF("ok", "u")
      .join(li.toDF("ok", "v"), Seq("ok"))
      .filter(col("u") < col("v"))
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .distinct())
  }

  val queries: Map[String, Q] = Map(
    // q18 — A1: pricing summary (TPC-H Q1 shape). One shuffle, exact
    // decimal sums.
    "q18_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
          moneyAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // q19 — A2: exact distinct counts per segment.
    "q19_distinct_counts" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select("o_custkey", "o_orderkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // q20 — A3: rollup hierarchy (category ⊃ brand), null grouping
    // keys coalesced to a sentinel for stable compare.
    "q20_rollup_hierarchy" -> ((s, dir) => {
      val p = Tables.part(s, dir).select("p_type", "p_brand")
      val dim = Categorize.typeDimDF(s).select("p_type", "category")
      // SQL surface: Dataset rollup-over-join trips a
      // DetectAmbiguousSelfJoin false positive in Spark 4.1; the SQL
      // path plans the identical Expand+Aggregate without the
      // dataset-id bookkeeping.
      p.join(broadcast(dim), Seq("p_type"), "left")
        .createOrReplaceTempView("q20_base")
      s.sql(
        """SELECT coalesce(category, '(all)') AS category,
          |       coalesce(p_brand, '(all)') AS brand,
          |       count(*) AS n
          |FROM q20_base
          |GROUP BY ROLLUP(category, p_brand)
          |ORDER BY category, brand""".stripMargin)
    }),

    // q21 — A4: top-3 parts by revenue within each brand; exact
    // decimal revenue so rank order is bit-stable; ties broken by
    // p_partkey.
    "q21_topk_per_brand" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_partkey", "l_extendedprice", "l_discount")
      val p = Tables.part(s, dir).select("p_partkey", "p_brand")
      val rev = li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      val w = Window.partitionBy("p_brand").orderBy(col("rev").desc, col("p_partkey"))
      rev.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("rnk").cast("long").as("rnk"), col("p_partkey"),
          col("rev").cast("double").as("revenue"))
        .orderBy("p_brand", "rnk")
    }),

    // q22 — A5: daily trend over the event stream.
    "q22_daily_trend" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("ts").cast("date").cast("string").as("day"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
        .orderBy("day")
    }),

    // q23 — A6: running revenue total by order date (decimal-exact
    // cumulative window).
    "q23_running_total" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").cast("string").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("dec_daily"))
      val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("day"),
          col("dec_daily").cast("double").as("daily"),
          sum(col("dec_daily")).over(w).cast("double").as("cum"))
        .orderBy("day")
    }),

    // q24 — A6: day-over-day delta via lag.
    "q24_lag_delta" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").cast("string").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("dec_daily"))
      val w = Window.orderBy("day")
      daily.select(col("day"),
          col("dec_daily").cast("double").as("daily"),
          (col("dec_daily") - lag(col("dec_daily"), 1).over(w)).cast("double").as("delta"))
        .orderBy("day")
    }),

    // q25 — A11: JSON props via from_json (schema'd, codegen'd) —
    // oracle mirrors with a regex extract over the same payload.
    "q25_json_props" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          (sum(col("k").cast("long")).cast("double") / count(lit(1))).as("avg_k"))
        .orderBy("event_type")
    }),

    // q39 — A2: approximate distincts (HLL sketch) next to exact,
    // made oracle-checkable: raw sketch estimates are
    // implementation-specific (DuckDB's HLL differs), so the output
    // carries the exact counts plus deterministic flags that each
    // estimate sits within 3·rsd of its exact twin (Spark's HLL is
    // deterministic, so the flags are reproducible; a sketch
    // regression flips them and fails the hash compare).
    "q39_approx_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_orderkey")).as("__ao"),
          approx_count_distinct(col("l_partkey"), 0.02).as("__ap"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
          col("n"),
          (abs(col("__ao") - col("exact_orders")).cast("double") <=
            col("exact_orders") * lit(0.15)).as("hll_orders_ok"),
          (abs(col("__ap") - col("exact_parts")).cast("double") <=
            col("exact_parts") * lit(0.06)).as("hll_parts_ok"))
        .orderBy("l_returnflag")
    }),

    // q40 — A5/A7: tumbling-window aggregation via window() — the
    // batch-deterministic twin of the streaming windowedCounts
    // (oracle: epoch-aligned hour buckets).
    "q40_tumbling_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
        .select(col("window.start").cast("string").as("window_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type")
    }),

    // q41 — A2/set-ops: customers with no URGENT order (left_anti ≡
    // NOT EXISTS) per market segment.
    "q41_customers_no_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    // q43 — A1/A2: exact percentiles (Spark `percentile` ==
    // DuckDB `quantile_cont`, identical linear interpolation).
    "q43_percentiles" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_quantity, 0.99)").as("p99_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // q57 — A2 sketch tier: approximate percentiles (Greenwald-Khanna
    // sketch via approx_percentile — the bounded-memory, mergeable
    // at-scale form of q43) with the q39-style self-check: output is
    // the exact percentiles plus deterministic flags that each sketch
    // estimate lands within tolerance (the sketch picks a real data
    // value, so an exact interpolated percentile can differ by up to
    // one unit plus the rank error).
    "q57_approx_percentiles" -> ((s, dir) => {
      def ok(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        abs(approx.cast("double") - exact) <= greatest(lit(1.0), exact * lit(0.05))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_quantity, 0.99)").as("p99_qty"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("__a50"),
          expr("approx_percentile(l_quantity, 0.9, 10000)").as("__a90"),
          expr("approx_percentile(l_quantity, 0.99, 10000)").as("__a99"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("p50_qty"), col("p90_qty"),
          col("p99_qty"), col("n"),
          ok(col("__a50"), col("p50_qty")).as("sketch_p50_ok"),
          ok(col("__a90"), col("p90_qty")).as("sketch_p90_ok"),
          ok(col("__a99"), col("p99_qty")).as("sketch_p99_ok"))
        .orderBy("l_returnflag")
    }),

    // q44 — A1/A3: pivoted revenue matrix (returnflag × linestatus)
    // via the DataFrame pivot API with an explicit value list
    // (deterministic columns); oracle = conditional aggregation.
    "q44_pivot_matrix" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O", "P"))
        .agg(moneySum(col("l_extendedprice")))
        .orderBy("l_returnflag")
    }),

    // q46 — A3: CUBE over order status × priority (all four
    // grouping sets), null keys coalesced like q20.
    "q46_cube_status" -> ((s, dir) => {
      Tables.orders(s, dir).select("o_orderstatus", "o_orderpriority", "o_totalprice")
        .createOrReplaceTempView("q46_base")
      s.sql(
        s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
           |       coalesce(o_orderpriority, '(all)') AS priority,
           |       count(*) AS n,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
           |FROM q46_base
           |GROUP BY CUBE(o_orderstatus, o_orderpriority)
           |ORDER BY status, priority""".stripMargin)
    }),

    // q49 — set-ops: customers with BOTH an urgent and a low
    // priority order (two left_semi joins ≡ EXISTS ∩ EXISTS).
    "q49_customers_both" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, dir).select("o_custkey", "o_orderpriority")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val low = o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .join(low, c("c_custkey") === low("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    // q50 — A1 multi-way star join: revenue per region per year
    // across customer⋈nation⋈region⋈orders⋈lineitem. Only the
    // FIXED-cardinality dims (nation=25, region=5) are broadcast;
    // customer grows with scale factor, so orders⋈customer must stay
    // a shuffle join (a customer broadcast OOMs long before 100 TB).
    "q50_region_year_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_regionkey")
      val r = Tables.region(s, dir).select("r_regionkey", "r_name")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name").as("region"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("region", "yr")
    }),

    // q51 — A4/A6: revenue share of each part within its brand —
    // aggregate-then-window ratio (decimal-exact numerator and
    // denominator, one deterministic division).
    "q51_brand_share" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir).select("l_partkey", "l_extendedprice", "l_discount")
      val p = Tables.part(s, dir).select("p_partkey", "p_brand")
      val rev = li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      val w = Window.partitionBy("p_brand")
      rev.select(col("p_brand"), col("p_partkey"),
          col("rev").cast("double").as("revenue"),
          (col("rev").cast("double") / sum(col("rev")).over(w).cast("double")).as("share"))
        .orderBy("p_brand", "p_partkey")
    }),

    // q26 — A5/A7 batch form: gap-based sessionization (30 min
    // inactivity) — the batch-deterministic analogue of
    // session_window. One shuffle on user_id serves both the window
    // and the final aggregate.
    "q26_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("epoch_s"))
        .withColumn("prev", lag(col("epoch_s"), 1).over(w))
        .withColumn("new_session",
          when(col("prev").isNull || col("epoch_s") - col("prev") > 1800, 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum(col("new_session")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // q53 — A5/A7: native session_window sessionization — the batch-
    // deterministic twin of the streaming Ingest.sessionCounts. The
    // ts is floored to seconds so the DuckDB lag-twin matches
    // exactly. session_window's gap boundary is INCLUSIVE: an event
    // exactly 30 min after the previous one still MERGES (verified
    // empirically), so the oracle starts a new session only at
    // gap > 30 min — the same rule as q26's lag form.
    "q53_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"),
          timestamp_seconds(unix_timestamp(col("ts"))).as("tsec"))
        .groupBy(col("user_id"), session_window(col("tsec"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).cast("long").as("n_events"),
          max(col("n")).cast("long").as("max_session_events"))
        .orderBy("user_id")
    }),

    // q54 — A5: sliding-window aggregation — window(ts, 1h, 30m):
    // every event lands in exactly two epoch-aligned hourly windows
    // 30 minutes apart (the overlap structure the oracle rebuilds
    // with a 2-row generator join).
    "q54_sliding_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
        .select(col("window.start").cast("string").as("window_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type")
    }),

    // q67 — S4 extension: SCD2 history from the event change log
    // (graft.etl.Scd2) — each user's event_type stream collapses to
    // versioned status intervals; consecutive repeats merge. One
    // shuffle on user_id serves both window passes.
    "q67_scd2_history" -> ((s, dir) => {
      val log = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type").as("status"), unix_timestamp(col("ts")).as("epoch_s"))
      graft.etl.Scd2.fromChangeLog(log, Seq("user_id"), "epoch_s",
          Seq("epoch_s", "event_id"), Seq("status"))
        .select(col("user_id"), col("status"), col("valid_from").as("valid_from_s"),
          col("valid_to").as("valid_to_s"), col("version"), col("is_current"))
        .orderBy("user_id", "version")
    }),

    // q68 — as-of join (graft.operators.AsOfJoin): each click gets
    // the most recent purchase of the same user at-or-before it —
    // union-and-forward-fill, one shuffle, no range explosion. The
    // purchase_s payload column doubles as a self-check (must be
    // <= click_s).
    "q68_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("value"), unix_timestamp(col("ts")).as("epoch_s"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("epoch_s"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("epoch_s"),
          col("epoch_s").as("purchase_s"), col("value").as("purchase_value"))
      graft.operators.AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
          "epoch_s", Seq("event_id"), Seq("purchase_s", "purchase_value"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("epoch_s").as("click_s"), col("purchase_s"), col("purchase_value"))
        .orderBy("click_id")
    }),

    // q69 — range join (graft.operators.RangeJoin): cross-user pairs
    // of overlapping session intervals via hour-bucketed equi-join +
    // exact overlap refine — no BroadcastNestedLoopJoin, no
    // post-join distinct (first-shared-bucket dedup). Sessions are
    // the q26 gaps-and-islands construction.
    "q69_range_join" -> ((s, dir) => {
      graft.llm.BarrierCache.sweepOnNewScope(s, dir)
      val w = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
      val sess = graft.llm.BarrierCache.track(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("epoch_s"))
          .withColumn("prev", lag(col("epoch_s"), 1).over(w))
          .withColumn("new_session",
            when(col("prev").isNull || col("epoch_s") - col("prev") > 1800, 1)
              .otherwise(0))
          .withColumn("sid", sum(col("new_session"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min("epoch_s").as("start_s"), max("epoch_s").as("end_s")))
      val a = sess.select(col("user_id").as("u1"), col("start_s").as("s1"),
        col("end_s").as("e1"))
      val b = sess.select(col("user_id").as("u2"), col("start_s").as("s2"),
        col("end_s").as("e2"))
      graft.operators.RangeJoin.overlapJoin(a, b, "s1", "e1", "s2", "e2",
          bucketWidth = 3600L)
        .filter(col("u1") < col("u2"))
        .groupBy("u1", "u2")
        .agg(count(lit(1)).as("n_overlaps"))
        .orderBy("u1", "u2")
    }),

    // q71 — skew path (graft.operators.Skew): explicit two-phase
    // salted aggregation, result identical to the plain groupBy
    // (quantities are integer-valued doubles, sums exact in any
    // order). Driver-checks the operator AQE can't always save.
    "q71_salted_agg" -> ((s, dir) => {
      graft.operators.Skew.saltedAggregate(
          Tables.lineitem(s, dir).select("l_returnflag", "l_quantity"),
          Seq("l_returnflag"), "l_quantity", salts = 8)
        .orderBy("l_returnflag")
    }),

    // q140 — skew path, the JOIN side (graft.operators.Skew
    // .saltedJoin): the broadcast-ineligible equi-join with a hot key
    // is the shape AQE's partition splitting can't fully fix — a
    // monster key still hashes to ONE map-side partition; salting
    // spreads each big-side key over `salts` subkeys and replicates
    // the small side 8x. The salted result must equal the plain
    // inner join row-for-row, so the oracle is that plain join,
    // summarized per supplier with exact decimal sums.
    "q140_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("s_suppkey"),
          col("l_extendedprice"), col("l_quantity"))
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
      graft.operators.Skew.saltedJoin(li, sup, "s_suppkey", salts = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("s_name")
    }),

    // q141 — bloom-filter semi-join pruning (graft.operators
    // .BloomPrune): the selective-dim/huge-fact join where the win is
    // dropping fact rows BEFORE the shuffle. The dim side (suppliers
    // with high balance) is bloomed with the engine's own
    // BloomFilterAggregate, the fact scan probes the codegen'd
    // might_contain literal, and only surviving rows reach the
    // exchange. The join absorbs bloom false positives, so the result
    // is EXACTLY the plain join — which is the stock oracle.
    "q141_bloom_pruned_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_extendedprice"))
      val sup = Tables.supplier(s, dir)
        .filter(col("s_acctbal") > 5000.0)
        .select("s_suppkey", "s_nationkey")
      graft.operators.BloomPrune
        .prunedJoin(li, sup, "l_suppkey", "s_suppkey",
          expectedItems = 1L << 16, fpp = 0.01)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("s_nationkey")
    }),

    // q143 — KMV/theta distinct sketch with SET OPERATIONS
    // (functions.KmvSketch): "distinct customers active in BOTH
    // halves of the date span, per priority" — the overlap question
    // HLL sketches cannot answer. One pass builds both per-half
    // sketches (conditional inputs, null-skipped); the exact side
    // (per-customer presence flags summed) is emitted as the oracle
    // columns, the sketch estimates as deterministic tolerance flags
    // (the q39/q72 pattern). The sketch is order-independent min-k
    // over a fixed hash, so flags are bit-stable run to run.
    "q143_kmv_overlap" -> ((s, dir) => {
      import graft.functions.Kmv
      val k = 1024
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("prio"), col("o_custkey"),
        col("o_orderdate").cast("date").as("d"))
      val span = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      val h = o.crossJoin(broadcast(span))
        .withColumn("half",
          when(datediff(col("d"), col("lo")) * 2 <= datediff(col("hi"), col("lo")),
            lit(1)).otherwise(lit(2)))
        .select("prio", "o_custkey", "half")
      val sketches = h.groupBy("prio").agg(
        Kmv.sketchIf(col("half") === 1, col("o_custkey"), k).as("sk_a"),
        Kmv.sketchIf(col("half") === 2, col("o_custkey"), k).as("sk_b"))
      val exact = h.groupBy("prio", "o_custkey").agg(
          max(when(col("half") === 1, 1).otherwise(0)).as("in_a"),
          max(when(col("half") === 2, 1).otherwise(0)).as("in_b"))
        .groupBy("prio").agg(
          sum("in_a").cast("long").as("n_a"),
          sum("in_b").cast("long").as("n_b"),
          sum(col("in_a") * col("in_b")).cast("long").as("n_both"))
      val tolA = greatest(col("n_a").cast("double") * 0.15, lit(2.0))
      val tolB = greatest(col("n_b").cast("double") * 0.15, lit(2.0))
      val unionExact = (col("n_a") + col("n_b") - col("n_both")).cast("double")
      exact.join(sketches, "prio")
        .select(col("prio"), col("n_a"), col("n_b"), col("n_both"),
          (abs(Kmv.estimate(col("sk_a"), k) - col("n_a")) <= tolA).as("a_ok"),
          (abs(Kmv.estimate(col("sk_b"), k) - col("n_b")) <= tolB).as("b_ok"),
          (abs(Kmv.intersectEstimate(col("sk_a"), col("sk_b"), k) - col("n_both"))
            <= greatest(unionExact * 0.15, lit(2.0))).as("i_ok"))
        .orderBy("prio")
    }),

    // q142 — t-digest SHARD ROLLUP (functions.TDigest*): per-shard
    // digests built as storable struct values, then MERGED in a
    // second aggregation that only then answers quantiles — the
    // pre-aggregated-sketch-table pattern approx_percentile (whose
    // GK state is engine-internal) cannot express: daily digests in
    // parquet → monthly percentiles with no fact re-read. Output is
    // the exact percentiles (q57's engine-identical interpolation on
    // integer quantities) + tolerance flags on the rolled-up digest.
    "q142_tdigest_rollup" -> ((s, dir) => {
      import graft.functions.{TDigestAgg, TDigestMergeAgg}
      val dig = udaf(TDigestAgg(200))
      val mrg = udaf(TDigestMergeAgg(200, Seq(0.5, 0.9, 0.99)))
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_quantity"),
        pmod(xxhash64(col("l_orderkey")), lit(16)).as("shard"))
      val shards = li.groupBy("l_returnflag", "shard")
        .agg(dig(col("l_quantity")).as("digest"))
      val rolled = shards.groupBy("l_returnflag")
        .agg(mrg(col("digest.means"), col("digest.weights")).as("qs"))
      val exact = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          expr("percentile(l_quantity, 0.99)").as("p99"),
          count(lit(1)).as("n"))
      def ok(est: org.apache.spark.sql.Column, ex: org.apache.spark.sql.Column) =
        abs(est - ex) <= greatest(lit(1.0), ex * lit(0.05))
      exact.join(rolled, "l_returnflag")
        .select(col("l_returnflag"), col("p50"), col("p90"), col("p99"),
          col("n"),
          ok(element_at(col("qs"), 1), col("p50")).as("td_p50_ok"),
          ok(element_at(col("qs"), 2), col("p90")).as("td_p90_ok"),
          ok(element_at(col("qs"), 3), col("p99")).as("td_p99_ok"))
        .orderBy("l_returnflag")
    }),

    // q152 — SKETCH-TABLE LIFECYCLE end-to-end: the production
    // pattern q142 claims ("daily digests in parquet → monthly
    // percentiles with no fact re-read") driven through the ACTUAL
    // storage seam — per-(returnflag, period) t-digests are
    // PERSISTED via Load.writeSharded (manifest-committed shard
    // dataset), read back via readSharded, and only then rolled up
    // to whole-span percentiles. The rollup stage's plan reads ONLY
    // the sketch table (PlanQualitySpec pins no fact re-scan);
    // per-flag period counts come from the sketch rows themselves
    // and must equal the fact-side distinct-period count — proving
    // the persisted sketch set is complete. Sibling of q142 (in-plan
    // rollup, hash-sharded): this variant adds the parquet
    // round-trip + manifest commit + calendar sharding.
    "q152_sketch_lifecycle" -> ((s, dir) => {
      import graft.functions.{TDigestAgg, TDigestMergeAgg}
      val dig = udaf(TDigestAgg(200))
      val mrg = udaf(TDigestMergeAgg(200, Seq(0.5, 0.9, 0.99)))
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_quantity"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("period"))
      val perPeriod = li.groupBy("l_returnflag", "period")
        .agg(dig(col("l_quantity")).as("digest"))
      val base = java.nio.file.Files.createTempDirectory("graft_q152").toString
      val sketchPath = s"$base/period_digests"
      graft.etl.Load.writeSharded(s, perPeriod, "period", None, sketchPath)
      val rolled = graft.etl.Load.readSharded(s, sketchPath)
        .groupBy("l_returnflag")
        .agg(mrg(col("digest.means"), col("digest.weights")).as("qs"),
          count(lit(1)).as("n_periods"))
      val exact = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          expr("percentile(l_quantity, 0.99)").as("p99"),
          count(lit(1)).as("n"))
      def ok(est: org.apache.spark.sql.Column, ex: org.apache.spark.sql.Column) =
        abs(est - ex) <= greatest(lit(1.0), ex * lit(0.05))
      exact.join(rolled, "l_returnflag")
        .select(col("l_returnflag"), col("p50"), col("p90"), col("p99"),
          col("n"), col("n_periods"),
          ok(element_at(col("qs"), 1), col("p50")).as("td_p50_ok"),
          ok(element_at(col("qs"), 2), col("p90")).as("td_p90_ok"),
          ok(element_at(col("qs"), 3), col("p99")).as("td_p99_ok"))
        .orderBy("l_returnflag")
    }),

    // q144 — cohort retention matrix: customers grouped by
    // first-order month, tracked by months-since-cohort. The classic
    // product-analytics query: (cohort, age) → distinct active
    // customers / cohort size. Deliberate sibling of
    // q77_cohort_retention (weekly cohorts over the EVENTS stream,
    // raw active counts): this variant runs on ORDERS at monthly
    // grain and adds the retention RATIO and full (cohort × age)
    // matrix — the two cover the event-level and transaction-level
    // halves of the same analysis. Months are exact integer arithmetic
    // (y*12+m) on both engines; retention is one IEEE division of
    // exact longs. Plan: groupBy custkey (first order), broadcast-less
    // self-join back on custkey (co-partitioned by the groupBy's own
    // exchange), then one aggregation per matrix cell — three
    // shuffles total, all on keys that scale with |customers|, never
    // with |orders|².
    "q144_cohort_retention" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"))
      val first = o.groupBy("o_custkey").agg(min("ym").as("cohort_ym"))
      val joined = o.join(first, "o_custkey")
        .select(col("o_custkey"), col("cohort_ym"),
          (col("ym") - col("cohort_ym")).as("age"))
      val active = joined.groupBy("cohort_ym", "age")
        .agg(countDistinct("o_custkey").as("n_active"))
      val sizes = first.groupBy("cohort_ym").agg(count(lit(1)).as("cohort_size"))
      active.join(sizes, "cohort_ym")
        .select(col("cohort_ym"), col("age"), col("n_active"),
          col("cohort_size"),
          (col("n_active").cast("double") / col("cohort_size")).as("retention"))
        .orderBy("cohort_ym", "age")
    }),

    // q145 — ordered-funnel within a time window (ClickHouse's
    // windowFunnel): per user, the deepest view → click → purchase
    // prefix where every step lands within 7 days of the anchoring
    // view. Exact O(n log n) formulation — no self-joins: a running
    // "latest view" gives each click its best (latest) anchor; a
    // running max over those anchors gives each purchase the most
    // permissive qualifying chain. Greedy-latest is optimal because a
    // later anchor strictly widens the remaining window, so this
    // computes exactly the existential windowFunnel semantics. One
    // shuffle on user_id serves both window passes and the per-user
    // rollup; the final count is a single-row reduce.
    "q145_window_funnel" -> ((s, dir) => {
      val W = 7L * 24 * 3600 * 1000000L // 7 days in µs
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = Tables.events(s, dir).select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"), col("event_type"))
      val anchored = e
        .withColumn("last_view",
          max(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("anchor",
          when(col("event_type") === "click" &&
            col("us") - col("last_view") <= W, col("last_view")))
        .withColumn("run_anchor", max(col("anchor")).over(w))
      val per = anchored.groupBy("user_id").agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("l1"),
        max(when(col("anchor").isNotNull, 1).otherwise(0)).as("l2"),
        max(when(col("event_type") === "purchase" &&
          col("us") <= col("run_anchor") + W, 1).otherwise(0)).as("l3"))
      per.agg(count(lit(1)).as("n_users"),
        sum("l1").cast("long").as("reach_view"),
        sum("l2").cast("long").as("reach_click"),
        sum("l3").cast("long").as("reach_purchase"))
    }),

    // q146 — event-sequence pattern match (ClickHouse sequenceMatch):
    // per user, order the event-type stream and regex-match a journey
    // pattern ("a view leading to a purchase through only
    // views/clicks"). The per-user sequence is an ordered collect —
    // bounded by events-per-user (the per-key contract also carried
    // by q26 sessionize; a key whose history can't fit one task's
    // memory needs the streaming state form instead). The pattern
    // stays in the RE2-compatible subset (no lookaround) so Spark's
    // Java regex and the oracle's RE2 agree.
    "q146_sequence_match" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"), col("event_type"))
      val per = e.groupBy("user_id").agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("us"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")),
          ",").as("seq"))
      val pat = "view(,(view|click))*,purchase"
      per.agg(count(lit(1)).as("n_users"),
        sum(when(col("seq").rlike(pat), 1).otherwise(0)).cast("long")
          .as("n_matching"))
    }),

    // q147 — market-basket pair affinity: parts co-occurring in an
    // order, with lift against independent item frequencies.
    // Deliberate sibling of q91_basket_lift (BRAND-level pairs,
    // top-20): this variant pairs at PART granularity (a ~1000×
    // larger pair space exercising the co-partitioned self-join at a
    // cardinality brands never reach) and keeps top-50.
    // The pair fan-out is the textbook self-join bounded by
    // items-per-order (k items → k(k-1)/2 pairs, ~21 at TPC-H's
    // k≈7), co-partitioned on orderkey so the join adds no second
    // shuffle; top-k lands as TakeOrdered with a total (n, p1, p2)
    // tie-break, never a global sort. Lift = n_co·N/(n1·n2) — one
    // IEEE division of exact longs.
    "q147_basket_pairs" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val n = li.agg(countDistinct("l_orderkey").as("n_orders"))
      val itemCnt = li.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("n_co"))
      pairs
        .join(itemCnt.withColumnRenamed("l_partkey", "p1")
          .withColumnRenamed("n_item", "n1"), "p1")
        .join(itemCnt.withColumnRenamed("l_partkey", "p2")
          .withColumnRenamed("n_item", "n2"), "p2")
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("n_co"), col("n1"), col("n2"),
          (col("n_co").cast("double") * col("n_orders") /
            (col("n1") * col("n2"))).as("lift"))
        .orderBy(col("n_co").desc, col("p1"), col("p2"))
        .limit(50)
    }),

    // q148 — sliding-window distinct (trailing-7-day active users per
    // day): the query that is genuinely hard at scale — exact
    // sliding distinct needs a day×window fan-out of the (day, user)
    // set — answered instead by KMV sketch ALGEBRA: per-day sketches
    // (one pass over events), then a pure-SQL fold (aggregate HOF)
    // unioning each day's trailing 7 sketches. At 100 TB the per-day
    // sketch table is |days|·k longs — the window rollup never
    // re-reads events. Oracle columns are the exact trailing counts
    // (day-level distinct pairs fanned 7×, both engines identically);
    // the sketch estimate lands as a deterministic tolerance flag.
    "q148_sliding_distinct" -> ((s, dir) => {
      import graft.functions.Kmv
      val k = 1024
      val e = Tables.events(s, dir).select(
        col("ts").cast("date").as("day"), col("user_id"))
      val offsets = (0 until 7).map(lit(_))
      val days = e.select("day").distinct()
      // exact side: distinct (day, user), fanned over the 7-day window
      val fan = e.distinct().withColumn("off", explode(array(offsets: _*)))
        .select(date_add(col("day"), col("off")).as("day"), col("user_id"))
      val exact = fan.join(days, "day")
        .groupBy("day").agg(countDistinct("user_id").as("n_users_7d"))
      // sketch side: one k-long sketch per day, fanned over the same
      // calendar window (robust to absent days, unlike a rows-window)
      // and union-folded with pure array algebra — bit-stable min-k
      // of a fixed hash, order-independent fold
      val perDay = e.groupBy("day").agg(Kmv.sketch(col("user_id"), k).as("sk"))
      val rolled = perDay.withColumn("off", explode(array(offsets: _*)))
        .select(date_add(col("day"), col("off")).as("day"), col("sk"))
        .join(days, "day")
        .groupBy("day").agg(collect_list(col("sk")).as("sks"))
        .select(col("day"), Kmv.estimate(aggregate(col("sks"),
          typedLit(Array.empty[Long]),
          (acc, sk) => slice(array_sort(array_union(acc, sk)), 1, k)), k)
          .as("est"))
      exact.join(rolled, "day")
        .select(col("day").cast("string").as("day"), col("n_users_7d"),
          (abs(col("est") - col("n_users_7d")) <=
            greatest(col("n_users_7d") * 0.15, lit(2.0))).as("sk_ok"))
        .orderBy("day")
    }),

    // q73 — wide→long reshaping (pandas melt / SQL UNPIVOT): native
    // Dataset.unpivot, a pure per-row expansion — no shuffle beyond
    // the upstream aggregation.
    "q73_unpivot" -> ((s, dir) => {
      val wide = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(moneySum(col("l_quantity")).as("qty"),
          moneySum(col("l_extendedprice")).as("price"),
          moneySum(col("l_discount")).as("discount"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("discount")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    }),

    // q84 — A4/A6: percent_rank + cume_dist of customers by account
    // balance within their market segment (pandas rank(pct=True)).
    // The custkey tiebreak makes the ordering total, so both stats
    // derive from integer ranks — bit-stable doubles. Partitioned
    // window: one shuffle on the segment, no global sort.
    "q84_pct_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // q86 — A3 completion: explicit GROUPING SETS (the two 1-D
    // margins + grand total — the shape ROLLUP/CUBE can't express)
    // with grouping() flags disambiguating real nulls from margin
    // rows. SQL route like q20/q46 (Expand+Aggregate, one shuffle).
    "q86_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select("o_orderstatus", "o_orderpriority", "o_totalprice")
        .createOrReplaceTempView("q86_base")
      s.sql(
        """SELECT coalesce(o_orderstatus, '(all)') AS status,
          |       coalesce(o_orderpriority, '(all)') AS priority,
          |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
          |       count(*) AS n,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM q86_base
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY g_status, g_priority, status, priority""".stripMargin)
    }),

    // q87 — A5/A6: RANGE-frame calendar window — the true 7-calendar-
    // day mean over the SPARSE daily series (missing days shrink the
    // frame), where q82's ROWS frame needed the gap-filled spine.
    // The frame key is the epoch-day ordinal; decimal frame sums keep
    // the engines' differing window summation strategies bit-equal.
    "q87_range_frame" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("__dec"))
        .withColumn("pos", unix_date(col("day")))
      val w = Window.orderBy("pos").rangeBetween(-6, 0)
      daily.select(col("day").cast("string").as("day"),
          col("__dec").cast("double").as("total"),
          (sum(col("__dec")).over(w).cast("double") /
            count(lit(1)).over(w)).as("cal7_mean"),
          count(lit(1)).over(w).as("days_present"))
        .orderBy("day")
    }),

    // q91 — market-basket co-occurrence: brand pairs bought in the
    // same order, with lift = P(a,b)/(P(a)P(b)). The distinct
    // (order, brand) projection bounds the self-join at C(|brands|,2)
    // pairs per order (25 brands ⇒ ≤300), the join co-partitions on
    // the order key (one shuffle), and the brand totals re-attach as
    // ≤25-row broadcasts — the shape survives any order count. Lift
    // is one IEEE division of exact long products (< 2^53), so no
    // rounding is needed for oracle parity.
    "q91_basket_lift" -> ((s, dir) => {
      val part = Tables.part(s, dir).select("p_partkey", "p_brand")
      val ob = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
        .join(part, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
        .distinct()
      val pairs = ob
        .join(ob.select(col("okey"), col("brand").as("brand_b")), "okey")
        .filter(col("brand") < col("brand_b"))
        .groupBy(col("brand").as("brand_a"), col("brand_b"))
        .agg(count(lit(1)).as("n_ab"))
      val tot = ob.groupBy("brand").agg(count(lit(1)).as("nb"))
      pairs
        .join(broadcast(tot.select(col("brand").as("brand_a"), col("nb").as("n_a"))), "brand_a")
        .join(broadcast(tot.select(col("brand").as("brand_b"), col("nb").as("n_b"))), "brand_b")
        .crossJoin(broadcast(ob.agg(countDistinct("okey").as("__n"))))
        .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"), col("n_b"),
          ((col("n_ab") * col("__n")).cast("double") / (col("n_a") * col("n_b"))).as("lift"))
        .orderBy(col("n_ab").desc, col("brand_a"), col("brand_b"))
        .limit(20)
    }),

    // q92 — robust outlier detection per return flag: median/MAD on
    // exact price cents (decimal→long, so the two percentile passes
    // interpolate over integers and land on exact half-cent doubles —
    // bit-equal across engines; q80 precedent). The |x−med| > 3·MAD
    // flag compares exact doubles, no rounding. Scale: the exact
    // percentile buffers per-group values — swap approx_percentile in
    // at 100 TB; the two-pass median→MAD structure (3-row broadcast
    // re-attach each pass) is the part that carries over.
    "q92_robust_outliers" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast("decimal(18,4)") * 10000).cast("long").as("c"))
      val med = li.groupBy("flag").agg(expr("percentile(c, 0.5)").as("med"))
      val j = li.join(broadcast(med), "flag")
        .withColumn("ad", abs(col("c") - col("med")))
      val mad = j.groupBy("flag").agg(expr("percentile(ad, 0.5)").as("mad"))
      j.join(broadcast(mad), "flag")
        .groupBy("flag")
        .agg(count(lit(1)).as("n"),
          min(col("med")).as("median_cents"),
          min(col("mad")).as("mad_cents"),
          sum(when(col("ad") > lit(3.0) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
        .withColumn("pct_outliers", col("n_outliers").cast("double") / col("n"))
        .orderBy("flag")
    }),

    // q94 — winsorized statistics per return flag: clip prices at
    // P05/P95 and report the clipped-tail counts and winsorized mean.
    // The mean is NOT a float sum over clipped values (order-
    // dependent): the mid-range sum is an exact long, the two tails
    // contribute n_clip·percentile as two fixed-order IEEE products —
    // one deterministic expression on both engines (q43 pins the
    // interpolated-percentile parity this leans on).
    "q94_winsorized_stats" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast("decimal(18,4)") * 10000).cast("long").as("c"))
      val pct = li.groupBy("flag").agg(
        expr("percentile(c, 0.05)").as("p05"),
        expr("percentile(c, 0.95)").as("p95"))
      li.join(broadcast(pct), "flag")
        .groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") < col("p05"), 1L).otherwise(0L)).as("n_clip_low"),
          sum(when(col("c") > col("p95"), 1L).otherwise(0L)).as("n_clip_high"),
          sum(when(col("c") >= col("p05") && col("c") <= col("p95"), col("c"))
            .otherwise(0L)).as("__mid"),
          min(col("p05")).as("p05_cents"),
          min(col("p95")).as("p95_cents"))
        .select(col("flag"), col("n"), col("n_clip_low"), col("n_clip_high"),
          col("p05_cents"), col("p95_cents"),
          ((col("__mid").cast("double") +
            col("n_clip_low") * col("p05_cents") +
            col("n_clip_high") * col("p95_cents")) / col("n")).as("win_mean_cents"))
        .orderBy("flag")
    }),

    // q96 — graph centrality over the trade network: 5 PageRank
    // iterations on the supplier-nation → customer-nation flow graph
    // (graft.operators.PageRank — exact pico-unit integer arithmetic,
    // so the DuckDB recursive CTE replays it bit-for-bit; float
    // PageRank could never hash-match). The edge derivation is the
    // expensive part (4-table join), so it materializes once behind a
    // barrier cache; each iteration is then a ≤(25²+25)-row join.
    "q96_trade_pagerank" -> ((s, dir) => {
      graft.llm.BarrierCache.sweepOnNewScope(s, dir)
      val nation = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
      val edges = graft.llm.BarrierCache.track(
        Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
          .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_nationkey").cast("long").as("src"),
            col("c_nationkey").cast("long").as("dst"))
          .filter(col("src") =!= col("dst")).distinct())
      graft.operators.PageRank.ranks(edges, "src", "dst",
          nation.select(col("nk")), iters = 5)
        .join(broadcast(nation), col("node") === col("nk"))
        .select(col("n_name"), col("node"), col("rank_pico"))
        .orderBy(col("rank_pico").desc, col("node"))
    }),

    // q99 — key-skew diagnostics: per-customer order-count profile
    // (max, p50/p99, max/mean ratio) — the measurement that decides
    // when operators/Skew's salting is warranted. Two aggregations:
    // per-key counts (shuffle on the key being profiled — unavoidable
    // and exactly the shuffle under diagnosis), then a single-row
    // reduce. Exact percentiles here (DuckDB-parity oracle);
    // Skew.skewReport(exact = false) is the bounded-state
    // approx_percentile form for open key spaces — same schema,
    // SkewSpec pins the equivalence and plan shape.
    "q99_skew_report" -> ((s, dir) =>
      graft.operators.Skew.skewReport(Tables.orders(s, dir), "o_custkey")),

    // q103 — exact triangle counting (operators.Triangles) on the
    // co-purchase graph: parts appearing in the same URGENT order are
    // linked; triangles measure basket-community density (the graph
    // tier's third primitive after PageRank q96 and connected
    // components q60). The degree-oriented wedge join bounds work at
    // Σ outdeg² ~ O(m^1.5) even on power-law graphs; the oracle
    // counts the same triangles orientation-free via a<b<c.
    "q103_triangle_count" -> ((s, dir) => {
      graft.llm.BarrierCache.sweepOnNewScope(s, dir)
      graft.operators.Triangles.countTriangles(
        coPurchaseEdges(s, dir), "u", "v")
    }),

    // q112 — activity streaks: gaps-and-islands over each user's
    // distinct active DAYS (`day - row_number` collapses consecutive
    // days to one anchor) — the engagement-streak metric. One window
    // shuffle per user + two integer aggregates; the q101 island
    // technique surfaced as a standalone BI operator.
    "q112_activity_streaks" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days.withColumn("rn", row_number().over(w))
        .withColumn("grp", date_sub(col("day"), col("rn")))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum(col("len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest_streak"))
        .orderBy("user_id")
    }),

    // q113 — new vs returning users per day: each user's first
    // active day splits the daily actives. First-day attach is a
    // broadcast-size aggregate at |users| rows joined back on the
    // user key.
    "q113_new_vs_returning" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val first = days.groupBy("user_id").agg(min(col("day")).as("first_day"))
      days.join(first, Seq("user_id"))
        .groupBy(col("day").cast("string").as("day"))
        .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"),
          sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L)).as("returning_users"))
        .orderBy("day")
    }),

    // q111 — rolling active users (DAU / trailing-7-day WAU): the
    // engagement staple. The scalable WAU form is contribution
    // explode — each distinct (day, user) pair contributes to 7
    // target days, then one distinct-count per target day — never a
    // per-day set union or a distinct-over-RANGE-window (which Spark
    // cannot partial-aggregate). Shuffle volume is 7·|day-user
    // pairs|, independent of window length ordering tricks.
    "q111_rolling_actives" -> ((s, dir) => {
      graft.llm.BarrierCache.sweepOnNewScope(s, dir)
      // two consumers (DAU and WAU branches) — one materialization
      val du = graft.llm.BarrierCache.track(Tables.events(s, dir)
        .select(col("ts").cast("date").as("day"), col("user_id")).distinct())
      // du is already distinct (day, user): a plain count partial-
      // aggregates where countDistinct would re-dedup
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = du
        .select(col("day"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("off"))
        .select(expr("date_add(day, off)").as("day"), col("user_id"))
        .groupBy("day").agg(countDistinct("user_id").as("wau7"))
      dau.join(wau, Seq("day"))
        .select(col("day").cast("string").as("day"), col("dau"), col("wau7"))
        .orderBy("day")
    }),

    // q109 — event-flow Markov transition matrix: per user (ordered
    // by event_id), count cur→next event-type transitions and the
    // conditional probability P(next|cur) — the flow-analysis view
    // behind funnel/journey dashboards. One lead() window per user +
    // one pair aggregate; p is one IEEE division on integer counts,
    // rounded (QueryDefs discipline).
    "q109_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type").as("cur"))
        .withColumn("next", lead(col("cur"), 1).over(w))
        .filter(col("next").isNotNull)
        .groupBy("cur", "next").agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("cur").agg(sum(col("n")).as("tot"))
      pairs.join(totals, Seq("cur"))
        .select(col("cur"), col("next"), col("n"),
          round(col("n") / col("tot"), 6).as("p"))
        .orderBy("cur", "next")
    }),

    // q110 — graph degree profile + assortativity for the q103
    // co-purchase graph: degree moments over the symmetrized edge
    // list (both endpoint orders), Pearson over integer degree pairs
    // with q98's exact discipline — integer sums < 2^53 are exact
    // doubles, so the one fixed IEEE sequence reproduces in DuckDB.
    // Negative assortativity = hubs link to leaves (the shape that
    // makes degree-orientation matter in q103).
    "q110_degree_profile" -> ((s, dir) => {
      graft.llm.BarrierCache.sweepOnNewScope(s, dir)
      val edges = coPurchaseEdges(s, dir)
      val deg = graft.llm.BarrierCache.track(
        edges.select(col("u").as("x")).unionAll(edges.select(col("v").as("x")))
          .groupBy("x").agg(count(lit(1)).as("d")))
      // ONE edge-degree join feeding both endpoint orders
      val j = graft.llm.BarrierCache.track(
        edges.join(deg.toDF("u", "du"), Seq("u"))
          .join(deg.toDF("v", "dv"), Seq("v"))
          .select(col("du"), col("dv")))
      val sym = j.select(col("du").as("a"), col("dv").as("b"))
        .unionAll(j.select(col("dv").as("a"), col("du").as("b")))
      // moment sums and their products in DECIMAL(38,0): exact at ANY
      // graph size (a long n·sxx overflows near |E| ~ 1e9 — Spark
      // would wrap where DuckDB errors, silently diverging), with a
      // single decimal→double cast on each of the three terms
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val m = sym.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("a").cast(dec)).as("sx"),
        sum((col("a") * col("a")).cast(dec)).as("sxx"),
        sum((col("a") * col("b")).cast(dec)).as("sxy"))
      deg.agg(count(lit(1)).as("n_vertices"),
          min(col("d")).as("min_deg"), max(col("d")).as("max_deg"),
          sum(col("d")).as("sum_deg"))
        .crossJoin(broadcast(m))
        .select(col("n_vertices"),
          (col("n") / 2).cast("long").as("n_edges"),
          col("min_deg"), col("max_deg"),
          round(col("sum_deg") / col("n_vertices"), 6).as("mean_deg"),
          round((col("n") * col("sxy") - col("sx") * col("sx")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))),
            6).as("assortativity"))
    }),

    // q104 — last-touch attribution: each purchase event is credited
    // to the user's most recent PRIOR non-purchase event, via the
    // as-of join (operators.AsOfJoin — one union + one window
    // shuffle, no range explosion; q68's operator applied as a BI
    // composition). event_id is the order axis (monotone with ts,
    // exact in both engines); purchases with no prior touch fall in
    // the 'none' bucket. Revenue sums are exact decimal.
    "q104_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "value")
      val touches = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id"),
          col("event_type").as("touch_type"))
      graft.operators.AsOfJoin.asOf(purchases, touches,
          Seq("user_id"), "event_id", Seq(), Seq("touch_type"))
        .groupBy(coalesce(col("touch_type"), lit("none")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          moneySum(col("value")).as("total_value"))
        .orderBy("touch_type")
    }),

    // q105 — distribution drift report: order-value histogram of a
    // baseline year vs the next, over ten equal-width bins fixed by
    // the BASELINE's [min, max] — the data-quality check a training
    // pipeline runs between corpus snapshots. All binning is exact
    // integer price units (the q92 decimal→long idiom; clamp +
    // truncating div on non-negative offsets, identical in both
    // engines); the
    // single-row bounds frame broadcasts; shares are one IEEE
    // division each, rounded. abs-share-delta is the reported drift
    // contribution (the PSI numerator without the engine-varying ln).
    "q105_drift_report" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        year(col("o_orderdate")).as("y"),
        (col("o_totalprice").cast("decimal(18,4)") * 10000).cast("long").as("c"))
        .filter(col("y").isin(1995, 1996))
      val bounds = o.filter(col("y") === 1995)
        .agg(min(col("c")).as("lo"), max(col("c")).as("hi"),
          count(lit(1)).as("n_a"))
      val nB = o.filter(col("y") === 1996).agg(count(lit(1)).as("n_b"))
      o.crossJoin(broadcast(bounds)).crossJoin(broadcast(nB))
        .withColumn("cc", least(greatest(col("c"), col("lo")), col("hi")))
        .withColumn("bin", least(
          expr("(cc - lo) div (greatest((hi - lo) div 10, 1))"), lit(9L)))
        .groupBy("bin")
        .agg(sum(when(col("y") === 1995, 1L).otherwise(0L)).as("cnt_a"),
          sum(when(col("y") === 1996, 1L).otherwise(0L)).as("cnt_b"),
          min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"))
        .select(col("bin"), col("cnt_a"), col("cnt_b"),
          round(col("cnt_a") / col("n_a"), 6).as("share_a"),
          round(col("cnt_b") / col("n_b"), 6).as("share_b"),
          round(abs(col("cnt_a") / col("n_a") - col("cnt_b") / col("n_b")), 6)
            .as("share_delta"))
        .orderBy("bin")
    }))

  val oracles: Map[String, String] = Map(
    "q18_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${oraSum("l_quantity")} AS sum_qty,
         |       ${oraSum("l_extendedprice")} AS sum_base,
         |       ${oraSum("l_extendedprice*(1.0-l_discount)")} AS sum_disc,
         |       ${oraAvg("l_quantity")} AS avg_qty,
         |       COUNT(*) AS n
         |FROM lineitem GROUP BY 1,2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q19_distinct_counts" ->
      """SELECT c_mktsegment, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q39_approx_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_orderkey) AS exact_orders,
        |       COUNT(DISTINCT l_partkey) AS exact_parts,
        |       COUNT(*) AS n,
        |       TRUE AS hll_orders_ok, TRUE AS hll_parts_ok
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q20_rollup_hierarchy" ->
      """SELECT COALESCE(category, '(all)') AS category,
        |       COALESCE(p_brand, '(all)') AS brand, COUNT(*) AS n
        |FROM (
        |  SELECT CASE WHEN p_type IN ('ECONOMY','PROMO') THEN 'Budget'
        |              WHEN p_type IN ('SMALL','MEDIUM','STANDARD') THEN 'Mid'
        |              WHEN p_type = 'LARGE' THEN 'Premium' END AS category,
        |         p_brand
        |  FROM part)
        |GROUP BY ROLLUP(category, p_brand)
        |ORDER BY 1, 2""".stripMargin,
    "q21_topk_per_brand" ->
      """SELECT p_brand, rnk, p_partkey, CAST(rev AS DOUBLE) AS revenue FROM (
        |  SELECT p_brand, p_partkey, rev,
        |         row_number() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) AS rnk
        |  FROM (
        |    SELECT p_brand, p_partkey,
        |           SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS rev
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    GROUP BY 1, 2))
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q22_daily_trend" ->
      s"""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n, ${oraSum("value")} AS total
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q23_running_total" ->
      """SELECT day, CAST(dec_daily AS DOUBLE) AS daily,
        |       CAST(SUM(dec_daily) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum
        |FROM (
        |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS dec_daily
        |  FROM orders GROUP BY 1)
        |ORDER BY day""".stripMargin,
    "q24_lag_delta" ->
      """SELECT day, CAST(dec_daily AS DOUBLE) AS daily,
        |       CAST(dec_daily - lag(dec_daily, 1) OVER (ORDER BY day) AS DOUBLE) AS delta
        |FROM (
        |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS dec_daily
        |  FROM orders GROUP BY 1)
        |ORDER BY day""".stripMargin,
    // real JSON parsing, not a regex: json_type gates to integer
    // values (from_json(k INT) nulls floats) and the INTEGER
    // TRY_CAST nulls 32-bit overflow exactly like Spark's IntegerType
    "q25_json_props" ->
      """WITH j AS (
        |  SELECT event_type,
        |    TRY_CAST(CASE WHEN json_type(json_extract(props, '$.k')) IN ('BIGINT', 'UBIGINT')
        |      THEN json_extract_string(props, '$.k') END AS INTEGER) AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(k) AS BIGINT) AS sum_k,
        |       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
        |FROM j GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q40_tumbling_window" ->
      s"""SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS VARCHAR) AS window_start,
         |       event_type, COUNT(*) AS n, ${oraSum("value")} AS total
         |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q41_customers_no_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q43_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50_qty,
        |       quantile_cont(l_quantity, 0.9) AS p90_qty,
        |       quantile_cont(l_quantity, 0.99) AS p99_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q57_approx_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50_qty,
        |       quantile_cont(l_quantity, 0.9) AS p90_qty,
        |       quantile_cont(l_quantity, 0.99) AS p99_qty,
        |       COUNT(*) AS n,
        |       TRUE AS sketch_p50_ok, TRUE AS sketch_p90_ok,
        |       TRUE AS sketch_p99_ok
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q44_pivot_matrix" ->
      s"""SELECT l_returnflag,
         |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
         |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
         |  CAST(SUM(CASE WHEN l_linestatus = 'P' THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
         |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q46_cube_status" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |       COALESCE(o_orderpriority, '(all)') AS priority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q49_customers_both" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '5-LOW')
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q50_region_year_revenue" ->
      s"""SELECT r_name AS region, CAST(year(o_orderdate) AS BIGINT) AS yr,
         |       ${oraSum("l_extendedprice*(1.0-l_discount)")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2 ORDER BY region, yr""".stripMargin,
    "q51_brand_share" ->
      """SELECT p_brand, p_partkey, CAST(rev AS DOUBLE) AS revenue,
        |       CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY p_brand) AS DOUBLE) AS share
        |FROM (
        |  SELECT p_brand, p_partkey,
        |         SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "q26_sessionize" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id, event_id,
        |         CASE WHEN prev IS NULL OR epoch_s - prev > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM (
        |    SELECT user_id, event_id, epoch_s,
        |           lag(epoch_s, 1) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS prev
        |    FROM (SELECT user_id, event_id,
        |                 epoch_ns(ts) // 1000000000 AS epoch_s FROM events)))
        |GROUP BY 1 ORDER BY user_id""".stripMargin,
    // Spark session_window's gap boundary is INCLUSIVE: an event
    // exactly `gap` after the previous one still MERGES (verified
    // empirically; sf0.1 has exact-1800s gaps that exposed it), so a
    // new session starts strictly beyond the gap.
    "q53_session_window" ->
      """WITH base AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 AS epoch_s FROM events),
        |marked AS (
        |  SELECT user_id, epoch_s,
        |         CASE WHEN lag(epoch_s) OVER w IS NULL
        |               OR epoch_s - lag(epoch_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s)),
        |sessions AS (
        |  SELECT user_id,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY epoch_s, new_session DESC
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, session_id, COUNT(*) AS n
        |  FROM sessions GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |       CAST(SUM(n) AS BIGINT) AS n_events,
        |       CAST(MAX(n) AS BIGINT) AS max_session_events
        |FROM per_session GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q54_sliding_window" ->
      s"""SELECT CAST(ws AS VARCHAR) AS window_start, event_type,
         |       COUNT(*) AS n, ${oraSum("value")} AS total
         |FROM (SELECT time_bucket(INTERVAL '30 minutes', ts)
         |               - k * INTERVAL '30 minutes' AS ws,
         |             event_type, value
         |      FROM events CROSS JOIN (VALUES (0), (1)) shifts(k))
         |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // SCD2: change points (vs previous observation), then lead() for
    // the validity interval — same two-window shape as the engine.
    "q67_scd2_history" ->
      """WITH base AS (
        |  SELECT user_id, event_id, event_type AS status,
        |         epoch_ns(ts) // 1000000000 AS epoch_s
        |  FROM events),
        |marked AS (
        |  SELECT user_id, status, epoch_s, event_id,
        |         (row_number() OVER w = 1
        |          OR status IS DISTINCT FROM lag(status) OVER w) AS chg
        |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id)),
        |chgp AS (SELECT user_id, status, epoch_s, event_id FROM marked WHERE chg)
        |SELECT user_id, status, epoch_s AS valid_from_s,
        |       lead(epoch_s) OVER w2 AS valid_to_s,
        |       CAST(row_number() OVER w2 AS BIGINT) AS version,
        |       lead(epoch_s) OVER w2 IS NULL AS is_current
        |FROM chgp WINDOW w2 AS (PARTITION BY user_id ORDER BY epoch_s, event_id)
        |ORDER BY user_id, version""".stripMargin,
    // as-of: the same union-and-forward-fill the engine runs — build
    // rows (side 0) sort before probes at equal times, ties by
    // event_id so the latest same-second purchase wins.
    "q68_asof_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value,
        |         epoch_ns(ts) // 1000000000 AS s
        |  FROM events),
        |u AS (
        |  SELECT user_id, event_id, s, 1 AS side,
        |         CAST(NULL AS BIGINT) AS ps, CAST(NULL AS DOUBLE) AS pv
        |  FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, event_id, s, 0, s, value
        |  FROM e WHERE event_type = 'purchase'),
        |f AS (
        |  SELECT user_id, event_id, s, side,
        |         last_value(ps IGNORE NULLS) OVER w AS purchase_s,
        |         last_value(pv IGNORE NULLS) OVER w AS purchase_value
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY s, side, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS click_id, user_id, s AS click_s,
        |       purchase_s, purchase_value
        |FROM f WHERE side = 1 ORDER BY click_id""".stripMargin,
    // range join: DuckDB's IEJoin handles the inequality pair join
    // directly; the engine's bucketed equi-join must produce the
    // identical pair set.
    "q69_range_join" ->
      """WITH base AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS epoch_s
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, epoch_s,
        |         CASE WHEN lag(epoch_s) OVER w IS NULL
        |               OR epoch_s - lag(epoch_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id)),
        |summed AS (
        |  SELECT user_id, epoch_s,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id
        |           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, sid, MIN(epoch_s) AS start_s, MAX(epoch_s) AS end_s
        |  FROM summed GROUP BY 1, 2)
        |SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS n_overlaps
        |FROM sess a JOIN sess b
        |  ON a.user_id < b.user_id AND a.start_s <= b.end_s AND b.start_s <= a.end_s
        |GROUP BY 1, 2 ORDER BY u1, u2""".stripMargin,
    "q71_salted_agg" ->
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS DOUBLE) AS sum_l_quantity,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // q140: the salted join must reproduce the PLAIN inner join
    "q140_salted_join" ->
      s"""SELECT s_name, COUNT(*) AS n_items,
         |       ${oraSum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY 1 ORDER BY s_name""".stripMargin,
    // q141: bloom pruning is semantically invisible — the oracle is
    // the plain selective-dim join
    "q141_bloom_pruned_join" ->
      s"""SELECT s_nationkey, COUNT(*) AS n_items,
         |       ${oraSum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |WHERE s_acctbal > 5000.0
         |GROUP BY 1 ORDER BY s_nationkey""".stripMargin,
    // q143: exact overlap counts + literal-true sketch flags (the
    // approximate-op oracle pattern)
    "q143_kmv_overlap" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio, o_custkey,
        |         CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM o),
        |h AS (
        |  SELECT prio, o_custkey,
        |         CASE WHEN (d - lo) * 2 <= (hi - lo) THEN 1 ELSE 2 END AS half
        |  FROM o, span),
        |per AS (
        |  SELECT prio, o_custkey,
        |         MAX(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS in_a,
        |         MAX(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS in_b
        |  FROM h GROUP BY 1, 2)
        |SELECT prio,
        |       CAST(SUM(in_a) AS BIGINT) AS n_a,
        |       CAST(SUM(in_b) AS BIGINT) AS n_b,
        |       CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
        |       TRUE AS a_ok, TRUE AS b_ok, TRUE AS i_ok
        |FROM per GROUP BY 1 ORDER BY prio""".stripMargin,
    // q142: exact percentiles + literal-true digest flags (q57's
    // engine-identical interpolation argument, same column)
    "q142_tdigest_rollup" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.9) AS p90,
        |       quantile_cont(l_quantity, 0.99) AS p99,
        |       COUNT(*) AS n,
        |       TRUE AS td_p50_ok, TRUE AS td_p90_ok, TRUE AS td_p99_ok
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // q152: exact fact-side percentiles + the distinct-period count
    // the persisted sketch table must reproduce; digest flags
    // literal-true as in q142
    "q152_sketch_lifecycle" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.9) AS p90,
        |       quantile_cont(l_quantity, 0.99) AS p99,
        |       COUNT(*) AS n,
        |       COUNT(DISTINCT year(l_shipdate) * 12 + month(l_shipdate)) AS n_periods,
        |       TRUE AS td_p50_ok, TRUE AS td_p90_ok, TRUE AS td_p99_ok
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q144_cohort_retention" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym
        |  FROM orders),
        |firsts AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM o GROUP BY 1),
        |j AS (
        |  SELECT o.o_custkey, cohort_ym, ym - cohort_ym AS age
        |  FROM o JOIN firsts USING (o_custkey)),
        |act AS (
        |  SELECT cohort_ym, age, COUNT(DISTINCT o_custkey) AS n_active
        |  FROM j GROUP BY 1, 2),
        |sz AS (SELECT cohort_ym, COUNT(*) AS cohort_size FROM firsts GROUP BY 1)
        |SELECT cohort_ym, age, n_active, cohort_size,
        |       CAST(n_active AS DOUBLE) / cohort_size AS retention
        |FROM act JOIN sz USING (cohort_ym)
        |ORDER BY cohort_ym, age""".stripMargin,
    // q145: same exact running-anchor formulation, replayed in SQL
    "q145_window_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, event_type
        |  FROM events),
        |s1 AS (
        |  SELECT *, MAX(CASE WHEN event_type = 'view' THEN us END) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id
        |     ROWS UNBOUNDED PRECEDING) AS last_view
        |  FROM e),
        |s2 AS (
        |  SELECT *, CASE WHEN event_type = 'click'
        |                  AND us - last_view <= 604800000000
        |                 THEN last_view END AS anchor
        |  FROM s1),
        |s3 AS (
        |  SELECT *, MAX(anchor) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id
        |     ROWS UNBOUNDED PRECEDING) AS run_anchor
        |  FROM s2),
        |per AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
        |    MAX(CASE WHEN anchor IS NOT NULL THEN 1 ELSE 0 END) AS l2,
        |    MAX(CASE WHEN event_type = 'purchase'
        |              AND us <= run_anchor + 604800000000
        |             THEN 1 ELSE 0 END) AS l3
        |  FROM s3 GROUP BY 1)
        |SELECT COUNT(*) AS n_users,
        |       CAST(SUM(l1) AS BIGINT) AS reach_view,
        |       CAST(SUM(l2) AS BIGINT) AS reach_click,
        |       CAST(SUM(l3) AS BIGINT) AS reach_purchase
        |FROM per""".stripMargin,
    // q146: ordered string_agg + the same RE2-subset pattern
    "q146_sequence_match" ->
      """WITH per AS (
        |  SELECT user_id,
        |         string_agg(event_type, ','
        |           ORDER BY epoch_ns(ts) // 1000, event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT COUNT(*) AS n_users,
        |       CAST(SUM(CASE WHEN regexp_matches(seq,
        |         'view(,(view|click))*,purchase') THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_matching
        |FROM per""".stripMargin,
    "q147_basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
        |ic AS (SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY 1),
        |pairs AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_co
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT p1, p2, n_co, i1.n_item AS n1, i2.n_item AS n2,
        |       CAST(n_co AS DOUBLE) * (SELECT n_orders FROM n)
        |         / (i1.n_item * i2.n_item) AS lift
        |FROM pairs
        |JOIN ic i1 ON p1 = i1.l_partkey
        |JOIN ic i2 ON p2 = i2.l_partkey
        |ORDER BY n_co DESC, p1, p2 LIMIT 50""".stripMargin,
    // q148: exact trailing-7-day distinct via the same calendar fan;
    // literal-true sketch flag
    "q148_sliding_distinct" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM e),
        |fan AS (
        |  SELECT e.day + CAST(o.off AS INTEGER) AS day, e.user_id
        |  FROM e CROSS JOIN (SELECT UNNEST(range(0, 7)) AS off) o),
        |ex AS (
        |  SELECT f.day, COUNT(DISTINCT f.user_id) AS n_users_7d
        |  FROM fan f JOIN days d ON f.day = d.day
        |  GROUP BY 1)
        |SELECT CAST(day AS VARCHAR) AS day, n_users_7d, TRUE AS sk_ok
        |FROM ex ORDER BY day""".stripMargin,
    // portable long-form mirror (UNION ALL rather than UNPIVOT, which
    // DuckDB spells differently per version)
    "q73_unpivot" ->
      s"""WITH wide AS (
         |  SELECT l_returnflag,
         |         ${oraSum("l_quantity")} AS qty,
         |         ${oraSum("l_extendedprice")} AS price,
         |         ${oraSum("l_discount")} AS discount
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'qty' AS metric, qty AS value FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'price', price FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'discount', discount FROM wide
         |ORDER BY l_returnflag, metric""".stripMargin,
    "q84_pct_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q86_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,
    "q87_range_frame" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS dec_daily
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT day, dec_daily,
        |         date_diff('day', DATE '1970-01-01', day) AS pos
        |  FROM daily)
        |SELECT CAST(day AS VARCHAR) AS day,
        |       CAST(dec_daily AS DOUBLE) AS total,
        |       CAST(SUM(dec_daily) OVER w AS DOUBLE) / COUNT(*) OVER w AS cal7_mean,
        |       COUNT(*) OVER w AS days_present
        |FROM p
        |WINDOW w AS (ORDER BY pos RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q91_basket_lift" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |pairs AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_ab
        |  FROM ob a JOIN ob b USING (okey) WHERE a.brand < b.brand
        |  GROUP BY 1, 2),
        |tot AS (SELECT brand, COUNT(*) AS nb FROM ob GROUP BY 1),
        |tn AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob)
        |SELECT brand_a, brand_b, n_ab, ta.nb AS n_a, tb.nb AS n_b,
        |       CAST(n_ab * n_orders AS DOUBLE) / (ta.nb * tb.nb) AS lift
        |FROM pairs JOIN tot ta ON ta.brand = brand_a
        |           JOIN tot tb ON tb.brand = brand_b
        |           CROSS JOIN tn
        |ORDER BY n_ab DESC, brand_a, brand_b LIMIT 20""".stripMargin,
    "q92_robust_outliers" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS c
        |  FROM lineitem),
        |med AS (SELECT flag, quantile_cont(c, 0.5) AS med FROM li GROUP BY 1),
        |j AS (SELECT li.flag AS flag, c, med, abs(c - med) AS ad
        |      FROM li JOIN med USING (flag)),
        |mad AS (SELECT flag, quantile_cont(ad, 0.5) AS mad FROM j GROUP BY 1)
        |SELECT j.flag AS flag, COUNT(*) AS n, MIN(med) AS median_cents,
        |       MIN(mad) AS mad_cents,
        |       CAST(SUM(CASE WHEN ad > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       CAST(CAST(SUM(CASE WHEN ad > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*) AS pct_outliers
        |FROM j JOIN mad USING (flag)
        |GROUP BY 1 ORDER BY flag""".stripMargin,
    "q94_winsorized_stats" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS c
        |  FROM lineitem),
        |pct AS (SELECT flag, quantile_cont(c, 0.05) AS p05,
        |               quantile_cont(c, 0.95) AS p95
        |        FROM li GROUP BY 1),
        |a AS (
        |  SELECT li.flag AS flag, COUNT(*) AS n,
        |         CAST(SUM(CASE WHEN c < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
        |         CAST(SUM(CASE WHEN c > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
        |         CAST(SUM(CASE WHEN c >= p05 AND c <= p95 THEN c ELSE 0 END) AS BIGINT) AS mid,
        |         MIN(p05) AS p05_cents, MIN(p95) AS p95_cents
        |  FROM li JOIN pct USING (flag) GROUP BY 1)
        |SELECT flag, n, n_clip_low, n_clip_high, p05_cents, p95_cents,
        |       (CAST(mid AS DOUBLE) + n_clip_low * p05_cents
        |        + n_clip_high * p95_cents) / n AS win_mean_cents
        |FROM a ORDER BY flag""".stripMargin,
    // exact-integer PageRank replay: pico-unit ranks, floor division,
    // zero-weight self edges keep every nation in each step
    "q96_trade_pagerank" ->
      """WITH RECURSIVE
        |realE AS (
        |  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS src,
        |                  CAST(c_nationkey AS BIGINT) AS dst
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey <> c_nationkey),
        |deg AS (SELECT src, COUNT(*) AS degs FROM realE GROUP BY 1),
        |ee AS (
        |  SELECT r.src, r.dst, CAST(1 AS BIGINT) AS w, d.degs
        |  FROM realE r JOIN deg d USING (src)
        |  UNION ALL
        |  SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
        |         CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        |  FROM nation),
        |pr(it, node, r) AS (
        |  SELECT 0, CAST(n_nationkey AS BIGINT), CAST(1000000000000 AS BIGINT)
        |  FROM nation
        |  UNION ALL
        |  SELECT p.it + 1, e.dst,
        |         CAST(150000000000 + 85 * SUM(e.w * (p.r // e.degs)) // 100 AS BIGINT)
        |  FROM pr p JOIN ee e ON e.src = p.node
        |  WHERE p.it < 5
        |  GROUP BY p.it, e.dst)
        |SELECT n_name, node, r AS rank_pico
        |FROM pr JOIN nation ON CAST(n_nationkey AS BIGINT) = node
        |WHERE it = 5
        |ORDER BY rank_pico DESC, node""".stripMargin,
    "q99_skew_report" ->
      """WITH per AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
        |SELECT COUNT(*) AS n_keys,
        |       CAST(SUM(n) AS BIGINT) AS total,
        |       MAX(n) AS max_per_key,
        |       quantile_cont(n, 0.5) AS p50_per_key,
        |       quantile_cont(n, 0.99) AS p99_per_key,
        |       CAST(MAX(n) AS DOUBLE) /
        |         (CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) / COUNT(*)) AS skew_ratio
        |FROM per""".stripMargin,
    // orientation-free triangle enumeration (a<b<c) counts the same
    // set the degree-oriented wedge join counts
    "q103_triangle_count" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                       WHERE o_orderpriority = '1-URGENT')),
        |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |vs AS (SELECT COUNT(DISTINCT x) AS n_vertices FROM
        |        (SELECT u AS x FROM e UNION ALL SELECT v FROM e)),
        |es AS (SELECT COUNT(*) AS n_edges FROM e),
        |tri AS (SELECT COUNT(*) AS n_triangles
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
        |       CAST(n_edges AS BIGINT) AS n_edges,
        |       CAST(n_triangles AS BIGINT) AS n_triangles
        |FROM vs, es, tri""".stripMargin,
    "q112_activity_streaks" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id,
        |         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |                    AS INTEGER) AS grp
        |  FROM du),
        |st AS (SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |       COUNT(*) AS n_streaks, MAX(len) AS longest_streak
        |FROM st GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q113_new_vs_returning" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS first_day FROM du GROUP BY 1)
        |SELECT CAST(day AS VARCHAR) AS day,
        |       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |       CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
        |FROM du JOIN f USING (user_id)
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q111_rolling_actives" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1),
        |contrib AS (SELECT day + CAST(g.i AS INTEGER) AS day, user_id
        |            FROM du, generate_series(0, 6) AS g(i)),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau7 FROM contrib GROUP BY 1)
        |SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau7
        |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin,
    "q109_event_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next
        |  FROM events),
        |c AS (SELECT cur, next, COUNT(*) AS n FROM p WHERE next IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT cur, next, CAST(n AS BIGINT) AS n,
        |       round(CAST(n AS DOUBLE) / tot, 6) AS p
        |FROM c JOIN t USING (cur) ORDER BY cur, next""".stripMargin,
    // same symmetrized-moment algebra; the sqrt-times-sqrt
    // denominator repeats the Spark op sequence verbatim
    "q110_degree_profile" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                       WHERE o_orderpriority = '1-URGENT')),
        |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT x, COUNT(*) AS d FROM
        |         (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |sym AS (
        |  SELECT du.d AS a, dv.d AS b
        |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
        |  UNION ALL
        |  SELECT dv.d, du.d
        |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
        |m AS (SELECT COUNT(*) AS n,
        |             CAST(SUM(a) AS BIGINT) AS sx,
        |             CAST(SUM(a * a) AS BIGINT) AS sxx,
        |             CAST(SUM(a * b) AS BIGINT) AS sxy
        |      FROM sym),
        |dm AS (SELECT COUNT(*) AS n_vertices, MIN(d) AS min_deg,
        |              MAX(d) AS max_deg, CAST(SUM(d) AS BIGINT) AS sum_deg
        |       FROM deg)
        |SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
        |       CAST(n // 2 AS BIGINT) AS n_edges,
        |       min_deg, max_deg,
        |       round(CAST(sum_deg AS DOUBLE) / n_vertices, 6) AS mean_deg,
        |       round(CAST(n * sxy - sx * sx AS DOUBLE) /
        |             (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |              sqrt(CAST(n * sxx - sx * sx AS DOUBLE))), 6)
        |         AS assortativity
        |FROM dm CROSS JOIN m""".stripMargin,
    // union-and-forward-fill replayed in SQL: build rows (side 0)
    // sort before the probe at equal order keys; IGNORE NULLS fills
    // the latest touch forward into each purchase row
    "q104_attribution" ->
      s"""WITH tagged AS (
         |  SELECT user_id, event_id, 1 AS side,
         |         CAST(NULL AS VARCHAR) AS touch_type, value
         |  FROM events WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT user_id, event_id, 0 AS side, event_type, NULL
         |  FROM events WHERE event_type <> 'purchase'),
         |filled AS (
         |  SELECT side, value,
         |         last_value(touch_type IGNORE NULLS) OVER (
         |           PARTITION BY user_id ORDER BY event_id, side
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t
         |  FROM tagged)
         |SELECT COALESCE(t, 'none') AS touch_type, COUNT(*) AS n_purchases,
         |       ${oraSum("value")} AS total_value
         |FROM filled WHERE side = 1
         |GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "q105_drift_report" ->
      """WITH o AS (
        |  SELECT EXTRACT(year FROM o_orderdate) AS y,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS c
        |  FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)),
        |bounds AS (SELECT MIN(c) AS lo, MAX(c) AS hi, COUNT(*) AS n_a
        |           FROM o WHERE y = 1995),
        |nb AS (SELECT COUNT(*) AS n_b FROM o WHERE y = 1996),
        |binned AS (
        |  SELECT y, LEAST((LEAST(GREATEST(c, lo), hi) - lo)
        |                    // GREATEST((hi - lo) // 10, 1), 9) AS bin,
        |         n_a, n_b
        |  FROM o CROSS JOIN bounds CROSS JOIN nb),
        |g AS (
        |  SELECT bin,
        |         CAST(SUM(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |         CAST(SUM(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b,
        |         MIN(n_a) AS n_a, MIN(n_b) AS n_b
        |  FROM binned GROUP BY 1)
        |SELECT CAST(bin AS BIGINT) AS bin, cnt_a, cnt_b,
        |       round(CAST(cnt_a AS DOUBLE) / n_a, 6) AS share_a,
        |       round(CAST(cnt_b AS DOUBLE) / n_b, 6) AS share_b,
        |       round(abs(CAST(cnt_a AS DOUBLE) / n_a
        |                 - CAST(cnt_b AS DOUBLE) / n_b), 6) AS share_delta
        |FROM g ORDER BY bin""".stripMargin
  )
}

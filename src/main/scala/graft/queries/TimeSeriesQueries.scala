package graft.queries

import graft.Tables
import graft.etl.Resample
import graft.operators.QCut
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDefs._

/** Time-series / BI parity tier: the pandas capabilities the
  * reference stack implies beyond plain aggregation — `resample`
  * with gap fill, `ffill` interpolation, cohort retention, funnel
  * conversion, `qcut` segmentation, `describe`. Every query keeps
  * the scale rules: no single-partition windows (qcut replaces
  * global-sort ntile with threshold classification), spines
  * broadcast, per-key grids distribute with their keys, and all
  * sums/stddevs go through exact decimals so the DuckDB hash
  * compare is bit-stable.
  */
object TimeSeriesQueries {

  val queries: Map[String, Q] = Map(
    // q75 — pandas resample('D').sum() parity: daily order revenue
    // with every calendar day in the span present, gaps zero-filled
    // (graft.etl.Resample.calendarFill — broadcast spine join; the
    // testdata really has 6 missing days in a 2405-day span).
    "q75_resample_gapfill" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("__dec"),
          count(lit(1)).as("n"))
      Resample.calendarFill(daily, "day",
          Map("__dec" -> lit(0).cast("decimal(18,4)"), "n" -> lit(0L)))
        .select(col("day").cast("string").as("day"),
          col("__dec").cast("double").as("total"), col("n"))
        .orderBy("day")
    }),

    // q76 — pandas groupby().resample('D').asfreq() + ffill(): each
    // user's daily click value on that user's full activity grid,
    // absent days forward-filled from the most recent present day
    // (Resample.gridFill + Resample.ffill; `gap` marks filled rows).
    // The first grid day per user is present by construction, so no
    // leading nulls survive.
    "q76_forward_fill" -> ((s, dir) => {
      val perDay = Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(max(col("value")).as("v"))
      val grid = Resample.gridFill(perDay, Seq("user_id"), "day")
        .withColumn("gap", col("v").isNull)
      Resample.ffill(grid, Seq("user_id"), Seq("day"), Seq("v"))
        .select(col("user_id"), col("day").cast("string").as("day"),
          col("v").as("v_filled"), col("gap"))
        .orderBy("user_id", "day")
    }),

    // q77 — cohort retention: users grouped by first-activity week,
    // distinct actives per (cohort, week offset). Weeks are Monday-
    // truncated on both engines; the cohort week comes from a window
    // min so the whole query is ONE shuffle on user_id plus the final
    // aggregate.
    "q77_cohort_retention" -> ((s, dir) => {
      val wk = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
        .withColumn("cohort_week",
          min(col("week")).over(Window.partitionBy("user_id")))
      wk.groupBy(col("cohort_week").cast("string").as("cohort_week"),
          expr("datediff(week, cohort_week) div 7").cast("long").as("offset_wk"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "offset_wk")
    }),

    // q78 — ordered funnel (signup → click → purchase): a user
    // converts a stage only with an event at-or-after the previous
    // stage's conversion time. Three chained window minima over ONE
    // user_id partitioning (one shuffle), then a global count row —
    // no per-user collect, no self-joins.
    "q78_funnel_stages" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("s"))
      val staged = e
        .withColumn("t1",
          min(when(col("event_type") === "signup", col("s"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("s") >= col("t1"),
            col("s"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("s") >= col("t2"),
            col("s"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      staged.agg(
        count(lit(1)).as("n_users"),
        count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_click_after_signup"),
        count(col("t3")).as("n_purchase_after_click"),
        (count(col("t2")).cast("double") / count(col("t1"))).as("click_rate"),
        (count(col("t3")).cast("double") / count(col("t2"))).as("purchase_rate"))
    }),

    // q79 — RFM segmentation via qcut (graft.operators.QCut): exact
    // quartile thresholds + map-side classification — the scale-safe
    // replacement for ntile's single-partition global sort. Tiles
    // are by VALUE (1 = lowest quartile): recency counts days since
    // the customer's last order vs the dataset's last day.
    "q79_rfm_segments" -> ((s, dir) => {
      // the per-customer aggregate feeds the RFM frame, the global
      // reference day, AND the quantile thresholds — without a
      // barrier, each branch re-scans and re-shuffles orders (8
      // parquet scans observed); with it, orders is read once
      graft.llm.BarrierCache.sweepOnNewScope(s, dir)
      val per = graft.llm.BarrierCache.track(Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("last_day"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast("decimal(18,4)")).as("mon")))
      val ref = per.agg(max(col("last_day")).as("ref_day"))
      val rfm = per.crossJoin(broadcast(ref))
        .withColumn("recency_d", datediff(col("ref_day"), col("last_day")).cast("long"))
        .withColumn("mon_d", col("mon").cast("double"))
      val tiled = QCut.qcutMany(rfm,
        Seq((col("recency_d"), "r_tile"), (col("freq"), "f_tile"),
          (col("mon_d"), "m_tile")), 4)
      tiled.groupBy("r_tile", "f_tile", "m_tile")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r_tile", "f_tile", "m_tile")
    }),

    // q81 — pandas interpolate(method='linear'): the q76 grid with
    // gaps LINEARLY interpolated between the neighboring present
    // days instead of step-filled (Resample.interpolateLinear — two
    // window frames over one user_id shuffle). Every user's grid
    // edge days are present by construction, so no nulls survive.
    "q81_interpolate" -> ((s, dir) => {
      val perDay = Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(max(col("value")).as("v"))
      val grid = Resample.gridFill(perDay, Seq("user_id"), "day")
        .withColumn("gap", col("v").isNull)
        .withColumn("pos", unix_date(col("day")))
      Resample.interpolateLinear(grid, Seq("user_id"), "pos", "v")
        .select(col("user_id"), col("day").cast("string").as("day"),
          col("v").as("v_interp"), col("gap"))
        .orderBy("user_id", "day")
    }),

    // q82 — pandas rolling(7).mean() + pct_change() over the
    // zero-filled daily revenue calendar (composes q75's
    // calendarFill): the rolling mean divides an exact decimal
    // frame-sum by the frame count, so segment-tree vs sliding
    // summation order can't drift the hash. The global day window is
    // post-aggregation (|days| rows, bounded by wall-clock) — the
    // one place a single-partition window is the RIGHT plan.
    "q82_rolling_mean" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("__dec"),
          count(lit(1)).as("n"))
      val filled = Resample.calendarFill(daily, "day",
        Map("__dec" -> lit(0).cast("decimal(18,4)"), "n" -> lit(0L)))
      val w7 = Window.orderBy("day").rowsBetween(-6, 0)
      val w1 = Window.orderBy("day")
      filled.select(col("day").cast("string").as("day"),
          col("__dec").cast("double").as("total"),
          (sum(col("__dec")).over(w7).cast("double") /
            count(lit(1)).over(w7)).as("roll7_mean"),
          when(lag(col("__dec"), 1).over(w1) =!= 0,
            col("__dec").cast("double") /
              lag(col("__dec"), 1).over(w1).cast("double") - 1)
            .as("pct_change"))
        .orderBy("day")
    }),

    // q80 — pandas describe() parity per return flag: count, mean,
    // std, min, quartiles, max. The stddev is NOT Spark's stddev
    // (float merge order varies); it's the exact-decimal moments
    // formula — decimal sum and sum-of-squares, then one fixed
    // sequence of IEEE double ops identical on both engines. The std
    // is rounded to 4 decimals: the sum-of-squares decimal exceeds
    // 2^53, and DuckDB's int128-backed decimal→double DOUBLE-ROUNDS
    // (int→double, then the scale division) where Spark converts in
    // one rounding — a last-ulp divergence seen at sf0.001.
    "q80_describe_stats" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
      def stdOf(ss: String, sm: String) =
        round(sqrt((col(ss).cast("double") -
          col(sm).cast("double") * col(sm).cast("double") / col("n")) /
          (col("n") - 1)), 4)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).as("__qs"),
          sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("__qss"),
          min(col("l_quantity")).as("qty_min"),
          expr("percentile(l_quantity, 0.25)").as("qty_p25"),
          expr("percentile(l_quantity, 0.5)").as("qty_p50"),
          expr("percentile(l_quantity, 0.75)").as("qty_p75"),
          max(col("l_quantity")).as("qty_max"),
          sum(dec(col("l_extendedprice"))).as("__ps"),
          sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice"))).as("__pss"))
        .select(col("l_returnflag"), col("n"),
          (col("__qs").cast("double") / col("n")).as("qty_mean"),
          stdOf("__qss", "__qs").as("qty_std"),
          col("qty_min"), col("qty_p25"), col("qty_p50"), col("qty_p75"),
          col("qty_max"),
          (col("__ps").cast("double") / col("n")).as("price_mean"),
          stdOf("__pss", "__ps").as("price_std"))
        .orderBy("l_returnflag")
    }),

    // q93 — time-series anomaly flag: each day's revenue against the
    // mean of its trailing 28 calendar days (RANGE frame ending at
    // 1 PRECEDING, so a spike never dilutes its own baseline; sparse
    // days shrink the frame, q87 machinery). Exact decimal frame
    // sums; the flag is one compare against 1.5× the baseline mean
    // (1.5 binary-exact), coalesced false while no baseline exists.
    "q93_spike_days" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("__dec"))
        .withColumn("pos", unix_date(col("day")))
      val w = Window.orderBy("pos").rangeBetween(-28, -1)
      daily.select(col("day").cast("string").as("day"),
          col("__dec").cast("double").as("total"),
          count(lit(1)).over(w).as("n_baseline"),
          (sum(col("__dec")).over(w).cast("double") /
            count(lit(1)).over(w)).as("baseline_mean"))
        .withColumn("is_spike",
          coalesce(col("total") > lit(1.5) * col("baseline_mean"), lit(false)))
        .orderBy("day")
    }),

    // q98 — pandas corr()/regression parity per return flag: Pearson
    // correlation and OLS slope of price on quantity from exact
    // decimal moments (q80's discipline: one decimal-sum pass, then
    // one fixed IEEE op sequence, rounded to 6 — never Spark's
    // float-merge corr). One shuffle, five decimal sums.
    "q98_correlation" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
      def d(n: String) = col(n).cast("double")
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).as("__sx"),
          sum(dec(col("l_extendedprice"))).as("__sy"),
          sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("__sxx"),
          sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice"))).as("__syy"),
          sum(dec(col("l_quantity")) * dec(col("l_extendedprice"))).as("__sxy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * d("__sxy") - d("__sx") * d("__sy")) /
            (sqrt(col("n") * d("__sxx") - d("__sx") * d("__sx")) *
             sqrt(col("n") * d("__syy") - d("__sy") * d("__sy"))), 6).as("corr"),
          round((col("n") * d("__sxy") - d("__sx") * d("__sy")) /
            (col("n") * d("__sxx") - d("__sx") * d("__sx")), 6).as("beta"))
        .orderBy("l_returnflag")
    }))

  val oracles: Map[String, String] = Map(
    "q75_resample_gapfill" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS dec_daily,
        |         COUNT(*) AS n
        |  FROM orders GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |           CAST((SELECT MIN(day) FROM daily) AS TIMESTAMP),
        |           CAST((SELECT MAX(day) FROM daily) AS TIMESTAMP),
        |           INTERVAL 1 DAY)) AS DATE) AS day)
        |SELECT CAST(s.day AS VARCHAR) AS day,
        |       CAST(COALESCE(dec_daily, 0) AS DOUBLE) AS total,
        |       COALESCE(n, 0) AS n
        |FROM spine s LEFT JOIN daily d ON s.day = d.day
        |ORDER BY day""".stripMargin,
    "q76_forward_fill" ->
      """WITH per AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, MAX(value) AS v
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |bounds AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM per GROUP BY 1),
        |spine AS (
        |  SELECT user_id, CAST(unnest(generate_series(
        |    CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT s.user_id, s.day, p.v
        |  FROM spine s LEFT JOIN per p ON s.user_id = p.user_id AND s.day = p.day)
        |SELECT user_id, CAST(day AS VARCHAR) AS day,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        |       v IS NULL AS gap
        |FROM j ORDER BY user_id, day""".stripMargin,
    "q77_cohort_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, week, MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM wk)
        |SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
        |       date_diff('day', cohort_week, week) // 7 AS offset_wk,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY cohort_week, offset_wk""".stripMargin,
    "q78_funnel_stages" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS s FROM events),
        |s1 AS (
        |  SELECT user_id, event_type, s,
        |         MIN(CASE WHEN event_type = 'signup' THEN s END)
        |           OVER (PARTITION BY user_id) AS t1
        |  FROM e),
        |s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND s >= t1 THEN s END)
        |              OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND s >= t2 THEN s END)
        |              OVER (PARTITION BY user_id) AS t3
        |  FROM s2),
        |per AS (
        |  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        |  FROM s3 GROUP BY 1)
        |SELECT COUNT(*) AS n_users,
        |       COUNT(t1) AS n_signup,
        |       COUNT(t2) AS n_click_after_signup,
        |       COUNT(t3) AS n_purchase_after_click,
        |       CAST(COUNT(t2) AS DOUBLE) / COUNT(t1) AS click_rate,
        |       CAST(COUNT(t3) AS DOUBLE) / COUNT(t2) AS purchase_rate
        |FROM per""".stripMargin,
    "q79_rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day,
        |         COUNT(*) AS freq,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS mon
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT o_custkey,
        |         date_diff('day', last_day, (SELECT MAX(last_day) FROM per)) AS recency_d,
        |         freq, CAST(mon AS DOUBLE) AS mon_d
        |  FROM per),
        |q AS (
        |  SELECT quantile_cont(recency_d, 0.25) AS r1, quantile_cont(recency_d, 0.50) AS r2,
        |         quantile_cont(recency_d, 0.75) AS r3,
        |         quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.50) AS f2,
        |         quantile_cont(freq, 0.75) AS f3,
        |         quantile_cont(mon_d, 0.25) AS m1, quantile_cont(mon_d, 0.50) AS m2,
        |         quantile_cont(mon_d, 0.75) AS m3
        |  FROM r),
        |b AS (
        |  SELECT CAST(1 + CAST(recency_d > r1 AS INT) + CAST(recency_d > r2 AS INT)
        |           + CAST(recency_d > r3 AS INT) AS BIGINT) AS r_tile,
        |         CAST(1 + CAST(freq > f1 AS INT) + CAST(freq > f2 AS INT)
        |           + CAST(freq > f3 AS INT) AS BIGINT) AS f_tile,
        |         CAST(1 + CAST(mon_d > m1 AS INT) + CAST(mon_d > m2 AS INT)
        |           + CAST(mon_d > m3 AS INT) AS BIGINT) AS m_tile
        |  FROM r CROSS JOIN q)
        |SELECT r_tile, f_tile, m_tile, COUNT(*) AS n_customers
        |FROM b GROUP BY 1, 2, 3 ORDER BY r_tile, f_tile, m_tile""".stripMargin,
    "q81_interpolate" ->
      """WITH per AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, MAX(value) AS v
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |bounds AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM per GROUP BY 1),
        |spine AS (
        |  SELECT user_id, CAST(unnest(generate_series(
        |    CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT s.user_id, s.day, p.v,
        |         date_diff('day', DATE '1970-01-01', s.day) AS pos
        |  FROM spine s LEFT JOIN per p ON s.user_id = p.user_id AND s.day = p.day),
        |f AS (
        |  SELECT user_id, day, v, pos,
        |         last_value(v IGNORE NULLS) OVER wf AS pv,
        |         last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER wf AS pt,
        |         first_value(v IGNORE NULLS) OVER wb AS nv,
        |         first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER wb AS nt
        |  FROM j
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY pos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wb AS (PARTITION BY user_id ORDER BY pos
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, CAST(day AS VARCHAR) AS day,
        |       CASE WHEN v IS NOT NULL THEN v
        |            WHEN pv IS NOT NULL AND nv IS NOT NULL
        |            THEN pv + (nv - pv) * (CAST(pos AS DOUBLE) - CAST(pt AS DOUBLE))
        |                   / (CAST(nt AS DOUBLE) - CAST(pt AS DOUBLE))
        |       END AS v_interp,
        |       v IS NULL AS gap
        |FROM f ORDER BY user_id, day""".stripMargin,
    "q82_rolling_mean" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS dec_daily
        |  FROM orders GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |           CAST((SELECT MIN(day) FROM daily) AS TIMESTAMP),
        |           CAST((SELECT MAX(day) FROM daily) AS TIMESTAMP),
        |           INTERVAL 1 DAY)) AS DATE) AS day),
        |filled AS (
        |  SELECT s.day, COALESCE(dec_daily, 0) AS dec_daily
        |  FROM spine s LEFT JOIN daily d ON s.day = d.day)
        |SELECT CAST(day AS VARCHAR) AS day,
        |       CAST(dec_daily AS DOUBLE) AS total,
        |       CAST(SUM(dec_daily) OVER w7 AS DOUBLE) / COUNT(*) OVER w7 AS roll7_mean,
        |       CASE WHEN lag(dec_daily, 1) OVER (ORDER BY day) <> 0
        |            THEN CAST(dec_daily AS DOUBLE)
        |                   / CAST(lag(dec_daily, 1) OVER (ORDER BY day) AS DOUBLE) - 1
        |       END AS pct_change
        |FROM filled
        |WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q80_describe_stats" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qs,
        |         -- the DECIMAL(19,4) operand forces int128 storage: DuckDB's
        |         -- int64-backed DECIMAL(18)*DECIMAL(18) multiply overflows on
        |         -- price-scale squares (the values are exact either way)
        |         SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS qss,
        |         MIN(l_quantity) AS qty_min,
        |         quantile_cont(l_quantity, 0.25) AS qty_p25,
        |         quantile_cont(l_quantity, 0.50) AS qty_p50,
        |         quantile_cont(l_quantity, 0.75) AS qty_p75,
        |         MAX(l_quantity) AS qty_max,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS ps,
        |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS pss
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |       CAST(qs AS DOUBLE) / n AS qty_mean,
        |       round(sqrt((CAST(qss AS DOUBLE) - CAST(qs AS DOUBLE) * CAST(qs AS DOUBLE) / n) / (n - 1)), 4) AS qty_std,
        |       qty_min, qty_p25, qty_p50, qty_p75, qty_max,
        |       CAST(ps AS DOUBLE) / n AS price_mean,
        |       round(sqrt((CAST(pss AS DOUBLE) - CAST(ps AS DOUBLE) * CAST(ps AS DOUBLE) / n) / (n - 1)), 4) AS price_std
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q93_spike_days" ->
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
        |       COUNT(*) OVER w AS n_baseline,
        |       CAST(SUM(dec_daily) OVER w AS DOUBLE) / COUNT(*) OVER w AS baseline_mean,
        |       COALESCE(CAST(dec_daily AS DOUBLE) >
        |                1.5 * (CAST(SUM(dec_daily) OVER w AS DOUBLE) / COUNT(*) OVER w),
        |                FALSE) AS is_spike
        |FROM p
        |WINDOW w AS (ORDER BY pos RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING)
        |ORDER BY day""".stripMargin,
    // the DECIMAL(19,4) operand on each product forces int128 (q80)
    "q98_correlation" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
        |         SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS sxx,
        |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS syy,
        |         SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |             (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |              sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr,
        |       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |             (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta
        |FROM a ORDER BY l_returnflag""".stripMargin
  )
}

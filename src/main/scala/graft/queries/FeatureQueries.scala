package graft.queries

import graft.Tables.t
import graft.events.EventFeatures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived-feature coverage (reference: docs/feature_examples.md — weekly
  * windows, gradients, quantiles, inter-event intervals). All formulas
  * reduce to exact integer sums with one final double division, so the
  * DuckDB oracle matches bit-for-bit. */
object FeatureQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Quantize-6 the four published OLS floats (the f42/ewma lesson:
    * raw libm-path doubles drift at the last ulp across DuckDB
    * versions; the operator itself stays full-precision). */
  private def olsQ6(df: DataFrame): DataFrame =
    Seq("slope", "intercept", "r2", "pearson").foldLeft(df) { (d, c) =>
      d.withColumn(c, graft.functions.q6(col(c)))
    }

  val queries: Map[String, Q] = Map(
    // F14: point-in-time training matrix — purchase labels pick up the
    // latest view value and the cumulative click count visible at each
    // label's own timestamp (no leakage); oracle = two native DuckDB
    // ASOF LEFT JOINs.
    "q_f14_training_matrix" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val labels = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").as("label"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(round(max(col("value")), 2).as("last_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("n_cum",
          sum(col("__c")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id")).orderBy(col("ts"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)).cast("long"))
        .drop("__c")
      graft.ml.FeaturePrep.pointInTimeMatrix(labels, Seq("user_id"),
          "ts", Seq(("view", views, "ts"), ("clicks", clicks, "ts")))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },

    // F16: grouped OLS — native regr_slope/intercept/r2 aggregates
    // cross-checked against DuckDB's own regr_* family (one
    // moment-state exchange per group; raw doubles, the driver's
    // relative tolerance absorbs the last-ulp Welford-merge delta).
    "q_f16_grouped_ols" -> { (s, dir) =>
      // published OLS floats quantize-6 in the wrapper (the f42/ewma
      // lesson: raw libm-path doubles drift at the last ulp across
      // DuckDB versions; operator stays full-precision)
      olsQ6(graft.ml.Stats.groupedOls(t(s, dir, "lineitem"),
          Seq("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
        .withColumn("n", col("n").cast("long")))
        .orderBy(col("l_returnflag"))
    },

    // E24: purchase-cadence trend — per-user OLS slope of the inter-
    // purchase gap (seconds) against its 1-based index; negative
    // slope = accelerating cadence. Composes the gap window with the
    // F16 regression aggregates.
    "q_e24_cadence_trend" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .withColumn("gap_sec",
          (unix_timestamp(col("ts")) - unix_timestamp(col("__prev")))
            .cast("double"))
        .withColumn("idx", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))).cast("double"))
      olsQ6(graft.ml.Stats.groupedOls(gaps, Seq("user_id"),
          col("gap_sec"), col("idx"))
        .withColumn("n", col("n").cast("long")))
        .orderBy(col("user_id"))
    },

    // F17: leave-one-out target encoding of order priority against the
    // is-fulfilled label — exact 0/1 sums, one final division, encoding
    // computed over ALL rows, output sampled deterministically.
    "q_f17_target_encode" -> { (s, dir) =>
      graft.ml.Stats.targetEncodeLoo(t(s, dir, "orders"),
          col("o_orderpriority"), (col("o_orderstatus") === "F").cast("double"))
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("encoded"))
        .orderBy(col("o_orderkey"))
    },

    // E1: weekly activity buckets (count + value sum per entity-week).
    "q_e1_weekly_activity" -> { (s, dir) =>
      EventFeatures.weeklyActivity(t(s, dir, "events"), "view")
        .orderBy(col("user_id"), col("week"))
    },

    // E2: gradient of weekly event count per entity.
    "q_e2_weekly_gradient" -> { (s, dir) =>
      EventFeatures.weeklyCountGradient(t(s, dir, "events"), "click")
        .orderBy(col("user_id"))
    },

    // E3: rank-based 0.9-quantile of purchase values per entity.
    "q_e3_value_quantile" -> { (s, dir) =>
      EventFeatures.valueQuantile(t(s, dir, "events"), "purchase", 0.9)
        .orderBy(col("user_id"))
    },

    // E4: inter-purchase interval stats per entity.
    "q_e4_purchase_intervals" -> { (s, dir) =>
      EventFeatures.interEventIntervals(t(s, dir, "events"), "purchase")
        .orderBy(col("user_id"))
    },

    // E5: weekly average of daily maximum purchase value.
    "q_e5_weekly_avg_daily_max" -> { (s, dir) =>
      EventFeatures.weeklyAvgDailyMax(t(s, dir, "events"), "purchase")
        .orderBy(col("user_id"), col("week"))
    },

    // E6: proportion of purchase events among all events per entity.
    "q_e6_event_proportion" -> { (s, dir) =>
      EventFeatures.eventProportion(t(s, dir, "events"), "purchase")
        .orderBy(col("user_id"))
    },

    // E7: average daily event count inside the 11am-3pm band.
    "q_e7_band_daily_avg" -> { (s, dir) =>
      EventFeatures.bandedDailyAverage(t(s, dir, "events"),
        EventFeatures.hourBand(11, 15))
        .orderBy(col("user_id"))
    },

    // E8: average daily event count on weekend days (arithmetic
    // day-of-week, engine-neutral).
    "q_e8_weekend_daily_avg" -> { (s, dir) =>
      EventFeatures.bandedDailyAverage(t(s, dir, "events"),
        EventFeatures.weekendDays())
        .orderBy(col("user_id"))
    },

    // E9: average session duration (1h-gap sessions) per entity.
    "q_e9_session_duration" -> { (s, dir) =>
      EventFeatures.avgSessionDuration(t(s, dir, "events"), 3600)
        .orderBy(col("user_id"))
    })

  val oracles: Map[String, String] = Map(
    // DuckDB's native regr_* family against Spark's — same ANSI
    // semantics, independent implementations.
    // Same gap construction (floor(epoch) truncation), same native
    // regr_* family as F16.
    "q_e24_cadence_trend" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id,
        |    CAST(CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(prev)) AS BIGINT) AS DOUBLE) AS gap_sec,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS DOUBLE) AS idx
        |  FROM g WHERE prev IS NOT NULL)
        |SELECT user_id, CAST(regr_count(gap_sec, idx) AS BIGINT) AS n,
        |  floor(regr_slope(gap_sec, idx) * 1000000.0 + 0.5)
        |    / 1000000.0 AS slope,
        |  floor(regr_intercept(gap_sec, idx) * 1000000.0 + 0.5)
        |    / 1000000.0 AS intercept,
        |  floor(regr_r2(gap_sec, idx) * 1000000.0 + 0.5)
        |    / 1000000.0 AS r2,
        |  floor(corr(gap_sec, idx) * 1000000.0 + 0.5)
        |    / 1000000.0 AS pearson
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_f16_grouped_ols" ->
      """SELECT l_returnflag,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  floor(regr_slope(l_extendedprice, l_quantity)
        |    * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor(regr_intercept(l_extendedprice, l_quantity)
        |    * 1000000.0 + 0.5) / 1000000.0 AS intercept,
        |  floor(regr_r2(l_extendedprice, l_quantity)
        |    * 1000000.0 + 0.5) / 1000000.0 AS r2,
        |  floor(corr(l_extendedprice, l_quantity)
        |    * 1000000.0 + 0.5) / 1000000.0 AS pearson
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // LOO target encoding: identical exact-sum formula, sampled output.
    "q_f17_target_encode" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(o_orderstatus = 'F' AS DOUBLE) AS y
        |  FROM orders),
        |pc AS (SELECT o_orderpriority, sum(y) AS sc, count(*) AS nc
        |       FROM base GROUP BY 1),
        |g AS (SELECT sum(y) AS sg, count(*) AS ng FROM base)
        |SELECT b.o_orderkey, b.o_orderpriority,
        |  CASE WHEN nc > 1 THEN (sc - y) / (nc - 1)
        |       ELSE (sg - y) / (ng - 1) END AS encoded
        |FROM base b JOIN pc ON pc.o_orderpriority = b.o_orderpriority, g
        |WHERE b.o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin,
    // Training matrix: two completely independent formulations — the
    // union+window Spark fold vs DuckDB's NATIVE ASOF LEFT JOIN chain.
    "q_f14_training_matrix" ->
      """WITH labels AS (
        |  SELECT user_id, ts, event_id, value AS label
        |  FROM events WHERE event_type = 'purchase'),
        |fv AS (
        |  SELECT user_id, ts, round(max(value), 2) AS view_last_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |ck0 AS (
        |  SELECT user_id, ts, count(*) AS c
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |ck AS (
        |  SELECT user_id, ts,
        |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts)
        |      AS BIGINT) AS clicks_n_cum
        |  FROM ck0),
        |j1 AS (
        |  SELECT l.user_id, l.ts, l.event_id, l.label,
        |    f.view_last_value, f.ts AS view_asof_ts
        |  FROM labels l ASOF LEFT JOIN fv f
        |    ON l.user_id = f.user_id AND l.ts >= f.ts),
        |j2 AS (
        |  SELECT j1.*, c.clicks_n_cum, c.ts AS clicks_asof_ts
        |  FROM j1 ASOF LEFT JOIN ck c
        |    ON j1.user_id = c.user_id AND j1.ts >= c.ts)
        |SELECT user_id, ts, event_id, label, view_last_value,
        |  view_asof_ts, clicks_n_cum, clicks_asof_ts
        |FROM j2 ORDER BY user_id, ts, event_id""".stripMargin,
    "q_e1_weekly_activity" ->
      """SELECT user_id,
        |  CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR) AS week,
        |  count(1) AS n, round(sum(value), 2) AS value_sum
        |FROM events WHERE event_type = 'view'
        |GROUP BY 1, 2 ORDER BY user_id, week""".stripMargin,
    "q_e2_weekly_gradient" ->
      """WITH weekly AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(date_trunc('week', ts)) / 604800) AS BIGINT) AS x,
        |    count(1) AS y
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |sums AS (
        |  SELECT user_id, count(1) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM weekly GROUP BY 1)
        |SELECT user_id,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS gradient
        |FROM sums WHERE n > 1 ORDER BY user_id""".stripMargin,
    "q_e3_value_quantile" ->
      """WITH ranked AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value, event_id) AS rn,
        |    count(1) OVER (PARTITION BY user_id) AS n
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, value AS quantile_value
        |FROM ranked WHERE rn = ceil(0.9 * n)
        |ORDER BY user_id""".stripMargin,
    "q_e5_weekly_avg_daily_max" ->
      """WITH daily AS (
        |  SELECT user_id,
        |    CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR) AS week,
        |    CAST(ts AS DATE) AS day, max(value) AS dmax
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, week, count(1) AS n_days,
        |  floor(sum(dmax) / count(1) * 10000.0 + 0.5) / 10000.0
        |    AS avg_daily_max
        |FROM daily GROUP BY user_id, week
        |ORDER BY user_id, week""".stripMargin,
    "q_e6_event_proportion" ->
      """SELECT user_id, count(1) AS n_total,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_attr,
        |  floor(CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |    AS DOUBLE) / count(1) * 1000000.0 + 0.5) / 1000000.0
        |    AS proportion
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_e7_band_daily_avg" ->
      """WITH band AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE extract(hour FROM ts) >= 11 AND extract(hour FROM ts) < 15)
        |SELECT user_id, count(1) AS n_events,
        |  CAST(count(DISTINCT day) AS BIGINT) AS n_days,
        |  floor(CAST(count(1) AS DOUBLE) / count(DISTINCT day)
        |    * 10000.0 + 0.5) / 10000.0 AS avg_daily
        |FROM band GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_e8_weekend_daily_avg" ->
      """WITH wk AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE (CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7 IN (0, 6))
        |SELECT user_id, count(1) AS n_events,
        |  CAST(count(DISTINCT day) AS BIGINT) AS n_days,
        |  floor(CAST(count(1) AS DOUBLE) / count(DISTINCT day)
        |    * 10000.0 + 0.5) / 10000.0 AS avg_daily
        |FROM wk GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_e9_session_duration" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 3600 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g),
        |d AS (
        |  SELECT user_id, session_id,
        |    date_diff('second', min(ts), max(ts)) AS dur
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, count(1) AS n_sessions,
        |  floor(CAST(sum(dur) AS DOUBLE) / count(1) * 10000.0 + 0.5)
        |    / 10000.0 AS avg_session_s
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_e4_purchase_intervals" ->
      """WITH gaps AS (
        |  SELECT user_id,
        |    date_diff('second', lag(ts) OVER w, ts) AS gap
        |  FROM events WHERE event_type = 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, count(1) AS n_gaps,
        |  CAST(max(gap) AS BIGINT) AS max_gap_s,
        |  floor(CAST(sum(gap) AS DOUBLE) / count(1) * 10000.0 + 0.5)
        |    / 10000.0 AS mean_gap_s
        |FROM gaps WHERE gap IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
}

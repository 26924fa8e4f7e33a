"""[EXT] event-analytics and time-series queries (sessionize,
funnels, retention, attribution; streaming batch twins; gapfill,
rolling, seasonal) — split from ``ext.py`` (r13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from kusuma_metamorph_etl_spark.registry import register
from kusuma_metamorph_etl_spark.sources.catalog import load_table as t
from kusuma_metamorph_etl_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

# ------------------------------------------------------- event-time windows
# Batch/stream polymorphic transforms (streaming/windows.py); the oracle
# checks batch semantics, tests/ drive the same plans through availableNow
# streaming with watermarks.

@register(
    "stream_tumbling",
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
              event_type,
              count(*) AS n_events,
              CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
       FROM events GROUP BY 1, 2""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type."""
    return tumbling_agg(t(spark, sf_dir, "events"))

@register(
    "stream_sliding",
    """WITH w AS (
         SELECT event_type, ts,
                time_bucket(INTERVAL '30 minutes', ts)
                  - unnest([INTERVAL '0 minutes', INTERVAL '30 minutes'])
                  AS window_start
         FROM events)
       SELECT window_start, event_type, count(*) AS n_events
       FROM w GROUP BY 1, 2""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes (each event in 2 windows)."""
    return sliding_agg(t(spark, sf_dir, "events"))

@register(
    "stream_session",
    """WITH o AS (
         SELECT user_id, ts, value,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL '10 minutes'
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS new_session
         FROM events),
       s AS (
         SELECT user_id, ts, value,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
         FROM o)
       SELECT min(ts) AS session_start,
              max(ts) + INTERVAL '10 minutes' AS session_end,
              user_id,
              count(*) AS n_events,
              CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
       FROM s GROUP BY user_id, session_id""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (10-minute inactivity gap) per user."""
    return session_agg(t(spark, sf_dir, "events"), gap="10 minutes")

@register(
    "evt_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) AS t_click
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS t_purchase
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""",
)
def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis ([EXT]): view → click → purchase, earliest
    time per stage at-or-after the previous stage
    (`operators/events.py::funnel_one_scan`): ONE scan of the events fact
    pivoted to per-(user, stage) sorted timestamp arrays, then pure array
    expressions — measured ~2x the k-join twin at sf0.1 (A/B note
    in-code)."""
    from kusuma_metamorph_etl_spark.operators.events import funnel_one_scan

    events = t(spark, sf_dir, "events")
    return funnel_one_scan(events, stages=["view", "click", "purchase"])

@register(
    "evt_sessionize",
    """WITH x AS (
         SELECT user_id, event_id, ts,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > 1800 * 1000000
                     THEN 1 ELSE 0 END AS ns
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, event_id, ts,
              CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS session_idx
       FROM x""",
)
def evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-grain sessionization ([EXT]): every event labeled with its
    per-user session index (30-min gap rule, integer-µs compare —
    `operators/events.py::sessionize`); the complement of the
    session_window AGGREGATE the streaming family provides."""
    from kusuma_metamorph_etl_spark.operators.events import sessionize

    events = t(spark, sf_dir, "events")
    return sessionize(events, gap_seconds=1800)

@register(
    "evt_retention",
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                  FROM events GROUP BY 1)
       SELECT f.cohort_day,
              CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                   AS INTEGER) AS day_offset,
              COUNT(DISTINCT e.user_id) AS n_users
       FROM events e JOIN f USING (user_id)
       GROUP BY 1, 2""",
)
def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle ([EXT]): first-activity-day cohorts ×
    return-day offsets (`operators/events.py::retention_cohorts`)."""
    from kusuma_metamorph_etl_spark.operators.events import retention_cohorts

    events = t(spark, sf_dir, "events")
    return retention_cohorts(events)

@register(
    "stream_attribution_join",
    """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
              p.event_id AS purchase_id, p.ts AS purchase_ts,
              p.value AS purchase_value
       FROM events c JOIN events p
         ON c.user_id = p.user_id
        AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR""",
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution join (streaming/joins.py) in batch mode;
    the genuine two-stream watermarked path is asserted equal in tests/."""
    from kusuma_metamorph_etl_spark.streaming.joins import attribution_join

    events = t(spark, sf_dir, "events")
    return attribution_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )

@register(
    "stream_dedup_first",
    """SELECT user_id, event_type, event_id, ts, value
       FROM (SELECT user_id, event_type, event_id, ts, value,
                    row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
             FROM events)
       WHERE rn = 1""",
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) — batch twin of the custom
    `applyInPandasWithState` streaming dedup (streaming/stateful.py);
    stream==batch equality is asserted in tests/."""
    from kusuma_metamorph_etl_spark.streaming.stateful import first_event_batch

    return first_event_batch(t(spark, sf_dir, "events"))

@register(
    "evt_dedup_window",
    """WITH g AS (
         SELECT *, CASE WHEN lag_us IS NULL OR us - lag_us > 600000000
                        THEN 1 ELSE 0 END AS nb
         FROM (SELECT *, epoch_us(ts) AS us,
                      lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) AS lag_us
               FROM events)),
       b AS (SELECT *, sum(nb) OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS burst
             FROM g)
       SELECT event_id, ts, user_id, event_type, value
       FROM (SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type, burst
               ORDER BY ts, event_id) AS rn FROM b)
       WHERE rn = 1""",
)
def evt_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window event dedup ([EXT]): collapse retry bursts — same
    (user, type) within 10 minutes, chained — to their first arrival
    (`operators/events.py::dedup_within_window`); the at-least-once
    ingest cleanup exact-id dedup cannot do."""
    from kusuma_metamorph_etl_spark.operators.events import dedup_within_window

    events = t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return dedup_within_window(
        events, keys=["user_id", "event_type"], window_seconds=600
    )

@register(
    "evt_paths",
    """SELECT path, count(*) AS n_users FROM (
         SELECT user_id,
                array_to_string(
                  (list(event_type ORDER BY ts, event_id))[1:3], '>'
                ) AS path
         FROM events GROUP BY user_id)
       GROUP BY path""",
)
def evt_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top entry paths ([EXT] event analytics): each user's first three
    event types in time order as a '>'-joined path, counted across users
    (`operators/events.py::event_paths`) — the GA-style path-exploration
    view; one user-keyed aggregation + one path count."""
    from kusuma_metamorph_etl_spark.operators.events import event_paths

    return event_paths(t(spark, sf_dir, "events"), depth=3)

_EPOCHD = "date_diff('day', DATE '1970-01-01', day_dt)"

@register(
    "ts_gapfill",
    f"""WITH agg AS MATERIALIZED (
          SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day_dt,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                      AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2),
        spine AS (
          SELECT priority,
                 unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day_dt
          FROM (SELECT priority, min(day_dt) AS lo, max(day_dt) AS hi
                FROM agg GROUP BY priority)),
        j AS (SELECT s.priority, s.day_dt, a.revenue
              FROM spine s LEFT JOIN agg a USING (priority, day_dt)),
        w AS (
          SELECT priority, day_dt, revenue,
            last_value(revenue IGNORE NULLS) OVER (
              PARTITION BY priority ORDER BY day_dt
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
            last_value(CASE WHEN revenue IS NOT NULL THEN {_EPOCHD} END
                       IGNORE NULLS) OVER (
              PARTITION BY priority ORDER BY day_dt
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
            first_value(revenue IGNORE NULLS) OVER (
              PARTITION BY priority ORDER BY day_dt
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
            first_value(CASE WHEN revenue IS NOT NULL THEN {_EPOCHD} END
                        IGNORE NULLS) OVER (
              PARTITION BY priority ORDER BY day_dt
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
          FROM j)
        SELECT priority, day_dt, revenue, prev_v AS revenue_ffill,
          CASE WHEN revenue IS NOT NULL THEN revenue
               WHEN prev_v IS NULL THEN next_v
               WHEN next_v IS NULL THEN prev_v
               ELSE prev_v + (next_v - prev_v) *
                    (CAST({_EPOCHD} - prev_d AS DOUBLE)
                     / CAST(next_d - prev_d AS DOUBLE)) END AS revenue_interp
        FROM w""",
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with forward fill + linear interpolation ([EXT]
    time-series; `operators/timeseries.py::gapfill`): the daily
    per-priority revenue series with every calendar hole filled —
    imputed rows keep ``revenue`` NULL so observed vs filled stays
    distinguishable."""
    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum
    from kusuma_metamorph_etl_spark.operators.timeseries import gapfill

    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day_dt"),
    ).agg(decimal_sum(F.col("o_totalprice")).alias("revenue"))
    return gapfill(daily, ["priority"], "day_dt", "revenue")

@register(
    "ts_rolling",
    """WITH agg AS MATERIALIZED (
         SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS day_dt,
                ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS revenue
         FROM orders GROUP BY 1, 2)
       SELECT custkey, day_dt, CAST(revenue AS DOUBLE) AS revenue,
              CAST(sum(revenue) OVER w AS DOUBLE) AS roll7_sum,
              count(revenue) OVER w AS roll7_n,
              CAST(sum(revenue) OVER w AS DOUBLE) / (count(revenue) OVER w)
                  AS roll7_avg
       FROM agg
       WINDOW w AS (PARTITION BY custkey ORDER BY day_dt
                    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""",
)
def ts_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling revenue per customer ([EXT] time-series;
    `operators/timeseries.py::rolling`): RANGE frame over epoch-day, so
    the sparse per-customer series windows over real time — 7 CALENDAR
    days, not 7 physical rows.  Rolling sums run in exact decimal
    (order-independent) and surface as double."""
    from kusuma_metamorph_etl_spark.functions.numeric import _exact_sum
    from kusuma_metamorph_etl_spark.operators.timeseries import rolling

    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.to_date("o_orderdate").alias("day_dt"),
    ).agg(F.round(_exact_sum(F.col("o_totalprice"), 6), 2).alias("revenue"))
    out = rolling(daily, ["custkey"], "day_dt", "revenue", days=7, out_prefix="roll7")
    return out.withColumn("revenue", F.col("revenue").cast("double"))

@register(
    "evt_rate_anomaly_family",
    """WITH d AS MATERIALIZED (
         SELECT event_type, CAST(ts AS DATE) AS day_dt,
                count(*) AS n,
                date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
         FROM events GROUP BY 1, 2, 4),
       plain AS (
         SELECT event_type, day_dt, CAST(n AS DOUBLE) AS v, ed FROM d),
       dw AS (SELECT event_type, dayofweek(day_dt) + 1 AS dow,
                     round(avg(n), 6) AS dow_mean
              FROM d GROUP BY 1, 2),
       ov AS (SELECT event_type, round(avg(n), 6) AS mean
              FROM d GROUP BY 1),
       seas AS (SELECT d.event_type, d.day_dt,
                       round(d.n - round(dw.dow_mean - ov.mean, 6), 6) AS v,
                       d.ed
                FROM d
                JOIN dw ON dw.event_type = d.event_type
                       AND dw.dow = dayofweek(d.day_dt) + 1
                JOIN ov ON ov.event_type = d.event_type),
       u AS (SELECT 'plain' AS variant, * FROM plain
             UNION ALL SELECT 'seasonal' AS variant, * FROM seas),
       w AS (
         SELECT variant, event_type, day_dt, v,
           round(avg(v) OVER win, 6) AS baseline_mean,
           round(stddev_samp(v) OVER win, 6) AS baseline_std,
           count(v) OVER win AS baseline_n
         FROM u
         WINDOW win AS (PARTITION BY variant, event_type ORDER BY ed
                        RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING))
       SELECT variant, event_type, day_dt, v,
         baseline_mean, baseline_std, baseline_n,
         CASE WHEN baseline_n >= 7 AND baseline_std > 0
              THEN round((v - baseline_mean) / baseline_std, 6) END AS z,
         abs(CASE WHEN baseline_n >= 7 AND baseline_std > 0
              THEN round((v - baseline_mean) / baseline_std, 6) END) > 3.0
             AS is_anomaly
       FROM w""",
)
def evt_rate_anomaly_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection, plain + seasonal in one tagged frame —
    r16 consolidation of the r8-green `evt_rate_anomaly` +
    `evt_rate_anomaly_seasonal` under the retire-one policy (funding
    `sim_maxsim_ann_err`).  Plain: daily per-event-type z-score against
    the trailing 28-day baseline (current day excluded, NULL during cold
    start) — the retry-storm / dropped-producer detector
    (`operators/timeseries.py::rate_anomaly`).  Seasonal: the weekly
    day-of-week profile removed BEFORE the same trailing z-score
    (`seasonal_profile` → `rate_anomaly`), so a quiet Sunday reads as
    normal and a Monday at Sunday volume reads as the anomaly.  Both
    variants windowed in one pass (PARTITION BY variant, event_type)."""
    from kusuma_metamorph_etl_spark.operators.timeseries import (
        rate_anomaly,
        seasonal_profile,
    )

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day_dt")
    ).agg(F.count(F.lit(1)).alias("n"))
    plain = rate_anomaly(daily, ["event_type"], "day_dt", "n").select(
        F.lit("plain").alias("variant"),
        "event_type",
        "day_dt",
        F.col("n").cast("double").alias("v"),
        "baseline_mean",
        "baseline_std",
        "baseline_n",
        "z",
        "is_anomaly",
    )
    des = seasonal_profile(daily, ["event_type"], "day_dt", "n").select(
        "event_type", "day_dt", "deseasonalized"
    )
    seasonal = rate_anomaly(
        des, ["event_type"], "day_dt", "deseasonalized"
    ).select(
        F.lit("seasonal").alias("variant"),
        "event_type",
        "day_dt",
        F.col("deseasonalized").alias("v"),
        "baseline_mean",
        "baseline_std",
        "baseline_n",
        "z",
        "is_anomaly",
    )
    return plain.unionByName(seasonal)

@register(
    "ts_rolling_distinct",
    """WITH du AS MATERIALIZED (
         SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
       days AS (SELECT DISTINCT d FROM du),
       fan AS (SELECT d + CAST(i AS INTEGER) AS day_dt, user_id
               FROM du, unnest(range(0, 7)) AS t(i))
       SELECT day_dt, count(DISTINCT user_id) AS exact_users
       FROM fan JOIN days ON days.d = fan.day_dt
       GROUP BY day_dt""",
)
def ts_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day ([EXT] time-series ×
    sketches; `operators/timeseries.py::rolling_distinct`): per-day HLL
    sketches fanned to their ≤7 target days and union-merged — distinct
    counts over a sliding window without re-scanning raw events (frames
    cannot decompose DISTINCT).  Same `_err` binding as
    `agg_hll_mergeable`: emits the exact rolling count, drops any day
    whose merged estimate strays beyond 5%."""
    ev = t(spark, sf_dir, "events")
    from kusuma_metamorph_etl_spark.operators.timeseries import rolling_distinct

    approx = rolling_distinct(ev, "ts", "user_id", days=7)
    exact = (
        ev.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .select(
            F.explode(F.expr("sequence(0, 6)")).alias("off"), "d", "user_id"
        )
        .select(F.date_add("d", F.col("off")).alias("day_dt"), "user_id")
        .join(
            ev.select(F.to_date("ts").alias("day_dt")).distinct(), "day_dt"
        )
        .groupBy("day_dt")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    joined = approx.join(exact, "day_dt")
    rel_err = (
        F.abs(F.col("approx_7d_distinct") - F.col("exact_users"))
        / F.col("exact_users")
    )
    return joined.filter(rel_err <= 0.05).select("day_dt", "exact_users")

@register(
    "evt_ab_lift",
    """WITH per_user AS (
         SELECT user_id, CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END
                  AS variant,
                max(CASE WHEN event_type = 'purchase' AND value > 144.0
                         THEN 1 ELSE 0 END) AS converted
         FROM events GROUP BY 1, 2),
       pv AS (SELECT variant, count(*) AS n, sum(converted) AS c
              FROM per_user GROUP BY variant),
       j AS (SELECT
               coalesce((SELECT n FROM pv WHERE variant = 'a'), 0) AS na,
               coalesce((SELECT c FROM pv WHERE variant = 'a'), 0) AS ca,
               coalesce((SELECT n FROM pv WHERE variant = 'b'), 0) AS nb,
               coalesce((SELECT c FROM pv WHERE variant = 'b'), 0) AS cb)
       SELECT CAST(na AS BIGINT) AS na, CAST(ca AS BIGINT) AS ca,
              CAST(nb AS BIGINT) AS nb, CAST(cb AS BIGINT) AS cb,
              round(CASE WHEN na > 0 THEN ca / CAST(na AS DOUBLE) END, 6)
                  AS rate_a,
              round(CASE WHEN nb > 0 THEN cb / CAST(nb AS DOUBLE) END, 6)
                  AS rate_b,
              round(CASE WHEN na > 0 AND nb > 0 THEN
                cb / CAST(nb AS DOUBLE) - ca / CAST(na AS DOUBLE) END, 6)
                  AS abs_lift,
              CASE WHEN na > 0 AND nb > 0
                    AND ca + cb > 0 AND ca + cb < na + nb THEN
                round((cb / CAST(nb AS DOUBLE) - ca / CAST(na AS DOUBLE))
                      / sqrt(((ca + cb) / CAST(na + nb AS DOUBLE))
                             * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
                             * (1.0 / na + 1.0 / nb)), 6) END AS z
       FROM j""",
)
def evt_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion lift ([EXT] event analytics; `operators/events.py::
    ab_lift`): even/odd user split, high-value-purchase conversion
    (value > 144 — a mid-rate event, so the z-test has variance to
    measure), absolute lift
    and pooled two-proportion z — one user-keyed agg + a 2-row rollup."""
    from kusuma_metamorph_etl_spark.operators.events import ab_lift

    ev = t(spark, sf_dir, "events")
    return ab_lift(
        ev,
        variant_col=F.when(F.col("user_id") % 2 == 0, "a").otherwise("b"),
        convert_when=(F.col("event_type") == "purchase")
        & (F.col("value") > 144.0),
    )

@register(
    "evt_streaks",
    """WITH days AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       isl AS (
         SELECT user_id, d,
                date_diff('day', DATE '1970-01-01', d)
                - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
         FROM days)
       SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
              count(*) AS streak_days
       FROM isl GROUP BY user_id, island""",
)
def evt_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks ([EXT] event analytics;
    `operators/events.py::activity_streaks`): gaps-and-islands over
    day-grain rows — the N-day-streak engagement feature; the distinct
    (user, day) collapse keeps windows day-bounded, never event-bounded."""
    from kusuma_metamorph_etl_spark.operators.events import activity_streaks

    return activity_streaks(t(spark, sf_dir, "events"))

@register(
    "evt_funnel_timing",
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) AS t_click
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS t_purchase
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1),
        f AS (SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
              FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
       SELECT 'view' AS stage_from, 'click' AS stage_to,
              count(t_click) AS n_converted,
              round(quantile_cont((epoch_us(t_click) - epoch_us(t_view))
                                  / 1e6, 0.5), 6) AS median_seconds,
              round(quantile_cont((epoch_us(t_click) - epoch_us(t_view))
                                  / 1e6, 0.9), 6) AS p90_seconds
       FROM f
       UNION ALL
       SELECT 'click', 'purchase', count(t_purchase),
              round(quantile_cont((epoch_us(t_purchase) - epoch_us(t_click))
                                  / 1e6, 0.5), 6),
              round(quantile_cont((epoch_us(t_purchase) - epoch_us(t_click))
                                  / 1e6, 0.9), 6)
       FROM f""",
)
def evt_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel stage-timing profile ([EXT] event analytics;
    `operators/events.py::funnel_timing`): converting users and exact
    median / p90 seconds between adjacent view→click→purchase stages —
    the "where does the funnel stall" readout, one aggregation over the
    one-scan funnel's user-grain frame."""
    from kusuma_metamorph_etl_spark.operators.events import funnel_timing

    return funnel_timing(
        t(spark, sf_dir, "events"), stages=["view", "click", "purchase"]
    )

@register(
    "evt_cohort_ltv",
    """WITH first AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
         FROM events GROUP BY user_id)
       SELECT f.cohort_day,
              date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
              count(DISTINCT e.user_id) AS n_users,
              CAST(ROUND(SUM(CAST(e.value AS DECIMAL(38,6))), 2) AS DOUBLE)
                  AS revenue
       FROM events e JOIN first f USING (user_id)
       GROUP BY 1, 2""",
)
def evt_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle ([EXT] event analytics; `operators/events.py::
    cohort_revenue`): exact-decimal revenue per (first-day cohort,
    return-day offset) — cumulative row-sums are the lifetime-value
    curves; the money twin of `evt_retention`."""
    from kusuma_metamorph_etl_spark.operators.events import cohort_revenue

    return cohort_revenue(t(spark, sf_dir, "events"))

@register(
    "ts_ewma",
    f"""WITH agg AS MATERIALIZED (
          SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day_dt,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                      AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2),
        d AS (SELECT priority, day_dt, revenue, {_EPOCHD} AS ed FROM agg),
        fan AS (
          SELECT priority, ed + t.off AS anchor,
                 CAST(round(revenue * power(0.8, t.off), 6)
                      AS DECIMAL(38,6)) AS u,
                 CAST(round(power(0.8, t.off), 9) AS DECIMAL(38,9)) AS s
          FROM d, range(0, 64) t(off)),
        sums AS (
          SELECT priority, anchor, sum(u) AS su, sum(s) AS ss
          FROM fan GROUP BY 1, 2)
        SELECT d.priority, d.day_dt, d.revenue,
               round(CAST(su AS DOUBLE) / CAST(ss AS DOUBLE), 6) AS ewma
        FROM d JOIN sums ON sums.priority = d.priority AND sums.anchor = d.ed""",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-decay truncated EWMA ([EXT] time-series;
    `operators/timeseries.py::ewma`): the per-priority daily revenue
    series smoothed with α = 0.2 over a 64-day decay window — the
    recurrence removed via bounded per-observation fan-out (no
    sequential state, no single task, no weight underflow)."""
    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum
    from kusuma_metamorph_etl_spark.operators.timeseries import ewma

    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day_dt"),
    ).agg(decimal_sum(F.col("o_totalprice")).alias("revenue"))
    return ewma(daily, ["priority"], "day_dt", "revenue", alpha=0.2)

@register(
    "evt_attribution",
    """WITH touched AS (
         SELECT user_id, event_type, value,
                last_value(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS channel_last
         FROM events)
       SELECT coalesce(channel_last, 'direct') AS channel,
              count(*) AS n_conversions,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
                  AS revenue
       FROM touched WHERE event_type = 'purchase'
       GROUP BY 1""",
)
def evt_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution ([EXT] event analytics;
    `operators/events.py::attribution`): every purchase credited to the
    user's most recent preceding non-purchase touch (no-touch purchases
    bucket as 'direct'), rolled up to revenue per channel — one
    user-keyed window pass + one aggregate."""
    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum
    from kusuma_metamorph_etl_spark.operators.events import attribution

    att = attribution(t(spark, sf_dir, "events"))
    return att.groupBy(
        F.coalesce("channel_last", F.lit("direct")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        decimal_sum(F.col("value")).alias("revenue"),
    )

@register(
    "evt_markov",
    """WITH p AS (
         SELECT lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type,
                event_type AS next_type
         FROM events),
        c AS (SELECT prev_type, next_type, count(*) AS n
              FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
       SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
              round(CAST(n AS DOUBLE)
                    / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE),
                    6) AS p
       FROM c""",
)
def evt_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types ([EXT]
    event analytics; `operators/events.py::transition_matrix`):
    row-normalized (prev → next) probabilities across all user
    journeys — one user-keyed lag window + one pair count."""
    from kusuma_metamorph_etl_spark.operators.events import transition_matrix

    return transition_matrix(t(spark, sf_dir, "events"))

@register(
    "ts_seasonal",
    """WITH agg AS MATERIALIZED (
          SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day_dt,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                      AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2),
        dw AS (SELECT priority, dayofweek(day_dt) + 1 AS dow,
                      round(avg(revenue), 6) AS dow_mean
               FROM agg GROUP BY 1, 2),
        ov AS (SELECT priority, round(avg(revenue), 6) AS mean
               FROM agg GROUP BY 1)
       SELECT a.priority, a.day_dt, a.revenue,
              dayofweek(a.day_dt) + 1 AS dow,
              round(dw.dow_mean - ov.mean, 6) AS seasonal,
              round(a.revenue - (dw.dow_mean - ov.mean), 6) AS deseasonalized
       FROM agg a
       JOIN dw ON dw.priority = a.priority
              AND dw.dow = dayofweek(a.day_dt) + 1
       JOIN ov ON ov.priority = a.priority""",
)
def ts_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal decomposition ([EXT] time-series;
    `operators/timeseries.py::seasonal_profile`): day-of-week additive
    profile + deseasonalized residual of the per-priority daily revenue
    series — the pre-pass that makes `evt_rate_anomaly`'s z-score
    compare a Monday to Mondays instead of to the whole week."""
    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum
    from kusuma_metamorph_etl_spark.operators.timeseries import seasonal_profile

    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day_dt"),
    ).agg(decimal_sum(F.col("o_totalprice")).alias("revenue"))
    return seasonal_profile(daily, ["priority"], "day_dt", "revenue")

@register(
    "evt_funnel_window",
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) AS t_click
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS t_purchase
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
        SELECT v.user_id, v.t_view,
               CASE WHEN c.t_click <= v.t_view + INTERVAL 6 HOURS
                    THEN c.t_click END AS t_click,
               CASE WHEN c.t_click <= v.t_view + INTERVAL 6 HOURS
                     AND p.t_purchase <= v.t_view + INTERVAL 6 HOURS
                    THEN p.t_purchase END AS t_purchase
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""",
)
def evt_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel ([EXT]; `operators/events.py::
    funnel_one_scan(within_seconds=)`): view → click → purchase where
    every stage must land within 6 hours of the user's FIRST view (the
    declared conversion-window rule, anchored at first touch).  Same
    one-scan plan as `evt_funnel` plus one deadline comparison per
    stage."""
    from kusuma_metamorph_etl_spark.operators.events import funnel_one_scan

    events = t(spark, sf_dir, "events")
    return funnel_one_scan(
        events, stages=["view", "click", "purchase"], within_seconds=6 * 3600
    )

@register(
    "ts_ohlc",
    """WITH agg AS MATERIALIZED (
          SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day_dt,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                      AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2)
       SELECT priority, CAST(date_trunc('week', day_dt) AS DATE) AS period,
              min_by(revenue, day_dt) AS open,
              max(revenue) AS high,
              min(revenue) AS low,
              max_by(revenue, day_dt) AS close,
              count(revenue) AS n_obs
       FROM agg GROUP BY 1, 2""",
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly OHLC downsampling ([EXT] time-series;
    `operators/timeseries.py::resample_ohlc`): the per-priority daily
    revenue series rolled to Monday-start weekly open/high/low/close
    bars — the storage-tiering downsample (day grain hot, bars cold)."""
    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum
    from kusuma_metamorph_etl_spark.operators.timeseries import resample_ohlc

    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day_dt"),
    ).agg(decimal_sum(F.col("o_totalprice")).alias("revenue"))
    return resample_ohlc(daily, ["priority"], "day_dt", "revenue")

@register(
    "evt_session_stats",
    """WITH x AS (
         SELECT user_id, event_id, ts, value,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > 1800 * 1000000
                     THEN 1 ELSE 0 END AS ns
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        lab AS (
         SELECT user_id, ts, value,
                CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_idx
         FROM x)
       SELECT user_id, session_idx,
              count(*) AS n_events,
              min(ts) AS started_at,
              CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
                  AS duration_us,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
                  AS session_value,
              count(*) = 1 AS bounce
       FROM lab GROUP BY 1, 2""",
)
def evt_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-grain rollup ([EXT] event analytics;
    `operators/events.py::session_stats`): per (user, session) event
    count, start, exact integer-µs duration, exact-decimal value sum and
    bounce flag — the per-session feature frame over the `evt_sessionize`
    labels."""
    from kusuma_metamorph_etl_spark.operators.events import session_stats

    return session_stats(t(spark, sf_dir, "events"), gap_seconds=1800)

@register(
    "evt_stickiness",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day,
                         count(DISTINCT user_id) AS dau
                  FROM events GROUP BY 1),
        m AS (SELECT count(DISTINCT user_id) AS mau FROM events)
       SELECT day, CAST(dau AS BIGINT) AS dau, CAST(mau AS BIGINT) AS mau,
              round(dau * 1.0 / mau, 6) AS stickiness
       FROM d, m""",
)
def evt_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness ([EXT] event analytics;
    `operators/events.py::stickiness`): the canonical engagement ratio —
    what share of the period's active users show up each day.  One
    per-day distinct agg + one single-row global distinct broadcast; the
    fact shuffles once on (day, user)."""
    from kusuma_metamorph_etl_spark.operators.events import stickiness

    ev = t(spark, sf_dir, "events")
    return stickiness(ev, "ts", "user_id")

"""Gap-fill driver queries — dense hourly series over ``events`` with
zero / LOCF / linear fills, hash-checked against a DuckDB twin that
re-derives the same grid with ``generate_series`` + ``IGNORE NULLS``
window frames. Floating steps are confined to the linear
interpolation's one multiply/divide chain, written identically on
both sides and projected to fixed-point (×1000, floor+0.5) so value
hashes are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import load_table
from rds_to_datalake_project_spark.operators.timeseries import gapfill

WIDTH_S = 3600
_V_CUT = 4.5  # sparsifies the hourly grid (~8% holes per series)


def gapfill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type series: event count zero-filled, a
    fixed-point value sum LOCF-filled and linearly interpolated."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > _V_CUT)
    sum_fx = F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long"))
    out = gapfill(
        ev,
        "ts",
        WIDTH_S,
        ["event_type"],
        {
            "n_events": F.count("*").cast("long"),
            "sum_v": sum_fx,
            "sum_v_interp": sum_fx,
        },
        {"n_events": "zero", "sum_v": "locf", "sum_v_interp": "linear"},
    )
    return out.select(
        "event_type",
        "bucket_s",
        "n_events",
        "sum_v",
        F.floor(F.col("sum_v_interp") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("sum_v_interp_fx"),
    ).orderBy("event_type", "bucket_s")


GAPFILL_SQL = f"""
WITH agg AS (
  SELECT event_type,
         (epoch_us(ts) // {WIDTH_S * 1_000_000}) * {WIDTH_S} AS bucket_s,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_v
  FROM events
  WHERE value > {_V_CUT!r}
  GROUP BY 1, 2
), rng AS (
  SELECT event_type, MIN(bucket_s) AS lo, MAX(bucket_s) AS hi
  FROM agg GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, {WIDTH_S})) AS bucket_s
  FROM rng
), dense AS (
  SELECT s.event_type, s.bucket_s, a.n_events, a.sum_v
  FROM spine s LEFT JOIN agg a
    ON s.event_type = a.event_type AND s.bucket_s = a.bucket_s
), filled AS (
  SELECT event_type, bucket_s,
         COALESCE(n_events, 0) AS n_events,
         last_value(sum_v IGNORE NULLS) OVER wprev AS sum_v_locf,
         sum_v,
         last_value(sum_v IGNORE NULLS) OVER wprev AS pv,
         last_value(CASE WHEN sum_v IS NOT NULL THEN bucket_s END IGNORE NULLS)
             OVER wprev AS pb,
         first_value(sum_v IGNORE NULLS) OVER wnext AS nv,
         first_value(CASE WHEN sum_v IS NOT NULL THEN bucket_s END IGNORE NULLS)
             OVER wnext AS nb
  FROM dense
  WINDOW
    wprev AS (PARTITION BY event_type ORDER BY bucket_s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wnext AS (PARTITION BY event_type ORDER BY bucket_s
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket_s, n_events,
       sum_v_locf AS sum_v,
       CAST(FLOOR(
         (CASE WHEN sum_v IS NOT NULL THEN CAST(sum_v AS DOUBLE)
               ELSE CAST(pv AS DOUBLE)
                    + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                      * (CAST(bucket_s - pb AS DOUBLE)
                         / CAST(nb - pb AS DOUBLE)) END) * 1000 + 0.5
       ) AS BIGINT) AS sum_v_interp_fx
FROM filled
ORDER BY event_type, bucket_s
"""


FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_WITHIN_S = 86400  # 1 day


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel over the event stream: first view → first
    later click → first later purchase, all within one day of the
    view. k chained step-filtered joins — never a per-user array."""
    from rds_to_datalake_project_spark.operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "ts", "event_type", FUNNEL_STEPS, within_s=FUNNEL_WITHIN_S
    ).orderBy("step")


_WIN_US = FUNNEL_WITHIN_S * 1_000_000

FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
), s1 AS (
  SELECT user_id, MIN(ts_us) AS t0 FROM e
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
), s2 AS (
  SELECT s1.user_id, s1.t0, MIN(e.ts_us) AS t1
  FROM s1 LEFT JOIN e
    ON e.user_id = s1.user_id AND e.event_type = '{FUNNEL_STEPS[1]}'
   AND e.ts_us > s1.t0 AND e.ts_us <= s1.t0 + {_WIN_US}
  GROUP BY 1, 2
), s3 AS (
  SELECT s2.user_id, s2.t0, s2.t1, MIN(e.ts_us) AS t2
  FROM s2 LEFT JOIN e
    ON e.user_id = s2.user_id AND e.event_type = '{FUNNEL_STEPS[2]}'
   AND s2.t1 IS NOT NULL
   AND e.ts_us > s2.t1 AND e.ts_us <= s2.t0 + {_WIN_US}
  GROUP BY 1, 2, 3
), depth AS (
  SELECT user_id,
         CASE WHEN t2 IS NOT NULL THEN 3
              WHEN t1 IS NOT NULL THEN 2 ELSE 1 END AS d
  FROM s3
)
SELECT CAST(t.step AS INTEGER) AS step,
       CASE t.step WHEN 1 THEN '{FUNNEL_STEPS[0]}'
                   WHEN 2 THEN '{FUNNEL_STEPS[1]}'
                   ELSE '{FUNNEL_STEPS[2]}' END AS step_name,
       COUNT(*) AS n_users
FROM depth JOIN range(1, 4) t(step) ON t.step <= depth.d
GROUP BY 1, 2
ORDER BY step
"""

COHORT_PERIOD_S = 7 * 86400


def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over events — first-touch
    cohorts × active periods, all shuffles on the user key."""
    from rds_to_datalake_project_spark.operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", period_s=COHORT_PERIOD_S).orderBy(
        "cohort_s", "period"
    )


COHORT_SQL = f"""
WITH b AS (
  SELECT user_id,
         (epoch_us(ts) // {COHORT_PERIOD_S * 1_000_000}) * {COHORT_PERIOD_S} AS p
  FROM events
), f AS (
  SELECT user_id, MIN(p) AS cohort_s FROM b GROUP BY 1
), a AS (
  SELECT DISTINCT user_id, p FROM b
)
SELECT cohort_s,
       CAST((p - cohort_s) / {COHORT_PERIOD_S} AS INTEGER) AS period,
       COUNT(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_s, period
"""


def overlap_user_promo_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join: per-user daily activity
    spans (every 10th user) × per-event-type weekly promo windows
    (first occurrence + 2 days), via the binned one-shuffle form —
    the raw predicate would be a BroadcastNestedLoopJoin."""
    from rds_to_datalake_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )
    from rds_to_datalake_project_spark.operators.timeseries import time_bucket_s

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    left = (
        ev.filter(F.col("user_id") % 10 == 0)
        .groupBy("user_id", time_bucket_s(F.col("ts"), 86400).alias("day_s"))
        .agg(
            F.timestamp_micros(F.min(us)).alias("ls"),
            F.timestamp_micros(F.max(us) + 1).alias("le"),
        )
    )
    right = (
        ev.groupBy(
            "event_type", time_bucket_s(F.col("ts"), 7 * 86400).alias("week_s")
        )
        .agg(F.min(us).alias("w0"))
        .select(
            "event_type",
            "week_s",
            F.timestamp_micros(F.col("w0")).alias("rs"),
            F.timestamp_micros(F.col("w0") + 2 * 86400 * 1_000_000).alias("re"),
        )
    )
    j = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_micros=86_400_000_000
    )
    ov = F.least(F.unix_micros("le"), F.unix_micros("re")) - F.greatest(
        F.unix_micros("ls"), F.unix_micros("rs")
    )
    return j.select(
        "user_id", "day_s", "event_type", "week_s", ov.alias("overlap_us")
    ).orderBy("user_id", "day_s", "event_type", "week_s")


OVERLAP_SQL = """
WITH l AS (
  SELECT user_id,
         (epoch_us(ts) // 86400000000) * 86400 AS day_s,
         MIN(epoch_us(ts)) AS ls,
         MAX(epoch_us(ts)) + 1 AS le
  FROM events WHERE user_id % 10 = 0
  GROUP BY 1, 2
), r AS (
  SELECT event_type,
         (epoch_us(ts) // 604800000000) * 604800 AS week_s,
         MIN(epoch_us(ts)) AS rs,
         MIN(epoch_us(ts)) + 172800000000 AS re
  FROM events
  GROUP BY 1, 2
)
SELECT l.user_id, l.day_s, r.event_type, r.week_s,
       least(l.le, r.re) - greatest(l.ls, r.rs) AS overlap_us
FROM l JOIN r ON l.ls < r.re AND r.rs < l.le
ORDER BY user_id, day_s, event_type, week_s
"""


_LOOKBACK = 24
_Z = 2


def rolling_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type counts flagged against the trailing
    24-hour mean/stddev — the cross-multiplied integer z-score of
    operators/timeseries.py:rolling_anomaly, so the flag is exact and
    hash-stable (no stddev floats cross the engine boundary)."""
    from rds_to_datalake_project_spark.operators.timeseries import (
        rolling_anomaly,
        time_bucket_s,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", time_bucket_s(F.col("ts"), WIDTH_S).alias("bucket_s")
    ).agg(F.count("*").cast("long").alias("n_events"))
    out = rolling_anomaly(
        hourly, ["event_type"], "bucket_s", "n_events", _LOOKBACK, _Z
    )
    return out.select(
        "event_type", "bucket_s", "n_events", "win_n", "is_anomaly"
    ).orderBy("event_type", "bucket_s")


ROLLING_ANOMALY_SQL = f"""
WITH agg AS (
  SELECT event_type,
         (epoch_us(ts) // {WIDTH_S * 1_000_000}) * {WIDTH_S} AS bucket_s,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), win AS (
  SELECT event_type, bucket_s, n_events,
         COUNT(n_events) OVER w AS win_n,
         COALESCE(SUM(n_events) OVER w, 0) AS s,
         COALESCE(SUM(n_events * n_events) OVER w, 0) AS ss
  FROM agg
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_s
               ROWS BETWEEN {_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket_s, n_events, win_n,
       (win_n = {_LOOKBACK} AND
        (win_n * n_events - s) * (win_n * n_events - s)
          > {_Z * _Z} * (win_n * ss - s * s)) AS is_anomaly
FROM win
ORDER BY event_type, bucket_s
"""


def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of the (×1000 fixed-point) event
    value per event_type (operators/timeseries.py:time_weighted_avg):
    integer µs durations × integer values, one float division at the
    end — irregular sampling weighted by holding time, hash-stable."""
    from rds_to_datalake_project_spark.operators.timeseries import (
        time_weighted_avg,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v_fx"),
    )
    return time_weighted_avg(ev, ["event_type"], "ts", "v_fx").orderBy(
        "event_type"
    )


TIME_WEIGHTED_SQL = """
WITH obs AS (
  SELECT event_type,
         epoch_us(ts) AS us,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_fx
  FROM events
), d AS (
  SELECT event_type, v_fx,
         GREATEST(COALESCE(lead(us) OVER w, MAX(us) OVER (PARTITION BY event_type)) - us,
                  0) AS dur
  FROM obs WINDOW w AS (PARTITION BY event_type ORDER BY us)
), agg AS (
  SELECT event_type,
         SUM(v_fx * dur) AS twa_num,
         SUM(dur) AS twa_den_us
  FROM d GROUP BY event_type
)
SELECT event_type, CAST(twa_num AS BIGINT) AS twa_num,
       CAST(twa_den_us AS BIGINT) AS twa_den_us,
       CASE WHEN twa_den_us > 0
            THEN CAST(twa_num AS DOUBLE) / CAST(twa_den_us AS DOUBLE) END AS twa
FROM agg ORDER BY event_type
"""


_ATTR_WITHIN_S = 1800


def click_attribution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution join's batch twin
    (streaming/pipeline.py:stream_interval_join — the same plan that
    runs watermarked stream-stream in the test suite): view → click by
    the same user within 30 minutes. Equi-key shuffle + range
    residual; the gap is reported in integer seconds."""
    from rds_to_datalake_project_spark.streaming.pipeline import (
        stream_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = stream_interval_join(
        views, clicks, "user_id", "ts", "ts", within=f"{_ATTR_WITHIN_S} seconds"
    )
    return j.select(
        F.col("l_event_id").alias("view_id"),
        F.col("r_event_id").alias("click_id"),
        F.col("l_user_id").alias("user_id"),
        ((F.unix_micros("r_ts") - F.unix_micros("l_ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("gap_s"),
    ).orderBy("view_id", "click_id")


CLICK_ATTRIBUTION_SQL = f"""
SELECT v.event_id AS view_id,
       c.event_id AS click_id,
       v.user_id,
       (epoch_us(c.ts) - epoch_us(v.ts)) // 1000000 AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts
 AND epoch_us(c.ts) <= epoch_us(v.ts) + {_ATTR_WITHIN_S * 1_000_000}
ORDER BY view_id, click_id
"""


_M4_WIDTH_S = 21600  # 6-hour pixels


def m4_downsample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visual downsampling of the event value series per event_type
    (operators/timeseries.py:m4_downsample): 4 pixel-defining points
    per 6-hour bucket, selected by deterministic lexicographic struct
    order so the DuckDB twin (ROW_NUMBER with matching sort keys)
    hash-matches point for point."""
    from rds_to_datalake_project_spark.operators.timeseries import (
        m4_downsample,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v_fx"),
    )
    return m4_downsample(
        ev, ["event_type"], "ts", "v_fx", _M4_WIDTH_S, "event_id"
    ).orderBy("event_type", "bucket_s", "role")


M4_SQL = f"""
WITH obs AS (
  SELECT event_type,
         epoch_us(ts) AS ts_us,
         event_id,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v,
         (epoch_us(ts) // {_M4_WIDTH_S * 1_000_000}) * {_M4_WIDTH_S} AS bucket_s
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_s
                       ORDER BY ts_us, event_id) AS rf,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_s
                       ORDER BY ts_us DESC, event_id DESC) AS rl,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_s
                       ORDER BY v, ts_us, event_id) AS rmin,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_s
                       ORDER BY v DESC, ts_us DESC, event_id DESC) AS rmax
  FROM obs
)
SELECT event_type, bucket_s, 'first' AS role, ts_us, v FROM r WHERE rf = 1
UNION ALL
SELECT event_type, bucket_s, 'last', ts_us, v FROM r WHERE rl = 1
UNION ALL
SELECT event_type, bucket_s, 'min', ts_us, v FROM r WHERE rmin = 1
UNION ALL
SELECT event_type, bucket_s, 'max', ts_us, v FROM r WHERE rmax = 1
ORDER BY event_type, bucket_s, role
"""


QUERIES = {
    "m4_downsample_events": m4_downsample_events,
    "gapfill_hourly_events": gapfill_hourly_events,
    "rolling_anomaly_hours": rolling_anomaly_hours,
    "time_weighted_value": time_weighted_value,
    "click_attribution_pairs": click_attribution_pairs,
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "cohort_weekly_retention": cohort_weekly_retention,
    "overlap_user_promo_spans": overlap_user_promo_spans,
}
ORACLES = {
    "m4_downsample_events": M4_SQL,
    "gapfill_hourly_events": GAPFILL_SQL,
    "rolling_anomaly_hours": ROLLING_ANOMALY_SQL,
    "time_weighted_value": TIME_WEIGHTED_SQL,
    "click_attribution_pairs": CLICK_ATTRIBUTION_SQL,
    "funnel_view_click_purchase": FUNNEL_SQL,
    "cohort_weekly_retention": COHORT_SQL,
    "overlap_user_promo_spans": OVERLAP_SQL,
}

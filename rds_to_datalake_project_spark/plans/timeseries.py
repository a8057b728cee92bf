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
         SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS sum_v
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


QUERIES = {"gapfill_hourly_events": gapfill_hourly_events}
ORACLES = {"gapfill_hourly_events": GAPFILL_SQL}

"""Gap-fill / interpolation semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.timeseries import (
    gapfill,
    time_bucket_s,
)


def _series(spark, points):
    """points: list of (series, epoch_s, value)."""
    rows = [
        (s, dt.datetime(1970, 1, 1) + dt.timedelta(seconds=e), v)
        for s, e, v in points
    ]
    return spark.createDataFrame(rows, "s string, ts timestamp, v double")


def test_bucket_is_exact_long_floor(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 59, 59),), (dt.datetime(2024, 1, 1, 11, 0, 0),)],
        "ts timestamp",
    )
    got = [r[0] for r in df.select(time_bucket_s(F.col("ts"), 3600)).collect()]
    assert got == [1704103200, 1704106800]


def test_zero_and_null_fill(spark):
    df = _series(spark, [("a", 0, 1.0), ("a", 7200, 3.0)])
    out = gapfill(
        df,
        "ts",
        3600,
        ["s"],
        {"n": F.count("*").cast("long"), "mx": F.max("v")},
        {"n": "zero", "mx": "null"},
    ).orderBy("bucket_s")
    rows = out.collect()
    assert [r["bucket_s"] for r in rows] == [0, 3600, 7200]
    assert [r["n"] for r in rows] == [1, 0, 1]
    assert [r["mx"] for r in rows] == [1.0, None, 3.0]


def test_locf_carries_only_forward(spark):
    df = _series(spark, [("a", 3600, 5.0), ("a", 14400, 9.0)])
    out = gapfill(
        df, "ts", 3600, ["s"], {"mx": F.max("v")}, {"mx": "locf"}
    ).orderBy("bucket_s")
    assert [r["mx"] for r in out.collect()] == [5.0, 5.0, 5.0, 9.0]


def test_linear_interpolates_between_neighbors_only(spark):
    df = _series(
        spark, [("a", 0, 0.0), ("a", 10800, 9.0), ("a", 14400, 1.0)]
    )
    out = gapfill(
        df, "ts", 3600, ["s"], {"mx": F.max("v")}, {"mx": "linear"}
    ).orderBy("bucket_s")
    got = [r["mx"] for r in out.collect()]
    assert got == [0.0, 3.0, 6.0, 9.0, 1.0]


def test_pinned_range_and_multiple_series(spark):
    df = _series(spark, [("a", 3600, 1.0), ("b", 7200, 2.0)])
    out = gapfill(
        df,
        "ts",
        3600,
        ["s"],
        {"n": F.count("*").cast("long")},
        {"n": "zero"},
        start_s=0,
        end_s=10800,
    )
    rows = out.orderBy("s", "bucket_s").collect()
    assert [(r["s"], r["bucket_s"], r["n"]) for r in rows] == [
        ("a", 0, 0),
        ("a", 3600, 1),
        ("a", 7200, 0),
        ("b", 0, 0),
        ("b", 3600, 0),
        ("b", 7200, 1),
    ]


def test_edges_stay_null_for_linear_and_locf_leading(spark):
    df = _series(spark, [("a", 3600, 4.0)])
    out = gapfill(
        df,
        "ts",
        3600,
        ["s"],
        {"mx": F.max("v")},
        {"mx": "linear"},
        start_s=0,
        end_s=10800,
    ).orderBy("bucket_s")
    assert [r["mx"] for r in out.collect()] == [None, 4.0, None]


def test_rolling_anomaly_exact_flags(spark):
    from rds_to_datalake_project_spark.operators.timeseries import rolling_anomaly

    # series a: flat 10s then a spike; lookback 4
    pts = [("a", i, 10) for i in range(6)] + [("a", 6, 50)]
    # series b: too short for a full frame anywhere after the ramp
    pts += [("b", 0, 5), ("b", 1, 5), ("b", 2, 500)]
    df = spark.createDataFrame(pts, "s string, t long, v long")
    out = rolling_anomaly(df, ["s"], "t", "v", lookback=4, z=2)
    rows = {(r["s"], r["t"]): r for r in out.collect()}
    # flat region: dev=0 -> not anomalous (note: 0 > 0 is false)
    assert not rows[("a", 5)]["is_anomaly"]
    # spike: frame = [10,10,10,10], n=4, S=40, SS=400, x=50
    # (4*50-40)^2 = 25600 > 4*(4*400-1600) = 0 -> anomaly
    assert rows[("a", 6)]["is_anomaly"]
    # incomplete frames never flag, even with a huge spike
    assert not rows[("b", 2)]["is_anomaly"]
    assert rows[("b", 2)]["win_n"] == 2
    # leading rows: empty/partial frame, not flagged
    assert not rows[("a", 0)]["is_anomaly"]


def test_rolling_anomaly_boundary_is_strict(spark):
    from rds_to_datalake_project_spark.operators.timeseries import rolling_anomaly

    # frame [0, 2], x must satisfy (2x-2)^2 > 4*(2*4-4) = 16
    # x=3: (4)^2=16 -> NOT anomalous (strict); x=4: 36 > 16 -> anomalous
    pts = [("s", 0, 0), ("s", 1, 2), ("s", 2, 3), ("s", 3, 4)]
    df = spark.createDataFrame(pts, "s string, t long, v long")
    out = rolling_anomaly(df, ["s"], "t", "v", lookback=2, z=2)
    rows = {r["t"]: r["is_anomaly"] for r in out.collect()}
    assert rows[2] is False
    # t=3 frame is [2,3]: (2*4-5)^2=9 > 4*(2*13-25)=4 -> anomalous
    assert rows[3] is True


def test_time_weighted_avg_locf(spark):
    from rds_to_datalake_project_spark.operators.timeseries import (
        time_weighted_avg,
    )

    df = _series(
        spark, [("a", 0, 10.0), ("a", 10, 30.0), ("a", 40, 50.0), ("b", 5, 7.0)]
    ).selectExpr("s", "ts", "CAST(v AS LONG) AS v")
    out = {r["s"]: r for r in time_weighted_avg(df, ["s"], "ts", "v").collect()}
    # a: 10 held 10s, 30 held 30s, 50 held 0s -> twa = (100+900)/40 = 25
    assert out["a"]["twa_num"] == 10 * 10_000_000 + 30 * 30_000_000
    assert out["a"]["twa_den_us"] == 40_000_000
    assert out["a"]["twa"] == 25.0
    # single observation, no pinned end: zero duration -> null twa
    assert out["b"]["twa_den_us"] == 0 and out["b"]["twa"] is None

    pinned = {
        r["s"]: r
        for r in time_weighted_avg(df, ["s"], "ts", "v", end_us=60_000_000).collect()
    }
    # a: 50 now holds 20s -> (100+900+1000)/60
    assert pinned["a"]["twa"] == (2_000_000_000) / 60_000_000
    # b: 7 holds 55s
    assert pinned["b"]["twa"] == 7.0

"""Funnel and cohort-retention semantics (operators/funnel.py)."""

from __future__ import annotations

import pytest
import datetime as dt

from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
)

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    data = [(u, T0 + dt.timedelta(seconds=s), e) for u, s, e in rows]
    return spark.createDataFrame(data, "user long, ts timestamp, event string")


STEPS = ["view", "click", "buy"]


def test_funnel_ordering_is_strict(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 10, "click"), (1, 20, "buy"),   # full
            (2, 0, "view"), (2, 10, "click"),                    # stops at 2
            (3, 0, "view"),                                      # stops at 1
            (4, 0, "click"), (4, 10, "buy"),                     # never entered
            (5, 10, "click"), (5, 20, "view"), (5, 30, "buy"),   # click BEFORE view
        ],
    )
    out = {
        r["user"]: r["steps_completed"]
        for r in funnel_steps(ev, "user", "ts", "event", STEPS).collect()
    }
    # user 5 entered at the view (t=20); their click (t=10) precedes it
    # but their buy (t=30) cannot count without a click after the view
    assert out == {1: 3, 2: 2, 3: 1, 5: 1}


def test_funnel_no_step_skipping(spark):
    ev = _ev(spark, [(1, 0, "view"), (1, 10, "buy")])  # no click
    out = funnel_steps(ev, "user", "ts", "event", STEPS).collect()
    assert out[0]["steps_completed"] == 1


def test_funnel_within_window(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 50, "click"),    # inside 60s
            (2, 0, "view"), (2, 100, "click"),   # outside
        ],
    )
    out = {
        r["user"]: r["steps_completed"]
        for r in funnel_steps(ev, "user", "ts", "event", STEPS, within_s=60).collect()
    }
    assert out == {1: 2, 2: 1}


def test_funnel_first_occurrence_after_prev(spark):
    # the FIRST qualifying click (t=5) is used, so the buy at t=8 counts
    ev = _ev(spark, [(1, 0, "view"), (1, 5, "click"), (1, 30, "click"), (1, 8, "buy")])
    r = funnel_steps(ev, "user", "ts", "event", STEPS).collect()[0]
    assert r["steps_completed"] == 3
    assert r["last_step_at_us"] == r["entered_at_us"] + 8_000_000


def test_funnel_counts_decreasing(spark):
    ev = _ev(
        spark,
        [(u, 0, "view") for u in range(10)]
        + [(u, 1, "click") for u in range(6)]
        + [(u, 2, "buy") for u in range(2)],
    )
    rows = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in funnel_counts(ev, "user", "ts", "event", STEPS).collect()
    }
    assert rows == {1: ("view", 10), 2: ("click", 6), 3: ("buy", 2)}


def test_cohort_retention_triangle(spark):
    day = 86400
    ev = _ev(
        spark,
        [
            (1, 0, "x"), (1, 7 * day, "x"), (1, 14 * day, "x"),  # weeks 0,1,2
            (2, 0, "x"), (2, 14 * day, "x"),                      # weeks 0,2
            (3, 7 * day, "x"),                                    # cohort week 1
        ],
    )
    out = {
        (r["cohort_s"], r["period"]): r["n_users"]
        for r in cohort_retention(ev, "user", "ts", period_s=7 * day).collect()
    }
    c0 = 1704067200 - 1704067200 % (7 * day)  # 2024-01-01's week bucket
    c1 = c0 + 7 * day
    assert out[(c0, 0)] == 2
    assert out[(c0, 1)] == 1
    assert out[(c0, 2)] == 2
    assert out[(c1, 0)] == 1
    assert (c1, 1) not in out


@pytest.mark.slow
def test_interval_overlap_join_matches_bruteforce(spark):
    """Binned interval×interval join = brute-force cross+filter, each
    qualifying pair exactly once (incl. multi-bin overlaps)."""
    import datetime as dt

    from rds_to_datalake_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    def ts(h):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)

    left = spark.createDataFrame(
        [(1, ts(0), ts(5)), (2, ts(10), ts(60)), (3, ts(100), ts(101))],
        "lid long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [(10, ts(4), ts(11)), (20, ts(30), ts(90)), (30, ts(200), ts(201)),
         (40, ts(0), ts(120))],
        "rid long, rs timestamp, re timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_micros=3_600_000_000
        ).collect()
    )
    brute = sorted(
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .collect()
    )
    assert got == brute
    assert (1, 10) in got and (2, 20) in got and (3, 30) not in got

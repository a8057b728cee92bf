"""Range join (point-in-interval) — binned equi-join form.

Spark executes a pure range predicate join (``p.ts >= i.start AND
p.ts < i.end``) as BroadcastNestedLoopJoin — O(P×I) compares; with a
large interval side that is the classic 100 TB killer. The standard
fix (the same idea as Databricks' range-join binning): quantize time
into fixed-width bins, explode each interval into the bins it covers,
bucket each point into its bin, hash-join on the bin, and re-check the
exact predicate. Cost: one equi shuffle over |P| + |I|·(len/bin + 1)
rows; compares only within a bin.

Choose ``bin_micros`` >= the typical interval length: each interval
then explodes into <= 2 bins while bins stay selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_micros: int = 86_400_000_000,  # 1 day
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (end exclusive). Columns of both inputs
    are kept (names must not collide apart from the bin internals).

    ``how`` ∈ {"inner", "left"}. The exact range predicate rides the
    JOIN CONDITION, not a post-filter — a post-filter evaluates NULL
    on a left join's unmatched rows and silently degrades it to
    inner. Right/full are rejected: the interval side is exploded per
    bin, so its unmatched rows would surface once per covered bin.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    p_us = F.unix_micros(F.col(point_ts))
    s_us = F.unix_micros(F.col(start_ts))
    e_us = F.unix_micros(F.col(end_ts))

    p = points.withColumn(_BIN, F.floor(p_us / bin_micros)).alias("p")
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(s_us / bin_micros),
                # end is exclusive: last covered bin is (end-1µs)'s bin
                F.floor((e_us - 1) / bin_micros),
            )
        ),
    ).alias("i")
    cond = (
        (F.col(f"p.{_BIN}") == F.col(f"i.{_BIN}"))
        & (F.unix_micros(F.col(point_ts)) >= F.unix_micros(F.col(start_ts)))
        & (F.unix_micros(F.col(point_ts)) < F.unix_micros(F.col(end_ts)))
    )
    return p.join(i, on=cond, how=how).drop(_BIN)

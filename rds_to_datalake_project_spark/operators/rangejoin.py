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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_micros: int = 86_400_000_000,  # 1 day
) -> DataFrame:
    """Interval × interval overlap join (half-open semantics:
    ``l.start < r.end AND r.start < l.end``) in the same binned
    equi-join form as :func:`range_join`.

    Both sides explode into the bins they cover; candidate pairs meet
    on the bin equi-key and re-check the exact overlap predicate. A
    pair of overlapping intervals shares EVERY bin of the overlap
    region, so the candidate join would emit it once per shared bin —
    the dedup rides in the join condition itself: a pair is kept only
    in the FIRST bin both cover (``bin == max(l_bin0, r_bin0)``),
    which keeps the join one-shuffle and collapse-free (no distinct
    over the pair blowup).

    Cost: |L|·(len/bin+1) + |R|·(len/bin+1) exploded rows, one hash
    shuffle, per-bin compares — vs. the BroadcastNestedLoopJoin O(L×R)
    Spark would pick for the raw predicate.
    """
    ls, le = F.unix_micros(F.col(left_start)), F.unix_micros(F.col(left_end))
    rs, re_ = F.unix_micros(F.col(right_start)), F.unix_micros(F.col(right_end))

    l = left.withColumn("__bin0", F.floor(ls / bin_micros)).withColumn(
        _BIN, F.explode(F.sequence(F.col("__bin0"), F.floor((le - 1) / bin_micros)))
    ).alias("l")
    r = right.withColumn("__bin0", F.floor(rs / bin_micros)).withColumn(
        _BIN, F.explode(F.sequence(F.col("__bin0"), F.floor((re_ - 1) / bin_micros)))
    ).alias("r")
    overlap = (
        F.unix_micros(F.col(left_start)) < F.unix_micros(F.col(right_end))
    ) & (F.unix_micros(F.col(right_start)) < F.unix_micros(F.col(left_end)))
    first_shared = F.col(f"l.{_BIN}") == F.greatest(
        F.col("l.__bin0"), F.col("r.__bin0")
    )
    cond = (F.col(f"l.{_BIN}") == F.col(f"r.{_BIN}")) & overlap & first_shared
    return l.join(r, on=cond, how="inner").drop(_BIN, "__bin0")

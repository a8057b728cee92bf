"""P1 — derived time-partition columns.

Reference: glue_jobs/initial_load.py:127-150 and
glue_jobs/incremental.py:186-211 add ``create_year .. create_minute``
as fixed-offset substrings of the ISO-8601 ``create_at`` string, used
as the 5-level Hudi partition path.

Engine version: pure built-in column expressions (whole-stage codegen,
no UDF). Works on both string ISO timestamps (reference contract) and
native TimestampType (via date_format). Granularity is configurable:
at 100 TB, minute-level partitioning explodes file counts (SURVEY.md
§4 risk), so the engine defaults to day granularity and treats the
reference's 5-level layout as opt-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# level -> (substring start, length, date_format pattern)
_LEVELS: list[tuple[str, int, int, str]] = [
    ("year", 1, 4, "yyyy"),
    ("month", 6, 2, "MM"),
    ("day", 9, 2, "dd"),
    ("hour", 12, 2, "HH"),
    ("minute", 15, 2, "mm"),
]

GRANULARITIES = tuple(name for name, *_ in _LEVELS)


def partition_columns(prefix: str, granularity: str = "day") -> list[str]:
    if granularity not in GRANULARITIES:
        raise ValueError(f"granularity must be one of {GRANULARITIES}, got {granularity!r}")
    idx = GRANULARITIES.index(granularity)
    return [f"{prefix}_{name}" for name, *_ in _LEVELS[: idx + 1]]


def _level_expr(source: Column, is_string: bool, start: int, length: int, fmt: str) -> Column:
    if is_string:
        # Fixed-offset carve of the ISO-8601 string — identical to the
        # reference (initial_load.py:129-150), zero parsing cost.
        return F.substring(source, start, length)
    return F.date_format(source, fmt)


def add_time_partitions(
    df: DataFrame,
    source_col: str = "create_at",
    granularity: str = "day",
    prefix: str | None = None,
) -> DataFrame:
    """Append zero-padded string partition columns derived from
    ``source_col`` down to ``granularity`` (year..minute)."""
    if granularity not in GRANULARITIES:
        raise ValueError(f"granularity must be one of {GRANULARITIES}, got {granularity!r}")
    prefix = prefix if prefix is not None else source_col.split("_")[0]
    is_string = isinstance(df.schema[source_col].dataType, T.StringType)
    src = F.col(source_col)
    idx = GRANULARITIES.index(granularity)
    cols = [
        _level_expr(src, is_string, start, length, fmt).alias(f"{prefix}_{name}")
        for name, start, length, fmt in _LEVELS[: idx + 1]
    ]
    return df.select("*", *cols)

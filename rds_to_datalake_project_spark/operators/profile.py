"""Table profiling — one-pass per-column statistics for lake tables.

Lake operations need cheap data-quality visibility (the reference eyeballs
``show_df_details`` per stage, initial_load.py:77-85 — schema, head,
count). This is the scalable version: a single aggregate pass computes
per-column null counts, distinct estimates, and min/max, emitted one
row per column.

Scale notes: one scan, map-side partial aggregation, no shuffle bigger
than one row per column. Distinct counts use HyperLogLog
(``approx_count_distinct``) by default — exact distinct per column
would be a shuffle per column; the profile's exact=True mode does it
for oracle checks at test scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MINMAXABLE = (
    T.NumericType,
    T.StringType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DateType,
)


def profile_table(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str). min/max stringified for a uniform schema."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"{f.name}__nulls"))
        distinct = (
            F.countDistinct(c) if exact_distinct else F.approx_count_distinct(c)
        )
        aggs.append(distinct.alias(f"{f.name}__distinct"))
        if isinstance(f.dataType, _MINMAXABLE):
            aggs.append(F.min(c).cast("string").alias(f"{f.name}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{f.name}__max"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{f.name}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{f.name}__max"))
    wide = df.agg(*aggs)

    per_col = [
        wide.select(
            F.lit(f.name).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"{f.name}__nulls").alias("n_nulls"),
            F.col(f"{f.name}__distinct").alias("n_distinct"),
            F.col(f"{f.name}__min").alias("min_str"),
            F.col(f"{f.name}__max").alias("max_str"),
        )
        for f in df.schema.fields
    ]
    return reduce(DataFrame.unionByName, per_col)

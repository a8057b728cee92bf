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


def column_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
    dims: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram over a FIXED [lo, hi) range — the
    ANALYZE-grade distribution sketch optimizers and skew advisories
    consume. Bucket edges are caller-fixed (not data-derived), so the
    bucket function is one deterministic expression and counts are
    exact integers — cross-engine replayable, unlike approx_percentile
    sketches. Values below lo clamp to bucket 0, at/above hi to the
    last bucket; NULLs are excluded. One partial-agg shuffle; emits
    every bucket (empty ones as 0) so the shape is fixed.

    ``dims`` produces one histogram PER GROUP (the dense bucket spine
    is exploded per observed group — spine rows = groups × buckets,
    never a function of input size; no crossJoin).

    Output: ``dims..., bucket, lo_edge, hi_edge, n_rows``.
    """
    dims = list(dims or [])
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)).cast(
                "int"
            ),
        ),
    )
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(*dims, bucket.alias("bucket"))
        .groupBy(*dims, "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spine = (
        counts.select(*dims)
        .distinct()
        .select(
            *dims,
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
        )
        if dims
        else df.sparkSession.range(n_buckets).select(
            F.col("id").cast("int").alias("bucket")
        )
    )
    edged = spine.select(
        *dims,
        "bucket",
        (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo_edge"),
        (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi_edge"),
    )
    return (
        edged.join(counts, [*dims, "bucket"], "left")
        .select(
            *dims,
            "bucket",
            "lo_edge",
            "hi_edge",
            F.coalesce("n_rows", F.lit(0).cast("bigint")).alias("n_rows"),
        )
        .orderBy(*dims, "bucket")
    )


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Fold per-slice equi-width histograms (same bin spec) into one —
    counts are trivially mergeable, which is the whole point of the
    fixed-edge design: per-file histograms in a sidecar roll up to the
    table histogram without touching data."""
    u = hists[0]
    for h in hists[1:]:
        u = u.unionByName(h)
    return (
        u.groupBy("bucket", "lo_edge", "hi_edge")
        .agg(F.sum("n_rows").alias("n_rows"))
        .orderBy("bucket")
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    percents: list[int],
    dims: list[str] | None = None,
) -> DataFrame:
    """Approximate quantiles by histogram-CDF inversion — the SCALE
    path next to the exact-percentile query (which needs a full sort):
    ONE aggregate pass builds fixed-edge bucket counts; the p-th
    quantile estimate is the first bucket whose cumulative count
    reaches ``ceil(N * p / 100)``, reported as that bucket's
    ``[lo_edge, hi_edge)`` bracket — error bounded by one bucket
    width, and DETERMINISTIC (integer rank + fixed edges), unlike
    ``approx_percentile``'s sketch, so it cross-engine hash-checks.

    With ``dims``, quantiles are computed PER GROUP: the cumulative
    window partitions by the group key, so a 1000-executor cluster
    spreads groups and each group's CDF inversion touches only its
    own ``n_buckets`` rows.

    Output: ``dims..., p, total, rank, bucket, lo_edge, hi_edge``.
    """
    from pyspark.sql import Window

    dims = list(dims or [])
    h = column_histogram(df, col, lo, hi, n_buckets, dims=dims)
    w_cum = (
        Window.partitionBy(*dims)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*dims).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = h.withColumn("cum", F.sum("n_rows").over(w_cum)).withColumn(
        "total", F.sum("n_rows").over(w_all)
    )
    x = cum.select(
        *dims,
        "bucket",
        "cum",
        "total",
        F.explode(F.array(*[F.lit(int(p)) for p in percents])).alias("p"),
    ).withColumn("rank", F.expr("(total * p + 99) DIV 100"))
    hit = (
        x.filter(F.col("cum") >= F.col("rank"))
        .groupBy(*dims, "p", "total", "rank")
        .agg(F.min("bucket").alias("bucket"))
    )
    return (
        hit.join(h.select(*dims, "bucket", "lo_edge", "hi_edge"), [*dims, "bucket"])
        .select(*dims, "p", "total", "rank", "bucket", "lo_edge", "hi_edge")
        .orderBy(*dims, "p")
    )


def equidepth_histogram(
    df: DataFrame,
    col: str,
    n_buckets: int,
    tiebreak: str,
    dims: list[str] | None = None,
) -> DataFrame:
    """Equi-DEPTH (equal-height) histogram: ``ntile(n)`` splits the
    (per-group) value distribution into buckets of near-equal row
    count and reports each bucket's [min, max] envelope — the
    histogram form optimizers prefer for skewed columns, where
    equi-width buckets collapse into one hot bin. ``tiebreak`` must
    make the sort order total (ntile over ties is otherwise
    nondeterministic).

    One window shuffle (group key, or single-partition sort for the
    global form — use dims at scale) + one partial aggregation.

    Output: ``dims..., bucket, n_rows, lo, hi``.
    """
    from pyspark.sql import Window

    dims = list(dims or [])
    w = Window.partitionBy(*dims).orderBy(F.col(col), F.col(tiebreak))
    return (
        df.filter(F.col(col).isNotNull())
        .withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy(*dims, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        )
        .orderBy(*dims, "bucket")
    )

"""Time-bucket gap-fill and interpolation — dense, analysis-ready
series from sparse event aggregates.

The TimescaleDB surface (``time_bucket_gapfill`` + ``locf()`` +
``interpolate()``) the hypertable rollup (operators/rollup.py) stops
short of: a bucketed aggregate only has rows for buckets that saw
events, but downstream consumers (charting, anomaly scoring, feature
windows for training) need one row per bucket per series, with the
holes filled by an explicit policy. The reference has no analog — its
Athena consumers re-derive density ad hoc.

Plan shape, sized for 100 TB of events:

1. one scan → ``groupBy(bucket, dims)`` aggregate (map-side partial,
   output rows = occupied buckets × series — tiny vs input);
2. the dense spine is generated from the aggregate's own per-series
   ``[min, max]`` bucket range (or a caller-pinned ``[start, end)``)
   via ``sequence`` + ``explode`` — spine size = series × buckets,
   never a function of raw event count, and it joins back on the
   (dims, bucket) equi-key;
3. fills are window functions partitioned by series, ordered by
   bucket — ONE shuffle for every fill column together, and the
   partition key is the series key, so a 1000-executor cluster
   spreads series, not time.

Buckets are integer epoch seconds throughout (exact arithmetic, no
timezone trapdoors, cross-engine hashable); ``bucket_ts`` offers the
timestamp rendering.

Fill policies per value column: ``"locf"`` (last observation carried
forward, leading edge stays null), ``"linear"`` (interpolate between
the nearest observed neighbors, both edges stay null outside the
observed envelope — Timescale ``interpolate()`` semantics), ``"zero"``
(absence means zero: counts/sums), ``"null"`` (leave the hole).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKET = "bucket_s"

_POLICIES = ("locf", "linear", "zero", "null")


def time_bucket_s(ts: Column, width_s: int) -> Column:
    """Integer epoch-second bucket start: exact long arithmetic
    (``us - us mod width``), no float rounding at any scale."""
    us = F.unix_micros(ts)
    w_us = int(width_s) * 1_000_000
    return ((us - F.pmod(us, F.lit(w_us))) / F.lit(1_000_000)).cast("long")


def gapfill(
    df: DataFrame,
    ts_col: str,
    width_s: int,
    dims: list[str],
    aggs: dict[str, Column],
    fill: dict[str, str],
    start_s: int | None = None,
    end_s: int | None = None,
) -> DataFrame:
    """Dense per-series time grid with policy-filled aggregate columns.

    ``aggs`` maps output column → aggregate over the raw rows;
    ``fill`` maps each aggregate column → policy (see module doc).
    ``start_s``/``end_s`` pin the grid (end exclusive); default is
    each series' own observed ``[min, max]`` bucket envelope.

    Output: ``dims + [bucket_s, bucket_ts] + list(aggs)``, one row per
    series × grid bucket.
    """
    unknown = {c: p for c, p in fill.items() if p not in _POLICIES}
    if unknown:
        raise ValueError(f"unknown fill policies: {unknown} (use {_POLICIES})")
    missing = set(fill) - set(aggs)
    if missing:
        raise ValueError(f"fill for columns not in aggs: {sorted(missing)}")
    w = int(width_s)

    bucketed = (
        df.withColumn(BUCKET, time_bucket_s(F.col(ts_col), w))
        .groupBy(*dims, BUCKET)
        .agg(*[a.alias(c) for c, a in aggs.items()])
    )

    # Per-series dense spine from the aggregate itself (rows ∝
    # series × buckets). With a pinned range the envelope is constant
    # so the spine is the same sequence for every series.
    if start_s is not None and end_s is not None:
        lo = F.lit(int(start_s) - int(start_s) % w)
        hi = F.lit(int(end_s - 1) - int(end_s - 1) % w)
        envelope = bucketed.select(*dims).distinct().select(
            *dims, lo.alias("__lo"), hi.alias("__hi")
        )
    else:
        envelope = bucketed.groupBy(*dims).agg(
            F.min(BUCKET).alias("__lo"), F.max(BUCKET).alias("__hi")
        )
    spine = envelope.select(
        *dims,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(w).cast("long"))
        ).alias(BUCKET),
    )

    dense = spine.join(bucketed, [*dims, BUCKET], "left")

    wprev = (
        Window.partitionBy(*dims)
        .orderBy(BUCKET)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(*dims)
        .orderBy(BUCKET)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    b = F.col(BUCKET)
    out_cols: dict[str, Column] = {}
    for c in aggs:
        v = F.col(c)
        policy = fill.get(c, "null")
        if policy == "locf":
            out_cols[c] = F.last(v, ignorenulls=True).over(wprev)
        elif policy == "zero":
            out_cols[c] = F.coalesce(v, F.lit(0).cast(dense.schema[c].dataType))
        elif policy == "linear":
            pv = F.last(v, ignorenulls=True).over(wprev)
            pb = F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(wprev)
            nv = F.first(v, ignorenulls=True).over(wnext)
            nb = F.first(F.when(v.isNotNull(), b), ignorenulls=True).over(wnext)
            frac = (b - pb).cast("double") / (nb - pb).cast("double")
            out_cols[c] = F.when(v.isNotNull(), v.cast("double")).otherwise(
                pv.cast("double") + (nv.cast("double") - pv.cast("double")) * frac
            )
        else:  # "null"
            out_cols[c] = v

    return dense.select(
        *dims,
        b,
        F.timestamp_seconds(b).alias("bucket_ts"),
        *[expr.alias(c) for c, expr in out_cols.items()],
    )


def rolling_anomaly(
    df: DataFrame,
    dims: list[str],
    order_col: str,
    value_col: str,
    lookback: int,
    z: int = 2,
) -> DataFrame:
    """Rolling z-score anomaly flags in EXACT integer arithmetic.

    For each row x ordered by ``order_col`` within a series (``dims``),
    compare x against the mean/stddev of the previous ``lookback``
    rows:  |x - mean| > z * stddev_pop  is evaluated as the
    cross-multiplied integer identity

        (n*x - S)^2  >  z^2 * (n*SS - S^2)

    (n = frame row count, S = frame sum, SS = frame sum of squares),
    so there is NO floating point anywhere — the flag is bit-stable
    across engines, partition counts, and summation orders, unlike a
    ``stddev_samp`` formulation. Rows with an incomplete frame
    (n < lookback) are never flagged.

    The comparison itself is evaluated in DECIMAL(38,0) (the int64
    sums are exact, then both sides get 128-bit headroom — dev² at the
    envelope bound reaches ~9e20, past int64), so the only remaining
    overflow surface is the int64 frame sum of squares: exact while
    ``lookback * x_max² < 9.2e18``, i.e. ``x_max < sqrt(9.2e18 /
    lookback)`` (~6.2e8 at lookback 24). Pre-scale coarser series
    before flagging past that.

    Preconditions: ``value_col`` integral within that envelope;
    (``dims``, ``order_col``) unique per row (a ROWS frame over ties
    is nondeterministic).

    Plan shape: ONE window shuffle partitioned by the series key —
    1000 executors spread series, not time; all four statistics share
    the same frame so Spark computes them in a single pass.
    """
    w = (
        Window.partitionBy(*dims)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    x = F.col(value_col).cast("long")
    n = F.count(value_col).over(w)
    s = F.coalesce(F.sum(x).over(w), F.lit(0).cast("long"))
    ss = F.coalesce(F.sum(x * x).over(w), F.lit(0).cast("long"))
    # dev fits int64 easily (|dev| ≤ 2·n·x_max), but dev² and n·SS−S²
    # do not at the documented envelope — square in DECIMAL(38,0).
    dec = "decimal(38,0)"
    dev = (n * x - s).cast(dec)
    n_d, s_d, ss_d = n.cast(dec), s.cast(dec), ss.cast(dec)
    flagged = (n == F.lit(lookback)) & (
        dev * dev
        > F.lit(int(z) * int(z)).cast(dec) * (n_d * ss_d - s_d * s_d)
    )
    return (
        df.withColumn("win_n", n)
        .withColumn("win_sum", s)
        .withColumn("win_ss", ss)
        .withColumn("is_anomaly", flagged)
    )


def time_weighted_avg(
    df: DataFrame,
    dims: list[str],
    ts_col: str,
    value_col: str,
    end_us: int | None = None,
) -> DataFrame:
    """LOCF time-weighted average per series (TimescaleDB
    ``time_weight('LOCF', ...)`` semantics): each observation holds
    from its timestamp to the next one; the average weights values by
    how long they held, not how often they were sampled — the right
    mean for irregularly-sampled gauges.

    Exact arithmetic: durations are integer epoch-µs deltas from one
    ``lead`` window pass, the numerator is the int64 sum of
    ``value * duration`` (``value_col`` must be integral — fix-point
    floats first), and only the FINAL ``num / den`` division is
    floating point — one identical op on any engine, so results are
    hash-stable. Envelope: ``max|value| * window_µs < 9.2e18``
    (a ×1000-fixed-point gauge over a century is still inside).

    The window ends at ``end_us`` when pinned (callers pin "now";
    pre-filter observations to ``ts <= end_us`` — a later one's
    duration clamps to 0) or at each series' last observation
    otherwise (which then carries zero weight, the Timescale
    convention).

    Output: ``dims..., twa_num, twa_den_us, twa`` (twa null for
    single-observation series with no pinned end). Precondition:
    (``dims``, ``ts_col``) unique — ``lead`` over tied timestamps is
    nondeterministic. ONE window shuffle
    partitioned by the series key + one partial aggregation.
    """
    w = Window.partitionBy(*dims).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    nxt = F.lead(us).over(w)
    if end_us is None:
        end = F.max(us).over(
            Window.partitionBy(*dims).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
    else:
        end = F.lit(int(end_us)).cast("long")
    dur = F.greatest(F.coalesce(nxt, end) - us, F.lit(0).cast("long"))
    v = F.col(value_col).cast("long")
    per = df.select(*dims, (v * dur).alias("__vd"), dur.alias("__d"))
    out = per.groupBy(*dims).agg(
        F.sum("__vd").alias("twa_num"), F.sum("__d").alias("twa_den_us")
    )
    return out.withColumn(
        "twa",
        F.when(
            F.col("twa_den_us") > 0,
            F.col("twa_num").cast("double") / F.col("twa_den_us").cast("double"),
        ),
    )


def m4_downsample(
    df: DataFrame,
    dims: list[str],
    ts_col: str,
    value_col: str,
    width_s: int,
    tiebreak: str,
) -> DataFrame:
    """M4 visual downsampling (Jugel et al., VLDB 2014): per time
    bucket per series, keep the four points a line chart cannot render
    without — first, last, minimum-value, maximum-value — so a
    billion-point series plots pixel-identically from width×4 rows.
    Unlike LTTB this is NOT sequential (bucket k never depends on
    bucket k-1's selection), so it is one map-side-combinable
    aggregation — the shape that actually distributes.

    Selection is deterministic: points are compared as lexicographic
    structs — first/last by (ts, tiebreak, value), min/max by
    (value, ts, tiebreak) — so equal values resolve by time then by
    ``tiebreak`` (must make rows unique) and the result is
    cross-engine hash-stable. ``value_col`` should be integral
    (fix-point the caller's floats) for bit-stable comparison.

    Output: ``dims..., bucket_s, role ∈ {first,last,min,max}, ts_us,
    v`` — always exactly 4 rows per occupied bucket (one per role; a
    single physical point may appear under several roles, which keeps
    the shape fixed and the oracle trivial).

    Plan: ONE groupBy aggregate (4 struct min/max, all partial-agg
    friendly) + a 4-element explode. No window, no join, no second
    scan — at 100 TB the reduce side carries 4 structs per
    (series, bucket).
    """
    us = F.unix_micros(F.col(ts_col))
    v = F.col(value_col)
    tb = F.col(tiebreak)
    by_time = F.struct(us.alias("ts_us"), tb.alias("tb"), v.alias("v"))
    by_value = F.struct(v.alias("v"), us.alias("ts_us"), tb.alias("tb"))
    agg = (
        df.filter(v.isNotNull())
        .groupBy(*dims, time_bucket_s(F.col(ts_col), width_s).alias(BUCKET))
        .agg(
            F.min(by_time).alias("__first"),
            F.max(by_time).alias("__last"),
            F.min(by_value).alias("__min"),
            F.max(by_value).alias("__max"),
        )
    )

    def _pt(role: str, s: str) -> Column:
        return F.struct(
            F.lit(role).alias("role"),
            F.col(f"{s}.ts_us").alias("ts_us"),
            F.col(f"{s}.v").alias("v"),
        )

    return agg.select(
        *dims,
        BUCKET,
        F.explode(
            F.array(
                _pt("first", "__first"),
                _pt("last", "__last"),
                _pt("min", "__min"),
                _pt("max", "__max"),
            )
        ).alias("__p"),
    ).select(*dims, BUCKET, "__p.role", "__p.ts_us", "__p.v")

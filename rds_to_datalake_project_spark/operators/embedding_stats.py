"""Embedding-population statistics and drift detection.

A training-data lake that stores embeddings needs the same
data-quality surface its text gets: has the embedding DISTRIBUTION
moved between two corpus states (new encoder rev, upstream
preprocessing change, silent truncation)? Per-dimension moments are
the cheap, mergeable signal — one pass, d rows out, no pairwise
anything.

Exactness: values quantize to 1e-6 fixed point (the same HALF_UP
``round`` contract as operators/similarity.quantize, which the DuckDB
twins already replay), per-dimension sums/counts are int64, and the
drift predicate compares means CROSS-MULTIPLIED in DECIMAL(38,0) —
``|sum_a·n_b − sum_b·n_a| > threshold_u·n_a·n_b`` — so the flag never
touches a float and is bit-stable across engines and partitionings.

Scale: ``posexplode`` fans a d-dim vector to d rows map-side, the
aggregate is partial-agg friendly, and output is d rows per frame —
at 100 TB the only materialized state is 2·d rows joined on ``pos``.

Envelope (sum·n products, the quantities this module actually
computes): the int64 stage is Σ|v_u| per dimension — exact while
n·max|v_u| < 2⁶³, i.e. ~9.2e12 rows/side for unit-norm embeddings
(|v_u| ≤ 1e6). The cross-multiplied comparison then runs in
DECIMAL(38,0): |sum_u|·n ≤ 9.2e18·9.2e12 ≈ 8.5e31 and
threshold_u·n_a·n_b ≤ 1e6·(9.2e12)² ≈ 8.5e31, both far inside 38
digits — int64 products would have wrapped silently past
n_a·n_b ≈ 1.8e14 (≈13M rows/side at the default threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DEFAULT_THRESHOLD_U = 50_000  # 0.05 in component units


def embedding_dim_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension ``(pos, n, sum_u, min_u, max_u)`` in 1e-6
    fixed point — one exploded aggregate pass."""
    ex = df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
    v = F.round(F.col("x").cast("double") * SCALE).cast("long")
    return (
        ex.select("pos", v.alias("v"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_u"),
            F.min("v").alias("min_u"),
            F.max("v").alias("max_u"),
        )
    )


def embedding_drift_report(
    a: DataFrame,
    b: DataFrame,
    vec_col: str,
    threshold_u: int = DEFAULT_THRESHOLD_U,
) -> DataFrame:
    """Dimension-level drift between two corpus states: join the two
    frames' dim stats on ``pos`` and flag dimensions whose mean moved
    more than ``threshold_u`` micro-units. The flag is evaluated in
    cross-multiplied int64 (exact); the float means ride along for
    human consumption only.

    Output: ``pos, n_a, n_b, sum_a_u, sum_b_u, mean_a_u, mean_b_u,
    drifted`` (means in micro-units) — d rows, one broadcast-sized
    join."""
    sa = embedding_dim_stats(a, vec_col).select(
        "pos",
        F.col("n").alias("n_a"),
        F.col("sum_u").alias("sum_a_u"),
    )
    sb = embedding_dim_stats(b, vec_col).select(
        "pos",
        F.col("n").alias("n_b"),
        F.col("sum_u").alias("sum_b_u"),
    )
    j = sa.join(sb, "pos")
    # DECIMAL(38,0) operands: int64 products wrap silently past
    # n_a·n_b ≈ 1.8e14 in non-ANSI Spark and would flip `drifted`;
    # decimal keeps the comparison exact through the full envelope
    # (same fix as timeseries.rolling_anomaly's dev² comparison).
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lhs = F.abs(
        dec(F.col("sum_a_u")) * dec(F.col("n_b"))
        - dec(F.col("sum_b_u")) * dec(F.col("n_a"))
    )
    rhs = dec(F.lit(int(threshold_u))) * dec(F.col("n_a")) * dec(F.col("n_b"))
    return j.select(
        "pos",
        "n_a",
        "n_b",
        "sum_a_u",
        "sum_b_u",
        (F.col("sum_a_u").cast("double") / F.col("n_a").cast("double")).alias(
            "mean_a_u"
        ),
        (F.col("sum_b_u").cast("double") / F.col("n_b").cast("double")).alias(
            "mean_b_u"
        ),
        (lhs > rhs).alias("drifted"),
    )

"""Z-order (Morton-curve) clustering for multi-dimension file skipping.

Parquet min/max skipping only helps on columns the data is sorted by;
sorting by one column destroys locality on the other. Interleaving the
bits of two key columns puts rows close in BOTH dimensions into the
same files, so point/range predicates on either column prune files —
the clustering service Hudi/Delta expose as Z-ORDER, expressed here as
a pure column expression + ``sortWithinPartitions`` (no extra shuffle
on top of the write's own partitioning).

The interleave is exact integer arithmetic (one HOF fold over bit
indices, whole-stage codegen) — cross-engine deterministic, so the
declared query hash-matches a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of
    ``a`` lands at position 2i, of ``b`` at 2i+1. Pass plain (or
    pre-staged) columns — an expensive expression here would be
    inlined once per bit."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    idx = F.sequence(F.lit(0), F.lit(bits - 1))

    def bit_at(col: Column, i: Column) -> Column:
        return (
            F.call_function("shiftrightunsigned", col, i)
            .bitwiseAND(F.lit(1))
            .cast("long")
        )

    return F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.call_function("shiftleft", bit_at(a, i), i * 2)
        + F.call_function("shiftleft", bit_at(b, i), i * 2 + 1),
    )


def cluster_by_zorder(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """Order rows along the Z-curve of (col_a, col_b) within their
    partitions (no shuffle): write the result and both columns get
    file-level min/max skipping. Values are folded into ``bits``-bit
    space by modulus; callers with skewed domains should pre-bucket
    (e.g. ntile/rank) first."""
    span = F.lit(1 << bits)
    zkey = morton_key(
        F.pmod(F.col(col_a).cast("long"), span),
        F.pmod(F.col(col_b).cast("long"), span),
        bits,
    )
    return df.sortWithinPartitions(zkey)


def morton_key_n(cols: list, bits: int | None = None) -> Column:
    """N-dimensional Morton interleave: bit i of column j lands at
    position ``i·n + j`` — the generalization ``OPTIMIZE ... ZORDER BY
    (a, b, c)`` needs. ``bits`` defaults to ``63 // n`` (the most bits
    per dimension that keep the key inside a signed int64). Pass plain
    or pre-staged columns — an expensive expression would inline once
    per bit. Exact integer arithmetic, cross-engine deterministic."""
    n = len(cols)
    if n < 2:
        raise ValueError("morton_key_n needs at least 2 columns")
    if bits is None:
        bits = 63 // n
    if bits * n > 63:
        raise ValueError(f"{n} dims × {bits} bits exceeds a signed int64")
    staged = [F.col(c) if isinstance(c, str) else c for c in cols]
    idx = F.sequence(F.lit(0), F.lit(bits - 1))

    def bit_at(col: Column, i: Column) -> Column:
        return (
            F.call_function("shiftrightunsigned", col, i)
            .bitwiseAND(F.lit(1))
            .cast("long")
        )

    def step(acc: Column, i: Column) -> Column:
        out = acc
        for j, col in enumerate(staged):
            out = out + F.call_function(
                "shiftleft", bit_at(col, i), i * n + F.lit(j)
            )
        return out

    return F.aggregate(idx, F.lit(0).cast("long"), step)


def cluster_by_zorder_n(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> DataFrame:
    """Order rows along the N-dimensional Z-curve of ``cols`` within
    their partitions (no shuffle) — file-level min/max skipping on
    EVERY listed column after the write. Values fold into the per-dim
    bit space by modulus; pre-bucket skewed domains first."""
    n = len(cols)
    b = bits if bits is not None else 63 // n
    span = F.lit(1 << b)
    zkey = morton_key_n(
        [F.pmod(F.col(c).cast("long"), span) for c in cols], b
    )
    return df.sortWithinPartitions(zkey)

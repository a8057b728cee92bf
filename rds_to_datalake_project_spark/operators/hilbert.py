"""Hilbert-curve clustering for multi-dimension file skipping.

Companion to Z-order (operators/zorder.py): Morton interleaving is
cheap but adjacent Z cells jump across space at every quadrant
boundary, so a range predicate still touches files holding distant
cells. The Hilbert curve visits every cell pair adjacently, giving
strictly better min/max pruning for the same sort — the reason
Hudi/Delta expose HILBERT alongside ZORDER.

The classic ``xy2d`` walk (the textbook-public algorithm, e.g. the
Wikipedia "Hilbert curve" reference implementation) is sequential
(each bit level reflects and swaps the remaining coordinates), which
looks hostile to a set-oriented engine — but the walk's whole state is three small
integers, so it folds into ONE Catalyst ``aggregate`` over bit
levels with (x, y, d) PACKED into a single 64-bit accumulator
(``x | y<<bits | d<<2·bits``). Pure integer arithmetic inside
whole-stage codegen — no UDF, no shuffle — and bit-identical in
DuckDB via ``list_reduce``, so the key is oracle-checkable
(plans/extensions.py ``hilbert_key_orders``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 bits per dimension: d < 4^15 = 2^30, packed state < 2^60 — the
# whole fold stays safely inside signed int64.
BITS = 15


def _shl(col: Column, n: Column | int) -> Column:
    return F.call_function("shiftleft", col, F.lit(n) if isinstance(n, int) else n)


def _shr(col: Column, n: Column | int) -> Column:
    return F.call_function(
        "shiftrightunsigned", col, F.lit(n) if isinstance(n, int) else n
    )


def hilbert_key(a: Column | str, b: Column | str, bits: int = BITS) -> Column:
    """Hilbert distance of (``a``, ``b``) on a 2^bits × 2^bits grid.

    One ``aggregate`` over bit levels high→low; per step the packed
    accumulator unpacks to (x, y, d), accrues the quadrant offset
    ``s²·((3·rx) XOR ry)``, applies the Hilbert reflection/swap, and
    repacks. Reflections use the full mask (``M − v`` ≡ Wikipedia's
    ``n-1-v``) — bits above the current level are never re-read, so
    this matches the per-level reflection exactly."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    mask = (1 << bits) - 1
    init = (a.cast("long") + _shl(b.cast("long"), bits)).cast("long")
    levels = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))

    def step(acc: Column, i: Column) -> Column:
        x = acc.bitwiseAND(F.lit(mask))
        y = _shr(acc, bits).bitwiseAND(F.lit(mask))
        d = _shr(acc, 2 * bits)
        rx = _shr(x, i).bitwiseAND(F.lit(1))
        ry = _shr(y, i).bitwiseAND(F.lit(1))
        d2 = d + _shl((rx * 3).bitwiseXOR(ry), i * 2)
        x2 = F.when(ry == 1, x).when(rx == 1, F.lit(mask) - y).otherwise(y)
        y2 = F.when(ry == 1, y).when(rx == 1, F.lit(mask) - x).otherwise(x)
        return x2 + _shl(y2, bits) + _shl(d2, 2 * bits)

    return _shr(F.aggregate(levels, init, step), 2 * bits)


def cluster_by_hilbert(
    df: DataFrame, col_a: str, col_b: str, bits: int = BITS
) -> DataFrame:
    """Order rows along the Hilbert curve of (col_a, col_b) within
    their partitions (no shuffle — same contract as
    ``cluster_by_zorder``): write the result and both columns get
    file-level min/max skipping with better locality than Z-order.
    Values fold into ``bits``-bit space by modulus; pre-bucket skewed
    domains first."""
    span = F.lit(1 << bits)
    key = hilbert_key(
        F.pmod(F.col(col_a).cast("long"), span),
        F.pmod(F.col(col_b).cast("long"), span),
        bits,
    )
    return df.sortWithinPartitions(key)


def hilbert_d2xy(bits: int, d: int) -> tuple[int, int]:
    """Inverse walk (driver-side helper for debugging/verification):
    Hilbert distance → (x, y). Python-only; not used in plans."""
    x = y = 0
    s = 1
    while s < (1 << bits):
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s *= 2
    return x, y

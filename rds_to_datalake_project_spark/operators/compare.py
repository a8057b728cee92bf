"""T1/T2 — differential comparator (source-of-truth vs lake).

Reference: rds_to_datalake/compare.py:52-88 — count equality, then a
driver-side zip of two fully-collected, id-sorted row lists, printing
the first 10 diffs. That collapses on big tables.

Engine: distributed set-diff. ``exceptAll`` both ways proves multiset
equality without ever collecting the tables; the mismatch report joins
on the key and surfaces the first N differing rows. One shuffle each
way; at 100 TB this is a standard co-partitioned anti-join.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Engine/meta columns dropped before compare — the reference drops
# Hudi's _hoodie* meta + derived partition cols (compare.py:38-48).
META_PREFIXES = ("_hoodie", "__")
PARTITION_SUFFIXES = ("_year", "_month", "_day", "_hour", "_minute")


def strip_meta_columns(df: DataFrame) -> DataFrame:
    drop = [
        c
        for c in df.columns
        if c.startswith(META_PREFIXES) or c.endswith(PARTITION_SUFFIXES)
    ]
    return df.drop(*drop) if drop else df


@dataclass
class CompareResult:
    n_source: int
    n_lake: int
    n_only_in_source: int
    n_only_in_lake: int
    sample_diffs: list = field(default_factory=list)

    @property
    def equal(self) -> bool:
        return (
            self.n_source == self.n_lake
            and self.n_only_in_source == 0
            and self.n_only_in_lake == 0
        )


def diff_report(source: DataFrame, lake: DataFrame) -> DataFrame:
    """Row-level multiset diff as a DataFrame: every row present in
    exactly one side, tagged ``side`` ∈ {source, lake}. The
    distributed whole of what ``compare_tables`` samples — kept lazy
    so a 100 TB audit can write the report instead of collecting it.
    One co-partitioned anti-join shuffle per direction.

    Meta/partition columns are stripped from BOTH sides — the source
    may itself be a partitioned lake read (backup/restore audits
    compare two lake tables)."""
    source = strip_meta_columns(source)
    lake = strip_meta_columns(lake).select(*source.columns)
    return (
        source.exceptAll(lake)
        .withColumn("side", F.lit("source"))
        .unionByName(lake.exceptAll(source).withColumn("side", F.lit("lake")))
    )


def compare_tables(
    source: DataFrame,
    lake: DataFrame,
    keys: Sequence[str] = ("id",),
    sample: int = 10,
) -> CompareResult:
    """Multiset-compare two tables; report counts and ≤``sample``
    differing keys (reference compare.py:56-79 semantics, distributed).
    Both sides are meta-stripped so lake-vs-lake audits work."""
    source = strip_meta_columns(source)
    lake = strip_meta_columns(lake).select(*source.columns)
    only_src = source.exceptAll(lake)
    only_lake = lake.exceptAll(source)
    n_src, n_lake = source.count(), lake.count()
    n_os, n_ol = only_src.count(), only_lake.count()
    diffs = []
    if n_os or n_ol:
        s = only_src.select(*keys, *[F.col(c) for c in source.columns if c not in keys])
        l = only_lake.select(*keys, *[F.col(c) for c in source.columns if c not in keys])
        diffs = (
            s.withColumn("__side", F.lit("source"))
            .unionByName(l.withColumn("__side", F.lit("lake")))
            .orderBy(*keys)
            .limit(sample)
            .collect()
        )
    return CompareResult(n_src, n_lake, n_os, n_ol, diffs)


def table_checksum(
    df: DataFrame,
    cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Order-independent content checksum for anti-entropy table
    comparison at 100 TB: full-row diff (``compare_tables``) moves both
    tables through a shuffle; this moves ONE ROW PER GROUP — hash each
    row to a 60-bit md5-derived integer and XOR them per group (XOR is
    commutative/associative, so the result is partition- and
    order-independent), alongside a row count. Two replicas agree iff
    every (group, n_rows, xor_sig) row matches; a mismatched group
    localizes the diff so only that slice needs the full compare.

    NULLs are significant (explicit sentinel before concat — concat_ws
    would silently drop them and 'a'|NULL would collide with 'a').
    Cross-engine note: only use columns whose string rendering is
    engine-stable (ints/strings/bools) when oracle-checking; float
    formatting differs between engines.
    """
    sentinel = F.lit("∅")
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), sentinel))
        parts.append(F.lit("|"))
    row = F.concat(*parts[:-1])
    sig = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    gs = list(group_cols or [])
    out = df.select(*gs, sig.alias("__sig")).groupBy(*gs).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__sig)").alias("xor_sig"),
    )
    return out.orderBy(*gs) if gs else out

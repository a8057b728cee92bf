"""Sampling operators for training-data pipelines.

Corpus curation needs reproducible subsets: per-source quotas,
decontamination splits, eval holdouts. Random sampling is
engine/partitioning-dependent; these operators rank rows by a
cross-engine-stable hash (md5 of the key) so the SAME rows are chosen
on any engine, any partitioning, any rerun — and the choice is
oracle-checkable.

Scale: one hash shuffle per group (window rank), map-side md5 — the
same cost class as latest-per-key dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deterministic_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen by md5(key) order.

    The md5 rank is uniform-ish and stable across engines — a
    reproducible pseudo-random quota sample with a SQL twin.
    """
    rank_key = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .drop("__rk")
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    test_permille: int = 10,
) -> DataFrame:
    """Tag each row train/test by a stable hash of its key (md5 last
    3 hex digits mod 1000 < permille → test). Reproducible holdout
    splits for decontamination — no RNG, no ordering dependence."""
    bucket = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 29, 4), 16, 10
    ).cast("long") % 1000
    return df.withColumn(
        "split", F.when(bucket < test_permille, "test").otherwise("train")
    )

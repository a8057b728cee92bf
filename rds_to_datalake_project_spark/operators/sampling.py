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


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
) -> DataFrame:
    """Data-mixing: resample each source at a target epoch multiplier
    — the corpus-weighting step of LLM training recipes ("2.5 epochs
    of wiki, 0.3 of web"). Rows gain an ``epoch`` column:

    - a source with epochs e gets ⌊e⌋ full copies (epoch 0..⌊e⌋−1)
    - plus a fractional top-up epoch holding the deterministic
      md5-bucket fraction (e − ⌊e⌋) of its rows.

    Fully deterministic (no RNG): the same rows appear in the top-up
    on any engine, partitioning, or rerun — md5 of the key maps to a
    60-bit bucket and the row is kept when bucket/2^60 < fraction.
    Map-only: the explode fans out copies without any shuffle, and
    upstream dedup guarantees key-uniqueness per epoch."""
    frac_of = {g: e - int(e) for g, e in epochs.items()}
    whole_of = {g: int(e) for g, e in epochs.items()}

    def lookup(mapping, default):
        expr = F.lit(float(default))
        for g, v in sorted(mapping.items()):
            expr = F.when(F.col(group_col) == g, F.lit(float(v))).otherwise(expr)
        return expr

    whole = lookup(whole_of, int(default_epochs)).cast("int")
    frac = lookup(frac_of, default_epochs - int(default_epochs))
    bucket = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    in_topup = (bucket.cast("double") / F.lit(float(1 << 60))) < frac
    n_epochs = whole + F.when(in_topup, 1).otherwise(0)
    return (
        df.withColumn("__n", n_epochs)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    quota: int,
) -> DataFrame:
    """Weighted sample without replacement, ``quota`` rows per group:
    the Efraimidis–Spirakis exponential-sort scheme (A-ES) with a
    deterministic md5 uniform, so inclusion probability scales with
    the row's weight but the chosen set is identical on any engine,
    partitioning, or rerun.

    Each row draws ``u = (md5_60(key)+1) / 2^60 ∈ (0, 1]`` and ranks
    by priority ``-ln(u) / weight`` ascending (one exponential draw
    with rate = weight — the classic one-pass weighted reservoir
    order). Rows with ``weight <= 0`` or null never qualify.

    Scale: map-side hash + one per-group window rank — the same cost
    class as the unweighted quota sample above, and distributable as
    a bounded per-partition top-k by the window's partial
    TakeOrdered push-down.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    weight = F.col(weight_col).cast("double")
    priority = -F.log(u) / weight
    w = Window.partitionBy(group_col).orderBy(priority, F.col(key_col))
    return (
        df.filter(weight > 0)
        .withColumn("__rk", F.row_number().over(w))
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

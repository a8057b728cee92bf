"""Conditional fan-out before expensive map stages.

Local test corpora arrive as one or two parquet files, so a heavy
per-row stage (minhash signatures, simhash fingerprints, shingling)
would run in a handful of tasks on a 32-core machine. At 100 TB the
opposite holds: the scan's input splits already provide thousands of
partitions, and an unconditional ``repartition`` would be a gratuitous
full shuffle of the corpus. Fan out only when the input is genuinely
under-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_partitions`` (default: cluster
    parallelism) ONLY if it currently has fewer partitions; a
    well-partitioned input passes through untouched — no Exchange in
    the plan."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

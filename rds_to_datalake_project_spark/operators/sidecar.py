"""Epoch-stamped sidecar commit protocol for derived table services.

A table service (SQ8 ANN index, LSH signature index, …) persists
derived state under ``<table>/.<service>`` as a few parquet parts
plus a ``_VERSION`` marker. The parts cannot be committed in one
transaction, so every (re)build stamps one fresh EPOCH (a uuid) into
each part's ``_EPOCH`` marker (written only AFTER that part's parquet
overwrite completes — underscore files are invisible to
``spark.read.parquet``) and finally into ``_VERSION`` alongside the
base-table commit version. A consumer takes the incremental path only
when every epoch agrees with ``_VERSION``; any mismatch or missing
marker means a torn build and forces a full rebuild. Crash at any
point therefore leaves the sidecar looking STALE, never torn-but-
trusted (same conservative posture as the zone map's _SEQ/_SYNC
tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rds_to_datalake_project_spark.operators.zonemap import (
    _read_small,
    _write_small,
)


def read_state(spark: SparkSession, index_dir: str) -> tuple[int, str] | None:
    """(base-table version, build epoch) from ``_VERSION``, or None
    when missing/unparsable (pre-epoch layouts rebuild too)."""
    txt = _read_small(spark, f"{index_dir}/_VERSION")
    parts = (txt or "").split()
    if len(parts) != 2:
        return None
    try:
        return int(parts[0]), parts[1]
    except ValueError:
        return None


def write_state(spark: SparkSession, index_dir: str, version: int, epoch: str) -> None:
    _write_small(spark, f"{index_dir}/_VERSION", f"{version} {epoch}")


def epoch_of(spark: SparkSession, index_dir: str, part: str) -> str | None:
    txt = _read_small(spark, f"{index_dir}/{part}/_EPOCH")
    return txt.strip() if txt and txt.strip() else None


def write_part(
    spark: SparkSession,
    index_dir: str,
    part: str,
    df: DataFrame,
    epoch: str,
    coalesce: int | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Overwrite ``<index>/<part>`` with ``df``, then stamp its epoch
    marker. Returns the MATERIALIZED frame (derived-from-previous
    state is lazy — checkpoint before overwriting the directory it
    reads from; recounting the checkpoint costs no second disk
    read). ``partition_by`` hive-partitions the part so consumers'
    partition filters prune at the directory level (keep such columns
    STRING-typed: the engine session disables partition type
    inference, so values read back as strings)."""
    out = df.localCheckpoint(eager=True)
    writer = out.coalesce(coalesce) if coalesce else out
    w = writer.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"  # part replace = full reset
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{index_dir}/{part}")
    # Marker AFTER the data: a partial overwrite has no _EPOCH and the
    # next consumer rebuilds instead of trusting truncated state.
    _write_small(spark, f"{index_dir}/{part}/_EPOCH", epoch)
    return out


def parts_consistent(
    spark: SparkSession, index_dir: str, parts: list[str]
) -> tuple[int, str] | None:
    """The (version, epoch) state IF every part's epoch matches
    ``_VERSION``'s — else None (torn build → caller rebuilds)."""
    state = read_state(spark, index_dir)
    if state is None:
        return None
    for p in parts:
        if epoch_of(spark, index_dir, p) != state[1]:
            return None
    return state

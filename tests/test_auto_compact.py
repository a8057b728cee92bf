"""Write-side file sizing (optimize_write) and the inline
auto-compaction table service (attach_auto_compact) — the two halves
of the CDC small-files answer: prevent fragmentation at the writer,
repair any that still lands, both through the normal commit protocol.
"""

from __future__ import annotations

import os

from rds_to_datalake_project_spark.operators.compact import (
    attach_auto_compact,
    compact_partitions,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

SPEC = TableSpec(
    "ac",
    record_key=("id",),
    precombine_key="update_at",
    partition_source="create_at",
    partition_granularity="month",
)

INIT_COLS = ["id", "create_at", "update_at", "val"]


def _rows(month: str, n: int, tag: str):
    return [
        (f"{tag}{i}", f"2024-{month}-05T00:00:00", "2024-06-01T00:00:00", tag)
        for i in range(n)
    ]


def _files(*path) -> list[str]:
    d = os.path.join(*[str(p) for p in path])
    return sorted(
        f for f in os.listdir(d) if f.endswith(".parquet") and not f.startswith(".")
    )


def test_optimize_write_one_file_per_small_partition(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), SPEC, optimize_write=True)
    t.initial_load(
        spark.createDataFrame(_rows("01", 40, "a") + _rows("02", 40, "b"), INIT_COLS)
    )
    # 50 distinct keys spread over 8 shuffle partitions would write
    # several files without sizing; with optimize_write each tiny
    # touched partition rights-sizes to exactly ONE file
    t.upsert(spark.createDataFrame(_rows("01", 50, "c"), INIT_COLS))
    jan = _files(tmp_path, "t", "create_year=2024", "create_month=01")
    assert len(jan) == 1, jan
    assert t.read().count() == 130
    # untouched partition not rewritten
    assert (tmp_path / "t" / "create_year=2024" / "create_month=02").exists()


def test_optimize_write_unpartitioned(spark, tmp_path):
    spec = TableSpec(
        "acu", record_key=("id",), precombine_key="update_at",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec, optimize_write=True)
    t.initial_load(spark.createDataFrame(_rows("01", 40, "a"), INIT_COLS))
    t.upsert(spark.createDataFrame(_rows("01", 50, "c"), INIT_COLS))
    assert len(_files(tmp_path, "t")) == 1
    assert t.read().count() == 90


def test_auto_compact_repairs_fragmented_touched_partition(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), SPEC, retain_versions=4)
    t.initial_load(
        spark.createDataFrame(_rows("01", 40, "a") + _rows("02", 40, "b"), INIT_COLS)
    )
    # WITHOUT optimize_write, the merge writes one file per shuffle
    # task holding the partition's rows. At test scale AQE coalesces
    # the tiny shuffle into one task, so disable coalescing for the
    # fragmenting commit (at 100 TB the tasks stay ≥ target size and
    # fragmentation is the natural state this service exists for).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.upsert(spark.createDataFrame(_rows("01", 50, "c"), INIT_COLS))
        frag = _files(tmp_path, "t", "create_year=2024", "create_month=01")
        assert len(frag) > 1, "premise: un-sized merge output is fragmented"

        feb_before = _files(tmp_path, "t", "create_year=2024", "create_month=02")
        attach_auto_compact(t, max_files_per_partition=1)
        # this merge fragments January again (coalescing still off);
        # the post-commit service repairs it in a follow-up commit
        t.upsert(spark.createDataFrame(_rows("01", 50, "d"), INIT_COLS))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    jan = _files(tmp_path, "t", "create_year=2024", "create_month=01")
    assert len(jan) == 1, jan
    # the compaction was a COMMIT: upsert commit + compaction commit
    assert len(t.versions()) >= 3
    # untouched partition not rewritten by the service
    assert _files(tmp_path, "t", "create_year=2024", "create_month=02") == feb_before
    assert t.read().count() == 180  # 80 initial + 50 "c" + 50 "d" inserts
    # history still reconstructs through the compaction commit
    assert t.read_as_of(1).count() == 130


def test_compact_partitions_only_rels_bounds_the_pass(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), SPEC)
    t.initial_load(
        spark.createDataFrame(_rows("01", 40, "a") + _rows("02", 40, "b"), INIT_COLS)
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.upsert(spark.createDataFrame(_rows("01", 50, "c"), INIT_COLS))
        t.upsert(spark.createDataFrame(_rows("02", 50, "d"), INIT_COLS))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    jan_rel = "create_year=2024/create_month=01"
    feb_before = _files(tmp_path, "t", "create_year=2024", "create_month=02")
    assert len(feb_before) > 1  # fragmented too, but out of scope
    done = compact_partitions(t, min_files=1, only_rels={jan_rel})
    assert done == [jan_rel]
    assert len(_files(tmp_path, "t", "create_year=2024", "create_month=01")) == 1
    # the scoped pass never touched February
    assert _files(tmp_path, "t", "create_year=2024", "create_month=02") == feb_before

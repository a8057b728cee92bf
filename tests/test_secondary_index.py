"""Row-level secondary index service (operators/secondary_index.py):
build, delta refresh, re-key tombstoning, torn rebuild, index-only
serving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.secondary_index import (
    _idir,
    attach_secondary_index_maintenance,
    build_secondary_index,
    refresh_secondary_index,
    secondary_lookup,
    secondary_lookup_keys,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec


def _mk(spark, tmp_path, n=100):
    spec = TableSpec(
        "t", record_key=("k",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec, retain_versions=8)
    rows = [(i, i % 10, float(i), 0) for i in range(n)]
    t.initial_load(
        spark.createDataFrame(rows, "k long, grp long, payload double, seq long")
    )
    return t


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k long, grp long, payload double, seq long"
    ).withColumn("Op", F.lit("U"))


def test_build_and_lookup_equals_plain_filter(spark, tmp_path):
    t = _mk(spark, tmp_path)
    build_secondary_index(t, "grp")
    got = {r["k"] for r in secondary_lookup(t, "grp", [3, 7]).collect()}
    want = {r["k"] for r in t.read().filter(F.col("grp").isin([3, 7])).collect()}
    assert got == want and len(got) == 20


def test_refresh_is_incremental_and_rekey_retires_old_entry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    build_secondary_index(t, "grp")
    # k=13 moves grp 3 → 99; k=200 is a new row in grp 3; k=23 deleted
    t.upsert(
        _batch(spark, [(13, 99, 13.0, 1), (200, 3, 200.0, 1)]).unionByName(
            _batch(spark, [(23, 3, 23.0, 1)]).withColumn("Op", F.lit("D"))
        ),
        delete_mode="apply",
    )
    assert refresh_secondary_index(t, "grp") == "incremental"
    got3 = {r["k"] for r in secondary_lookup(t, "grp", [3]).collect()}
    assert 13 not in got3  # re-keyed away: old entry tombstoned
    assert 23 not in got3  # deleted
    assert 200 in got3  # fresh entry
    got99 = {r["k"] for r in secondary_lookup(t, "grp", [99]).collect()}
    assert got99 == {13}
    assert refresh_secondary_index(t, "grp") == "noop"


def test_maintenance_hook_keeps_index_fresh(spark, tmp_path):
    spec = TableSpec(
        "t", record_key=("k",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "svc"), spec, retain_versions=8)
    attach_secondary_index_maintenance(t, "grp")
    t.initial_load(
        spark.createDataFrame(
            [(i, i % 5, float(i), 0) for i in range(50)],
            "k long, grp long, payload double, seq long",
        )
    )
    t.upsert(_batch(spark, [(7, 4, 7.0, 1)]))  # grp 2 → 4
    got = {r["k"] for r in secondary_lookup(t, "grp", [2]).collect()}
    assert 7 not in got
    assert 7 in {r["k"] for r in secondary_lookup(t, "grp", [4]).collect()}


def test_lookup_serves_from_sidecars_not_a_table_scan(spark, tmp_path):
    """The key-resolution leg reads ONLY the entries sidecar."""
    t = _mk(spark, tmp_path)
    build_secondary_index(t, "grp")
    keys_df = secondary_lookup_keys(t, "grp", [3])
    files = keys_df.inputFiles()
    assert files and all("/.secindex_grp/" in f for f in files)
    # and the probed bucket prunes at the DIRECTORY level: the
    # executed scan carries a PartitionFilter on bucket (inputFiles()
    # reports the pre-pruning index, so read the plan)
    plan = keys_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("bucket" in p and p.strip() for p in pf)


def test_torn_sidecar_refuses_lookup_and_refresh_rebuilds(spark, tmp_path):
    t = _mk(spark, tmp_path)
    build_secondary_index(t, "grp")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{_idir(t, 'grp')}/entries/_EPOCH")
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, False)
    with pytest.raises(ValueError, match="secondary index"):
        secondary_lookup(t, "grp", [3])
    assert refresh_secondary_index(t, "grp") == "rebuild"
    assert secondary_lookup(t, "grp", [3]).count() == 10


def test_lookup_join_form_matches_point_form_and_guard_fires(spark, tmp_path):
    import pytest as _pytest

    from rds_to_datalake_project_spark.operators.secondary_index import (
        secondary_lookup_join,
    )

    t = _mk(spark, tmp_path)
    build_secondary_index(t, "grp")
    point = {r["k"] for r in secondary_lookup(t, "grp", [3, 7]).collect()}
    joined = {r["k"] for r in secondary_lookup_join(t, "grp", [3, 7]).collect()}
    assert point == joined and len(point) == 20
    # low-selectivity guard: the point form refuses to collect past max_keys
    with _pytest.raises(ValueError, match="point read"):
        secondary_lookup(t, "grp", [3, 7], max_keys=5)

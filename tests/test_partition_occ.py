"""Partition-level optimistic concurrency (upsert.py::_disjoint_since).

Contract under test: a writer whose commit race was lost to commits
touching ONLY OTHER partitions publishes its staged merge anyway
(zero recompute — Delta-style logical conflict detection); any
overlap — including a deletion vector masking rows in a staged
partition — still conflicts; resets and unversioned tables stay
strictly token-guarded."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.upsert import (
    ConcurrentWriteError,
    KeyedTable,
)
from rds_to_datalake_project_spark.schema import TableSpec


def _spec(name="occ_t", **kw) -> TableSpec:
    kw.setdefault("partition_source", "day")
    kw.setdefault("partition_granularity", "day")
    return TableSpec(
        name, record_key=("id",), precombine_key="update_at", **kw
    )


def _rows(spark, ids, ver="v0"):
    return spark.createDataFrame(
        [
            Row(
                id=i,
                day=f"2024-01-{(i % 4) + 1:02d}",
                amount=float(i),
                update_at=ver,
            )
            for i in ids
        ]
    )


def _table(spark, path, **kw) -> KeyedTable:
    kw.setdefault("retain_versions", 5)
    kw.setdefault("orphan_staging_grace_s", 60.0)
    t = KeyedTable(spark, str(path), _spec(), **kw)
    return t


def _interject(at_point, action):
    """Fire ``action`` once when the publish reaches ``at_point``."""
    orig = KeyedTable._fault
    state = {"done": False}

    def hook(point):
        if point == at_point and not state["done"]:
            state["done"] = True
            action()

    return orig, staticmethod(hook)


def test_disjoint_commits_both_land_without_recompute(spark, tmp_path):
    t = _table(spark, tmp_path / "t", commit_retries=0)
    t.initial_load(_rows(spark, range(40)))
    peer = _table(spark, tmp_path / "t", commit_retries=0)

    # peer commits to day 02 (ids ≡ 1 mod 4) while our merge for
    # day 01 (ids ≡ 0 mod 4) is staged; retries=0 means the ONLY way
    # our upsert succeeds is the disjoint-commit path.
    orig, hook = _interject(
        "staged_written",
        lambda: peer.upsert(_rows(spark, [1, 5], ver="v2")),
    )
    KeyedTable._fault = hook
    try:
        t.upsert(_rows(spark, [0, 4], ver="v3"))
    finally:
        KeyedTable._fault = staticmethod(orig)
    got = {r.id: r.update_at for r in t.read().collect()}
    assert got[0] == "v3" and got[4] == "v3"  # our commit landed
    assert got[1] == "v2" and got[5] == "v2"  # peer's commit intact
    assert t.read().count() == 40
    assert t.versions() == [1, 2]  # two ordinary sequential commits
    assert t.read_as_of(1).filter(F.col("update_at") == "v3").count() == 0


def test_overlapping_commit_still_conflicts(spark, tmp_path):
    t = _table(spark, tmp_path / "t", commit_retries=0)
    t.initial_load(_rows(spark, range(40)))
    peer = _table(spark, tmp_path / "t", commit_retries=0)
    orig, hook = _interject(
        "staged_written",
        lambda: peer.upsert(_rows(spark, [4], ver="v2")),  # same day 01
    )
    KeyedTable._fault = hook
    try:
        with pytest.raises(ConcurrentWriteError):
            t.upsert(_rows(spark, [0], ver="v3"))
    finally:
        KeyedTable._fault = staticmethod(orig)
    # with retries the loser recomputes and both land
    t.commit_retries = 2
    t.upsert(_rows(spark, [0], ver="v3"))
    got = {r.id: r.update_at for r in t.read().collect()}
    assert got[0] == "v3" and got[4] == "v2"


def test_vector_commit_blocks_overlapping_merge(spark, tmp_path):
    """A deletion vector masks rows in day 01; a merge staged from the
    pre-vector snapshot would rewrite day 01 and resurrect them —
    the #dv_rels intersection must force the recompute."""
    t = _table(spark, tmp_path / "t", commit_retries=0)
    t.initial_load(_rows(spark, range(40)))
    peer = _table(
        spark, tmp_path / "t", commit_retries=0, deletion_vectors=True
    )
    orig, hook = _interject(
        "staged_written",
        lambda: peer.delete_where("id = 4"),  # vector in day 01
    )
    KeyedTable._fault = hook
    try:
        with pytest.raises(ConcurrentWriteError):
            t.upsert(_rows(spark, [0], ver="v3"))
    finally:
        KeyedTable._fault = staticmethod(orig)
    assert t.read().filter(F.col("id") == 4).count() == 0  # delete holds
    t.commit_retries = 2
    t.upsert(_rows(spark, [0], ver="v3"))
    assert t.read().filter(F.col("id") == 4).count() == 0  # still holds
    assert t.read().filter(F.col("id") == 0).collect()[0].update_at == "v3"


def test_vector_commit_composes_with_disjoint_merge(spark, tmp_path):
    t = _table(spark, tmp_path / "t", commit_retries=0)
    t.initial_load(_rows(spark, range(40)))
    peer = _table(
        spark, tmp_path / "t", commit_retries=0, deletion_vectors=True
    )
    orig, hook = _interject(
        "staged_written",
        lambda: peer.delete_where("id = 5"),  # vector in day 02
    )
    KeyedTable._fault = hook
    try:
        t.upsert(_rows(spark, [0], ver="v3"))  # day 01 — disjoint
    finally:
        KeyedTable._fault = staticmethod(orig)
    assert t.read().filter(F.col("id") == 5).count() == 0
    assert t.read().filter(F.col("id") == 0).collect()[0].update_at == "v3"


def test_racing_vector_deletes_on_disjoint_partitions(spark, tmp_path):
    t = _table(
        spark, tmp_path / "t", commit_retries=0, deletion_vectors=True
    )
    t.initial_load(_rows(spark, range(40)))
    peer = _table(
        spark, tmp_path / "t", commit_retries=0, deletion_vectors=True
    )
    orig, hook = _interject(
        "dv_staged", lambda: peer.delete_where("id = 1")  # day 02
    )
    KeyedTable._fault = hook
    try:
        n = t.delete_where("id = 0")  # day 01 — disjoint vector
    finally:
        KeyedTable._fault = staticmethod(orig)
    assert n == 1
    assert t.read().count() == 38  # both vector deletes hold


def test_reset_under_a_staged_merge_conflicts(spark, tmp_path):
    t = _table(spark, tmp_path / "t", commit_retries=0)
    t.initial_load(_rows(spark, range(8)))
    peer = _table(spark, tmp_path / "t", commit_retries=0)
    orig, hook = _interject(
        "staged_written",
        lambda: peer.initial_load(_rows(spark, range(8), ver="reset")),
    )
    KeyedTable._fault = hook
    try:
        with pytest.raises(ConcurrentWriteError):
            t.upsert(_rows(spark, [0], ver="v3"))
    finally:
        KeyedTable._fault = staticmethod(orig)
    # the reset table is untouched by the refused merge
    assert {r.update_at for r in t.read().collect()} == {"reset"}


def test_unversioned_tables_stay_strict(spark, tmp_path):
    t = KeyedTable(
        spark,
        str(tmp_path / "t"),
        _spec(),
        commit_retries=0,
        orphan_staging_grace_s=60.0,
    )
    t.initial_load(_rows(spark, range(8)))
    peer = KeyedTable(
        spark, str(tmp_path / "t"), _spec(), orphan_staging_grace_s=60.0
    )
    orig, hook = _interject(
        "staged_written",
        lambda: peer.upsert(_rows(spark, [1], ver="v2")),  # disjoint day
    )
    KeyedTable._fault = hook
    try:
        with pytest.raises(ConcurrentWriteError):
            t.upsert(_rows(spark, [0], ver="v3"))
    finally:
        KeyedTable._fault = staticmethod(orig)

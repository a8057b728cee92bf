"""Snapshot retention + time travel (KeyedTable retain_versions).

Every upsert publish becomes a numbered commit; ``read_as_of(k)``
must reproduce the table exactly as it stood after commit k (0 =
after initial load) — including partitions later replaced, created,
or deleted — and the whole mechanism must survive crashes at the new
retire fault points (it rides the same rename-only publish protocol
as tests/test_crash_recovery.py).
"""

from __future__ import annotations

import pytest

from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

from tests.test_crash_recovery import (
    BATCH_COLS,
    INIT_COLS,
    Boom,
    _assert_clean,
    _inject,
)

SPEC = TableSpec(
    "tt",
    record_key=("id",),
    precombine_key="update_at",
    partition_source="create_at",
    partition_granularity="month",
)

V0 = [  # months 01, 02
    ("r1", "2024-01-05T00:00:00", "2024-01-05T00:00:00", "a1"),
    ("r2", "2024-02-05T00:00:00", "2024-02-05T00:00:00", "a2"),
]
B1 = [  # replace 01, create 03
    ("r1", "2024-01-05T00:00:00", "2024-05-01T00:00:00", "b1", "U"),
    ("r3", "2024-03-05T00:00:00", "2024-05-01T00:00:00", "b3", "I"),
]
B2 = [  # replace 03, delete ALL of 02
    ("r3", "2024-03-05T00:00:00", "2024-06-01T00:00:00", "c3", "U"),
    ("r2", "2024-02-05T00:00:00", "2024-06-01T00:00:00", "x2", "D"),
]
B3 = [  # recreate 02
    ("r4", "2024-02-09T00:00:00", "2024-07-01T00:00:00", "d4", "I"),
]

S0 = {"r1": "a1", "r2": "a2"}
S1 = {"r1": "b1", "r2": "a2", "r3": "b3"}
S2 = {"r1": "b1", "r3": "c3"}
S3 = {"r1": "b1", "r3": "c3", "r4": "d4"}


def _mk(spark, tmp_path, retain=5):
    t = KeyedTable(spark, str(tmp_path / "tt"), SPEC, retain_versions=retain)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    return t


def _vals(df):
    return {r.id: r.val for r in df.select("id", "val").collect()}


def _apply_all(spark, t):
    for b in (B1, B2, B3):
        t.upsert(spark.createDataFrame(b, BATCH_COLS), delete_mode="apply")


def test_read_as_of_reconstructs_every_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    assert t.versions() == [1, 2, 3]
    assert _vals(t.read()) == S3
    assert _vals(t.read_as_of(0)) == S0  # pre-replace, pre-create
    assert _vals(t.read_as_of(1)) == S1  # created 03 visible, 02 alive
    assert _vals(t.read_as_of(2)) == S2  # 02 deleted, 03 replaced
    assert _vals(t.read_as_of(3)) == S3  # == live


def test_unversioned_behavior_is_unchanged(spark, tmp_path):
    """retain_versions=0 (default) must not leave any snapshot debris
    and must refuse time travel."""
    import os

    t = KeyedTable(spark, str(tmp_path / "tt"), SPEC)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    t.upsert(spark.createDataFrame(B1, BATCH_COLS), delete_mode="apply")
    root = str(tmp_path / "tt")
    assert not os.path.exists(f"{root}/.meta")
    assert not os.path.exists(f"{root}/.retired")
    with pytest.raises(ValueError):
        t.read_as_of(0)


def test_retention_requires_partitioned_table(spark, tmp_path):
    with pytest.raises(ValueError):
        KeyedTable(
            spark,
            str(tmp_path / "flat"),
            TableSpec("flat", partition_granularity=None),
            retain_versions=3,
        )


def test_vacuum_versions_expires_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    assert t.vacuum_versions(keep_last=1) == 2
    assert t.versions() == [3]
    assert _vals(t.read()) == S3
    # expired snapshots are gone; the newest anchor still resolves
    assert _vals(t.read_as_of(3)) == S3
    # version counter keeps advancing past the kept anchor
    t.upsert(
        spark.createDataFrame(
            [("r4", "2024-02-09T00:00:00", "2024-08-01T00:00:00", "e4", "U")],
            BATCH_COLS,
        ),
        delete_mode="apply",
    )
    assert t.versions() == [3, 4]
    assert _vals(t.read_as_of(3)) == S3


def test_initial_load_resets_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    assert t.versions() == []
    assert _vals(t.read_as_of(0)) == S0


@pytest.mark.parametrize(
    "point,nth",
    [
        ("parked_aside", 1),
        ("renamed_in", 1),
        ("aside_retired", 1),
        ("partition_published", 1),
        ("all_swapped", 1),
        ("meta_committed", 1),
        ("staging_deleted", 1),
    ],
)
def test_crash_during_retained_publish(spark, tmp_path, monkeypatch, point, nth):
    """Crashes at every publish point — including the new retire and
    commit-record steps — must recover to the exact post-commit state
    AND keep every snapshot readable (no torn history)."""
    t = _mk(spark, tmp_path)
    t.upsert(spark.createDataFrame(B1, BATCH_COLS), delete_mode="apply")

    state = _inject(monkeypatch, point, nth)
    try:
        t.upsert(spark.createDataFrame(B2, BATCH_COLS), delete_mode="apply")
    except Boom:
        pass
    state["fired"] = True  # disarm
    assert t.exists()
    # replay converges (recover() runs first inside upsert)
    t.upsert(spark.createDataFrame(B2, BATCH_COLS), delete_mode="apply")

    assert _vals(t.read()) == S2
    # every snapshot is still exact: the interrupted commit either
    # completed on recovery (then the replay was a no-op commit) or
    # the history simply has one extra identical commit — both yield
    # the same states at every recorded version boundary.
    assert _vals(t.read_as_of(0)) == S0
    assert _vals(t.read_as_of(1)) == S1
    assert _vals(t.read_as_of(t.versions()[-1])) == S2
    _assert_clean(str(tmp_path / "tt"))

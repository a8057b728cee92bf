"""Multi-writer safety: optimistic concurrency on the KeyedTable
commit protocol (operators/upsert.py).

Two independent writers merging into the same table must never lose
each other's commits: every publish validates that the snapshot its
merge was computed from is still the committed snapshot (commit
token), under a short exclusive-create commit mutex. A lost race
recomputes the merge (bounded by ``commit_retries``); a crashed
writer's stale staging is discarded by ``recover()`` instead of
overwriting a later commit.

The reference has no concurrency story at all (one Glue job per
table, reference incremental_load_orchestration.py) — this is an
engine extension in the spirit of Delta Lake's optimistic
transaction protocol, re-expressed over the rename-swap commit.
"""

from __future__ import annotations

import os
import threading

import pytest

from rds_to_datalake_project_spark.operators.upsert import (
    CommitConflict,
    ConcurrentWriteError,
    KeyedTable,
    _LOCK_FILE,
    _TOKEN_FILE,
)
from rds_to_datalake_project_spark.schema import TableSpec

from tests.test_crash_recovery import Boom, _inject

SPEC = TableSpec(
    "cc",
    record_key=("id",),
    precombine_key="update_at",
    partition_source="create_at",
    partition_granularity="month",
)

INIT_COLS = ["id", "create_at", "update_at", "val"]

V0 = [
    ("r1", "2024-01-05T00:00:00", "2024-01-05T00:00:00", "a1"),
    ("r2", "2024-01-06T00:00:00", "2024-01-06T00:00:00", "a2"),
]


def _mk(spark, path, **kw) -> KeyedTable:
    t = KeyedTable(spark, str(path), SPEC, **kw)
    return t


def _row(i: str, val: str):
    # all rows in month 01 → every writer touches the SAME partition
    return (i, "2024-01-10T00:00:00", "2024-06-01T00:00:00", val)


def _vals(t: KeyedTable) -> dict:
    return {r.id: r.val for r in t.read().select("id", "val").collect()}


@pytest.mark.slow
def test_parallel_upserts_no_lost_update(spark, tmp_path):
    """Two writers, interleaved single-row batches into the SAME
    partition: the classic lost-update setup. Every row from both
    writers must survive."""
    path = tmp_path / "t"
    _mk(spark, path).initial_load(spark.createDataFrame(V0, INIT_COLS))

    rounds = 3
    errors: list[BaseException] = []

    def writer(tag: str):
        # grace > 0: a peer's un-flagged in-progress staging must not
        # be yanked by this writer's recover() pass
        t = _mk(spark, path, commit_retries=10, orphan_staging_grace_s=600)
        try:
            for i in range(rounds):
                t.upsert(
                    spark.createDataFrame(
                        [_row(f"{tag}{i}", f"v-{tag}{i}")], INIT_COLS
                    )
                )
        except BaseException as exc:  # surfaced after join
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(tag,)) for tag in ("x", "y")
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    got = _vals(_mk(spark, path))
    expect = {"r1": "a1", "r2": "a2"}
    expect.update({f"{tag}{i}": f"v-{tag}{i}" for tag in ("x", "y") for i in range(rounds)})
    assert got == expect
    # no staging debris, lock released
    names = os.listdir(path)
    assert not any(n.startswith(".staging-") for n in names)
    assert _LOCK_FILE not in names


@pytest.mark.slow
def test_lost_race_recomputes_merge(spark, tmp_path, monkeypatch):
    """Deterministic race: a competing commit lands between writer A's
    merge read and its publish. A's first publish must conflict and
    the retry must merge BOTH batches."""
    path = tmp_path / "t"
    t1 = _mk(spark, path)
    t1.initial_load(spark.createDataFrame(V0, INIT_COLS))
    t2 = _mk(spark, path)

    state = {"fired": False}

    def fault(point):
        # At A's staged_written (merge staged, commit mutex NOT yet
        # held), land a full competing commit through the public API.
        if point == "staged_written" and not state["fired"]:
            state["fired"] = True
            t2.upsert(spark.createDataFrame([_row("zz", "from-b")], INIT_COLS))

    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(fault))
    t1.upsert(spark.createDataFrame([_row("aa", "from-a")], INIT_COLS))

    got = _vals(_mk(spark, path))
    assert got == {"r1": "a1", "r2": "a2", "zz": "from-b", "aa": "from-a"}


@pytest.mark.slow
def test_retries_exhausted_raises_concurrent_write_error(
    spark, tmp_path, monkeypatch
):
    path = tmp_path / "t"
    t1 = _mk(spark, path, commit_retries=1)
    t1.initial_load(spark.createDataFrame(V0, INIT_COLS))
    t2 = _mk(spark, path)

    def fault(point):
        if point == "staged_written":
            # every attempt loses the race (pre-lock, so the conflict
            # check inside _commit_staging sees the moved token)
            t2._write_commit_token()

    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(fault))
    with pytest.raises(ConcurrentWriteError):
        t1.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    # nothing committed, nothing left behind
    assert _vals(_mk(spark, path)) == {"r1": "a1", "r2": "a2"}
    assert not any(n.startswith(".staging-") for n in os.listdir(path))


@pytest.mark.slow
def test_recover_discards_stale_staged_merge(spark, tmp_path, monkeypatch):
    """A writer crashes after flagging its staging; a commit that
    bypasses recovery (vacuum-style) lands before recover() runs. The
    flagged staging predates the committed snapshot and must be
    DISCARDED — publishing it would resurrect pre-commit state."""
    path = tmp_path / "t"
    t1 = _mk(spark, path)
    t1.initial_load(spark.createDataFrame(V0, INIT_COLS))

    _inject(monkeypatch, "flag_created", 1)
    with pytest.raises(Boom):
        t1.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(lambda p: None))

    t2 = _mk(spark, path)
    t2._write_commit_token()  # the bypassing commit
    assert t2.recover() is True
    assert not any(n.startswith(".staging-") for n in os.listdir(path))
    assert _vals(t2) == {"r1": "a1", "r2": "a2"}
    # replaying the batch (at-least-once upstream) converges
    t2.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    assert _vals(t2)["aa"] == "v"


def test_lock_released_when_publish_crashes(spark, tmp_path, monkeypatch):
    path = tmp_path / "t"
    t = _mk(spark, path)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    _inject(monkeypatch, "all_swapped", 1)
    with pytest.raises(Boom):
        t.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    assert _LOCK_FILE not in os.listdir(path)  # released in finally
    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(lambda p: None))
    t2 = _mk(spark, path)
    assert t2.recover() is True  # same-snapshot staging → completes
    assert _vals(t2)["aa"] == "v"


def test_abandoned_lock_broken_after_ttl(spark, tmp_path):
    path = tmp_path / "t"
    t = _mk(spark, path, lock_ttl_s=1.0, lock_timeout_s=30.0)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    lock = path / _LOCK_FILE
    lock.write_text("dead-writer")
    old = 10_000  # seconds in the past
    os.utime(lock, (os.path.getmtime(lock) - old, os.path.getmtime(lock) - old))
    t.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    assert _vals(t)["aa"] == "v"
    assert not lock.exists()


@pytest.mark.slow
def test_held_lock_times_out(spark, tmp_path):
    path = tmp_path / "t"
    t = _mk(spark, path, lock_ttl_s=3600.0, lock_timeout_s=0.5)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    (path / _LOCK_FILE).write_text("live-writer")  # fresh → not breakable
    with pytest.raises(ConcurrentWriteError):
        t.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    (path / _LOCK_FILE).unlink()
    t.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    assert _vals(t)["aa"] == "v"


def test_compaction_conflicts_with_concurrent_commit(
    spark, tmp_path, monkeypatch
):
    """A table rewrite (compaction) staged against a superseded
    snapshot must refuse to publish — it would drop the commit that
    landed while it ran."""
    from rds_to_datalake_project_spark.operators.compact import compact_table

    path = tmp_path / "t"
    t = _mk(spark, path)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))

    orig = KeyedTable.commit_token

    def token_then_commit(self):
        tok = orig(self)
        # competing commit lands right after compaction snapshots its
        # base token (file-level: nothing compaction read moves)
        monkeypatch.setattr(KeyedTable, "commit_token", orig)
        _mk(spark, path)._write_commit_token()
        return tok

    monkeypatch.setattr(KeyedTable, "commit_token", token_then_commit)
    with pytest.raises(CommitConflict):
        compact_table(t)
    assert not any(n.startswith(".staging-") for n in os.listdir(path))
    assert _vals(_mk(spark, path)) == {"r1": "a1", "r2": "a2"}


@pytest.mark.slow
def test_initial_load_reset_fences_preexisting_staging(
    spark, tmp_path, monkeypatch
):
    """A merge staged before a TABLE RESET must not publish over the
    reload — the reset mints a fresh commit token."""
    path = tmp_path / "t"
    t = _mk(spark, path)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    _inject(monkeypatch, "flag_created", 1)
    with pytest.raises(Boom):
        t.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(lambda p: None))
    # the staging survived inside the table dir; a reset wipes the
    # path (static overwrite), so only a staging that escaped the
    # wipe (e.g. object-store eventual listing) is at risk — simulate
    # by re-staging it after the reload
    import shutil

    staging_name = next(
        n for n in os.listdir(path) if n.startswith(".staging-")
    )
    shutil.copytree(path / staging_name, tmp_path / "parked")
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    shutil.copytree(tmp_path / "parked", path / staging_name)
    t2 = _mk(spark, path)
    assert t2.recover() is True
    assert _vals(t2) == {"r1": "a1", "r2": "a2"}  # stale merge discarded


@pytest.mark.slow
def test_commit_token_advances_per_commit(spark, tmp_path):
    path = tmp_path / "t"
    t = _mk(spark, path)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    t0 = t.commit_token()
    assert t0  # minted by initial_load
    t.upsert(spark.createDataFrame([_row("aa", "v")], INIT_COLS))
    t1 = t.commit_token()
    assert t1 and t1 != t0
    assert (path / _TOKEN_FILE).is_file()

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


@pytest.mark.slow
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
    assert t.readable_versions() == []
    with pytest.raises(ValueError):
        t.read_as_of(0)


@pytest.mark.slow
def test_vacuum_versions_expires_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    assert t.readable_versions() == [0, 1, 2, 3]
    assert t.vacuum_versions(keep_last=1) == 2
    assert t.versions() == [3]
    assert _vals(t.read()) == S3
    # floor = min(kept) - 1: version 2's reconstruction only needs
    # events AFTER it (v3's retired copies), which survived the vacuum
    assert t.readable_versions() == [2, 3]
    assert _vals(t.read_as_of(2)) == S2
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


@pytest.mark.parametrize("expired", [0, 1])
@pytest.mark.slow
def test_read_as_of_expired_version_raises(spark, tmp_path, expired):
    """The r4 defect: an expired version must RAISE, never silently
    resolve retired partitions to live dirs and serve a mixed-version
    snapshot."""
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    t.vacuum_versions(keep_last=1)
    with pytest.raises(ValueError, match="not reconstructible"):
        t.read_as_of(expired)


@pytest.mark.slow
def test_read_as_of_out_of_range_raises(spark, tmp_path):
    """A version that never existed must not alias to live state."""
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    with pytest.raises(ValueError, match="not reconstructible"):
        t.read_as_of(99)
    with pytest.raises(ValueError, match="not reconstructible"):
        t.read_as_of(-1)


@pytest.mark.slow
def test_retain_versions_count_is_enforced(spark, tmp_path):
    """retain_versions=N bounds history automatically: every publish
    expires commits beyond the newest N — no unbounded growth behind
    a caller who never vacuums."""
    t = _mk(spark, tmp_path, retain=2)
    _apply_all(spark, t)  # commits 1, 2, 3
    assert t.versions() == [2, 3]
    assert t.readable_versions() == [1, 2, 3]
    assert _vals(t.read_as_of(1)) == S1
    assert _vals(t.read_as_of(2)) == S2
    assert _vals(t.read_as_of(3)) == S3
    with pytest.raises(ValueError, match="not reconstructible"):
        t.read_as_of(0)


@pytest.mark.slow
def test_crash_mid_vacuum_is_conservative(spark, tmp_path, monkeypatch):
    """The floor is persisted BEFORE any history is deleted, so a
    crash mid-vacuum can only shrink the readable set, never leave a
    version readable-looking with half its history gone."""
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    _inject(monkeypatch, "floor_written", 1)
    with pytest.raises(Boom):
        t.vacuum_versions(keep_last=1)
    # nothing deleted yet, but the floor already excludes 0 and 1
    assert t.readable_versions() == [2, 3]
    with pytest.raises(ValueError, match="not reconstructible"):
        t.read_as_of(0)
    assert _vals(t.read_as_of(2)) == S2
    assert _vals(t.read_as_of(3)) == S3
    # re-running the vacuum completes the expiry
    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(lambda p: None))
    t.vacuum_versions(keep_last=1)
    assert t.versions() == [3]
    assert _vals(t.read_as_of(2)) == S2


@pytest.mark.slow
def test_initial_load_resets_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    assert t.versions() == []
    assert _vals(t.read_as_of(0)) == S0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KEYS = [f"k{i}" for i in range(8)]
_KEY_MONTH = {k: f"2024-0{i % 3 + 1}" for i, k in enumerate(_KEYS)}


_FLAT_MODEL_SPEC = TableSpec(
    "ttm_flat",
    record_key=("id",),
    precombine_key="update_at",
    partition_granularity=None,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.parametrize("spec", [SPEC, _FLAT_MODEL_SPEC], ids=["part", "flat"])
@given(data=st.data())
@pytest.mark.slow
def test_time_travel_matches_model_under_random_batches(
    spark, tmp_path_factory, spec, data
):
    """Model-based check: random upsert/delete batches against a
    Python dict-of-states model — every retained snapshot must equal
    its model state exactly (through partition creation, deletion,
    and total emptiness), and after a random vacuum every expired
    version must raise while every kept one stays exact. Runs over
    both the partitioned and the unpartitioned retention paths."""
    path = str(tmp_path_factory.mktemp("ttm") / "t")
    t = KeyedTable(spark, path, spec, retain_versions=10)

    def row(k, op, v):
        return (k, f"{_KEY_MONTH[k]}-05T00:00:00", f"2024-09-0{v}T00:00:00",
                f"{k}@v{v}", op)

    init_keys = sorted(data.draw(
        st.sets(st.sampled_from(_KEYS), min_size=1), label="init"
    ))
    state = {k: f"{k}@v0" for k in init_keys}
    t.initial_load(
        spark.createDataFrame([row(k, "I", 0) for k in init_keys], BATCH_COLS)
    )
    states = [dict(state)]

    n_batches = data.draw(st.integers(1, 4), label="n_batches")
    for v in range(1, n_batches + 1):
        ops = data.draw(
            st.dictionaries(
                st.sampled_from(_KEYS),
                st.sampled_from(["U", "D"]),
                min_size=1,
            ),
            label=f"batch{v}",
        )
        t.upsert(
            spark.createDataFrame(
                [row(k, op, v) for k, op in ops.items()], BATCH_COLS
            ),
            delete_mode="apply",
        )
        for k, op in ops.items():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = f"{k}@v{v}"
        states.append(dict(state))

    for v, expect in enumerate(states):
        assert _vals(t.read_as_of(v)) == expect, f"version {v}"

    keep = data.draw(st.integers(1, n_batches), label="keep_last")
    t.vacuum_versions(keep_last=keep)
    floor = t.readable_versions()[0]
    for v, expect in enumerate(states):
        if v >= floor:
            assert _vals(t.read_as_of(v)) == expect, f"kept version {v}"
        else:
            with pytest.raises(ValueError, match="not reconstructible"):
                t.read_as_of(v)


FLAT_SPEC = TableSpec(
    "tt_flat",
    record_key=("id",),
    precombine_key="update_at",
    partition_granularity=None,
)


def _mk_flat(spark, tmp_path, retain=5):
    t = KeyedTable(spark, str(tmp_path / "ttf"), FLAT_SPEC, retain_versions=retain)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    return t


def test_unpartitioned_read_as_of_reconstructs_every_version(spark, tmp_path):
    """Flat tables retain too: the swap unit is the whole file set,
    so .retired/v{k} holds the complete pre-k table."""
    t = _mk_flat(spark, tmp_path)
    _apply_all(spark, t)
    assert t.versions() == [1, 2, 3]
    assert _vals(t.read()) == S3
    assert _vals(t.read_as_of(0)) == S0
    assert _vals(t.read_as_of(1)) == S1
    assert _vals(t.read_as_of(2)) == S2
    assert _vals(t.read_as_of(3)) == S3


def test_unpartitioned_vacuum_floor(spark, tmp_path):
    t = _mk_flat(spark, tmp_path)
    _apply_all(spark, t)
    assert t.vacuum_versions(keep_last=1) == 2
    assert t.readable_versions() == [2, 3]
    assert _vals(t.read_as_of(2)) == S2
    assert _vals(t.read_as_of(3)) == S3
    with pytest.raises(ValueError, match="not reconstructible"):
        t.read_as_of(1)


def test_unpartitioned_delete_all_snapshot(spark, tmp_path):
    """Emptying a retained flat table must keep every prior snapshot
    exact and serve the latest version as a real empty DataFrame."""
    t = _mk_flat(spark, tmp_path)
    deletes = [
        ("r1", "2024-01-05T00:00:00", "2024-09-01T00:00:00", "x1", "D"),
        ("r2", "2024-02-05T00:00:00", "2024-09-01T00:00:00", "x2", "D"),
    ]
    t.upsert(spark.createDataFrame(deletes, BATCH_COLS), delete_mode="apply")
    assert _vals(t.read_as_of(0)) == S0
    assert t.read_as_of(1).count() == 0


@pytest.mark.parametrize(
    "point,nth",
    [
        ("parked_file", 1),
        ("parked_file", 2),
        ("moved_in_file", 1),
        ("files_moved", 1),
        ("all_swapped", 1),
        ("meta_committed", 1),
        ("staging_deleted", 1),
    ],
)
def test_crash_during_retained_flat_publish(
    spark, tmp_path, monkeypatch, point, nth
):
    """The unpartitioned retention path rides the same crash-safe
    protocol: every fault point recovers with exact history."""
    t = _mk_flat(spark, tmp_path)
    t.upsert(spark.createDataFrame(B1, BATCH_COLS), delete_mode="apply")

    state = _inject(monkeypatch, point, nth)
    try:
        t.upsert(spark.createDataFrame(B2, BATCH_COLS), delete_mode="apply")
    except Boom:
        pass
    state["fired"] = True  # disarm
    assert t.exists()
    t.upsert(spark.createDataFrame(B2, BATCH_COLS), delete_mode="apply")

    assert _vals(t.read()) == S2
    assert _vals(t.read_as_of(0)) == S0
    assert _vals(t.read_as_of(1)) == S1
    assert _vals(t.read_as_of(t.versions()[-1])) == S2
    _assert_clean(str(tmp_path / "ttf"))


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
@pytest.mark.slow
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


def test_vacuum_partitions_is_a_commit_on_retained_tables(spark, tmp_path):
    """Dropping partitions on a retained table must be a numbered
    commit: old snapshots still reconstruct exactly and the feed
    reports the drop as deletes — never a silent row loss."""
    t = _mk(spark, tmp_path)  # months 01 (r1), 02 (r2); retain 5
    dropped = t.vacuum_partitions(lambda vals: vals[1] >= "02")
    assert dropped == 1
    assert t.versions() == [1]
    assert _vals(t.read()) == {"r2": "a2"}
    assert _vals(t.read_as_of(0)) == S0  # dropped month still readable
    changes = {
        r.id: r._change_type
        for r in t.table_changes(0, 1).select("id", "_change_type").collect()
    }
    assert changes == {"r1": "delete"}


def test_vacuum_partitions_crash_rolls_back_uncommitted_drop(
    spark, tmp_path, monkeypatch
):
    t = _mk(spark, tmp_path)
    state = _inject(monkeypatch, "vacuum_retired", 1)
    with pytest.raises(Boom):
        t.vacuum_partitions(lambda vals: False)  # try to drop both
    assert state["fired"]
    # uncommitted: recover() restores the retired dirs; nothing lost
    assert t.recover() is True
    assert _vals(t.read()) == S0
    assert t.versions() == []
    # and the drop can then be applied cleanly
    assert t.vacuum_partitions(lambda vals: False) == 2
    assert t.read().count() == 0
    assert _vals(t.read_as_of(0)) == S0


def test_vacuum_partitions_crash_after_commit_stands(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path)
    state = _inject(monkeypatch, "vacuum_committed", 1)
    with pytest.raises(Boom):
        t.vacuum_partitions(lambda vals: vals[1] >= "02")
    assert state["fired"]
    t.recover()
    # record landed before the crash → the drop is durable
    assert t.versions() == [1]
    assert _vals(t.read()) == {"r2": "a2"}
    assert _vals(t.read_as_of(0)) == S0


def test_purge_rows_erases_history_and_feed(spark, tmp_path):
    """purge_rows is a HARD delete: live state loses the rows, every
    pre-delete snapshot raises (floor enforced), and no changes-feed
    batch retains the purged images; later commits work normally."""
    import pyspark.sql.functions as F

    feed = str(tmp_path / "feed")
    t = KeyedTable(
        spark, str(tmp_path / "p"), SPEC, retain_versions=5,
        changes_feed_dir=feed,
    )
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    t.upsert(spark.createDataFrame(B1, BATCH_COLS))  # v1 (feed batch)
    victim_ids = [r.id for r in t.read().limit(1).collect()]
    n = t.purge_rows(F.col("id").isin(victim_ids))
    assert n == 1
    # live state clean
    assert not set(victim_ids) & {r.id for r in t.read().collect()}
    # every pre-purge snapshot is gone
    assert t.readable_versions() == [t.versions()[-1]]
    with pytest.raises(ValueError):
        t.read_as_of(0)
    # the feed holds NO batch dirs (purged images included)
    import os
    dirs = [d for d in os.listdir(feed) if d.startswith("v")] if os.path.exists(feed) else []
    assert dirs == []
    # and a later commit does not resurrect expired batches
    t.upsert(spark.createDataFrame(B1, BATCH_COLS))
    dirs = sorted(d for d in os.listdir(feed) if d.startswith("v"))
    assert len(dirs) == 1  # only the NEW commit's batch
    feed_rows = spark.read.format("json").load(f"{feed}/{dirs[0]}") if dirs else None
    # no purged id appears in any remaining feed content
    if feed_rows is not None and "id" in feed_rows.columns:
        assert feed_rows.filter(F.col("id").isin(victim_ids)).count() == 0
    # purge with no matches is a no-op
    assert t.purge_rows(F.col("id") == "no-such-key") == 0


# --- RESTORE (rollback-as-a-commit) ------------------------------------------

@pytest.mark.slow
def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    """restore_to_version(k): read() == the v_k snapshot, committed as
    a NEW version — all prior versions (including the rolled-back
    ones) stay reconstructible."""
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    new_v = t.restore_to_version(1)
    assert new_v == 4
    assert _vals(t.read()) == S1  # month 02 back alive, 03 back to b3
    # append-only history: every earlier state still reads exactly
    for v, s in ((0, S0), (1, S1), (2, S2), (3, S3), (4, S1)):
        assert _vals(t.read_as_of(v)) == s, v
    # the table keeps working after a restore
    t.upsert(spark.createDataFrame(B2, BATCH_COLS), delete_mode="apply")
    assert _vals(t.read()) == S2


def test_restore_to_initial_and_to_head(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    assert t.restore_to_version(3) == 3  # restore-to-head: no-op
    assert t.versions() == [1, 2, 3]
    assert t.restore_to_version(0) == 4  # back to the initial load
    assert _vals(t.read()) == S0
    assert _vals(t.read_as_of(3)) == S3


def test_restore_requires_readable_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    with pytest.raises(ValueError):
        t.restore_to_version(9)
    t2 = KeyedTable(spark, str(tmp_path / "plain"), SPEC)
    t2.initial_load(spark.createDataFrame(V0, INIT_COLS))
    with pytest.raises(ValueError):
        t2.restore_to_version(0)  # unversioned table


def test_restore_sql_facade(spark, tmp_path):
    from rds_to_datalake_project_spark.sql import run_query

    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    out = run_query(
        spark, "RESTORE TABLE tt TO VERSION AS OF 2", tables={"tt": t}
    ).collect()[0]
    assert (out.restored_version, out.new_version) == (2, 4)
    assert _vals(t.read()) == S2


def test_restore_crash_mid_publish_recovers(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    _inject(monkeypatch, "all_swapped", 1)
    with pytest.raises(Boom):
        t.restore_to_version(1)
    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(lambda p: None))
    t2 = KeyedTable(spark, str(tmp_path / "tt"), SPEC, retain_versions=5)
    assert t2.recover() is True
    assert _vals(t2.read()) == S1
    assert t2.versions() == [1, 2, 3, 4]
    _assert_clean(str(tmp_path / "tt"))


# --- FOR TIMESTAMP AS OF -----------------------------------------------------

@pytest.mark.slow
def test_version_at_timestamp_resolves_each_commit(spark, tmp_path):
    """Timestamps between commits resolve to the newest version at or
    before them; pre-history raises; 'now' resolves to the head."""
    import datetime as dt
    import time

    def now_iso():
        time.sleep(1.1)  # commit mtimes are ms; keep marks strictly apart
        out = dt.datetime.now(dt.timezone.utc).isoformat()
        time.sleep(1.1)
        return out

    t = _mk(spark, tmp_path)
    m0 = now_iso()  # after initial load, before commit 1
    t.upsert(spark.createDataFrame(B1, BATCH_COLS), delete_mode="apply")
    m1 = now_iso()
    t.upsert(spark.createDataFrame(B2, BATCH_COLS), delete_mode="apply")
    m2 = now_iso()

    assert t.version_at_timestamp(m0) == 0
    assert t.version_at_timestamp(m1) == 1
    assert t.version_at_timestamp(m2) == 2
    assert _vals(t.read_at_timestamp(m1)) == S1
    with pytest.raises(ValueError):
        t.version_at_timestamp("2001-01-01T00:00:00")
    # epoch-seconds form
    assert t.version_at_timestamp(time.time()) == 2


@pytest.mark.slow
def test_for_timestamp_as_of_sql(spark, tmp_path):
    import datetime as dt
    import time

    from rds_to_datalake_project_spark.sql import run_query

    t = _mk(spark, tmp_path)
    time.sleep(1.1)
    mark = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")
    time.sleep(1.1)
    _apply_all(spark, t)
    got = {
        r.id: r.val
        for r in run_query(
            spark,
            f"SELECT id, val FROM tt FOR TIMESTAMP AS OF '{mark}'",
            tables={"tt": t},
        ).collect()
    }
    assert got == S0
    # a literal containing the phrase is data, not syntax
    one = run_query(
        spark,
        "SELECT 'x FOR TIMESTAMP AS OF ''2020-01-01''' AS s",
        tables={"tt": t},
    ).collect()
    assert len(one) == 1


def test_restore_to_timestamp_and_vacuum_hours(spark, tmp_path):
    """Wall-clock spellings of the history verbs: RESTORE TABLE ...
    TO TIMESTAMP AS OF rolls back to the version current at that
    instant; VACUUM ... RETAIN n HOURS expires by commit AGE (a huge
    horizon expires nothing; horizon 0 keeps only the newest)."""
    import datetime as _dt
    import os

    from rds_to_datalake_project_spark.sql import run_query

    t = _mk(spark, tmp_path)
    _apply_all(spark, t)  # commits 1..3
    # timestamp just after commit 1's record mtime
    mt = os.path.getmtime(f"{t.path}/.meta/v1.flag")
    ts = _dt.datetime.fromtimestamp(mt + 0.001, _dt.timezone.utc).isoformat()
    out = run_query(
        spark,
        f"RESTORE TABLE tt TO TIMESTAMP AS OF '{ts}'",
        tables={"tt": t},
    ).collect()[0]
    assert out.restored_version == 1 and out.new_version == 4
    assert _vals(t.read()) == S1
    # age-based retention: a huge horizon is a no-op
    assert run_query(
        spark, "VACUUM tt RETAIN 1000 HOURS", tables={"tt": t}
    ).collect()[0].versions_expired == 0
    assert t.readable_versions()[0] == 0
    # horizon 0: everything is older than now — keep only the newest
    out = run_query(
        spark, "VACUUM tt RETAIN 0 HOURS", tables={"tt": t}
    ).collect()[0]
    assert out.versions_expired == 3
    assert t.readable_versions() == [3, 4]
    assert _vals(t.read()) == S1  # live head unaffected by expiry

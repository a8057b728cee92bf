"""Cross-lake replication from the changes feed
(operators/replicate.py): bootstrap, multi-commit catch-up, crash
replay, vacuumed-feed refusal, checksum fidelity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.compare import table_checksum
from rds_to_datalake_project_spark.operators.replicate import (
    applied_version,
    apply_changes_feed,
    bootstrap_replica,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec


def _specs():
    src = TableSpec(
        "src", record_key=("k",), precombine_key="seq",
        partition_granularity=None,
    )
    rep = TableSpec(
        "rep", record_key=("k",), precombine_key="_rep_seq",
        partition_granularity=None,
    )
    return src, rep


def _mk_source(spark, tmp_path):
    src_spec, _ = _specs()
    feed = str(tmp_path / "feed")
    t = KeyedTable(
        spark, str(tmp_path / "src"), src_spec,
        retain_versions=8, changes_feed_dir=feed,
    )
    t.initial_load(
        spark.createDataFrame(
            [(i, f"v0-{i}", 0) for i in range(30)], "k long, val string, seq long"
        )
    )
    return t, feed


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, val string, seq long, Op string")


def _sig(df):
    return {
        tuple(r) for r in table_checksum(df, ["k", "val"]).collect()
    }


def test_replica_converges_through_updates_deletes_reinserts(spark, tmp_path):
    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)

    # commit 1: update + insert; commit 2: delete + re-key-style insert
    t.upsert(_batch(spark, [(3, "v1-3", 1, "U"), (100, "v1-100", 1, "U")]))
    t.upsert(
        _batch(spark, [(5, "x", 2, "D"), (101, "v2-101", 2, "U")]),
        delete_mode="apply",
    )
    out = apply_changes_feed(r, feed)
    assert out["applied"] == [1, 2] and applied_version(r) == 2
    assert _sig(r.read().select("k", "val")) == _sig(t.read().select("k", "val"))
    # idempotent at head
    assert apply_changes_feed(r, feed)["applied"] == []


def test_update_then_delete_in_one_catchup_collapses_to_tombstone(spark, tmp_path):
    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    t.upsert(_batch(spark, [(7, "v1-7", 1, "U")]))
    t.upsert(_batch(spark, [(7, "x", 2, "D")]), delete_mode="apply")
    t.upsert(_batch(spark, [(8, "v3-8", 3, "U")]))
    apply_changes_feed(r, feed)
    ks = {row["k"] for row in r.read().collect()}
    assert 7 not in ks and 8 in ks
    assert _sig(r.read().select("k", "val")) == _sig(t.read().select("k", "val"))


def test_crash_before_cursor_advance_replays_idempotently(spark, tmp_path, monkeypatch):
    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    t.upsert(_batch(spark, [(1, "v1-1", 1, "U")]))

    import rds_to_datalake_project_spark.operators.replicate as rep_mod

    real = rep_mod._write_small
    blow = {"armed": True}

    def exploding(spark_, path, text):
        if blow["armed"] and path.endswith("_APPLIED"):
            blow["armed"] = False
            raise RuntimeError("injected crash before cursor write")
        return real(spark_, path, text)

    monkeypatch.setattr(rep_mod, "_write_small", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        apply_changes_feed(r, feed)
    monkeypatch.setattr(rep_mod, "_write_small", real)

    # cursor still old → replay; upsert idempotence converges
    assert applied_version(r) == 0
    assert apply_changes_feed(r, feed)["applied"] == [1]
    assert _sig(r.read().select("k", "val")) == _sig(t.read().select("k", "val"))


def test_vacuumed_feed_past_cursor_raises(spark, tmp_path):
    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    for v in (1, 2, 3):
        t.upsert(_batch(spark, [(v, f"v{v}", v, "U")]))
    t.vacuum_changes_feed(feed, keep_last=1)  # only v3 retained
    with pytest.raises(ValueError, match="re-bootstrap"):
        apply_changes_feed(r, feed)


# --- continuous follower (stream_replicate) ------------------------------------


@pytest.mark.slow
def test_stream_replicate_follows_three_live_commits(spark, tmp_path):
    """The replica FOLLOWS: one stream_replicate tick per source
    commit, each draining exactly the new feed batch; replica state
    equals the source after every tick."""
    from rds_to_datalake_project_spark.operators.replicate import stream_replicate

    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    ckpt = str(tmp_path / "ckpt")

    commits = [
        _batch(spark, [(3, "v1-3", 1, "U"), (100, "v1-100", 1, "U")]),
        _batch(spark, [(5, "x", 2, "D"), (101, "v2-101", 2, "U")]),
        _batch(spark, [(3, "x", 3, "D"), (102, "v3-102", 3, "U")]),
    ]
    for i, b in enumerate(commits, start=1):
        t.upsert(b, delete_mode="apply")
        out = stream_replicate(r, feed, ckpt)
        assert out["cursor"] == i, out
        assert _sig(r.read().select("k", "val")) == _sig(
            t.read().select("k", "val")
        )
    # quiet tick: nothing pending, cursor unchanged
    assert stream_replicate(r, feed, ckpt)["batches"] == 0 or applied_version(r) == 3
    assert applied_version(r) == 3


def test_stream_replicate_drains_backlog_in_one_call_and_interops_with_batch_apply(
    spark, tmp_path
):
    from rds_to_datalake_project_spark.operators.replicate import stream_replicate

    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    ckpt = str(tmp_path / "ckpt")
    t.upsert(_batch(spark, [(1, "v1-1", 1, "U")]))
    t.upsert(_batch(spark, [(1, "x", 2, "D"), (2, "v2-2", 2, "U")]), delete_mode="apply")
    stream_replicate(r, feed, ckpt)
    assert applied_version(r) == 2
    assert _sig(r.read().select("k", "val")) == _sig(t.read().select("k", "val"))
    # batch-mode apply sees the streamed cursor and no-ops
    assert apply_changes_feed(r, feed)["applied"] == []


def test_stream_replicate_crash_mid_apply_replays_and_converges(
    spark, tmp_path, monkeypatch
):
    """Crash between the feed read and the table commit: the failed
    micro-batch is not checkpointed, the cursor stays old, and the
    next tick replays it idempotently."""
    import rds_to_datalake_project_spark.operators.replicate as rep_mod
    from rds_to_datalake_project_spark.operators.replicate import stream_replicate

    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    ckpt = str(tmp_path / "ckpt")
    t.upsert(_batch(spark, [(9, "v1-9", 1, "U")]))

    real = rep_mod._apply_stream_batch
    blow = {"armed": True}

    def exploding(replica, batch):
        if blow["armed"]:
            blow["armed"] = False
            raise RuntimeError("injected crash mid-apply")
        return real(replica, batch)

    monkeypatch.setattr(rep_mod, "_apply_stream_batch", exploding)
    with pytest.raises(Exception, match="injected crash"):
        stream_replicate(r, feed, ckpt)
    assert applied_version(r) == 0  # cursor never advanced
    out = stream_replicate(r, feed, ckpt)  # replay
    assert out["cursor"] == 1
    assert _sig(r.read().select("k", "val")) == _sig(t.read().select("k", "val"))


def test_stream_replicate_vacuumed_feed_past_cursor_raises(spark, tmp_path):
    from rds_to_datalake_project_spark.operators.replicate import stream_replicate

    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    for v in (1, 2, 3):
        t.upsert(_batch(spark, [(v, f"v{v}", v, "U")]))
    t.vacuum_changes_feed(feed, keep_last=1)
    with pytest.raises(ValueError, match="re-bootstrap"):
        stream_replicate(r, feed, str(tmp_path / "ckpt"))


@pytest.mark.slow
def test_stream_replicate_bounded_trigger_still_drains_backlog(spark, tmp_path):
    """max_files_per_trigger=1 slices a 3-commit backlog into several
    checkpointed micro-batches; availableNow still drains everything
    and the replica converges in one call."""
    from rds_to_datalake_project_spark.operators.replicate import stream_replicate

    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    for v in (1, 2, 3):
        t.upsert(_batch(spark, [(v, f"v{v}", v, "U"), (40 + v, f"n{v}", v, "U")]))
    out = stream_replicate(
        r, feed, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    assert out["cursor"] == 3 and out["batches"] >= 2
    assert _sig(r.read().select("k", "val")) == _sig(t.read().select("k", "val"))


def test_stream_replicate_sliced_commit_crash_then_batch_apply_converges(
    spark, tmp_path, monkeypatch
):
    """A commit's feed batch spans several files; with
    max_files_per_trigger=1 the drain slices it across micro-batches.
    Crash after the FIRST slice: the cursor must NOT have advanced
    (quiesce-only write), so the batch-mode apply re-applies the whole
    commit and the replica converges — a mid-drain cursor write would
    have made apply_changes_feed skip the commit's remaining rows
    forever."""
    import os

    import rds_to_datalake_project_spark.operators.replicate as rep_mod
    from rds_to_datalake_project_spark.operators.replicate import stream_replicate

    t, feed = _mk_source(spark, tmp_path)
    _, rep_spec = _specs()
    r = KeyedTable(spark, str(tmp_path / "rep"), rep_spec, retain_versions=4)
    bootstrap_replica(t, r, as_of=0)
    # one commit; split its feed batch into two files (AQE coalesces
    # small local writes, but real multi-task commits write many files)
    t.upsert(_batch(spark, [(i, f"v1-{i}", 1, "U") for i in range(1, 9)]))
    import glob
    import shutil

    b = spark.read.parquet(f"{feed}/v1")
    for i, half in enumerate((b.filter("k <= 4"), b.filter("k > 4"))):
        half.coalesce(1).write.parquet(str(tmp_path / f"half{i}"))
    for f in glob.glob(f"{feed}/v1/*.parquet"):
        os.remove(f)
    for i in (0, 1):
        src = glob.glob(str(tmp_path / f"half{i}" / "*.parquet"))[0]
        shutil.copy(src, f"{feed}/v1/split-{i}.snappy.parquet")
    files = [f for f in os.listdir(f"{feed}/v1") if f.endswith(".parquet")]
    assert len(files) == 2, files

    real = rep_mod._apply_stream_batch
    state = {"n": 0}

    def explode_second(replica, batch):
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("injected crash mid-drain")
        return real(replica, batch)

    monkeypatch.setattr(rep_mod, "_apply_stream_batch", explode_second)
    with pytest.raises(Exception, match="injected crash"):
        stream_replicate(
            r, feed, str(tmp_path / "ckpt"), max_files_per_trigger=1
        )
    monkeypatch.setattr(rep_mod, "_apply_stream_batch", real)
    # first slice applied, but the cursor is still at bootstrap
    assert applied_version(r) == 0
    out = apply_changes_feed(r, feed)
    assert out["applied"] == [1]
    assert _sig(r.read().select("k", "val")) == _sig(t.read().select("k", "val"))

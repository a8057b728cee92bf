"""Streaming layer tests: Structured Streaming CDC → KeyedTable
(exactly-once via checkpoint + idempotent upsert), the portable
batch tracker (watermark, bounded batch, commit-on-success — ST1-ST10),
and windowed event counts (ST8)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec
from rds_to_datalake_project_spark.sources.cdc import encode_commit_ts
from rds_to_datalake_project_spark.streaming import (
    CDCTracker,
    run_incremental_once,
    stream_cdc_to_table,
    windowed_event_counts,
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("create_at", T.StringType()),
        T.StructField("update_at", T.StringType()),
        T.StructField("val", T.StringType()),
        T.StructField("Op", T.StringType()),
    ]
)


def _write_cdc_file(spark, cdc_dir: str, commit_dt: datetime, rows: list[tuple]) -> str:
    """One CDC parquet file named with the reference's commit-time codec
    (YYYY/MM/DD/HH/YYYYMMDD-HHMMSSfff.parquet layout)."""
    sub = commit_dt.strftime("%Y/%m/%d/%H")
    fname = f"{encode_commit_ts(commit_dt)}.parquet"
    tmp = os.path.join(cdc_dir, "__tmp", fname)
    df = spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    dest_dir = os.path.join(cdc_dir, sub)
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, fname)
    os.replace(os.path.join(tmp, part), dest)
    import shutil

    shutil.rmtree(os.path.join(cdc_dir, "__tmp"))
    return dest


def _row(i, ca, ua, v, op="U"):
    return (i, f"{ca}T00:00:00.000000+00:00", f"{ua}T00:00:00.000000+00:00", v, op)


@pytest.fixture()
def table(spark, tmp_path):
    spec = TableSpec("t", record_key=("id",), precombine_key="update_at",
                     partition_source="create_at", partition_granularity="day",
                     schema=CDC_SCHEMA)
    return KeyedTable(spark, str(tmp_path / "table"), spec)


@pytest.mark.slow
def test_stream_cdc_available_now(spark, tmp_path, table):
    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "a0", "I"),
                     _row("b", "2024-01-01", "2024-01-01", "b0", "I")])
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 1, 0),
                    [_row("a", "2024-01-01", "2024-01-02", "a1"),
                     _row("c", "2024-01-02", "2024-01-02", "c0", "I")])

    ckpt = str(tmp_path / "ckpt")
    stream_cdc_to_table(spark, cdc_dir, table, ckpt, CDC_SCHEMA,
                        max_files_per_trigger=1)
    got = {r.id: r.val for r in table.read().collect()}
    assert got == {"a": "a1", "b": "b0", "c": "c0"}

    # New file after restart: checkpoint resumes, already-seen files skipped.
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 2, 0),
                    [_row("b", "2024-01-01", "2024-01-03", "b1")])
    stream_cdc_to_table(spark, cdc_dir, table, ckpt, CDC_SCHEMA,
                        max_files_per_trigger=1)
    got = {r.id: r.val for r in table.read().collect()}
    assert got == {"a": "a1", "b": "b1", "c": "c0"}


@pytest.mark.slow
def test_tracker_bounded_batch_and_watermark(spark, tmp_path, table):
    cdc_dir = str(tmp_path / "cdc")
    for minute, key, val in [(0, "a", "a0"), (1, "b", "b0"), (2, "a", "a1")]:
        _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, minute, 0),
                        [_row(key, "2024-01-01", f"2024-01-0{minute+1}", val)])

    tracker = CDCTracker.load(str(tmp_path / "tracker.json"), max_files=2)
    # tick 1: bounded to 2 oldest files
    assert run_incremental_once(spark, tracker, cdc_dir, table) == 2
    assert {r.id: r.val for r in table.read().collect()} == {"a": "a0", "b": "b0"}
    # tick 2: remaining file
    assert run_incremental_once(spark, tracker, cdc_dir, table) == 1
    assert {r.id: r.val for r in table.read().collect()} == {"a": "a1", "b": "b0"}
    # tick 3: idle
    assert run_incremental_once(spark, tracker, cdc_dir, table) == 0

    # tracker state survives reload (atomic JSON commit)
    reloaded = CDCTracker.load(str(tmp_path / "tracker.json"))
    assert reloaded.state("t").n_batches == 2
    assert reloaded.state("t").last_processed == datetime(2024, 1, 1, 10, 2, 0)


def test_tracker_commit_on_success_only(spark, tmp_path, table):
    """ST10 fix: a failing batch must NOT advance the watermark."""
    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "a0")])
    tracker = CDCTracker.load(str(tmp_path / "tracker.json"))

    def boom(df):
        raise RuntimeError("job failed")

    with pytest.raises(RuntimeError):
        run_incremental_once(spark, tracker, cdc_dir, table, batch_fn=boom)
    assert tracker.state("t").last_processed == datetime(1970, 1, 1)
    assert tracker.running is False  # released for the next tick

    # retry without the fault: processes the same file (no data loss)
    assert run_incremental_once(spark, tracker, cdc_dir, table) == 1
    assert {r.id: r.val for r in table.read().collect()} == {"a": "a0"}


def test_tracker_serialized_runs(spark, tmp_path, table):
    tracker = CDCTracker.load(str(tmp_path / "tracker.json"))
    tracker.running = True
    assert run_incremental_once(spark, tracker, str(tmp_path / "cdc"), table) == 0


def test_windowed_event_counts_batch_twin(spark):
    df = spark.createDataFrame(
        [(1, "click", "2024-01-01 10:00:30"),
         (2, "click", "2024-01-01 10:00:59"),
         (3, "view", "2024-01-01 10:01:10")],
        ["event_id", "event_type", "ts_str"],
    ).withColumn("ts", F.to_timestamp("ts_str"))
    out = windowed_event_counts(df, "ts", "1 minute").collect()
    by_key = {(r.window_start.strftime("%H:%M"), r.event_type): r.n_events for r in out}
    assert by_key == {("10:00", "click"): 2, ("10:01", "view"): 1}


def test_windowed_event_counts_streaming_with_watermark(spark, tmp_path):
    """Real streaming run: file source → watermarked tumbling window →
    append sink. Append mode only emits windows the watermark closed."""
    src = str(tmp_path / "events")
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rows = [(1, "click", datetime(2024, 1, 1, 10, 0, 30)),
            (2, "click", datetime(2024, 1, 1, 10, 0, 59)),
            (3, "view", datetime(2024, 1, 1, 10, 30, 0))]  # advances watermark past 10:01
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, "ts", "1 minute", watermark_delay="5 minutes")
    q = (agg.writeStream.format("memory").queryName("wincounts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.window_start.strftime("%H:%M"), r.event_type): r.n_events
           for r in spark.sql("SELECT * FROM wincounts").collect()}
    # the 10:00 window is closed (watermark = 10:30 - 5 min); 10:30 still open
    assert got == {("10:00", "click"): 2}


@pytest.mark.slow
def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions closed by an
    in-batch gap are emitted; still-open sessions are not."""
    from rds_to_datalake_project_spark.streaming.sessionize import sessionize_stream

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    d = datetime
    src = str(tmp_path / "ev")
    os.makedirs(src)
    # file 1: user 1 — two events 5 min apart, then a 55-min gap
    spark.createDataFrame(
        [(1, d(2024, 1, 1, 10, 0)), (1, d(2024, 1, 1, 10, 5)), (1, d(2024, 1, 1, 11, 0))],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    # file 2: user 1 extends open session; user 2 opens one
    spark.createDataFrame(
        [(1, d(2024, 1, 1, 11, 10)), (2, d(2024, 1, 1, 20, 0))], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = sessionize_stream(stream, gap_minutes=30, watermark_delay="1 minute")
    q = (out.writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sessions ORDER BY user_id, session_start").collect()
    closed = [(r.user_id, r.session_start.strftime("%H:%M"),
               r.session_end.strftime("%H:%M"), r.n_events) for r in rows]
    # the 10:00-10:05 session closed in-batch via the 55-min gap;
    # [11:00-11:10] and user 2's session may close only via timeout
    # batches, which availableNow does not guarantee — assert the
    # guaranteed prefix.
    assert closed[0] == (1, "10:00", "10:05", 2)
    assert all(c not in closed for c in [(2, "20:00", "20:00", 1)]) or len(closed) >= 1


def test_dedup_stream_within_watermark(spark, tmp_path):
    from rds_to_datalake_project_spark.streaming.pipeline import dedup_stream

    src = str(tmp_path / "dup_events")
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ])
    rows = [("a", datetime(2024, 1, 1, 10, 0), 1),
            ("a", datetime(2024, 1, 1, 10, 1), 2),   # dup within watermark
            ("b", datetime(2024, 1, 1, 10, 2), 3)]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = dedup_stream(stream, keys=("k",), ts_col="ts", watermark_delay="30 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r.k, r.v) for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert [k for k, _ in got] == ["a", "b"]  # one row per key

    # batch fallback
    batch = spark.createDataFrame(rows, schema)
    assert dedup_stream(batch, keys=("k",)).count() == 2


def test_tracker_idle_advance(spark, tmp_path, table):
    """Opt-in idle advance: an idle tick anchors the watermark at
    now - max_interval so quiet-table discovery stays O(recent), but
    never past files that could still arrive inside the margin."""
    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "a0", "I")])
    tracker = CDCTracker.load(str(tmp_path / "tracker.json"),
                              max_interval=timedelta(hours=1))
    assert run_incremental_once(spark, tracker, cdc_dir, table) == 1

    # idle tick: watermark anchors to now - max_interval
    now = datetime(2024, 1, 2, 12, 0, 0)
    files, idle_wm = tracker.plan_batch("t", cdc_dir, now=now)
    assert files == [] and idle_wm == datetime(2024, 1, 2, 11, 0, 0)
    tracker.commit_idle("t", idle_wm)
    assert tracker.state("t").last_processed == idle_wm
    assert tracker.state("t").n_batches == 1  # idle ticks aren't batches

    # a file inside the safety margin (commit ts > now - interval) is
    # still discovered on the next tick
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 2, 11, 30, 0),
                    [_row("b", "2024-01-02", "2024-01-02", "b0", "I")])
    assert run_incremental_once(spark, tracker, cdc_dir, table) == 1
    assert {r.id: r.val for r in table.read().collect()} == {"a": "a0", "b": "b0"}

    # idle ticks never regress the watermark
    files, idle_wm = tracker.plan_batch("t", cdc_dir, now=now)
    assert files == [] and idle_wm is None

    # default (max_interval=None): idle ticks never move the watermark
    t2 = CDCTracker.load(str(tmp_path / "t2.json"))
    t2.state("t").last_processed = datetime(2024, 1, 1)
    files, idle_wm = t2.plan_batch("t", str(tmp_path / "empty"))
    assert files == [] and idle_wm is None


@pytest.mark.slow
def test_tracker_buffering_window(spark, tmp_path, table):
    """ST6: a batch smaller than min_files is deferred until it fills
    up or ages past max_buffer_age — never deferred forever."""
    cdc_dir = str(tmp_path / "cdc")
    t_file = datetime(2024, 1, 1, 10, 0, 0)
    _write_cdc_file(spark, cdc_dir, t_file,
                    [_row("a", "2024-01-01", "2024-01-01", "a0", "I")])
    tracker = CDCTracker.load(str(tmp_path / "tracker.json"), max_files=10,
                              min_files=2, max_buffer_age=timedelta(minutes=5))

    # young + under-filled -> buffer (defer)
    files, wm = tracker.plan_batch("t", cdc_dir, now=t_file + timedelta(minutes=1))
    assert files == [] and wm is None

    # second file arrives -> min_files met, batch released
    _write_cdc_file(spark, cdc_dir, t_file + timedelta(minutes=2),
                    [_row("b", "2024-01-01", "2024-01-01", "b0", "I")])
    files, wm = tracker.plan_batch("t", cdc_dir, now=t_file + timedelta(minutes=3))
    assert len(files) == 2

    # single NEW file, never filled, but aged out -> released anyway
    tracker.commit("t", wm)
    _write_cdc_file(spark, cdc_dir, t_file + timedelta(minutes=10),
                    [_row("c", "2024-01-01", "2024-01-01", "c0", "I")])
    files, wm = tracker.plan_batch("t", cdc_dir, now=t_file + timedelta(minutes=20))
    assert len(files) == 1

    # buffering knobs survive a reload (operational config via kwargs)
    re = CDCTracker.load(str(tmp_path / "tracker.json"), min_files=2,
                         max_buffer_age=timedelta(minutes=5))
    assert re.min_files == 2 and re.max_buffer_age == timedelta(minutes=5)


@pytest.mark.slow
def test_run_incremental_all_multi_table(spark, tmp_path):
    """Reference table_tracker_list shape: one tick drains every table
    with independent watermarks."""
    from rds_to_datalake_project_spark.streaming import run_incremental_all

    tables = {}
    for name in ("t_a", "t_b"):
        cdc_dir = str(tmp_path / f"cdc_{name}")
        _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                        [_row(f"{name}-k", "2024-01-01", "2024-01-01", "v0", "I")])
        spec = TableSpec(name, record_key=("id",), precombine_key="update_at",
                         partition_source="create_at", partition_granularity="day",
                         schema=CDC_SCHEMA)
        tables[name] = (cdc_dir, KeyedTable(spark, str(tmp_path / name), spec))

    tracker = CDCTracker.load(str(tmp_path / "tracker.json"), max_files=10)
    got = run_incremental_all(spark, tracker, tables)
    assert got == {"t_a": 1, "t_b": 1}
    for name, (_, kt) in tables.items():
        assert {r.id for r in kt.read().collect()} == {f"{name}-k"}
    # second tick: both idle
    assert run_incremental_all(spark, tracker, tables) == {"t_a": 0, "t_b": 0}


def test_tracker_lease_reclaims_stale_running_flag(spark, tmp_path, table):
    """A SIGKILLed run leaves running=True on disk; the lease lets the
    next process reclaim it instead of stalling ingestion forever."""
    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "a0")])
    tracker = CDCTracker.load(str(tmp_path / "tracker.json"),
                              lease=timedelta(minutes=30))
    # simulate the crashed holder: flag persisted, finally never ran
    tracker.running = True
    tracker.running_since = datetime(2024, 1, 1, 0, 0, 0)  # long dead
    tracker.save()

    fresh = CDCTracker.load(str(tmp_path / "tracker.json"),
                            lease=timedelta(minutes=30))
    assert fresh.running is True
    assert run_incremental_once(spark, fresh, cdc_dir, table) == 1
    assert {r.id: r.val for r in table.read().collect()} == {"a": "a0"}
    # a LIVE holder (young flag) is still respected
    fresh.running = True
    fresh.running_since = datetime.now().replace(tzinfo=None)
    assert run_incremental_once(spark, fresh, cdc_dir, table) == 0


def test_tracker_live_holder_not_reclaimed(spark, tmp_path, table):
    """An expired lease alone must not evict a VERIFIABLY live holder
    (a batch legitimately slower than the lease): same-host pid probe
    blocks the reclaim, so two writers never share the single-writer
    table (r5 advice)."""
    import os
    import socket

    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "a0")])
    tracker = CDCTracker.load(str(tmp_path / "tracker.json"),
                              lease=timedelta(minutes=30))
    tracker.running = True
    tracker.running_since = datetime(2024, 1, 1, 0, 0, 0)  # lease long gone
    tracker.running_pid = os.getpid()          # ...but the holder LIVES
    tracker.running_host = socket.gethostname()
    tracker.running_token = "live-holder"
    tracker.save()

    fresh = CDCTracker.load(str(tmp_path / "tracker.json"),
                            lease=timedelta(minutes=30))
    assert run_incremental_once(spark, fresh, cdc_dir, table) == 0
    assert CDCTracker.load(str(tmp_path / "tracker.json")).running is True


def test_tracker_heartbeat_keeps_slow_batch_leased(spark, tmp_path, table):
    """A live holder heartbeats running_since during the batch, so its
    lease never looks expired to a concurrent tick even when the batch
    outruns the configured lease."""
    import json as _json
    import time as _time

    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "a0")])
    path = str(tmp_path / "tracker.json")
    tracker = CDCTracker.load(path, lease=timedelta(seconds=1))
    seen = {}

    def slow(df):
        seen["at_start"] = _json.load(open(path))["running_since"]
        _time.sleep(2.5)  # > 2 lease periods; heartbeat fires ~every 1/3 s
        seen["at_end"] = _json.load(open(path))["running_since"]
        return df

    assert run_incremental_once(spark, tracker, cdc_dir, table,
                                batch_fn=slow) == 1
    assert seen["at_end"] > seen["at_start"]  # lease stayed fresh
    final = _json.load(open(path))
    assert final["running"] is False and final["running_token"] is None


def test_tracker_lost_lease_aborts_watermark_commit(spark, tmp_path, table):
    """If another process DOES take the lease mid-batch, the loser
    fences on its token and aborts instead of double-committing the
    watermark."""
    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "a0")])
    path = str(tmp_path / "tracker.json")
    tracker = CDCTracker.load(path)

    def thief(df):
        stolen = CDCTracker.load(path)
        stolen.running_token = "thief"
        stolen.save()
        return df

    with pytest.raises(RuntimeError, match="lease lost"):
        run_incremental_once(spark, tracker, cdc_dir, table, batch_fn=thief)
    assert tracker.state("t").last_processed == datetime(1970, 1, 1)
    # the loser must NOT clobber the thief's flag on exit
    assert CDCTracker.load(path).running_token == "thief"


def test_tracker_min_files_requires_age_bound(tmp_path):
    """min_files alone would strand a tail batch forever — the
    contract requires the releasing age bound (it used to be
    silently inert instead, which was worse)."""
    with pytest.raises(ValueError, match="requires max_buffer_age"):
        CDCTracker.load(str(tmp_path / "tracker.json"),
                        max_files=4, min_files=2)


def test_tracker_min_files_buffers_then_age_releases(tmp_path, monkeypatch):
    """plan_batch defers an under-filled young batch and releases it
    once its oldest file exceeds max_buffer_age."""
    from rds_to_datalake_project_spark.streaming import tracker as trk

    files = ["/cdc/20240101-100000000.parquet"]
    monkeypatch.setattr(trk, "discover_cdc_files", lambda d, after: files)
    t = CDCTracker(path=str(tmp_path / "x.json"), max_files=4,
                   min_files=2, max_buffer_age=timedelta(minutes=10))
    got, wm = t.plan_batch("t", "/cdc", now=datetime(2024, 1, 1, 10, 5))
    assert (got, wm) == ([], None)  # young + under-filled: defer
    got, wm = t.plan_batch("t", "/cdc", now=datetime(2024, 1, 1, 10, 20))
    assert got == files and wm == datetime(2024, 1, 1, 10, 0)  # aged out


def test_plan_batch_never_splits_a_commit_timestamp_group(tmp_path, monkeypatch):
    """Truncating inside a group of files sharing one encoded commit
    time would commit a watermark that skips the rest of the group
    forever — the bound must stretch to the group boundary."""
    from rds_to_datalake_project_spark.streaming import tracker as trk

    files = [
        "/cdc/20240101-100000000.parquet",
        "/cdc/a/20240101-100001000.parquet",
        "/cdc/b/20240101-100001000.parquet",
        "/cdc/c/20240101-100002000.parquet",
    ]
    monkeypatch.setattr(trk, "discover_cdc_files", lambda d, after: files)
    t = CDCTracker(path=str(tmp_path / "x.json"), max_files=2)
    chosen, wm = t.plan_batch("t", "/cdc")
    assert len(chosen) == 3  # stretched to include the whole 10:00:01 group
    assert wm == datetime(2024, 1, 1, 10, 0, 1)


@pytest.mark.slow
def test_streaming_upserts_maintain_attached_index(spark, tmp_path):
    """A table service attached via add_maintenance_hook follows a
    STREAMING ingest too: every foreachBatch upsert commit refreshes
    the LSH index, so batch-vs-corpus screening is fresh the moment
    the stream drains — no out-of-band job."""
    from rds_to_datalake_project_spark.operators.lsh_index import (
        _idx,
        attach_lsh_maintenance,
        lsh_neardups_for,
    )
    from rds_to_datalake_project_spark.operators.sidecar import read_state

    spec = TableSpec("t", record_key=("id",), precombine_key="update_at",
                     partition_source="create_at", partition_granularity="day",
                     schema=CDC_SCHEMA)
    table = KeyedTable(
        spark, str(tmp_path / "table"), spec, retain_versions=4
    )
    attach_lsh_maintenance(table, id_col="id", text_col="val")
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps in the warm sun")
    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", base, "I"),
                     _row("b", "2024-01-01", "2024-01-01", "unrelated words entirely", "I")])
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 1, 0),
                    [_row("c", "2024-01-02", "2024-01-02",
                          base.replace("lazy dog", "sleepy dog"), "I")])
    ckpt = str(tmp_path / "ckpt")
    stream_cdc_to_table(spark, cdc_dir, table, ckpt, CDC_SCHEMA,
                        max_files_per_trigger=1)
    # index followed the stream to the head commit
    assert read_state(spark, _idx(table))[0] == table.versions()[-1]
    probe = spark.createDataFrame([("p1", base)], ["id", "val"])
    hits = {
        r.corpus_id
        for r in lsh_neardups_for(
            table, probe, id_col="id", text_col="val", threshold=0.5
        ).collect()
    }
    assert hits == {"a", "c"}


@pytest.mark.slow
def test_stream_ingest_with_dedup_drops_known_neardups(spark, tmp_path):
    """Dedup at the door: batch 2's near-dup of an already-ingested
    doc is dropped (and quarantined with its match + score); novel
    docs commit and enter the index for the NEXT batch's screen."""
    from rds_to_datalake_project_spark.streaming.pipeline import (
        stream_ingest_with_dedup,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("create_at", T.StringType()),
        T.StructField("update_at", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("Op", T.StringType()),
    ])
    spec = TableSpec("d", record_key=("doc_id",), precombine_key="update_at",
                     partition_source="create_at", partition_granularity="day",
                     schema=schema)
    table = KeyedTable(spark, str(tmp_path / "docs"), spec, retain_versions=4)
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps in the warm sun and the birds sing")

    def doc_row(i, txt):
        return (i, "2024-01-01T00:00:00.000000+00:00",
                "2024-01-01T00:00:00.000000+00:00", txt, "I")

    cdc_dir = str(tmp_path / "in")
    f1 = os.path.join(cdc_dir, "2024/01/01/10")
    os.makedirs(f1)
    spark.createDataFrame(
        [doc_row("a", base), doc_row("b", "unrelated words entirely different")],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s1"))
    import shutil as sh
    part = next(p for p in os.listdir(str(tmp_path / "s1")) if p.endswith(".parquet"))
    sh.copy(str(tmp_path / "s1" / part), os.path.join(f1, "20240101-100000000.parquet"))

    quarantine = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    stream_ingest_with_dedup(
        spark, cdc_dir, table, ckpt, schema,
        id_col="doc_id", text_col="text", threshold=0.5,
        quarantine_dir=quarantine, max_files_per_trigger=1,
    )
    assert {r.doc_id for r in table.read().collect()} == {"a", "b"}

    # batch 2: near-dup of a + novel doc
    spark.createDataFrame(
        [doc_row("c", base.replace("lazy dog", "sleepy dog")),
         doc_row("d", "a genuinely novel document about glaciers")],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s2"))
    part = next(p for p in os.listdir(str(tmp_path / "s2")) if p.endswith(".parquet"))
    sh.copy(str(tmp_path / "s2" / part), os.path.join(f1, "20240101-100100000.parquet"))
    stream_ingest_with_dedup(
        spark, cdc_dir, table, ckpt, schema,
        id_col="doc_id", text_col="text", threshold=0.5,
        quarantine_dir=quarantine, max_files_per_trigger=1,
    )
    assert {r.doc_id for r in table.read().collect()} == {"a", "b", "d"}
    q = spark.read.parquet(quarantine).collect()
    assert {(r.batch_id, r.corpus_id) for r in q} == {("c", "a")}
    assert all(r.jaccard >= 0.5 for r in q)
    # d entered the index: a later copy of d is screened out too
    spark.createDataFrame(
        [doc_row("e", "a genuinely novel document about glaciers")],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s3"))
    part = next(p for p in os.listdir(str(tmp_path / "s3")) if p.endswith(".parquet"))
    sh.copy(str(tmp_path / "s3" / part), os.path.join(f1, "20240101-100200000.parquet"))
    stream_ingest_with_dedup(
        spark, cdc_dir, table, ckpt, schema,
        id_col="doc_id", text_col="text", threshold=0.5,
        quarantine_dir=quarantine, max_files_per_trigger=1,
    )
    assert "e" not in {r.doc_id for r in table.read().collect()}


@pytest.mark.slow
def test_stream_stream_interval_join(spark, tmp_path):
    """Real stream-stream join: two file sources, watermarks on both
    sides, time-interval condition -> bounded state, append sink."""
    from rds_to_datalake_project_spark.streaming.pipeline import (
        stream_interval_join,
    )

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    views = [
        (1, 7, datetime(2024, 1, 1, 10, 0, 0)),
        (2, 7, datetime(2024, 1, 1, 11, 0, 0)),
        (3, 8, datetime(2024, 1, 1, 10, 0, 0)),
        (4, 9, datetime(2024, 1, 1, 23, 0, 0)),  # advances both watermarks
    ]
    clicks = [
        (101, 7, datetime(2024, 1, 1, 10, 10, 0)),  # joins view 1
        (102, 7, datetime(2024, 1, 1, 10, 45, 0)),  # outside 30 min of view 1
        (103, 8, datetime(2024, 1, 1, 10, 29, 0)),  # joins view 3
        (104, 9, datetime(2024, 1, 1, 23, 30, 0)),  # joins view 4 (boundary)
    ]
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(views, schema).write.parquet(vdir)
    spark.createDataFrame(clicks, schema).write.parquet(cdir)

    vs = spark.readStream.schema(schema).parquet(vdir)
    cs = spark.readStream.schema(schema).parquet(cdir)
    joined = stream_interval_join(
        vs, cs, "user_id", "ts", "ts", within="30 minutes"
    )
    q = (joined.writeStream.format("memory").queryName("attrib")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert got == {(1, 101), (3, 103), (4, 104)}

    # batch twin produces the identical pair set through the same plan
    batch = stream_interval_join(
        spark.createDataFrame(views, schema),
        spark.createDataFrame(clicks, schema),
        "user_id", "ts", "ts", within="30 minutes",
    )
    assert {(r.l_event_id, r.r_event_id) for r in batch.collect()} == got


@pytest.mark.slow
def test_streaming_upserts_maintain_secondary_index(spark, tmp_path):
    """The row-level secondary index follows a streaming ingest too:
    each foreachBatch commit publishes a delta, and a non-key point
    lookup right after the stream drains reflects every batch —
    including a value re-key in a later batch retiring the old entry."""
    from rds_to_datalake_project_spark.operators.secondary_index import (
        _idir,
        attach_secondary_index_maintenance,
        secondary_lookup,
    )
    from rds_to_datalake_project_spark.operators.sidecar import read_state

    spec = TableSpec("t", record_key=("id",), precombine_key="update_at",
                     partition_source="create_at", partition_granularity="day",
                     schema=CDC_SCHEMA)
    table = KeyedTable(
        spark, str(tmp_path / "table"), spec, retain_versions=4
    )
    attach_secondary_index_maintenance(table, "val")
    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 0, 0),
                    [_row("a", "2024-01-01", "2024-01-01", "red", "I"),
                     _row("b", "2024-01-01", "2024-01-01", "blue", "I")])
    _write_cdc_file(spark, cdc_dir, datetime(2024, 1, 1, 10, 1, 0),
                    [_row("a", "2024-01-01", "2024-01-02", "green", "U"),
                     _row("c", "2024-01-02", "2024-01-02", "red", "I")])
    ckpt = str(tmp_path / "ckpt")
    stream_cdc_to_table(spark, cdc_dir, table, ckpt, CDC_SCHEMA,
                        max_files_per_trigger=1)
    assert read_state(spark, _idir(table, "val"))[0] == table.versions()[-1]
    red = {r["id"] for r in secondary_lookup(table, "val", ["red"]).collect()}
    assert red == {"c"}  # a re-keyed to green; its old entry retired
    green = {r["id"] for r in secondary_lookup(table, "val", ["green"]).collect()}
    assert green == {"a"}


@pytest.mark.slow
def test_stream_keeps_matview_fresh_and_rewritable(spark, tmp_path):
    """Streaming ingest → IVM → aggregate navigation, end-to-end: each
    micro-batch upsert fires the maintenance hook, so after the stream
    drains the AUTO-refresh matview is exactly fresh and a plain GROUP
    BY over the BASE table is served from the view store."""
    from rds_to_datalake_project_spark import rewrite
    from rds_to_datalake_project_spark.sql import MATVIEWS, run_query

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("grp", T.StringType()),
            T.StructField("amount", T.LongType()),
            T.StructField("update_at", T.StringType()),
            T.StructField("Op", T.StringType()),
        ]
    )
    spec = TableSpec(
        "st_mv", record_key=("id",), precombine_key="update_at",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec, retain_versions=8)
    t.initial_load(
        spark.createDataFrame(
            [(f"k{i}", f"g{i % 3}", 10 * i, "a") for i in range(12)],
            "id string, grp string, amount long, update_at string",
        )
    )
    t.register("st_mv_base")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW st_mv_v WITH AUTO REFRESH AS "
        "SELECT grp, sum(amount) AS total, count(*) AS n "
        "FROM st_mv_base GROUP BY grp",
        tables={"st_mv_base": t},
    )
    try:
        cdc_dir = str(tmp_path / "cdc")

        def _f(commit_min, rows):
            sub = f"2024/01/01/10"
            dt = datetime(2024, 1, 1, 10, commit_min, 0)
            fname = f"{encode_commit_ts(dt)}.parquet"
            tmp = os.path.join(cdc_dir, "__tmp", fname)
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            os.makedirs(os.path.join(cdc_dir, sub), exist_ok=True)
            os.replace(
                os.path.join(tmp, part), os.path.join(cdc_dir, sub, fname)
            )

        _f(0, [("k1", "g_moved", 11, "b", "U"), ("k20", "g0", 7, "b", "I")])
        _f(1, [("k2", "g2", 20, "b", "D"), ("k21", None, 3, "b", "I")])
        stream_cdc_to_table(
            spark, cdc_dir, t, str(tmp_path / "ckpt"), schema,
            max_files_per_trigger=1, delete_mode="apply",
        )
        # hooks fired per micro-batch: the view is exactly fresh
        sql = "SELECT grp, sum(amount) AS total, count(*) AS n " \
              "FROM st_mv_base GROUP BY grp"
        got = run_query(spark, sql, tables={"st_mv_base": t})
        hit = rewrite.LAST_SELECT_REWRITE
        assert hit is not None and hit["view"] == "st_mv_v" and hit["lag"] == 0
        want = t.read().groupBy("grp").agg(
            F.sum("amount").alias("total"),
            F.count("*").cast("long").alias("n"),
        )
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in want.collect()
        }
    finally:
        MATVIEWS.pop("st_mv_v", None)

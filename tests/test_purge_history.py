"""History-preserving GDPR purge (purge_rows(keep_history=True)):
retained snapshots and feed batches are REWRITTEN minus the purged
keys — time travel survives for unrelated rows, purged rows are
irrecoverable at every version, and the aside/stage/swap rewrite plus
the persisted pending-key set make the whole sequence crash-resumable.
"""

from __future__ import annotations

import pytest
import os

from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.upsert import KeyedTable

from tests.test_time_travel import (
    BATCH_COLS,
    INIT_COLS,
    S0,
    S1,
    S2,
    S3,
    SPEC,
    V0,
    _apply_all,
    _mk,
    _vals,
)


def _no_trace_of(spark, t: KeyedTable, key: str) -> bool:
    """True when ``key`` appears in NO retained snapshot dir (raw
    parquet scan, not read_as_of — the files themselves must be
    clean)."""
    retired = f"{t.path}/.retired"
    if not os.path.isdir(retired):
        return True
    for name in sorted(os.listdir(retired)):
        if not name.startswith("v"):
            continue
        root = f"{retired}/{name}"
        if not any(
            not f.startswith((".", "_")) for f in os.listdir(root)
        ):
            continue
        df = spark.read.option("mergeSchema", "true").parquet(root)
        if df.filter(F.col("id") == key).count():
            return False
    return True


@pytest.mark.slow
def test_purge_keep_history_preserves_unrelated_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)  # commits 1..3, snapshots S0..S3
    n = t.purge_rows("id = 'r1'", keep_history=True)
    assert n == 1

    # live state: S3 minus the purged key
    assert _vals(t.read()) == {k: v for k, v in S3.items() if k != "r1"}
    # every pre-purge version still serves — minus the purged key
    for v, expect in ((0, S0), (1, S1), (2, S2), (3, S3)):
        assert _vals(t.read_as_of(v)) == {
            k: x for k, x in expect.items() if k != "r1"
        }
    # irrecoverable: no retained file anywhere carries the key
    assert _no_trace_of(spark, t, "r1")
    # the pending marker is gone (purge completed)
    assert not os.path.exists(f"{t.path}/.meta/purge_pending")
    # unrelated history intact: r2's lifecycle is still visible
    assert _vals(t.read_as_of(1))["r2"] == "a2"


@pytest.mark.slow
def test_purge_keep_history_scrubs_changes_feed(spark, tmp_path):
    feed = str(tmp_path / "feed")
    t = KeyedTable(
        spark,
        str(tmp_path / "tt"),
        SPEC,
        retain_versions=5,
        changes_feed_dir=feed,
    )
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    _apply_all(spark, t)

    def _feed():
        return spark.read.option("recursiveFileLookup", "true").parquet(feed)

    # feed carries r1's images before the purge
    assert _feed().filter(F.col("id") == "r1").count() > 0
    t.purge_rows("id = 'r1'", keep_history=True)
    # every batch dir rewritten: no r1 image anywhere in the feed,
    # other keys' batches still present
    left = _feed()
    assert left.filter(F.col("id") == "r1").count() == 0
    assert left.filter(F.col("id") == "r3").count() > 0


@pytest.mark.slow
def test_purge_keep_history_resumes_after_crash(spark, tmp_path):
    """A crashed purge (pending keys persisted, one snapshot dir left
    mid-swap: root swung aside, stage missing) is completed by the
    next keep_history purge call before it starts its own work."""
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)

    # simulate the crash: victims persisted, then death mid-_scrub_dir
    t.read().filter("id = 'r1'").select("id").distinct().write.mode(
        "overwrite"
    ).parquet(f"{t.path}/.meta/purge_pending")
    os.rename(f"{t.path}/.retired/v1", f"{t.path}/.retired/.__purge-old-v1")

    n = t.purge_rows("id = 'no_such_key'", keep_history=True)
    assert n == 0  # the fresh condition matched nothing...
    # ...but the pending purge completed: r1 gone from live and from
    # every version, including the dir that was stuck mid-swap
    assert "r1" not in _vals(t.read())
    for v, expect in ((0, S0), (1, S1), (2, S2), (3, S3)):
        assert _vals(t.read_as_of(v)) == {
            k: x for k, x in expect.items() if k != "r1"
        }
    assert _no_trace_of(spark, t, "r1")
    assert not os.path.exists(f"{t.path}/.retired/.__purge-old-v1")
    assert not os.path.exists(f"{t.path}/.meta/purge_pending")


def test_purge_keep_history_noop_condition(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    assert t.purge_rows("id = 'absent'", keep_history=True) == 0
    assert _vals(t.read()) == S3  # untouched
    assert t.versions() == [1, 2, 3]  # no extra commit
    assert not os.path.exists(f"{t.path}/.meta/purge_pending")


@pytest.mark.slow
def test_sql_facade_purge_statement(spark, tmp_path):
    """PURGE FROM t WHERE cond [KEEP HISTORY] through the one SQL
    layer: plain form floors history, KEEP HISTORY rewrites it."""
    from rds_to_datalake_project_spark.sql import run_query

    t = _mk(spark, tmp_path)
    _apply_all(spark, t)
    out = run_query(
        spark,
        "PURGE FROM tt WHERE id = 'r1' KEEP HISTORY",
        tables={"tt": t},
    ).collect()[0]
    assert (out.table_name, out.rows_purged, out.kept_history) == ("tt", 1, True)
    assert "r1" not in _vals(t.read())
    assert _vals(t.read_as_of(1)) == {k: v for k, v in S1.items() if k != "r1"}

    # plain (flooring) form on a second table
    t2 = _mk(spark, tmp_path / "two")
    _apply_all(spark, t2)
    out = run_query(
        spark, "PURGE FROM tt2 WHERE id = 'r3'", tables={"tt2": t2}
    ).collect()[0]
    assert (out.rows_purged, out.kept_history) == (1, False)
    assert "r3" not in _vals(t2.read())
    assert t2.readable_versions() == [t2.versions()[-1]]  # history floored

"""Property-based tests of the upsert core (hypothesis): for ANY
sequence of CDC events, in ANY batch split, the table converges to the
per-key latest version — the invariant the whole pipeline rests on
(reference contract README.rst:44-48, ST7 idempotence).

A Python-side latest-per-key oracle is compared against the real
KeyedTable after replaying the batches (including a duplicate replay
of the last batch, which must change nothing).

Payload and delete flag are deterministic functions of (key, version)
so duplicate (key, version) events are identical rows — within-batch
ties are then semantically unambiguous and the oracle exact."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

KEYS = ["k0", "k1", "k2", "k3"]


def payload_of(k_i: int, ver: int) -> int:
    return (ver * 7 + k_i) % 10


def is_delete(ver: int) -> bool:
    return ver % 4 == 0


# events: (key index, version 0..30); cut positions for batch splits
events_strategy = st.lists(
    st.tuples(st.integers(0, len(KEYS) - 1), st.integers(0, 30)),
    min_size=1,
    max_size=24,
)
cuts_strategy = st.lists(st.integers(1, 23), max_size=3)


def _expected(batches, delete_mode: str):
    """Sequential per-batch oracle of the engine's merge semantics.

    ignore: D rows are dropped pre-merge, so the outcome is the global
    latest non-delete version per key (order-independent).
    apply: a batch's winning version beats the table state iff its
    version is >= (incoming wins ties); a winning delete removes the
    key — tombstones are NOT retained, so an older version arriving in
    a LATER batch can legitimately reinsert (matching the engine)."""
    if delete_mode == "ignore":
        batches = [[e for e in chunk if not is_delete(e[1])] for chunk in batches]
    state: dict[str, int] = {}
    for chunk in batches:
        batch_winner: dict[str, int] = {}
        for k_i, ver in chunk:
            key = KEYS[k_i]
            if key not in batch_winner or ver > batch_winner[key]:
                batch_winner[key] = ver
        for key, bver in batch_winner.items():
            if key not in state or bver >= state[key]:
                if delete_mode == "apply" and is_delete(bver):
                    state.pop(key, None)
                else:
                    state[key] = bver
    return {
        key: (ver, payload_of(KEYS.index(key), ver)) for key, ver in state.items()
    }


@pytest.mark.parametrize("delete_mode", ["ignore", "apply"])
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, cuts=cuts_strategy)
@pytest.mark.slow
def test_upsert_converges_to_latest_per_key(
    spark, tmp_path_factory, events, cuts, delete_mode
):
    spec = TableSpec("t", record_key=("id",), precombine_key="update_at",
                     partition_granularity=None)
    table = KeyedTable(spark, str(tmp_path_factory.mktemp("prop") / "t"), spec)

    def to_rows(chunk):
        return [
            (
                KEYS[k_i],
                f"2024-01-01T00:00:{ver:02d}",
                f"p{payload_of(k_i, ver)}",
                "D" if is_delete(ver) else "U",
            )
            for k_i, ver in chunk
        ]

    positions = sorted({c for c in cuts if c < len(events)})
    batches, prev = [], 0
    for p in positions + [len(events)]:
        if p > prev:
            batches.append(events[prev:p])
            prev = p

    for chunk in batches:
        df = spark.createDataFrame(to_rows(chunk), ["id", "update_at", "val", "Op"])
        table.upsert(df, delete_mode=delete_mode)
    # replay the last batch — idempotence (ST7)
    df = spark.createDataFrame(to_rows(batches[-1]), ["id", "update_at", "val", "Op"])
    table.upsert(df, delete_mode=delete_mode)

    expected = _expected(batches + [batches[-1]], delete_mode)
    if not expected:
        # every key's winner deleted → table may not even exist
        assert (not table.exists()) or table.read().count() == 0
        return
    got = {
        r.id: (int(r.update_at[-2:]), int(r.val[1:]))
        for r in table.read().collect()
    }
    assert got == expected


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, cuts=cuts_strategy)
@pytest.mark.slow
def test_bucketed_upsert_converges_to_latest_per_key(
    spark, tmp_path_factory, events, cuts
):
    """Hash-bucket partitioning (TableSpec.hash_buckets) is pure
    layout: for ANY CDC sequence in ANY batch split, a bucketed table
    converges to the same per-key latest state as the oracle —
    touched-bucket pruning must never drop or duplicate a merge."""
    spec = TableSpec("t", record_key=("id",), precombine_key="update_at",
                     partition_granularity="", hash_buckets=4)
    table = KeyedTable(spark, str(tmp_path_factory.mktemp("propb") / "t"), spec)

    def to_rows(chunk):
        return [
            (
                KEYS[k_i],
                f"2024-01-01T00:00:{ver:02d}",
                f"p{payload_of(k_i, ver)}",
                "D" if is_delete(ver) else "U",
            )
            for k_i, ver in chunk
        ]

    positions = sorted({c for c in cuts if c < len(events)})
    batches, prev = [], 0
    for p in positions + [len(events)]:
        if p > prev:
            batches.append(events[prev:p])
            prev = p

    for chunk in batches:
        df = spark.createDataFrame(to_rows(chunk), ["id", "update_at", "val", "Op"])
        table.upsert(df, delete_mode="apply")
    df = spark.createDataFrame(to_rows(batches[-1]), ["id", "update_at", "val", "Op"])
    table.upsert(df, delete_mode="apply")  # replay idempotence

    expected = _expected(batches + [batches[-1]], "apply")
    if not expected:
        assert (not table.exists()) or table.read().count() == 0
        return
    got = {
        r.id: (int(r.update_at[-2:]), int(r.val[1:]))
        for r in table.read().collect()
    }
    assert got == expected

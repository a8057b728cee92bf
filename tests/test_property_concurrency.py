"""Property-based test of the optimistic commit protocol: for ANY two
writers' CDC event sequences, in ANY batch splits, under a
deterministically adversarial interleaving (a competing commit lands
inside EVERY window between writer A staging its merge and publishing
it), the table converges to the same state as any serial execution —
the serializability claim the commit-token protocol makes.

delete_mode="ignore" keeps the oracle order-independent (global
latest non-delete version per key), so every legal serialization has
the same outcome and the test needs no knowledge of which writer won
which race. Payloads are deterministic functions of (key, version),
making duplicate events identical rows.
"""

from __future__ import annotations

import os

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


events_strategy = st.lists(
    st.tuples(st.integers(0, len(KEYS) - 1), st.integers(1, 30)),
    min_size=1,
    max_size=10,
)
cuts_strategy = st.lists(st.integers(1, 9), max_size=2)


def _split(events, cuts):
    positions = sorted({c for c in cuts if c < len(events)})
    out, prev = [], 0
    for p in positions + [len(events)]:
        if p > prev:
            out.append(events[prev:p])
            prev = p
    return out


def _rows(chunk):
    return [
        (
            KEYS[k_i],
            f"2024-01-01T00:00:{ver:02d}",
            f"p{payload_of(k_i, ver)}",
            "D" if is_delete(ver) else "U",
        )
        for k_i, ver in chunk
    ]


def _expected(all_events):
    state: dict[str, int] = {}
    for k_i, ver in all_events:
        if is_delete(ver):
            continue
        key = KEYS[k_i]
        if key not in state or ver >= state[key]:
            state[key] = ver
    return {
        key: (ver, payload_of(KEYS.index(key), ver))
        for key, ver in state.items()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ev_a=events_strategy, ev_b=events_strategy, cuts=cuts_strategy)
@pytest.mark.slow
def test_adversarially_interleaved_writers_converge(
    spark, tmp_path_factory, monkeypatch, ev_a, ev_b, cuts
):
    spec = TableSpec(
        "t", record_key=("id",), precombine_key="update_at",
        partition_granularity=None,
    )
    path = str(tmp_path_factory.mktemp("occ") / "t")
    cols = ["id", "update_at", "val", "Op"]
    seed = [("seed", "2024-01-01T00:00:00", "p0", "U")]
    KeyedTable(spark, path, spec).initial_load(spark.createDataFrame(seed, cols))

    t_a = KeyedTable(
        spark, path, spec, commit_retries=20, orphan_staging_grace_s=600
    )
    t_b = KeyedTable(
        spark, path, spec, commit_retries=20, orphan_staging_grace_s=600
    )
    batches_a = _split(ev_a, cuts)
    state = {"pending": _split(ev_b, [2]), "busy": False}

    def fault(point):
        # between writer A staging and publishing, writer B commits —
        # every A attempt that raced a B commit MUST conflict + retry
        if point != "staged_written" or state["busy"] or not state["pending"]:
            return
        state["busy"] = True
        try:
            t_b.upsert(
                spark.createDataFrame(_rows(state["pending"].pop(0)), cols)
            )
        finally:
            state["busy"] = False

    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(fault))
    for chunk in batches_a:
        t_a.upsert(spark.createDataFrame(_rows(chunk), cols))
    monkeypatch.setattr(KeyedTable, "_fault", staticmethod(lambda p: None))
    for chunk in state["pending"]:  # B batches A's staging never raced
        t_b.upsert(spark.createDataFrame(_rows(chunk), cols))

    expected = _expected(ev_a + ev_b)
    expected["seed"] = (0, 0)
    got = {
        r.id: (int(r.update_at[-2:]), int(r.val[1:]))
        for r in t_a.read().collect()
    }
    assert got == expected
    # protocol hygiene: no staging debris, lock released
    names = os.listdir(path)
    assert not any(n.startswith(".staging-") for n in names)
    assert ".commit_lock" not in names

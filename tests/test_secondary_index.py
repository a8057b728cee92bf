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


def test_boolean_and_double_value_columns_probe_correct_bucket(spark, tmp_path):
    """Probe buckets are computed by the SAME Spark expression the
    writer used (r9 ADVICE): Python str(True)='True' vs Spark
    CAST='true' (and '10000000.0' vs '1.0E7') used to hash to the
    wrong bucket and silently return empty."""
    spec = TableSpec(
        "t", record_key=("k",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "bd"), spec, retain_versions=4)
    rows = [(i, i % 2 == 0, 1e7 if i % 3 == 0 else float(i), 0) for i in range(60)]
    t.initial_load(
        spark.createDataFrame(rows, "k long, flag boolean, payload double, seq long")
    )
    build_secondary_index(t, "flag")
    got = {r["k"] for r in secondary_lookup(t, "flag", [True]).collect()}
    want = {r["k"] for r in t.read().filter(F.col("flag")).collect()}
    assert got == want and len(got) == 30
    build_secondary_index(t, "payload")
    got = {r["k"] for r in secondary_lookup(t, "payload", [1e7]).collect()}
    want = {r["k"] for r in t.read().filter(F.col("payload") == 1e7).collect()}
    assert got == want and len(got) == 20


def test_stale_index_refuses_lookup(spark, tmp_path):
    """Exactness holds only at head: a commit the index has not seen
    (e.g. a swallowed maintenance failure) must refuse, not serve
    wrong rows (r9 ADVICE)."""
    t = _mk(spark, tmp_path)
    build_secondary_index(t, "grp")
    t.upsert(_batch(spark, [(13, 99, 13.0, 1)]))  # no refresh
    with pytest.raises(ValueError, match="STALE"):
        secondary_lookup(t, "grp", [3])
    assert refresh_secondary_index(t, "grp") == "incremental"
    assert 13 in {r["k"] for r in secondary_lookup(t, "grp", [99]).collect()}


# --- range layout -------------------------------------------------------------

from rds_to_datalake_project_spark.operators.secondary_index import (  # noqa: E402
    attach_secondary_range_index_maintenance,
    build_secondary_range_index,
    refresh_secondary_range_index,
    secondary_range_lookup,
    secondary_range_lookup_keys,
)


def test_range_build_and_lookup_equals_plain_between(spark, tmp_path):
    t = _mk(spark, tmp_path, n=200)
    build_secondary_range_index(t, "payload", n_bands=16)
    got = {
        r["k"]
        for r in secondary_range_lookup(t, "payload", 25.0, 75.0).collect()
    }
    want = {
        r["k"]
        for r in t.read().filter(F.col("payload").between(25.0, 75.0)).collect()
    }
    assert got == want and len(got) == 51


def test_range_lookup_prunes_band_partitions(spark, tmp_path):
    from rds_to_datalake_project_spark.operators import secondary_index as si

    t = _mk(spark, tmp_path, n=200)  # payload uniform on [0, 199]
    build_secondary_range_index(t, "payload", n_bands=16)
    si.reset_probe_stats()
    keys_df = secondary_range_lookup_keys(t, "payload", 0.0, 24.0)
    files = keys_df.inputFiles()
    assert files and all("/.secrange_payload/" in f for f in files)
    plan = keys_df._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("band" in p and p.strip() for p in pf)
    # [0, 24] of a [0,199]/16-band domain = bands 0..1 of 16
    assert si.LAST_PROBE["bands_probed"] <= 3
    assert si.LAST_PROBE["bands_skipped"] >= 13


@pytest.mark.slow
def test_range_refresh_handles_rekey_delete_and_out_of_domain(spark, tmp_path):
    """Values moved OUT of the probed range must vanish (tombstone),
    new in-range rows appear, and values past the build-time max clamp
    into the edge band yet still match a probe crossing it."""
    t = _mk(spark, tmp_path, n=100)  # payload 0..99
    attach_secondary_range_index_maintenance(t, "payload")
    t.upsert(_batch(spark, [(0, 0, 0.0, 1)]))  # force build via hook
    t.upsert(
        _batch(
            spark,
            [
                (10, 0, 500.0, 2),  # re-key: moves out of [0, 99]
                (200, 0, 50.5, 2),  # new in-range row
                (201, 0, 1e6, 2),  # out-of-domain: clamps to top band
            ],
        ).unionByName(
            _batch(spark, [(20, 0, 20.0, 2)]).withColumn("Op", F.lit("D"))
        ),
        delete_mode="apply",
    )
    got = {
        r["k"]
        for r in secondary_range_lookup(t, "payload", 0.0, 99.0).collect()
    }
    want = {
        r["k"]
        for r in t.read().filter(F.col("payload").between(0.0, 99.0)).collect()
    }
    assert got == want
    assert 10 not in got and 20 not in got and 200 in got
    # probe crossing the clamped edge finds the out-of-domain row
    high = {
        r["k"]
        for r in secondary_range_lookup(t, "payload", 400.0, 2e6).collect()
    }
    assert high == {10, 201}


def test_range_lookup_stale_and_torn_refuse(spark, tmp_path):
    t = _mk(spark, tmp_path)
    build_secondary_range_index(t, "payload")
    t.upsert(_batch(spark, [(5, 5, 5.0, 1)]))
    with pytest.raises(ValueError, match="STALE"):
        secondary_range_lookup_keys(t, "payload", 0.0, 10.0)
    assert refresh_secondary_range_index(t, "payload") == "incremental"
    assert refresh_secondary_range_index(t, "payload") == "noop"
    from rds_to_datalake_project_spark.operators.secondary_index import _rdir

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{_rdir(t, 'payload')}/entries/_EPOCH")
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, False)
    with pytest.raises(ValueError, match="missing or torn"):
        secondary_range_lookup_keys(t, "payload", 0.0, 10.0)
    assert refresh_secondary_range_index(t, "payload") == "rebuild"


def test_range_index_on_timestamp_column(spark, tmp_path):
    """The reference's only secondary index is on a timestamp
    (db_orm.py:45-48 Index('idx_create_at', 'create_at')) — temporal
    banding routes through epoch seconds."""
    import datetime as dt

    spec = TableSpec(
        "t", record_key=("k",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "ts"), spec, retain_versions=4)
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i), 0) for i in range(96)]
    t.initial_load(spark.createDataFrame(rows, "k long, created timestamp, seq long"))
    build_secondary_range_index(t, "created", n_bands=8)
    lo, hi = base + dt.timedelta(hours=10), base + dt.timedelta(hours=30)
    got = {r["k"] for r in secondary_range_lookup(t, "created", lo, hi).collect()}
    want = {
        r["k"]
        for r in t.read().filter(F.col("created").between(lo, hi)).collect()
    }
    assert got == want and got == set(range(10, 31))


def test_range_index_rejects_non_orderable_dtype(spark, tmp_path):
    """CAST(string AS DOUBLE) is null — a string range index would
    silently match nothing; build must refuse."""
    spec = TableSpec(
        "t", record_key=("k",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "s"), spec, retain_versions=4)
    t.initial_load(
        spark.createDataFrame(
            [(i, f"name-{i}", 0) for i in range(10)],
            "k long, name string, seq long",
        )
    )
    with pytest.raises(ValueError, match="numeric or temporal"):
        build_secondary_range_index(t, "name")


def test_read_where_routes_through_secondary_indexes(spark, tmp_path):
    """read_where picks the index path on non-key predicate columns —
    range layout for intervals, equality layout for points — and
    matches the plain filter exactly."""
    t = _mk(spark, tmp_path, n=200)
    build_secondary_range_index(t, "payload", n_bands=16)
    build_secondary_index(t, "grp")

    df = t.read_where({"payload": (25.0, 75.0)})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan  # index-served, not a scan
    got = {r["k"] for r in df.collect()}
    want = {
        r["k"]
        for r in t.read().filter(F.col("payload").between(25.0, 75.0)).collect()
    }
    assert got == want

    dfe = t.read_where({"grp": (3, 3)})
    assert "LeftSemi" in dfe._jdf.queryExecution().executedPlan().toString()
    assert {r["k"] for r in dfe.collect()} == {
        r["k"] for r in t.read().filter(F.col("grp") == 3).collect()
    }

    # combined predicates: the index resolves one, residuals apply all
    both = t.read_where({"payload": (25.0, 75.0), "grp": (3, 3)})
    assert {r["k"] for r in both.collect()} == {
        r["k"]
        for r in t.read()
        .filter(F.col("payload").between(25.0, 75.0) & (F.col("grp") == 3))
        .collect()
    }


def test_read_where_falls_back_when_index_stale_or_absent(spark, tmp_path):
    """Unlike the direct lookup surface (index-served-or-refuse),
    read_where must stay correct without raising: a stale index
    silently routes to the scan path."""
    t = _mk(spark, tmp_path)
    build_secondary_range_index(t, "payload")
    t.upsert(_batch(spark, [(300, 1, 42.5, 1)]))  # index now stale
    got = {r["k"] for r in t.read_where({"payload": (40.0, 50.0)}).collect()}
    want = {
        r["k"]
        for r in t.read().filter(F.col("payload").between(40.0, 50.0)).collect()
    }
    assert got == want and 300 in got
    # no index at all on this column → scan path, still exact
    got2 = {r["k"] for r in t.read_where({"grp": (2, 4)}).collect()}
    assert got2 == {
        r["k"] for r in t.read().filter(F.col("grp").between(2, 4)).collect()
    }


def test_range_lookup_fractional_bounds_on_integer_column(spark, tmp_path):
    """Fractional probe bounds must NOT be truncated to the column
    dtype (cast(20.5 AS BIGINT) = 20 both under- AND over-matches):
    band interval and residual both evaluate the exact bounds."""
    spec = TableSpec(
        "t", record_key=("k",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "ib"), spec, retain_versions=4)
    t.initial_load(
        spark.createDataFrame(
            [(i, i, 0) for i in range(100)], "k long, qty long, seq long"
        )
    )
    build_secondary_range_index(t, "qty", n_bands=8)
    got = {r["k"] for r in secondary_range_lookup(t, "qty", 10.5, 20.5).collect()}
    want = {
        r["k"]
        for r in t.read().filter(F.col("qty").between(10.5, 20.5)).collect()
    }
    assert got == want == set(range(11, 21))  # 10 and 21 excluded
    # and the router agrees with the scan path for the same bounds
    routed = {r["k"] for r in t.read_where({"qty": (10.5, 20.5)}).collect()}
    scan = {
        r["k"]
        for r in t.read_where({"qty": (10.5, 20.5)}, use_secondary=False).collect()
    }
    assert routed == scan == want


@pytest.mark.slow
def test_monotone_domain_growth_keeps_recent_window_pruned(spark, tmp_path):
    """The reference's indexed column is an ever-advancing timestamp:
    values past the build-time max must open NEW bands (unbounded
    grid), not pile into a clamped edge band — a recent-window probe
    stays a few-band read forever, with zero rebuilds."""
    from rds_to_datalake_project_spark.operators import secondary_index as si

    t = _mk(spark, tmp_path, n=100)  # payload 0..99
    attach_secondary_range_index_maintenance(t, "payload")
    t.upsert(_batch(spark, [(0, 0, 0.0, 1)]))  # build via hook
    # domain grows 10x past the built max across two commits
    t.upsert(_batch(spark, [(500 + i, 0, 1000.0 + i, 2) for i in range(50)]))
    t.upsert(_batch(spark, [(600 + i, 0, 1050.0 + i, 3) for i in range(50)]))
    si.reset_probe_stats()
    got = {
        r["k"]
        for r in secondary_range_lookup(t, "payload", 1050.0, 1060.0).collect()
    }
    want = {
        r["k"]
        for r in t.read().filter(F.col("payload").between(1050.0, 1060.0)).collect()
    }
    assert got == want and len(got) == 11
    # the probe read a handful of NEW bands (span/width ≈ 8 of the
    # ~700 occupied grid positions) — not one giant edge band holding
    # every out-of-domain row, and not the whole grid
    assert si.LAST_PROBE["bands_probed"] <= 10
    keys_df = secondary_range_lookup_keys(t, "payload", 1050.0, 1060.0)
    files = keys_df.inputFiles()
    assert files and all("/.secrange_payload/" in f for f in files)

"""End-to-end slice: enrich (P1) → dedup (W1/W2) → KeyedTable upsert
(S8/S9) → compare (T1/T2). Mirrors the reference's differential-oracle
test strategy (SURVEY.md §5, reference compare.py:52-88)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rds_to_datalake_project_spark.operators.compare import compare_tables
from rds_to_datalake_project_spark.operators.dedup import (
    exact_dedup,
    latest_version_per_key,
)
from rds_to_datalake_project_spark.operators.enrich import add_time_partitions
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec


def _rows(*rows):
    return [
        {"id": i, "create_at": c, "update_at": u, "val": v, **extra}
        for (i, c, u, v, extra) in rows
    ]


@pytest.fixture()
def base_df(spark):
    return spark.createDataFrame(
        _rows(
            ("a", "2024-01-01T10:15:00.000000+00:00", "2024-01-01T10:15:00.000000+00:00", "a0", {}),
            ("b", "2024-01-02T11:30:00.000000+00:00", "2024-01-02T11:30:00.000000+00:00", "b0", {}),
            ("c", "2024-02-05T23:59:00.000000+00:00", "2024-02-05T23:59:00.000000+00:00", "c0", {}),
        )
    )


def test_add_time_partitions_string_iso(base_df):
    out = add_time_partitions(base_df, "create_at", "minute")
    row = out.filter(F.col("id") == "a").collect()[0]
    assert (row.create_year, row.create_month, row.create_day) == ("2024", "01", "01")
    assert (row.create_hour, row.create_minute) == ("10", "15")


def test_add_time_partitions_native_timestamp(spark):
    df = spark.createDataFrame([("x",)], ["id"]).withColumn(
        "ts", F.to_timestamp(F.lit("2024-03-04 05:06:07"))
    )
    out = add_time_partitions(df, "ts", "minute", prefix="ts")
    row = out.collect()[0]
    assert (row.ts_year, row.ts_month, row.ts_day, row.ts_hour, row.ts_minute) == (
        "2024", "03", "04", "05", "06",
    )


def test_latest_version_per_key(spark):
    df = spark.createDataFrame(
        _rows(
            ("a", "c1", "2024-01-01T00:00:00+00:00", "old", {}),
            ("a", "c1", "2024-01-02T00:00:00+00:00", "new", {}),
            ("b", "c2", "2024-01-01T00:00:00+00:00", "only", {}),
        )
    )
    out = latest_version_per_key(df, ["id"], "update_at")
    got = {r.id: r.val for r in out.collect()}
    assert got == {"a": "new", "b": "only"}
    assert out.count() == 2


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [("1", "same text"), ("2", "same text"), ("3", "other")], ["id", "text"]
    )
    out = exact_dedup(df, ["text"], keep_order=["id"])
    assert sorted(r.id for r in out.collect()) == ["1", "3"]


@pytest.fixture()
def table(spark, tmp_path):
    spec = TableSpec("t", record_key=("id",), precombine_key="update_at",
                     partition_source="create_at", partition_granularity="day")
    return KeyedTable(spark, str(tmp_path / "t"), spec)


def test_initial_load_and_read(table, base_df):
    table.initial_load(base_df)
    got = table.read()
    assert got.count() == 3
    assert "create_day" in got.columns
    # partition layout on disk (hive-style)
    import os
    assert any(d.startswith("create_year=") for d in os.listdir(table.path))


def test_upsert_update_insert_and_precombine(table, spark, base_df):
    table.initial_load(base_df)
    batch = spark.createDataFrame(
        _rows(
            # update: newer update_at wins
            ("a", "2024-01-01T10:15:00.000000+00:00", "2024-01-03T00:00:00.000000+00:00", "a1", {"Op": "U"}),
            # stale: older update_at must NOT overwrite
            ("b", "2024-01-02T11:30:00.000000+00:00", "2024-01-01T00:00:00.000000+00:00", "b-stale", {"Op": "U"}),
            # insert
            ("d", "2024-03-01T00:00:00.000000+00:00", "2024-03-01T00:00:00.000000+00:00", "d0", {"Op": "I"}),
        )
    )
    table.upsert(batch)
    got = {r.id: r.val for r in table.read().collect()}
    assert got == {"a": "a1", "b": "b0", "c": "c0", "d": "d0"}


def test_upsert_tie_goes_to_incoming(table, spark, base_df):
    table.initial_load(base_df)
    batch = spark.createDataFrame(
        _rows(("a", "2024-01-01T10:15:00.000000+00:00", "2024-01-01T10:15:00.000000+00:00", "a-tie", {}))
    )
    table.upsert(batch)
    assert {r.id: r.val for r in table.read().collect()}["a"] == "a-tie"


def test_upsert_idempotent_replay(table, spark, base_df):
    table.initial_load(base_df)
    batch = spark.createDataFrame(
        _rows(("a", "2024-01-01T10:15:00.000000+00:00", "2024-01-04T00:00:00.000000+00:00", "a2", {"Op": "U"}))
    )
    table.upsert(batch)
    first = sorted(map(tuple, table.read().drop(*[c for c in table.read().columns if c.startswith("create_")]).collect()))
    table.upsert(batch)  # replay (ST7): must be a no-op
    second = sorted(map(tuple, table.read().drop(*[c for c in table.read().columns if c.startswith("create_")]).collect()))
    assert first == second


def test_upsert_deletes_ignored_vs_applied(spark, tmp_path, base_df):
    spec = TableSpec("t", partition_granularity="day")
    delete_batch = spark.createDataFrame(
        _rows(("a", "2024-01-01T10:15:00.000000+00:00", "2024-01-05T00:00:00.000000+00:00", "a-del", {"Op": "D"}))
    )
    t1 = KeyedTable(spark, str(tmp_path / "ignore"), spec)
    t1.initial_load(base_df)
    t1.upsert(delete_batch, delete_mode="ignore")  # reference behavior: row survives
    assert {r.id for r in t1.read().collect()} == {"a", "b", "c"}
    assert {r.id: r.val for r in t1.read().collect()}["a"] == "a0"

    t2 = KeyedTable(spark, str(tmp_path / "apply"), spec)
    t2.initial_load(base_df)
    t2.upsert(delete_batch, delete_mode="apply")  # ST9 extension: row removed
    assert {r.id for r in t2.read().collect()} == {"b", "c"}


def test_upsert_only_rewrites_touched_partitions(table, spark, base_df):
    import os
    table.initial_load(base_df)
    before = os.path.getmtime(
        os.path.join(table.path, "create_year=2024", "create_month=02", "create_day=05")
    )
    batch = spark.createDataFrame(
        _rows(("a", "2024-01-01T10:15:00.000000+00:00", "2024-01-09T00:00:00.000000+00:00", "a9", {}))
    )
    table.upsert(batch)
    after = os.path.getmtime(
        os.path.join(table.path, "create_year=2024", "create_month=02", "create_day=05")
    )
    assert before == after  # untouched partition not rewritten
    assert {r.id: r.val for r in table.read().collect()}["a"] == "a9"


@pytest.mark.slow
def test_compare_tables_equal_and_diff(table, spark, base_df):
    table.initial_load(base_df)
    res = compare_tables(base_df, table.read())
    assert res.equal
    perturbed = base_df.withColumn(
        "val", F.when(F.col("id") == "a", F.lit("CHANGED")).otherwise(F.col("val"))
    )
    res2 = compare_tables(perturbed, table.read())
    assert not res2.equal
    assert res2.n_only_in_source == 1 and res2.n_only_in_lake == 1
    assert len(res2.sample_diffs) == 2


def test_upsert_additive_schema_evolution(spark, tmp_path):
    """CDC schema drift: a batch with a new column merges; historical
    rows read the new column as null (partitioned: untouched
    partitions keep old footers — mergeSchema read covers them)."""
    spec = TableSpec("t", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "t"), spec)
    t.initial_load(spark.createDataFrame(
        _rows(
            ("a", "2024-01-01T00:00:00", "2024-01-01T00:00:00", "a0", {}),
            ("b", "2024-02-01T00:00:00", "2024-02-01T00:00:00", "b0", {}),
        )))
    batch = spark.createDataFrame(
        [("a", "2024-01-01T00:00:00", "2024-01-02T00:00:00", "a1", "tagged")],
        ["id", "create_at", "update_at", "val", "new_col"],
    )
    t.upsert(batch)
    got = {r.id: (r.val, r.new_col) for r in t.read().collect()}
    assert got == {"a": ("a1", "tagged"), "b": ("b0", None)}


def test_initial_load_ignore_mode_delete_does_not_shadow(spark, tmp_path):
    """ignore mode: a newer D row must not erase the older live
    version during initial load (same pre-dedup filter as upsert)."""
    spec = TableSpec("t", partition_granularity=None)
    t = KeyedTable(spark, str(tmp_path / "t"), spec)
    df = spark.createDataFrame(
        [("a", "2024-01-01T00:00:00", "2024-01-01T00:00:00", "live", "I"),
         ("a", "2024-01-01T00:00:00", "2024-01-02T00:00:00", "gone", "D")],
        ["id", "create_at", "update_at", "val", "Op"],
    )
    t.initial_load(df, delete_mode="ignore")
    assert {r.id: r.val for r in t.read().collect()} == {"a": "live"}


def test_vacuum_partitions_retention(spark, tmp_path):
    """Retention drops whole partition dirs without reading data."""
    spec = TableSpec("t", partition_granularity="month")
    t = KeyedTable(spark, str(tmp_path / "t"), spec)
    rows = [(f"k{m}_{i}", f"2024-{m:02d}-01T00:00:00", f"2024-{m:02d}-01T00:00:00", "v")
            for m in (1, 2, 3) for i in range(5)]
    t.initial_load(spark.createDataFrame(rows, ["id", "create_at", "update_at", "val"]))
    # keep only months >= 02  (partition tuple is (year, month) strings)
    dropped = t.vacuum_partitions(lambda vals: vals[1] >= "02")
    assert dropped == 1
    left = {r.create_month for r in t.read().select("create_month").distinct().collect()}
    assert left == {"02", "03"}


def test_partition_dir_escaping_special_and_null_values(spark, tmp_path):
    """Metadata-level dir operations (publish-as-deleted, vacuum) must
    render partition paths exactly as Spark's writer escapes them:
    '/'-containing values percent-encode, nulls become
    __HIVE_DEFAULT_PARTITION__. A Python f-string renderer would
    target bogus paths for any of these."""
    import os

    spec = TableSpec("t", partition_granularity="month")
    t = KeyedTable(spark, str(tmp_path / "t"), spec)
    # supply partition columns directly (enrich skips when present)
    cols = ["id", "create_at", "update_at", "val", "create_year", "create_month"]
    initial = [
        ("a", "x", "2024-01-01T00:00:00", "va", "2024", "01"),
        ("b", "x", "2024-01-01T00:00:00", "vb", "a/b", "x:y"),
        ("c", "x", "2024-01-01T00:00:00", "vc", None, None),
    ]
    t.initial_load(spark.createDataFrame(initial, cols))
    root = str(tmp_path / "t")
    assert os.path.isdir(f"{root}/create_year=a%2Fb/create_month=x%3Ay")
    assert os.path.isdir(
        f"{root}/create_year=__HIVE_DEFAULT_PARTITION__"
        "/create_month=__HIVE_DEFAULT_PARTITION__"
    )

    # publish-as-deleted for the escaped partition: delete b entirely
    batch = [("b", "x", "2024-02-01T00:00:00", "vb", "a/b", "x:y", "D")]
    t.upsert(spark.createDataFrame(batch, cols + ["Op"]), delete_mode="apply")
    assert not os.path.exists(f"{root}/create_year=a%2Fb/create_month=x%3Ay")
    got = {r.id: r.val for r in t.read().collect()}
    assert got == {"a": "va", "c": "vc"}

    # vacuum must hit the real (escaped / null) dirs too
    dropped = t.vacuum_partitions(lambda vals: vals[0] == "2024")
    assert dropped == 1
    assert not os.path.exists(
        f"{root}/create_year=__HIVE_DEFAULT_PARTITION__"
    ) or not os.listdir(f"{root}/create_year=__HIVE_DEFAULT_PARTITION__")
    assert {r.id for r in t.read().collect()} == {"a"}

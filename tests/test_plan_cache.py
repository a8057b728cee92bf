"""Read-plan cache (driver-side optimization, round 12).

The cache memoizes ANALYZED DataFrames per (table, kind, version) and
must be invisible semantically: any mutation — through ANY handle to
the same path — must invalidate, and ineligible tables (clones) must
bypass it entirely.
"""

import datetime

import pytest
from pyspark.sql import Row

from rds_to_datalake_project_spark.operators.upsert import (
    KeyedTable,
    invalidate_plan_cache,
)
from rds_to_datalake_project_spark.schema import TableSpec

TS = datetime.datetime(2024, 1, 15, 12, 0, 0)


def _spec(name="pc"):
    return TableSpec(name=name, record_key=("id",), precombine_key="v")


def _rows(spark, *ids, x="a"):
    return spark.createDataFrame(
        [Row(id=i, v=1, x=x, create_at=TS) for i in ids]
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), _spec(), retain_versions=4)
    t.initial_load(_rows(spark, 1, 2))
    return t


def test_read_returns_cached_plan_object(table):
    assert table.read() is table.read()


def test_upsert_invalidates(spark, table):
    before = table.read()
    batch = _rows(spark, 3).withColumn("Op", batch_op(spark))
    table.upsert(batch)
    after = table.read()
    assert after is not before
    assert after.count() == 3


def batch_op(spark):
    from pyspark.sql import functions as F

    return F.lit("I")


def test_delete_where_invalidates(table):
    table.read()
    table.delete_where("id = 1")
    assert table.read().count() == 1


def test_second_handle_same_path_sees_mutation(spark, table):
    assert table.read().count() == 2
    other = KeyedTable(spark, table.path, _spec(), retain_versions=4)
    other.upsert(_rows(spark, 7).withColumn("Op", batch_op(spark)))
    # the FIRST handle must not serve its stale cached plan
    assert table.read().count() == 3


def test_read_as_of_cached_then_vacuum_raises(spark, table):
    table.upsert(_rows(spark, 3).withColumn("Op", batch_op(spark)))
    table.upsert(_rows(spark, 4).withColumn("Op", batch_op(spark)))
    assert table.read_as_of(0).count() == 2
    assert table.read_as_of(0) is table.read_as_of(0)
    table.vacuum_versions(keep_last=1)
    with pytest.raises(ValueError):
        table.read_as_of(0)


def test_restore_invalidates(spark, table):
    table.upsert(_rows(spark, 3).withColumn("Op", batch_op(spark)))
    assert table.read().count() == 3
    table.restore_to_version(0)
    assert table.read().count() == 2


def test_clone_reads_cached_per_token_pair(spark, table, tmp_path):
    """r13 (VERDICT #5): clone reads memoize per (clone token, source
    token) — a hit can only serve the composition both tokens still
    describe; either side committing starts a fresh resolution."""
    from rds_to_datalake_project_spark.operators.clone import (
        clone_table,
        open_table,
    )

    clone_table(table, str(tmp_path / "b"))
    b = open_table(spark, str(tmp_path / "b"), _spec(), retain_versions=4)
    r1, r2 = b.read(), b.read()
    assert r1 is r2  # same tokens -> same resolved composition
    assert r1.count() == 2
    # a CLONE commit invalidates (its own token moves)
    b.upsert(_rows(spark, 31).withColumn("Op", batch_op(spark)))
    r3 = b.read()
    assert r3 is not r1
    assert r3.count() == 3
    # a SOURCE commit invalidates too (the pin composes source state;
    # the pinned snapshot is unchanged so VALUES stay the same, but
    # the stale frame object must not be served blindly)
    table.upsert(_rows(spark, 32).withColumn("Op", batch_op(spark)))
    r4 = b.read()
    assert r4 is not r3
    assert r4.count() == 3  # pin still shows the pre-commit source


def test_manual_invalidate_hook(table):
    before = table.read()
    invalidate_plan_cache(table.path)
    assert table.read() is not before


# --- zonemap._resolve_table memo (r13: one resolve per commit epoch) ---------


def test_resolve_table_memoized_per_token(spark, table):
    from rds_to_datalake_project_spark.operators.zonemap import _resolve_table

    a = _resolve_table(spark, table.path)
    b = _resolve_table(spark, table.path)
    assert a is b  # same committed snapshot -> same resolution object


def test_resolve_table_sees_commit_through_any_handle(spark, table):
    from rds_to_datalake_project_spark.operators.zonemap import _resolve_table

    _full, live_before = _resolve_table(spark, table.path)
    other = KeyedTable(spark, table.path, _spec(), retain_versions=4)
    other.upsert(_rows(spark, 9).withColumn("Op", batch_op(spark)))
    full_after, live_after = _resolve_table(spark, table.path)
    # the new commit's files must be visible (token moved -> fresh listing)
    assert set(live_after) != set(live_before)
    assert full_after.count() == 3


def test_resolve_table_tokenless_path_never_cached(spark, tmp_path):
    from rds_to_datalake_project_spark.operators.zonemap import _resolve_table

    p = str(tmp_path / "plaindir")
    spark.range(3).write.parquet(p)
    a = _resolve_table(spark, p)
    b = _resolve_table(spark, p)
    assert a is not b  # no commit token -> resolve fresh every call
    # out-of-band append to the plain dir is visible immediately
    spark.range(3, 6).write.mode("append").parquet(p)
    _full, live = _resolve_table(spark, p)
    assert len(live) > len(a[1])

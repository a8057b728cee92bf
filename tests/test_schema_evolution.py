"""Type-widening schema evolution on the CDC upsert path: the
upstream ran ``ALTER COLUMN ... TYPE`` and the CDC batches start
arriving wider (or the table is already wider than a replayed old
batch). Promotions within the lattice (int family, float family,
int×float → double, decimal growth, date → timestamp) cast both merge
sides to the common wider type; a stored-side widening rewrites every
live partition in one schema-migration commit (parquet mergeSchema
cannot reconcile an int partition beside a long one at read time).
Additive column evolution (new/dropped columns as nulls) predates
this and is covered by the core suites.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rds_to_datalake_project_spark.operators.upsert import (
    KeyedTable,
    _promoted_type,
    _widening_plan,
)
from rds_to_datalake_project_spark.schema import TableSpec

SPEC = TableSpec(
    "se",
    record_key=("id",),
    precombine_key="update_at",
    partition_source="create_at",
    partition_granularity="month",
)

INIT_COLS = "id string, create_at string, update_at string, qty int"
BATCH_COLS = "id string, create_at string, update_at string, qty long, Op string"

V0 = [
    ("r1", "2024-01-05T00:00:00", "2024-01-05T00:00:00", 7),
    ("r2", "2024-02-05T00:00:00", "2024-02-05T00:00:00", 8),
]
# widens qty to long: one value beyond int range, one untouched month
B1 = [
    ("r1", "2024-01-05T00:00:00", "2024-05-01T00:00:00", 5_000_000_000, "U"),
    ("r3", "2024-03-05T00:00:00", "2024-05-01T00:00:00", 9, "I"),
]


def test_promotion_lattice():
    assert _promoted_type(T.IntegerType(), T.LongType()) == T.LongType()
    assert _promoted_type(T.LongType(), T.IntegerType()) == T.LongType()
    assert _promoted_type(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert _promoted_type(T.IntegerType(), T.DoubleType()) == T.DoubleType()
    assert _promoted_type(T.LongType(), T.FloatType()) == T.DoubleType()
    # (10,2) has 8 integral digits, (12,4) has 8 — common type keeps
    # max integral digits + max scale
    assert _promoted_type(
        T.DecimalType(10, 2), T.DecimalType(12, 4)
    ) == T.DecimalType(12, 4)
    assert _promoted_type(
        T.DecimalType(12, 0), T.DecimalType(10, 4)
    ) == T.DecimalType(16, 4)
    assert _promoted_type(T.DateType(), T.TimestampType()) == T.TimestampType()
    # outside the lattice: no promotion
    assert _promoted_type(T.StringType(), T.LongType()) is None
    assert _promoted_type(T.IntegerType(), T.IntegerType()) is None


def test_widening_batch_migrates_whole_table(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), SPEC)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    t.upsert(spark.createDataFrame(B1, BATCH_COLS))
    out = t.read()
    assert dict(out.dtypes)["qty"] == "bigint"
    got = {r.id: r.qty for r in out.collect()}
    # the UNTOUCHED month-02 partition was rewritten long too — the
    # whole table reads through one schema, no mergeSchema conflict
    assert got == {"r1": 5_000_000_000, "r2": 8, "r3": 9}
    t2 = KeyedTable(spark, str(tmp_path / "t"), SPEC)
    assert dict(t2.read().dtypes)["qty"] == "bigint"


def test_narrow_batch_upcast_no_migration(spark, tmp_path):
    """Table already long; an old replayed batch arrives int — the
    batch upcasts, the merge stays partition-pruned."""
    t = KeyedTable(spark, str(tmp_path / "t"), SPEC)
    t.initial_load(
        spark.createDataFrame(
            [(i, c, u, int(q)) for i, c, u, q in V0],
            INIT_COLS.replace("qty int", "qty long"),
        )
    )
    narrow = spark.createDataFrame(
        [("r1", "2024-01-05T00:00:00", "2024-05-01T00:00:00", 42, "U")],
        BATCH_COLS.replace("qty long", "qty int"),
    )
    import os

    before = set(os.listdir(tmp_path / "t"))
    t.upsert(narrow)
    out = t.read()
    assert dict(out.dtypes)["qty"] == "bigint"
    assert {r.id: r.qty for r in out.collect()} == {"r1": 42, "r2": 8}
    # month 02 untouched on disk (pruned merge, not a migration)
    feb = tmp_path / "t" / "create_year=2024" / "create_month=02"
    assert feb.exists() and before  # layout intact


def test_widening_survives_versioning_and_time_travel(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), SPEC, retain_versions=4)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    t.upsert(spark.createDataFrame(B1, BATCH_COLS))
    assert dict(t.read().dtypes)["qty"] == "bigint"
    # the pre-migration snapshot is type-homogeneous (all int) and
    # still reconstructs exactly
    v0 = t.read_as_of(0)
    assert dict(v0.dtypes)["qty"] == "int"
    assert {r.id: r.qty for r in v0.collect()} == {"r1": 7, "r2": 8}
    assert {r.id: r.qty for r in t.read_as_of(1).collect()} == {
        "r1": 5_000_000_000,
        "r2": 8,
        "r3": 9,
    }


def test_float_to_double_and_decimal_growth(spark, tmp_path):
    spec = TableSpec(
        "se2", record_key=("id",), precombine_key="u", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec)
    t.initial_load(
        spark.createDataFrame(
            [("a", "v0", 1.5)], "id string, u string, x float"
        )
    )
    t.upsert(
        spark.createDataFrame(
            [("b", "v1", 2.25)], "id string, u string, x double"
        )
    )
    out = t.read()
    assert dict(out.dtypes)["x"] == "double"
    assert {r.id: r.x for r in out.collect()} == {"a": 1.5, "b": 2.25}


def test_non_promotable_conflict_still_fails_loudly(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), SPEC)
    t.initial_load(spark.createDataFrame(V0, INIT_COLS))
    bad = spark.createDataFrame(
        [("r1", "2024-01-05T00:00:00", "2024-05-01T00:00:00", "not-a-number", "U")],
        INIT_COLS.replace("qty int", "qty string") + ", Op string",
    )
    with pytest.raises(Exception):
        t.upsert(bad)


def test_widening_plan_shapes():
    a = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("x", T.FloatType()),
        ]
    )
    b = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("qty", T.LongType()),
            T.StructField("extra", T.LongType()),  # additive — not widening
        ]
    )
    assert _widening_plan(a, b) == {"qty": T.LongType()}

"""Table CHECK constraints (upsert.py::add_constraint) + DESCRIBE
DETAIL. Contract: a constraint is a persisted property of the TABLE —
validated against existing rows at ADD, enforced on every write path
through any handle, surviving resets; violations reject the batch
(nothing committed)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.upsert import (
    ConstraintViolation,
    KeyedTable,
)
from rds_to_datalake_project_spark.schema import TableSpec
from rds_to_datalake_project_spark.sql import run_query


def _spec(name="ck_t", **kw) -> TableSpec:
    kw.setdefault("partition_source", "day")
    kw.setdefault("partition_granularity", "day")
    return TableSpec(
        name, record_key=("id",), precombine_key="update_at", **kw
    )


def _rows(spark, ids, ver="v0", amount=None):
    return spark.createDataFrame(
        [
            Row(
                id=i,
                day=f"2024-01-{(i % 4) + 1:02d}",
                amount=float(i) if amount is None else amount,
                update_at=ver,
            )
            for i in ids
        ]
    )


@pytest.mark.slow
def test_constraint_rejects_violating_upsert(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), _spec())
    t.initial_load(_rows(spark, range(10)))
    t.add_constraint("amount_nonneg", "amount >= 0")
    before = sorted(r.id for r in t.read().collect())
    with pytest.raises(ConstraintViolation, match="amount_nonneg"):
        t.upsert(_rows(spark, [3], ver="v1", amount=-1.0))
    # nothing committed
    assert sorted(r.id for r in t.read().collect()) == before
    assert t.read().filter(F.col("amount") < 0).count() == 0
    # a clean batch passes
    t.upsert(_rows(spark, [3], ver="v1", amount=99.0))
    assert t.read().filter(F.col("id") == 3).collect()[0].amount == 99.0


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), _spec())
    t.initial_load(_rows(spark, range(10)))
    with pytest.raises(ConstraintViolation, match="5 existing"):
        t.add_constraint("small", "amount < 5")
    assert t.constraints() == {}  # refused, not persisted
    t.add_constraint("small_enough", "amount < 100")
    assert "small_enough" in t.constraints()
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("small_enough", "amount < 50")


def test_constraints_bind_every_handle_and_survive_reset(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), _spec())
    t.initial_load(_rows(spark, range(10)))
    t.add_constraint("nonneg", "amount >= 0")
    # a SECOND handle that never heard of the constraint is still bound
    peer = KeyedTable(spark, str(tmp_path / "t"), _spec())
    with pytest.raises(ConstraintViolation):
        peer.upsert(_rows(spark, [0], ver="v1", amount=-2.0))
    # initial_load is a reset — but the table contract survives it
    with pytest.raises(ConstraintViolation):
        t.initial_load(_rows(spark, range(4), amount=-1.0))
    t.initial_load(_rows(spark, range(4)))
    assert t.constraints() == {"nonneg": "amount >= 0"}
    with pytest.raises(ConstraintViolation):
        t.upsert(_rows(spark, [1], ver="v2", amount=-3.0))


def test_delete_tombstones_are_exempt(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), _spec())
    t.initial_load(_rows(spark, range(10)))
    t.add_constraint("nonneg", "amount >= 0")
    # a D row violating the check still deletes (nothing of it lands)
    batch = _rows(spark, [2], ver="v1", amount=-9.0).withColumn(
        "Op", F.lit("D")
    )
    t.upsert(batch, delete_mode="apply")
    assert t.read().filter(F.col("id") == 2).count() == 0
    # update_where funnels through the same gate
    with pytest.raises(ConstraintViolation):
        t.update_where("id = 1", {"amount": "-5.0"})
    assert t.update_where("id = 1", {"amount": "amount + 1"}) == 1


def test_drop_constraint_unbinds(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), _spec())
    t.initial_load(_rows(spark, range(4)))
    t.add_constraint("nonneg", "amount >= 0")
    t.drop_constraint("nonneg")
    t.upsert(_rows(spark, [0], ver="v1", amount=-1.0))  # allowed now
    assert t.read().filter(F.col("amount") < 0).count() == 1
    with pytest.raises(ValueError, match="no such"):
        t.drop_constraint("nonneg")


def test_facade_constraint_and_describe_detail(spark, tmp_path):
    t = KeyedTable(
        spark, str(tmp_path / "t"), _spec(), retain_versions=3
    )
    t.initial_load(_rows(spark, range(10)))
    known = {"ct": t}
    out = run_query(
        spark,
        "ALTER TABLE ct ADD CONSTRAINT nonneg CHECK (amount >= 0)",
        tables=known,
    ).collect()[0]
    assert out.constraint_name == "nonneg"
    with pytest.raises(ConstraintViolation):
        run_query(
            spark,
            "INSERT INTO ct SELECT 99 AS id, '2024-01-01' AS day, "
            "-4.0 AS amount, 'v1' AS update_at",
            tables=known,
        )
    det = run_query(spark, "DESCRIBE DETAIL ct", tables=known).collect()[0]
    assert det.num_files > 0 and det.size_bytes > 0
    assert det.version == 0 and det.retain_versions == 3
    assert json.loads(det.constraints) == {"nonneg": "amount >= 0"}
    assert det.clone_source is None
    assert "day_year" in det.partition_columns
    run_query(spark, "ALTER TABLE ct DROP CONSTRAINT nonneg", tables=known)
    assert t.constraints() == {}

"""Persistent catalog registration (hive_sync parity) and
high-partition-count upsert pruning.

Reference behavior being matched: after every Hudi write the reference
hive-syncs the table into the Glue catalog so any engine session can
query it (glue_jobs/initial_load.py:168-174, glue_catalog.py:6-98).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import sync_lake_table
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

BASE = datetime.datetime(2024, 1, 1)


def _rows(n, days=40):
    return [
        (i, f"v{i}", BASE, BASE + datetime.timedelta(days=i % days))
        for i in range(n)
    ]


DDL = "id long, val string, update_at timestamp, create_at timestamp"


@pytest.fixture()
def table(spark, tmp_path):
    spec = TableSpec("persist_t", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "persist_t"), spec)
    t.initial_load(spark.createDataFrame(_rows(500), DDL))
    yield t
    spark.sql("DROP TABLE IF EXISTS `default`.`persist_t`")
    spark.catalog.dropTempView("persist_t")


def test_persistent_table_visible_to_second_session(spark, table):
    table.register(persistent=True)
    other = spark.newSession()  # fresh session: no temp views
    assert other.sql("SELECT count(*) c FROM persist_t").collect()[0].c == 500
    # temp views do NOT cross sessions — the catalog table is what
    # makes this work (a regression to temp-view-only would fail above)
    assert not other.catalog.tableExists("some_temp_only_view")


def test_resync_picks_up_new_partitions(spark, table):
    table.register(persistent=True)
    other = spark.newSession()
    late = [(90001, "late", BASE, BASE + datetime.timedelta(days=364))]
    table.upsert(spark.createDataFrame(late, DDL))
    # re-sync with the (shadowing) temp view present: qualified names
    # in sync_lake_table must bypass it
    table.register(persistent=True)
    assert other.sql("SELECT count(*) c FROM persist_t").collect()[0].c == 501
    got = other.sql(
        "SELECT val FROM persist_t WHERE create_day = '30' AND create_month = '12'"
    ).collect()
    assert [r.val for r in got] == ["late"]


def test_sync_nonpartitioned_table(spark, tmp_path):
    spec = TableSpec("persist_flat", partition_granularity=None)
    t = KeyedTable(spark, str(tmp_path / "flat"), spec)
    t.initial_load(spark.createDataFrame(_rows(50), DDL))
    sync_lake_table(spark, "persist_flat", t.path, partitioned=False)
    try:
        other = spark.newSession()
        assert other.sql("SELECT count(*) c FROM persist_flat").collect()[0].c == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS `default`.`persist_flat`")


@pytest.mark.slow
def test_upsert_thousand_touched_partitions(spark, tmp_path):
    """The touched-partition predicate must stay a single IN-set (no
    O(n)-deep OR-of-AND expression tree) at backfill-scale partition
    counts, and still prune + merge correctly."""
    spec = TableSpec("many_parts", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "many_parts"), spec)
    n = 1000
    t.initial_load(spark.createDataFrame(_rows(n, days=n), DDL).repartition(8))

    # batch touches every one of the ~1000 day-partitions
    batch = (
        spark.createDataFrame(_rows(n, days=n), DDL)
        .withColumn("val", F.lit("NEW"))
        .withColumn("update_at", F.col("update_at") + F.expr("INTERVAL 1 DAY"))
        .repartition(8)
    )
    t.upsert(batch)
    out = t.read()
    assert out.count() == n
    assert out.filter(F.col("val") == "NEW").count() == n


def test_partition_pruning_survives_isin_predicate(spark, tmp_path):
    """The synthesized-key IN predicate must land in the scan's
    PartitionFilters (metadata pruning), not DataFilters."""
    spec = TableSpec("pruned_t", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "pruned_t"), spec)
    t.initial_load(spark.createDataFrame(_rows(400), DDL))

    keys = ["2024/01/02"]
    pruned = t.read().filter(t._partition_key_col().isin(keys))
    import re

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[\(?concat_ws", plan.replace("\n", " "))
    # 400 rows over 40 day-partitions → one partition has 10 rows
    assert pruned.count() == 10


def test_drop_lake_table_full_teardown(spark, tmp_path):
    """create → drop → a SECOND session sees neither the catalog
    entry nor the files (reference glue_catalog.py:48-86 delete-table
    + cleanup.py:11-33 data wipe)."""
    import os

    from rds_to_datalake_project_spark.catalog import drop_lake_table

    spec = TableSpec("drop_me", partition_granularity="day")
    t = KeyedTable(spark, str(tmp_path / "drop_me"), spec)
    t.initial_load(spark.createDataFrame(_rows(50), DDL))
    t.register(persistent=True)
    assert spark.newSession().catalog.tableExists("drop_me", "default")

    assert drop_lake_table(spark, "drop_me")  # path resolved from catalog
    other = spark.newSession()
    assert not other.catalog.tableExists("drop_me", "default")
    assert not other.catalog.tableExists("drop_me")  # temp view gone too
    assert not os.path.exists(str(tmp_path / "drop_me"))

    # idempotent: second drop is a clean no-op
    assert drop_lake_table(spark, "drop_me") is False

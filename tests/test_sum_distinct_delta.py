"""sum(DISTINCT <expr>) delta maintenance (operators/matview.py): the
distinct sum rides the same per-(group, value) auxiliary stores as
count(DISTINCT) — the stored value moves by Σ value × (0↔positive
transition), hidden live-ndv renders NULL when the last distinct value
dies. Must converge to direct recomputation across value births,
duplicate-preserving deletes (the sum must NOT move when one of two
contributors of a value dies), value moves between groups, NULLs, and
vanished groups — in the single-table, join and chain delta classes.
avg(DISTINCT) stays rejected (spell it sum(DISTINCT)/count(DISTINCT))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.matview import (
    DeltaChainMaterializedView,
    DeltaJoinMaterializedView,
    DeltaMaterializedView,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

AGGS = {
    "sd": "sum(DISTINCT amount)",
    "nd": "count(DISTINCT amount)",
    "ad": "avg(DISTINCT amount)",
    "total": "sum(amount)",
    "n": "count(*)",
}


def _mk(spark, tmp_path):
    spec = TableSpec(
        "facts", record_key=("f_id",), precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec, retain_versions=8)
    # duplicate values inside groups on purpose: i%7 collides
    rows = [
        (i, f"g{i % 3}" if i % 10 else None,
         (i % 7) * 10 if i % 5 else None, 0)
        for i in range(40)
    ]
    t.initial_load(
        spark.createDataFrame(
            rows, "f_id long, grp string, amount long, seq long"
        )
    )
    view = DeltaMaterializedView(t, str(tmp_path / "v"), ["grp"], AGGS)
    return t, view


def _direct(t):
    return {
        tuple(r)
        for r in t.read()
        .groupBy("grp")
        .agg(
            F.sum_distinct(F.col("amount")).alias("sd"),
            F.countDistinct("amount").cast("long").alias("nd"),
            F.expr("avg(DISTINCT amount)").alias("ad"),
            F.sum("amount").alias("total"),
            F.count("*").cast("long").alias("n"),
        )
        .collect()
    }


def _got(view):
    return {
        tuple(r)
        for r in view.read()
        .select("grp", "sd", "nd", "ad", "total", "n")
        .collect()
    }


def _batch(spark, rows, op="U"):
    return spark.createDataFrame(
        rows, "f_id long, grp string, amount long, seq long"
    ).withColumn("Op", F.lit(op))


@pytest.mark.slow
def test_sum_distinct_converges_over_churn(spark, tmp_path):
    t, view = _mk(spark, tmp_path)
    assert view.refresh()["mode"] == "full"
    assert _got(view) == _direct(t)
    # value births (new distinct amounts) + duplicate births (existing
    # amounts — the distinct sum must NOT move for those)
    t.upsert(_batch(spark, [
        (100, "g0", 999, 1),   # new value in g0
        (101, "g0", 10, 1),    # duplicate of existing 10
        (102, "g1", 888, 1),   # new value in g1
    ]))
    assert view.refresh()["mode"] == "delta"
    assert _got(view) == _direct(t)
    # duplicate-preserving delete: kill ONE of the contributors of a
    # surviving value (sum unchanged), plus a value death (sum drops)
    t.upsert(_batch(spark, [(101, "g0", 10, 2)], op="D"), delete_mode="apply")
    t.upsert(_batch(spark, [(100, "g0", 999, 2)], op="D"), delete_mode="apply")
    assert view.refresh()["mode"] == "delta"
    assert _got(view) == _direct(t)


@pytest.mark.slow
def test_sum_distinct_value_moves_and_group_moves(spark, tmp_path):
    t, view = _mk(spark, tmp_path)
    view.refresh()
    # move a row's VALUE (old value may die, new value may be born)
    # and another row's GROUP (value leaves one live set, enters another)
    t.upsert(_batch(spark, [
        (1, "g1", 7777, 1),    # row 1: value + group change
        (2, "g2", 20, 1),      # row 2 moves to g2 keeping its value
    ]))
    view.refresh()
    assert _got(view) == _direct(t)


@pytest.mark.slow
def test_sum_distinct_nulls_and_vanished_groups(spark, tmp_path):
    t, view = _mk(spark, tmp_path)
    view.refresh()
    # a group born with only NULL amounts: sd/nd render NULL/0
    t.upsert(_batch(spark, [(200, "gz", None, 1), (201, "gz", None, 1)]))
    view.refresh()
    assert _got(view) == _direct(t)
    gz = [r for r in view.read().filter(F.col("grp") == "gz").collect()]
    assert len(gz) == 1 and gz[0]["sd"] is None and gz[0]["nd"] == 0
    # kill every row of gz: the group must tombstone
    t.upsert(
        _batch(spark, [(200, "gz", None, 2), (201, "gz", None, 2)], op="D"),
        delete_mode="apply",
    )
    view.refresh()
    assert view.read().filter(F.col("grp") == "gz").count() == 0
    assert _got(view) == _direct(t)


@pytest.mark.slow
def test_sum_distinct_join_and_chain_classes(spark, tmp_path):
    fspec = TableSpec(
        "jfacts", record_key=("f_id",), precombine_key="f_seq",
        partition_granularity=None,
    )
    fact = KeyedTable(spark, str(tmp_path / "jf"), fspec, retain_versions=8)
    fact.initial_load(spark.createDataFrame(
        [(i, i % 4, (i % 6) * 100, 0) for i in range(30)],
        "f_id long, f_dim long, amount long, f_seq long",
    ))
    dspec = TableSpec(
        "jdims", record_key=("d_id",), precombine_key="d_seq",
        partition_granularity=None,
    )
    dim = KeyedTable(spark, str(tmp_path / "jd"), dspec, retain_versions=8)
    dim.initial_load(spark.createDataFrame(
        [(i, f"d{i % 2}", i % 2, 0) for i in range(4)],
        "d_id long, dname string, d_reg long, d_seq long",
    ))
    jv = DeltaJoinMaterializedView(
        fact, dim, str(tmp_path / "jv"), on=("f_dim", "d_id"),
        group_cols=["dname"],
        aggs={"sd": "sum(DISTINCT amount)", "n": "count(*)"},
    )
    jv.refresh()

    def _jd():
        j = fact.read().join(dim.read(), F.col("f_dim") == F.col("d_id"))
        return {
            tuple(r)
            for r in j.groupBy("dname").agg(
                F.sum_distinct(F.col("amount")).alias("sd"),
                F.count("*").cast("long").alias("n"),
            ).collect()
        }

    def _jg():
        return {
            tuple(r) for r in jv.read().select("dname", "sd", "n").collect()
        }

    assert _jg() == _jd()
    # both feeds churn: fact value death + dim re-key moving a whole
    # neighborhood of values between groups
    fact.upsert(
        spark.createDataFrame(
            [(0, 0, 0, 1)], "f_id long, f_dim long, amount long, f_seq long"
        ).withColumn("Op", F.lit("D")),
        delete_mode="apply",
    )
    dim.upsert(spark.createDataFrame(
        [(1, "d0", 1, 1)], "d_id long, dname string, d_reg long, d_seq long"
    ).withColumn("Op", F.lit("U")))
    assert jv.refresh()["mode"] == "delta"
    assert _jg() == _jd()
    # chain class: add a region hop
    rspec = TableSpec(
        "jregs", record_key=("r_id",), precombine_key="r_seq",
        partition_granularity=None,
    )
    reg = KeyedTable(spark, str(tmp_path / "jr"), rspec, retain_versions=8)
    reg.initial_load(spark.createDataFrame(
        [(0, "east", 0), (1, "west", 0)],
        "r_id long, rname string, r_seq long",
    ))
    cv = DeltaChainMaterializedView(
        [fact, dim, reg],
        on=[("f_dim", "d_id"), ("d_reg", "r_id")],
        path=str(tmp_path / "cv"),
        group_cols=["rname"],
        aggs={"sd": "sum(DISTINCT amount)", "n": "count(*)"},
    )
    cv.refresh()

    def _cd():
        j = (
            fact.read()
            .join(dim.read(), F.col("f_dim") == F.col("d_id"))
            .join(reg.read(), F.col("d_reg") == F.col("r_id"))
        )
        return {
            tuple(r)
            for r in j.groupBy("rname").agg(
                F.sum_distinct(F.col("amount")).alias("sd"),
                F.count("*").cast("long").alias("n"),
            ).collect()
        }

    fact.upsert(spark.createDataFrame(
        [(50, 2, 12345, 1)], "f_id long, f_dim long, amount long, f_seq long"
    ).withColumn("Op", F.lit("I")), delete_mode="apply")
    assert cv.refresh()["mode"] == "delta"
    got = {
        tuple(r) for r in cv.read().select("rname", "sd", "n").collect()
    }
    assert got == _cd()


@pytest.mark.slow
def test_facade_sum_distinct_and_avg_distinct_rejection(spark, tmp_path):
    from rds_to_datalake_project_spark.sql import MATVIEWS, run_query

    spec = TableSpec(
        "sdf", record_key=("f_id",), precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / "sdf"), spec, retain_versions=4)
    t.initial_load(spark.createDataFrame(
        [(i, f"g{i % 2}", i % 3, 0) for i in range(12)],
        "f_id long, grp string, amount long, seq long",
    ))
    reg = {"sdf_t": t}
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW sd_v WITH DELTA REFRESH AS "
        "SELECT grp, sum(DISTINCT amount) AS sd, "
        "avg(DISTINCT amount) AS ad FROM sdf_t GROUP BY grp",
        tables=reg,
    )
    try:
        t.upsert(spark.createDataFrame(
            [(100, "g0", 77, 1)], "f_id long, grp string, amount long, seq long"
        ).withColumn("Op", F.lit("I")), delete_mode="apply")
        out = run_query(
            spark, "REFRESH MATERIALIZED VIEW sd_v", tables=reg
        ).collect()
        assert out[0].mode == "delta"
        got = {
            tuple(r)
            for r in run_query(spark, "SELECT * FROM sd_v", tables=reg)
            .select("grp", "sd", "ad").collect()
        }
        want = {
            tuple(r)
            for r in t.read().groupBy("grp")
            .agg(
                F.sum_distinct(F.col("amount")).alias("sd"),
                F.expr("avg(DISTINCT amount)").alias("ad"),
            ).collect()
        }
        assert got == want
    finally:
        run_query(spark, "DROP MATERIALIZED VIEW sd_v", tables=reg)
    # non-invertible aggregates still fail the CREATE cleanly
    with pytest.raises(ValueError, match="invertible"):
        run_query(
            spark,
            "CREATE MATERIALIZED VIEW sd_bad WITH DELTA REFRESH AS "
            "SELECT grp, median(amount) AS m FROM sdf_t GROUP BY grp",
            tables=reg,
        )
    MATVIEWS.pop("sd_bad", None)

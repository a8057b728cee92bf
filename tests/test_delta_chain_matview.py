"""Signed-delta CHAIN views (operators/matview.py:
DeltaChainMaterializedView): Δ of an N-way inner join maintained by
inclusion–exclusion over the changed tables — 2^k−1 signed terms per
window, every non-delta factor the neighborhood-pruned CURRENT state.
Must converge to recomputation across fact churn, mid-chain fk moves,
far-dim renames/deletes, and windows where ALL feeds change at once;
crash mid-apply rebuilds; the facade routes chain + DELTA here."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.matview import (
    DeltaChainMaterializedView,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec


def _mk(spark, tmp_path, star=False):
    facts = KeyedTable(
        spark, str(tmp_path / "f"),
        TableSpec("dcf", record_key=("f_id",), precombine_key="fv",
                  partition_granularity=None),
        retain_versions=10,
    )
    dims = KeyedTable(
        spark, str(tmp_path / "d"),
        TableSpec("dcd", record_key=("d_id",), precombine_key="dv",
                  partition_granularity=None),
        retain_versions=10,
    )
    regs = KeyedTable(
        spark, str(tmp_path / "r"),
        TableSpec("dcr", record_key=("r_id",), precombine_key="rv",
                  partition_granularity=None),
        retain_versions=10,
    )
    facts.initial_load(spark.createDataFrame(
        [(i, i % 6, i % 3, 10 * i, 0) for i in range(1, 41)],
        "f_id long, f_dim long, f_reg long, amount long, fv long"))
    dims.initial_load(spark.createDataFrame(
        [(d, d % 3, 0) for d in range(6)],
        "d_id long, d_reg long, dv long"))
    regs.initial_load(spark.createDataFrame(
        [(r, f"R{r}", 0) for r in range(3)],
        "r_id long, rname string, rv long"))
    # chain: facts -> dims -> regions; star: both attach to facts
    on = (
        [("f_dim", "d_id"), ("f_reg", "r_id")]
        if star
        else [("f_dim", "d_id"), ("d_reg", "r_id")]
    )
    view = DeltaChainMaterializedView(
        [facts, dims, regs],
        on=on,
        path=str(tmp_path / "v"),
        group_cols=["rname"],
        aggs={"n": "count(*)", "total": "sum(amount)"},
    )
    return facts, dims, regs, view


def _want(facts, dims, regs, star=False):
    j = facts.read().join(dims.read(), F.col("f_dim") == F.col("d_id"))
    j = j.join(
        regs.read(),
        (F.col("f_reg") if star else F.col("d_reg")) == F.col("r_id"),
    )
    return {
        tuple(r)
        for r in j.groupBy("rname")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("amount").alias("total"),
        )
        .select("rname", "n", "total")
        .collect()
    }


def _got(view):
    return {
        tuple(r)
        for r in view.read().select("rname", "n", "total").collect()
    }


def _fb(spark, rows, op="U"):
    return spark.createDataFrame(
        rows, "f_id long, f_dim long, f_reg long, amount long, fv long"
    ).withColumn("Op", F.lit(op))


def _db(spark, rows, op="U"):
    return spark.createDataFrame(
        rows, "d_id long, d_reg long, dv long"
    ).withColumn("Op", F.lit(op))


def _rb(spark, rows, op="U"):
    return spark.createDataFrame(
        rows, "r_id long, rname string, rv long"
    ).withColumn("Op", F.lit(op))


@pytest.mark.slow
def test_all_three_feeds_change_in_one_window(spark, tmp_path):
    """Fact insert+delete, mid-chain fk move AND far-dim rename in the
    same window: 7 inclusion–exclusion terms; the multi-delta
    correction terms are what keep overlapping changes from
    double-counting."""
    facts, dims, regs, view = _mk(spark, tmp_path)
    assert view.refresh()["mode"] == "full"
    facts.upsert(
        _fb(spark, [(100, 5, 0, 77, 1)]).unionByName(
            _fb(spark, [(6, 0, 0, 60, 1)], op="D")
        ),
        delete_mode="apply",
    )
    dims.upsert(_db(spark, [(5, 0, 1)]), delete_mode="apply")
    regs.upsert(_rb(spark, [(2, "R2x", 1)]), delete_mode="apply")
    out = view.refresh()
    assert out["mode"] == "delta"
    assert _got(view) == _want(facts, dims, regs)
    assert view.refresh()["mode"] == "noop"


@pytest.mark.slow
def test_mid_chain_fk_move_relabels_facts(spark, tmp_path):
    """A dim changing its region moves EVERY fact row referencing it
    between groups — neither the fact nor the region feed says so."""
    facts, dims, regs, view = _mk(spark, tmp_path)
    view.refresh()
    dims.upsert(_db(spark, [(4, 0, 1)]), delete_mode="apply")
    out = view.refresh()
    assert out["mode"] == "delta" and out["groups_refreshed"] >= 2
    assert _got(view) == _want(facts, dims, regs)


@pytest.mark.slow
def test_far_dim_rename_and_delete(spark, tmp_path):
    facts, dims, regs, view = _mk(spark, tmp_path)
    view.refresh()
    regs.upsert(_rb(spark, [(1, "R1x", 1)]), delete_mode="apply")
    view.refresh()
    assert _got(view) == _want(facts, dims, regs)
    # deleting a region drops its whole group from the inner join
    regs.upsert(_rb(spark, [(0, "R0", 2)], op="D"), delete_mode="apply")
    view.refresh()
    assert "R0" not in {r["rname"] for r in view.read().collect()}
    assert _got(view) == _want(facts, dims, regs)


@pytest.mark.slow
def test_star_shape_converges(spark, tmp_path):
    facts, dims, regs, view = _mk(spark, tmp_path, star=True)
    view.refresh()
    # fact fk move on the star's second edge + a region rename
    facts.upsert(_fb(spark, [(7, 1, 2, 70, 1)]), delete_mode="apply")
    regs.upsert(_rb(spark, [(2, "R2y", 1)]), delete_mode="apply")
    out = view.refresh()
    assert out["mode"] == "delta"
    assert _got(view) == _want(facts, dims, regs, star=True)


@pytest.mark.slow
def test_crash_mid_apply_rebuilds(spark, tmp_path):
    facts, dims, regs, view = _mk(spark, tmp_path)
    view.refresh()
    view._set_pending(0, 1)
    facts.upsert(_fb(spark, [(200, 1, 1, 5, 1)]))
    out = view.refresh()
    assert out["mode"] == "full"
    assert not view._pending()
    assert _got(view) == _want(facts, dims, regs)
    facts.upsert(_fb(spark, [(201, 1, 1, 5, 2)]))
    assert view.refresh()["mode"] == "delta"
    assert _got(view) == _want(facts, dims, regs)


def test_bulk_rewrite_falls_back_to_full(spark, tmp_path):
    facts, dims, regs, view = _mk(spark, tmp_path)
    view.max_broadcast_keys = 3
    view.refresh()
    facts.upsert(
        _fb(spark, [(300 + i, i % 6, i % 3, i, 1) for i in range(8)]),
        delete_mode="apply",
    )
    out = view.refresh()
    assert out["mode"] == "full"
    assert _got(view) == _want(facts, dims, regs)


@pytest.mark.slow
def test_sql_facade_routes_chain_delta(spark, tmp_path):
    from rds_to_datalake_project_spark.sql import MATVIEWS, run_query

    facts, dims, regs, _ = _mk(spark, tmp_path)
    reg = {"facts_t": facts, "dims_t": dims, "regions_t": regs}
    try:
        out = run_query(
            spark,
            "CREATE MATERIALIZED VIEW dcv WITH AUTO DELTA REFRESH AS "
            "SELECT rname, count(*) AS n, sum(amount) AS total "
            "FROM facts_t JOIN dims_t ON f_dim = d_id "
            "JOIN regions_t ON d_reg = r_id GROUP BY rname",
            tables=reg,
        ).collect()[0]
        assert out["mode"] == "full"
        assert isinstance(MATVIEWS["dcv"], DeltaChainMaterializedView)
        # commits on all three feeds; auto hooks refresh by delta
        facts.upsert(_fb(spark, [(400, 2, 2, 9, 1)]))
        dims.upsert(_db(spark, [(1, 2, 1)]), delete_mode="apply")
        regs.upsert(_rb(spark, [(0, "Rz", 1)]), delete_mode="apply")
        got = {
            (r["rname"], r["n"], r["total"])
            for r in run_query(
                spark, "SELECT * FROM dcv", tables=reg
            ).collect()
        }
        assert got == _want(facts, dims, regs)
        run_query(spark, "DROP MATERIALIZED VIEW dcv", tables=reg)
    finally:
        MATVIEWS.pop("dcv", None)


# --- property sweep: interleaved 3-table churn ----------------------------------

chain_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),   # which table
        st.integers(0, 5),   # entity id
        st.integers(1, 8),   # version
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=chain_events_strategy, cuts=st.lists(st.integers(1, 13), max_size=2))
@pytest.mark.slow
def test_delta_chain_equals_recompute_for_any_cdc_sequence(
    spark, tmp_path_factory, events, cuts
):
    tmp = tmp_path_factory.mktemp("pdcv")
    facts, dims, regs, view = _mk(spark, tmp)
    view.refresh()

    positions = sorted({c for c in cuts if c < len(events)})
    batches, prev = [], 0
    for p in positions + [len(events)]:
        if events[prev:p]:
            batches.append(events[prev:p])
        prev = p
    for chunk in batches:
        f_rows = [
            (k, (k + v) % 6, (k * v) % 3, 10 * k + v, v,
             "D" if v % 4 == 0 else "U")
            for w, k, v in chunk if w == 0
        ]
        d_rows = [
            (k, (k + v) % 3, v, "D" if v % 5 == 0 else "U")
            for w, k, v in chunk if w == 1
        ]
        r_rows = [
            (k % 3, f"R{(k + v) % 5}", v, "D" if v % 6 == 0 else "U")
            for w, k, v in chunk if w == 2
        ]
        if f_rows:
            facts.upsert(spark.createDataFrame(
                f_rows, "f_id long, f_dim long, f_reg long, amount long, "
                        "fv long, Op string"), delete_mode="apply")
        if d_rows:
            dims.upsert(spark.createDataFrame(
                d_rows, "d_id long, d_reg long, dv long, Op string"),
                delete_mode="apply")
        if r_rows:
            regs.upsert(spark.createDataFrame(
                r_rows, "r_id long, rname string, rv long, Op string"),
                delete_mode="apply")
        view.refresh()

    assert _got(view) == _want(facts, dims, regs)


@pytest.mark.slow
def test_minmax_chain_delta_converges_with_repair(spark, tmp_path):
    """min/max lifted to the chain: a far-dim rename moves extrema
    between groups (removal + insert of every joined contribution) and
    a fact delete of a group maximum repairs from the current join."""
    facts, dims, regs, _ = _mk(spark, tmp_path)
    mm = DeltaChainMaterializedView(
        [facts, dims, regs],
        on=[("f_dim", "d_id"), ("d_reg", "r_id")],
        path=str(tmp_path / "vm"),
        group_cols=["rname"],
        aggs={"n": "count(*)", "hi": "max(amount)"},
    )
    mm.refresh()

    def want():
        j = facts.read().join(dims.read(), F.col("f_dim") == F.col("d_id"))
        j = j.join(regs.read(), F.col("d_reg") == F.col("r_id"))
        return {
            tuple(r)
            for r in j.groupBy("rname").agg(
                F.count("*").cast("long").alias("n"),
                F.max("amount").alias("hi"),
            ).select("rname", "n", "hi").collect()
        }

    def got():
        return {
            tuple(r)
            for r in mm.read().select("rname", "n", "hi").collect()
        }

    regs.upsert(_rb(spark, [(2, "R2moved", 1)]), delete_mode="apply")
    out = mm.refresh()
    assert out["mode"] == "delta"
    assert got() == want()
    # delete the global max fact (f_id 40, amount 400) -> its region
    # group repairs to the surviving second-best
    facts.upsert(_fb(spark, [(40, 4, 1, 400, 9)], op="D"), delete_mode="apply")
    out = mm.refresh()
    assert out["mode"] == "delta" and out["groups_repaired"] >= 1
    assert got() == want()


@pytest.mark.slow
def test_count_distinct_chain_delta_converges(spark, tmp_path):
    """count(DISTINCT) lifted to the chain: a far-dim rename moves
    every joined (group, value) pair between groups in one window."""
    facts, dims, regs, _ = _mk(spark, tmp_path)
    cd = DeltaChainMaterializedView(
        [facts, dims, regs],
        on=[("f_dim", "d_id"), ("d_reg", "r_id")],
        path=str(tmp_path / "vcd"),
        group_cols=["rname"],
        aggs={"n": "count(*)", "nd": "count(DISTINCT f_dim)"},
    )
    cd.refresh()

    def want():
        j = facts.read().join(dims.read(), F.col("f_dim") == F.col("d_id"))
        j = j.join(regs.read(), F.col("d_reg") == F.col("r_id"))
        return {
            tuple(r)
            for r in j.groupBy("rname").agg(
                F.count("*").cast("long").alias("n"),
                F.countDistinct("f_dim").cast("long").alias("nd"),
            ).select("rname", "n", "nd").collect()
        }

    def got():
        return {
            tuple(r)
            for r in cd.read().select("rname", "n", "nd").collect()
        }

    assert got() == want()
    # mid-chain fk move: dim 5's facts change region (value 5 dies in
    # the old group, births in the new one)
    dims.upsert(_db(spark, [(5, 0, 1)]), delete_mode="apply")
    out = cd.refresh()
    assert out["mode"] == "delta"
    assert got() == want()
    # far-dim rename + fact delete in one window
    regs.upsert(_rb(spark, [(0, "R0x", 1)]), delete_mode="apply")
    facts.upsert(_fb(spark, [(6, 0, 0, 60, 1)], op="D"), delete_mode="apply")
    out = cd.refresh()
    assert out["mode"] == "delta"
    assert got() == want()

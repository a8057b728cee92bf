"""Workload-driven materialized view advisor (advisor.py + the
RECOMMEND/SHOW/RESET QUERY WORKLOAD facade statements): aggregate
SELECTs that no view serves are captured as shapes; RECOMMEND
MATERIALIZED VIEWS emits executable CREATE DDL whose views then serve
the same workload through the rewriter — the full loop is tested
end-to-end (observe → recommend → CREATE → re-run → rewrite fires,
values identical to the base plan)."""

from __future__ import annotations

import pytest

from rds_to_datalake_project_spark import advisor, rewrite
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec
from rds_to_datalake_project_spark.sql import MATVIEWS, run_query


def _mk(spark, tmp_path, name, prefix="f"):
    """Small fact table; column names prefixed so join clusters can be
    column-disjoint (the delta join classes require it)."""
    p = prefix
    spec = TableSpec(
        name, record_key=(f"{p}_id",), precombine_key=f"{p}_seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / name), spec, retain_versions=8)
    rows = [
        (i, i % 5, f"g{i % 3}", f"s{i % 2}", 10 * i, float(i % 7),
         f"2024-01-{(i % 27) + 1:02d} {i % 24:02d}:30:00", 0)
        for i in range(60)
    ]
    t.initial_load(
        spark.createDataFrame(
            rows,
            f"{p}_id long, {p}_k long, {p}_grp string, {p}_sub string, "
            f"{p}_amount long, {p}_val double, {p}_ts_s string, {p}_seq long",
        ).selectExpr(
            f"{p}_id", f"{p}_k", f"{p}_grp", f"{p}_sub", f"{p}_amount",
            f"{p}_val", f"cast({p}_ts_s as timestamp) AS {p}_ts", f"{p}_seq",
        )
    )
    t.register(name)
    return t


@pytest.fixture()
def clean_advisor():
    advisor.reset()
    yield
    advisor.reset()
    for name in [n for n in MATVIEWS if n.startswith("rec_")]:
        MATVIEWS.pop(name, None)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _base_plan(spark, sql, tables):
    # comparison runs are not workload: a forced base plan would
    # otherwise observe as a fresh miss and re-recommend the shape
    rewrite.AUTO_REWRITE = False
    advisor.CAPTURE = False
    try:
        return run_query(spark, sql, tables=tables)
    finally:
        rewrite.AUTO_REWRITE = True
        advisor.CAPTURE = True


@pytest.mark.slow
def test_observe_recommend_create_serve_loop(spark, tmp_path, clean_advisor):
    t = _mk(spark, tmp_path, "adv_base")
    tbl = {"adv_base": t}
    workload = [
        "SELECT f_grp, f_sub, sum(f_amount) AS total, count(*) AS n "
        "FROM adv_base GROUP BY f_grp, f_sub",
        "SELECT f_grp, avg(f_val) AS av FROM adv_base GROUP BY f_grp",
        "SELECT f_sub, max(f_amount) AS hi FROM adv_base GROUP BY f_sub",
    ]
    for q in workload + workload[:1]:  # first shape seen twice
        run_query(spark, q, tables=tbl)
        assert rewrite.LAST_SELECT_REWRITE is None
    recs = run_query(spark, "RECOMMEND MATERIALIZED VIEWS", tables=tbl)
    rows = recs.collect()
    assert len(rows) == 1
    r = rows[0]
    # union of group columns, 4 unserved queries over 3 shapes,
    # delta-maintainable on a single table
    assert set(r.group_cols.split(", ")) == {"f_grp", "f_sub"}
    assert r.queries_served == 4 and r.shapes_served == 3
    assert r.strategy == "delta" and "WITH AUTO DELTA REFRESH" in r.ddl
    # base-scan estimate: what every unserved query pays today
    assert r.est_base_files >= 1 and r.est_base_bytes > 0
    # avg decomposition components materialize alongside the avg
    assert "sum(f_val)" in r.ddl and "count(f_val)" in r.ddl
    # the DDL is executable as-is, and the views then serve the
    # original workload with base-plan-identical results
    run_query(spark, r.ddl, tables=tbl)
    for q in workload:
        got = run_query(spark, q, tables=tbl)
        hit = rewrite.LAST_SELECT_REWRITE
        assert hit is not None and hit["view"] == r.view_name, (q, hit)
        want = _base_plan(spark, q, tbl)
        assert got.dtypes == want.dtypes
        assert _rows(got) == _rows(want)
    # served queries stop being recommendations
    again = run_query(spark, "RECOMMEND MATERIALIZED VIEWS", tables=tbl)
    assert again.count() == 0
    run_query(spark, f"DROP MATERIALIZED VIEW {r.view_name}", tables=tbl)


def test_trunc_hierarchy_unions_to_feeding_unit(spark, tmp_path, clean_advisor):
    t = _mk(spark, tmp_path, "adv_ts")
    tbl = {"adv_ts": t}
    qs = [
        "SELECT date_trunc('week', f_ts) AS w, sum(f_amount) AS total "
        "FROM adv_ts GROUP BY w",
        "SELECT date_trunc('month', f_ts) AS mo, sum(f_amount) AS total "
        "FROM adv_ts GROUP BY mo",
    ]
    for q in qs:
        run_query(spark, q, tables=tbl)
    recs = advisor.recommend(tables=tbl)
    assert len(recs) == 1
    # week+month → day (week nests in nothing coarser than itself)
    assert "date_trunc('day', f_ts)" in recs[0]["ddl"], recs[0]["ddl"]
    run_query(spark, recs[0]["ddl"], tables=tbl)
    for q in qs:
        got = run_query(spark, q, tables=tbl)
        hit = rewrite.LAST_SELECT_REWRITE
        assert hit is not None and hit["view"] == recs[0]["name"], (q, hit)
        want = _base_plan(spark, q, tbl)
        assert got.dtypes == want.dtypes and _rows(got) == _rows(want)
    run_query(spark, f"DROP MATERIALIZED VIEW {recs[0]['name']}", tables=tbl)


@pytest.mark.slow
def test_count_distinct_gets_exact_grouping_candidate(
    spark, tmp_path, clean_advisor
):
    t = _mk(spark, tmp_path, "adv_cd")
    tbl = {"adv_cd": t}
    run_query(
        spark,
        "SELECT f_grp, count(DISTINCT f_sub) AS subs, sum(f_amount) AS total "
        "FROM adv_cd GROUP BY f_grp",
        tables=tbl,
    )
    run_query(
        spark,
        "SELECT f_grp, f_sub, sum(f_amount) AS total "
        "FROM adv_cd GROUP BY f_grp, f_sub",
        tables=tbl,
    )
    recs = advisor.recommend(tables=tbl)
    assert len(recs) == 2
    by_groups = {tuple(sorted(r["group_cols"])): r for r in recs}
    exact = by_groups[("f_grp",)]
    assert "count(distinct f_sub)" in exact["ddl"].lower()
    rollup = by_groups[("f_grp", "f_sub")]
    assert "distinct" not in rollup["ddl"].lower()
    for r in recs:
        run_query(spark, r["ddl"], tables=tbl)
    got = run_query(
        spark,
        "SELECT f_grp, count(DISTINCT f_sub) AS subs, sum(f_amount) AS total "
        "FROM adv_cd GROUP BY f_grp",
        tables=tbl,
    )
    hit = rewrite.LAST_SELECT_REWRITE
    assert hit is not None and hit["view"] == exact["name"]
    assert hit["mode"] == "projection"
    want = _base_plan(
        spark,
        "SELECT f_grp, count(DISTINCT f_sub) AS subs, sum(f_amount) AS total "
        "FROM adv_cd GROUP BY f_grp",
        tbl,
    )
    assert got.dtypes == want.dtypes and _rows(got) == _rows(want)
    for r in recs:
        run_query(spark, f"DROP MATERIALIZED VIEW {r['name']}", tables=tbl)


@pytest.mark.slow
def test_join_cluster_delta_and_left_chain_recompute(
    spark, tmp_path, clean_advisor
):
    f = _mk(spark, tmp_path, "adv_f", prefix="f")
    d = _mk(spark, tmp_path, "adv_d", prefix="d")
    e = _mk(spark, tmp_path, "adv_e", prefix="e")
    tbl = {"adv_f": f, "adv_d": d, "adv_e": e}
    run_query(
        spark,
        "SELECT d_grp, sum(f_amount) AS total FROM adv_f "
        "JOIN adv_d ON f_k = d_id GROUP BY d_grp",
        tables=tbl,
    )
    run_query(
        spark,
        "SELECT d_grp, sum(f_amount) AS total FROM adv_f "
        "LEFT JOIN adv_d ON f_k = d_id "
        "JOIN adv_e ON f_id = e_id GROUP BY d_grp",
        tables=tbl,
    )
    recs = advisor.recommend(tables=tbl)
    assert len(recs) == 2
    by_strategy = {r["strategy"]: r for r in recs}
    assert "JOIN adv_d ON f_k = d_id" in by_strategy["delta"]["ddl"]
    # LEFT hop in a chain: no delta class — recompute
    assert "LEFT JOIN" in by_strategy["recompute"]["ddl"]
    for r in recs:
        run_query(spark, r["ddl"], tables=tbl)
        run_query(spark, f"DROP MATERIALIZED VIEW {r['name']}", tables=tbl)


def test_overlapping_join_columns_downgrade_delta(
    spark, tmp_path, clean_advisor
):
    a = _mk(spark, tmp_path, "adv_o1", prefix="f")
    # second table overlaps adv_o1 on ONE column the query never
    # touches (f_val) — still enough to break the delta classes'
    # disjoint-column requirement
    spec = TableSpec(
        "adv_o2", record_key=("g_id",), precombine_key="g_seq",
        partition_granularity=None,
    )
    b = KeyedTable(spark, str(tmp_path / "adv_o2"), spec, retain_versions=8)
    b.initial_load(
        spark.createDataFrame(
            [(i, f"h{i % 4}", float(i), 0) for i in range(20)],
            "g_id long, g_grp string, f_val double, g_seq long",
        )
    )
    b.register("adv_o2")
    tbl = {"adv_o1": a, "adv_o2": b}
    run_query(
        spark,
        "SELECT g_grp, sum(f_amount) AS total FROM adv_o1 "
        "JOIN adv_o2 ON f_k = g_id GROUP BY g_grp",
        tables=tbl,
    )
    recs = advisor.recommend(tables=tbl)
    assert len(recs) == 1 and recs[0]["strategy"] == "recompute"


def test_show_and_reset_workload(spark, tmp_path, clean_advisor):
    t = _mk(spark, tmp_path, "adv_w")
    tbl = {"adv_w": t}
    q = "SELECT f_grp, sum(f_amount) AS total FROM adv_w GROUP BY f_grp"
    run_query(spark, q, tables=tbl)
    run_query(spark, q, tables=tbl)
    wl = run_query(spark, "SHOW QUERY WORKLOAD", tables=tbl).collect()
    assert len(wl) == 1 and wl[0].hits == 2 and wl[0].served_by is None
    # EXPLAIN REWRITE is a dry run: it must not count as workload
    run_query(spark, f"EXPLAIN REWRITE {q}", tables=tbl)
    wl = run_query(spark, "SHOW QUERY WORKLOAD", tables=tbl).collect()
    assert wl[0].hits == 2
    out = run_query(spark, "RESET QUERY WORKLOAD", tables=tbl).collect()
    assert out[0].shapes_cleared == 1
    assert run_query(spark, "SHOW QUERY WORKLOAD", tables=tbl).count() == 0


def test_apply_recommendations_closes_the_loop(spark, tmp_path, clean_advisor):
    t = _mk(spark, tmp_path, "adv_ap")
    tbl = {"adv_ap": t}
    q = "SELECT f_grp, sum(f_amount) AS total FROM adv_ap GROUP BY f_grp"
    run_query(spark, q, tables=tbl)
    out = run_query(spark, "APPLY RECOMMENDATIONS", tables=tbl).collect()
    assert len(out) == 1 and out[0].created and out[0].skipped_reason is None
    name = out[0].view_name
    try:
        got = run_query(spark, q, tables=tbl)
        hit = rewrite.LAST_SELECT_REWRITE
        assert hit is not None and hit["view"] == name
        want = _base_plan(spark, q, tbl)
        assert got.dtypes == want.dtypes and _rows(got) == _rows(want)
        # a second APPLY for a still-missed DIFFERENT shape must take a
        # FRESH name (never replace the adopted view)
        run_query(
            spark,
            "SELECT f_sub, min(f_amount) AS lo FROM adv_ap GROUP BY f_sub",
            tables=tbl,
        )
        out2 = run_query(spark, "APPLY RECOMMENDATIONS", tables=tbl).collect()
        assert len(out2) == 1 and out2[0].created
        assert out2[0].view_name != name
        run_query(
            spark, f"DROP MATERIALIZED VIEW {out2[0].view_name}", tables=tbl
        )
    finally:
        run_query(spark, f"DROP MATERIALIZED VIEW {name}", tables=tbl)


def test_show_materialized_views_listing(spark, tmp_path, clean_advisor):
    from pyspark.sql import functions as SF

    t = _mk(spark, tmp_path, "adv_sh")
    tbl = {"adv_sh": t}
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW shv WITH DELTA REFRESH AS "
        "SELECT f_grp, sum(f_amount) AS total FROM adv_sh GROUP BY f_grp",
        tables=tbl,
    )
    try:
        rows = {
            r.view_name: r
            for r in run_query(
                spark, "SHOW MATERIALIZED VIEWS", tables=tbl
            ).collect()
        }
        r = rows["shv"]
        assert r.strategy == "delta" and r.lag_commits == 0
        assert r.base_tables == "adv_sh" and "f_grp" in r.group_cols
        # a base commit the view has not folded in yet shows as lag
        t.upsert(
            spark.createDataFrame(
                [(999, 0, "g0", "s0", 5, 0.0, 1)],
                "f_id long, f_k long, f_grp string, f_sub string, "
                "f_amount long, f_val double, f_seq long",
            ).withColumn("f_ts", SF.expr("timestamp'2024-02-01 00:00:00'"))
        )
        rows = {
            r.view_name: r
            for r in run_query(
                spark, "SHOW MATERIALIZED VIEWS", tables=tbl
            ).collect()
        }
        assert rows["shv"].lag_commits == 1
    finally:
        run_query(spark, "DROP MATERIALIZED VIEW shv", tables=tbl)


def test_served_queries_counted_and_capture_switch(
    spark, tmp_path, clean_advisor
):
    t = _mk(spark, tmp_path, "adv_s")
    tbl = {"adv_s": t}
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW adv_s_v WITH AUTO REFRESH AS "
        "SELECT f_grp, sum(f_amount) AS total FROM adv_s GROUP BY f_grp",
        tables=tbl,
    )
    try:
        q = "SELECT f_grp, sum(f_amount) AS total FROM adv_s GROUP BY f_grp"
        run_query(spark, q, tables=tbl)
        assert rewrite.LAST_SELECT_REWRITE is not None
        wl = advisor.workload()
        assert len(wl) == 1
        assert wl[0]["served_hits"] == 1 and wl[0]["served_by"] == "adv_s_v"
        assert advisor.recommend(tables=tbl) == []  # nothing missed
        advisor.CAPTURE = False
        try:
            run_query(spark, q, tables=tbl)
            assert advisor.workload()[0]["hits"] == 1  # not recounted
        finally:
            advisor.CAPTURE = True
    finally:
        run_query(spark, "DROP MATERIALIZED VIEW adv_s_v", tables=tbl)

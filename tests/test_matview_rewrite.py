"""Matview-backed SELECT rewriting (rewrite.py): a plain GROUP BY
query whose FROM matches a FRESH materialized view's definition is
served from the view store — projection when the grouping is exact,
re-aggregation when it's a subset (rollup), including the global
(no GROUP BY) form. Unsupported shapes, predicates on aggregated-away
columns, and STALE views must all decline and fall through to the
base-table plan with identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark import rewrite
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec
from rds_to_datalake_project_spark.sql import MATVIEWS, run_query


def _mk(spark, tmp_path, name):
    spec = TableSpec(
        name, record_key=("f_id",), precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / name), spec, retain_versions=8)
    rows = [
        (i, f"g{i % 3}", f"s{i % 2}", 10 * i, float(i % 7), 0)
        for i in range(60)
    ]
    t.initial_load(
        spark.createDataFrame(
            rows,
            "f_id long, grp string, sub string, amount long, val double, seq long",
        )
    )
    t.register(name)
    return t


def _rows(df):
    return {tuple(r) for r in df.collect()}


CREATE = (
    "CREATE MATERIALIZED VIEW {v} WITH AUTO REFRESH AS "
    "SELECT grp, sub, sum(amount) AS total, count(*) AS n, "
    "min(amount) AS lo, max(amount) AS hi, "
    "sum(val) AS sv, count(val) AS cv "
    "FROM {t} GROUP BY grp, sub"
)


@pytest.fixture()
def view(spark, tmp_path):
    t = _mk(spark, tmp_path, "rw_base")
    run_query(spark, CREATE.format(v="rw_v", t="rw_base"), tables={"rw_base": t})
    yield t
    MATVIEWS.pop("rw_v", None)


def _check(spark, t, sql, expect_view, expect_mode=None):
    """Run through the facade, assert the rewrite decision, and check
    the result (names, dtypes, values) against the same SQL forced to
    the base plan."""
    got = run_query(spark, sql, tables={"rw_base": t})
    hit = rewrite.LAST_SELECT_REWRITE
    if expect_view is None:
        assert hit is None, hit
    else:
        assert hit is not None and hit["view"] == expect_view, hit
        if expect_mode:
            assert hit["mode"] == expect_mode, hit
    rewrite.AUTO_REWRITE = False
    try:
        want = run_query(spark, sql, tables={"rw_base": t})
        assert rewrite.LAST_SELECT_REWRITE is None
    finally:
        rewrite.AUTO_REWRITE = True
    assert got.dtypes == want.dtypes, (got.dtypes, want.dtypes)
    assert _rows(got) == _rows(want)


def test_projection_rewrite_exact_groups(spark, view):
    _check(
        spark,
        view,
        "SELECT grp, sub, sum(amount) AS total, count(*) AS n "
        "FROM rw_base GROUP BY grp, sub",
        "rw_v",
        "projection",
    )


def test_rollup_rewrite_subset_groups_where_order_limit(spark, view):
    _check(
        spark,
        view,
        "SELECT grp, sum(amount) AS total, count(*) AS n, "
        "min(amount) AS lo, max(amount) AS hi "
        "FROM rw_base WHERE sub = 's1' GROUP BY grp "
        "ORDER BY total DESC LIMIT 2",
        "rw_v",
        "rollup",
    )


def test_global_rollup_no_group_by(spark, view):
    _check(
        spark,
        view,
        "SELECT sum(amount) AS total, count(*) AS n FROM rw_base",
        "rw_v",
        "rollup",
    )


def test_avg_decomposes_from_sum_and_count(spark, view):
    # integer-valued doubles: sum/count division is exact, so the
    # rewritten and base plans agree bit-for-bit
    _check(
        spark,
        view,
        "SELECT grp, avg(val) AS av FROM rw_base GROUP BY grp",
        "rw_v",
        "rollup",
    )


def test_predicate_on_aggregated_column_declines(spark, view):
    _check(
        spark,
        view,
        "SELECT grp, sum(amount) AS total FROM rw_base "
        "WHERE amount > 100 GROUP BY grp",
        None,
    )


def test_non_matching_aggregate_declines(spark, view):
    # the view has no sum(val * 2) and avg needs sum+count of the SAME
    # expression — not derivable, must fall through
    _check(
        spark,
        view,
        "SELECT grp, sum(amount * 2) AS t2 FROM rw_base GROUP BY grp",
        None,
    )


def test_count_distinct_serves_projection_only(spark, view, tmp_path):
    t2 = _mk(spark, tmp_path, "rw_base_cd")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_vcd WITH AUTO REFRESH AS "
        "SELECT grp, sub, count(DISTINCT amount) AS nd "
        "FROM rw_base_cd GROUP BY grp, sub",
        tables={"rw_base_cd": t2},
    )
    try:
        got = run_query(
            spark,
            "SELECT grp, sub, count(DISTINCT amount) AS nd "
            "FROM rw_base_cd GROUP BY grp, sub",
            tables={"rw_base_cd": t2},
        )
        assert rewrite.LAST_SELECT_REWRITE["mode"] == "projection"
        want = t2.read().groupBy("grp", "sub").agg(
            F.countDistinct("amount").alias("nd")
        )
        assert _rows(got) == _rows(want)
        # ndv does NOT re-aggregate across groups: rollup must decline
        run_query(
            spark,
            "SELECT grp, count(DISTINCT amount) AS nd "
            "FROM rw_base_cd GROUP BY grp",
            tables={"rw_base_cd": t2},
        )
        assert rewrite.LAST_SELECT_REWRITE is None
    finally:
        MATVIEWS.pop("rw_vcd", None)


def test_stale_view_declines_until_refresh(spark, tmp_path):
    t = _mk(spark, tmp_path, "rw_stale")
    # no AUTO: the view goes stale on the next commit
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_sv AS SELECT grp, sub, "
        "sum(amount) AS total, count(*) AS n FROM rw_stale GROUP BY grp, sub",
        tables={"rw_stale": t},
    )
    try:
        sql = "SELECT grp, sum(amount) AS total FROM rw_stale GROUP BY grp"
        run_query(spark, sql, tables={"rw_stale": t})
        assert rewrite.LAST_SELECT_REWRITE is not None
        t.upsert(
            spark.createDataFrame(
                [(1000, "g0", "s0", 77, 0.0, 1)],
                "f_id long, grp string, sub string, amount long, val double, seq long",
            ).withColumn("Op", F.lit("I"))
        )
        t.register("rw_stale")  # refresh the temp view to current head
        got = run_query(spark, sql, tables={"rw_stale": t})
        assert rewrite.LAST_SELECT_REWRITE is None  # stale → base plan
        want = t.read().groupBy("grp").agg(F.sum("amount").alias("total"))
        assert _rows(got) == _rows(want)
        run_query(spark, "REFRESH MATERIALIZED VIEW rw_sv", tables={"rw_stale": t})
        run_query(spark, sql, tables={"rw_stale": t})
        assert rewrite.LAST_SELECT_REWRITE is not None  # fresh again
    finally:
        MATVIEWS.pop("rw_sv", None)


def test_join_view_rollup_rewrite(spark, tmp_path):
    dspec = TableSpec(
        "rwd", record_key=("d_id",), precombine_key="seq",
        partition_granularity=None,
    )
    d = KeyedTable(spark, str(tmp_path / "d"), dspec, retain_versions=8)
    d.initial_load(
        spark.createDataFrame(
            [(i, f"region{i % 2}", f"nm{i}", 0) for i in range(6)],
            "d_id long, region string, dname string, seq long",
        )
    )
    d.register("rw_dim")
    fspec = TableSpec(
        "rwf", record_key=("f_id",), precombine_key="seq",
        partition_granularity=None,
    )
    f = KeyedTable(spark, str(tmp_path / "f"), fspec, retain_versions=8)
    f.initial_load(
        spark.createDataFrame(
            [(i, i % 6, 100 * i, 0) for i in range(50)],
            "f_id long, fd_id long, amount long, seq long",
        )
    )
    f.register("rw_fact")
    reg = {"rw_fact": f, "rw_dim": d}
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_jv WITH AUTO REFRESH AS "
        "SELECT region, dname, sum(amount) AS total, count(*) AS n "
        "FROM rw_fact JOIN rw_dim ON fd_id = d_id GROUP BY region, dname",
        tables=reg,
    )
    try:
        sql = (
            "SELECT region, sum(amount) AS total, count(*) AS n "
            "FROM rw_fact JOIN rw_dim ON fd_id = d_id GROUP BY region"
        )
        got = run_query(spark, sql, tables=reg)
        assert rewrite.LAST_SELECT_REWRITE["view"] == "rw_jv"
        want = (
            f.read()
            .join(d.read(), F.col("fd_id") == F.col("d_id"))
            .groupBy("region")
            .agg(F.sum("amount").alias("total"), F.count("*").alias("n"))
        )
        assert _rows(got) == _rows(want)
        # different join spelling (INNER JOIN, swapped ON sides) still
        # canonicalizes onto the view
        run_query(
            spark,
            "SELECT region, sum(amount) AS total, count(*) AS n "
            "FROM rw_fact INNER JOIN rw_dim ON d_id = fd_id GROUP BY region",
            tables=reg,
        )
        assert rewrite.LAST_SELECT_REWRITE is not None
        # a DIFFERENT from-shape (one base table alone) must not match
        run_query(
            spark,
            "SELECT region, count(*) AS n FROM rw_dim GROUP BY region",
            tables=reg,
        )
        assert rewrite.LAST_SELECT_REWRITE is None
    finally:
        MATVIEWS.pop("rw_jv", None)


def test_unsupported_shapes_decline(spark, view):
    for sql in (
        "SELECT DISTINCT grp FROM rw_base",
        # HAVING over a RAW aggregate expression (not an alias) needs
        # expression surgery — declined
        "SELECT grp, sum(amount) AS t FROM rw_base GROUP BY grp "
        "HAVING sum(amount) > 0",
        "SELECT grp, sum(amount) AS t FROM "
        "(SELECT * FROM rw_base) GROUP BY grp",
        "SELECT grp FROM rw_base GROUP BY grp UNION "
        "SELECT grp FROM rw_base GROUP BY grp",
    ):
        run_query(spark, sql, tables={"rw_base": view})
        assert rewrite.LAST_SELECT_REWRITE is None, sql


def test_having_on_alias_serves(spark, view):
    # exact grouping + HAVING: forced to rollup mode (HAVING needs an
    # aggregation), filtered post re-aggregation
    _check(
        spark,
        view,
        "SELECT grp, sub, sum(amount) AS total FROM rw_base "
        "GROUP BY grp, sub HAVING total > 100 ORDER BY grp, sub",
        "rw_v",
        "rollup",
    )
    # subset grouping + HAVING on alias and group col
    _check(
        spark,
        view,
        "SELECT grp, count(*) AS n FROM rw_base "
        "GROUP BY grp HAVING n > 5 AND grp LIKE 'g%'",
        "rw_v",
        "rollup",
    )


def test_group_only_select_is_distinct_groups(spark, view):
    _check(
        spark,
        view,
        "SELECT grp FROM rw_base GROUP BY grp ORDER BY grp",
        "rw_v",
        "rollup",
    )


def _mk_ts(spark, tmp_path, name):
    spec = TableSpec(
        name, record_key=("e_id",), precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / name), spec, retain_versions=8)
    rows = [
        (i, f"2024-0{1 + i % 3}-{1 + i % 27:02d} {i % 24:02d}:30:00",
         float(i % 11), 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "e_id long, ts_s string, v double, seq long"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    t.initial_load(df)
    t.register(name)
    return t


def test_hierarchical_bucket_rollup_day_from_hour(spark, tmp_path):
    """A daily query is served from an HOURLY view by re-truncating the
    hour keys — the continuous-aggregate hierarchy. Week rolls up from
    day-or-finer; month NEVER rolls up from week (ISO Mondays cross
    month boundaries)."""
    t = _mk_ts(spark, tmp_path, "rw_ts")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_hourly WITH AUTO REFRESH AS "
        "SELECT date_trunc('hour', ts) AS h, sum(v) AS sv, count(*) AS n "
        "FROM rw_ts GROUP BY h",
        tables={"rw_ts": t},
    )
    try:
        for unit in ("day", "week", "month", "year"):
            sql = (
                f"SELECT date_trunc('{unit}', ts) AS b, sum(v) AS sv, "
                f"count(*) AS n FROM rw_ts GROUP BY b"
            )
            got = run_query(spark, sql, tables={"rw_ts": t})
            hit = rewrite.LAST_SELECT_REWRITE
            assert hit and hit["view"] == "rw_hourly", (unit, hit)
            rewrite.AUTO_REWRITE = False
            try:
                want = run_query(spark, sql, tables={"rw_ts": t})
            finally:
                rewrite.AUTO_REWRITE = True
            assert got.dtypes == want.dtypes
            assert _rows(got) == _rows(want), unit
        # same-unit spelling still matches directly (projection)
        run_query(
            spark,
            "SELECT date_trunc('hour', ts) AS h, sum(v) AS sv, "
            "count(*) AS n FROM rw_ts GROUP BY h",
            tables={"rw_ts": t},
        )
        assert rewrite.LAST_SELECT_REWRITE["mode"] == "projection"
    finally:
        MATVIEWS.pop("rw_hourly", None)


def test_month_never_rolls_up_from_week(spark, tmp_path):
    t = _mk_ts(spark, tmp_path, "rw_ts_w")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_weekly WITH AUTO REFRESH AS "
        "SELECT date_trunc('week', ts) AS w, sum(v) AS sv "
        "FROM rw_ts_w GROUP BY w",
        tables={"rw_ts_w": t},
    )
    try:
        sql = (
            "SELECT date_trunc('month', ts) AS mth, sum(v) AS sv "
            "FROM rw_ts_w GROUP BY mth"
        )
        got = run_query(spark, sql, tables={"rw_ts_w": t})
        assert rewrite.LAST_SELECT_REWRITE is None  # declined: unsound
        rewrite.AUTO_REWRITE = False
        try:
            want = run_query(spark, sql, tables={"rw_ts_w": t})
        finally:
            rewrite.AUTO_REWRITE = True
        assert _rows(got) == _rows(want)
    finally:
        MATVIEWS.pop("rw_weekly", None)


def test_candidate_ranking_prefers_coarsest_view(spark, tmp_path):
    """With hourly AND daily views both fresh, a daily query serves
    from the daily view (fewer rows to re-aggregate), a monthly query
    rolls up from the daily view, an hourly one from the hourly."""
    t = _mk_ts(spark, tmp_path, "rw_ts_rank")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_rank_h WITH AUTO REFRESH AS "
        "SELECT date_trunc('hour', ts) AS h, sum(v) AS sv "
        "FROM rw_ts_rank GROUP BY h",
        tables={"rw_ts_rank": t},
    )
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_rank_d WITH AUTO REFRESH AS "
        "SELECT date_trunc('day', ts) AS d, sum(v) AS sv "
        "FROM rw_ts_rank GROUP BY d",
        tables={"rw_ts_rank": t},
    )
    try:
        cases = {
            "hour": "rw_rank_h",
            "day": "rw_rank_d",
            "month": "rw_rank_d",
        }
        for unit, expect in cases.items():
            run_query(
                spark,
                f"SELECT date_trunc('{unit}', ts) AS b, sum(v) AS sv "
                f"FROM rw_ts_rank GROUP BY b",
                tables={"rw_ts_rank": t},
            )
            assert rewrite.LAST_SELECT_REWRITE["view"] == expect, unit
    finally:
        MATVIEWS.pop("rw_rank_h", None)
        MATVIEWS.pop("rw_rank_d", None)


def test_bounded_staleness_knob(spark, tmp_path):
    """MAX_STALE_COMMITS > 0 lets a lagging view serve (its values are
    the STALE snapshot — the knob trades bounded lag for a store-sized
    plan); 0 keeps the exactly-fresh contract."""
    t = _mk(spark, tmp_path, "rw_lagbase")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_lag_v AS SELECT grp, sub, "
        "sum(amount) AS total FROM rw_lagbase GROUP BY grp, sub",
        tables={"rw_lagbase": t},
    )
    try:
        stale_want = _rows(
            t.read().groupBy("grp").agg(F.sum("amount").alias("total"))
        )
        t.upsert(
            spark.createDataFrame(
                [(2000, "g0", "s0", 999, 0.0, 1)],
                "f_id long, grp string, sub string, amount long, "
                "val double, seq long",
            ).withColumn("Op", F.lit("I"))
        )
        sql = "SELECT grp, sum(amount) AS total FROM rw_lagbase GROUP BY grp"
        run_query(spark, sql, tables={"rw_lagbase": t})
        assert rewrite.LAST_SELECT_REWRITE is None  # lag 1 > 0
        rewrite.MAX_STALE_COMMITS = 1
        try:
            got = run_query(spark, sql, tables={"rw_lagbase": t})
            hit = rewrite.LAST_SELECT_REWRITE
            assert hit is not None and hit["lag"] == 1
            assert _rows(got) == stale_want  # the stale snapshot, by contract
        finally:
            rewrite.MAX_STALE_COMMITS = 0
    finally:
        MATVIEWS.pop("rw_lag_v", None)


def test_explain_rewrite_statement(spark, view):
    row = run_query(
        spark,
        "EXPLAIN REWRITE SELECT grp, sum(amount) AS total "
        "FROM rw_base GROUP BY grp",
        tables={"rw_base": view},
    ).collect()[0]
    assert row["rewritten"] and row["served_by"] == "rw_v"
    assert row["mode"] == "rollup" and "sum(total)" in row["rewritten_sql"]
    row = run_query(
        spark,
        "EXPLAIN REWRITE SELECT grp, sum(amount * 3) AS t "
        "FROM rw_base GROUP BY grp",
        tables={"rw_base": view},
    ).collect()[0]
    assert not row["rewritten"] and row["served_by"] is None


def test_chain_view_rewrite(spark, tmp_path):
    """A 3-table FROM canonicalizes onto a chain view's definition."""
    ts = []
    for name, schema, rows in (
        ("rw_c_f", "f_id long, c_ref long, amt long, seq long",
         [(i, i % 4, 10 * i, 0) for i in range(40)]),
        ("rw_c_m", "c_id long, r_ref long, seq2 long",
         [(c, c % 2, 0) for c in range(4)]),
        ("rw_c_r", "r_id long, rname string, seq3 long",
         [(r, f"R{r}", 0) for r in range(2)]),
    ):
        spec = TableSpec(
            name, record_key=(schema.split()[0],),
            precombine_key=schema.rsplit(",", 1)[1].split()[0],
            partition_granularity=None,
        )
        t = KeyedTable(spark, str(tmp_path / name), spec, retain_versions=8)
        t.initial_load(spark.createDataFrame(rows, schema))
        t.register(name)
        ts.append(t)
    reg = dict(zip(("rw_c_f", "rw_c_m", "rw_c_r"), ts))
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_cv WITH AUTO REFRESH AS "
        "SELECT rname, sum(amt) AS total, count(*) AS n "
        "FROM rw_c_f JOIN rw_c_m ON c_ref = c_id "
        "JOIN rw_c_r ON r_ref = r_id GROUP BY rname",
        tables=reg,
    )
    try:
        got = run_query(
            spark,
            "SELECT sum(amt) AS total, count(*) AS n "
            "FROM rw_c_f JOIN rw_c_m ON c_ref = c_id "
            "JOIN rw_c_r ON r_ref = r_id",
            tables=reg,
        )
        assert rewrite.LAST_SELECT_REWRITE["view"] == "rw_cv"
        want = (
            ts[0].read()
            .join(ts[1].read(), F.col("c_ref") == F.col("c_id"))
            .join(ts[2].read(), F.col("r_ref") == F.col("r_id"))
            .agg(F.sum("amt").alias("total"), F.count("*").alias("n"))
        )
        assert _rows(got) == _rows(want)
    finally:
        MATVIEWS.pop("rw_cv", None)


def test_kill_switch(spark, view):
    rewrite.AUTO_REWRITE = False
    try:
        run_query(
            spark,
            "SELECT grp, sum(amount) AS total FROM rw_base GROUP BY grp",
            tables={"rw_base": view},
        )
        assert rewrite.LAST_SELECT_REWRITE is None
    finally:
        rewrite.AUTO_REWRITE = True


def test_distinct_over_group_key_serves_rollup(spark, view, tmp_path):
    """count/sum/avg(DISTINCT x) where x IS a view group key: the
    store preserves the distinct value set per rolled-up group, so the
    aggregates re-apply over the store column — including the
    projection→rollup upgrade when the grouping matches exactly but
    the view doesn't carry the DISTINCT aggregate verbatim."""
    t2 = _mk(spark, tmp_path, "rw_base_dk")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_vdk WITH AUTO REFRESH AS "
        "SELECT grp, amount, count(*) AS n, sum(val) AS sv "
        "FROM rw_base_dk GROUP BY grp, amount",
        tables={"rw_base_dk": t2},
    )
    try:
        _check(
            spark,
            t2,
            "SELECT grp, count(DISTINCT amount) AS cda, "
            "sum(DISTINCT amount) AS sda, avg(DISTINCT amount) AS ada "
            "FROM rw_base_dk GROUP BY grp",
            "rw_vdk",
            "rollup",
        )
        # exact-group query with a DISTINCT agg the view lacks:
        # upgraded to rollup over the full group set
        _check(
            spark,
            t2,
            "SELECT grp, amount, count(*) AS n, "
            "count(DISTINCT amount) AS cda "
            "FROM rw_base_dk GROUP BY grp, amount",
            "rw_vdk",
            "rollup",
        )
        # DISTINCT over a NON-group expression still declines
        _check(
            spark,
            t2,
            "SELECT grp, count(DISTINCT val) AS cdv "
            "FROM rw_base_dk GROUP BY grp",
            None,
        )
    finally:
        MATVIEWS.pop("rw_vdk", None)


def test_distinct_over_rebucketed_trunc_key(spark, tmp_path):
    """count(DISTINCT date_trunc(day, ts)) served from an HOURLY view:
    the day key re-truncates from the hour key before the DISTINCT."""
    spec = TableSpec(
        "rw_ts", record_key=("e_id",), precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, str(tmp_path / "rw_ts"), spec, retain_versions=4)
    rows = [
        (i, f"2024-01-{(i % 5) + 1:02d} {i % 24:02d}:15:00", i % 3, 0)
        for i in range(60)
    ]
    t.initial_load(
        spark.createDataFrame(
            rows, "e_id long, ts_s string, k long, seq long"
        ).selectExpr("e_id", "cast(ts_s as timestamp) AS ts", "k", "seq")
    )
    t.register("rw_ts")
    run_query(
        spark,
        "CREATE MATERIALIZED VIEW rw_vts WITH AUTO REFRESH AS "
        "SELECT k, date_trunc('hour', ts) AS h, count(*) AS n "
        "FROM rw_ts GROUP BY k, h",
        tables={"rw_ts": t},
    )
    try:
        _check(
            spark,
            t,
            "SELECT k, count(DISTINCT date_trunc('day', ts)) AS days "
            "FROM rw_ts GROUP BY k",
            "rw_vts",
            "rollup",
        )
    finally:
        MATVIEWS.pop("rw_vts", None)

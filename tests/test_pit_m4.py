"""Point-in-time SCD-2 join (operators/scd.py:pit_join) and M4 visual
downsampling (operators/timeseries.py:m4_downsample)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.scd import pit_join
from rds_to_datalake_project_spark.operators.timeseries import m4_downsample


def _intervals(spark):
    # key k=1: price 10 for commits [0,2), 20 for [2,∞)
    # key k=2: price 5 for [0,1), GONE for [1,3) (deleted), 7 for [3,∞)
    rows = [
        (1, 10.0, 0, 2, False),
        (1, 20.0, 2, None, True),
        (2, 5.0, 0, 1, False),
        (2, 7.0, 3, None, True),
    ]
    return spark.createDataFrame(
        rows, "k int, price double, valid_from int, valid_to int, is_current boolean"
    )


def test_pit_join_resolves_each_fact_to_its_interval(spark):
    facts = spark.createDataFrame(
        [(1, 0, "a"), (1, 2, "b"), (1, 9, "c"), (2, 0, "d"), (2, 1, "e"), (2, 3, "f")],
        "k int, as_of int, tag string",
    )
    out = pit_join(facts, _intervals(spark), ["k"], "as_of", ["price"])
    got = {(r["k"], r["as_of"]): r["price"] for r in out.collect()}
    assert got == {
        (1, 0): 10.0,
        (1, 2): 20.0,   # half-open: as_of == valid_from of the next interval
        (1, 9): 20.0,   # open-ended current interval
        (2, 0): 5.0,
        (2, 1): None,   # deleted during [1,3): no interval covers it
        (2, 3): 7.0,
    }
    # left join keeps fact cardinality exactly
    assert out.count() == facts.count()


def test_pit_join_unknown_key_gets_null(spark):
    facts = spark.createDataFrame([(99, 1)], "k int, as_of int")
    out = pit_join(facts, _intervals(spark), ["k"], "as_of", ["price"]).collect()
    assert len(out) == 1 and out[0]["price"] is None


def test_pit_join_matches_scd2_history_on_a_live_table(spark, tmp_path):
    """End-to-end: build a small versioned table, derive intervals via
    scd2_history, and check pit_join at every commit equals the
    read_as_of snapshot — the definitional property of the join."""
    from rds_to_datalake_project_spark.operators.scd import scd2_history
    from rds_to_datalake_project_spark.operators.upsert import KeyedTable
    from rds_to_datalake_project_spark.schema import TableSpec

    spec = TableSpec(
        "d", record_key=("k",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec, retain_versions=4)
    t.initial_load(
        spark.createDataFrame([(i, float(i), 0) for i in range(20)],
                              "k long, v double, seq long")
    )
    t.upsert(
        spark.createDataFrame(
            [(3, 333.0, 1, "U"), (5, 0.0, 1, "D"), (50, 50.0, 1, "I")],
            "k long, v double, seq long, Op string",
        ),
        delete_mode="apply",
    )
    hist = scd2_history(t, ["v"])
    for commit in (0, 1):
        snap = {r["k"]: r["v"] for r in t.read_as_of(commit).collect()}
        facts = spark.createDataFrame(
            [(k, commit) for k in list(range(20)) + [50]], "k long, as_of int"
        )
        got = {
            r["k"]: r["v"]
            for r in pit_join(facts, hist, ["k"], "as_of", ["v"]).collect()
        }
        for k in list(range(20)) + [50]:
            assert got.get(k) == snap.get(k), (commit, k)


def _series(spark):
    # one series, values shaped so min/max/first/last are all distinct
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", [5.0, 9.0, 1.0, 7.0, 3.0][i % 5])
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, val double"
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        F.floor(F.col("val") * 1000 + 0.5).cast("long").alias("v_fx"),
        F.lit("s").alias("series"),
    )


def test_m4_emits_four_roles_per_bucket_with_correct_points(spark):
    df = _series(spark)
    out = m4_downsample(df, ["series"], "ts", "v_fx", 300, "event_id")  # 5-min buckets
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket_s"], {})[r["role"]] = (r["ts_us"], r["v"])
    assert all(set(d) == {"first", "last", "min", "max"} for d in by_bucket.values())
    # first bucket holds minutes 0-4: values 5,9,1,7,3 (×1000)
    b0 = sorted(by_bucket)[0]
    d = by_bucket[b0]
    assert d["min"][1] == 1000 and d["max"][1] == 9000
    assert d["first"][1] == 5000 and d["last"][1] == 3000
    # first/last are the bucket's temporal extremes
    assert d["first"][0] < d["min"][0] < d["last"][0]


def test_m4_deterministic_under_value_ties(spark):
    # two rows with the SAME value in one bucket: min resolves to the
    # earlier ts, max (same value) to the later — by struct order
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10", 42), (2, "2024-01-01 00:00:20", 42)],
        "event_id long, ts_s string, v long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "v",
             F.lit("s").alias("series"))
    out = {r["role"]: r["ts_us"] for r in
           m4_downsample(df, ["series"], "ts", "v", 60, "event_id").collect()}
    assert out["min"] < out["max"]  # earlier wins min, later wins max
    assert out["first"] == out["min"] and out["last"] == out["max"]


def test_m4_plan_is_one_aggregate_no_join_no_window(spark):
    df = _series(spark)
    plan = (
        m4_downsample(df, ["series"], "ts", "v_fx", 300, "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan


def test_embedding_drift_flag_is_exact_and_symmetricish(spark):
    from rds_to_datalake_project_spark.operators.embedding_stats import (
        embedding_drift_report,
    )

    a = spark.createDataFrame(
        [(i, [0.1, 0.5]) for i in range(30)], "id long, v array<double>"
    )
    # dim 0 shifted by +0.06 (> 0.05 threshold), dim 1 by +0.01 (<)
    b = spark.createDataFrame(
        [(i, [0.16, 0.51]) for i in range(30)], "id long, v array<double>"
    )
    got = {r["pos"]: r["drifted"] for r in
           embedding_drift_report(a, b, "v").collect()}
    assert got == {0: True, 1: False}
    # unequal cardinalities: cross-multiplied compare stays exact
    b2 = b.limit(10)
    got2 = {r["pos"]: r["drifted"] for r in
            embedding_drift_report(a, b2, "v").collect()}
    assert got2 == {0: True, 1: False}


def test_dedup_keep_best_semantics(spark):
    from rds_to_datalake_project_spark.operators.dedup import dedup_keep_best

    # clusters: {1,2,3} (chained), {4,5}; 6 is a singleton
    df = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 7), (5, 7), (6, 1)],
        "id long, q long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a_id long, b_id long"
    )
    out = {r["id"]: (r["comp"], r["keeper_id"], r["kept"])
           for r in dedup_keep_best(df, pairs, "id", "q").collect()}
    assert out[1] == (1, 2, False)   # transitive cluster, best q=30 wins
    assert out[2] == (1, 2, True)
    assert out[3] == (1, 2, False)
    assert out[4] == (4, 4, True)    # score tie → lowest id wins
    assert out[5] == (4, 4, False)
    assert out[6] == (6, 6, True)    # singleton keeps itself


def test_pit_join_plan_is_key_equi_join_not_nested_loop(spark):
    facts = spark.range(0, 10000).selectExpr(
        "CAST(id % 50 AS INT) AS k", "CAST(id % 3 AS INT) AS as_of"
    )
    out = pit_join(facts, _intervals(spark), ["k"], "as_of", ["price"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan

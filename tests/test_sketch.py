"""Mergeable sketch layer: HLL registers, CMS counters, maintained
sidecar (operators/sketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.sketch import (
    attach_sketch_maintenance,
    build_sketches,
    cms_counters,
    cms_merge,
    cms_point_estimates,
    hll_estimate,
    hll_merge,
    hll_registers,
    read_sketches,
    refresh_sketches,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

P = 10
M = 1 << P


def _est(registers, p=P) -> int:
    return hll_estimate(registers, p).head()[0]


def test_hll_estimate_within_error_bound(spark):
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    regs = hll_registers(df, "v", p=P, hash_mode="md5")
    assert regs.count() <= M
    est = _est(regs)
    # standard error 1.04/sqrt(m) ~ 3.3%; allow 4 sigma
    assert abs(est - n) / n < 0.13


def test_hll_merge_equals_union_build(spark):
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("v"))
    merged = hll_merge(
        hll_registers(a, "v", p=P), hll_registers(b, "v", p=P)
    )
    direct = hll_registers(a.unionByName(b), "v", p=P)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_duplicates_do_not_move_estimate(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    dup = df.unionByName(df).unionByName(df)
    assert _est(hll_registers(dup, "v", p=P)) == _est(hll_registers(df, "v", p=P))


def test_cms_never_undercounts_and_bounds_overcount(spark):
    # zipf-ish: key k appears k times, k in 1..60
    rows = spark.range(1, 61).select(
        F.explode(F.sequence(F.lit(1), F.col("id"))).alias("rep"),
        F.concat(F.lit("k"), F.col("id")).alias("key"),
    )
    cms = cms_counters(rows, "key", depth=4, width=512)
    keys = rows.select("key").distinct()
    est = cms_point_estimates(cms, keys, "key", depth=4, width=512)
    truth = rows.groupBy("key").agg(F.count("*").alias("true_n"))
    j = est.join(truth, "key").select("key", "est_count", "true_n").collect()
    n_total = sum(r.true_n for r in j)
    for r in j:
        assert r.est_count >= r.true_n, r
        assert r.est_count - r.true_n <= max(4, 4 * n_total // 512), r


def test_cms_merge_and_turnstile_delete(spark):
    a = spark.range(500).select(F.col("id").cast("string").alias("v"))
    b = spark.range(200).select(F.col("id").cast("string").alias("v"))
    built = cms_merge(
        cms_counters(a, "v", depth=3, width=256),
        cms_counters(b, "v", depth=3, width=256),
    )
    direct = cms_counters(a.unionByName(b), "v", depth=3, width=256)
    assert built.exceptAll(direct).count() == 0
    # subtracting b's signed sheet restores exactly a's counters
    neg = cms_counters(b, "v", depth=3, width=256, weight=F.lit(-1).cast("long"))
    restored = cms_merge(built, neg).filter(F.col("cnt") != 0)
    only_a = cms_counters(a, "v", depth=3, width=256)
    assert restored.exceptAll(only_a).count() == 0
    assert only_a.exceptAll(restored).count() == 0


def _mk_table(spark, tmp_path, rows):
    spec = TableSpec(
        "sk", record_key=("id",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec, retain_versions=4)
    df = spark.createDataFrame(rows, "id long, cat string, seq long")
    t.initial_load(df)
    return t


@pytest.mark.slow
def test_sidecar_incremental_matches_rebuild(spark, tmp_path):
    t = _mk_table(spark, tmp_path, [(i, f"c{i % 7}", 0) for i in range(300)])
    build_sketches(t, "cat", p=P, depth=4, width=256)
    # insert new rows + update some categories (no deletes)
    batch = spark.createDataFrame(
        [(i, f"c{i % 11}", 1) for i in range(250, 400)],
        "id long, cat string, seq long",
    ).withColumn("Op", F.lit("U"))
    t.upsert(batch)
    assert refresh_sketches(t, "cat", p=P, depth=4, width=256) == "incremental"
    got = read_sketches(t)
    assert got is not None
    _, cms_inc = got
    cms_fresh = cms_counters(t.read(), "cat", depth=4, width=256)
    assert cms_inc.exceptAll(cms_fresh).count() == 0
    assert cms_fresh.exceptAll(cms_inc).count() == 0
    # second call is a no-op at the same version
    assert refresh_sketches(t, "cat", p=P, depth=4, width=256) == "noop"


def test_sidecar_delete_forces_rebuild(spark, tmp_path):
    t = _mk_table(spark, tmp_path, [(i, f"c{i % 5}", 0) for i in range(100)])
    build_sketches(t, "cat", p=P, depth=4, width=256)
    dels = spark.createDataFrame(
        [(i, f"c{i % 5}", 1) for i in range(50)], "id long, cat string, seq long"
    ).withColumn("Op", F.lit("D"))
    t.upsert(dels, delete_mode="apply")
    assert refresh_sketches(t, "cat", p=P, depth=4, width=256) == "rebuild"
    got = read_sketches(t)
    assert got is not None
    _, cms = got
    fresh = cms_counters(t.read(), "cat", depth=4, width=256)
    assert cms.exceptAll(fresh).count() == 0 and fresh.exceptAll(cms).count() == 0


def test_param_change_forces_rebuild(spark, tmp_path):
    t = _mk_table(spark, tmp_path, [(i, "x", 0) for i in range(10)])
    build_sketches(t, "cat", p=P, depth=4, width=256)
    assert refresh_sketches(t, "cat", p=P, depth=4, width=512) == "rebuild"


def test_attach_maintenance_follows_commits(spark, tmp_path):
    spec = TableSpec(
        "sk2", record_key=("id",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "t2"), spec, retain_versions=4)
    attach_sketch_maintenance(t, "cat", p=P, depth=4, width=256)
    t.initial_load(
        spark.createDataFrame(
            [(i, f"c{i % 3}", 0) for i in range(60)], "id long, cat string, seq long"
        )
    )
    got = read_sketches(t)
    assert got is not None
    hll, cms = got
    est = hll_estimate(hll, P).head()
    assert est[0] == pytest.approx(3, abs=1)
    fresh = cms_counters(t.read(), "cat", depth=4, width=256)
    assert cms.exceptAll(fresh).count() == 0 and fresh.exceptAll(cms).count() == 0


@pytest.mark.slow
def test_histogram_quantiles_brackets_exact_quantile(spark):
    """The p-quantile bracket must contain the true p-quantile, and
    per-slice histograms must merge to the whole-table answer."""
    from pyspark.sql import functions as F

    from rds_to_datalake_project_spark.operators.profile import (
        column_histogram,
        histogram_quantiles,
        merge_histograms,
    )

    vals = list(range(1000))  # uniform 0..999
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = {
        r["p"]: (r["lo_edge"], r["hi_edge"], r["rank"])
        for r in histogram_quantiles(df, "x", 0.0, 1000.0, 20, [50, 90, 99]).collect()
    }
    import math

    for p, (lo, hi, rank) in out.items():
        assert rank == math.ceil(1000 * p / 100)
        true_q = sorted(vals)[rank - 1]
        assert lo <= true_q < hi, (p, lo, hi, true_q)

    # mergeability: two halves fold to the whole
    h_all = column_histogram(df, "x", 0.0, 1000.0, 20)
    h1 = column_histogram(df.filter(F.col("x") < 500), "x", 0.0, 1000.0, 20)
    h2 = column_histogram(df.filter(F.col("x") >= 500), "x", 0.0, 1000.0, 20)
    merged = merge_histograms(h1, h2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, h_all.collect())
    )


def test_grouped_histogram_quantiles(spark):
    """Per-group CDF inversion: each group's bracket contains that
    group's true quantile."""
    import math

    from rds_to_datalake_project_spark.operators.profile import (
        histogram_quantiles,
    )

    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(v * 10)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        (r["g"], r["p"]): (r["lo_edge"], r["hi_edge"], r["rank"], r["total"])
        for r in histogram_quantiles(
            df, "x", 0.0, 1000.0, 20, [50, 90], dims=["g"]
        ).collect()
    }
    data = {"a": list(range(100)), "b": [v * 10 for v in range(100)]}
    for (g, p), (lo, hi, rank, total) in out.items():
        assert total == 100
        assert rank == math.ceil(100 * p / 100)
        true_q = sorted(data[g])[rank - 1]
        assert lo <= true_q < hi, (g, p, lo, hi, true_q)
    assert len(out) == 4

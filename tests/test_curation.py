"""Semantics tests for the curation operators: sequence packing
(budget math, determinism under repartitioning) and contamination
(planted copies must score 1.0, unique text 0.0)."""

from __future__ import annotations

import pyspark.sql.functions as F

from rds_to_datalake_project_spark.operators.contamination import contamination_report
from rds_to_datalake_project_spark.operators.packing import pack_sequences


def _packed(spark, n_buckets=1, budget=100):
    rows = [(i, 30) for i in range(10)]  # 10 docs × 30 tokens
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    return pack_sequences(
        df, key_col="doc_id", token_col=F.col("toks"), budget=budget, n_buckets=n_buckets
    )


def test_packing_bin_math_single_bucket(spark):
    out = _packed(spark).orderBy("bin_id", "bin_offset").collect()
    # 10×30 tokens into 100-token bins: bins hold starts 0,30,60,90 |
    # 120.. — i.e. running start // 100
    starts = [r.bin_id * 100 + r.bin_offset for r in out]
    assert starts == [i * 30 for i in range(10)]
    # every offset is inside the budget
    assert all(0 <= r.bin_offset < 100 for r in out)
    # bins are dense: ids 0..3 (300 tokens total → starts up to 270)
    assert sorted({r.bin_id for r in out}) == [0, 1, 2]


def test_packing_deterministic_under_partitioning(spark):
    a = {(r.doc_id, r.bin_id, r.bin_offset) for r in _packed(spark, n_buckets=4).collect()}
    rows = [(i, 30) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"]).repartition(7, "toks")
    b = {
        (r.doc_id, r.bin_id, r.bin_offset)
        for r in pack_sequences(
            df, key_col="doc_id", token_col=F.col("toks"), budget=100, n_buckets=4
        ).collect()
    }
    assert a == b


def test_packing_bucket_in_high_bits(spark):
    out = _packed(spark, n_buckets=4).collect()
    for r in out:
        assert r.bin_id >> 32 == r.pack_bucket


def test_contamination_planted(spark):
    train_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    # keys chosen so md5-split puts doc 17 and 55 in test at 500‰
    for i in range(60):
        rows.append((i, train_text if i != 55 else "omega psi chi phi upsilon tau sigma rho"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    rep = {
        r.doc_id: r
        for r in contamination_report(df, test_permille=500).collect()
    }
    assert rep, "split put no docs in test — adjust permille"
    for doc_id, r in rep.items():
        if doc_id == 55:
            assert r.contamination == 0.0  # unique text: nothing shared
        else:
            assert r.contamination == 1.0  # exact copy of train text
            assert r.n_sh == r.n_hit == 8  # 10 tokens → 8 tri-shingles

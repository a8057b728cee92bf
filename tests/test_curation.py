"""Semantics tests for the curation operators: sequence packing
(budget math, determinism under repartitioning) and contamination
(planted copies must score 1.0, unique text 0.0)."""

from __future__ import annotations

import pytest
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


def test_chunk_documents_reconstructs_and_bounds(spark):
    """Chunks must concatenate back to the exact original text, every
    chunk must respect the token budget, and re-tokenizing a chunk
    must agree with the slice (no token merges across boundaries)."""
    from rds_to_datalake_project_spark.operators.text import chunk_documents

    rows = [
        (0, "plain words only here"),
        (1, "punct!) and   double  spaces\nnewlines\ttabs 123 mixed456"),
        (2, ""),  # empty doc → one empty chunk
        (3, " leading and trailing "),
        (4, "x" * 50 + " " + "word " * 40),  # forces multiple chunks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, max_tokens=8).collect()
    by_doc = {}
    for r in out:
        assert r.n_chunk_tokens <= 8
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for doc_id, text in rows:
        chunks = [t for _, t in sorted(by_doc[doc_id])]
        assert "".join(chunks) == text, doc_id
    assert by_doc[2] == [(0, "")]
    assert len(by_doc[4]) > 1


def test_mixture_sample_epoch_semantics(spark):
    """epochs=2.x → two full copies plus a deterministic fractional
    top-up; 0.0 → source dropped; default 1.0 → exactly one epoch.
    The top-up must be stable across partitionings."""
    from rds_to_datalake_project_spark.operators.sampling import mixture_sample

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "src"])
    epochs = {"s0": 2.5, "s1": 0.0}
    out = mixture_sample(df, "src", "k", epochs, default_epochs=1.0)
    per = {
        (r.src, r.epoch): r.n
        for r in out.groupBy("src", "epoch").agg(F.count("*").alias("n")).collect()
    }
    assert per[("s0", 0)] == per[("s0", 1)] == 100  # full copies
    assert 20 <= per[("s0", 2)] <= 80  # ~50% md5 top-up
    assert not any(s == "s1" for s, _ in per)  # dropped source
    assert per[("s2", 0)] == 100 and ("s2", 1) not in per  # default 1.0

    # determinism: identical membership under a different partitioning
    again = mixture_sample(df.repartition(13), "src", "k", epochs)
    a = {(r.src, r.epoch, r.k) for r in out.collect()}
    b = {(r.src, r.epoch, r.k) for r in again.collect()}
    assert a == b


@pytest.mark.slow
def test_curate_pipeline_gates_and_dedup(spark, sf_dir):
    """The composed cleaning pass: every gate fires on the planted
    corpus, dedup keeps the min-id survivor, and apply_curation
    materializes exactly the kept set."""
    from rds_to_datalake_project_spark.catalog import load_table
    from rds_to_datalake_project_spark.operators.curate import (
        apply_curation,
        curate_documents,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    corpus = docs.unionByName(planted)
    dec = curate_documents(
        corpus,
        min_alpha_ratio=0.72,
        max_dup_line_ratio=0.2,
        max_top_bigram_ratio=0.05,
    )
    reasons = {
        r.drop_reason: r.n
        for r in dec.groupBy("drop_reason").agg(F.count("*").alias("n")).collect()
    }
    assert "duplicate" in reasons and "lang" in reasons
    # every planted copy whose ORIGINAL was kept is a duplicate; the
    # original keeps (min id wins)
    dup_ids = {r.doc_id for r in dec.filter("drop_reason = 'duplicate'").collect()}
    kept = {r.doc_id for r in dec.filter("keep").collect()}
    for d in dup_ids:
        assert d >= 1_000_000 and (d - 1_000_000) in kept

    out = apply_curation(corpus, dec)
    assert out.count() == dec.filter("keep").count()
    assert {r.doc_id for r in out.select("doc_id").collect()} == kept


def test_weighted_sample_prefers_heavy_rows(spark):
    """A-ES weighted sampling: quota ≥ group size keeps everything;
    with a binding quota, heavy rows are overrepresented and the
    choice is deterministic across reruns."""
    from pyspark.sql import functions as F

    from rds_to_datalake_project_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    # 200 light rows (w=1) + 50 heavy rows (w=100) in one group
    df = spark.range(250).select(
        F.lit("g").alias("g"),
        F.col("id"),
        F.when(F.col("id") < 50, 100.0).otherwise(1.0).alias("w"),
    )
    kept = weighted_sample_per_group(df, "g", "id", "w", quota=40)
    rows = kept.collect()
    assert len(rows) == 40
    heavy = sum(1 for r in rows if r["id"] < 50)
    # heavy rows are 20% of the pool but carry ~96% of the weight;
    # expect a clear majority of the sample (loose bound, no flake)
    assert heavy > 20
    again = weighted_sample_per_group(df, "g", "id", "w", quota=40).collect()
    assert sorted(r["id"] for r in again) == sorted(r["id"] for r in rows)
    # quota covers the pool -> everything with positive weight kept
    all_kept = weighted_sample_per_group(df, "g", "id", "w", quota=500)
    assert all_kept.count() == 250
    # non-positive weights never qualify
    zw = df.withColumn("w", F.when(F.col("id") == 0, 0.0).otherwise(F.col("w")))
    assert weighted_sample_per_group(zw, "g", "id", "w", quota=500).count() == 249

"""Inverted text index: build, search, incremental append, rebuild
triggers (operators/text_index.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.text_index import (
    attach_text_index_maintenance,
    build_text_index,
    read_postings,
    refresh_text_index,
    search_and,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.schema import TableSpec

DOCS0 = [
    (1, "the quick brown fox", 0),
    (2, "the lazy dog sleeps", 0),
    (3, "quick dog runs quick", 0),
]


def _mk(spark, tmp_path, rows=DOCS0):
    spec = TableSpec(
        "d", record_key=("id",), precombine_key="seq", partition_granularity=None
    )
    t = KeyedTable(spark, str(tmp_path / "t"), spec, retain_versions=4)
    t.initial_load(spark.createDataFrame(rows, "id long, text string, seq long"))
    return t


@pytest.mark.slow
def test_search_and_semantics_and_rank(spark, tmp_path):
    t = _mk(spark, tmp_path)
    build_text_index(t, "id", "text")
    got = [(r["id"], r["rank"]) for r in search_and(t, ["quick"]).collect()]
    # doc 3 has tf=2, doc 1 tf=1
    assert got == [(3, 2), (1, 1)]
    got = [r["id"] for r in search_and(t, ["quick", "dog"]).collect()]
    assert got == [3]
    assert search_and(t, ["missing"]).count() == 0
    # case-insensitive query terms
    assert [r["id"] for r in search_and(t, ["QUICK", "Dog"]).collect()] == [3]


@pytest.mark.slow
def test_incremental_append_on_insert_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    build_text_index(t, "id", "text")
    batch = spark.createDataFrame(
        [(4, "brown dog digs", 1)], "id long, text string, seq long"
    ).withColumn("Op", F.lit("U"))
    t.upsert(batch)
    assert refresh_text_index(t, "id", "text") == "incremental"
    assert [r["id"] for r in search_and(t, ["brown", "dog"]).collect()] == [4]
    # postings equal a from-scratch build over the final state
    from rds_to_datalake_project_spark.operators.text_index import postings_of

    fresh = postings_of(t.read(), "id", "text")
    stored = read_postings(t).select(
        F.col("bucket").cast("int").alias("bucket"), "term", "id", "tf"
    )
    assert stored.exceptAll(fresh).count() == 0 and fresh.exceptAll(stored).count() == 0
    assert refresh_text_index(t, "id", "text") == "noop"


def test_update_forces_rebuild_and_search_sees_new_text(spark, tmp_path):
    t = _mk(spark, tmp_path)
    attach_text_index_maintenance(t, "id", "text")
    t.upsert(
        spark.createDataFrame(
            [(1, "silver fox jumps", 1)], "id long, text string, seq long"
        ).withColumn("Op", F.lit("U"))
    )
    # maintenance hook ran on commit; old postings for doc 1 are gone
    assert search_and(t, ["silver"]).count() == 1
    assert [r["id"] for r in search_and(t, ["quick"]).collect()] == [3]


def test_torn_sidecar_refuses_search(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="text index"):
        search_and(t, ["quick"])


def test_bm25_ranking_and_length_normalization(spark, tmp_path):
    """BM25 beats raw-tf rank where it should: a term-stuffed LONG doc
    scores below a focused short one; AND semantics still hold."""
    from rds_to_datalake_project_spark.operators.text_index import bm25_search

    rows = [
        (1, "fox den " + "filler word soup stew broth " * 40, 0),  # long, 1 hit each
        (2, "fox fox den den", 0),  # short, focused
        (3, "fox only no match here", 0),
        (4, "unrelated text entirely", 0),
    ]
    t = _mk(spark, tmp_path, rows)
    build_text_index(t, "id", "text")
    got = [(r["id"], r["score"]) for r in bm25_search(t, ["fox", "den"]).collect()]
    assert [i for i, _s in got] == [2, 1]  # AND excludes 3 and 4; short wins
    assert got[0][1] > got[1][1] > 0.0


@pytest.mark.slow
def test_bm25_follows_incremental_refresh(spark, tmp_path):
    """doclens and postings advance together through the delta publish:
    scores over the refreshed index equal a from-scratch rebuild."""
    from rds_to_datalake_project_spark.operators.text_index import bm25_search

    t = _mk(spark, tmp_path)
    attach_text_index_maintenance(t, "id", "text")
    t.upsert(
        spark.createDataFrame(
            [(4, "quick quick dog", 1), (2, "the lazy dog naps today", 1)],
            "id long, text string, seq long",
        ).withColumn("Op", F.lit("U"))
    )
    incremental = [
        (r["id"], r["score"])
        for r in bm25_search(t, ["quick", "dog"]).collect()
    ]
    # rebuild from scratch over the same final state → identical doubles
    build_text_index(t, "id", "text")
    rebuilt = [
        (r["id"], r["score"])
        for r in bm25_search(t, ["quick", "dog"]).collect()
    ]
    assert incremental == rebuilt
    assert {i for i, _s in incremental} == {3, 4}


def test_search_scans_carry_bucket_partition_filters(spark, tmp_path):
    """Both search paths prune the postings read to the query terms'
    bucket directories — the filter must reach PartitionFilters in the
    executed plan (directory-level pruning, not a post-scan row
    filter)."""
    import re

    from rds_to_datalake_project_spark.operators.text_index import bm25_search

    t = _mk(spark, tmp_path)
    build_text_index(t, "id", "text")
    for df in (search_and(t, ["quick", "dog"]), bm25_search(t, ["quick", "dog"])):
        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and any("bucket" in p and p.strip() for p in pf), plan[:500]

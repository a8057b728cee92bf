"""Inverted-index search driver query: full service lifecycle (build
at load, incremental append on an insert-only CDC batch, pruned
AND-search) hash-checked against a DuckDB twin that recomputes the
postings from the final corpus state from scratch.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import load_table

SEARCH_TERMS = ["vector", "hash", "merge"]


def _scratch(name: str) -> str:
    # Per-PID root: two engine processes (a bench and a correctness
    # sweep) sharing one scratch dir would delete each other's live
    # fixtures mid-read — an orchestration-only hazard, but a real one.
    root = os.path.join(
        tempfile.gettempdir(), f"sg_scratch_{os.getpid()}", name
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    return root


def text_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load 3/4 of the documents corpus with the text-index service
    attached, insert the remaining quarter as a CDC batch (insert-only
    → incremental posting append), then AND-search three terms via the
    pruned posting read. The oracle tokenizes the WHOLE corpus in SQL
    — equal only if build + incremental append + search semantics all
    agree."""
    from rds_to_datalake_project_spark.operators.text_index import (
        attach_text_index_maintenance,
        search_and,
    )
    from rds_to_datalake_project_spark.operators.upsert import KeyedTable
    from rds_to_datalake_project_spark.schema import TableSpec

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.lit(0).cast("long").alias("seq")
    )
    spec = TableSpec(
        "docs_ti",
        record_key=("doc_id",),
        precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, _scratch("text_idx") + "/t", spec, retain_versions=4)
    attach_text_index_maintenance(t, "doc_id", "text")
    t.initial_load(docs.filter(F.col("doc_id") % 4 != 0))
    t.upsert(
        docs.filter(F.col("doc_id") % 4 == 0)
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("Op", F.lit("U"))
    )
    out = search_and(t, SEARCH_TERMS)
    return out.select(F.col("id").alias("doc_id"), "rank").orderBy(
        F.col("rank").desc(), "doc_id"
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in SEARCH_TERMS)

TEXT_SEARCH_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z]+')) AS term
  FROM documents
), posts AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
), hits AS (
  SELECT doc_id, COUNT(DISTINCT term) AS nt,
         CAST(SUM(tf) AS BIGINT) AS rank
  FROM posts WHERE term IN ({_TERMS_SQL})
  GROUP BY 1
)
SELECT doc_id, rank FROM hits
WHERE nt = {len(SEARCH_TERMS)}
ORDER BY rank DESC, doc_id
"""


_BM25_TERMS = sorted(SEARCH_TERMS)


def bm25_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked retrieval from the text-index service
    (operators/text_index.py:bm25_search) after the same
    build + insert-batch lifecycle as text_index_search. Bit-exact
    vs the oracle by design: rational idf (no ln), every float op an
    IEEE double in a fixed expression tree — the SQL twin writes the
    identical tree over a from-scratch postings/doclens recompute, so
    the double scores hash-match bit for bit."""
    return _bm25_serve(spark, sf_dir, _bm25_fixture(spark, sf_dir))


def _bm25_fixture(spark: SparkSession, sf_dir: str):
    from rds_to_datalake_project_spark.operators.text_index import (
        attach_text_index_maintenance,
    )
    from rds_to_datalake_project_spark.operators.upsert import KeyedTable
    from rds_to_datalake_project_spark.schema import TableSpec

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.lit(0).cast("long").alias("seq")
    )
    spec = TableSpec(
        "docs_bm25",
        record_key=("doc_id",),
        precombine_key="seq",
        partition_granularity=None,
    )
    t = KeyedTable(spark, _scratch("bm25_idx") + "/t", spec, retain_versions=4)
    attach_text_index_maintenance(t, "doc_id", "text")
    t.initial_load(docs.filter(F.col("doc_id") % 4 != 0))
    t.upsert(
        docs.filter(F.col("doc_id") % 4 == 0)
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("Op", F.lit("U"))
    )
    return t


def _bm25_serve(spark: SparkSession, sf_dir: str, t) -> DataFrame:
    from rds_to_datalake_project_spark.operators.text_index import bm25_search

    out = bm25_search(t, _BM25_TERMS)
    return out.select(F.col("id").alias("doc_id"), "score").orderBy(
        F.col("score").desc(), "doc_id"
    )


def _bm25_term_sql(tf_col: str, term: str) -> str:
    df_q = f"(SELECT df FROM dfs WHERE term = '{term}')"
    avgdl = "(CAST(g.tot AS DOUBLE) / CAST(g.n AS DOUBLE))"
    return (
        f"((CAST(g.n - {df_q} AS DOUBLE) + 0.5e0)"
        f" / (CAST({df_q} AS DOUBLE) + 0.5e0))"
        f" * ((CAST(h.{tf_col} AS DOUBLE) * (1.2e0 + 1.0e0))"
        f" / (CAST(h.{tf_col} AS DOUBLE)"
        f" + 1.2e0 * (0.25e0 + 0.75e0 * (CAST(d.dl AS DOUBLE) / {avgdl}))))"
    )


_BM25_TF_CASES = "\n".join(
    f"         MAX(CASE WHEN term = '{t}' THEN tf END) AS tf{i},"
    for i, t in enumerate(_BM25_TERMS)
)
_BM25_SCORE = "\n       + ".join(
    _bm25_term_sql(f"tf{i}", t) for i, t in enumerate(_BM25_TERMS)
)

BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z]+')) AS term
  FROM documents
), posts AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
), dls AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM posts GROUP BY 1
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tot FROM dls
), dfs AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM posts WHERE term IN ({_TERMS_SQL}) GROUP BY 1
), hit AS (
  SELECT doc_id,
         COUNT(DISTINCT term) AS nt,
{_BM25_TF_CASES}
         1 AS __pad
  FROM posts WHERE term IN ({_TERMS_SQL}) GROUP BY 1
)
SELECT h.doc_id,
       {_BM25_SCORE} AS score
FROM hit h JOIN dls d USING (doc_id) CROSS JOIN g
WHERE h.nt = {len(_BM25_TERMS)}
ORDER BY score DESC, doc_id
"""


def fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join: BUILDING-segment customer names within
    1 edit of each other, via the FastSS deletion-neighborhood
    equi-join (operators/fuzzyjoin.py) — never an all-pairs kernel.
    The oracle IS the all-pairs levenshtein (exact by construction),
    so hash-equality proves the banded plan has 100% recall AND
    precision; the hash mode only shapes candidates, which the exact
    verify collapses, so the prod xxhash64 path is directly
    oracle-checkable (unlike the MinHash family)."""
    from rds_to_datalake_project_spark.operators.fuzzyjoin import fuzzy_self_join

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    pairs = fuzzy_self_join(cust, "c_custkey", "c_name", max_dist=1)
    return pairs.select(
        F.col("a_id").alias("a_custkey"),
        F.col("b_id").alias("b_custkey"),
        "dist",
    ).orderBy("a_custkey", "b_custkey")


FUZZY_CUSTOMER_SQL = """
WITH c AS (
  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT a.c_custkey AS a_custkey,
       b.c_custkey AS b_custkey,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
FROM c a JOIN c b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a_custkey, b_custkey
"""


def entity_resolution_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage end to end: FastSS fuzzy edges + min-label
    connected components (operators/fuzzyjoin.py:resolve_entities) —
    every BUILDING customer labeled with its canonical entity. The
    oracle recomputes the all-pairs edge set and closes it with a
    recursive CTE, so candidate recall, the exact verify, AND the
    transitive closure are all hash-proved together."""
    from rds_to_datalake_project_spark.operators.fuzzyjoin import resolve_entities

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    out = resolve_entities(cust, "c_custkey", "c_name", max_dist=1)
    return out.select("c_custkey", "entity_id").orderBy("c_custkey")


ENTITY_RESOLUTION_SQL = """
WITH RECURSIVE c AS (
  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
), pairs AS (
  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id
  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1
), sym AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL
  SELECT b_id AS src, a_id AS dst FROM pairs
), reach(id, r) AS (
  SELECT src, src FROM sym GROUP BY src
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
), comp AS (
  SELECT id, MIN(r) AS comp FROM reach GROUP BY id
)
SELECT c.c_custkey, COALESCE(comp.comp, c.c_custkey) AS entity_id
FROM c LEFT JOIN comp ON c.c_custkey = comp.id
ORDER BY c.c_custkey
"""


QUERIES = {
    "text_index_search": text_index_search,
    "bm25_text_search": bm25_text_search,
    "fuzzy_customer_pairs": fuzzy_customer_pairs,
    "entity_resolution_customers": entity_resolution_customers,
}
ORACLES = {
    "text_index_search": TEXT_SEARCH_SQL,
    "bm25_text_search": BM25_SQL,
    "fuzzy_customer_pairs": FUZZY_CUSTOMER_SQL,
    "entity_resolution_customers": ENTITY_RESOLUTION_SQL,
}

# build/serve split for the bench's lifecycle attribution (see
# plans/cdc.py PHASES).
PHASES = {
    "bm25_text_search": (_bm25_fixture, _bm25_serve),
}

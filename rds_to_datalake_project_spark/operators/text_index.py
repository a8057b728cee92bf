"""Persisted inverted text index — keyword search over a lake table
without scanning the corpus.

The search-side analog of the other table services (zone map, bloom,
LSH, ANN): a ``<table>/.textindex`` sidecar holding the posting table
``(bucket, term, id, tf)``, hive-partitioned by a 256-way term-hash
``bucket`` so an N-term query prunes to ≤N partition directories at
the file-listing level and pushes ``term IN (...)`` into the parquet
scan. Query cost ∝ the queried terms' posting lists — never the
corpus.

Tokenization matches the text-operator family (operators/text.py):
lowercase, ``[^a-z]+`` splits, empties dropped — so the DuckDB twin
(``regexp_split_to_array``) reproduces postings bit-for-bit.

Maintenance: the sidecar follows the epoch-stamped torn-build
protocol with DELTA FAMILIES (operators/sidecar.py): every change
window — inserts, updates, AND deletes — refreshes incrementally by
publishing the window's postings as a new delta part plus a
touched-id tombstone (cost ∝ batch). A deleted/updated document's old
postings are removed LOGICALLY: readers merge base+deltas and drop
rows tombstoned by a later generation, so no bucket is ever
physically rewritten until the chain compacts (every
DEFAULT_COMPACT_THRESHOLD refreshes).

AND-search semantics: a document matches when it contains EVERY query
term; rank = Σ tf over the query terms (ties broken by id). Scale:
the per-term posting read is a pruned scan; the AND is one
``groupBy(id)`` over ≤ |terms| posting lists.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.sidecar import (
    clear_delta_log,
    family_consistent,
    publish_family_delta,
    read_family,
    write_part,
    write_state,
)
from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.operators.zonemap import (
    _read_small,
    _write_small,
)

_INDEX_DIR = ".textindex"
N_BUCKETS = 256


def _idir(table: KeyedTable) -> str:
    return f"{table.path}/{_INDEX_DIR}"


def _term_bucket(term) -> F.Column:
    # md5-based so the oracle twin can address the same buckets
    return (
        F.conv(F.substring(F.md5(term.cast("binary")), 1, 15), 16, 10).cast("long")
        % N_BUCKETS
    ).cast("int")


def postings_of(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(bucket, term, id, tf)`` posting rows for a document frame —
    one map-side explode + one (term, id) aggregation."""
    toks = F.explode(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+")
    ).alias("term")
    flat = df.select(F.col(id_col).alias("id"), toks).filter(F.col("term") != "")
    return (
        flat.groupBy("term", "id")
        .agg(F.count("*").alias("tf"))
        .select(
            _term_bucket(F.col("term")).alias("bucket"), "term", "id", "tf"
        )
    )


def build_text_index(table: KeyedTable, id_col: str, text_col: str) -> None:
    """Full (re)build over the current snapshot, partitioned by term
    bucket for directory-level pruning at query time."""
    spark = table.spark
    latest = (table.versions() or [0])[-1]
    epoch = uuid.uuid4().hex
    posts = postings_of(table.read(), id_col, text_col).withColumn(
        "bucket", F.col("bucket").cast("string")  # partition cols read as strings
    )
    write_part(
        spark, _idir(table), "postings", posts, epoch, partition_by=["bucket"]
    )
    clear_delta_log(spark, _idir(table), "postings")  # rebuild = flat layout
    _write_small(spark, f"{_idir(table)}/_PARAMS", f"{id_col} {text_col}")
    write_state(spark, _idir(table), latest, epoch)


def _stored_params(table: KeyedTable) -> tuple[str, str] | None:
    txt = _read_small(table.spark, f"{_idir(table)}/_PARAMS")
    parts = (txt or "").split()
    return (parts[0], parts[1]) if len(parts) == 2 else None


def read_postings(table: KeyedTable) -> DataFrame | None:
    """The merged posting relation (base ∪ deltas, tombstones applied)
    IF the sidecar is consistent, else None."""
    state = family_consistent(table.spark, _idir(table), "postings")
    if state is None:
        return None
    return read_family(
        table.spark, _idir(table), "postings", "id", gens=state[2]
    )


def refresh_text_index(table: KeyedTable, id_col: str, text_col: str) -> str:
    """Bring the index to the table's latest commit by publishing the
    change window as a delta: the window's postings (inserts and the
    NEW text of updates) plus a tombstone of every touched id — so
    updates and deletes are as incremental as inserts, and refresh I/O
    is ∝ batch. Returns ``"noop" | "incremental" | "rebuild"``."""
    spark = table.spark
    if not table.retain_versions:
        build_text_index(table, id_col, text_col)
        return "rebuild"
    latest = (table.versions() or [0])[-1]
    state = family_consistent(spark, _idir(table), "postings")
    if (
        state is None
        or _stored_params(table) != (id_col, text_col)
        or state[0] not in (table.readable_versions() or [])
    ):
        build_text_index(table, id_col, text_col)
        return "rebuild"
    if state[0] >= latest:
        return "noop"
    v0, epoch, gens = state
    changes = table.table_changes(v0, latest)
    added = postings_of(
        changes.filter(F.col("_change_type") != "delete"), id_col, text_col
    ).withColumn("bucket", F.col("bucket").cast("string"))
    publish_family_delta(
        spark,
        _idir(table),
        "postings",
        added,
        changes.select(F.col(id_col).alias("id")),
        "id",
        latest,
        epoch,
        gens,
        partition_by=["bucket"],
    )
    return "incremental"


def attach_text_index_maintenance(
    table: KeyedTable, id_col: str, text_col: str
) -> None:
    """Enroll the inverted index in the post-commit maintenance slot."""
    table.add_maintenance_hook(
        lambda t: refresh_text_index(t, id_col, text_col)
    )


def search_and(
    table: KeyedTable, terms: list[str], limit: int | None = None
) -> DataFrame:
    """Documents containing EVERY term, ranked by Σ tf descending
    (tie-break: id ascending). ``(id, rank)``; raises if the sidecar
    is missing/torn — search never silently degrades to a corpus
    scan."""
    if not terms:
        raise ValueError("terms must be non-empty")
    want = sorted({t.lower() for t in terms})
    posts = read_postings(table)
    if posts is None:
        raise ValueError("text index missing or torn — build_text_index first")
    # bucket filter prunes partition dirs; term filter pushes to parquet
    hits = posts.filter(
        F.col("bucket").isin([str(_bucket_py(t)) for t in want])
        & F.col("term").isin(want)
    )
    matched = (
        hits.groupBy("id")
        .agg(
            F.countDistinct("term").alias("__nt"),
            F.sum("tf").alias("rank"),
        )
        .filter(F.col("__nt") == len(want))
        .select("id", "rank")
        .orderBy(F.col("rank").desc(), F.col("id"))
    )
    return matched.limit(limit) if limit else matched


def _bucket_py(term: str) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % N_BUCKETS

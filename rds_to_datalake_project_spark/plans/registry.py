"""Unified query registry — the engine's declared surface.

QUERIES: name -> (SparkSession, sf_dir) -> DataFrame
ORACLES: name -> DuckDB-compatible ANSI SQL (omitted for ops with no
         cross-engine twin; those get rows-only driver checks).
"""

from __future__ import annotations

from rds_to_datalake_project_spark.plans import (
    cdc,
    curation,
    extensions,
    relational,
    tpch_extra,
)

_MODULES = (relational, cdc, extensions, tpch_extra, curation)

# The driver's correctness report covers the FIRST 50 registry entries only.
# Queries that have not yet earned a driver-side green row are listed here so
# they land inside that window; long-green queries rotate to the tail (their
# r1/r2 rows remain on record and pytest still covers them every round).
_PRIORITY = (
    # new round 5, oracle-backed — no driver-green row yet
    "media_decode_stats",
    "lake_table_changes",
    "sql_timetravel_changed_counts",
    "hilbert_key_orders",
    "chunk_documents_windows",
    "mixture_sample_counts",
    "zonemap_pruned_scan",
    "tfidf_top_terms",
    "sq8_ann_topk",
    "hot_order_customers",
    "ngram_containment_md5",
    "ngram_containment_neardup",
    "media_resize_stats",
    "bpe_merge_pairs",
    "curate_documents_decisions",
    # implementation changed in round 5 (shared versioned fixture /
    # scratch dirs / publish-protocol rework) — re-confirm even though
    # r4-green
    "time_travel_roundtrip",
    "cdc_upsert_roundtrip",
    "jsonl_roundtrip",
    "delete_apply_roundtrip",
    "hypertable_rollup",
    # rows-only by contract; keep the weaker check in-window
    "ivf_trained_topk",
    # stalest greens (r1/r2 windows only) — rotate through for fresh rows
    "lang_id",
    "doc_fingerprint",
    "text_quality",
    "repetition_quality",
    "pii_scrub",
    "token_count_by_source",
    "exact_dedup_docs",
    "ann_topk_cosine",
    "neardup_cosine_pairs",
    "neardup_components",
    "zorder_key_orders",
    "media_feature_extract",
    "video_frame_plan",
    "ivf_probe_topk",
    # r3-green only — next stalest tier
    "sample_docs_per_source",
    "train_test_split_counts",
    "pack_documents",
    "contamination_docs",
    "q8_market_share",
    "q9_profit_by_nation",
    "q13_customer_distribution",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q21_sole_return_supplier",
    "q22_inactive_high_balance",
)

_ALL_QUERIES = {k: v for m in _MODULES for k, v in m.QUERIES.items()}
ORACLES = {k: v for m in _MODULES for k, v in m.ORACLES.items()}

# Every priority name must exist — a typo or an unbuilt promise here
# would silently fall out of the driver's 50-query window (VERDICT r3
# "What's wrong" #2).
_missing = set(_PRIORITY) - set(_ALL_QUERIES)
assert not _missing, f"_PRIORITY names without implementations: {sorted(_missing)}"

QUERIES = {k: _ALL_QUERIES[k] for k in _PRIORITY}
QUERIES.update(_ALL_QUERIES)

assert set(ORACLES) <= set(QUERIES), "oracle without a query implementation"

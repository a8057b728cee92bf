#!/usr/bin/env python
"""Headline benchmark: run the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization via a count over the
result (the driver-side collect cost is excluded on purpose — we are
measuring plan execution, not row serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q5_region_revenue",
    "q14_promo_revenue",
    "top_customers_per_nation",
    "order_priority_stats",
    "customers_without_orders",
    "windowed_counts",
    "dedup_latest_per_key",
    "partition_enrich",
    "cdc_upsert_roundtrip",
    # round-12: two writers race disjoint CDC slices into one table
    # through the optimistic commit protocol (build = threaded
    # upserts incl. any conflict-retry merges; serve = table read)
    "concurrent_upsert_convergence",
    "sessionize_events",
    "asof_user_state",
    "range_join_promo_windows",
    "hypertable_rollup",
    "exact_dedup_docs",
    "text_quality",
    "token_count_by_source",
    "ann_topk_cosine",
    "minhash_neardup",
    "simhash_neardup",
    # round-5 flagships
    "zonemap_pruned_scan",
    "tfidf_top_terms",
    "sq8_ann_topk",
    "bpe_merge_pairs",
    "curate_documents_decisions",
    "media_resize_stats",
    # round-7 index/DML services (full lifecycle: build + CDC commit +
    # incremental refresh + serve) — the reference's always-on Athena
    # point-query surface (rds_to_datalake/athena.py:67-87)
    "bloom_pruned_lookup",
    "indexed_point_lookup",
    # the xxhash64 prod path (the md5 twin exists for the correctness
    # window; its hash family costs ~10x and would bench the oracle
    # compatibility layer, not the service)
    "lsh_index_screen",
    "ann_index_served_topk",
    "ann_index_ivf_topk",
    "sql_dml_roundtrip",
    # round-8 surfaces: mergeable sketches, gap-fill, behavioral
    # analytics, weighted sampling, interval-overlap join
    "hll_estimate_users_md5",
    "cms_heavy_hitters_md5",
    "gapfill_hourly_events",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "weighted_sample_docs",
    "overlap_user_promo_spans",
    # round-8 fourth wave: fuzzy matching / graph / temporal / reshaping
    "fuzzy_customer_pairs",
    "entity_resolution_customers",
    "pagerank_trade_graph",
    # time_travel_roundtrip FIRST: it shares the session-cached
    # _versioned_orders fixture with scd2_orders_history, so the table
    # build (load + two upserts at sf0.1) lands on this row and the
    # SCD row then measures history reconstruction alone (VERDICT r8
    # plan-audit note — 17.98 s was ~90% fixture).
    "time_travel_roundtrip",
    # round-12: RESTORE (rollback-as-a-commit) — build = half-size
    # versioned load + 2 commits + the rollback commit; serve = head read
    "restore_table_roundtrip",
    "dv_delete_roundtrip",
    "clone_table_roundtrip",
    "scd2_orders_history",
    # round-9: point-in-time join (shares the versioned fixture), M4
    # downsampling, non-key point lookup via the secondary index
    "pit_lineitem_price",
    "m4_downsample_events",
    "secondary_index_lookup",
    "secondary_index_range_scan",
    "bm25_text_search",
    "embedding_dim_drift",
    "replicated_orders_checksums",
    "stream_replicated_orders_checksums",
    "join_matview_nation_revenue",
    # round-11: LEFT-join IVM (dangling orders move into the NULL
    # group) — build = two-table load + one commit per side + two
    # hook refreshes; serve = view read
    "left_join_matview_revenue",
    # round-11: delta-merge IVM — refresh I/O ∝ change window, never
    # the base; build = load + commit + full & delta refreshes
    "delta_matview_priority_revenue",
    "chain_matview_region_revenue",
    # round-12: zone-pruned recompute refresh — skips dict shows base
    # files read ∝ the change window's touched date zones
    "pruned_matview_refresh",
    # round-12: signed-delta JOIN IVM (both feeds churn in one window,
    # −ΔΔ correction) and min/max delta with extremum repair
    "delta_join_matview_nation_revenue",
    "delta_chain_matview_region_revenue",
    "minmax_delta_matview_prices",
    "distinct_delta_matview_custcount",
    # round-12 late: aggregate navigation — the serve is a GROUP BY
    # SELECT over the base name answered from the view store (skips
    # dict shows the rewrite decision)
    "matview_rewrite_rollup",
    # round-12 late: signed-delta LEFT-join IVM (dangling transitions
    # via match-count flips; one multi-commit both-feeds window)
    "left_delta_matview_revenue",
    # round-12 third wave: workload-driven view advisor — build runs
    # an unserved workload, RECOMMENDs, executes the DDL; serve is the
    # workload query answered from the recommended view's store
    "matview_advisor_loop",
    "image_ahash_neardups",
    "audio_hash_neardups",
    "rolling_anomaly_hours",
    "time_weighted_value",
    "histogram_quantiles_price",
    "revenue_cube",
]


def _skip_stats() -> dict:
    """Per-query I/O-avoided counters, read from the operator modules'
    last-probe recorders. Wall time at sf0.1 can't show what an index
    buys at 100× — files/cells/buckets skipped can."""
    from rds_to_datalake_project_spark.operators import (
        ann_index,
        bloomfilter,
        matview,
        replicate,
        secondary_index,
        text_index,
        zonemap,
    )

    def _reset_all():
        bloomfilter.reset_prune_stats()
        matview.reset_refresh_stats()
        zonemap.reset_prune_stats()
        ann_index.reset_probe_stats()
        secondary_index.reset_probe_stats()
        text_index.reset_search_stats()
        replicate.reset_apply_stats()

    return _reset_all, {
        "bloom_pruned_lookup": lambda: dict(bloomfilter.LAST_PRUNE),
        "indexed_point_lookup": lambda: {
            "bloom": dict(bloomfilter.LAST_PRUNE),
            "zone": dict(zonemap.LAST_PRUNE),
        },
        "zonemap_pruned_scan": lambda: dict(zonemap.LAST_PRUNE),
        "ann_index_ivf_topk": lambda: dict(ann_index.LAST_PROBE),
        "secondary_index_lookup": lambda: dict(secondary_index.LAST_PROBE),
        "secondary_index_range_scan": lambda: dict(secondary_index.LAST_PROBE),
        "bm25_text_search": lambda: dict(text_index.LAST_SEARCH),
        "replicated_orders_checksums": lambda: dict(replicate.LAST_APPLY),
        "join_matview_nation_revenue": lambda: dict(matview.LAST_REFRESH),
        "left_join_matview_revenue": lambda: dict(matview.LAST_REFRESH),
        "delta_matview_priority_revenue": lambda: dict(matview.LAST_REFRESH),
        "chain_matview_region_revenue": lambda: dict(matview.LAST_REFRESH),
        "delta_join_matview_nation_revenue": lambda: dict(
            matview.LAST_REFRESH
        ),
        "minmax_delta_matview_prices": lambda: dict(matview.LAST_REFRESH),
        "delta_chain_matview_region_revenue": lambda: dict(
            matview.LAST_REFRESH
        ),
        "distinct_delta_matview_custcount": lambda: dict(
            matview.LAST_REFRESH
        ),
        "pruned_matview_refresh": lambda: {
            "refresh": dict(matview.LAST_REFRESH),
            "zone": dict(zonemap.LAST_PRUNE),
        },
        "stream_replicated_orders_checksums": lambda: dict(replicate.LAST_APPLY),
        "matview_rewrite_rollup": _rewrite_decision,
        "left_delta_matview_revenue": lambda: dict(matview.LAST_REFRESH),
    }


def _rewrite_decision() -> dict:
    from rds_to_datalake_project_spark import rewrite

    hit = rewrite.LAST_SELECT_REWRITE
    return {"rewrite": None if hit is None else
            {k: hit[k] for k in ("view", "mode")}}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # --repeat N (or SPARK_GRAFT_REPEAT): re-run each lifecycle SERVE
    # phase N times and report the median as serve_s_median (build runs
    # once — it mutates fixture state). Host wall-clock drifts ±30%
    # within a day (verify skill, r11), which made single-sample
    # serve walls useless as a regression signal; the median of >=3
    # runs is stable. Default 1 keeps the driver's invocation shape.
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "1"))
    argv = sys.argv[1:]
    if "--repeat" in argv:
        repeat = int(argv[argv.index("--repeat") + 1])
    repeat = max(1, repeat)

    from rds_to_datalake_project_spark.plans.registry import QUERIES
    from rds_to_datalake_project_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # no \r-progress bars in captured bench output (the driver
        # stores the tail of this run verbatim in BENCH_r{N}.json)
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # Warm the JVM/codegen path once so q1 doesn't pay session startup,
    # and the parquet write-committer path so the first writing query
    # (cdc_upsert_roundtrip) doesn't pay one-time class loading — both
    # are session costs, not plan-execution costs.
    QUERIES["order_priority_stats"](spark, sf_dir).count()
    import shutil
    import tempfile

    warm_dir = os.path.join(tempfile.gettempdir(), "sg_bench_warm")
    shutil.rmtree(warm_dir, ignore_errors=True)
    spark.range(1).write.mode("overwrite").parquet(warm_dir)
    shutil.rmtree(warm_dir, ignore_errors=True)

    from rds_to_datalake_project_spark.plans.registry import PHASES

    timings: dict[str, float] = {}
    phases: dict[str, dict] = {}
    skips: dict[str, dict] = {}
    reset_skip_stats, skip_sources = _skip_stats()
    for name in HEADLINE:
        reset_skip_stats()
        # Drift hygiene: drop any cached relations a prior query left
        # behind so each row starts from the same session state (the
        # r8→r9 uniform ~1.10x drift tracked suite growth, not code).
        spark.catalog.clearCache()
        # Guide §1.5: label every row's jobs so event logs / the UI
        # attribute work to the bench row that scheduled it.
        spark.sparkContext.setJobDescription(f"bench: {name}")
        if name in PHASES:
            # Lifecycle rows report build (fixture + commits + index
            # maintenance — one-time, amortized) and serve (the probe
            # under test — the recurring cost) separately: a serving
            # regression must not hide inside the build wall.
            build, serve = PHASES[name]
            t0 = time.perf_counter()
            handle = build(spark, sf_dir)
            build_s = round(time.perf_counter() - t0, 4)
            t1 = time.perf_counter()
            df = serve(spark, sf_dir, handle)
            n = df.count()
            serve_s = round(time.perf_counter() - t1, 4)
            timings[name] = round(build_s + serve_s, 4)
            phases[name] = {"build_s": build_s, "serve_s": serve_s}
            if repeat > 1:
                import statistics

                serves = [serve_s]
                for _ in range(repeat - 1):
                    tr = time.perf_counter()
                    try:
                        serve(spark, sf_dir, handle).count()
                    except Exception:
                        break  # non-re-runnable serve: median from what ran
                    serves.append(round(time.perf_counter() - tr, 4))
                phases[name]["serve_s_median"] = round(
                    statistics.median(serves), 4
                )
            tail = f" (build {build_s:.3f}s, serve {serve_s:.3f}s)"
        else:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
            tail = ""
        if name in skip_sources:
            skips[name] = skip_sources[name]()
        spark.sparkContext.setJobDescription(None)
        print(
            f"# {name}: {n} rows in {timings[name]:.3f}s{tail}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    # Output contract (r12 VERDICT "Next round" #1): the driver keeps
    # only the LAST 2000 chars of stdout, and a single JSON line
    # carrying all 76 query names + seconds is >=2.3 KB (the names
    # alone sum to ~1.6 KB), so "one compact line with queries" cannot
    # mathematically fit. Layout chosen instead:
    #   1. the full contract line (metric/value/unit/queries/sf) — the
    #      ONE JSON line of the published contract, greppable from the
    #      stored log; phases/skips move to stderr (they were the bulk
    #      of the 7 KB r12 line);
    #   2. one compact {"query": name, "sec": s} line per query — the
    #      VERDICT's grep-chunk fallback; placed AFTER the full line so
    #      the 2000-char tail window carries the last ~45 of them for
    #      tail-only parsers (r12 tail carried zero per-query data);
    #   3. the compact total line LAST — always fits, always parses.
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )
    print(
        json.dumps({"phases": phases, "skips": skips}, separators=(",", ":")),
        file=sys.stderr,
    )
    for name in HEADLINE:
        if name in timings:
            print(
                json.dumps(
                    {"query": name, "sec": timings[name]},
                    separators=(",", ":"),
                )
            )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

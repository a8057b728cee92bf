"""Zone maps — per-file min/max statistics for scan-time file skipping.

What Delta/Iceberg keep in their transaction-log / manifest stats
(SURVEY.md §4 "Upsert physical strategy": "file-skipping by min/max
stats"), re-expressed for the engine's plain-parquet lake tables: a
tiny parquet sidecar under ``<table>/.zonemap`` holding one row per
data file with min / max / row count for the indexed columns. A read
with a range or point predicate consults the sidecar and hands Spark
the exact list of files whose [min, max] zones intersect the
predicate — files the index proves out of range are never opened.
Parquet row-group stats still prune WITHIN each opened file; the zone
map prunes the file SET, which at 100 TB is the difference between
touching ~800k file footers and reading a sub-megabyte index. The
payoff compounds with the clustering passes (operators/compact.py
``cluster_by``: Hilbert / Z-order range repartition): clustered files
own narrow value ranges, so zones are tight and most files drop out.

Correctness stance — the index is ADVISORY:

- Files present on disk but absent from the index are ALWAYS read, so
  a stale or partial index (crash mid-build, files appended since)
  degrades to reading more files, never to row loss. Spark part-file
  names are globally unique (task UUIDs), so an index row can never
  describe a *different* file of the same name.
- Pruning drops a file only when the predicate interval provably
  misses [min, max]. An all-null zone (min/max NULL) is droppable for
  range predicates: a comparison with NULL is never true.
- Bounds are evaluated by Spark expressions over the stats frame (not
  Python comparisons), so type coercion matches the main scan's
  semantics exactly.

The build is one column-pruned distributed aggregation (only the
indexed columns are read) grouped by ``input_file_name()`` — no data
rows ever reach the driver; the collect is one row per pruned-in
file, the same driver-side footprint as Delta's log replay.
"""

from __future__ import annotations

import json
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rds_to_datalake_project_spark import fsio

_FILE = "file_uri"

# Diagnostics: CUMULATIVE zoned-read pruning verdicts since
# reset_prune_stats() — what bench.py reports as the index's
# I/O-avoided metric, which wall time at small SF can't show.
LAST_PRUNE: dict = {}


def reset_prune_stats() -> None:
    LAST_PRUNE.clear()


def _record_prune(files_total: int, files_read: int) -> None:
    LAST_PRUNE["probes"] = LAST_PRUNE.get("probes", 0) + 1
    LAST_PRUNE["files_total"] = LAST_PRUNE.get("files_total", 0) + files_total
    LAST_PRUNE["files_read"] = LAST_PRUNE.get("files_read", 0) + files_read
    LAST_PRUNE["files_skipped"] = (
        LAST_PRUNE["files_total"] - LAST_PRUNE["files_read"]
    )


def _index_dir(table_path: str) -> str:
    return f"{table_path.rstrip('/')}/.zonemap"


def _norm(uri: str) -> str:
    """file:///a, file:/a and /a all name the same local path."""
    parsed = urlparse(uri)
    return parsed.path if parsed.scheme else uri


def build_zonemap(
    spark: SparkSession,
    table_path: str,
    columns: list[str],
    index_dir: str | None = None,
) -> None:
    """(Re)build the zone-map sidecar for ``columns``.

    One distributed scan reading only the indexed columns; output is
    one row per data file: ``file_uri, n_rows, min_<c>, max_<c> ...``.
    Written with overwrite into a dot-dir, which every table reader
    skips, so the index never shadows table data.
    """
    # Only the conf + the frame — no file-map here (the inputFiles()
    # enumeration _resolve_table does would be a wasted full listing
    # on every index build).
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
    df = spark.read.option("mergeSchema", "true").parquet(table_path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    stats = (
        df.select(*columns)
        .withColumn(_FILE, F.input_file_name())
        .groupBy(_FILE)
        .agg(*aggs)
    )
    # A handful of KB: one output file keeps the read side a single
    # footer fetch.
    stats.coalesce(1).write.mode("overwrite").parquet(
        index_dir or _index_dir(table_path)
    )


def zonemap_stats(spark: SparkSession, table_path: str, index_dir: str | None = None) -> DataFrame:
    return spark.read.parquet(index_dir or _index_dir(table_path))


def _zone_intersects(col: str, lo, hi) -> F.Column:
    """Zone [min_c, max_c] can contain a value in [lo, hi] (either
    bound may be None = unbounded). NULL min/max (all-null zone) make
    the conjunction NULL → filtered out → file skipped, which is safe
    for range predicates (see module docstring)."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(f"max_{col}") >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(f"min_{col}") <= F.lit(hi))
    return cond


def _resolve_table(spark: SparkSession, table_path: str):
    """One listing+schema resolution of the table, shared by every
    zoned operation (a second resolution would double the metadata
    cost the index exists to avoid). Partition values must round-trip
    as the strings the layout encodes — mirror KeyedTable.read().

    Memoized per (path, commit token) in the KeyedTable read-plan
    cache: the token is rewritten as the last metadata step of every
    live-tree mutation BEFORE any maintenance/probe can observe the
    new tree, so a hit always describes the current committed
    snapshot; token-less paths resolve fresh every call (see
    upsert.resolve_cache_entry). Metadata only — the frame still
    reads its parquet files on every action."""
    from rds_to_datalake_project_spark.operators.upsert import (
        resolve_cache_entry,
    )

    ent = resolve_cache_entry(spark, table_path)
    if ent is not None:
        hit = ent["frames"].get("zresolve")
        if hit is not None:
            return hit
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
    full = spark.read.option("mergeSchema", "true").parquet(table_path)
    out = (full, {_norm(f): f for f in full.inputFiles()})
    if ent is not None:
        ent["frames"]["zresolve"] = out
    return out


def _read_small(spark: SparkSession, path: str) -> str | None:
    """Tiny marker-file read — fsio routes local paths to native I/O
    and real schemes (hdfs://, s3a://) through Hadoop."""
    return fsio.read_text(spark, path)


def _write_small(spark: SparkSession, path: str, text: str) -> None:
    fsio.write_text(spark, path, text)


def _index_is_synced(spark: SparkSession, table_path: str, index_dir: str) -> bool:
    """True when the sidecar PROVABLY reflects the current live file
    set, making its file list a manifest that replaces the O(files)
    directory listing: the table writes a fresh opaque token to
    ``.meta/_SEQ`` BEFORE any live-tree mutation
    (KeyedTable._bump_seq), and refresh_zonemap stamps the token it
    observed into ``<index>/_SYNC`` after reconciling. Matching tokens
    ⇒ no mutation since the reconcile ⇒ index rows == live files
    (single-writer publish protocol). Any mismatch or absence — plain
    directories, crashed publishes, out-of-band file drops — falls
    back to a real listing, so the advisory correctness contract is
    unchanged; only the metadata cost differs."""
    seq = _read_small(spark, f"{table_path.rstrip('/')}/.meta/_SEQ")
    if seq is None or not seq.strip():
        return False
    sync = _read_small(spark, f"{index_dir}/_SYNC")
    return sync is not None and sync.strip() == seq.strip()


def _plan_zoned_read(
    spark: SparkSession,
    table_path: str,
    predicates: dict[str, tuple],
    index_dir: str | None = None,
    _resolved=None,
):
    """Shared planner: ``(files_to_read, n_skipped, full_df_or_None)``.

    ONE collect of ``(file, kept)`` pairs resolves the whole index —
    the kept flag and the indexed set come from the same pass. When
    the index is token-synced (see _index_is_synced) the indexed set
    doubles as the live-set manifest and no directory listing happens
    at all; ``full`` comes back None in that case."""
    idx = index_dir or _index_dir(table_path)
    try:
        stats = spark.read.parquet(idx)
    except Exception:
        full, live = _resolved or _resolve_table(spark, table_path)
        return sorted(live.values()), 0, full  # no index → full scan

    cond = F.lit(True)
    for col, (lo, hi) in predicates.items():
        if f"min_{col}" in stats.columns and f"max_{col}" in stats.columns:
            cond = cond & _zone_intersects(col, lo, hi)
    rows = stats.select(F.col(_FILE), cond.alias("__kept")).collect()
    indexed = {_norm(r[0]): r[0] for r in rows}
    kept = {_norm(r[0]) for r in rows if r[1]}

    full = None
    if _resolved is not None:
        full, live = _resolved
    elif _index_is_synced(spark, table_path, idx):
        live = indexed  # the reconciled index IS the live set
    else:
        full, live = _resolve_table(spark, table_path)

    files = [
        orig
        for path, orig in sorted(live.items())
        if path not in indexed or path in kept
    ]
    _record_prune(len(live), len(files))
    return files, len(live) - len(files), full


def prune_files(
    spark: SparkSession,
    table_path: str,
    predicates: dict[str, tuple],
    index_dir: str | None = None,
    _resolved=None,
) -> tuple[list[str], int]:
    """Resolve the file list for a zoned read.

    Returns ``(files_to_read, n_skipped)``. Files not covered by the
    index are unconditionally included, and predicates on columns the
    index does not cover contribute NO pruning (advisory contract —
    the residual filter still applies them); indexed files are
    included iff every covered predicate interval intersects their
    zone. Paths come back in Spark-readable form.
    """
    files, skipped, _full = _plan_zoned_read(
        spark, table_path, predicates, index_dir, _resolved
    )
    return files, skipped


def zone_intervals(
    spark: SparkSession,
    table_path: str,
    col: str,
    index_dir: str | None = None,
) -> dict | None:
    """Per-file ``{normalized path: (min, max)}`` zones for ``col``,
    or None when the index (or the column's zones) is missing. ONE
    sidecar read; batched point-lookup planners
    (KeyedTable.lookup_many) evaluate many point predicates against
    it driver-side instead of re-aggregating the sidecar per key.
    (None, None) zones mean the file holds only NULLs in ``col`` —
    skippable for equality/range probes, same as _zone_intersects."""
    idx = index_dir or _index_dir(table_path)
    try:
        stats = spark.read.parquet(idx)
    except Exception:
        return None
    if f"min_{col}" not in stats.columns or f"max_{col}" not in stats.columns:
        return None
    return {
        _norm(r[0]): (r[1], r[2])
        for r in stats.select(
            F.col(_FILE), F.col(f"min_{col}"), F.col(f"max_{col}")
        ).collect()
    }


def pruned_read(
    spark: SparkSession,
    table_path: str,
    predicates: dict[str, tuple],
    index_dir: str | None = None,
) -> DataFrame:
    """Read ``table_path`` rows satisfying ``predicates`` (col →
    (lo, hi) inclusive bounds, None = unbounded), opening only files
    whose zones can match. The residual predicate is still applied —
    zones over-approximate — so the result is EXACTLY the full-scan
    filter, independent of index state."""
    residual = F.lit(True)
    for col, (lo, hi) in predicates.items():
        if lo is not None:
            residual = residual & (F.col(col) >= F.lit(lo))
        if hi is not None:
            residual = residual & (F.col(col) <= F.lit(hi))

    files, _skipped, full = _plan_zoned_read(
        spark, table_path, predicates, index_dir
    )
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
    if not files:
        if full is None:  # trusted-manifest path pruned everything:
            # one listing only for the empty frame's schema (rare —
            # the predicate matched no zone at all)
            full, _live = _resolve_table(spark, table_path)
        return full.filter(residual).limit(0)
    # Merge-on-read deletes: committed deletion vectors mask their
    # victims on every pruned read too (passthrough when the table has
    # none). Imported lazily — deletevectors imports helpers from this
    # module.
    from rds_to_datalake_project_spark.operators.deletevectors import (
        mask_deleted,
    )

    # basePath keeps hive partition columns alive when reading leaf
    # files directly — without it every partition column reads NULL.
    reader = spark.read.option("basePath", table_path)
    # Pin the resolved schema when a full resolution happened anyway.
    if full is not None:
        return mask_deleted(
            spark, table_path, reader.schema(full.schema).parquet(*files)
        ).filter(residual)
    # Trusted-manifest path (no listing happened): pin the schema the
    # refresh persisted in the sidecar. Merging over only the PRUNED
    # files is wrong after schema evolution — a subset of old files
    # can lack a column the full-table schema surfaces as NULL, and
    # the residual filter would then fail to resolve (r6 ADVICE).
    idx = index_dir or _index_dir(table_path)
    pinned = _read_small(spark, f"{idx}/_SCHEMA")
    if pinned:
        schema = T.StructType.fromJson(json.loads(pinned))
        return mask_deleted(
            spark, table_path, reader.schema(schema).parquet(*files)
        ).filter(residual)
    # Legacy sidecar without a schema pin: merge, but fall back to a
    # real full resolution if any predicate column is absent from the
    # merged subset.
    out = reader.option("mergeSchema", "true").parquet(*files)
    if any(c not in out.columns for c in predicates):
        full, _live = _resolve_table(spark, table_path)
        return mask_deleted(
            spark,
            table_path,
            spark.read.option("basePath", table_path)
            .schema(full.schema)
            .parquet(*files),
        ).filter(residual)
    return mask_deleted(spark, table_path, out).filter(residual)


def refresh_zonemap(
    spark: SparkSession,
    table_path: str,
    columns: list[str],
    index_dir: str | None = None,
    sync_token: str | None = None,
) -> tuple[int, int]:
    """Incrementally reconcile the index with the live file set.

    Returns ``(n_added, n_dropped)``. Index rows for files no longer
    live are dropped; files the index has never seen are scanned
    (ONLY those files, column-pruned) and appended — so the
    post-upsert maintenance cost is proportional to the touched
    files, not the table. A column-set change or a missing index
    falls back to a full build; an emptied table drops the index.
    Correctness never depends on this running (advisory contract) —
    it restores pruning EFFECTIVENESS after the live set changes.

    ``sync_token``: the table's ``.meta/_SEQ`` value as read BEFORE
    this call (KeyedTable._maintain_zonemap passes it). After the
    reconcile the token is stamped into ``<index>/_SYNC``, turning the
    index into a trusted live-set manifest for reads until the next
    mutation bumps the table token (see _index_is_synced). Callers
    without a token (plain directories) simply never get the trusted
    fast path.
    """
    idx = index_dir or _index_dir(table_path)

    def _stamp() -> None:
        if sync_token is not None:
            # Schema BEFORE the token: a manifest is only trusted once
            # _SYNC matches, and by then the full-table schema pin the
            # listing-free read path needs is already in place (see
            # pruned_read — merging over pruned files alone breaks
            # after schema evolution).
            _write_small(spark, f"{idx}/_SCHEMA", full.schema.json())
            _write_small(spark, f"{idx}/_SYNC", sync_token)

    try:
        full, live = _resolve_table(spark, table_path)
    except Exception:
        live = {}
    if not live:
        # emptied table: no files to describe
        try:
            n = spark.read.parquet(idx).count()
        except Exception:
            return (0, 0)
        _delete_dir(spark, idx)
        return (0, n)
    try:
        stats = spark.read.parquet(idx)
    except Exception:
        build_zonemap(spark, table_path, columns, idx)
        _stamp()
        return (len(live), 0)
    want = (
        {_FILE, "n_rows"}
        | {f"min_{c}" for c in columns}
        | {f"max_{c}" for c in columns}
    )
    if set(stats.columns) != want:
        build_zonemap(spark, table_path, columns, idx)
        _stamp()
        return (len(live), 0)

    indexed = {_norm(r[0]): r[0] for r in stats.select(_FILE).collect()}
    new = [orig for p, orig in sorted(live.items()) if p not in indexed]
    stale = [orig for p, orig in sorted(indexed.items()) if p not in live]
    if not new and not stale:
        # index already matches the live set — just re-stamp (the
        # mutation that bumped the token touched no data files)
        _stamp()
        return (0, 0)
    kept = stats.filter(~F.col(_FILE).isin(stale)) if stale else stats
    if new:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in columns:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        # basePath: an indexed column may BE a hive partition column —
        # reading leaf files without it would record all-NULL zones
        # and pruned_read would then skip live matches (row loss).
        fresh = (
            spark.read.schema(full.schema)
            .option("basePath", table_path)
            .parquet(*new)
            .select(*columns)
            .withColumn(_FILE, F.input_file_name())
            .groupBy(_FILE)
            .agg(*aggs)
        )
        kept = kept.unionByName(fresh.select(*stats.columns))
    # The new index is derived from the old one lazily — materialize
    # before overwriting the directory it reads from. The overwrite
    # clears any previous _SYNC with the dir — correct: the stamp must
    # postdate the index contents.
    out = kept.localCheckpoint(eager=True)
    out.coalesce(1).write.mode("overwrite").parquet(idx)
    _stamp()
    return (len(new), len(stale))


def _delete_dir(spark: SparkSession, path: str) -> None:
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    p.getFileSystem(hconf).delete(p, True)


def fast_count(spark: SparkSession, table_path: str, index_dir: str | None = None) -> int:
    """Metadata-backed row count (Delta's SELECT COUNT(*) shortcut):
    indexed live files are counted from the sidecar's ``n_rows`` —
    zero data reads — and only files the index has never seen are
    scanned. Exact under the advisory contract: stale index rows
    (files gone) are ignored via the live-set intersection, unindexed
    files fall back to a real (column-less, footer-only) count. On a
    token-synced index (see _index_is_synced) the count is PURE
    metadata — one sidecar read, no directory listing, no footers."""
    idx = index_dir or _index_dir(table_path)
    try:
        stats = spark.read.parquet(idx).select(_FILE, "n_rows").collect()
    except Exception:
        stats = []
    if stats and _index_is_synced(spark, table_path, idx):
        return int(sum(r[1] for r in stats))
    full, live = _resolve_table(spark, table_path)
    indexed = {_norm(r[0]): r[1] for r in stats}
    total = sum(n for p, n in indexed.items() if p in live)
    unindexed = [orig for p, orig in live.items() if p not in indexed]
    if unindexed:
        total += (
            spark.read.schema(full.schema)
            .option("basePath", table_path)
            .parquet(*unindexed)
            .count()
        )
    return int(total)

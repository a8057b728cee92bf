"""Per-file Bloom-filter index — point-lookup file skipping.

The reference's lake is Hudi, whose default record index IS a
per-file bloom filter (upsert tagging reads only files whose bloom
may contain the key). Zone maps (operators/zonemap.py) skip files by
RANGE — great for clustered layouts, useless for point lookups of
high-cardinality keys scattered across an unclustered table. This
module adds the membership complement: a per-(file, column) bloom
sidecar, so an equality/IN probe opens only files whose filter may
contain one of the probed values.

Build is fully distributed and expression-only: each row emits its
column value's k seeded-hash bit positions (xxhash64 — JVM intrinsic),
positions explode to ``(file, word_idx, bit mask)`` and one
``bit_or`` aggregation per (file, word) folds the filter — no driver
state, no UDF, cost one shuffle keyed by (file, word). The sidecar
stores ``file, col, word_idx, bits`` rows (m/64 longs per file·col).

Probing hashes the VALUES through the same Spark expressions (a
values-sized local job — the probe set is driver-small by
definition), then one aggregation over the sidecar keeps files where
EVERY bit of at least one probed value is present. The advisory
contract matches the zone map's: files not covered by the index are
always read, the residual filter always applies, so the result is
EXACTLY the full-scan filter regardless of index state; only I/O
differs. False positives cost a read, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.zonemap import (
    _norm,
    _resolve_table,
)

_FILE = "__file"
# Fixed sidecar layout (what _filter_rows emits): supplying it to the
# probe read skips per-probe parquet schema inference.
_SIDECAR_SCHEMA = f"{_FILE} string, col string, word_idx int, bits bigint"
# Auto-sizing targets (build_bloom_index m_bits=None): ~10 bits per
# key with 2x slack for file-size skew keeps the false-positive rate
# ~1e-3 at the AVERAGE file and <~1% at a 2x-overfull one. A fixed m
# is wrong at every scale at once — 2 KiB/file saturates (>70% FP)
# past ~2k keys/file while wasting space on tiny files.
BITS_PER_KEY = 10
M_BITS_MIN = 16384  # 2 KiB floor per file·column
M_BITS_MAX = 1 << 24  # 2 MiB cap per file·column (≈1.6M keys/file)
M_BITS_DEFAULT = M_BITS_MIN  # legacy fallback when _PARAMS is missing
K_HASHES_DEFAULT = 5


def _auto_m_bits(n_rows: int, n_files: int) -> int:
    """Index size from measured shape: bits for 2x the average
    keys-per-file, rounded up to whole 64-bit words, clamped."""
    per_file = max(1, (n_rows + max(n_files, 1) - 1) // max(n_files, 1))
    want = BITS_PER_KEY * per_file * 2
    want = max(M_BITS_MIN, min(M_BITS_MAX, want))
    return ((want + 63) // 64) * 64

# Diagnostics: CUMULATIVE pruning verdicts since reset_prune_stats()
# (point-lookup flows probe once per key, so per-probe numbers alone
# would under-report) — what bench.py reports as the index's
# I/O-avoided metric.
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
    return f"{table_path.rstrip('/')}/.bloomindex"


def _positions(col, m_bits: int, k: int):
    """array of k bit positions for a value — seeded xxhash64 family,
    identical expressions at build and probe time."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(F.xxhash64(col, i), F.lit(m_bits)),
    )


def _filter_rows(base: DataFrame, columns: list[str], m_bits: int, k: int):
    """``(file, col, word_idx, bits)`` sidecar rows from ONE scan of
    ``base``: every row emits its (column name, bit position) pairs
    for ALL indexed columns as one flattened struct array, a single
    explode fans them out, and one ``bit_or`` aggregation keyed by
    (file, col, word) folds the filters. Indexing k columns this way
    costs one table read + one shuffle — a per-column loop would
    re-scan the table (and re-shuffle) once per column, multiplying
    the dominant cost at scale."""
    def _col_entries(c: str):
        # single-arg lambda only: a 2-arg transform lambda receives
        # (element, index), which would shadow the closed-over name
        return F.transform(
            _positions(F.col(c), m_bits, k),
            lambda p: F.struct(F.lit(c).alias("col"), p.alias("pos")),
        )

    entries = F.explode(
        F.flatten(F.array(*[_col_entries(c) for c in columns]))
    ).alias("__e")
    return (
        base.select(_FILE, entries)
        .select(
            F.col(_FILE),
            F.col("__e.col").alias("col"),
            (F.col("__e.pos") / 64).cast("int").alias("word_idx"),
            # shiftleft needs a column shift amount — SQL form
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__e.pos % 64 AS INT))"
            ).alias("__bit"),
        )
        .groupBy(_FILE, "col", "word_idx")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def build_bloom_index(
    spark: SparkSession,
    table_path: str,
    columns: list[str],
    index_dir: str | None = None,
    m_bits: int | None = None,
    k_hashes: int = K_HASHES_DEFAULT,
) -> int:
    """Build per-file bloom filters for ``columns``. Returns the
    number of (file, col, word) rows written. One table scan and one
    shuffle regardless of how many columns are indexed.

    ``m_bits=None`` (default) sizes the filter from the table itself
    (parquet-metadata row count / live file count — no data read);
    pass an explicit value to pin it. Probes always use the stored
    ``_PARAMS``, so differently-sized generations never mix."""
    idx = index_dir or _index_dir(table_path)
    full, live = _resolve_table(spark, table_path)
    if m_bits is None:
        m_bits = _auto_m_bits(full.count(), len(live))
    base = full.select(*columns).withColumn(_FILE, F.input_file_name())
    out = _filter_rows(base, columns, m_bits, k_hashes).localCheckpoint(
        eager=True
    )
    out.write.mode("overwrite").parquet(idx)
    # params ride a marker so probes use the same (m, k)
    from rds_to_datalake_project_spark.operators.zonemap import _write_small

    _write_small(spark, f"{idx}/_PARAMS", f"{m_bits} {k_hashes}")
    return out.count()


def _stored_mk(spark: SparkSession, idx: str) -> tuple[int, int]:
    from rds_to_datalake_project_spark.operators.zonemap import _read_small

    txt = _read_small(spark, f"{idx}/_PARAMS")
    if not txt:
        return (M_BITS_DEFAULT, K_HASHES_DEFAULT)
    m, k = txt.split()
    return int(m), int(k)


def bloom_prune_files(
    spark: SparkSession,
    table_path: str,
    col: str,
    values: list,
    index_dir: str | None = None,
    _resolved=None,
) -> tuple[list[str], int]:
    """Files that MAY contain any of ``values`` in ``col`` (plus every
    file the index does not cover — advisory). Returns
    ``(files_to_read, n_skipped)``. ``_resolved``: a caller's prior
    ``_resolve_table`` result, so composed lookups (KeyedTable.lookup
    intersecting zone map + bloom) pay ONE directory listing."""
    full, live = _resolved or _resolve_table(spark, table_path)
    covered, survives = bloom_value_survivors(
        spark, table_path, col, values, index_dir, _resolved=(full, live)
    )
    if covered is None:
        return sorted(live.values()), 0  # no index → full scan
    any_hit = set().union(*survives.values()) if survives else set()
    files = [
        orig
        for path, orig in sorted(live.items())
        if path not in covered or path in any_hit
    ]
    _record_prune(len(live), len(files))
    return files, len(live) - len(files)


def _probe_relation(spark, order: list, dtype, m_bits: int, k: int):
    """``(vid, word_idx, mask, needed)`` probe rows, built IN-PLAN over
    ``range(1)``: one literal array of the cast values (posexplode
    keeps each value's id = its position in ``order``), ONE transform
    lambda mapping each value's hash positions to the build's
    (word = pos/64, mask = shiftleft(1L, pos%64)) pairs,
    array_distinct + size for the per-value requirement. No
    createDataFrame anywhere — a Python-list frame is RDD-backed and
    spins a Python worker on EVERY action (~0.6 s each measured) —
    no per-value expression either (969 per-value HOF literals
    measured 16-25 s of Catalyst planning; one array of plain literals
    is linear and cheap), and no probe-side exchange: broadcast-built
    from Generate nodes only."""
    if not order:
        return spark.range(0).select(
            F.lit(0).alias("vid"),
            F.lit(0).alias("word_idx"),
            F.lit(0).cast("bigint").alias("mask"),
            F.lit(0).alias("needed"),
        )

    def _pair(p):
        return F.struct(
            (p / 64).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (p % 64).cast("int")
            ).alias("mask"),
        )

    def _chunk(start: int, vals: list):
        return (
            spark.range(1)
            .select(
                F.posexplode(
                    F.array(*[F.lit(v).cast(dtype) for v in vals])
                ).alias("__i", "__v")
            )
            .select(
                (F.col("__i") + start).alias("vid"),
                F.array_distinct(
                    F.transform(_positions(F.col("__v"), m_bits, k), _pair)
                ).alias("__pairs"),
            )
            .select(
                "vid",
                F.size("__pairs").alias("needed"),
                F.explode("__pairs").alias("__pr"),
            )
            .select("vid", "__pr.word_idx", "__pr.mask", "needed")
        )

    # chunked so one literal array never grows unbounded (a very large
    # IN-probe stays a linear union of bounded Generate legs)
    step = 4096
    out = _chunk(0, order[:step])
    for i0 in range(step, len(order), step):
        out = out.unionByName(_chunk(i0, order[i0 : i0 + step]))
    return out


def bloom_value_survivors(
    spark: SparkSession,
    table_path: str,
    col: str,
    values: list,
    index_dir: str | None = None,
    _resolved=None,
) -> tuple[set | None, dict]:
    """Per-VALUE file survivorship from ONE sidecar aggregation:
    ``(covered, survives)`` where ``covered`` is the set of indexed
    (normalized) file paths — files outside it must always be read —
    and ``survives[value]`` is the subset whose filter MAY contain
    that value. ``covered is None`` means no readable index (callers
    fall back to a full scan). Batched lookups
    (KeyedTable.lookup_many) intersect these per key with the zone
    intervals instead of re-running the aggregation per key."""
    idx = index_dir or _index_dir(table_path)
    full, _live = _resolved or _resolve_table(spark, table_path)
    m_bits, k = _stored_mk(spark, idx)
    order = list(dict.fromkeys(values))
    try:
        # resolves the sidecar path BEFORE any probe work: a table
        # with no bloom index (the common un-indexed case) must cost
        # nothing here beyond this existence check.
        sidecar = spark.read.schema(_SIDECAR_SCHEMA).parquet(idx)
    except Exception as exc:
        # no readable index → callers full-scan. The common case is
        # PATH_NOT_FOUND (un-indexed table — silent by design); any
        # OTHER failure (permissions, corrupt sidecar, transient FS)
        # is logged so a degraded-to-full-scan real fault stays
        # visible (r12 ADVICE).
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            import logging

            logging.getLogger(__name__).warning(
                "bloom sidecar %s unreadable (%s: %s) — lookups fall "
                "back to full scans until the index is rebuilt",
                idx,
                type(exc).__name__,
                msg.splitlines()[0] if msg else "",
            )
        return None, {}
    # In-plan probe (see _probe_relation): the values hash through the
    # build's own expressions and the sidecar meets the broadcast
    # probe in ONE job, independent of probe-set size — also the
    # 100-TB shape: a sidecar of millions of (file, word) rows meets
    # any probe set in one shuffle-free pass.
    dtype = full.schema[col].dataType
    probe = _probe_relation(spark, order, dtype, m_bits, k)
    try:
        rows = (
            sidecar.filter(F.col("col") == col)
            .join(F.broadcast(probe), "word_idx", "left")
            .withColumn(
                "__hit",
                F.col("vid").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) != 0),
            )
            .groupBy(_FILE, "vid")
            .agg(
                F.countDistinct(
                    F.when(F.col("__hit"), F.struct("word_idx", "mask"))
                ).alias("got"),
                F.max("needed").alias("needed"),
            )
            .collect()
        )
    except Exception:
        return None, {}  # no readable index → callers full-scan
    covered = {_norm(r[0]) for r in rows}
    survives: dict = {v: set() for v in order}
    for r in rows:
        if r["vid"] is not None and r["got"] == r["needed"]:
            survives[order[r["vid"]]].add(_norm(r[0]))
    return covered, survives


def bloom_pruned_read(
    spark: SparkSession,
    table_path: str,
    col: str,
    values: list,
    index_dir: str | None = None,
) -> DataFrame:
    """Read rows where ``col`` IN ``values``, opening only files whose
    bloom may match (advisory — EXACTLY the full-scan filter)."""
    full, _live = _resolve_table(spark, table_path)
    files, _skipped = bloom_prune_files(spark, table_path, col, values, index_dir)
    residual = F.col(col).isin(values)
    if not files:
        return full.filter(residual).limit(0)
    return (
        spark.read.option("basePath", table_path)
        .schema(full.schema)
        .parquet(*files)
        .filter(residual)
    )


def refresh_bloom_index(
    spark: SparkSession,
    table_path: str,
    columns: list[str],
    index_dir: str | None = None,
    m_bits: int | None = None,
    k_hashes: int = K_HASHES_DEFAULT,
) -> tuple[int, int]:
    """Reconcile the bloom sidecar with the live file set — the same
    incremental shape as refresh_zonemap: filter rows for files no
    longer live are dropped, files the index has never seen are
    scanned (ONLY those files) and their filters appended. Returns
    ``(files_added, files_dropped)``. Column-set/parameter changes and
    a missing index fall back to a full build; cost is otherwise ∝
    files touched since the last reconcile. ``m_bits=None`` adopts
    the index's STORED size for appended filters (a refresh must
    never silently re-size a generation — mixed sizes can't probe);
    an explicit mismatching value forces the rebuild."""
    idx = index_dir or _index_dir(table_path)
    full, live = _resolve_table(spark, table_path)
    try:
        stats = spark.read.parquet(idx)
    except Exception:
        build_bloom_index(spark, table_path, columns, idx, m_bits, k_hashes)
        return (len(live), 0)
    stored_m, stored_k = _stored_mk(spark, idx)
    if set(stats.columns) != {_FILE, "col", "word_idx", "bits"} or (
        m_bits is not None and (stored_m, stored_k) != (m_bits, k_hashes)
    ):
        build_bloom_index(spark, table_path, columns, idx, m_bits, k_hashes)
        return (len(live), 0)
    # one job reads both reconcile inputs (indexed column set + indexed
    # file set) — this runs in every commit's maintenance slot, so each
    # saved driver-synchronized job is paid back per commit
    sets = stats.agg(
        F.collect_set("col").alias("cols"),
        F.collect_set(_FILE).alias("files"),
    ).collect()[0]
    if set(sets["cols"]) != set(columns):
        build_bloom_index(spark, table_path, columns, idx, m_bits, k_hashes)
        return (len(live), 0)
    m_bits, k_hashes = stored_m, stored_k
    indexed = {_norm(p): p for p in sets["files"]}
    new = [orig for p, orig in sorted(live.items()) if p not in indexed]
    stale = [orig for p, orig in sorted(indexed.items()) if p not in live]
    if not new and not stale:
        return (0, 0)
    kept = stats.filter(~F.col(_FILE).isin(stale)) if stale else stats
    if new:
        base = (
            spark.read.option("basePath", table_path)
            .schema(full.schema)
            .parquet(*new)
            .select(*columns)
            .withColumn(_FILE, F.input_file_name())
        )
        # one scan of the NEW files covers every indexed column
        kept = kept.unionByName(
            _filter_rows(base, columns, m_bits, k_hashes)
        )
    out = kept.localCheckpoint(eager=True)  # derived from the dir it replaces
    out.write.mode("overwrite").parquet(idx)
    from rds_to_datalake_project_spark.operators.zonemap import _write_small

    _write_small(spark, f"{idx}/_PARAMS", f"{m_bits} {k_hashes}")
    return (len(new), len(stale))


def attach_bloom_maintenance(
    table,
    columns: list[str],
    m_bits: int | None = None,
    k_hashes: int = K_HASHES_DEFAULT,
) -> None:
    """Enroll the bloom index as a table service: every commit the
    KeyedTable publishes reconciles the sidecar in the post-commit
    maintenance slot — cost ∝ files the commit touched."""
    table.add_maintenance_hook(
        lambda t: refresh_bloom_index(
            t.spark, t.path, columns, m_bits=m_bits, k_hashes=k_hashes
        )
    )

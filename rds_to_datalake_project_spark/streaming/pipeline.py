"""Structured Streaming CDC pipeline.

Replaces the reference's entire orchestration stack — the 60 s polling
loop (reference s3_orchestrate_incremental_glue_job.py:6-9), the
S3-state CDCTracker (incremental_load_orchestration.py:101-161), and
the bounded-batch scheduler (max_incremental_files,
incremental_load_orchestration.py:98) — with Spark's file-source
checkpointing:

- source discovery/offsets  → file-source checkpoint (ST2/ST3)
- ``max_incremental_files`` → ``maxFilesPerTrigger`` (ST4)
- 60 s trigger              → ``processingTime``/``availableNow`` (ST1)
- serialized runs           → single streaming query (ST5)
- commit-on-success only    → checkpoint commit log — this FIXES the
  reference's advance-watermark-on-failure data-loss bug (ST10,
  incremental_load_orchestration.py:390-408); we do not replicate it.

Exactly-once sink: foreachBatch + the KeyedTable upsert being
idempotent (replaying a batch converges to the same state — ST7) gives
effectively-once end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from rds_to_datalake_project_spark.operators.upsert import KeyedTable


def read_cdc_stream(
    spark: SparkSession,
    cdc_dir: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """File-source CDC stream over a growing directory tree.

    ``maxFilesPerTrigger`` defaults to the reference's bounded batch of
    2 files per run (incremental_load_orchestration.py:98). Streaming
    file sources require an explicit schema — inference at 100 TB is a
    misfeature anyway.
    """
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "parquet":
        return reader.parquet(cdc_dir)
    if fmt == "json":
        return reader.json(cdc_dir)
    raise ValueError(f"unsupported CDC stream format {fmt!r}")


def stream_cdc_to_table(
    spark: SparkSession,
    cdc_dir: str,
    table: KeyedTable,
    checkpoint_dir: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 2,
    trigger: dict | None = None,
    delete_mode: str = "ignore",
    await_termination: bool = True,
) -> StreamingQuery:
    """CDC directory → KeyedTable, exactly-once.

    ``trigger`` defaults to ``{"availableNow": True}`` (drain all
    pending files in bounded batches, then stop — the batch-job twin);
    pass ``{"processingTime": "60 seconds"}`` for the reference's
    continuous cadence (README.rst:38-41).
    """
    stream = read_cdc_stream(spark, cdc_dir, schema, fmt, max_files_per_trigger)

    def _upsert_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        table.upsert(batch, delete_mode=delete_mode)

    writer = (
        stream.writeStream.foreachBatch(_upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication by key within the watermark.

    The streaming twin of W1/exact dedup: duplicate (key) rows arriving
    within ``watermark_delay`` of each other are emitted once; state
    for keys older than the watermark is dropped, so memory is bounded
    regardless of stream length (the 100 TB-stream requirement).
    Batch DataFrames fall back to plain dropDuplicates.
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark_delay: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts with an event-time watermark (ST8).

    The reference's minute-granularity CDC bucketing
    (dynamodb_stream_consumer.py:61-72) as a real event-time windowed
    aggregation: late rows within ``watermark_delay`` still land in
    their window; older ones are dropped and their state is freed —
    bounded state at 100 TB stream scale.

    Works on both streaming and batch DataFrames (batch ignores the
    watermark, enabling oracle checks of the window arithmetic).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("win"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )


def _lsh_signature_params(table: KeyedTable) -> dict:
    """Signature-family kwargs for attaching the LSH service to
    ``table``: an EXISTING index's stored parameters win over the
    defaults — attaching with defaults over an index built with, say,
    ``hash_mode='md5'`` would make the first post-commit refresh see a
    params mismatch and silently rebuild the entire index under
    xxhash64 defaults, discarding the caller's chosen family."""
    from rds_to_datalake_project_spark.operators.lsh_index import (
        _stored_params,
    )

    stored = (_stored_params(table) if table.exists() else None) or {}
    return {
        "num_hashes": stored.get("num_hashes", 64),
        "bands": stored.get("bands", 16),
        "shingle_n": stored.get("shingle_n", 3),
        "hash_mode": stored.get("hash_mode", "xxhash64"),
    }


def stream_ingest_with_dedup(
    spark: SparkSession,
    cdc_dir: str,
    table: KeyedTable,
    checkpoint_dir: str,
    schema: T.StructType,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    quarantine_dir: str | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 2,
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Document ingest with DEDUP AT THE DOOR: every micro-batch is
    screened against the corpus's persisted LSH signature index
    (operators/lsh_index.py) before it is committed — near-duplicates
    of already-ingested documents are dropped (optionally appended to
    ``quarantine_dir`` with their match), survivors upsert, and the
    post-commit maintenance hook folds the survivors into the index so
    the NEXT batch screens against them. The standing shape of a
    training-data intake pipeline: screening cost per batch is banding
    the batch + one equi-join against the index — the corpus is never
    re-read.

    Within-batch duplicates are NOT collapsed here (precombine dedup
    in the upsert handles same-key rows; cross-key within-batch
    near-dups surface on the next batch once the first copy is
    indexed) — the screen is against COMMITTED state, which is what
    makes replays idempotent: a re-run batch screens against the same
    index state its first run committed, drops the same rows, and the
    upsert converges.

    The table must have ``attach_lsh_maintenance`` (this function
    attaches it if absent — id/text/params default) and
    ``retain_versions > 0`` so the index can refresh from
    ``table_changes``.
    """
    from rds_to_datalake_project_spark.operators.lsh_index import (
        _stored_params,
        attach_lsh_maintenance,
        lsh_neardups_for,
    )

    if not table.retain_versions:
        raise ValueError("stream_ingest_with_dedup requires retain_versions > 0")
    # Marker-based, not "has any hook": a table carrying only OTHER
    # services (e.g. the ANN index) must still get the LSH service, or
    # screening would silently never engage.
    if not getattr(table, "_lsh_attached", False):
        attach_lsh_maintenance(
            table, id_col=id_col, text_col=text_col,
            **_lsh_signature_params(table),
        )
    stream = read_cdc_stream(spark, cdc_dir, schema, fmt, max_files_per_trigger)

    def _screen_and_upsert(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        survivors = batch
        if table.exists() and _stored_params(table) is not None:
            hits = lsh_neardups_for(
                table, batch, id_col=id_col, text_col=text_col,
                threshold=threshold,
            ).localCheckpoint(eager=True)  # one screening pass, reused below
            dup_ids = hits.select(
                F.col("batch_id").alias(id_col)
            ).distinct()
            if quarantine_dir is not None:
                # Idempotent per micro-batch (same pattern as the
                # JSON-lines dead-letter dirs): a crash-replay of this
                # batch OVERWRITES its own quarantine slice instead of
                # appending duplicates.
                (
                    hits.withColumn("__batch", F.lit(batch_id))
                    .write.mode("overwrite")
                    .parquet(f"{quarantine_dir.rstrip('/')}/batch={batch_id}")
                )
            survivors = batch.join(dup_ids, id_col, "left_anti")
        if survivors.isEmpty():
            return
        table.upsert(survivors)  # maintenance hook refreshes the index

    writer = (
        stream.writeStream.foreachBatch(_screen_and_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    prefixes: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Event-time stream-stream INNER join (ST-family): a right row
    matches a left row with the same ``key`` and
    ``right_ts ∈ [left_ts, left_ts + within]`` — the canonical
    attribution join (impression → conversion inside the window).

    On streaming inputs both sides are watermarked and the range
    condition bounds the join STATE Spark must hold: a buffered left
    row can be dropped once the watermark passes
    ``left_ts + within`` (Structured Streaming derives the state
    cleanup bound from the time-interval predicate — without it the
    state grows without bound and a 100-TB stream eventually OOMs).
    On batch inputs the same plan is an equi-key sort-merge join with
    a range residual (one shuffle per side on the key), which is the
    oracle-checkable twin.

    Output: all left columns prefixed ``l_``, all right columns
    prefixed ``r_`` (join key and timestamps included, disambiguated).
    """
    l = left.select([F.col(c).alias(prefixes[0] + c) for c in left.columns])
    r = right.select([F.col(c).alias(prefixes[1] + c) for c in right.columns])
    lk, rk = prefixes[0] + key, prefixes[1] + key
    lt, rt = prefixes[0] + left_ts, prefixes[1] + right_ts
    if l.isStreaming:
        l = l.withWatermark(lt, watermark_delay)
    if r.isStreaming:
        r = r.withWatermark(rt, watermark_delay)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")

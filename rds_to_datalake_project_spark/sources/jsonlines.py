"""S3 — JSON-lines source (optionally gzipped) + S10 partitioned sink.

Reference: vendor/aws_dynamodb_export_to_s3.py:80-100 and
lambda_functions/dynamodb_export_to_s3_post_processor_worker.py:26-37
stream-decode gzipped JSON-lines by hand;
lambda_functions/dynamodb_stream_consumer.py:74-90 writes hive-style
``year=/month=/.../minute=`` JSON keys.

Engine: ``spark.read.json`` handles gzip transparently and in
parallel; the partitioned sink is ``write.partitionBy(...).json``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


CORRUPT_COL = "_corrupt_record"


def read_jsonlines(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    quarantine_dir: str | None = None,
) -> DataFrame:
    """JSON-lines read, optionally with dead-letter quarantine.

    ``quarantine_dir`` arms malformed-record handling (a real CDC feed
    WILL ship torn lines — half-written files, encoding bugs): the
    read runs PERMISSIVE with a corrupt-record column, bad lines land
    verbatim (plus their source file) under one quarantine batch dir
    per input file set (read the sink with ``recursiveFileLookup``;
    retries overwrite their own batch — no duplicate dead letters),
    and only clean rows are returned. Requires an
    explicit ``schema`` — with inference Spark would silently shape
    the schema around the garbage instead of flagging it.

    The split caches the parsed batch (Spark's analyzer requires a
    materialized relation to filter on the corrupt column — the rule
    re-fires on any recompute, so the cache cannot be dropped early).
    Sized for micro-batch inputs, but a LONG-LIVED driver must not
    pin one batch per tick: the returned frame carries a
    ``quarantine_release()`` handle — call it after materializing the
    clean rows to free the cached batch (``.unpersist()`` on the
    returned frame itself would not match the cached plan).
    """
    reader = spark.read
    if schema is not None and quarantine_dir is not None:
        from pyspark.sql import functions as F

        schema_q = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        parsed = (
            reader.schema(schema_q)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
            # input_file_name() must be captured below the cache, and
            # Spark's analyzer rejects filters referencing the corrupt
            # column over a bare file scan — the cache satisfies both.
            .withColumn("__source_file", F.input_file_name())
            .cache()
        )
        bad = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("raw_line"),
            F.col("__source_file").alias("source_file"),
        )
        # Idempotent dead-lettering: the batch writes to a subdir
        # keyed by its resolved input file set, with overwrite — a
        # tracker RETRY of the same micro-batch replaces its own
        # quarantine batch instead of appending duplicate copies of
        # every corrupt line.
        import hashlib

        batch_key = hashlib.md5(
            "\n".join(sorted(parsed.inputFiles())).encode("utf-8")
        ).hexdigest()[:16]
        bad.write.mode("overwrite").parquet(
            f"{quarantine_dir.rstrip('/')}/batch-{batch_key}"
        )
        clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(
            CORRUPT_COL, "__source_file"
        )
        clean.quarantine_release = parsed.unpersist
        return clean
    if schema is not None:
        reader = reader.schema(schema)
    elif quarantine_dir is not None:
        raise ValueError("quarantine_dir requires an explicit schema")
    return reader.json(path)


def write_partitioned_jsonlines(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    compression: str | None = "gzip",
    mode: str = "append",
) -> None:
    """S10 — hive-partitioned JSON-lines sink
    (dynamodb_stream_consumer.py:74-90 equivalent; uuid part-file
    naming comes free from Spark's task-file protocol, F12)."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)

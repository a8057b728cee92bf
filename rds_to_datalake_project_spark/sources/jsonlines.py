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


def read_jsonlines(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
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

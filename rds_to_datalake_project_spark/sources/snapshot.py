"""S1 — snapshot ("initial load") parquet scan.

Reference: glue_jobs/initial_load.py:88-121 lists ``LOAD*.parquet``
under a table prefix via S3 ``start_after`` and reads the explicit
file list. Engine version: one declarative read with a
``pathGlobFilter`` — Spark's file index does the listing (distributed
for huge prefixes), and Catalyst gets pushdown/pruning on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    glob: str = "LOAD*.parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read every snapshot file under ``table_dir`` as one DataFrame.

    Multi-file reads are an implicit union (reference reads N files as
    one DynamicFrame, initial_load.py:114-121).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("pathGlobFilter", glob).parquet(table_dir)

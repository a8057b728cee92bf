"""S7 — SQL facade over lake tables.

Replaces the reference's Athena layer (rds_to_datalake/athena.py:16-87
start/poll/fetch; vendor/aws_athena.py:27-116 UNLOAD-to-parquet +
result-reuse cache) with ``spark.sql`` on catalog-registered tables.
The poll/waiter machinery disappears — Spark executes synchronously —
and "UNLOAD to parquet" is just ``df.write.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_query(spark: SparkSession, sql: str, cache: bool = False) -> DataFrame:
    """Arbitrary SQL over registered tables (athena.py:16-64 equivalent).

    ``cache=True`` is the engine's analog of Athena result-reuse
    (vendor/aws_athena.py:75-82).
    """
    df = spark.sql(sql)
    return df.cache() if cache else df


def preview_table(spark: SparkSession, table: str, n: int = 10) -> tuple[DataFrame, int]:
    """``SELECT * LIMIT n`` + ``COUNT(*)`` (athena.py:67-87, O3/A1)."""
    head = spark.sql(f"SELECT * FROM {table} LIMIT {n}")  # noqa: S608 - table name from caller
    count = spark.sql(f"SELECT COUNT(*) AS n FROM {table}").collect()[0]["n"]  # noqa: S608
    return head, int(count)


def unload_query(spark: SparkSession, sql: str, path: str, fmt: str = "parquet") -> None:
    """UNLOAD (...) TO path WITH (format=...) — vendor/aws_athena.py:50-55."""
    df = spark.sql(sql)
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)  # S11 CSV sink (athena.py:78)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported unload format {fmt!r}")

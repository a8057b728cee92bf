"""S6 — JDBC relational source/sink.

Reference: rds_to_datalake/compare.py:17-27 reads the whole OLTP table
via SQLAlchemy (``SELECT * ... ORDER BY id``); rds_to_datalake/
db_connect.py builds the engine from config.

Engine: ``spark.read.jdbc`` with partitioned reads — at scale a
single-connection full-table read is the bottleneck, so we expose
``partition_column/num_partitions`` for parallel range scans. Tested
end-to-end against Spark's bundled embedded Derby
(tests/test_scale_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(extra)
    return opts


def read_jdbc_table(spark: SparkSession, **options) -> DataFrame:
    return spark.read.format("jdbc").options(**jdbc_read_options(**options)).load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **extra: str,
) -> None:
    """JDBC sink (each partition writes over its own connection in
    ``batch_size`` batches — the parallel inverse of the partitioned
    read)."""
    (
        df.write.format("jdbc")
        .options(url=url, dbtable=table, batchsize=str(batch_size), **extra)
        .mode(mode)
        .save()
    )

"""Schema registry.

The reference declares its OLTP schema via SQLAlchemy ORM (reference:
rds_to_datalake/db_orm.py:16-42) and relies on parquet inference for
lake reads (glue_jobs/initial_load.py:114-121). We keep explicit
StructTypes for the contract tables (stable scans, no inference cost at
scale) and allow inference for ad-hoc CDC files.

Contract (reference README.rst:44-48): every record has a unique
primary key and a last-modified timestamp; time-based partition source
column. Timestamps are carried as ISO-8601 strings in the reference —
we preserve that contract for the CDC tables and use native timestamps
for the analytic tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# --- reference OLTP tables (db_orm.py:16-42) -------------------------------

ACCOUNTS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("email", T.StringType(), True),
        T.StructField("create_at", T.StringType(), True),
        T.StructField("update_at", T.StringType(), True),
    ]
)

TRANSACTIONS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("account_id", T.StringType(), True),
        T.StructField("create_at", T.StringType(), True),
        T.StructField("update_at", T.StringType(), True),
        T.StructField("entity", T.StringType(), True),
        T.StructField("amount", T.IntegerType(), True),
        T.StructField("is_credit", T.IntegerType(), True),
        T.StructField("note", T.StringType(), True),
    ]
)


def with_cdc_envelope(schema: T.StructType) -> T.StructType:
    """Add the DMS-style ``Op`` column (I/U/D) to a base schema.

    Reference: glue_jobs/incremental.py:210 drops it; DMS adds it.
    """
    return T.StructType(list(schema.fields) + [T.StructField("Op", T.StringType(), True)])


@dataclass(frozen=True)
class TableSpec:
    """Upsert-table contract: key, precombine, partition source.

    Mirrors the Hudi write options the reference fixes per table
    (glue_jobs/initial_load.py:160-176): recordkey.field,
    precombine.field, partitionpath.field.
    """

    name: str
    record_key: tuple[str, ...] = ("id",)
    precombine_key: str = "update_at"
    # Column the time partitions derive from (README.rst:44-48).
    partition_source: str = "create_at"
    # Engine default is DAY granularity: the reference's minute-level
    # partitioning (initial_load.py:163-166) is a small-files
    # anti-pattern at 100 TB (SURVEY.md §4). "minute" reproduces the
    # reference layout when wanted.
    partition_granularity: str = "day"
    # HASH-BUCKET partitioning (exclusive with partition_granularity):
    # N dirs keyed by xxhash64(record_key) % N. For group-keyed stores
    # with no time axis (materialized views, index stores), an upsert
    # rewrites only the touched buckets — an unpartitioned store
    # rewrites wholesale on every merge, which at 100× means refresh
    # WRITE cost ∝ store size instead of ∝ the change set. The bucket
    # column derives from the immutable record key, so rows never move
    # buckets and UPDATE's frozen-column contract holds for free.
    hash_buckets: int = 0
    schema: T.StructType | None = field(default=None, compare=False)


REGISTRY: dict[str, TableSpec] = {
    "accounts": TableSpec("accounts", schema=ACCOUNTS),
    "transactions": TableSpec("transactions", schema=TRANSACTIONS),
}


def spec_for(name: str, **overrides) -> TableSpec:
    base = REGISTRY.get(name, TableSpec(name))
    if overrides:
        from dataclasses import replace

        return replace(base, **overrides)
    return base

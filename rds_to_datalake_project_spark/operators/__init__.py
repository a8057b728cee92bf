"""Engine operators (SURVEY.md §2): enrichment, dedup, upsert, compare,
and 100TB-scale extensions (similarity, minhash/simhash, text, multimodal)."""

from rds_to_datalake_project_spark.operators.dedup import (
    exact_dedup,
    latest_version_per_key,
)
from rds_to_datalake_project_spark.operators.enrich import add_time_partitions
from rds_to_datalake_project_spark.operators.upsert import KeyedTable

__all__ = [
    "KeyedTable",
    "add_time_partitions",
    "exact_dedup",
    "latest_version_per_key",
]

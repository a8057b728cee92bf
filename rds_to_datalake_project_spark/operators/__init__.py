"""Engine operators (SURVEY.md §2): enrichment, dedup, upsert, compare,
and 100TB-scale extensions (similarity, minhash/simhash, text, multimodal)."""

from rds_to_datalake_project_spark.operators.asof import asof_join
from rds_to_datalake_project_spark.operators.compact import compact_table
from rds_to_datalake_project_spark.operators.dedup import (
    exact_dedup,
    latest_version_per_key,
)
from rds_to_datalake_project_spark.operators.enrich import add_time_partitions
from rds_to_datalake_project_spark.operators.skew import salted_join
from rds_to_datalake_project_spark.operators.upsert import KeyedTable

__all__ = [
    "KeyedTable",
    "asof_join",
    "add_time_partitions",
    "compact_table",
    "exact_dedup",
    "latest_version_per_key",
    "salted_join",
]

"""Sources & sinks (SURVEY.md §2.1)."""

from rds_to_datalake_project_spark.sources.cdc import read_cdc_files
from rds_to_datalake_project_spark.sources.dynamodb_json import (
    decode_dynamodb_items,
    read_manifest_export,
)
from rds_to_datalake_project_spark.sources.jsonlines import read_jsonlines
from rds_to_datalake_project_spark.sources.snapshot import read_snapshot

__all__ = [
    "decode_dynamodb_items",
    "read_cdc_files",
    "read_jsonlines",
    "read_manifest_export",
    "read_snapshot",
]

"""Streaming layer (SURVEY.md §2.9): Structured Streaming CDC ingestion
replacing the reference's hand-rolled 60 s orchestrator loop, plus a
portable batch-mode tracker twin with the same watermark semantics."""

from rds_to_datalake_project_spark.streaming.pipeline import (
    stream_cdc_to_table,
    windowed_event_counts,
)
from rds_to_datalake_project_spark.streaming.tracker import (
    CDCTracker,
    run_incremental_all,
    run_incremental_once,
)

__all__ = [
    "CDCTracker",
    "run_incremental_all",
    "run_incremental_once",
    "stream_cdc_to_table",
    "windowed_event_counts",
]

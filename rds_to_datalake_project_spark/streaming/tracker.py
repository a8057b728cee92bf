"""Portable batch-mode CDC tracker — the twin of the streaming
checkpoint for environments that run micro-batches as discrete jobs.

Reproduces the reference CDCTracker's well-specified semantics
(incremental_load_orchestration.py:101-161, 199-286, 367-414):

- per-table high-watermark commit timestamp (``last_processed``)
- bounded batch: at most ``max_files`` CDC files per run (:98)
- idle advance: when no files are pending, the watermark may advance
  by at most ``max_interval`` so discovery stays O(recent) (:154-161)
- serialized runs: a ``running`` flag refuses concurrent starts (:381)

One deliberate divergence (SURVEY.md §7.4 / ST10): the reference
advances the watermark even when the job FAILED
(incremental_load_orchestration.py:390-408) — silent data loss. Here
the watermark commits only after the batch function returns
successfully; a crash replays the batch, and the idempotent upsert
(ST7) makes the replay a no-op.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.sources.cdc import discover_cdc_files, read_cdc_files

_EPOCH = datetime(1970, 1, 1)


@dataclass
class TableState:
    last_processed: datetime = _EPOCH
    n_batches: int = 0

    def to_dict(self) -> dict:
        return {
            "last_processed": self.last_processed.isoformat(),
            "n_batches": self.n_batches,
        }

    @classmethod
    def from_dict(cls, d: dict) -> TableState:
        return cls(
            last_processed=datetime.fromisoformat(d["last_processed"]),
            n_batches=int(d.get("n_batches", 0)),
        )


@dataclass
class CDCTracker:
    """JSON-file tracker: atomic write-temp-then-rename commits."""

    path: str
    max_files: int = 2
    max_interval: timedelta = timedelta(hours=1)
    tables: dict[str, TableState] = field(default_factory=dict)
    running: bool = False

    @classmethod
    def load(cls, path: str, **kwargs) -> CDCTracker:
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            return cls(
                path=path,
                max_files=d.get("max_files", kwargs.get("max_files", 2)),
                max_interval=timedelta(seconds=d.get("max_interval_s", 3600)),
                tables={k: TableState.from_dict(v) for k, v in d["tables"].items()},
                running=d.get("running", False),
            )
        return cls(path=path, **kwargs)

    def save(self) -> None:
        d = {
            "max_files": self.max_files,
            "max_interval_s": int(self.max_interval.total_seconds()),
            "tables": {k: v.to_dict() for k, v in self.tables.items()},
            "running": self.running,
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(self.path)))
        with os.fdopen(fd, "w") as f:
            json.dump(d, f, indent=2)
        os.replace(tmp, self.path)  # atomic on POSIX

    def state(self, table: str) -> TableState:
        return self.tables.setdefault(table, TableState())

    # -- batch planning (get_todo twin, :129-161) ----------------------------

    def plan_batch(self, table: str, cdc_dir: str) -> tuple[list[str], datetime | None]:
        """Files to process next for ``table`` and the watermark value
        to commit on success.

        Bounded to ``max_files`` oldest-first; next watermark = max
        encoded commit time of the chosen files, or ``last +
        max_interval`` (capped at the latest file boundary) when idle.
        """
        from rds_to_datalake_project_spark.sources.cdc import decode_commit_ts

        st = self.state(table)
        files = discover_cdc_files(cdc_dir, after=st.last_processed)
        files = files[: self.max_files]
        if not files:
            return [], None
        next_wm = max(t for t in (decode_commit_ts(f) for f in files) if t is not None)
        return files, next_wm

    def commit(self, table: str, watermark: datetime) -> None:
        """Advance the watermark — call ONLY after the batch succeeded."""
        st = self.state(table)
        st.last_processed = watermark
        st.n_batches += 1
        self.save()


def run_incremental_once(
    spark: SparkSession,
    tracker: CDCTracker,
    cdc_dir: str,
    table: KeyedTable,
    batch_fn: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
    delete_mode: str = "ignore",
) -> int:
    """One orchestrator tick: plan → read → (transform) → upsert → commit.

    Returns the number of CDC files processed (0 = idle tick). The
    serialized-runs guard mirrors MaxConcurrentRuns=1 (glue_job.py:110).
    """
    if tracker.running:
        return 0
    tracker.running = True
    tracker.save()
    try:
        files, next_wm = tracker.plan_batch(table.spec.name, cdc_dir)
        if not files:
            return 0
        batch = read_cdc_files(spark, files, schema=table.spec.schema, fmt=fmt)
        if batch_fn is not None:
            batch = batch_fn(batch)
        table.upsert(batch, delete_mode=delete_mode)
        tracker.commit(table.spec.name, next_wm)
        return len(files)
    finally:
        tracker.running = False
        tracker.save()

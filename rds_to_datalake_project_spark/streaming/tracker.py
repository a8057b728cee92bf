"""Portable batch-mode CDC tracker — the twin of the streaming
checkpoint for environments that run micro-batches as discrete jobs.

Reproduces the reference CDCTracker's well-specified semantics
(incremental_load_orchestration.py:101-161, 199-286, 367-414):

- per-table high-watermark commit timestamp (``last_processed``)
- bounded batch: at most ``max_files`` CDC files per run (:98)
- idle advance (opt-in via ``max_interval``): when no files are
  pending, the watermark anchors to ``now - max_interval`` so
  discovery stays O(recent) on quiet tables (:154-161; see
  ``plan_batch`` for why the formula differs)
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
from datetime import datetime, timedelta, timezone

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
    # None disables the idle watermark advance — the safe default for
    # historical backfills/replays, where jumping the watermark toward
    # wall-now would skip files with old encoded commit times.
    max_interval: timedelta | None = None
    # Ingest buffering window (ST6, the reference's Lambda-side
    # minute-partition buffer re-expressed on the consume side): defer
    # a batch smaller than ``min_files`` until it either fills up or
    # its oldest file is older than ``max_buffer_age`` — batching tiny
    # CDC trickles into fewer, larger upserts without unbounded delay.
    min_files: int = 1
    max_buffer_age: timedelta | None = None
    # Stale-run lease (see __post_init__ for the min_files contract): ``running`` refuses concurrent starts, but a
    # SIGKILL mid-batch never clears it — without a lease the flag
    # would stall ingestion FOREVER. A holder older than ``lease`` is
    # presumed dead and its flag is reclaimed; the idempotent upsert
    # (ST7) makes the replayed batch converge even if the old process
    # was somehow still mid-write.
    lease: timedelta = timedelta(minutes=30)
    tables: dict[str, TableState] = field(default_factory=dict)
    running: bool = False
    running_since: datetime | None = None

    def __post_init__(self) -> None:
        if self.min_files > 1 and self.max_buffer_age is None:
            # Without an age bound, an under-filled tail batch would
            # defer FOREVER (the source stops two files short and those
            # rows never land) — and silently ignoring min_files was
            # the bug this replaces. Make the contract explicit.
            raise ValueError(
                "min_files > 1 requires max_buffer_age (the age bound "
                "that releases an under-filled tail batch)"
            )

    @classmethod
    def load(cls, path: str, **kwargs) -> CDCTracker:
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            interval_s = d.get("max_interval_s")
            return cls(
                path=path,
                max_files=d.get("max_files", kwargs.get("max_files", 2)),
                max_interval=(
                    timedelta(seconds=interval_s)
                    if interval_s is not None
                    else kwargs.get("max_interval")
                ),
                # operational knobs, not persisted state — honor the
                # caller's values on reload
                min_files=kwargs.get("min_files", 1),
                max_buffer_age=kwargs.get("max_buffer_age"),
                lease=kwargs.get("lease", timedelta(minutes=30)),
                tables={k: TableState.from_dict(v) for k, v in d["tables"].items()},
                running=d.get("running", False),
                # A pre-lease state file has running=true with no
                # timestamp; stamp FIRST OBSERVATION so the lease
                # countdown starts now instead of never (a dead
                # legacy holder must not stall ingestion forever).
                running_since=(
                    datetime.fromisoformat(d["running_since"])
                    if d.get("running_since")
                    else (
                        datetime.now(timezone.utc).replace(tzinfo=None)
                        if d.get("running", False)
                        else None
                    )
                ),
            )
        return cls(path=path, **kwargs)

    def save(self) -> None:
        d = {
            "max_files": self.max_files,
            "max_interval_s": (
                int(self.max_interval.total_seconds())
                if self.max_interval is not None
                else None
            ),
            "tables": {k: v.to_dict() for k, v in self.tables.items()},
            "running": self.running,
            "running_since": (
                self.running_since.isoformat() if self.running_since else None
            ),
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(self.path)))
        with os.fdopen(fd, "w") as f:
            json.dump(d, f, indent=2)
        os.replace(tmp, self.path)  # atomic on POSIX

    def state(self, table: str) -> TableState:
        return self.tables.setdefault(table, TableState())

    # -- batch planning (get_todo twin, :129-161) ----------------------------

    def plan_batch(
        self, table: str, cdc_dir: str, now: datetime | None = None
    ) -> tuple[list[str], datetime | None]:
        """Files to process next for ``table`` and the watermark value
        to commit on success.

        Bounded to ``max_files`` oldest-first; next watermark = max
        encoded commit time of the chosen files. When no files are
        pending, the returned idle watermark is ``now - max_interval``
        (None if that wouldn't advance): committing it keeps quiet
        tables' discovery anchored near the present instead of
        re-filtering the full history every tick, while the
        ``max_interval`` safety margin means a file whose encoded
        commit time lags its arrival by less than ``max_interval`` is
        never skipped. The reference instead sweeps ``last +
        max_interval`` per tick with an effectively infinite default
        (incremental_load_orchestration.py:97,154-161) — which can
        jump the watermark past files that have not arrived yet; this
        engine keeps its O(recent)-discovery purpose without that
        loss mode (same posture as the ST10 commit-on-success fix).
        """
        from rds_to_datalake_project_spark.sources.cdc import decode_commit_ts

        st = self.state(table)
        files = discover_cdc_files(cdc_dir, after=st.last_processed)
        chosen = files[: self.max_files]
        if len(files) > len(chosen):
            # NEVER cut inside a group of files sharing one encoded
            # commit time: the watermark commits at that timestamp and
            # discovery's strict ts > after filter would then skip the
            # excluded members of the group forever (silent loss on a
            # bursty writer). max_files is a soft bound at
            # commit-timestamp granularity.
            boundary = decode_commit_ts(chosen[-1])
            for f in files[len(chosen):]:
                if decode_commit_ts(f) == boundary:
                    chosen.append(f)
                else:
                    break
        files = chosen
        if not files:
            if self.max_interval is None:
                return [], None
            if now is None:
                now = datetime.now(timezone.utc).replace(tzinfo=None)
            idle_wm = now - self.max_interval
            return [], (idle_wm if idle_wm > st.last_processed else None)
        if len(files) < self.min_files:
            if now is None:
                now = datetime.now(timezone.utc).replace(tzinfo=None)
            oldest = min(
                t for t in (decode_commit_ts(f) for f in files) if t is not None
            )
            if self.max_buffer_age is None or oldest > now - self.max_buffer_age:
                # still buffering: under-filled and (with an age bound
                # set) younger than it — defer without advancing.
                # With no age bound only filling up releases the
                # batch; min_files alone must not be silently inert.
                return [], None
        next_wm = max(t for t in (decode_commit_ts(f) for f in files) if t is not None)
        return files, next_wm

    def commit(self, table: str, watermark: datetime) -> None:
        """Advance the watermark — call ONLY after the batch succeeded."""
        st = self.state(table)
        st.last_processed = watermark
        st.n_batches += 1
        self.save()

    def commit_idle(self, table: str, watermark: datetime) -> None:
        """Advance the watermark over an empty window (no batch ran, so
        ``n_batches`` is untouched). Never move past files that exist:
        callers pass the ``plan_batch`` idle watermark, whose window
        was just verified empty."""
        st = self.state(table)
        st.last_processed = max(st.last_processed, watermark)
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
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    if tracker.running:
        held = now - tracker.running_since if tracker.running_since else None
        if held is None or held < tracker.lease:
            return 0
        # lease expired: the flag's holder died mid-batch (SIGKILL —
        # its finally never ran). Reclaim instead of stalling forever.
    tracker.running = True
    tracker.running_since = now
    tracker.save()
    try:
        files, next_wm = tracker.plan_batch(table.spec.name, cdc_dir)
        if not files:
            if next_wm is not None:
                # Idle advance: keep discovery O(recent window), not
                # O(full history), on quiet tables.
                tracker.commit_idle(table.spec.name, next_wm)
            return 0
        batch = read_cdc_files(spark, files, schema=table.spec.schema, fmt=fmt)
        if batch_fn is not None:
            batch = batch_fn(batch)
        table.upsert(batch, delete_mode=delete_mode)
        tracker.commit(table.spec.name, next_wm)
        return len(files)
    finally:
        tracker.running = False
        tracker.running_since = None
        tracker.save()


def run_incremental_all(
    spark: SparkSession,
    tracker: CDCTracker,
    tables: dict[str, tuple[str, KeyedTable]],
    fmt: str = "parquet",
    delete_mode: str = "ignore",
) -> dict[str, int]:
    """One orchestrator tick over EVERY table — the reference's
    table_tracker_list shape (incremental_load_orchestration.py:205,
    233-243: one job run drains each table's todo list). Per-table
    watermarks commit independently, so one failing table doesn't
    block or roll back the others; it simply retries next tick."""
    out: dict[str, int] = {}
    for name, (cdc_dir, table) in tables.items():
        try:
            out[name] = run_incremental_once(
                spark, tracker, cdc_dir, table, fmt=fmt, delete_mode=delete_mode
            )
        except Exception:
            # commit-on-success semantics make the retry safe (ST7/ST10)
            out[name] = -1
    return out

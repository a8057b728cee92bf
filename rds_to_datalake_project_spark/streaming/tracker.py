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
import socket
import tempfile
import threading
import uuid
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
    # presumed dead and its flag is reclaimed. Three fences keep a
    # LIVE-but-slow holder (a batch legitimately outrunning the lease)
    # from being reclaimed into a concurrent double-write:
    # - run_incremental_once heartbeats ``running_since`` during the
    #   batch, so a live holder's lease never looks expired;
    # - the reclaimer checks holder liveness (same-host pid probe)
    #   before presuming death;
    # - the holder fences on its ``running_token`` before the upsert
    #   and before the watermark commit — if another process DID take
    #   the lease, the loser aborts instead of double-committing.
    lease: timedelta = timedelta(minutes=30)
    tables: dict[str, TableState] = field(default_factory=dict)
    running: bool = False
    running_since: datetime | None = None
    running_pid: int | None = None
    running_host: str | None = None
    running_token: str | None = None

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
                running_pid=d.get("running_pid"),
                running_host=d.get("running_host"),
                running_token=d.get("running_token"),
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
            "running_pid": self.running_pid,
            "running_host": self.running_host,
            "running_token": self.running_token,
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(self.path)))
        with os.fdopen(fd, "w") as f:
            json.dump(d, f, indent=2)
        os.replace(tmp, self.path)  # atomic on POSIX

    def state(self, table: str) -> TableState:
        return self.tables.setdefault(table, TableState())

    # -- lease fencing --------------------------------------------------------

    def _disk_token(self) -> str | None:
        """The lease token currently persisted in the state file —
        the fencing ground truth a holder compares its own token to."""
        try:
            with open(self.path) as f:
                return json.load(f).get("running_token")
        except (OSError, ValueError):
            return None

    def _holder_alive(self) -> bool:
        """True iff the recorded holder is VERIFIABLY still running:
        same host and its pid answers a signal-0 probe. Cross-host
        holders can't be probed — they return False and rely on the
        heartbeat to keep their lease fresh."""
        if self.running_pid is None or self.running_host != socket.gethostname():
            return False
        try:
            os.kill(self.running_pid, 0)
            return True
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by someone else

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
        if tracker._holder_alive():
            # Lease expired but the holder is verifiably still running
            # (a legitimately slow batch whose heartbeat we raced, or a
            # pre-heartbeat writer): reclaiming would put two writers
            # on one single-writer table. Back off; a DEAD holder's pid
            # probe fails and the reclaim proceeds next tick.
            return 0
        # lease expired and the holder is not provably alive: it died
        # mid-batch (SIGKILL — its finally never ran). Reclaim instead
        # of stalling forever.
    tracker.running = True
    tracker.running_since = now
    tracker.running_pid = os.getpid()
    tracker.running_host = socket.gethostname()
    tracker.running_token = uuid.uuid4().hex
    token = tracker.running_token
    tracker.save()

    # Heartbeat: refresh running_since while the batch runs so a LIVE
    # holder's lease never expires under a concurrent reclaimer, no
    # matter how slow the batch. Stops touching the file the moment
    # the on-disk token is no longer ours (we lost a race anyway).
    stop_beat = threading.Event()

    def _beat() -> None:
        interval = max(tracker.lease.total_seconds() / 3.0, 0.05)
        while not stop_beat.wait(interval):
            if tracker._disk_token() != token:
                return
            tracker.running_since = datetime.now(timezone.utc).replace(tzinfo=None)
            tracker.save()

    beat = threading.Thread(target=_beat, daemon=True)
    beat.start()
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
        if tracker._disk_token() != token:
            raise RuntimeError(
                "CDC lease lost before upsert (another process reclaimed "
                "the running flag); aborting — the new holder replays "
                "this batch"
            )
        table.upsert(batch, delete_mode=delete_mode)
        if tracker._disk_token() != token:
            # The table write is idempotent (ST7) so the thief's replay
            # converges; but the WATERMARK must have exactly one owner.
            raise RuntimeError(
                "CDC lease lost during upsert; watermark not committed — "
                "the new holder replays this batch (idempotent)"
            )
        tracker.commit(table.spec.name, next_wm)
        return len(files)
    finally:
        stop_beat.set()
        beat.join(timeout=5)
        if tracker._disk_token() == token:
            tracker.running = False
            tracker.running_since = None
            tracker.running_pid = None
            tracker.running_host = None
            tracker.running_token = None
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

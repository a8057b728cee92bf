"""S2 — CDC micro-batch scan (explicit file list or pruned directory).

Reference: glue_jobs/incremental.py:155-161 reads an exact list of CDC
parquet files handed over by the orchestrator; the orchestrator finds
them by filename-timestamp arithmetic
(incremental_load_orchestration.py:73-89,134-151).

Engine version: ``read_cdc_files`` takes the explicit list (batch
twin); time-range discovery is ``discover_cdc_files`` over the
``YYYY/MM/DD/HH/YYYYMMDD-HHMMSSfff`` layout. Under Structured
Streaming neither is needed — the file source's checkpoint does
discovery (see streaming/pipeline.py).
"""

from __future__ import annotations

import os
import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Filename commit-time codec (incremental_load_orchestration.py:73-89):
# "YYYYMMDD-HHMMSSfff" where fff = milliseconds.
_TS_RE = re.compile(r"(\d{8})-(\d{9})")
_FNAME_FMT = "%Y%m%d-%H%M%S%f"


def encode_commit_ts(dt: datetime) -> str:
    """datetime → ``YYYYMMDD-HHMMSSfff`` (millisecond precision)."""
    return dt.strftime(_FNAME_FMT)[:-3]


def decode_commit_ts(name: str) -> datetime | None:
    """Extract the commit timestamp encoded in a CDC filename."""
    m = _TS_RE.search(os.path.basename(name))
    if not m:
        return None
    return datetime.strptime(m.group(1) + "-" + m.group(2) + "000", _FNAME_FMT)


def discover_cdc_files(
    cdc_dir: str,
    after: datetime | None = None,
    until: datetime | None = None,
    exclude_snapshot: bool = True,
) -> list[str]:
    """List CDC files whose encoded commit time is in (after, until].

    Driver-side twin of the reference's S3 ``start_after`` +
    range-filter discovery (incremental_load_orchestration.py:134-151,
    including the ``"/LOAD" not in key`` P5 exclusion).
    """
    found: list[tuple[datetime, str]] = []
    for root, _dirs, files in os.walk(cdc_dir):
        for f in files:
            if exclude_snapshot and f.startswith("LOAD"):
                continue
            ts = decode_commit_ts(f)
            if ts is None:
                continue
            if after is not None and ts <= after:
                continue
            if until is not None and ts > until:
                continue
            found.append((ts, os.path.join(root, f)))
    return [p for _, p in sorted(found)]


def read_cdc_files(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read an explicit CDC file list as one DataFrame (S2)."""
    if not paths:
        raise ValueError("empty CDC file list")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(*paths)
    if fmt == "json":
        return reader.json(paths)
    raise ValueError(f"unsupported CDC format {fmt!r}")

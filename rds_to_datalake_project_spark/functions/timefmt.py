"""F2/F3/F4 — timestamp codec composites.

The reference round-trips timestamps through three string formats:
ISO-8601 with offset for record columns (s1_data_ingest.py:67-71),
``YYYYMMDD-HHMMSSfff`` for CDC commit keys
(incremental_load_orchestration.py:73-89), and zero-padded partition
values (F5). These composites pin the exact formats as reusable
column expressions (the Python-side filename codec lives in
sources/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's record-timestamp contract: ISO-8601, microseconds,
# explicit +00:00 offset — lexicographic order == time order.
ISO_MICROS_UTC = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS+00:00"


def iso_utc(col: Column | str) -> Column:
    """timestamp → canonical ISO-8601 UTC string (F4 emit side)."""
    return F.date_format(col, ISO_MICROS_UTC)


def parse_iso(col: Column | str) -> Column:
    """ISO-8601 string (any offset) → timestamp (F4 parse side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXXXX")


def commit_key_expr(ts: Column | str) -> Column:
    """timestamp → ``YYYY/MM/DD/HH/YYYYMMDD-HHMMSSfff`` CDC key (F3),
    the layout partition pruning and watermark arithmetic key on."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy/MM/dd/HH/yyyyMMdd-HHmmssSSS")

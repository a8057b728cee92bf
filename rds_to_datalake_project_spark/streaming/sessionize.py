"""Sessionization — gap-based session windows over an event stream.

Extension beyond the reference (which has no stateful streaming —
SURVEY.md §2.9 note): the canonical custom stateful operator for a
training-data/analytics pipeline, provided in two exactly-equivalent
forms:

- ``sessionize`` (batch): a window-function formulation — a session
  starts where the gap to the previous event of the same user exceeds
  ``gap``; session id = running count of session starts. One shuffle
  on the user key; SQL-expressible, so it is oracle-checkable.
- ``sessionize_stream`` (streaming): ``applyInPandasWithState`` with
  per-user state carrying the open session; emits closed sessions as
  the event-time watermark passes the gap. State size is O(open
  sessions), bounded by the watermark — the 100 TB-stream-safe shape.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: one row per (user, session).

    Plan: single hash shuffle on the user key; two window passes over
    the same partitioning (Catalyst reuses the exchange); then a
    groupBy on (user, session_id) — which AQE coalesces into the same
    shuffle layout. No Python in the path.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    is_start = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_us), 1
    ).otherwise(0)
    with_sid = events.withColumn("__sid", F.sum(is_start).over(w))
    return (
        with_sid.groupBy(F.col(user_col), F.col("__sid"))
        .agg(
            F.min(F.col(ts_col)).alias("session_start"),
            F.max(F.col(ts_col)).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("__sid")
    )


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization with per-user state.

    Emits a session row when the event-time timeout (gap) fires for a
    user's open session. Arrow-batched state function; state is one
    small tuple per open session.
    """
    gap_ms = gap_minutes * 60 * 1000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        rows_start, rows_end, rows_n = None, None, 0
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            rows_start, rows_end, rows_n = state.get
        for pdf in pdfs:
            for ts in sorted(pdf[ts_col]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if rows_start is None:
                    rows_start, rows_end, rows_n = ts_us, ts_us, 1
                elif ts_us - rows_end > gap_ms * 1000:
                    closed.append((rows_start, rows_end, rows_n))
                    rows_start, rows_end, rows_n = ts_us, ts_us, 1
                else:
                    rows_end = max(rows_end, ts_us)
                    rows_n += 1
        state.update((rows_start, rows_end, rows_n))
        state.setTimeoutTimestamp(rows_end // 1000 + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""SCD Type-2 history reconstruction from the lake's commit log.

The reference keeps only the LATEST image per record key (Hudi
copy-on-write upsert — /root/reference/glue_jobs/incremental.py);
warehouse consumers routinely need the *slowly-changing-dimension*
view instead: one row per (key, value-state) interval with
``valid_from`` / ``valid_to`` commit bounds, so facts can join the
dimension AS IT WAS (time_travel's row-level cousin, and the standard
Kimball SCD-2 shape).

``scd2_history`` derives that view purely from retained snapshots —
no extra bookkeeping at write time:

1. read each retained version (metadata-only snapshot reads,
   operators/upsert.py:read_as_of) tagged with its commit number;
2. ONE union + ONE window shuffle partitioned by record key, ordered
   by commit: a segment breaks when the tracked values change OR the
   key skips a snapshot (delete + later re-insert must NOT merge into
   one interval even if the value returns unchanged);
3. group consecutive runs → ``valid_from`` (first commit holding the
   state), ``valid_to`` (first commit where it no longer held; null
   while current), ``is_current``.

Scale posture: cost is (retained versions) × (snapshot scan) + one
key-partitioned window — retained versions are bounded small by
``retain_versions``, and the window key is the record key, so 1000
executors spread keys. No collect besides the versions list (already
driver-side metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    table,
    value_cols: list[str],
    versions: list[int] | None = None,
) -> DataFrame:
    """SCD-2 interval table for ``table`` over its retained commits.

    Returns record-key columns + ``value_cols`` + ``valid_from``,
    ``valid_to`` (commit numbers; ``valid_to`` null while current),
    ``is_current``. State changes are detected on ``value_cols`` only.
    """
    vs = sorted(versions if versions is not None else table.readable_versions())
    if not vs:
        raise ValueError("table has no retained versions")
    keys = list(table.spec.record_key)
    snaps = []
    for pos, v in enumerate(vs):
        snaps.append(
            table.read_as_of(v)
            .select(*keys, *value_cols)
            .withColumn("__pos", F.lit(pos))
        )
    u = snaps[0]
    for s in snaps[1:]:
        u = u.unionByName(s)

    w = Window.partitionBy(*keys).orderBy("__pos")
    vals = F.struct(*[F.col(c) for c in value_cols])
    prev_vals = F.lag(vals).over(w)
    prev_pos = F.lag("__pos").over(w)
    brk = (
        prev_pos.isNull()
        | (prev_pos != F.col("__pos") - 1)  # skipped snapshot = delete gap
        | ~prev_vals.eqNullSafe(vals)
    ).cast("int")
    seg = F.sum(brk).over(
        Window.partitionBy(*keys).orderBy("__pos").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    runs = (
        u.withColumn("__brk", brk)
        .withColumn("__seg", seg)
        .groupBy(*keys, "__seg", *value_cols)
        .agg(F.min("__pos").alias("__from_pos"), F.max("__pos").alias("__to_pos"))
    )
    # positions -> commit numbers via a tiny array literal (len = retained
    # versions); valid_to is the NEXT snapshot's commit (exclusive bound)
    varr = F.array(*[F.lit(int(v)) for v in vs])
    last_pos = len(vs) - 1
    return runs.select(
        *keys,
        *value_cols,
        F.element_at(varr, F.col("__from_pos") + 1).alias("valid_from"),
        F.when(
            F.col("__to_pos") < F.lit(last_pos),
            F.element_at(varr, F.col("__to_pos") + 2),
        ).alias("valid_to"),
        (F.col("__to_pos") == F.lit(last_pos)).alias("is_current"),
    )

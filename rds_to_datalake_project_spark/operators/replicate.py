"""Cross-lake replication from the changes feed — disaster recovery
and read-replica maintenance built from the engine's own primitives.

The reference replicates RDS → one lake and stops; operating a lake at
100 TB also needs the NEXT hop: a second region/cluster following the
first. This module turns the table's materialized CDC feed
(``KeyedTable.write_changes_feed`` — one parquet batch per commit
transition under ``feed_dir/v{k}/``) into a replica maintenance
protocol:

1. BOOTSTRAP: ``initial_load`` the replica from the source's commit-0
   snapshot (or any ``read_as_of``), record the bootstrapped version
   in the replica's ``.replica/_APPLIED`` cursor.
2. APPLY: every pending feed batch above the cursor is read in ONE
   union, mapped to the CDC envelope (``_change_type`` → ``Op``,
   ``_commit_version`` → the replica's integer precombine), and
   applied as ONE idempotent upsert with ``delete_mode="apply"`` —
   the precombine merge collapses multi-commit key histories to their
   newest state (update then delete ⇒ tombstone; delete then
   re-insert ⇒ the re-insert), so applying N batches at once equals
   applying them one by one.
3. The cursor advances only after the upsert commits; a crash between
   replays the same batches, and replay is idempotent (same rows,
   same precombine values — the engine's ST7 contract).

The replica's ``TableSpec`` must use a dedicated INTEGER precombine
column (default ``_rep_seq``) — source commit versions order the
merge; reusing a source string timestamp would order "10" < "9".

Fidelity is checked the scale-honest way: ``table_checksum``
(operators/compare.py) — one row per group moves, not the tables.

Scale: apply cost ∝ feed bytes since the cursor (the change set),
one precombine-window shuffle; bootstrap is a metadata-only snapshot
read. Feed retention (``vacuum_changes_feed``) bounds lag a replica
may recover across; a cursor below the feed floor raises rather than
silently skipping lost commits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.operators.zonemap import (
    _read_small,
    _write_small,
)

DEFAULT_PRECOMBINE = "_rep_seq"

# Diagnostics: cumulative feed-apply counters since reset — bench.py
# reports these next to the replication row (catch-up I/O is ∝ feed
# batches, which the wall time alone cannot attribute).
LAST_APPLY: dict = {}


def reset_apply_stats() -> None:
    LAST_APPLY.clear()


def _cursor_path(replica: KeyedTable) -> str:
    return f"{replica.path.rstrip('/')}/.replica/_APPLIED"


def applied_version(replica: KeyedTable) -> int | None:
    txt = _read_small(replica.spark, _cursor_path(replica))
    try:
        return int((txt or "").strip())
    except ValueError:
        return None


def _feed_versions(spark, feed_dir: str) -> list[int]:
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(feed_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v") and name[1:].isdigit():
            done = jvm.org.apache.hadoop.fs.Path(f"{feed_dir}/{name}/_SUCCESS")
            if fs.exists(done):  # partial batches are invisible
                out.append(int(name[1:]))
    return sorted(out)


def bootstrap_replica(
    source: KeyedTable, replica: KeyedTable, as_of: int | None = None
) -> int:
    """Seed the replica from a source snapshot and set the cursor.
    Returns the bootstrapped source version."""
    v = (source.versions() or [0])[-1] if as_of is None else int(as_of)
    seq = replica.spec.precombine_key
    replica.initial_load(
        source.read_as_of(v).withColumn(seq, F.lit(v).cast("long"))
    )
    _write_small(replica.spark, _cursor_path(replica), str(v))
    return v


def apply_changes_feed(replica: KeyedTable, feed_dir: str) -> dict:
    """Advance the replica through every pending feed batch. Returns
    ``{"applied": [versions], "cursor": new_cursor}``. Raises when the
    cursor predates the feed's retained floor (lost commits must
    surface, never silently skip — re-bootstrap instead)."""
    spark = replica.spark
    cur = applied_version(replica)
    if cur is None:
        raise ValueError(
            "replica has no cursor — bootstrap_replica first"
        )
    versions = _feed_versions(spark, feed_dir)
    pending = [v for v in versions if v > cur]
    if not pending:
        return {"applied": [], "cursor": cur}
    if versions and min(versions) > cur + 1:
        raise ValueError(
            f"feed floor v{min(versions)} is past the replica cursor "
            f"v{cur} — commits were vacuumed; re-bootstrap the replica"
        )
    seq = replica.spec.precombine_key
    batch = spark.read.parquet(*[f"{feed_dir}/v{v}" for v in pending])
    apply_df = (
        batch.withColumn(
            "Op",
            F.when(F.col("_change_type") == "delete", "D").otherwise("U"),
        )
        .withColumn(seq, F.col("_commit_version").cast("long"))
        .drop("_change_type", "_commit_version")
    )
    replica.upsert(apply_df, delete_mode="apply")
    new_cur = max(pending)
    _write_small(spark, _cursor_path(replica), str(new_cur))
    LAST_APPLY["applies"] = LAST_APPLY.get("applies", 0) + 1
    LAST_APPLY["batches_applied"] = LAST_APPLY.get("batches_applied", 0) + len(
        pending
    )
    LAST_APPLY["cursor"] = new_cur
    return {"applied": pending, "cursor": new_cur}

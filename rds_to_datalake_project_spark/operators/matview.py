"""Incremental materialized views over keyed lake tables.

:class:`~rds_to_datalake_project_spark.operators.rollup.RollupTable`
maintains the one aggregate shape the reference's consumers ask of
Athena (time-bucketed rollups); this is the general form — an
arbitrary GROUP BY over arbitrary SQL aggregate expressions, kept
fresh against a :class:`KeyedTable`'s commit log.

Maintenance strategy: AFFECTED-GROUP RECOMPUTE. Each refresh reads
the base's row-level changes since the last refreshed version
(``KeyedTable.table_changes`` with split pre/post images, so an
update that MOVES a row between groups refreshes both the group it
left and the one it joined), reduces them to the DISTINCT group keys
touched, recomputes exactly those groups from the current snapshot,
and merges the results into the view's own KeyedTable store (group
key = record key) — vanished groups become delete tombstones.
Recomputing instead of retracting keeps every aggregate correct —
MIN/MAX/COUNT(DISTINCT)/percentiles need no invertibility — at cost
∝ the touched groups' rows, never the corpus.

Scale notes: the change scan is two metadata snapshot reads + one
co-partitioned full-outer join (table_changes' contract); the touched
key set is broadcast into a semi join so the base scan prunes to
affected groups before its one aggregation shuffle; the view store
reuses the KeyedTable merge (partition-pruned, crash-safe publish).
A replayed refresh recomputes the same groups from the same snapshot
— idempotent, so the version marker is written after the merge and a
crash between the two only repeats work, never corrupts the view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.upsert import KeyedTable
from rds_to_datalake_project_spark.operators.zonemap import (
    _read_small,
    _write_small,
)
from rds_to_datalake_project_spark.schema import TableSpec

_SEQ_COL = "_refresh_seq"


class MaterializedView:
    """``SELECT group_cols, aggs FROM base GROUP BY group_cols``,
    incrementally maintained.

    ``aggs`` maps output column name -> SQL aggregate expression over
    the base table's columns (``{"revenue": "sum(amount)", "n":
    "count(*)"}``). The base table must retain versions
    (``retain_versions > 0``) — the refresh cursor is a base commit
    version and the delta comes from ``table_changes``.
    """

    def __init__(
        self,
        base: KeyedTable,
        path: str,
        group_cols: list[str],
        aggs: dict[str, str],
        name: str = "matview",
    ):
        if not base.retain_versions:
            raise ValueError(
                "MaterializedView requires a versioned base table "
                "(retain_versions > 0) — the refresh cursor is a commit version"
            )
        if not group_cols or not aggs:
            raise ValueError("group_cols and aggs must be non-empty")
        bad = set(group_cols) & set(aggs)
        if bad:
            raise ValueError(f"column(s) both grouped and aggregated: {sorted(bad)}")
        self.base = base
        self.spark: SparkSession = base.spark
        self.path = path
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)
        self.store = KeyedTable(
            self.spark,
            path,
            TableSpec(
                name,
                record_key=tuple(group_cols),
                precombine_key=_SEQ_COL,
                partition_granularity="",  # group-keyed, not time-partitioned
            ),
        )

    # -- refresh cursor ------------------------------------------------------

    def _marker_path(self) -> str:
        return f"{self.path}/.mv/_BASE_VERSION"

    def refreshed_version(self) -> int | None:
        """Base commit version the view currently reflects (None =
        never refreshed / marker unreadable → next refresh is full)."""
        txt = _read_small(self.spark, self._marker_path())
        try:
            return int((txt or "").strip())
        except ValueError:
            return None

    # -- plans ---------------------------------------------------------------

    def _aggregate(self, rows: DataFrame, seq: int) -> DataFrame:
        out = rows.groupBy(*self.group_cols).agg(
            *[F.expr(e).alias(c) for c, e in self.aggs.items()]
        )
        return out.withColumn(_SEQ_COL, F.lit(seq).cast("long"))

    def read(self) -> DataFrame:
        view = self.store.read()
        return view.drop(_SEQ_COL)

    # -- maintenance ---------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the view up to the base's latest commit. Returns a
        summary dict: {"mode", "base_version", "groups_refreshed"}."""
        latest = (self.base.versions() or [0])[-1]
        since = self.refreshed_version()
        if since is not None and since == latest:
            return {"mode": "noop", "base_version": latest, "groups_refreshed": 0}
        if since is None or since not in self.base.readable_versions():
            return self._full(latest)
        return self._incremental(since, latest)

    def _full(self, latest: int) -> dict:
        full = self._aggregate(self.base.read(), latest)
        self.store.initial_load(full)
        n = self.store.read().count()
        _write_small(self.spark, self._marker_path(), str(latest))
        return {"mode": "full", "base_version": latest, "groups_refreshed": n}

    def _incremental(self, since: int, latest: int) -> dict:
        changes = self.base.table_changes(since, latest, include_preimage=True)
        # Distinct group keys touched by any image — pre AND post, so
        # group-moving updates refresh both sides. Broadcast: the
        # touched-key set is ∝ the change window, not the corpus.
        touched = changes.select(*self.group_cols).distinct().localCheckpoint(
            eager=True
        )
        n_touched = touched.count()
        if not n_touched:
            _write_small(self.spark, self._marker_path(), str(latest))
            return {"mode": "incremental", "base_version": latest, "groups_refreshed": 0}
        snap = self.base.read()
        affected_rows = snap.join(F.broadcast(touched), self.group_cols, "left_semi")
        fresh = self._aggregate(affected_rows, latest).localCheckpoint(eager=True)
        # Groups with no surviving base rows: tombstone them out of
        # the view (delete pre-images land here after their last row
        # is removed).
        gone = touched.join(
            fresh.select(*self.group_cols), self.group_cols, "left_anti"
        )
        tombstones = gone.select(
            *self.group_cols,
            *[
                F.lit(None).cast(fresh.schema[c].dataType).alias(c)
                for c in self.aggs
            ],
            F.lit(latest).cast("long").alias(_SEQ_COL),
        ).withColumn("Op", F.lit("D"))
        batch = fresh.withColumn("Op", F.lit("U")).unionByName(tombstones)
        self.store.upsert(batch, delete_mode="apply")
        _write_small(self.spark, self._marker_path(), str(latest))
        return {
            "mode": "incremental",
            "base_version": latest,
            "groups_refreshed": n_touched,
        }


def attach_matview_maintenance(base: KeyedTable, view: MaterializedView) -> None:
    """Keep the view fresh after every base commit — same advisory
    post-commit slot as the zone map / ANN / LSH services (failures
    are isolated and surfaced by ``describe_history``; the view goes
    stale, never wrong, and the next refresh catches up)."""

    def matview_refresh(_table: KeyedTable) -> None:
        view.refresh()

    base.add_maintenance_hook(matview_refresh)

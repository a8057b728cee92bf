"""As-of (point-in-time) join — an operator Spark's join family lacks.

For each left row (key, ts), attach the payload of the LATEST right
version with version_ts <= ts. The canonical CDC-lake query: "join
facts against the dimension as it was at event time" (the reference's
upsert tables keep only the latest version; an as-of join over the
version log answers historical queries the reference cannot).

Implementation is the scalable union-window form, NOT a range join:
tag both sides, union, one hash shuffle on the key, sort within
partitions by (ts, side) with version rows first on ties, and carry
the last non-null payload forward. Cost: one shuffle + one sort —
linear, skew-safe under AQE, no O(L×R) pair blowup. DuckDB's native
ASOF JOIN provides the cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"  # 0 = version (right), 1 = probe (left)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """left rows + the right payload as of ``left_ts`` (inclusive).

    ``on``: equality key column name present on both sides.
    ``payload_cols``: right columns to carry (default: all right
    columns except the key and ``right_ts``).
    ``how``: "left" keeps unmatched left rows (payload null);
    "inner" drops them.
    ``direction`` (pandas merge_asof parity, same one-shuffle plan):
    "backward" = latest version with ts <= probe (the CDC default),
    "forward" = earliest version with ts >= probe, "nearest" =
    whichever of the two is closer in time (ties → backward).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # the version payload is carried as ONE struct so a version with a
    # null column can never be mixed with an earlier version's value;
    # __vts rides inside it so "nearest" can compare distances.
    version = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            F.col("__ts").alias("__vts"),
            *[F.col(f"__r_{c}").alias(c) for c in payload_cols],
        ),
    )
    # Backward: version rows sort BEFORE probe rows at equal ts → a
    # version effective exactly at the probe ts is visible (inclusive).
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward: the tie order flips (probe first) so an equal-ts version
    # falls INSIDE the following frame — still inclusive.
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = F.last(version, ignorenulls=True).over(wb)
    fwd = F.first(version, ignorenulls=True).over(wf)
    if direction == "backward":
        picked = back
    elif direction == "forward":
        picked = fwd
    else:  # nearest — both windows share the one shuffle on `on`
        from pyspark.sql.types import StringType

        if isinstance(unioned.schema["__ts"].dataType, StringType):
            # The engine's canonical timestamps are ISO-8601 STRINGS
            # (SURVEY §1.2): their lexicographic order IS chronological,
            # so the window sort above is already correct — but a
            # binary minus on StringType fails analysis. Compute the
            # distances on parsed instants (micros since epoch) while
            # the ordering stays on the raw column.
            def _us(c):
                return F.unix_micros(c.cast("timestamp"))

            d_back = _us(F.col("__ts")) - _us(back["__vts"])
            d_fwd = _us(fwd["__vts"]) - _us(F.col("__ts"))
        else:
            d_back = F.col("__ts") - back["__vts"]
            d_fwd = fwd["__vts"] - F.col("__ts")
        picked = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_fwd < d_back, fwd)
            .otherwise(back)  # ties → backward, pandas semantics
        )
    carried = unioned.select("*", picked.alias("__ver"))
    out = carried.filter(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.filter(F.col("__ver").isNotNull())
    return out.select(
        *[c for c in left.columns],
        *[F.col("__ver")[c].alias(c) for c in payload_cols],
    )

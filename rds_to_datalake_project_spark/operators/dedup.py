"""W1/W2 — latest-version-per-key dedup, and exact content dedup.

Reference core operator (glue_jobs/incremental.py:172-183):
``row_number() OVER (PARTITION BY id ORDER BY update_at DESC)`` keep
rn=1 — this is the CDC "precombine": on key collision the row with the
larger ``update_at`` wins (Hudi precombine.field, initial_load.py:165).

Scale notes:
- row_number over a hash-partitioned window is a single shuffle on the
  key — the minimal possible cost for exact per-key dedup; AQE splits
  skewed key partitions.
- We add deterministic tie-breakers (SURVEY.md §7.4): equal
  precombine values are won by ``_src_priority`` (incoming batch over
  existing table), then by a stable column ordering, so replays are
  idempotent (ST7).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_version_per_key(
    df: DataFrame,
    keys: Sequence[str],
    precombine: str,
    tie_breakers: Sequence[Column | str] = (),
) -> DataFrame:
    """Keep exactly one row per key: max ``precombine``, ties broken by
    ``tie_breakers`` then arbitrarily-but-deterministically.

    Identical plan shape to reference incremental.py:172-183 (window +
    filter + drop), with explicit tie-breaking added.
    """
    order = [F.col(precombine).desc()]
    order += [F.col(c).desc() if isinstance(c, str) else c for c in tie_breakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: Column | str,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """CANONICAL SELECTION within near-duplicate clusters: given a
    verified duplicate-pair graph, keep the best-scoring member of
    every connected component (quality-aware dedup — "keep the longest
    / highest-quality copy", the curation policy corpora actually
    want, vs. latest/arbitrary winners).

    Returns one row per input row: ``id_col, score, comp, keeper_id,
    kept``. Rows in no pair are their own singleton component (always
    kept). Ties break by ascending id, so the outcome is deterministic
    and cross-engine replayable when ``score_col`` is integral.

    Scale: components are the pointer-jumping loop
    (operators/components.py — no driver-side graph), then ONE window
    shuffle partitioned by component label. Cluster sizes are
    duplicate-group sizes — naturally small; a pathological mega-
    cluster is a data signal, not a plan hazard."""
    from rds_to_datalake_project_spark.operators.components import (
        connected_components,
    )

    score = F.col(score_col) if isinstance(score_col, str) else score_col
    comp = connected_components(pairs, a_col=a_col, b_col=b_col).select(
        F.col("id").alias(id_col), "comp"
    )
    labeled = (
        df.select(F.col(id_col), score.alias("score"))
        .join(comp, id_col, "left")
        .withColumn("comp", F.coalesce(F.col("comp"), F.col(id_col)))
    )
    w_rank = Window.partitionBy("comp").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    w_all = Window.partitionBy("comp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = labeled.withColumn("__rn", F.row_number().over(w_rank))
    return (
        ranked.withColumn(
            "keeper_id",
            F.max(F.when(F.col("__rn") == 1, F.col(id_col))).over(w_all),
        )
        .withColumn("kept", F.col(id_col) == F.col("keeper_id"))
        .drop("__rn")
    )


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    keep_order: Sequence[Column | str] = (),
) -> DataFrame:
    """Exact-duplicate removal by content columns (extension operator).

    One shuffle on a hash of the content columns. ``keep_order``
    decides which duplicate survives (default: arbitrary deterministic
    via remaining columns ascending).
    """
    # Injective over the column tuple: each field is length-prefixed
    # ("V<len>:<value>", "N:" for NULL), so nulls in different
    # positions — concat_ws silently SKIPS nulls, colliding
    # ('x',NULL,'y') with ('x','y',NULL) — and separator bytes inside
    # values can never alias two different contents to one hash.
    parts = []
    for c in content_cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("N:")).otherwise(
                F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    fingerprint = F.md5(F.concat(*parts))
    with_fp = df.withColumn("__fp", fingerprint)
    order = [F.col(c).asc() if isinstance(c, str) else c for c in keep_order]
    if not order:
        order = [F.col(c).asc() for c in df.columns if c not in content_cols] or [F.col("__fp")]
    w = Window.partitionBy("__fp").orderBy(*order)
    return (
        with_fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )

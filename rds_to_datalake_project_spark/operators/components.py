"""Connected components over near-duplicate pair graphs.

Corpus-scale fuzzy dedup needs GLOBAL duplicate groups: LSH/cosine
verification emits pairwise edges, and transitively-connected docs
form one group keeping one representative. The single-hop
approximation in ``minhash_dedup`` can keep two docs that are only
transitively similar; this operator closes the gap.

Algorithm: iterative min-label propagation with a pointer-jumping
step, as DataFrame ops only —

- propagate: each vertex takes the min component label among itself
  and its neighbors (one join + groupBy.min per iteration)
- pointer-jump: each vertex then adopts its current label's label
  (``comp = comp[comp]``), which collapses label chains exponentially
  (the classic Shiloach-Vishkin / large-star contraction idea), so
  convergence is O(log diameter) rounds, not O(diameter)

Each round is a self-contained shuffle stage; labels are
``localCheckpoint``ed per round to truncate lineage (same pattern as
the k-means trainer in ivf_train.py). Near-dup graphs have tiny
components in practice, so rounds ~= 2-3; the driver loop only runs
one ``count()`` action per round to test convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 20,
) -> DataFrame:
    """(id, comp) for every vertex in ``edges``; ``comp`` is the
    minimum vertex id reachable from ``id`` (a canonical, engine-
    independent component label)."""
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionAll(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_rounds):
        # propagate: min over own label and neighbors' labels
        neighbor = sym.join(
            labels.withColumnRenamed("id", "dst"), "dst"
        ).select(F.col("src").alias("id"), "comp")
        new = (
            labels.unionAll(neighbor)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)  # also breaks the self-join lineage below
        )
        # pointer-jump: comp <- label(comp); collapses chains in
        # O(log n) rounds instead of walking them one hop at a time
        mapping = new.select(
            F.col("id").alias("__cid"), F.col("comp").alias("__ccomp")
        )
        jump = (
            new.join(mapping, new["comp"] == mapping["__cid"], "left")
            .select(
                new["id"].alias("id"),
                F.coalesce(mapping["__ccomp"], new["comp"]).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jump.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = jump
        if changed == 0:
            break
    return labels


def dedup_by_components(
    df: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Keep one representative (the min-id) per connected duplicate
    group; rows not in any pair pass through untouched."""
    comp = connected_components(edges, a_col, b_col)
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")

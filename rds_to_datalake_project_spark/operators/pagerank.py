"""PageRank over a DataFrame edge list — iterative graph scoring in
exact fixed-point arithmetic.

Graph centrality over entity graphs (customer↔supplier, doc↔domain,
user↔item) is a standard curation signal (e.g. harmonic/centrality
weighting of crawl domains in public LLM-corpus pipelines); the
reference engine has no graph surface at all. Connected components
(operators/components.py) covers reachability; this adds the weighted
stationary-distribution family.

Design — exact integer PageRank:

- ranks are int64 micro-units (``scale`` total mass, default 1e12)
  and every step is integer arithmetic: the per-edge contribution is
  ``(d_num * r_u) DIV (d_den * outdeg_u)`` and the teleport base is
  ``((d_den - d_num) * scale) DIV (d_den * N)``. Integer sums are
  associative, so the result is BIT-IDENTICAL regardless of partition
  count, shuffle order, or engine — a float PageRank cannot be
  cross-engine hash-checked; this one can.
- truncation loses a few units of mass per edge (bounded by
  |E| / scale per iteration) — the *ordering* and magnitude
  semantics of PageRank are unaffected, determinism is gained.
- dangling nodes (outdeg 0) simply leak their mass (the simplified
  PageRank convention); pass a symmetrized edge list if the graph
  may strand mass.

Plan shape per iteration: one equi-join (edges ⋈ ranks on src — both
sides hash-partitioned on the join key, so iterations reuse the same
partitioning) + one groupBy(dst) sum with map-side partial aggregation
+ one left join back to the node spine for teleport-only nodes. No
collect in the loop (the only driver value is N, one count up front);
each iteration's ranks are ``localCheckpoint``-able via ``checkpoint_every``
for deep iteration counts — at the default small k the lineage is
left to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank over ``edges`` (columns ``src``, ``dst``).

    Returns ``(node, r)`` where ``r`` is the integer rank in
    ``scale`` units. ``iters`` full power iterations from the uniform
    start ``scale DIV N``.
    """
    if not {"src", "dst"} <= set(edges.columns):
        raise ValueError("edges must have src/dst columns")
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("outdeg")
    )
    n = nodes.count()  # one driver-side scalar, bounded metadata
    if n == 0:
        return nodes.withColumn("r", F.lit(0).cast("long"))
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    ranks = nodes.withColumn("r", F.lit(scale // n).cast("long"))

    # pre-join outdeg onto the edge list once — it is loop-invariant
    e_deg = e.join(deg, e.src == deg.node).select(
        "src", "dst", "outdeg"
    )
    for i in range(iters):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({damping_num} * r) DIV ({damping_den} * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base).cast("long") + F.coalesce(F.col("m"), F.lit(0))).alias(
                "r"
            ),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks

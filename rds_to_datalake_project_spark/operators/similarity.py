"""Similarity search over embedding columns (extension surface).

Design for 100 TB:
- Cosine arithmetic is done on *quantized integer* vectors
  (``round(x * 1e6)`` as long): integer sums are exact and
  order-independent, so results are bit-identical across engines,
  partitionings, and replays — a property float summation lacks.
  At 1e6 scale the quantization error on float32 inputs is below
  1e-6 in the final cosine.
- ``cosine_topk`` broadcasts the (single) query vector — a map-only
  scan + one top-k reduction; no shuffle of the corpus.
- ``neardup_pairs_blocked`` is the scale path for all-pairs search:
  block on a partition key (label, LSH bucket, IVF centroid) and
  self-join within blocks only — the classic O(n²) → O(Σ b²) cut.
- ``ivf_topk`` is a two-stage IVF probe: coarse-quantize every vector
  to its nearest centroid (map-only), then search only the closest
  ``n_probe`` cells.

All expressions are built-in higher-order functions (zip_with /
aggregate / transform) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def quantize(col: Column | str) -> Column:
    """array<float> → array<long>, fixed-point at 1e-6 resolution."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine similarity from quantized vectors — deterministic across
    engines: integer sums, then one double division."""
    return dot_q(a, b).cast("double") / F.sqrt(
        norm_sq_q(a).cast("double") * norm_sq_q(b).cast("double")
    )


def cosine_topk(
    corpus: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine against one corpus vector.

    Plan: broadcast 1-row query → map-side cosine over the corpus →
    global top-k (Spark's TakeOrderedAndProject, no full sort).
    """
    q = (
        corpus.filter(F.col(id_col) == query_vec_id)
        .select(quantize(vec_col).alias("__qvec"))
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_q(quantize(vec_col), F.col("__qvec")).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def neardup_pairs_blocked(
    corpus: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    Self-join on ``block_col`` (equi-join → hash shuffle on the block
    key, never a full cross product), keep ordered pairs above the
    threshold.
    """
    q = corpus.select(
        F.col(id_col), F.col(block_col).alias("__blk"), quantize(vec_col).alias("__q")
    )
    a, b = q.alias("a"), q.alias("b")
    return (
        a.join(b, on=[F.col("a.__blk") == F.col("b.__blk"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            cosine_q(F.col("a.__q"), F.col("b.__q")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") > threshold)
    )


def assign_ivf_cells(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantization: tag each vector with its nearest centroid id.

    ``centroids`` is a small driver-side list (k-means or sampled) —
    embedded as a literal array and evaluated map-only per row.

    Distances are exact integer sums over QUANTIZED vectors (same
    fixed-point scheme as the cosine kernel): (qx-qc)² ≤ 4e12 per dim,
    ×dim well inside int64 — so the assignment is bit-identical across
    engines/partitionings and DuckDB-oracle-able. Ties take the first
    (lowest-index) centroid in ``centroids`` order, matching an
    ``ORDER BY dist, cid`` twin when centroids are passed cid-ascending.
    """
    cents = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                quantize(F.array(*[F.lit(float(x)) for x in vec])).alias("cvec"),
            )
            for cid, vec in centroids
        ]
    )
    # Stage the quantized vector as a column and score each centroid
    # exactly once (the fold then compares ready-made (d, cid) structs)
    # — referencing dist() inside the fold's when() would inline the
    # distance expression 2k× per row and re-quantize per centroid.
    staged = corpus.withColumn("__qv", quantize(vec_col))
    dist = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(F.col("__qv"), c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = F.transform(
        cents, lambda c: F.struct(dist(c["cvec"]).alias("d"), c["cid"].alias("cid"))
    )
    best = F.aggregate(
        scored,
        F.struct(F.lit((1 << 63) - 1).cast("long").alias("d"), F.lit(-1).alias("cid")),
        lambda acc, s: F.when(s["d"] < acc["d"], s).otherwise(acc),
    )
    return staged.select(F.col(id_col), F.col(vec_col), best["cid"].alias("ivf_cell"))


def ivf_topk(
    corpus_with_cells: DataFrame,
    query_vec: list[float],
    probe_cells: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stage-2 IVF probe: exact cosine over only the probed cells.

    Partition pruning on ``ivf_cell`` (when the corpus is written
    partitioned by cell) makes this read a fraction of the corpus.
    """
    qlit = quantize(F.array(*[F.lit(float(x)) for x in query_vec]))
    return (
        corpus_with_cells.filter(F.col("ivf_cell").isin(probe_cells))
        .select(F.col(id_col), cosine_q(quantize(vec_col), qlit).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )

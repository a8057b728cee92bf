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


# --- SQ8 scalar quantization (faiss-SQ8 style two-stage search) ---------------

def sq8_train(
    corpus: DataFrame, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) bounds — the SQ8 "codebook".

    One distributed posexplode + groupBy(pos) aggregate; the collect
    is dim rows of two doubles (driver-side size = the codebook, same
    class as IVF centroid means)."""
    rows = (
        corpus.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
        .collect()
    )
    return [(r["lo"], r["hi"]) for r in sorted(rows, key=lambda r: r["pos"])]


def sq8_code(vec_col: Column | str, bounds: list[tuple[float, float]]) -> Column:
    """array<float> → array<long> of 8-bit codes in [0, 255].

    ``code_i = round(255 · (x_i − lo_i) / (hi_i − lo_i))`` — the
    subtraction/division/round chain is correctly-rounded IEEE on
    identical inputs, so codes are bit-identical across engines
    (constant dimensions encode as 0). Bounds ride the plan as
    literal arrays (map-only, same as SRP's plan-literal weights).
    """
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    lo = F.array(*[F.lit(float(l)) for l, _ in bounds])
    hi = F.array(*[F.lit(float(h)) for _, h in bounds])
    return F.transform(
        c,
        lambda x, i: F.when(
            F.element_at(hi, i + 1) == F.element_at(lo, i + 1), F.lit(0).cast("long")
        ).otherwise(
            F.round(
                F.lit(255.0)
                * (x.cast("double") - F.element_at(lo, i + 1))
                / (F.element_at(hi, i + 1) - F.element_at(lo, i + 1))
            ).cast("long")
        ),
    )


def sq8_topk(
    corpus: DataFrame,
    query_vec_id: int,
    k: int = 10,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: SQ8 approximate scan, exact rerank.

    Stage 1 scores every vector against the query on 8-bit codes with
    the centered-integer surrogate ``Σ (c_i−128)(q_i−128)`` — pure
    int64 sums, 8× less data than float32 — and keeps the top
    ``rerank`` candidates (TakeOrderedAndProject, embedding carried as
    payload so stage 2 re-reads nothing). Stage 2 reranks those few
    rows by exact quantized cosine. One corpus scan total; the scan is
    map-only against the broadcast 1-row query.

    The result is deterministic and oracle-able end-to-end: codes,
    surrogate sums, and the final cosine are all integer-exact (see
    sq8_code); ties break on id at both stages.
    """
    bounds = sq8_train(corpus, vec_col)
    coded = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        sq8_code(vec_col, bounds).alias("__code"),
    )
    q = (
        coded.filter(F.col(id_col) == query_vec_id)
        .select(
            F.col("__code").alias("__qcode"),
            quantize(vec_col).alias("__qvec"),
        )
    )
    centered = lambda a, b: (a - 128) * (b - 128)  # noqa: E731
    staged = (
        coded.crossJoin(F.broadcast(q))
        .withColumn(
            "approx_score",
            F.aggregate(
                F.zip_with(F.col("__code"), F.col("__qcode"), centered),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .orderBy(F.col("approx_score").desc(), F.col(id_col))
        .limit(rerank)
    )
    return (
        staged.select(
            F.col(id_col),
            F.col("approx_score"),
            cosine_q(quantize(vec_col), F.col("__qvec")).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def semantic_dedup(
    corpus: DataFrame,
    block_col: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each block
    (typically an IVF/k-means cell), a vector is DROPPED when any
    lower-id vector in the same block has cosine similarity >=
    ``threshold`` — keeping exactly one representative per
    near-duplicate neighborhood without a transitive-closure pass
    (the cluster bound makes the survivor set deterministic).

    Emits one row per input vector: ``(id_col, block_col, keep,
    dup_of, n_similar)`` where ``dup_of`` is the smallest qualifying
    lower id (NULL for survivors) and ``n_similar`` counts the
    qualifying lower-id neighbors.

    ``quantized=True`` means ``vec_col`` already holds fixed-point
    ``array<long>`` (the trainer's ``__qv``); otherwise it is
    quantized here. Similarities are exact integer dot products + one
    double division — deterministic across engines.

    Scale shape: the pairing is an equi-join on the block key (one
    hash shuffle, never a corpus cross product) and the per-pair
    kernel runs only inside blocks — cost Σ|cell|², the SemDeDup
    contract (pick k so cells stay bounded; the drift trigger in
    operators/ann_index.py is the rebalance lever). The keep decision
    is one groupBy over the qualifying pairs plus a broadcast-size
    left join back.
    """
    vec = F.col(vec_col) if quantized else quantize(vec_col)
    q = corpus.select(
        F.col(id_col), F.col(block_col).alias("__blk"), vec.alias("__q")
    )
    a, b = q.alias("a"), q.alias("b")
    dup = (
        a.join(
            b,
            on=[
                F.col("a.__blk") == F.col("b.__blk"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .withColumn("__sim", cosine_q(F.col("a.__q"), F.col("b.__q")))
        .filter(F.col("__sim") >= F.lit(threshold))
        .groupBy(F.col(f"b.{id_col}").alias(id_col))
        .agg(
            F.min(F.col(f"a.{id_col}")).alias("dup_of"),
            F.count(F.lit(1)).alias("n_similar"),
        )
    )
    return (
        q.select(F.col(id_col), F.col("__blk").alias(block_col))
        .join(dup, id_col, "left")
        .select(
            F.col(id_col),
            F.col(block_col),
            F.col("dup_of").isNull().alias("keep"),
            F.col("dup_of"),
            F.coalesce("n_similar", F.lit(0).cast("bigint")).alias("n_similar"),
        )
    )

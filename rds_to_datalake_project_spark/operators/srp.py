"""Signed-random-projection (SRP / cosine-LSH) fingerprints over
embedding columns (extension surface).

The embedding twin of SimHash: bit i of the fingerprint is the sign of
the projection of the vector onto a fixed ±1 hyperplane, so vectors
with high cosine similarity agree on most bits (Goemans–Williamson:
P[bit differs] = angle/π). Banding the fingerprint (pigeonhole, same
recall guarantee as operators/simhash.py) turns all-pairs cosine
search into equi-joins — the scale path for embedding near-dup when no
natural blocking column exists (neardup_pairs_blocked needs one; IVF
needs trained centroids; SRP needs nothing).

Determinism design (what makes this oracle-checkable):
- The projection matrix is derived from md5("i|j") parity at plan
  build time — the same ±1 matrix on any engine, any run — and is
  embedded as plan literals, so the executors do zero hashing.
- Projections are exact integer dot products over QUANTIZED vectors
  (operators/similarity.quantize, the scheme every green cosine query
  already uses): BIGINT sums are order-independent, so a bit can never
  flip due to float summation order. |dot| ≤ dim · QUANT·|x|max · 1 —
  well inside int64 at any realistic embedding scale.

Scale shape: fingerprinting is map-only; banding explodes ``bands``
rows per vector; candidate discovery is one self equi-join on
(band, bucket) — identical to the SimHash plan, which is the designed
shape at 100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.similarity import quantize


def srp_weights(n_bits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix: parity of md5("i|j").

    Plain Python (hashlib) — evaluated once at plan build, identical
    on every engine; the oracle SQL inlines the same matrix.
    """
    return [
        [
            1
            if int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1
            for j in range(dim)
        ]
        for i in range(n_bits)
    ]


def srp_fingerprint(qvec_col: Column, n_bits: int, dim: int) -> Column:
    """n_bits-bit SRP fingerprint of a QUANTIZED vector column, as a
    long. ``qvec_col`` must be a staged array<long> column (quantize
    once in the caller — referencing the raw quantize expression here
    would re-evaluate it per bit)."""
    wlit = F.array(
        *[
            F.array(*[F.lit(w).cast("long") for w in row])
            for row in srp_weights(n_bits, dim)
        ]
    )
    dots = F.transform(
        wlit,
        lambda row: F.aggregate(
            F.zip_with(qvec_col, row, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    bit_idx = F.sequence(F.lit(0), F.lit(n_bits - 1))
    return F.aggregate(
        F.zip_with(
            dots,
            bit_idx,
            lambda d, i: F.when(
                d > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def srp_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 60,
    bands: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Fingerprint + explode into ``bands`` prefix-band buckets (two
    vectors within ``bands - 1`` Hamming bits share ≥ 1 band)."""
    bits = n_bits // bands
    staged = df.select(F.col(id_col), quantize(vec_col).alias("__qv"))
    fp_df = staged.select(
        F.col(id_col), srp_fingerprint(F.col("__qv"), n_bits, dim).alias("srp")
    )
    bandcols = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.call_function("shiftrightunsigned", F.col("srp"), b * bits)
            .bitwiseAND(F.lit((1 << bits) - 1))
            .alias("bucket"),
        ),
    )
    return fp_df.select(id_col, "srp", F.explode(bandcols).alias("bb")).select(
        id_col, "srp", "bb.band", "bb.bucket"
    )


def srp_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_hamming: int = 5,
    n_bits: int = 60,
    bands: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup candidate pairs with Hamming(srp) ≤
    max_hamming via band-bucket equi-join (bands ≥ max_hamming + 1
    for the recall guarantee)."""
    if bands < max_hamming + 1:
        raise ValueError("bands must be ≥ max_hamming + 1 for recall guarantee")
    banded = srp_buckets(df, id_col, vec_col, n_bits, bands, dim).localCheckpoint(
        eager=True
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.bit_count(F.col("a.srp").bitwiseXOR(F.col("b.srp")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

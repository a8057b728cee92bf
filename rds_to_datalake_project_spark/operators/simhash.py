"""SimHash near-duplicate fingerprinting (extension surface).

64-bit SimHash over word shingles: each token hashes to 64 bits; the
fingerprint's bit i is 1 iff the sum of (+1/-1) votes over tokens is
positive. Near-duplicates have small Hamming distance.

Scale design: fingerprinting is map-only (array expressions over the
token list, one xxhash64 per token). Bucketing by the fingerprint's
b-bit prefixes (pigeonhole: two docs within d bits share at least one
of d+1 prefix bands) turns Hamming search into equi-joins — the same
shuffle shape as MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_width(hash_mode: str) -> int:
    """xxhash64 fingerprints use all 64 bits; md5 mode uses the 60-bit
    md5-prefix family (operators/minhash.md5long60) so the fingerprint
    stays an exact, oracle-replayable BIGINT — 60 bits, 15-bit bands."""
    if hash_mode == "xxhash64":
        return 64
    if hash_mode == "md5":
        return 60
    raise ValueError(f"hash_mode must be 'xxhash64' or 'md5', got {hash_mode!r}")


def simhash64(col: Column | str, hash_mode: str = "xxhash64") -> Column:
    """64-bit SimHash of whitespace tokens, as a long (60-bit in
    ``hash_mode="md5"``).

    votes[i] = sum over tokens of bit_i — kept as ONE array-accumulator
    aggregate (64 independent per-bit aggregates would each inline a
    copy of the token-hash expression, exploding codegen ~64×). The
    fixed-arg bit shifts go through ``F.call_function`` because the
    Python wrappers only accept int shift amounts, and the shift here
    is the HOF lambda variable.
    """
    n_bits = _bit_width(hash_mode)
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")
    if hash_mode == "xxhash64":
        hashes = F.transform(toks, lambda t: F.xxhash64(t))
    else:
        from rds_to_datalake_project_spark.operators.minhash import md5long60

        hashes = F.transform(toks, lambda t: md5long60(t))
    bit_idx = F.sequence(F.lit(0), F.lit(n_bits - 1))
    # ones[i] = count of tokens with bit i set — one pass over tokens.
    ones = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                lambda i: F.call_function("shiftrightunsigned", h, i)
                .bitwiseAND(F.lit(1))
                .cast("long"),
            ),
            lambda a, b: a + b,
        ),
    )
    n = F.size(toks).cast("long")
    # fp = Σ (ones[i]*2 > n) << i
    return F.aggregate(
        F.zip_with(
            ones,
            bit_idx,
            lambda o, i: F.when(
                o * 2 > n, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    hash_mode: str = "xxhash64",
    input_partitions: int | None = None,
) -> DataFrame:
    """Fingerprint + explode into ``bands`` prefix-band buckets.

    Two docs within ``bands - 1`` Hamming bits are guaranteed to
    collide in at least one band (pigeonhole).
    """
    bits = _bit_width(hash_mode) // bands
    fp = simhash64(text_col, hash_mode)
    # Conditional fan-out before the fingerprint map stage (few input
    # files would otherwise serialize the corpus through a few tasks;
    # a well-split scan passes through shuffle-free).
    from rds_to_datalake_project_spark.operators.fanout import fan_out

    df = fan_out(df, current=input_partitions)
    df = df.select(F.col(id_col), fp.alias("simhash"))
    # One HOF over band indices — parallel per-band structs would let
    # CollapseProject inline `bands` copies of the simhash tree.
    bandcols = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.call_function("shiftrightunsigned", F.col("simhash"), b * bits)
            .bitwiseAND(F.lit((1 << bits) - 1))
            .alias("bucket"),
        ),
    )
    return df.select(id_col, "simhash", F.explode(bandcols).alias("bb")).select(
        id_col, "simhash", "bb.band", "bb.bucket"
    )


def hash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Banded-Hamming near-dup join over an EXISTING fingerprint
    column — the generalized core of ``simhash_neardup_pairs``, usable
    by any 64-bit perceptual hash (text SimHash, image aHash, …).
    Pigeonhole recall guarantee: two fingerprints within
    ``bands - 1`` Hamming bits share at least one band bucket, so with
    ``bands ≥ max_hamming + 1`` no qualifying pair is missed. One
    band-bucket equi-join shuffle; never all-pairs."""
    if bands < max_hamming + 1:
        raise ValueError("bands must be ≥ max_hamming + 1 for recall guarantee")
    band_bits = bits // bands
    bandcols = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.call_function(
                "shiftrightunsigned", F.col("__fp"), b * band_bits
            )
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .alias("bucket"),
        ),
    )
    banded = (
        df.select(F.col(id_col), F.col(hash_col).alias("__fp"))
        .select(id_col, "__fp", F.explode(bandcols).alias("bb"))
        .select(id_col, "__fp", "bb.band", "bb.bucket")
        .localCheckpoint(eager=True)
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
            hamming64(F.col("a.__fp"), F.col("b.__fp")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    hash_mode: str = "xxhash64",
    input_partitions: int | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, found via
    band-bucket equi-join (requires bands ≥ max_hamming + 1)."""
    if bands < max_hamming + 1:
        raise ValueError("bands must be ≥ max_hamming + 1 for recall guarantee")
    # Materialize the fingerprints once: the self-join would otherwise
    # recompute (and re-codegen) the whole simhash scan per side. At
    # scale this is exactly the "store the fingerprint table, then
    # self-join it" pattern.
    banded = simhash_buckets(
        df, id_col, text_col, bands, hash_mode, input_partitions
    ).localCheckpoint(eager=True)
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
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

"""MinHash + LSH near-duplicate detection (extension surface).

The standard fuzzy-dedup pipeline for LLM training corpora:
shingle → minhash signature → band → bucket-join → verify Jaccard.

Scale design (100 TB):
- Shingling + hashing are map-only array expressions (xxhash64 is a
  JVM intrinsic; seeds are varied by hashing (seed, shingle) pairs).
- LSH banding turns all-pairs O(n²) into groupBy(band_hash) — only
  rows sharing a band bucket ever meet, one shuffle per corpus (bands
  are exploded, so it's a single wide shuffle, not b passes).
- Candidate pairs are verified with exact n-gram Jaccard computed on
  the (small) candidate set only.

Cross-engine note: xxhash64 seeds are Spark-specific, so the default
operators get rows-only driver checks; the *verification* operator
(ngram_jaccard) is plain set arithmetic and oracle-checkable. For a
fully oracle-checkable pipeline every hashing operator also takes
``hash_mode="md5"``, which swaps xxhash64 for a 60-bit md5-prefix
integer (same trick as operators/contamination.py — md5 is bit-exact
replayable in DuckDB) so LSH banding itself gets a hash-green driver
row. xxhash64 stays the production default (JVM intrinsic, no string
materialization); md5 mode trades hash throughput for auditability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.fanout import fan_out, probe_partitions


def md5long60(col: Column) -> Column:
    """60-bit integer from the md5 hex prefix of a string column —
    exact BIGINT in any engine, deterministic, replayable in the
    DuckDB oracle (same construction as contamination._shingle_key)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def _seeded_hash(seed: Column, s: Column, hash_mode: str) -> Column:
    """Per-(seed, shingle) hash family. xxhash64: one JVM intrinsic
    call. md5: hash of the "seed|shingle" string (oracle twin:
    ``CAST(('0x' || substring(md5(seed || '|' || s), 1, 15)) AS BIGINT)``)."""
    if hash_mode == "xxhash64":
        return F.xxhash64(seed, s)
    if hash_mode == "md5":
        return md5long60(F.concat_ws("|", seed.cast("string"), s))
    raise ValueError(f"hash_mode must be 'xxhash64' or 'md5', got {hash_mode!r}")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) of whitespace-normalized,
    lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")
    k = F.size(toks) - (n - 1)
    # Guard k < 1 (text shorter than n tokens): sequence(0, k-1) would
    # count DOWN (Spark infers step -1) and slice(toks, 0, n) errors.
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.slice(toks, 1, 0))  # typed empty array<string>
    return F.array_distinct(grams)


def minhash_signature(
    shingle_col: Column, num_hashes: int = 64, hash_mode: str = "xxhash64"
) -> Column:
    """array<long> signature: per seed, min over shingle hashes.

    Permutation h_i(s) = xxhash64(i, s) — one JVM hash call per
    (seed, shingle). ``hash_mode="md5"`` uses the 60-bit md5 family
    instead (cross-engine replayable; see module docstring).

    Expression shape matters ×64 here:
    - ``shingle_col`` must be the CHILD of one outer ``transform`` so
      its (regex+split+ngram) expression is evaluated once per row —
      any form that references it inside a per-seed lambda body
      re-evaluates it per seed (observed 40×+ slowdowns), and N
      parallel ``F.array(...)`` branches additionally explode codegen.
    - per shingle we emit all ``num_hashes`` seeded hashes, then fold
      an elementwise min across shingles (zip_with + least).
    """
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    per_shingle = F.transform(
        shingle_col,
        lambda s: F.transform(seeds, lambda seed: _seeded_hash(seed, s, hash_mode)),
    )
    return F.aggregate(
        per_shingle,
        F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes),
        lambda acc, hs: F.zip_with(acc, hs, lambda a, h: F.least(a, h)),
    )


def band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The banded-signature table: one ``(id, band, bucket)`` row per
    (doc, band). This IS the LSH index relation — the self-join form
    (``lsh_candidate_pairs``) and the persisted table service
    (operators/lsh_index.py) both consume it. Map-only: shingle →
    signature → band hashes in one pass, exploded."""
    from rds_to_datalake_project_spark.functions.localrel import (
        widen_if_narrow,
    )

    rows_per_band = num_hashes // bands
    # The ×num_hashes seeded hashing is the cost here, not the scan: a
    # compacted corpus reads as 1 split and serializes the whole build
    # on one core (measured: one single-task 12 s job on local[32]).
    # Placement-only widen; no-op when the scan is already parallel.
    df = widen_if_narrow(df)
    sig_df = df.select(
        F.col(id_col),
        minhash_signature(
            shingles(text_col, shingle_n), num_hashes, hash_mode
        ).alias("__sig"),
    )

    def _bucket(b):
        band_str = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
        )
        return (
            F.xxhash64(band_str) if hash_mode == "xxhash64" else md5long60(band_str)
        )

    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(b.alias("band"), _bucket(b).alias("bucket")),
    )
    return sig_df.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_mode: str = "xxhash64",
    input_partitions: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.

    ``max_bucket_size``: drop buckets holding more than this many
    docs before the self-join. A mega-bucket (boilerplate shingles, a
    viral template) otherwise contributes O(|bucket|²) candidate
    pairs — the thing that melts a 100-TB dedup run. Standard
    production trade-off: members of a capped bucket usually share
    several OTHER buckets (near-dups collide in many bands), so
    recall loss is small and bounded. Off (None) by default so the
    oracle-replayable semantics stay exact.

    rows/bands: signature is split into ``bands`` bands of
    ``num_hashes // bands`` rows; band hash = hash of the slice
    (comma-joined in seed order — the md5 oracle replays that string).
    Output: distinct (a_id, b_id) with a_id < b_id.

    ``input_partitions``: the caller's one-time probe of df's
    partition count (avoids a per-stage DataFrame→RDD translation;
    see operators/fanout.py).
    """
    # Conditional fan-out before the expensive map stage: a corpus
    # read from few files would otherwise compute every signature in a
    # handful of tasks; an already-well-split 100 TB scan is passed
    # through with no shuffle. The banding itself (signature staged as
    # a real column, one nested HOF — each stage's expression appears
    # exactly once in the plan) lives in band_rows. Materialized once —
    # the self-join would recompute the signature scan per side (same
    # pattern as the simhash fingerprint table).
    banded = band_rows(
        fan_out(df, current=input_partitions),
        id_col,
        text_col,
        num_hashes,
        bands,
        shingle_n,
        hash_mode,
    ).localCheckpoint(eager=True)
    if max_bucket_size is not None:
        # One extra agg + anti-join on the SAME (band, bucket) key the
        # self-join shuffles on — no new partitioning, and it removes
        # the quadratic blow-up before it can materialize.
        big = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket_size)
            .drop("__n")
        )
        banded = banded.join(big, ["band", "bucket"], "left_anti")
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
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    input_partitions: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for (candidate) pairs.

    With ``pairs`` (from LSH) this verifies candidates only; without,
    it scores all ordered pairs (test scale only). Jaccard is computed
    with exact integer set cardinalities — cross-engine stable.
    """
    docs = fan_out(df, current=input_partitions).select(
        F.col(id_col), shingles(text_col, shingle_n).alias("__sh")
    )
    if pairs is None:
        a, b = docs.alias("a"), docs.alias("b")
        joined = a.crossJoin(b).filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    else:
        a = docs.alias("a")
        b = docs.alias("b")
        joined = (
            pairs.join(a, pairs["a_id"] == F.col(f"a.{id_col}"))
            .join(b, pairs["b_id"] == F.col(f"b.{id_col}"))
        )
    inter = F.size(F.array_intersect(F.col("a.__sh"), F.col("b.__sh")))
    union = F.size(F.array_union(F.col("a.__sh"), F.col("b.__sh")))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    transitive: bool = False,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Full fuzzy-dedup: keep one representative (min id) per
    near-duplicate group.

    ``transitive=False`` (default): single-hop union — the min-id
    representative absorbs its verified duplicates; no iteration, good
    corpus-dedup approximation. ``transitive=True``: proper connected
    components over the verified pair graph
    (operators/components.py), so chains A~B~C collapse to one
    representative even when A and C are not directly similar."""
    n_parts = probe_partitions(df)  # once for the whole pipeline
    cand = lsh_candidate_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, hash_mode, n_parts
    )
    verified = ngram_jaccard_pairs(
        df, cand, id_col, text_col, shingle_n, threshold, n_parts
    )
    if transitive:
        from rds_to_datalake_project_spark.operators.components import (
            dedup_by_components,
        )

        return dedup_by_components(df, verified, id_col)
    losers = verified.select(F.col("b_id").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def containment_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    hash_mode: str = "xxhash64",
    input_partitions: int | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Containment-biased candidates via PREFIX FILTERING — the
    dedicated index the Jaccard-banded path lacks (r6 verdict #7: a
    tiny doc quoted inside a huge one rarely shares a minhash band,
    because bands sample the UNION and the big doc's shingles dominate
    it).

    Guarantee (pigeonhole, the classic set-similarity-join prefix
    filter): if C(A→B) = |A∩B|/|A| ≥ t then |A\\B| ≤ |A| − ⌈t·|A|⌉,
    so ANY (|A| − ⌈t·|A|⌉ + 1)-subset of A's shingles intersects B.
    Each doc therefore probes with only that short prefix of its
    hash-ordered shingle keys, while the inverted index holds every
    doc's full key set; one equi-join on the shingle key yields every
    pair whose containment (in EITHER direction — each side probes
    with its own prefix) can clear ``t``. 100% candidate recall; the
    exact verify kernel (``ngram_containment_pairs``) prunes the rest.

    Scale shape: probe side is |doc|·(1−t)+1 keys per doc (small for
    high t), index side is the full shingle explosion — one shuffle
    join keyed by a 64-bit shingle hash, never all-pairs.
    ``max_shingle_df`` drops shingle keys indexed by more than that
    many docs (boilerplate grams — the mega-bucket analog; bounded
    recall trade, off by default so the oracle stays exact). Hash
    collisions only ADD candidates, never lose them.
    """
    key = (
        (lambda s: F.xxhash64(s)) if hash_mode == "xxhash64" else md5long60
    )
    if hash_mode not in ("xxhash64", "md5"):
        raise ValueError(f"hash_mode must be 'xxhash64' or 'md5', got {hash_mode!r}")
    docs = fan_out(df, current=input_partitions).select(
        F.col(id_col), shingles(text_col, shingle_n).alias("__sh")
    )
    keyed = (
        docs.filter(F.size("__sh") >= 1)
        .select(
            F.col(id_col),
            F.array_sort(F.transform("__sh", key)).alias("__keys"),
        )
        # Staged once: both the probe and index explosions read it.
        .localCheckpoint(eager=True)
    )
    # prefix_len = |A| − ⌈t·|A|⌉ + 1. The 1e-9 nudge keeps the exact-
    # threshold edge (t·|A| integral) from losing its +1 to float
    # error; it can only ever GROW the prefix (recall-safe) and both
    # engines replay the same IEEE double math.
    prefix_len = (
        F.size("__keys")
        - F.ceil(F.size("__keys") * F.lit(float(threshold)) - F.lit(1e-9))
        + F.lit(1)
    ).cast("int")
    probe = keyed.select(
        F.col(id_col).alias("a_id"),
        F.explode(F.slice("__keys", 1, prefix_len)).alias("__k"),
    )
    index = keyed.select(
        F.col(id_col).alias("b_id"), F.explode("__keys").alias("__k")
    )
    if max_shingle_df is not None:
        hot = (
            index.groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_shingle_df)
            .drop("__n")
        )
        index = index.join(hot, "__k", "left_anti")
    return (
        probe.join(index, "__k")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        .distinct()
    )


def containment_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    hash_mode: str = "xxhash64",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-subset duplicate pairs at full recall: prefix-filter
    candidates (``containment_candidate_pairs``) verified by the exact
    containment kernel. Because candidate recall is total (and the
    kernel exact), the result EQUALS brute-force all-pairs containment
    — which is what the DuckDB oracle states in closed form."""
    n_parts = probe_partitions(df)
    cand = containment_candidate_pairs(
        df, id_col, text_col, shingle_n, threshold, hash_mode, n_parts,
        max_shingle_df,
    )
    return ngram_containment_pairs(
        df, cand, id_col, text_col, shingle_n, threshold, n_parts
    )


def ngram_containment_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    input_partitions: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram containment: C(A→B) = |A∩B| / |A|.

    Catches near-subset duplication — a document quoted or embedded
    inside a larger one — which symmetric Jaccard dilutes below any
    useful threshold (|A∩B|/|A∪B| shrinks as B grows). Emits both
    directions for each candidate pair and keeps pairs whose LARGER
    containment clears ``threshold``. Cardinalities are exact integer
    set sizes (cross-engine stable); zero-shingle docs (shorter than
    the shingle width) are excluded before the division so no engine
    ever divides by zero.

    Boundary: with ``pairs`` from minhash LSH, candidate recall is
    Jaccard-biased (a tiny doc inside a huge one may never share a
    band). For full containment recall feed it
    ``containment_candidate_pairs`` (prefix-filter index) — the verify
    kernel itself is exact for whatever pairs it is given.
    """
    docs = fan_out(df, current=input_partitions).select(
        F.col(id_col), shingles(text_col, shingle_n).alias("__sh")
    )
    docs = docs.filter(F.size("__sh") >= 1)
    if pairs is None:
        a, b = docs.alias("a"), docs.alias("b")
        joined = a.crossJoin(b).filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    else:
        a = docs.alias("a")
        b = docs.alias("b")
        joined = (
            pairs.join(a, pairs["a_id"] == F.col(f"a.{id_col}"))
            .join(b, pairs["b_id"] == F.col(f"b.{id_col}"))
        )
    inter = F.size(F.array_intersect(F.col("a.__sh"), F.col("b.__sh"))).cast("double")
    c_ab = inter / F.size(F.col("a.__sh")).cast("double")
    c_ba = inter / F.size(F.col("b.__sh")).cast("double")
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            c_ab.alias("containment_a_in_b"),
            c_ba.alias("containment_b_in_a"),
        )
        .filter(
            F.greatest("containment_a_in_b", "containment_b_in_a") >= threshold
        )
    )

"""Golden-value tests for the fingerprint kernels.

simhash64 / minhash_signature are deterministic functions of Spark's
xxhash64 (a fixed, spec'd algorithm), so their outputs on a planted
corpus are frozen here. The LSH near-dup queries only get rows-only
driver checks (no DuckDB xxhash64 twin) — these constants are their
correctness anchor: any change to tokenization, seeding, banding math,
or hash plumbing shows up as a golden mismatch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.minhash import (
    minhash_signature,
    shingles,
)
from rds_to_datalake_project_spark.operators.simhash import hamming64, simhash64

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, ""),  # shorter than the shingle width
    (5, "single"),
    (6, "The  QUICK   Brown fox  jumps over the lazy dog"),  # ws/case twin of 1
]

I64_MAX = (1 << 63) - 1

GOLDEN_SIMHASH = {
    1: -7573889167326994222,
    2: -7573326217371541038,
    3: 2495353224988115078,
    4: -7444071767201028348,
    5: 6107264898130582690,
    6: -7573889167326994222,
}

GOLDEN_SIG = {
    1: [
        -9192515005537523575, -6627807093223977270, -7714904892077949302,
        -8074504484048335297, -7378259467182533987, -7094906955606315485,
        -6667906197262347566, -7544550174955922794,
    ],
    3: [
        -8463877554697810388, -8134498692839716363, -7200098506982724926,
        -5066297330118723644, -8955391349227378299, -5970074091408413953,
        -7717854528001756602, -6676059326624468157,
    ],
    # empty shingle set → identity of the min-fold (i64 max) per seed
    4: [I64_MAX] * 8,
}

GOLDEN_SHINGLE_COUNTS = {1: 7, 2: 7, 3: 6, 4: 0, 5: 0, 6: 7}


@pytest.fixture(scope="module")
def fingerprints(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = (
        df.select(
            "doc_id",
            simhash64("text").alias("sh"),
            minhash_signature(shingles("text", 3), 8).alias("sig"),
            F.size(shingles("text", 3)).alias("n_shingles"),
        )
        .orderBy("doc_id")
        .collect()
    )
    return {r.doc_id: r for r in rows}


def test_simhash_golden_values(fingerprints):
    assert {k: v.sh for k, v in fingerprints.items()} == GOLDEN_SIMHASH


def test_minhash_signature_golden_values(fingerprints):
    for doc_id, expected in GOLDEN_SIG.items():
        assert list(fingerprints[doc_id].sig) == expected, doc_id


def test_shingle_counts_and_short_text_edge(fingerprints):
    assert {k: v.n_shingles for k, v in fingerprints.items()} == GOLDEN_SHINGLE_COUNTS


def test_normalization_twin_is_identical(fingerprints):
    """Whitespace runs + case must not affect any fingerprint."""
    assert fingerprints[6].sh == fingerprints[1].sh
    assert list(fingerprints[6].sig) == list(fingerprints[1].sig)


def test_near_twin_behaves_like_near_dup(spark, fingerprints):
    """One-word change: tiny simhash Hamming distance, far text: large."""
    df = spark.createDataFrame(
        [
            (GOLDEN_SIMHASH[1], GOLDEN_SIMHASH[2]),
            (GOLDEN_SIMHASH[1], GOLDEN_SIMHASH[3]),
        ],
        "a long, b long",
    )
    near, far = [
        r.d for r in df.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    ]
    assert near <= 8 < far

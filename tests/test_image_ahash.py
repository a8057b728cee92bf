"""Perceptual image average-hash + banded-Hamming near-dup join
(operators/multimodal.py:image_ahash, operators/simhash.py:
hash_neardup_pairs)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.multimodal import (
    encode_bmp,
    image_ahash,
)
from rds_to_datalake_project_spark.operators.simhash import hash_neardup_pairs


def _img(seed: int, w: int = 32, h: int = 32) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w * 3), dtype=np.int64).astype(np.uint8)


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, "image/bmp", bytearray(encode_bmp(32, 32, px))) for i, px in rows],
        "media_id long, mime string, content binary",
    )


def test_identical_images_hash_equal_and_pair_at_zero(spark):
    px = _img(1)
    media = _media(spark, [(1, px), (2, px.copy()), (3, _img(99))])
    hashes = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert hashes[1] == hashes[2] != hashes[3]
    pairs = hash_neardup_pairs(
        image_ahash(media), "media_id", "ahash", max_hamming=0, bands=4
    ).collect()
    assert [(r["a_id"], r["b_id"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_small_perturbation_small_hamming_inversion_large(spark):
    px = _img(7)
    near = px.copy()
    near[0:4, 0:12] = 255  # brighten one 4x4-pixel corner block
    far = (255 - px.astype(np.int64)).astype(np.uint8)  # inversion
    media = _media(spark, [(1, px), (2, near), (3, far)])
    h = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert 0 < ham(h[1], h[2]) <= 4  # one perturbed cell region
    assert ham(h[1], h[3]) > 20  # inversion flips most threshold bits
    got = {
        (r["a_id"], r["b_id"])
        for r in hash_neardup_pairs(
            image_ahash(media), "media_id", "ahash", max_hamming=4, bands=8
        ).collect()
    }
    assert (1, 2) in got and (1, 3) not in got


def test_banded_join_recall_equals_brute_force(spark):
    imgs = [(i, _img(i)) for i in range(24)] + [(100, _img(3)), (101, _img(5))]
    media = _media(spark, imgs)
    hdf = image_ahash(media)
    hashes = {r["media_id"]: r["ahash"] for r in hdf.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(hashes)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ham(hashes[a], hashes[b]) <= 3
    }
    banded = {
        (r["a_id"], r["b_id"])
        for r in hash_neardup_pairs(
            hdf, "media_id", "ahash", max_hamming=3, bands=4
        ).collect()
    }
    assert banded == brute and {(3, 100), (5, 101)} <= banded


def test_wav_rows_are_filtered_out_jvm_side(spark):
    from rds_to_datalake_project_spark.operators.multimodal import encode_wav

    media = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(encode_bmp(32, 32, _img(1)))),
            (2, "audio/wav", bytearray(encode_wav(np.arange(10, dtype=np.int64)))),
        ],
        "media_id long, mime string, content binary",
    )
    got = [r["media_id"] for r in image_ahash(media).collect()]
    assert got == [1]


def _wav_media(spark, rows):
    from rds_to_datalake_project_spark.operators.multimodal import encode_wav

    return spark.createDataFrame(
        [(i, "audio/wav", bytearray(encode_wav(s))) for i, s in rows],
        "media_id long, mime string, content binary",
    )


def test_audio_hash_volume_and_offset_invariant(spark):
    from rds_to_datalake_project_spark.operators.multimodal import audio_sign_hash

    rng = np.random.RandomState(11)
    base = rng.randint(-500, 500, size=400).astype(np.int64)
    louder = base * 3          # volume change preserves deltas' signs
    shifted = base + 1000      # DC offset too
    reverse = base[::-1].copy()
    media = _wav_media(
        spark, [(1, base), (2, louder), (3, shifted), (4, reverse)]
    )
    h = {r["media_id"]: r["audio_hash"] for r in audio_sign_hash(media).collect()}
    assert h[1] == h[2] == h[3]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[1], h[4]) > 16  # reversal flips most rising probes


def test_audio_pairs_via_banded_join_and_images_excluded(spark):
    from rds_to_datalake_project_spark.operators.multimodal import (
        audio_sign_hash,
        encode_bmp,
    )
    from rds_to_datalake_project_spark.operators.simhash import (
        hash_neardup_pairs,
    )

    rng = np.random.RandomState(5)
    a = rng.randint(-99, 99, size=300).astype(np.int64)
    media = _wav_media(spark, [(1, a), (2, a * 2), (3, -a)])
    media = media.unionByName(
        spark.createDataFrame(
            [(9, "image/bmp", bytearray(encode_bmp(32, 32, _img(9))))],
            "media_id long, mime string, content binary",
        )
    )
    hdf = audio_sign_hash(media)
    assert {r["media_id"] for r in hdf.collect()} == {1, 2, 3}
    got = {
        (r["a_id"], r["b_id"])
        for r in hash_neardup_pairs(
            hdf, "media_id", "audio_hash", max_hamming=0, bands=4
        ).collect()
    }
    assert got == {(1, 2)}

"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas`` (extension
surface; build brief — training-data pipeline ops).

Design for 100 TB:
- Media bytes ride in a ``binary`` column next to typed metadata
  (mime, width, duration_ms, ...). Parquet stores them page-compressed;
  column pruning means metadata-only queries never touch the bytes.
- Decode / feature-extract run as ``mapInPandas`` — Arrow batches in
  and out, one Python worker per partition, no per-row pickling. Batch
  size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a partition of large blobs cannot OOM the worker.
- Partitioning: repartition by a size-balancing key before heavy
  decode so one straggler partition of big videos doesn't dominate the
  stage.

Codecs: compressed formats (JPEG/MP4/...) need PIL/ffmpeg, which this
container lacks — but the UNCOMPRESSED containers every media
pipeline also carries (BMP, PPM, WAV/PCM) parse with nothing beyond
``struct`` + numpy, so those decoders are REAL here:
``decode_media_stats`` walks actual file headers (BMP DIB geometry +
row stride/padding, PPM ASCII preamble, RIFF/WAVE chunk list) and
reduces the payload with vectorized numpy — the exact shape a
PIL-backed kernel drops into. ``byte_histogram_features`` is a real
dependency-free featurizer (byte-histogram embedding) standing where
a learned encoder would.
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("feat_dim", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Deterministic fake media rows from any table (test harness):
    content = payload bytes, metadata derived from them. Stands in for
    ``spark.read.format("binaryFile")`` over a real media lake."""
    payload = F.col(payload_col).cast("string").cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        (F.pmod(F.col(id_col), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.col(id_col), F.lit(600000))).cast("long").alias("duration_ms"),
        payload.alias("content"),
    )


# ---- real, dependency-free decode kernels (BMP / PPM / WAV) -----------------

STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("sample_sum", T.LongType(), True),
    ]
)

_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def encode_bmp(width: int, height: int, rows: "np.ndarray") -> bytes:
    """24-bpp bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER):
    ``rows`` is (height, width*3) uint8; each stored row pads to a
    4-byte boundary per the format."""
    stride = (width * 3 + 3) // 4 * 4
    data = np.zeros((height, stride), dtype=np.uint8)
    data[:, : width * 3] = rows[::-1]  # bottom-up storage order
    payload = data.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(payload), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(payload), 0, 0, 0, 0
    )
    return header + info + payload


def encode_ppm(width: int, height: int, rows: "np.ndarray") -> bytes:
    """Binary PPM (P6): ASCII preamble + raw top-down RGB."""
    return b"P6\n%d %d\n255\n" % (width, height) + rows.tobytes()


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE: one fmt chunk (16-bit PCM mono) + data."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_bmp_stats(b: bytes) -> tuple[int, int, int]:
    """(width, height, pixel byte sum) from a real BMP parse: geometry
    from the DIB header, pixel rows sliced at the declared offset and
    stride so padding bytes never contaminate the sum."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", b, 10)
    width, height = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    height = abs(height)
    row_bytes = width * (bpp // 8)
    stride = (row_bytes + 3) // 4 * 4
    px = np.frombuffer(b, np.uint8, stride * height, offset).reshape(
        height, stride
    )[:, :row_bytes]
    return width, height, int(px.sum(dtype=np.int64))


def decode_ppm_stats(b: bytes) -> tuple[int, int, int]:
    m = _PPM_HEADER.match(b)
    if not m:
        raise ValueError("not a binary PPM payload")
    width, height = int(m.group(1)), int(m.group(2))
    px = np.frombuffer(b, np.uint8, width * height * 3, m.end())
    return width, height, int(px.sum(dtype=np.int64))


def decode_wav_stats(b: bytes) -> tuple[int, int, int]:
    """(n_samples, sample_rate, sample sum) by walking the RIFF chunk
    list — no fixed layout assumed beyond the WAVE contract."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n, total = 12, None, 0, 0
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        if cid == b"fmt ":
            _, channels, rate = struct.unpack_from("<HHI", b, pos + 8)
        elif cid == b"data":
            samples = np.frombuffer(b, "<i2", size // 2, pos + 8)
            n, total = len(samples), int(samples.sum(dtype=np.int64))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None:
        raise ValueError("WAVE without fmt chunk")
    return n, rate, total


def decode_media_stats(media: DataFrame) -> DataFrame:
    """Real decode over the media lake: Arrow-batched ``mapInPandas``
    routing each blob to its container parser by mime. Column pruning
    keeps metadata-only readers off the bytes; one Python worker per
    partition, peak memory one Arrow batch."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in STATS_SCHEMA.fieldNames()}
            for mid, mime, blob in zip(
                pdf["media_id"], pdf["mime"], pdf["content"]
            ):
                w = h = psum = ns = rate = ssum = None
                if mime == "audio/wav":
                    ns, rate, ssum = decode_wav_stats(bytes(blob))
                elif mime == "image/bmp":
                    w, h, psum = decode_bmp_stats(bytes(blob))
                elif mime == "image/ppm":
                    w, h, psum = decode_ppm_stats(bytes(blob))
                else:
                    raise ValueError(f"no decoder for mime {mime!r}")
                for k, v in zip(
                    STATS_SCHEMA.fieldNames(),
                    (mid, mime, w, h, psum, ns, rate, ssum),
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.select("media_id", "mime", "content").mapInPandas(
        _kernel, schema=STATS_SCHEMA
    )


def synthesize_real_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL media files from any keyed table (test /
    oracle harness): id % 3 picks BMP / WAV / PPM; geometry and
    payload derive from the id in closed form, so an oracle can state
    every decoded stat without decoding anything:

    - images: width = id%17+1, height = id%13+1, every channel of
      every pixel in image row y equals (id%240)+y (< 253: no wrap)
      → pixel_sum = 3·W·(H·base + H(H−1)/2)
    - audio:  n = id%50+1 mono int16 samples, sample[i] = id%100+3i,
      rate 8000 → sample_sum = n·base + 3·n(n−1)/2

    The ENCODERS are real too — the oracle checks the whole
    encode→parse→reduce round trip through genuine file bytes."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            mimes, blobs = [], []
            for i in ids:
                i = int(i)
                if i % 3 == 1:
                    n, base = i % 50 + 1, i % 100
                    samples = base + 3 * np.arange(n, dtype=np.int64)
                    mimes.append("audio/wav")
                    blobs.append(encode_wav(samples))
                else:
                    w, h, base = i % 17 + 1, i % 13 + 1, i % 240
                    rows = np.repeat(
                        (base + np.arange(h, dtype=np.int64)) % 256, w * 3
                    ).reshape(h, w * 3).astype(np.uint8)
                    if i % 3 == 0:
                        mimes.append("image/bmp")
                        blobs.append(encode_bmp(w, h, rows))
                    else:
                        mimes.append("image/ppm")
                        blobs.append(encode_ppm(w, h, rows))
            yield pd.DataFrame(
                {"media_id": ids, "mime": mimes, "content": blobs}
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _kernel,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("mime", T.StringType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        ),
    )


def byte_histogram_features(content: bytes, mime: str, dim: int = 8) -> list[float]:
    """Dependency-free featurizer: fixed-dim vector from the byte
    histogram — the same signature/shape a learned embedding kernel
    has, usable on ANY mime."""
    if content is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b
    n = max(len(content), 1)
    return [a / (255.0 * n) for a in acc]


def extract_features(
    media: DataFrame, dim: int = 8, batch_hint: int | None = None
) -> DataFrame:
    """binary content → feature vectors via ``mapInPandas``.

    Arrow streams record batches into one Python worker per partition;
    the output iterator yields per-batch frames so peak memory is one
    batch of blobs, not a partition."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                byte_histogram_features(c, m, dim)
                for c, m in zip(pdf["content"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feat_dim": dim,
                    "features": feats,
                }
            )

    pruned = media.select("media_id", "mime", "content")
    return pruned.mapInPandas(_kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Video frame-sampling *plan*: explode each video row into frame
    timestamps (JVM-side sequence — the expensive decode of each frame
    would then run via ``extract_features`` on the sampled subset)."""
    n_frames = F.least(
        (F.col("duration_ms") / every_ms).cast("int") + 1, F.lit(max_frames)
    )
    return (
        media.filter(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            "mime",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
                )
            ).alias("frame_ts_ms"),
        )
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _decode_image_rows(b: bytes, mime: str) -> tuple[int, int, "np.ndarray"]:
    """Full pixel decode (top-down (h, w·3) uint8), not just stats."""
    if mime == "image/bmp":
        if b[:2] != b"BM":
            raise ValueError("not a BMP payload")
        (offset,) = struct.unpack_from("<I", b, 10)
        width, height = struct.unpack_from("<ii", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 28)
        if bpp != 24:
            raise ValueError(
                f"resize supports 24-bpp BMP only, got {bpp}-bpp"
            )
        flip = height > 0  # positive height = bottom-up storage
        height = abs(height)
        row_bytes = width * (bpp // 8)
        stride = (row_bytes + 3) // 4 * 4
        px = np.frombuffer(b, np.uint8, stride * height, offset).reshape(
            height, stride
        )[:, :row_bytes]
        return width, height, px[::-1] if flip else px
    if mime == "image/ppm":
        m = _PPM_HEADER.match(b)
        if not m:
            raise ValueError("not a binary PPM payload")
        width, height = int(m.group(1)), int(m.group(2))
        px = np.frombuffer(b, np.uint8, width * height * 3, m.end())
        return width, height, px.reshape(height, width * 3)
    raise ValueError(f"no image decoder for mime {mime!r}")


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every image blob to (out_w, out_h),
    re-encoded in its ORIGINAL container — the brief's resize kernel,
    dependency-free like the decoders. Source pixel of output (x', y')
    is (⌊x'·w/out_w⌋, ⌊y'·h/out_h⌋), the canonical NN decimation, so
    the resized pixel sum has a closed form any oracle can state.
    Non-image rows are filtered JVM-side before any byte moves to
    Python; output carries the resized stats plus the re-encoded
    bytes (drop ``content`` for hash checks)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for mid, mime, blob in zip(
                pdf["media_id"], pdf["mime"], pdf["content"]
            ):
                w, h, rows = _decode_image_rows(bytes(blob), mime)
                px = rows.reshape(h, w, 3)
                sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
                sx = (np.arange(out_w, dtype=np.int64) * w) // out_w
                rs = px[sy][:, sx, :].reshape(out_h, out_w * 3)
                enc = encode_bmp if mime == "image/bmp" else encode_ppm
                for k, v in zip(
                    RESIZE_SCHEMA.fieldNames(),
                    (
                        mid,
                        mime,
                        out_w,
                        out_h,
                        int(rs.sum(dtype=np.int64)),
                        enc(out_w, out_h, rs),
                    ),
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("mime").startswith("image/"))
        .select("media_id", "mime", "content")
        .mapInPandas(_kernel, schema=RESIZE_SCHEMA)
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("ahash", T.LongType(), False),
    ]
)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash per image: decode (real BMP/PPM
    parse), NN-downsample to ``grid×grid`` cells (the same floor
    mapping as ``resize_images``), and set bit i when cell i's
    luminance exceeds the grid mean — evaluated as the integer
    cross-multiplication ``cell·n_cells > total`` so the hash is
    bit-exact (no float mean, no rounding policy). Near-identical
    images differ in a few bits; find pairs with
    ``simhash.hash_neardup_pairs`` over the ``ahash`` column — the
    image arm of the dedup family, same banded-Hamming plan as text
    SimHash.

    Arrow-batched ``mapInPandas``; non-image rows filtered JVM-side
    before any byte reaches Python. Output: ``media_id, mime, ahash``
    (signed int64 carrying the 64 bits)."""
    n_cells = grid * grid

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, hashes = [], [], []
            for mid, mime, blob in zip(
                pdf["media_id"], pdf["mime"], pdf["content"]
            ):
                w, h, rows = _decode_image_rows(bytes(blob), mime)
                px = rows.reshape(h, w, 3).astype(np.int64)
                sy = (np.arange(grid, dtype=np.int64) * h) // grid
                sx = (np.arange(grid, dtype=np.int64) * w) // grid
                cells = px[sy][:, sx, :].sum(axis=2).reshape(-1)
                total = int(cells.sum())
                hv = 0
                for i, c in enumerate(cells.tolist()):
                    if c * n_cells > total:
                        hv |= 1 << i
                if hv >= 1 << 63:
                    hv -= 1 << 64
                ids.append(mid)
                mimes.append(mime)
                hashes.append(hv)
            yield pd.DataFrame(
                {"media_id": ids, "mime": mimes, "ahash": hashes}
            )

    return (
        media.filter(F.col("mime").startswith("image/"))
        .select("media_id", "mime", "content")
        .mapInPandas(_kernel, schema=AHASH_SCHEMA)
    )


def _decode_wav_samples(b: bytes) -> "np.ndarray":
    """int16 sample vector from a RIFF/WAVE payload (chunk walk, no
    fixed layout beyond the WAVE contract)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        if cid == b"data":
            return np.frombuffer(b, "<i2", size // 2, pos + 8).astype(np.int64)
        pos += 8 + size + (size & 1)
    raise ValueError("WAVE without data chunk")


AUDIO_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("audio_hash", T.LongType(), False),
    ]
)


def audio_sign_hash(media: DataFrame, n_probes: int = 64) -> DataFrame:
    """Perceptual audio fingerprint: bit i is set when the waveform is
    RISING at probe position ``p_i = (i·n)//n_probes`` (strictly
    ``sample[p_i+1] > sample[p_i]``; probes past the clip end stay 0).
    Sign-of-delta signatures are amplitude- and offset-invariant
    (volume changes preserve them) and integer-exact — the audio arm
    of the dedup family, paired with ``simhash.hash_neardup_pairs``
    exactly like the image aHash. Arrow-batched ``mapInPandas``;
    non-audio rows filtered JVM-side."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, hashes = [], [], []
            for mid, mime, blob in zip(
                pdf["media_id"], pdf["mime"], pdf["content"]
            ):
                s = _decode_wav_samples(bytes(blob))
                n = len(s)
                hv = 0
                for i in range(n_probes):
                    p = (i * n) // n_probes
                    if p + 1 < n and s[p + 1] > s[p]:
                        hv |= 1 << i
                if hv >= 1 << 63:
                    hv -= 1 << 64
                ids.append(mid)
                mimes.append(mime)
                hashes.append(hv)
            yield pd.DataFrame(
                {"media_id": ids, "mime": mimes, "audio_hash": hashes}
            )

    return (
        media.filter(F.col("mime").startswith("audio/"))
        .select("media_id", "mime", "content")
        .mapInPandas(_kernel, schema=AUDIO_HASH_SCHEMA)
    )

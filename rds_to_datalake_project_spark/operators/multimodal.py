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

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container —
the decode kernels are stubbed behind ``media_decode_stub`` (a
deterministic fake) and ``NotImplementedError`` markers; the
Spark-side plumbing (schemas, UDF signatures, batch shapes, pruning)
is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _decode_real(content: bytes, mime: str):  # pragma: no cover - stub
    """Real decode kernel — requires PIL/ffmpeg, absent here."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg/torchaudio; not in this container"
    )


def media_decode_stub(content: bytes, mime: str, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': fixed-dim feature vector from the
    byte histogram — same signature/shape a real embedding kernel has."""
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
                media_decode_stub(c, m, dim)
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

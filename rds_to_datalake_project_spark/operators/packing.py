"""Sequence packing: assign documents to fixed token-budget bins for
LLM pretraining batch assembly (extension surface beyond the
reference, like operators/text.py).

First-fit packing is inherently sequential, so the scalable variant
used here is *chunked* packing: order documents by a cross-engine
stable hash (reproducible pseudo-random shuffle, same trick as
operators/sampling.py), take a running token total, and cut a new bin
every ``budget`` tokens. A document may straddle a bin boundary — the
training loader truncates or continues it, which is exactly how
cumulative-token packing behaves in practice — in exchange the
assignment is a pure window computation: deterministic, one shuffle,
and oracle-checkable.

Scale: packing runs independently inside ``n_buckets`` hash buckets
(window partition key), so no global sort exists anywhere. At 100 TB,
size ``n_buckets`` so one bucket's (doc_id, n_tok) pairs fit an
executor's sort buffer — the window sees only the small projected
columns, never the text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Bucket id is packed into the bin id's high bits: bin = bucket<<32 | local.
_BUCKET_SHIFT = 1 << 32


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: Column,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each row a ``bin_id`` so every bin holds ~``budget`` tokens.

    Adds: ``pack_bucket`` (hash bucket packed independently),
    ``bin_id`` (globally unique: bucket in the high 32 bits),
    ``bin_offset`` (token offset of this doc inside its bin) and
    ``n_tok``. Deterministic for any partitioning of the input.
    """
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_buckets
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(h, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    return (
        df.withColumn("n_tok", token_col.cast("long"))
        .withColumn("pack_bucket", bucket)
        .withColumn("__start", start)
        .withColumn("__local_bin", F.expr(f"__start div {int(budget)}"))
        .select(
            "*",
            (F.col("pack_bucket") * _BUCKET_SHIFT + F.col("__local_bin")).alias("bin_id"),
            (F.col("__start") - F.col("__local_bin") * int(budget)).alias("bin_offset"),
        )
        .drop("__start", "__local_bin")
    )

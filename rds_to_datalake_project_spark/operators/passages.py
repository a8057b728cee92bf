"""Passage-level corpus deduplication (extension operator).

Document-level dedup (exact, MinHash, SimHash — ``operators/dedup.py``
/ ``operators/minhash.py``) misses boilerplate REPEATED INSIDE
otherwise-distinct documents: headers, licence blocks, navigation
chrome, templated spans. Web-scale training corpora remove such spans
at the passage level (RefinedWeb / MassiveText style): segment every
document into passages, count how many distinct documents each passage
appears in corpus-wide, and strip passages shared by more than
``max_docs`` documents, reassembling the cleaned text in order.

Segmentation: a configurable delimiter regex (paragraph / line mode)
when the corpus has structure, else fixed non-overlapping word windows
(``window`` tokens) — the standard fallback for flat text.

Scale notes (100 TB posture):
- Passage extraction is one map-side expression chain (split +
  slice/transform) — no shuffle, stays in whole-stage codegen.
- The corpus-wide passage count is ONE shuffle keyed by the passage
  (or its 64-bit hash in ``hashed=True`` prod mode, shrinking shuffle
  width from ~10 words to 8 bytes).
- Over-shared passages are the Zipf HEAD of that count — a tiny
  relation. It is joined back broadcast (AQE picks this up from its
  size), so flagging costs no second shuffle.
- Reassembly is one groupBy(doc) with an order-restoring
  ``array_sort(collect_list(struct(widx, …)))`` — deterministic
  regardless of shuffle arrival order.
Total: 2 shuffles + 1 broadcast join, each ∝ corpus token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_SPLIT = "[^a-z]+"


def split_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    delimiter: str | None = None,
) -> DataFrame:
    """Explode each document into ordered passages.

    Returns ``(id_col, widx, passage)``. With ``delimiter`` (a regex),
    passages are the delimiter-split segments (e.g. ``"\\n\\n+"`` for
    paragraphs); otherwise fixed ``window``-word non-overlapping
    windows over the lowercased word stream. A document with no tokens
    yields one empty passage so it survives reassembly.
    """
    if delimiter is not None:
        parts = F.split(F.col(text_col), delimiter)
    else:
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), _WORD_SPLIT),
            lambda x: x != F.lit(""),
        )
        df = df.withColumn("__toks", toks)
        # ceil(n/window) windows, at least 1 (empty doc -> one '' passage)
        n_win = F.greatest(
            F.ceil(F.size(F.col("__toks")) / F.lit(float(window))).cast("int"),
            F.lit(1),
        )
        parts = F.transform(
            F.sequence(F.lit(0), n_win - F.lit(1)),
            lambda i: F.array_join(
                F.slice(F.col("__toks"), i * window + F.lit(1), window), " "
            ),
        )
    out = df.select(
        F.col(id_col), F.posexplode(parts).alias("widx", "passage")
    )
    return out


def passage_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    delimiter: str | None = None,
    max_docs: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Strip passages shared by more than ``max_docs`` distinct
    documents; reassemble the survivors in order.

    Returns one row per input document:
    ``(id_col, n_passages, n_removed, clean_text)``.

    ``hashed=True`` joins on ``xxhash64(passage)`` instead of the
    passage text — the production mode at scale (8-byte shuffle keys;
    a 64-bit collision merges two passages' counts, which can only
    over-remove a boilerplate-adjacent passage, never corrupt text).
    """
    seg = split_passages(
        df, text_col=text_col, id_col=id_col, window=window, delimiter=delimiter
    )
    key = F.xxhash64(F.col("passage")) if hashed else F.col("passage")
    seg = seg.withColumn("__pk", key)
    # Zipf head: passages present in > max_docs distinct documents.
    shared = (
        seg.groupBy("__pk")
        .agg(F.countDistinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") > max_docs)
        .select("__pk", F.lit(True).alias("__shared"))
    )
    flagged = seg.join(shared, "__pk", "left").withColumn(
        "__removed", F.coalesce(F.col("__shared"), F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("__removed"), F.struct(F.col("widx"), F.col("passage"))
    )
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.col("__removed").cast("int")).alias("n_removed"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.getField("passage"),
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
    )
    return out

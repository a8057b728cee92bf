"""Composed document-curation pipeline — the cleaning pass an LLM
training-data pipeline runs end-to-end, as ONE plan.

Chains the engine's individual gates (operators/text.py language ID,
quality metrics, repetition metrics; operators/dedup.py-style md5
fingerprint) into a single decision per document:

    gate order (first failure is THE drop reason):
      lang        — heuristic language != target
      too_short / too_long — character bounds
      alpha_ratio — non-prose (tables, code, markup) filter
      repetition  — Gopher-style dup-line / top-bigram dominance
      duplicate   — exact-content dedup among gate SURVIVORS
                    (min doc_id keeps; duplicates of a dropped doc
                    are judged on their own merits, like real corpus
                    dedup after filtering)

Physical shape: every gate except dedup is a map-side expression over
the scan (whole-stage codegen, zero Python); dedup is one window over
the md5 fingerprint — a single hash shuffle. The output is a decision
log (doc_id, keep, drop_reason), joinable back to the corpus to
materialize the kept set; at 100 TB the log is what you audit and the
join is what you ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.text import (
    fingerprint,
    language_id,
    quality_metrics,
    repetition_metrics,
)


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_lang: str = "en",
    min_chars: int = 150,
    max_chars: int = 100_000,
    min_alpha_ratio: float = 0.55,
    max_dup_line_ratio: float = 0.5,
    max_top_bigram_ratio: float = 0.3,
) -> DataFrame:
    """Per-document keep/drop decision with the first failing gate as
    ``drop_reason`` (null when kept). See module docstring."""
    scored = repetition_metrics(
        quality_metrics(language_id(df, text_col), text_col), text_col
    )
    scored = fingerprint(scored, text_col)

    reason = (
        F.when(F.col("pred_lang") != target_lang, "lang")
        .when(F.col("q_chars") < min_chars, "too_short")
        .when(F.col("q_chars") > max_chars, "too_long")
        .when(F.col("q_alpha_ratio") < min_alpha_ratio, "alpha_ratio")
        .when(
            (F.col("q_dup_line_ratio") > max_dup_line_ratio)
            | (F.col("q_top_bigram_ratio") > max_top_bigram_ratio),
            "repetition",
        )
    )
    scored = scored.withColumn("__gate_reason", reason)
    # Dedup among survivors only: the minimum id among gate-passing
    # copies of each fingerprint is the keeper.
    w = Window.partitionBy("fp")
    keeper = F.min(
        F.when(F.col("__gate_reason").isNull(), F.col(id_col))
    ).over(w)
    return (
        scored.withColumn(
            "drop_reason",
            F.when(F.col("__gate_reason").isNotNull(), F.col("__gate_reason"))
            .when(F.col(id_col) != keeper, F.lit("duplicate")),
        )
        .select(
            id_col,
            F.col("drop_reason").isNull().alias("keep"),
            "drop_reason",
        )
    )


def apply_curation(df: DataFrame, decisions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize the kept corpus: equi-join the decision log back to
    the documents (broadcast when small, AQE otherwise)."""
    kept = decisions.filter(F.col("keep")).select(id_col)
    return df.join(kept, id_col, "left_semi")

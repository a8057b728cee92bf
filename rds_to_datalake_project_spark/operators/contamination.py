"""Train/test contamination detection (extension surface, like
operators/text.py): how much of each held-out document's n-gram
content also appears anywhere in the training split.

Pipeline shape — the scale-critical part is ONE equi-join on the
shingle key:

1. tag rows train/test with the deterministic md5 split
   (operators/sampling.py) — no RNG, reproducible on any engine;
2. explode word-shingles on both sides, compressed to a 60-bit
   md5-prefix integer so the shuffle moves 8-byte keys, not strings
   (md5, not xxhash64, so the DuckDB oracle can replay it exactly);
3. distinct the train side (train shingle vocabulary), left-join the
   test side, and re-aggregate per test document.

At 100 TB the join shuffles both sides on the shingle hash — the same
cost class as the LSH band join in operators/minhash.py; nothing is
ever collected or broadcast (the train vocabulary is NOT assumed to
fit anywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.minhash import md5long60, shingles
from rds_to_datalake_project_spark.operators.sampling import deterministic_split

# 60-bit integer key from the md5 of a shingle string: exact BIGINT in
# any engine, collision-negligible at corpus scale, and ONE shared
# implementation (a drifted copy here would silently diverge the
# contamination keys from every other md5-mode hashing path).
_shingle_key = md5long60


def contamination_report(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    test_permille: int = 100,
) -> DataFrame:
    """Per-test-document overlap with the train shingle vocabulary.

    Returns (key, n_sh, n_hit, contamination): total distinct
    shingles, how many also occur in ANY train document, and the
    hit fraction.
    """
    tagged = deterministic_split(df, key_col, test_permille).select(
        F.col(key_col),
        F.col("split"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("__sh"),
    )
    keyed = tagged.select(key_col, "split", _shingle_key(F.col("__sh")).alias("__k"))
    train_vocab = keyed.filter(F.col("split") == "train").select("__k").distinct()
    test_sh = keyed.filter(F.col("split") == "test").select(key_col, "__k")
    hits = test_sh.join(
        train_vocab.withColumn("__hit", F.lit(1)), "__k", "left"
    )
    return (
        hits.groupBy(key_col)
        .agg(
            F.count("*").alias("n_sh"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            key_col,
            "n_sh",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_sh")).alias("contamination"),
        )
    )

